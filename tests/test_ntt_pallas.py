"""Pallas NTT kernel vs the golden model (interpret mode on CPU).

The real-hardware run of the same kernel is exercised by bench.py and the
TPU verify flow; interpret mode checks the kernel's math and data movement.
"""

import numpy as np
import pytest

from aloha_tpu import ntt_np
from aloha_tpu.config import DEFAULT_CONFIG as CFG
from aloha_tpu.ops import ntt_pallas

RNG = np.random.default_rng(21)
N = CFG.n


@pytest.mark.parametrize("limb", range(3))
def test_ntt_kernel_matches_golden(limb):
    q, psi = CFG.moduli[limb], CFG.psi[limb]
    a = RNG.integers(0, q, size=(2, N), dtype=np.uint64)
    import jax.numpy as jnp

    got = np.asarray(ntt_pallas.ntt(jnp.asarray(a), q, psi, interpret=True))
    assert (got == ntt_np.ntt(a, q, psi)).all()


@pytest.mark.parametrize("limb", range(3))
def test_intt_kernel_matches_golden(limb):
    q, ipsi = CFG.moduli[limb], CFG.ipsi[limb]
    a = RNG.integers(0, q, size=(2, N), dtype=np.uint64)
    import jax.numpy as jnp

    got = np.asarray(ntt_pallas.intt(jnp.asarray(a), q, ipsi, interpret=True))
    assert (got == ntt_np.intt(a, q, ipsi)).all()


def test_roundtrip_kernel():
    import jax.numpy as jnp

    q, psi, ipsi = CFG.moduli[0], CFG.psi[0], CFG.ipsi[0]
    a = RNG.integers(0, q, size=(1, N), dtype=np.uint64)
    fwd = ntt_pallas.ntt(jnp.asarray(a), q, psi, interpret=True)
    back = np.asarray(ntt_pallas.intt(fwd, q, ipsi, interpret=True))
    assert (back == a).all()
