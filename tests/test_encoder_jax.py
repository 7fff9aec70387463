"""The jittable device encoder is bit-identical to the host emulation.

encoder_jax re-expresses encoder_hw's fixed-point pipeline (Q1.32
quantize, 3^k conjugated store, four 34-bit radix-2^2 inverse FFTs with
convergent rounding, cmpy-truncated combine, sign-fix) as XLA int64
tensor ops; these tests pin word-for-word identity on random cleartexts,
the golden tv inputs, and batched/jitted execution.  encoder_hw itself
is pinned to the reference's true RTL dumps (tests/test_encoder_hw.py).

(reference: src/encoder/controller.sv:225-645)
"""

import os

import numpy as np
import pytest

from aloha_tpu import encoder_hw
from aloha_tpu.config import DEFAULT_CONFIG as CFG

TV = "/root/reference/tv"


def _rand_cleartext(rng, scale=0.3):
    # |re/im| < 1 keeps the Q1.32 quantizer in range, like the tv inputs
    return rng.uniform(-scale, scale, size=CFG.n)


def test_random_cleartexts_bit_identical():
    from aloha_tpu import encoder_jax

    rng = np.random.default_rng(42)
    for _ in range(3):
        c = _rand_cleartext(rng)
        want = encoder_hw.encode(c, CFG)
        got = np.asarray(encoder_jax.encode(c, CFG))
        assert np.array_equal(got, want)


def test_batched_and_jitted():
    import jax

    from aloha_tpu import encoder_jax

    rng = np.random.default_rng(7)
    batch = np.stack([_rand_cleartext(rng) for _ in range(3)])
    fn = jax.jit(lambda x: encoder_jax.encode(x, CFG))
    got = np.asarray(fn(batch))
    assert got.shape == (3, CFG.n_limbs, CFG.n)
    for i in range(3):
        want = encoder_hw.encode(batch[i], CFG)
        assert np.array_equal(got[i], want)


@pytest.mark.skipif(not os.path.isdir(TV), reason="reference tv/ not mounted")
def test_golden_input_matches_hw_emulation():
    from aloha_tpu import encoder_jax

    path = os.path.join(
        TV, "case0_4_4", "kernel2_cleartext_before_encode_re_im.txt"
    )
    c = np.loadtxt(path, dtype=np.float64)
    want = encoder_hw.encode(c, CFG)
    got = np.asarray(encoder_jax.encode(c, CFG))
    assert np.array_equal(got, want)


def test_full_device_encode_paths():
    """he_jax.encode / he_planes.encode == encoder_hw + NumPy golden NTT."""
    from aloha_tpu import he_jax, he_planes, ntt_np

    rng = np.random.default_rng(11)
    c = _rand_cleartext(rng)
    coeff = encoder_hw.encode(c, CFG)
    want = np.stack(
        [
            ntt_np.ntt(coeff[i], CFG.moduli[i], CFG.psi[i])
            for i in range(CFG.n_limbs)
        ]
    )
    got = np.asarray(he_jax.encode(c, CFG))
    assert np.array_equal(got, want)
    gotp = np.asarray(he_planes.to_u64(he_planes.encode(c, CFG)))
    assert np.array_equal(gotp, want)


def test_small_values_and_signs():
    """Tie-prone inputs (exact halves at the quantizer and FFT rounding
    boundaries) must follow the same convergent rounding."""
    from aloha_tpu import encoder_jax

    c = np.zeros(CFG.n)
    c[0::2] = np.linspace(-0.5, 0.5, CFG.n // 2)
    c[1::2] = 2.0**-33  # quantizes to the 0.5 ULP tie
    want = encoder_hw.encode(c, CFG)
    got = np.asarray(encoder_jax.encode(c, CFG))
    assert np.array_equal(got, want)
