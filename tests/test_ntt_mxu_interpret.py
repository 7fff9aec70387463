"""CPU (interpret-mode) bit-exactness of the MXU 4-step NTT kernel.

The 4-step factorization (rows negacyclic NTT_R -> elementwise twiddle
-> lanes cyclic DFT_128, constants proven in tools/mxu_factor_proof.py)
executes its digit matmuls + recombination through the pallas interpreter
and is certified against the NumPy golden model word-for-word.

(reference semantics: the 832-beat NTT engine schedule,
src/vp/ntt/ntt_fsm.sv:49,68)
"""

import numpy as np
import pytest

from aloha_tpu import ntt_np
from aloha_tpu.config import DEFAULT_CONFIG as CFG

pytest.importorskip("jax.experimental.pallas")


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setenv("ALOHA_STREAM_INTERPRET", "1")
    monkeypatch.setenv("ALOHA_STREAM_BP", "2")


def _run(nb, n, q, psi, dot_mode="i8"):
    import jax.numpy as jnp

    from aloha_tpu.ops import ntt_mxu

    rng = np.random.default_rng(nb + n)
    a = rng.integers(0, q, size=(nb, n), dtype=np.uint64)
    want = ntt_np.ntt(a, q, psi)
    got = np.asarray(ntt_mxu.ntt(jnp.asarray(a), q, psi))
    assert np.array_equal(got, want)
    ipsi = pow(psi, q - 2, q)
    back = np.asarray(ntt_mxu.intt(jnp.asarray(got), q, ipsi))
    assert np.array_equal(back, a)


@pytest.mark.parametrize("m", range(3))
def test_all_moduli_small_ring(m):
    # n=1024 (R=8) keeps interpret-mode runtime low while exercising the
    # full digit/recombine/fold machinery; root rescaled to order 2n
    q = CFG.moduli[m]
    psi = pow(CFG.psi[m], CFG.n // 1024, q)
    _run(2, 1024, q, psi)


def test_full_ring_q0():
    _run(2, CFG.n, CFG.moduli[0], CFG.psi[0])


def test_bf16_dot_mode(monkeypatch):
    # the bf16 digit path (exact: |digit products| <= 2^14, f32
    # accumulation of <= 1024 terms stays under 2^24)
    monkeypatch.setenv("ALOHA_MXU_DOT", "bf16")
    q = CFG.moduli[1]
    psi = pow(CFG.psi[1], CFG.n // 1024, q)
    _run(2, 1024, q, psi)


def test_larger_ring_n16384():
    # ring-degree scaling above the reference's N: R=128 makes the row
    # factor a full (128, 128) MXU matmul; margin holds (K=1024 both steps)
    q = CFG.moduli[0]
    # q0 - 1 has 2-adic valuation 32, so a 32768-th root exists
    psi = _root_of_order(q, 2 * 16384)
    _run(1, 16384, q, psi)


def _root_of_order(q: int, order: int) -> int:
    # deterministic search: g generates (Z/q)*; psi = g^((q-1)/order)
    for g in range(2, 100):
        psi = pow(g, (q - 1) // order, q)
        if pow(psi, order // 2, q) != 1:
            return psi
    raise AssertionError("no root found")


def test_odd_batch_chunking():
    # nb=3 -> bp degrades to 1; the kernel is bp-generic
    q = CFG.special_prime
    psi = pow(CFG.psi[-1], CFG.n // 1024, q)
    _run(3, 1024, q, psi)


def test_staggered_body(monkeypatch):
    # ALOHA_MXU_STAGGER=2 interleaves two sub-chunks (MXU/VPU overlap);
    # results must be identical to the plain body
    monkeypatch.setenv("ALOHA_MXU_STAGGER", "2")
    monkeypatch.setenv("ALOHA_STREAM_BP", "4")
    q = CFG.moduli[0]
    psi = pow(CFG.psi[0], CFG.n // 1024, q)
    _run(4, 1024, q, psi)


@pytest.mark.parametrize("inverse", [False, True])
def test_fused_chain(inverse):
    # k fused in-kernel transforms == k chained single-shot transforms
    import jax.numpy as jnp

    from aloha_tpu.ops import ntt_mxu

    q, n, k = CFG.moduli[0], 1024, 3
    psi = pow(CFG.psi[0], CFG.n // n, q)
    root = pow(psi, q - 2, q) if inverse else psi
    rng = np.random.default_rng(7)
    a = rng.integers(0, q, size=(2, n), dtype=np.uint64)
    want = a
    for _ in range(k):
        want = (ntt_np.intt if inverse else ntt_np.ntt)(want, q, root)
    lo = jnp.asarray((a & 0xFFFFFFFF).astype(np.uint32).reshape(2, -1, 128))
    hi = jnp.asarray((a >> np.uint64(32)).astype(np.uint32).reshape(2, -1, 128))
    olo, ohi = ntt_mxu.ntt_chain_planes(lo, hi, q, root, k, inverse=inverse)
    got = (np.asarray(olo).astype(np.uint64)
           | (np.asarray(ohi).astype(np.uint64) << np.uint64(32)))
    assert np.array_equal(got.reshape(2, n), want)


@pytest.mark.parametrize("inverse", [False, True])
def test_fused_chain_ways(monkeypatch, inverse):
    """The W-way lockstep chain (independent chunks interleaved for
    MXU/VPU overlap) is bit-identical to the 1-way form."""
    import jax.numpy as jnp

    from aloha_tpu.ops import ntt_mxu

    monkeypatch.setenv("ALOHA_MXU_CHAIN_WAYS", "2")
    monkeypatch.setenv("ALOHA_STREAM_BP", "2")  # 4 chunks of 2 -> 2 groups
    q, n, k = CFG.moduli[0], 1024, 3
    psi = pow(CFG.psi[0], CFG.n // n, q)
    root = pow(psi, q - 2, q) if inverse else psi
    rng = np.random.default_rng(11)
    a = rng.integers(0, q, size=(8, n), dtype=np.uint64)
    want = a
    for _ in range(k):
        want = (ntt_np.intt if inverse else ntt_np.ntt)(want, q, root)
    lo = jnp.asarray((a & 0xFFFFFFFF).astype(np.uint32).reshape(8, -1, 128))
    hi = jnp.asarray((a >> np.uint64(32)).astype(np.uint32).reshape(8, -1, 128))
    olo, ohi = ntt_mxu.ntt_chain_planes(lo, hi, q, root, k, inverse=inverse)
    got = (np.asarray(olo).astype(np.uint64)
           | (np.asarray(ohi).astype(np.uint64) << np.uint64(32)))
    assert np.array_equal(got.reshape(8, n), want)
