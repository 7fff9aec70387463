"""Unit tests for the limb-quotient kernel math (streaming NTT round 2b).

The in-kernel multiply is rebuilt from three primitives; each is certified
here against exact big-integer arithmetic on the CPU backend:

- rns_jax.mul_q_lo: lo64(t*q) as a shift-add chain over q's set bits
- ntt_stream._mul64_hi_limb: hi64(x*s) from 16-bit limb planes, quotient
  error in {0, 1}
- ntt_stream._shoup_mul_limb: x*w mod q with output window [0, 3q)

(reference: the DSP modmul chain these replace, src/vp/vxu/modmul.sv —
same math, TPU-native u32 vector formulation)
"""

import numpy as np
import pytest

from aloha_tpu import rns_jax as r32
from aloha_tpu.config import DEFAULT_CONFIG as CFG
from aloha_tpu.ops import ntt_stream as S


def _split(v):
    return (
        (v & np.uint64(0xFFFFFFFF)).astype(np.uint32),
        (v >> np.uint64(32)).astype(np.uint32),
    )


def _join(lo, hi):
    return np.asarray(lo).astype(np.uint64) | (
        np.asarray(hi).astype(np.uint64) << np.uint64(32)
    )


ALL_Q = list(CFG.moduli) + [CFG.special_prime]


@pytest.mark.parametrize("q", ALL_Q)
def test_mul_q_lo_exact(q):
    rng = np.random.default_rng(q & 0xFFFF)
    t = rng.integers(0, 1 << 64, size=20000, dtype=np.uint64)
    lo, hi = r32.mul_q_lo(*_split(t), q)
    assert np.array_equal(_join(lo, hi), t * np.uint64(q))


def test_mul_q_lo_cost_sparse():
    # the default moduli must take the cheap chain, not the fallback
    for q in ALL_Q:
        assert r32.mul_q_lo_cost(q) <= 26


@pytest.mark.parametrize("q", ALL_Q)
def test_mul64_hi_limb_quotient_error(q):
    rng = np.random.default_rng(1)
    # x covers the full ride window [0, 8q) < 2^63
    x = rng.integers(0, 8 * q, size=5000, dtype=np.uint64)
    w = rng.integers(0, q, size=5000, dtype=np.uint64)
    s = np.array([(int(wi) << 64) // q for wi in w.tolist()], dtype=np.uint64)
    slo, shi = _split(s)
    m = np.uint32(0xFFFF)
    t_lo, t_hi = S._mul64_hi_limb(
        *_split(x), slo & m, slo >> 16, shi & m, shi >> 16
    )
    t_hat = _join(t_lo, t_hi)
    t_exact = np.array(
        [(int(a) * int(b)) >> 64 for a, b in zip(x.tolist(), s.tolist())],
        dtype=np.uint64,
    )
    err = t_exact.astype(np.int64) - t_hat.astype(np.int64)
    assert err.min() >= 0 and err.max() <= 1


@pytest.mark.parametrize("q", ALL_Q)
def test_shoup_mul_limb_window(q):
    rng = np.random.default_rng(2)
    x = rng.integers(0, 8 * q, size=5000, dtype=np.uint64)
    w = rng.integers(0, q, size=5000, dtype=np.uint64)
    s = np.array([(int(wi) << 64) // q for wi in w.tolist()], dtype=np.uint64)
    slo, shi = _split(s)
    m = np.uint32(0xFFFF)
    ylo, yhi = S._shoup_mul_limb(
        *_split(x), *_split(w), slo & m, slo >> 16, shi & m, shi >> 16, q
    )
    y = _join(ylo, yhi)
    exact = np.array(
        [(int(a) * int(b)) % q for a, b in zip(x.tolist(), w.tolist())],
        dtype=np.uint64,
    )
    k = (y - exact).astype(np.int64)
    assert (k % np.int64(q) == 0).all()
    assert (y < np.uint64(3 * q)).all()


def test_tables6_matches_packed():
    q, psi = CFG.moduli[0], CFG.psi[0]
    from aloha_tpu.ops import ntt_pallas as K

    wl, wh, sl, sh = K._tables_np(CFG.n, psi, q, False)
    w6 = S._tables6_np(CFG.n, psi, q, False)
    assert np.array_equal(w6[0], wl) and np.array_equal(w6[1], wh)
    assert np.array_equal(w6[2] | (w6[3] << np.uint32(16)), sl)
    assert np.array_equal(w6[4] | (w6[5] << np.uint32(16)), sh)
