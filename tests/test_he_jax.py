"""JAX functional HE ops vs golden vectors and the NumPy model."""

import jax
import numpy as np
import pytest

from aloha_tpu import he_jax
from aloha_tpu.config import DEFAULT_CONFIG as CFG

from conftest import load_tv, requires_tv

N = CFG.n
RNG = np.random.default_rng(5)


def _ct(flat):
    polys = np.asarray(flat, dtype=np.uint64).reshape(4, N)
    return (polys[:2].copy(), polys[2:].copy())  # (a, b) each (L, N)


@requires_tv
def test_hom_add_mul_plain_golden():
    case = "case1_8_8"
    ct1 = _ct(load_tv(case, "kernel9_ct_before_homaddct1"))
    ct2 = _ct(load_tv(case, "kernel9_ct_before_homaddct2"))
    f = jax.jit(lambda x, y: he_jax.hom_add(x, y, CFG))
    a, b = f(ct1, ct2)
    want = load_tv(case, "kernel9_ct_after_homadd").reshape(4, N)
    assert (np.asarray(a) == want[:2]).all() and (np.asarray(b) == want[2:]).all()

    ct = _ct(load_tv(case, "kernel3_ct_before_mulplain"))
    pt = load_tv(case, "kernel3_pt_before_mulplain").reshape(2, N)
    g = jax.jit(lambda x, y: he_jax.mul_plain(x, y, CFG))
    a, b = g(ct, pt)
    want = load_tv(case, "kernel3_ct_after_mulplain").reshape(4, N)
    assert (np.asarray(a) == want[:2]).all() and (np.asarray(b) == want[2:]).all()


@requires_tv
def test_encode_post_golden():
    case = "case1_8_8"
    pre = load_tv(case, "kernel1_pt_after_encode_fft_mod").reshape(2, N)
    want = load_tv(case, "kernel1_pt_after_encode").reshape(2, N)
    f = jax.jit(lambda x: he_jax.encode_post(x, CFG))
    assert (np.asarray(f(pre)) == want).all()


@requires_tv
def test_rotate_golden_and_batched():
    case = "case1_8_8"
    ct = _ct(load_tv(case, "kernel5_ct_before_rotate"))
    ksk = load_tv(case, "ksk_step2").reshape(12, N)
    want = load_tv(case, "kernel5_ct_after_rotate").reshape(4, N)
    f = jax.jit(lambda c, k: he_jax.rotate(c, 2, k, CFG))
    a, b = f(ct, ksk)
    assert (np.asarray(a) == want[:2]).all() and (np.asarray(b) == want[2:]).all()

    # batch of 3 (same ct tripled): every batch element must match
    ab = np.broadcast_to(ct[0], (3,) + ct[0].shape).copy()
    bb = np.broadcast_to(ct[1], (3,) + ct[1].shape).copy()
    a3, b3 = f((ab, bb), ksk)
    for i in range(3):
        assert (np.asarray(a3)[i] == want[:2]).all()
        assert (np.asarray(b3)[i] == want[2:]).all()


def test_ct_mul_relin_rescale_u64_surface():
    """The he_jax u64 wrappers match he_np exactly."""
    from aloha_tpu import he_np, keys

    rng = np.random.default_rng(21)
    L, N = CFG.n_limbs, CFG.n
    mk = lambda: rng.integers(0, CFG.moduli[0], size=(L, N), dtype=np.uint64)  # noqa: E731
    a1, b1, a2, b2 = mk(), mk(), mk(), mk()
    sk = keys.gen_secret(CFG, rng=np.random.default_rng(8))
    rlk = keys.gen_relin_key(sk, CFG, rng=np.random.default_rng(9))
    d = he_jax.ct_mul((a1, b1), (a2, b2), CFG)
    w = he_np.ct_mul(
        he_np.Ciphertext(a=a1.copy(), b=b1.copy()),
        he_np.Ciphertext(a=a2.copy(), b=b2.copy()), CFG,
    )
    for got, want in zip(d, w):
        assert np.array_equal(np.asarray(got), want)
    out = he_jax.relinearize(*d, rlk, CFG)
    want_ct = he_np.relinearize(*w, rlk, CFG)
    assert np.array_equal(np.asarray(out[0]), want_ct.a)
    assert np.array_equal(np.asarray(out[1]), want_ct.b)
    rs = he_jax.rescale(out, CFG)
    want_rs = he_np.rescale(want_ct, CFG)
    assert np.array_equal(np.asarray(rs[0]), want_rs.a)
    assert np.array_equal(np.asarray(rs[1]), want_rs.b)
