"""u32-plane HE ops are bit-identical to the u64 he_jax/he_np paths."""
import numpy as np
import pytest

from aloha_tpu import he_jax, he_np, he_planes, keys
from aloha_tpu.config import DEFAULT_CONFIG as CFG

L, N = CFG.n_limbs, CFG.n


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(3)
    a = rng.integers(0, CFG.moduli[0], size=(L, N), dtype=np.uint64)
    b = rng.integers(0, CFG.moduli[0], size=(L, N), dtype=np.uint64)
    pt = rng.integers(0, CFG.moduli[0], size=(L, N), dtype=np.uint64)
    sk = keys.gen_secret(CFG, rng=np.random.default_rng(1))
    ksk = keys.gen_rotation_key(sk, 2, CFG, rng=np.random.default_rng(2))
    return a, b, pt, ksk


def test_conversion_roundtrip(data):
    a, *_ = data
    p = he_planes.from_u64(a)
    assert np.array_equal(np.asarray(he_planes.to_u64(p)), a)


def test_hom_add(data):
    a, b, _, _ = data
    ct = (he_planes.from_u64(a), he_planes.from_u64(b))
    out = he_planes.hom_add(ct, ct, CFG)
    want = he_jax.hom_add((a, b), (a, b), CFG)
    assert np.array_equal(np.asarray(he_planes.to_u64(out[0])), np.asarray(want[0]))
    assert np.array_equal(np.asarray(he_planes.to_u64(out[1])), np.asarray(want[1]))


def test_mul_plain(data):
    a, b, pt, _ = data
    ct = (he_planes.from_u64(a), he_planes.from_u64(b))
    out = he_planes.mul_plain(ct, he_planes.from_u64(pt), CFG)
    want = he_jax.mul_plain((a, b), pt, CFG)
    assert np.array_equal(np.asarray(he_planes.to_u64(out[0])), np.asarray(want[0]))
    assert np.array_equal(np.asarray(he_planes.to_u64(out[1])), np.asarray(want[1]))


def test_encode_post(data):
    _, _, pt, _ = data
    out = he_planes.encode_post(he_planes.from_u64(pt), CFG)
    want = he_jax.encode_post(pt, CFG)
    assert np.array_equal(np.asarray(he_planes.to_u64(out)), np.asarray(want))


def test_rotate(data):
    a, b, _, ksk = data
    ct = (he_planes.from_u64(a), he_planes.from_u64(b))
    out = he_planes.rotate(ct, 2, he_planes.from_u64(ksk), CFG)
    want = he_np.rotate(he_np.Ciphertext(a=a.copy(), b=b.copy()), 2, ksk, CFG)
    assert np.array_equal(np.asarray(he_planes.to_u64(out[0])), want.a)
    assert np.array_equal(np.asarray(he_planes.to_u64(out[1])), want.b)


def test_hom_sub(data):
    a, b, _, _ = data
    rng = np.random.default_rng(31)
    a2 = rng.integers(0, CFG.moduli[0], size=a.shape, dtype=np.uint64)
    b2 = rng.integers(0, CFG.moduli[0], size=b.shape, dtype=np.uint64)
    ct1 = (he_planes.from_u64(a), he_planes.from_u64(b))
    ct2 = (he_planes.from_u64(a2), he_planes.from_u64(b2))
    out = he_planes.hom_sub(ct1, ct2, CFG)
    want = he_np.hom_sub(
        he_np.Ciphertext(a=a.copy(), b=b.copy()),
        he_np.Ciphertext(a=a2.copy(), b=b2.copy()), CFG,
    )
    assert np.array_equal(np.asarray(he_planes.to_u64(out[0])), want.a)
    assert np.array_equal(np.asarray(he_planes.to_u64(out[1])), want.b)


def test_add_plain(data):
    a, b, pt, _ = data
    ct = (he_planes.from_u64(a), he_planes.from_u64(b))
    out = he_planes.add_plain(ct, he_planes.from_u64(pt), CFG)
    want = he_np.add_plain(
        he_np.Ciphertext(a=a.copy(), b=b.copy()), pt, CFG
    )
    assert np.array_equal(np.asarray(he_planes.to_u64(out[0])), want.a)
    assert np.array_equal(np.asarray(he_planes.to_u64(out[1])), want.b)


def test_galois_and_conjugate(data):
    """galois at 3^step == rotate word-exact; conjugate (e = 2N-1)
    matches the he_np oracle (plane-surface parity with he_np's round-3
    additions)."""
    a, b, _, ksk = data
    ct = (he_planes.from_u64(a), he_planes.from_u64(b))
    kp = he_planes.from_u64(ksk)
    og = he_planes.galois(ct, pow(3, 2, 2 * N), kp, CFG)
    orot = he_planes.rotate(ct, 2, kp, CFG)
    for g, r in zip(og, orot):
        assert np.array_equal(
            np.asarray(he_planes.to_u64(g)), np.asarray(he_planes.to_u64(r))
        )
    sk = keys.gen_secret(CFG, rng=np.random.default_rng(1))
    cjk = keys.gen_conjugation_key(sk, CFG, rng=np.random.default_rng(33))
    oc = he_planes.conjugate(ct, he_planes.from_u64(cjk), CFG)
    want = he_np.conjugate(
        he_np.Ciphertext(a=a.copy(), b=b.copy()), cjk, CFG
    )
    assert np.array_equal(np.asarray(he_planes.to_u64(oc[0])), want.a)
    assert np.array_equal(np.asarray(he_planes.to_u64(oc[1])), want.b)


def test_batched_rotate_matches_per_ct(data):
    """Batch axis polymorphism: a (B, L, N) batch rotates identically to
    per-ciphertext calls (the TPU-native throughput story)."""
    rng = np.random.default_rng(9)
    B = 3
    a = rng.integers(0, CFG.moduli[0], size=(B, L, N), dtype=np.uint64)
    b = rng.integers(0, CFG.moduli[0], size=(B, L, N), dtype=np.uint64)
    _, _, _, ksk = data
    ct = (he_planes.from_u64(a), he_planes.from_u64(b))
    out = he_planes.rotate(ct, 2, he_planes.from_u64(ksk), CFG)
    oa = np.asarray(he_planes.to_u64(out[0]))
    ob = np.asarray(he_planes.to_u64(out[1]))
    for i in range(B):
        want = he_np.rotate(
            he_np.Ciphertext(a=a[i].copy(), b=b[i].copy()), 2, ksk, CFG
        )
        assert np.array_equal(oa[i], want.a)
        assert np.array_equal(ob[i], want.b)


def test_ct_mul_relin_rescale(data):
    """ct x ct multiply, relinearize, rescale on planes are bit-identical
    to the he_np oracle (the reference ships only ct x pt; these extend
    the op set per BASELINE.json, matching he_np.ct_mul/relinearize/
    rescale exactly)."""
    a, b, _, _ = data
    rng = np.random.default_rng(7)
    a2 = rng.integers(0, CFG.moduli[0], size=a.shape, dtype=np.uint64)
    b2 = rng.integers(0, CFG.moduli[0], size=b.shape, dtype=np.uint64)
    sk = keys.gen_secret(CFG, rng=np.random.default_rng(8))
    rlk = keys.gen_relin_key(sk, CFG, rng=np.random.default_rng(9))

    ct1 = (he_planes.from_u64(a), he_planes.from_u64(b))
    ct2 = (he_planes.from_u64(a2), he_planes.from_u64(b2))
    d0, d1, d2 = he_planes.ct_mul(ct1, ct2, CFG)
    w0, w1, w2 = he_np.ct_mul(
        he_np.Ciphertext(a=a.copy(), b=b.copy()),
        he_np.Ciphertext(a=a2.copy(), b=b2.copy()),
        CFG,
    )
    for got, want in ((d0, w0), (d1, w1), (d2, w2)):
        assert np.array_equal(np.asarray(he_planes.to_u64(got)), want)

    out = he_planes.relinearize(d0, d1, d2, he_planes.from_u64(rlk), CFG)
    want_ct = he_np.relinearize(w0, w1, w2, rlk, CFG)
    assert np.array_equal(np.asarray(he_planes.to_u64(out[0])), want_ct.a)
    assert np.array_equal(np.asarray(he_planes.to_u64(out[1])), want_ct.b)

    rs = he_planes.rescale(out, CFG)
    want_rs = he_np.rescale(want_ct, CFG)
    assert np.array_equal(np.asarray(he_planes.to_u64(rs[0])), want_rs.a)
    assert np.array_equal(np.asarray(he_planes.to_u64(rs[1])), want_rs.b)
