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
