"""Hoisted rotations (Halevi-Shoup): one key-switch head, many steps.

Beyond-reference feature: the reference's 122-instruction keyswitch
program re-runs its digit decompose + raise for every rotation
(sim/vp/isram_file_generator/keyswitch.mem); hoisting shares that head
across steps, valid here because the digits are plain residues (ring
homomorphisms commute with the Galois automorphism).  The oracle is
checked at decrypt level against plain rotation; the fused kernels are
checked word-exact against the oracle through the interpreter.
"""

import numpy as np
import pytest

from aloha_tpu import encoder, he_np, keys
from aloha_tpu.config import DEFAULT_CONFIG as CFG

L, N = CFG.n_limbs, CFG.n
S = N // 2
STEPS = [1, 2, 5]


@pytest.fixture(scope="module")
def material():
    rng = np.random.default_rng(21)
    sk = keys.gen_secret(CFG, np.random.default_rng(22))
    z = rng.uniform(-1, 1, size=S) + 1j * rng.uniform(-1, 1, size=S)
    pt = encoder.encode(encoder.cleartext_from_slots(z), CFG)
    q0 = CFG.moduli[0]
    signed = np.where(
        pt[0] > q0 // 2,
        pt[0].astype(np.int64) - np.int64(q0),
        pt[0].astype(np.int64),
    )
    ct = keys.encrypt(signed, sk, CFG, np.random.default_rng(23))
    ksks = [
        keys.gen_rotation_key(sk, s, CFG, np.random.default_rng(30 + s))
        for s in STEPS
    ]
    return sk, z, ct, ksks


def _slots(ct, sk):
    m = keys.decrypt(ct, sk, CFG)
    res = np.where(m < 0, m + np.int64(CFG.moduli[0]), m).astype(np.uint64)
    return encoder.decode(res[None, :], CFG, limb=0)


def test_oracle_decrypts_to_rotations(material):
    sk, z, ct, ksks = material
    outs = he_np.rotate_hoisted(ct, STEPS, ksks, CFG)
    for s, out in zip(STEPS, outs):
        err = np.abs(_slots(out, sk) - np.roll(z, -s)).max()
        assert err < 1e-4, f"step {s}: slot error {err}"


def test_oracle_matches_rotate_noise_envelope(material):
    """Hoisted and plain rotation use different (equally valid) digit
    lifts: outputs differ word-wise but decrypt to the same slots
    within the keyswitch noise envelope."""
    sk, _, ct, ksks = material
    outs = he_np.rotate_hoisted(ct, STEPS, ksks, CFG)
    for s, ksk, out in zip(STEPS, ksks, outs):
        ref = he_np.rotate(
            he_np.Ciphertext(a=ct.a.copy(), b=ct.b.copy()), s, ksk, CFG
        )
        diff = np.abs(_slots(out, sk) - _slots(ref, sk)).max()
        assert diff < 1e-4, f"step {s}: hoisted-vs-rotate {diff}"
        assert not (out.b == ref.b).all()  # different lift representatives


@pytest.mark.slow
@pytest.mark.parametrize("ks_ntt", ["stream", "mxu"])
def test_kernel_hoisted_matches_oracle(monkeypatch, material, ks_ntt):
    """The fused-kernel hoisted path (aut-free head kernel + per-step
    NTT-domain gather + tail kernel) is word-exact against the NumPy
    oracle, for both in-kernel transform modes."""
    pytest.importorskip("jax.experimental.pallas")
    from aloha_tpu import he_planes

    monkeypatch.setenv("ALOHA_STREAM_INTERPRET", "1")
    monkeypatch.setenv("ALOHA_KS_NTT", ks_ntt)
    monkeypatch.setenv("ALOHA_STREAM_BP", "2")
    monkeypatch.setenv("ALOHA_NTT_IMPL", "stream")
    _, _, ct, ksks = material
    steps = STEPS[:2]
    want = he_np.rotate_hoisted(ct, steps, ksks[:2], CFG)
    ctp = (he_planes.from_u64(ct.a), he_planes.from_u64(ct.b))
    kp = [he_planes.from_u64(k) for k in ksks[:2]]
    outs = he_planes.rotate_hoisted(ctp, steps, kp, CFG)
    for s, w, (oa, ob) in zip(steps, want, outs):
        assert np.array_equal(np.asarray(he_planes.to_u64(oa)), w.a), s
        assert np.array_equal(np.asarray(he_planes.to_u64(ob)), w.b), s


@pytest.mark.slow
def test_he_jax_surface_matches_oracle(monkeypatch, material):
    """The uint64 wrapper delegates to the plane path (one step to keep
    the interpret-mode cost down)."""
    pytest.importorskip("jax.experimental.pallas")
    from aloha_tpu import he_jax

    monkeypatch.setenv("ALOHA_STREAM_INTERPRET", "1")
    monkeypatch.setenv("ALOHA_STREAM_BP", "2")
    monkeypatch.setenv("ALOHA_NTT_IMPL", "stream")
    _, _, ct, ksks = material
    (oa, ob), = he_jax.rotate_hoisted((ct.a, ct.b), [1], [ksks[0]], CFG)
    want, = he_np.rotate_hoisted(ct, [1], [ksks[0]], CFG)
    assert np.array_equal(np.asarray(oa), want.a)
    assert np.array_equal(np.asarray(ob), want.b)


def test_oracle_three_limbs():
    """Hoisting is limb-count generic (the reference hardwires L=2):
    a 3-limb configuration decrypts hoisted rotations correctly."""
    from tests.test_multilimb import CFG3

    sk = keys.gen_secret(CFG3, np.random.default_rng(40))
    z = np.zeros(CFG3.n // 2, complex)
    z[:8] = np.arange(8) * 0.1
    pt = encoder.encode(encoder.cleartext_from_slots(z), CFG3)
    q0 = CFG3.moduli[0]
    signed = np.where(
        pt[0] > q0 // 2,
        pt[0].astype(np.int64) - np.int64(q0),
        pt[0].astype(np.int64),
    )
    ct = keys.encrypt(signed, sk, CFG3, np.random.default_rng(41))
    steps = [1, 3]
    ksks = [
        keys.gen_rotation_key(sk, s, CFG3, np.random.default_rng(42 + s))
        for s in steps
    ]
    outs = he_np.rotate_hoisted(ct, steps, ksks, CFG3)
    for s, out in zip(steps, outs):
        m = keys.decrypt(out, sk, CFG3)
        res = np.where(
            m < 0, m + np.int64(q0), m
        ).astype(np.uint64)
        got = encoder.decode(res[None, :], CFG3, limb=0)
        err = np.abs(got - np.roll(z, -s)).max()
        assert err < 1e-4, f"step {s}: slot error {err}"


@pytest.mark.slow
@pytest.mark.parametrize("ks_ntt", ["stream", "mxu"])
def test_kernel_hoisted_three_limbs_small_ring(monkeypatch, ks_ntt):
    """The hoisted kernel path is limb-count- and ring-degree-generic:
    3-limb (+P) at n=1024, word-exact vs the oracle in both in-kernel
    transform modes (config mirrors
    test_ntt_stream_interpret.test_fused_rotate_three_limbs_small_ring)."""
    pytest.importorskip("jax.experimental.pallas")
    from aloha_tpu import he_planes
    from aloha_tpu.config import HEConfig

    monkeypatch.setenv("ALOHA_STREAM_INTERPRET", "1")
    monkeypatch.setenv("ALOHA_KS_NTT", ks_ntt)
    monkeypatch.setenv("ALOHA_NTT_IMPL", "stream")
    cfg = HEConfig(
        n=1024,
        moduli=(
            576460752303439873,
            576460752303702017,
            576460752304439297,
            576460752304619521,
        ),
        psi=(
            94501300158356233,
            476326773003166877,
            148318682470543905,
            148537735488545494,
        ),
        ipsi=(
            351196243136101305,
            354588920078794975,
            101101274619666410,
            39851676782494322,
        ),
    )
    L, N = cfg.n_limbs, cfg.n
    rng = np.random.default_rng(17)
    a = rng.integers(0, cfg.moduli[0], size=(L, N), dtype=np.uint64)
    b = rng.integers(0, cfg.moduli[0], size=(L, N), dtype=np.uint64)
    sk = keys.gen_secret(cfg, rng=np.random.default_rng(3))
    steps = [1, 4]
    ksks = [
        keys.gen_rotation_key(sk, s, cfg, rng=np.random.default_rng(4 + s))
        for s in steps
    ]
    ct = he_np.Ciphertext(a=a.copy(), b=b.copy())
    want = he_np.rotate_hoisted(ct, steps, ksks, cfg)
    ctp = (he_planes.from_u64(a), he_planes.from_u64(b))
    outs = he_planes.rotate_hoisted(
        ctp, steps, [he_planes.from_u64(k) for k in ksks], cfg
    )
    for s, w, (oa, ob) in zip(steps, want, outs):
        assert np.array_equal(np.asarray(he_planes.to_u64(oa)), w.a), s
        assert np.array_equal(np.asarray(he_planes.to_u64(ob)), w.b), s


def test_rotate_batch_distinct_cts(monkeypatch, material):
    """rotate_batch: K DIFFERENT ciphertexts, each with its own step and
    key, in one aut-free head + one batched tail (per-chunk KSK selected
    by the grid index map).  Word-exact against the single-step hoisted
    oracle applied per ciphertext — the BSGS giant-step shape."""
    pytest.importorskip("jax.experimental.pallas")
    from aloha_tpu import he_planes

    monkeypatch.setenv("ALOHA_STREAM_INTERPRET", "1")
    monkeypatch.setenv("ALOHA_STREAM_BP", "2")
    monkeypatch.setenv("ALOHA_NTT_IMPL", "stream")
    _, _, ct, ksks = material
    # distinct ciphertexts: ct and a shifted variant of it
    rng = np.random.default_rng(77)
    delta = rng.integers(0, 2, size=ct.a.shape, dtype=np.uint64)
    ct2a = np.stack(
        [(ct.a[m] + delta[m]) % CFG.moduli[m] for m in range(L)]
    )
    ct2 = he_np.Ciphertext(a=ct2a, b=ct.b.copy())
    steps = STEPS[:2]
    cts_np = [ct, ct2]
    want = [
        he_np.rotate_hoisted(c, [s], [k], CFG)[0]
        for c, s, k in zip(cts_np, steps, ksks)
    ]
    cts_p = [
        (he_planes.from_u64(c.a), he_planes.from_u64(c.b)) for c in cts_np
    ]
    kp = [he_planes.from_u64(k) for k in ksks[:2]]
    outs = he_planes.rotate_batch(cts_p, steps, kp, CFG)
    for s, w, (oa, ob) in zip(steps, want, outs):
        assert np.array_equal(np.asarray(he_planes.to_u64(oa)), w.a), s
        assert np.array_equal(np.asarray(he_planes.to_u64(ob)), w.b), s


@pytest.mark.slow
def test_fallback_is_plain_rotations(monkeypatch, material):
    """With the fused kernels disabled the wrapper degrades to plain
    per-step rotations (no hoisting, same decrypt semantics)."""
    pytest.importorskip("jax.experimental.pallas")
    from aloha_tpu import he_planes

    monkeypatch.setenv("ALOHA_STREAM_INTERPRET", "1")
    monkeypatch.setenv("ALOHA_KS_KERNEL", "0")
    monkeypatch.setenv("ALOHA_STREAM_BP", "2")
    monkeypatch.setenv("ALOHA_NTT_IMPL", "stream")
    _, _, ct, ksks = material
    ctp = (he_planes.from_u64(ct.a), he_planes.from_u64(ct.b))
    kp = [he_planes.from_u64(ksks[0])]
    (oa, ob), = he_planes.rotate_hoisted(ctp, [1], kp, CFG)
    want = he_np.rotate(
        he_np.Ciphertext(a=ct.a.copy(), b=ct.b.copy()), 1, ksks[0], CFG
    )
    assert np.array_equal(np.asarray(he_planes.to_u64(oa)), want.a)
    assert np.array_equal(np.asarray(he_planes.to_u64(ob)), want.b)


def test_kernel_hoisted_traced_keys(monkeypatch, material):
    """Keys passed as JIT ARGUMENTS (tracers): the lazy-gather key
    preparation falls back to an in-trace jnp gather (no host Shoup
    prep), and the Barrett tail still matches the oracle word-for-word."""
    pytest.importorskip("jax.experimental.pallas")
    import jax

    from aloha_tpu import he_planes

    monkeypatch.setenv("ALOHA_STREAM_INTERPRET", "1")
    monkeypatch.setenv("ALOHA_STREAM_BP", "2")
    monkeypatch.setenv("ALOHA_NTT_IMPL", "stream")
    _, _, ct, ksks = material
    steps = STEPS[:1]
    want, = he_np.rotate_hoisted(ct, steps, ksks[:1], CFG)
    ctp = (he_planes.from_u64(ct.a), he_planes.from_u64(ct.b))
    kp = he_planes.from_u64(ksks[0])

    fn = jax.jit(
        lambda c, k: he_planes.rotate_hoisted(c, steps, [k], CFG)[0]
    )
    oa, ob = fn(ctp, kp)
    assert np.array_equal(np.asarray(he_planes.to_u64(oa)), want.a)
    assert np.array_equal(np.asarray(he_planes.to_u64(ob)), want.b)


def test_galois_hoisted_conjugate(monkeypatch, material):
    """Hoisted CONJUGATION (exponent 2N-1, self-inverse) through the
    shared galois_hoisted core — oracle vs kernel word-exact, and the
    oracle decrypts to conjugated slots."""
    pytest.importorskip("jax.experimental.pallas")
    from aloha_tpu import he_planes, keys

    monkeypatch.setenv("ALOHA_STREAM_INTERPRET", "1")
    monkeypatch.setenv("ALOHA_STREAM_BP", "2")
    monkeypatch.setenv("ALOHA_NTT_IMPL", "stream")
    sk, z, ct, _ = material
    cjk = keys.gen_conjugation_key(sk, CFG, np.random.default_rng(90))
    e = 2 * N - 1
    want, = he_np.galois_hoisted(ct, [e], [cjk], CFG)
    got = _slots(want, sk)
    assert np.abs(got - np.conj(z)).max() < 1e-4
    ctp = (he_planes.from_u64(ct.a), he_planes.from_u64(ct.b))
    (oa, ob), = he_planes.galois_hoisted(
        ctp, [e], [he_planes.from_u64(cjk)], CFG
    )
    assert np.array_equal(np.asarray(he_planes.to_u64(oa)), want.a)
    assert np.array_equal(np.asarray(he_planes.to_u64(ob)), want.b)
