"""CPU (interpret-mode) bit-exactness of the streaming NTT kernel.

The streaming kernel's math previously had hardware-only coverage
(tests/test_tpu_hw.py); ALOHA_STREAM_INTERPRET=1 runs the same pallas
body through the interpreter so every formulation (static/dyn row
stages, pair/roll lane stages) is certified against the NumPy golden
model in CI.  Small batches only — interpret mode is slow.

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


def _run(nb, q, psi, ipsi):
    import jax.numpy as jnp

    from aloha_tpu.ops import ntt_stream

    rng = np.random.default_rng(nb)
    a = rng.integers(0, q, size=(nb, CFG.n), dtype=np.uint64)
    want = np.stack([ntt_np.ntt(a[i], q, psi) for i in range(nb)])
    got = np.asarray(ntt_stream.ntt(jnp.asarray(a), q, psi))
    assert np.array_equal(got, want)
    back = np.asarray(ntt_stream.intt(jnp.asarray(got), q, ipsi))
    assert np.array_equal(back, a)


@pytest.mark.parametrize("mode", ["pair", "roll"])
def test_lane_modes(monkeypatch, mode):
    monkeypatch.setenv("ALOHA_STREAM_LANEMODE", mode)
    monkeypatch.setenv("ALOHA_STREAM_BP", "2")
    _run(2, CFG.moduli[0], CFG.psi[0], CFG.ipsi[0])


@pytest.mark.parametrize("rowmode", ["static", "dyn"])
def test_row_modes(monkeypatch, rowmode):
    monkeypatch.setenv("ALOHA_STREAM_ROWMODE", rowmode)
    monkeypatch.setenv("ALOHA_STREAM_BP", "2")
    _run(2, CFG.moduli[1], CFG.psi[1], CFG.ipsi[1])


def test_odd_bp_falls_back_to_roll(monkeypatch):
    # nb=1 forces bp=1: the pair path requires even bp and must fall back
    monkeypatch.setenv("ALOHA_STREAM_BP", "4")
    _run(1, CFG.special_prime, CFG.psi[-1], CFG.ipsi[-1])


@pytest.mark.parametrize("mul", ["limb", "limb10", "sloppy"])
@pytest.mark.parametrize("rowmode", ["static", "dyn"])
def test_mul_modes(monkeypatch, mul, rowmode):
    # limb10 drops 3 quotient products and rides [0, 16q); every mul mode
    # must stay bit-exact in every stage formulation
    monkeypatch.setenv("ALOHA_STREAM_MUL", mul)
    monkeypatch.setenv("ALOHA_STREAM_ROWMODE", rowmode)
    monkeypatch.setenv("ALOHA_STREAM_BP", "2")
    _run(2, CFG.moduli[0], CFG.psi[0], CFG.ipsi[0])


@pytest.mark.parametrize(
    "ks_kernel,ks_ntt",
    [
        # one combo stays in the fast default suite; the rest are
        # full-run-only (the interpreter makes each ~25 s)
        pytest.param("1", "stream", marks=pytest.mark.slow),
        ("1", "mxu"),
        pytest.param("0", "stream", marks=pytest.mark.slow),
    ],
)
def test_fused_rotate_matches_he_np(monkeypatch, ks_kernel, ks_ntt):
    """All fused rotates — the 2-launch ks_kernel path (in-kernel
    automorphism) with either in-kernel transform (butterfly stage loops
    or the 4-step MXU digit matmuls) and the 4-launch multi-modulus
    path — are bit-identical to the NumPy oracle, end to end through
    the interpreter."""
    import jax.numpy as jnp  # noqa: F401

    from aloha_tpu import he_np, he_planes, keys

    monkeypatch.setenv("ALOHA_KS_KERNEL", ks_kernel)
    monkeypatch.setenv("ALOHA_KS_NTT", ks_ntt)
    monkeypatch.setenv("ALOHA_STREAM_BP", "2")
    monkeypatch.setenv("ALOHA_NTT_IMPL", "stream")
    rng = np.random.default_rng(11)
    L, N = CFG.n_limbs, CFG.n
    a = rng.integers(0, CFG.moduli[0], size=(L, N), dtype=np.uint64)
    b = rng.integers(0, CFG.moduli[0], size=(L, N), dtype=np.uint64)
    sk = keys.gen_secret(CFG, rng=np.random.default_rng(1))
    ksk = keys.gen_rotation_key(sk, 2, CFG, rng=np.random.default_rng(2))
    ct = (he_planes.from_u64(a), he_planes.from_u64(b))
    oa, ob = he_planes.rotate(ct, 2, he_planes.from_u64(ksk), CFG)
    want = he_np.rotate(
        he_np.Ciphertext(a=a.copy(), b=b.copy()), 2, ksk, CFG
    )
    assert np.array_equal(np.asarray(he_planes.to_u64(oa)), want.a)
    assert np.array_equal(np.asarray(he_planes.to_u64(ob)), want.b)


@pytest.mark.slow
def test_fused_conjugate_matches_he_np(monkeypatch):
    """Conjugation (Galois e = 2N-1) through the fused kernels — the
    in-kernel automorphism constants at the negation exponent — is
    bit-identical to the oracle."""
    from aloha_tpu import he_np, he_planes, keys

    monkeypatch.setenv("ALOHA_KS_KERNEL", "1")
    monkeypatch.setenv("ALOHA_STREAM_BP", "2")
    monkeypatch.setenv("ALOHA_NTT_IMPL", "stream")
    rng = np.random.default_rng(19)
    L, N = CFG.n_limbs, CFG.n
    a = rng.integers(0, CFG.moduli[0], size=(L, N), dtype=np.uint64)
    b = rng.integers(0, CFG.moduli[0], size=(L, N), dtype=np.uint64)
    sk = keys.gen_secret(CFG, rng=np.random.default_rng(5))
    cjk = keys.gen_conjugation_key(sk, CFG, rng=np.random.default_rng(6))
    ct = (he_planes.from_u64(a), he_planes.from_u64(b))
    oa, ob = he_planes.conjugate(ct, he_planes.from_u64(cjk), CFG)
    want = he_np.conjugate(
        he_np.Ciphertext(a=a.copy(), b=b.copy()), cjk, CFG
    )
    assert np.array_equal(np.asarray(he_planes.to_u64(oa)), want.a)
    assert np.array_equal(np.asarray(he_planes.to_u64(ob)), want.b)


@pytest.mark.slow
def test_fused_relin_rescale_matches_he_np(monkeypatch):
    """relinearize + rescale through the fused streaming launches are
    bit-identical to the NumPy oracle."""
    from aloha_tpu import he_np, he_planes, keys

    monkeypatch.setenv("ALOHA_STREAM_BP", "2")
    monkeypatch.setenv("ALOHA_NTT_IMPL", "stream")
    rng = np.random.default_rng(13)
    L, N = CFG.n_limbs, CFG.n
    mk = lambda s: rng.integers(0, CFG.moduli[0], size=(L, N), dtype=np.uint64)  # noqa: E731
    a1, b1, a2, b2 = mk(0), mk(1), mk(2), mk(3)
    sk = keys.gen_secret(CFG, rng=np.random.default_rng(8))
    rlk = keys.gen_relin_key(sk, CFG, rng=np.random.default_rng(9))
    d0, d1, d2 = he_planes.ct_mul(
        (he_planes.from_u64(a1), he_planes.from_u64(b1)),
        (he_planes.from_u64(a2), he_planes.from_u64(b2)), CFG,
    )
    out = he_planes.relinearize(d0, d1, d2, he_planes.from_u64(rlk), CFG)
    w0, w1, w2 = he_np.ct_mul(
        he_np.Ciphertext(a=a1.copy(), b=b1.copy()),
        he_np.Ciphertext(a=a2.copy(), b=b2.copy()), CFG,
    )
    want = he_np.relinearize(w0, w1, w2, rlk, CFG)
    assert np.array_equal(np.asarray(he_planes.to_u64(out[0])), want.a)
    assert np.array_equal(np.asarray(he_planes.to_u64(out[1])), want.b)
    rs = he_planes.rescale(out, CFG)
    want_rs = he_np.rescale(want, CFG)
    assert np.array_equal(np.asarray(he_planes.to_u64(rs[0])), want_rs.a)
    assert np.array_equal(np.asarray(he_planes.to_u64(rs[1])), want_rs.b)


@pytest.mark.slow
def test_multi_modulus_launch(monkeypatch):
    """One launch, three groups, three moduli == three single launches."""
    import jax.numpy as jnp

    from aloha_tpu.ops import ntt_stream

    monkeypatch.setenv("ALOHA_STREAM_BP", "2")
    qs = (CFG.moduli[0], CFG.moduli[1], CFG.special_prime)
    psis = (CFG.psi[0], CFG.psi[1], CFG.psi[-1])
    ipsis = (CFG.ipsi[0], CFG.ipsi[1], CFG.ipsi[-1])
    rows = CFG.n // 128
    rng = np.random.default_rng(5)
    a = np.stack(
        [
            rng.integers(0, q, size=(2, CFG.n), dtype=np.uint64)
            for q in qs
        ]
    )
    alo = jnp.asarray((a & 0xFFFFFFFF).astype(np.uint32)).reshape(
        3, 2, rows, 128
    )
    ahi = jnp.asarray((a >> np.uint64(32)).astype(np.uint32)).reshape(
        3, 2, rows, 128
    )
    olo, ohi = ntt_stream.ntt_planes_multi(alo, ahi, qs, psis)
    got = (
        np.asarray(olo).astype(np.uint64)
        | (np.asarray(ohi).astype(np.uint64) << 32)
    ).reshape(3, 2, CFG.n)
    for m, (q, psi) in enumerate(zip(qs, psis)):
        for i in range(2):
            assert np.array_equal(got[m, i], ntt_np.ntt(a[m, i], q, psi))
    blo, bhi = ntt_stream.intt_planes_multi(olo, ohi, qs, ipsis)
    back = (
        np.asarray(blo).astype(np.uint64)
        | (np.asarray(bhi).astype(np.uint64) << 32)
    ).reshape(3, 2, CFG.n)
    assert np.array_equal(back, a)


@pytest.mark.slow
@pytest.mark.parametrize("ks_ntt", ["stream", "mxu"])
def test_fused_rotate_three_limbs_small_ring(monkeypatch, ks_ntt):
    """The fused ks_head/ks_tail kernels are limb-count- and ring-degree-
    generic in BOTH transform modes: a 3-limb (+P) configuration at
    n=1024 rotates bit-identically to the NumPy oracle (the reference
    hardwires 2 limbs and n=8192, src/top/h2_top.sv:31-32)."""
    from aloha_tpu import he_np, he_planes, keys
    from aloha_tpu.config import HEConfig

    monkeypatch.setenv("ALOHA_KS_KERNEL", "1")
    monkeypatch.setenv("ALOHA_KS_NTT", ks_ntt)
    monkeypatch.setenv("ALOHA_NTT_IMPL", "stream")
    # 2048-th roots derived from test_multilimb's 16384-th roots (psi^8)
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
    ksk = keys.gen_rotation_key(sk, 4, cfg, rng=np.random.default_rng(4))
    ct = (he_planes.from_u64(a), he_planes.from_u64(b))
    oa, ob = he_planes.rotate(ct, 4, he_planes.from_u64(ksk), cfg)
    want = he_np.rotate(
        he_np.Ciphertext(a=a.copy(), b=b.copy()), 4, ksk, cfg
    )
    assert np.array_equal(np.asarray(he_planes.to_u64(oa)), want.a)
    assert np.array_equal(np.asarray(he_planes.to_u64(ob)), want.b)


@pytest.mark.slow
def test_prepared_ksk_survives_retracing(monkeypatch):
    """prepare_ksk is reached from INSIDE jit when the key is closed over
    concretely; its cached planes must be trace-independent.  Regression:
    the cache used to hold jnp constants minted during the first trace,
    and the second jit of the same key died with UnexpectedTracerError."""
    import jax

    from aloha_tpu import he_np, he_planes, keys
    from aloha_tpu.config import HEConfig

    monkeypatch.setenv("ALOHA_KS_KERNEL", "1")
    monkeypatch.setenv("ALOHA_NTT_IMPL", "stream")
    cfg = HEConfig(
        n=1024,
        moduli=(576460752303439873, 576460752303702017),
        psi=(94501300158356233, 476326773003166877),
        ipsi=(351196243136101305, 354588920078794975),
    )
    L, N = cfg.n_limbs, cfg.n
    rng = np.random.default_rng(23)
    a = rng.integers(0, cfg.moduli[0], size=(L, N), dtype=np.uint64)
    b = rng.integers(0, cfg.moduli[0], size=(L, N), dtype=np.uint64)
    sk = keys.gen_secret(cfg, rng=np.random.default_rng(5))
    ksk = keys.gen_rotation_key(sk, 2, cfg, rng=np.random.default_rng(6))
    pk = he_planes.from_u64(ksk)

    def rot1(pa, pb):
        return he_planes.rotate((pa, pb), 2, pk, cfg)

    def rot2(pa, pb):  # a distinct jit -> a second trace of the same key
        oa, ob = he_planes.rotate((pa, pb), 2, pk, cfg)
        return oa, ob

    pa, pb = he_planes.from_u64(a), he_planes.from_u64(b)
    oa, ob = jax.jit(rot1)(pa, pb)
    oa2, ob2 = jax.jit(rot2)(pa, pb)
    want = he_np.rotate(
        he_np.Ciphertext(a=a.copy(), b=b.copy()), 2, ksk, cfg
    )
    for got in (oa, oa2):
        assert np.array_equal(np.asarray(he_planes.to_u64(got)), want.a)
    for got in (ob, ob2):
        assert np.array_equal(np.asarray(he_planes.to_u64(got)), want.b)
