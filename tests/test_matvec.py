"""Encrypted matrix-vector product (diagonal method, BSGS + hoisting).

The standard CKKS linear-transform workload, built on rotate_hoisted:
only g-1 hoisted + b-1 plain rotations for D diagonals.  The oracle is
checked at decrypt level (the 0.15 envelope every rescale-path test at
this parameterization uses — the reference's own Delta=2^38 / 60-bit
limb trade); the plane path is checked word-exact against the oracle.
"""

import numpy as np
import pytest

from aloha_tpu import encoder, he_np, keys
from aloha_tpu.config import DEFAULT_CONFIG as CFG

S = CFG.n // 2
D, G = 4, 2


@pytest.fixture(scope="module")
def material():
    rng = np.random.default_rng(50)
    sk = keys.gen_secret(CFG, np.random.default_rng(51))
    z = rng.uniform(-1, 1, size=S) + 1j * rng.uniform(-1, 1, size=S)
    pt = encoder.encode(encoder.cleartext_from_slots(z), CFG)
    q0 = CFG.moduli[0]
    signed = np.where(
        pt[0] > q0 // 2,
        pt[0].astype(np.int64) - np.int64(q0),
        pt[0].astype(np.int64),
    )
    ct = keys.encrypt(signed, sk, CFG, np.random.default_rng(52))
    dvecs = [rng.uniform(-1, 1, size=S) for _ in range(D)]
    diags = [
        he_np.encode_post(
            encoder.encode(encoder.cleartext_from_slots(d + 0j), CFG), CFG
        )
        for d in dvecs
    ]
    ksb = [
        keys.gen_rotation_key(sk, j, CFG, np.random.default_rng(60 + j))
        for j in range(1, G)
    ]
    ksg = [
        keys.gen_rotation_key(sk, G * i, CFG, np.random.default_rng(70 + i))
        for i in range(1, (D + G - 1) // G)
    ]
    return sk, z, ct, dvecs, diags, ksb, ksg


def _slots_rescaled(ct_out, sk):
    """Decode a once-rescaled ciphertext at its Delta^2/q1 scale."""
    out = he_np.rescale(ct_out, CFG)
    m = keys.decrypt(out, sk, CFG)
    q0 = CFG.moduli[0]
    res = np.where(m < 0, m + np.int64(q0), m).astype(np.uint64)
    got = encoder.decode(res[None, :], CFG, limb=0)
    return got * (CFG.moduli[1] / encoder.DELTA)  # undo residual scale


def test_oracle_matvec(material):
    sk, z, ct, dvecs, diags, ksb, ksg = material
    want = sum(np.asarray(d) * np.roll(z, -k) for k, d in enumerate(dvecs))
    out = he_np.matvec_bsgs(ct, diags, ksb, ksg, CFG, g=G)
    err = np.abs(_slots_rescaled(out, sk) - want).max()
    assert err < 0.15, err  # rescale-path envelope (see test_keys)


def test_oracle_matvec_uneven_groups(material):
    """D not divisible by g: the last giant group is short (the k >= D
    break path)."""
    sk, z, ct, dvecs, diags, ksb, ksg = material
    D3 = 3  # g=2, b=2, last group holds one diagonal
    want = sum(
        np.asarray(d) * np.roll(z, -k) for k, d in enumerate(dvecs[:D3])
    )
    out = he_np.matvec_bsgs(ct, diags[:D3], ksb, ksg, CFG, g=G)
    err = np.abs(_slots_rescaled(out, sk) - want).max()
    assert err < 0.15, err


def test_pt_rotate_matches_ct_semantics(material):
    """pt_rotate(encode(z), r) decodes to roll(z, -r) — the free public
    counterpart of the keyed ciphertext rotation."""
    _, z, _, dvecs, diags, *_ = material
    rot = he_np.pt_rotate(diags[0], 3, CFG)
    got = encoder.decode(
        he_np.nttm.intt_cfg(rot[0], CFG, 0)[None, :], CFG, limb=0
    )
    assert np.abs(got - np.roll(dvecs[0], -3)).max() < 1e-4


@pytest.mark.slow
def test_planes_match_oracle(monkeypatch, material):
    """The plane path (hoisted kernels + gathers) is word-exact against
    the NumPy oracle end to end."""
    pytest.importorskip("jax.experimental.pallas")
    from aloha_tpu import he_planes

    monkeypatch.setenv("ALOHA_STREAM_INTERPRET", "1")
    monkeypatch.setenv("ALOHA_STREAM_BP", "2")
    monkeypatch.setenv("ALOHA_NTT_IMPL", "stream")
    _, _, ct, _, diags, ksb, ksg = material
    want = he_np.matvec_bsgs(ct, diags, ksb, ksg, CFG, g=G)
    ctp = (he_planes.from_u64(ct.a), he_planes.from_u64(ct.b))
    dp = [he_planes.from_u64(d) for d in diags]
    out = he_planes.matvec_bsgs(
        ctp,
        dp,
        [he_planes.from_u64(k) for k in ksb],
        [he_planes.from_u64(k) for k in ksg],
        CFG,
        g=G,
    )
    assert np.array_equal(np.asarray(he_planes.to_u64(out[0])), want.a)
    assert np.array_equal(np.asarray(he_planes.to_u64(out[1])), want.b)


@pytest.mark.slow
def test_planes_matvec_jits_as_one_program(monkeypatch, material):
    """The serving shape: the whole BSGS matvec (hoisted head + tails +
    giant rotation + accumulation) traces into ONE jitted program with
    the keys closed over concretely."""
    pytest.importorskip("jax.experimental.pallas")
    import jax

    from aloha_tpu import he_planes

    monkeypatch.setenv("ALOHA_STREAM_INTERPRET", "1")
    monkeypatch.setenv("ALOHA_STREAM_BP", "2")
    monkeypatch.setenv("ALOHA_NTT_IMPL", "stream")
    _, _, ct, _, diags, ksb, ksg = material
    want = he_np.matvec_bsgs(ct, diags, ksb, ksg, CFG, g=G)
    dp = [he_planes.from_u64(d) for d in diags]
    kb = [he_planes.from_u64(k) for k in ksb]
    kg = [he_planes.from_u64(k) for k in ksg]

    fn = jax.jit(
        lambda a, b: he_planes.matvec_bsgs((a, b), dp, kb, kg, CFG, g=G)
    )
    out = fn(he_planes.from_u64(ct.a), he_planes.from_u64(ct.b))
    assert np.array_equal(np.asarray(he_planes.to_u64(out[0])), want.a)
    assert np.array_equal(np.asarray(he_planes.to_u64(out[1])), want.b)
