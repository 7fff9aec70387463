"""Ciphertext-level HE ops on native u32-plane arrays (TPU datapath form).

TPUs have no 64-bit vector lanes; the round-1 `he_jax` path carried
uint64 arrays and paid XLA's u64 emulation plus a u32 pack/unpack around
every Pallas kernel call.  This module keeps ciphertexts in the kernels'
native representation end-to-end: a polynomial group is a pair of
separate uint32 arrays `(lo, hi)` of identical shape (..., L, N).
Separate arrays — not a packed trailing (..., 2) axis — so every array
keeps N as its minor dimension and tiles onto the (8, 128) vreg layout;
elementwise ops are pure u32 vector arithmetic (aloha_tpu.rns_jax, the
same primitives the kernels inline) and the streaming NTT consumes the
planes without conversion.  Semantics are bit-identical to he_jax/he_np
(certified by tests/test_he_planes.py).

The reference analogue: the SPM stores 64-bit coefficients as what are
physically two 32-bit URAM words per lane; this layout is that fact made
architectural (reference: src/mem_buf/spm.sv, src/vp/vxu/mul64.sv).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from aloha_tpu import rns_jax as r32
from aloha_tpu.config import DEFAULT_CONFIG, HEConfig
from aloha_tpu.ops import dispatch as nt_dispatch
from aloha_tpu.ops.ntt_pallas import LANES


# ------------------------------------------------------------- conversion
def from_u64(a):
    """uint64 (..., N) -> (lo, hi) uint32 planes."""
    a = jnp.asarray(a, dtype=jnp.uint64)
    lo = (a & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    hi = (a >> jnp.uint64(32)).astype(jnp.uint32)
    return lo, hi


def to_u64(p) -> jnp.ndarray:
    """(lo, hi) planes -> uint64 (..., N)."""
    lo, hi = p
    return lo.astype(jnp.uint64) | (hi.astype(jnp.uint64) << jnp.uint64(32))


# ------------------------------------------------------------ transforms
def _use_stream() -> bool:
    from aloha_tpu.ops import ntt_stream

    if os.environ.get("ALOHA_STREAM_INTERPRET"):
        # CI: run the real kernel bodies through the interpreter on CPU
        return ntt_stream._OK
    return nt_dispatch.get_impl() in ("pallas", "stream") and (
        ntt_stream.available()
    )


def _nt_multi(groups, qs, roots, inverse: bool):
    """Transform M same-shaped (lo, hi) groups, group m under qs[m], in
    ONE kernel launch (ops.ntt_stream.*_planes_multi) when the streaming
    kernel is active; otherwise falls back to per-group _nt calls.  The
    launch fusion of the keyswitch's per-residue transform sweep."""
    if not _use_stream() or os.environ.get("ALOHA_STREAM_FUSE") == "0":
        return [
            _nt(g, q, r, inverse) for g, q, r in zip(groups, qs, roots)
        ]
    from aloha_tpu.ops import ntt_stream

    lo = jnp.stack([g[0] for g in groups], axis=0)
    hi = jnp.stack([g[1] for g in groups], axis=0)
    M = lo.shape[0]
    batch = lo.shape[1:-1]
    n = lo.shape[-1]
    nb = int(np.prod(batch)) if batch else 1
    l4 = lo.reshape(M, nb, n // LANES, LANES)
    h4 = hi.reshape(M, nb, n // LANES, LANES)
    fn = (
        ntt_stream.intt_planes_multi if inverse
        else ntt_stream.ntt_planes_multi
    )
    olo, ohi = fn(l4, h4, tuple(qs), tuple(roots))
    olo = olo.reshape((M,) + batch + (n,))
    ohi = ohi.reshape((M,) + batch + (n,))
    return [(olo[m], ohi[m]) for m in range(M)]


def _nt(p, q: int, root: int, inverse: bool):
    """NTT/INTT over the last coefficient axis of (lo, hi) planes."""
    lo, hi = p
    n = lo.shape[-1]
    if _use_stream():
        from aloha_tpu.ops import ntt_stream

        batch = lo.shape[:-1]
        nb = int(np.prod(batch)) if batch else 1
        l3 = lo.reshape(nb, n // LANES, LANES)
        h3 = hi.reshape(nb, n // LANES, LANES)
        fn = ntt_stream.intt_planes if inverse else ntt_stream.ntt_planes
        olo, ohi = fn(l3, h3, q, root)
        return olo.reshape(batch + (n,)), ohi.reshape(batch + (n,))
    # portable path: exact same results through the u64 dispatcher
    a = to_u64(p)
    out = nt_dispatch.intt(a, q, root) if inverse else nt_dispatch.ntt(
        a, q, root
    )
    return from_u64(out)


@functools.lru_cache(maxsize=None)
def _aut_maps(n: int, step: int):
    """Static gather index + sign mask for X -> X^step (step a python int).

    The scatter form (out[dst[i]] = ...) lowers poorly on TPU; with a
    static step the inverse permutation is computed on the host and the
    op becomes one gather + one select."""
    i = np.arange(n, dtype=np.int64)
    j = (i * step) & (2 * n - 1)
    dst = j & (n - 1)
    src = np.empty(n, dtype=np.int32)
    src[dst] = i
    neg = np.zeros(n, dtype=bool)
    neg[dst] = j >= n
    # return NUMPY arrays: converting to jnp here would cache a tracer
    # when first called under a jit trace (UnexpectedTracerError on the
    # next trace); consumers stage these as per-trace constants
    return src, neg


def automorphism(p, step: int, q: int):
    """X -> X^step with the RTL sign rule (`q - x`), on (lo, hi) planes
    (coefficient domain; reference: src/vp/vxu/vxu_lane.sv:594-598)."""
    lo, hi = p
    n = lo.shape[-1]
    src, neg = _aut_maps(n, int(step))
    glo = jnp.take(lo, src, axis=-1)
    ghi = jnp.take(hi, src, axis=-1)
    # literal q - x including x = 0 -> q, as the RTL writes it
    qlo, qhi = r32.const64(q)
    qmx_lo, qmx_hi = r32.sub64(
        jnp.broadcast_to(qlo, glo.shape),
        jnp.broadcast_to(qhi, ghi.shape),
        glo,
        ghi,
    )
    return jnp.where(neg, qmx_lo, glo), jnp.where(neg, qmx_hi, ghi)


# ---------------------------------------------------------- op helpers
def _stackp(ps, axis):
    los, his = zip(*ps)
    return jnp.stack(los, axis=axis), jnp.stack(his, axis=axis)


def _slicep(p, idx, axis=-2):
    lo, hi = p
    return jnp.take(lo, idx, axis=axis), jnp.take(hi, idx, axis=axis)


def _limb(p, m):
    lo, hi = p
    return lo[..., m, :], hi[..., m, :]


# ------------------------------------------------------------ public ops
def _per_limb2(op64, a, b, moduli):
    outs = [
        op64(*_limb(a, i), *_limb(b, i), q) for i, q in enumerate(moduli)
    ]
    return _stackp(outs, -2)


def hom_add(ct1, ct2, cfg: HEConfig = DEFAULT_CONFIG):
    """(a1+a2, b1+b2) limb-wise; cts are ((alo, ahi), (blo, bhi)) with
    arrays shaped (..., L, N)."""
    moduli = cfg.moduli[: cfg.n_limbs]
    return (
        _per_limb2(r32.addmod64, ct1[0], ct2[0], moduli),
        _per_limb2(r32.addmod64, ct1[1], ct2[1], moduli),
    )


def hom_sub(ct1, ct2, cfg: HEConfig = DEFAULT_CONFIG):
    """(a1-a2, b1-b2) limb-wise (he_np.hom_sub on planes; the reference
    ships no canned program but the vfqsub.vv instruction exists)."""
    moduli = cfg.moduli[: cfg.n_limbs]
    return (
        _per_limb2(r32.submod64, ct1[0], ct2[0], moduli),
        _per_limb2(r32.submod64, ct1[1], ct2[1], moduli),
    )


def add_plain(ct, pt, cfg: HEConfig = DEFAULT_CONFIG):
    """ct + pt into the message part (he_np.add_plain on planes)."""
    moduli = cfg.moduli[: cfg.n_limbs]
    return (_per_limb2(r32.addmod64, ct[0], pt, moduli), ct[1])


def mul_plain(ct, pt, cfg: HEConfig = DEFAULT_CONFIG):
    """(a*pt, b*pt) limb-wise pointwise (NTT domain)."""
    moduli = cfg.moduli[: cfg.n_limbs]
    return (
        _per_limb2(r32.mulmod64, ct[0], pt, moduli),
        _per_limb2(r32.mulmod64, ct[1], pt, moduli),
    )


def encode_post(pt_coeff, cfg: HEConfig = DEFAULT_CONFIG):
    L = cfg.n_limbs
    outs = _nt_multi(
        [_limb(pt_coeff, i) for i in range(L)],
        cfg.moduli[:L], cfg.psi[:L], False,
    )
    return _stackp(outs, -2)


def encode(cleartext, cfg: HEConfig = DEFAULT_CONFIG):
    """Full device encode on the plane path: (..., N) interleaved re/im
    fp64 -> NTT-domain plaintext planes (see he_jax.encode)."""
    from aloha_tpu import encoder_jax

    return encode_post(from_u64(encoder_jax.encode(cleartext, cfg)), cfg)


def _addc(p, v, q):
    vlo, vhi = r32.const64(v)
    lo, hi = p
    return r32.addmod64(
        lo, hi, jnp.broadcast_to(vlo, lo.shape),
        jnp.broadcast_to(vhi, hi.shape), q,
    )


def _subc(p, v, q):
    vlo, vhi = r32.const64(v)
    lo, hi = p
    return r32.submod64(
        lo, hi, jnp.broadcast_to(vlo, lo.shape),
        jnp.broadcast_to(vhi, hi.shape), q,
    )


def _hybrid_ks(digits, riders, ksk, cfg: HEConfig):
    """Hybrid key-switch core on planes (he_np.hybrid_keyswitch; the
    reference keyswitch program's steps 2-4,
    sim/vp/isram_file_generator/keyswitch.mem).

    digits: L coefficient-domain (lo, hi) polys (each under its own
    modulus).  riders: None, or L coefficient-domain polys hitched onto
    the digit-raise launch (the rotation's aut(a) message parts — they
    need the same per-limb NTT, so they share the kernel launch).
    Returns (ks, riders_ntt): ks[m][part] NTT-domain planes.
    """
    moduli = cfg.moduli
    L = cfg.n_limbs
    sp = cfg.special_prime
    half = (sp - 1) // 2
    klo, khi = ksk

    # digit-raise NTTs across all L+1 residues — ONE launch (with
    # riders the m == L group is padded so shapes match; the pad
    # transform is discarded)
    stacks = []
    for m in range(L + 1):
        polys = []
        for j, d in enumerate(digits):
            if m == j:
                x = d
            elif moduli[m] > moduli[j]:
                x = r32.lazy_reduce64(*d, moduli[m])
            else:
                x = r32.modred64(*d, moduli[m])
            polys.append(x)
        if riders is not None:
            polys.append(riders[m] if m < L else polys[0])
        stacks.append(_stackp(polys, -2))
    raised = _nt_multi(stacks, moduli[: L + 1], cfg.psi[: L + 1], False)
    nd = [[None] * (L + 1) for _ in range(L)]
    riders_ntt = [None] * L if riders is not None else None
    for m, (slo, shi) in enumerate(raised):
        for j in range(L):
            nd[j][m] = (slo[..., j, :], shi[..., j, :])
        if riders is not None and m < L:
            riders_ntt[m] = (slo[..., L, :], shi[..., L, :])

    stride = 2 * L

    def kk(idx):
        return klo[idx], khi[idx]

    def inner(m, part):
        q = moduli[m]
        acc = r32.mulmod64(*nd[0][m], *kk(stride * m + part), q)
        for j in range(1, L):
            acc = r32.addmod64(
                *acc,
                *r32.mulmod64(*nd[j][m], *kk(stride * m + 2 * j + part), q),
                q,
            )
        return acc

    c = [[inner(m, part) for part in (0, 1)] for m in range(L + 1)]

    p_pair = _nt(_stackp([c[L][0], c[L][1]], -2), sp, cfg.ipsi[-1], True)

    m_coeff = [
        _addc((p_pair[0][..., part, :], p_pair[1][..., part, :]), half, sp)
        for part in (0, 1)
    ]
    # mod-down correction NTTs across limbs — ONE launch
    corr_all = _nt_multi(
        [
            _stackp(
                [_subc(m_coeff[p], half, moduli[m]) for p in (0, 1)], -2
            )
            for m in range(L)
        ],
        moduli[:L], cfg.psi[:L], False,
    )
    ks = [[None, None] for _ in range(L)]
    for m in range(L):
        q = moduli[m]
        corr2 = corr_all[m]
        pvlo, pvhi = r32.const64(cfg.pinv_mod(m))
        for part in (0, 1):
            t = r32.submod64(
                *c[m][part], corr2[0][..., part, :], corr2[1][..., part, :], q
            )
            ks[m][part] = r32.mulmod64(
                *t, jnp.broadcast_to(pvlo, t[0].shape),
                jnp.broadcast_to(pvhi, t[1].shape), q,
            )
    return ks, riders_ntt


def rotate(ct, step: int, ksk, cfg: HEConfig = DEFAULT_CONFIG):
    """Slot rotation (automorphism + hybrid key-switch) on (lo, hi) planes.

    ksk: (lo, hi) planes of the (2L(L+1), N) reference layout (use
    `from_u64(ksk_u64)`); see he_np.rotate for the algorithm and the
    keyswitch.mem correspondence.  4 kernel launches total on the
    streaming path (each NTT sweep fused across its residues).
    """
    n = ct[0][0].shape[-1]
    return galois(ct, pow(3, step, 2 * n), ksk, cfg)


def conjugate(ct, cjk, cfg: HEConfig = DEFAULT_CONFIG):
    """Slot conjugation: X -> X^(2N-1) + key-switch (he_np.conjugate on
    planes; cjk = keys.gen_conjugation_key planes)."""
    n = ct[0][0].shape[-1]
    return galois(ct, 2 * n - 1, cjk, cfg)


def galois(ct, step_exp: int, ksk, cfg: HEConfig = DEFAULT_CONFIG):
    """Arbitrary Galois automorphism X -> X^step_exp + hybrid key-switch
    (the shared core of rotate/conjugate; he_np.galois on planes)."""
    a, b = ct
    moduli = cfg.moduli
    L = cfg.n_limbs

    # fully fused path: the whole rotation in TWO kernel launches
    # (in-kernel automorphism; ALOHA_KS_KERNEL=0 falls back to the
    # 4-launch multi-modulus path below)
    if _use_stream() and os.environ.get("ALOHA_KS_KERNEL", "1") != "0":
        from aloha_tpu.ops import ks_kernel

        return ks_kernel.rotate_planes(a, b, step_exp, ksk, cfg)

    # per-limb INTT of (b_m, a_m) — ONE launch across limbs
    pairs = _nt_multi(
        [_stackp([_limb(b, m), _limb(a, m)], -2) for m in range(L)],
        moduli[:L], cfg.ipsi[:L], True,
    )
    digits, a_aut = [], []
    for m, pair in enumerate(pairs):
        digits.append(
            automorphism(
                (pair[0][..., 0, :], pair[1][..., 0, :]), step_exp, moduli[m]
            )
        )
        a_aut.append(
            automorphism(
                (pair[0][..., 1, :], pair[1][..., 1, :]), step_exp, moduli[m]
            )
        )

    ks, a_ntt = _hybrid_ks(digits, a_aut, ksk, cfg)
    a_rot = _stackp(
        [r32.addmod64(*a_ntt[m], *ks[m][0], moduli[m]) for m in range(L)], -2
    )
    b_rot = _stackp([ks[m][1] for m in range(L)], -2)
    return (a_rot, b_rot)


def rotate_hoisted(ct, steps, ksks, cfg: HEConfig = DEFAULT_CONFIG):
    """Rotate ONE ciphertext by several steps sharing a single
    key-switch head (Halevi-Shoup hoisting; he_np.rotate_hoisted is the
    oracle).  steps: slot amounts; ksks: matching (lo, hi) key planes
    (the same keys rotate() uses).  Returns a list of (a, b) plane
    ciphertexts aligned with steps.

    On the fused-kernel path the head (8 of the rotation's 14
    transforms) runs once for all steps and ALL K tails share one
    launch on the ungathered digit planes (lazy-gather form: the
    automorphism rides the prepared keys and the small output pair) —
    measured 1.91x plain rotation per step at K=12.  The non-kernel
    fallback performs plain per-step rotations (functionally identical
    at decrypt level, no hoisting speedup)."""
    n = ct[0][0].shape[-1]
    return galois_hoisted(
        ct, [pow(3, s, 2 * n) for s in steps], ksks, cfg,
        _fallback_steps=steps,
    )


def galois_hoisted(ct, step_exps, ksks, cfg: HEConfig = DEFAULT_CONFIG,
                   _fallback_steps=None):
    """Hoisted form for ARBITRARY Galois exponents (the shared core of
    rotate_hoisted; pass 2N-1 for conjugation).  step_exps: exponents
    e of X -> X^e; ksks: matching keys (keys.gen_galois_key /
    gen_conjugation_key planes)."""
    assert len(step_exps) == len(ksks), (
        f"{len(step_exps)} exponents but {len(ksks)} key-switch keys"
    )
    a, b = ct
    if _use_stream() and os.environ.get("ALOHA_KS_KERNEL", "1") != "0":
        from aloha_tpu.ops import ks_kernel

        return ks_kernel.rotate_planes_hoisted(a, b, step_exps, ksks, cfg)
    if _fallback_steps is not None:
        return [
            rotate(ct, s, k, cfg)
            for s, k in zip(_fallback_steps, ksks)
        ]
    return [galois(ct, e, k, cfg) for e, k in zip(step_exps, ksks)]


def rotate_batch(cts, steps, ksks, cfg: HEConfig = DEFAULT_CONFIG):
    """Rotate K DIFFERENT ciphertexts (each by its own step) in TWO
    kernel launches total: one aut-free head over the stacked b-parts,
    one batched tail with per-block KSKs (ks_kernel.rotate_planes_batch;
    the BSGS giant-step shape).  Word-exact against
    he_np.rotate_hoisted(ct_k, [step_k], [ksk_k]); decrypt-identical to
    per-ct rotate().  The non-kernel fallback pays K plain rotations
    (decrypt-identical, different digit-lift words)."""
    assert len(cts) == len(steps) == len(ksks), (
        f"{len(cts)} cts, {len(steps)} steps, {len(ksks)} keys"
    )
    if not cts:
        return []
    n = cts[0][0][0].shape[-1]
    exps = [pow(3, s, 2 * n) for s in steps]
    if _use_stream() and os.environ.get("ALOHA_KS_KERNEL", "1") != "0":
        from aloha_tpu.ops import ks_kernel

        return ks_kernel.rotate_planes_batch(cts, exps, ksks, cfg)
    return [rotate(c, s, k, cfg) for c, s, k in zip(cts, steps, ksks)]


def pt_rotate(pt, r: int, cfg: HEConfig = DEFAULT_CONFIG):
    """Rotate an ENCODED (NTT-domain) plaintext plane pair by r slots —
    free for public data: one gather over the coefficient axis
    (he_np.pt_rotate on planes)."""
    from aloha_tpu import ntt_np

    lo, hi = pt
    n = lo.shape[-1]
    e = pow(3, r % n, 2 * n)
    perm = jnp.asarray(ntt_np.ntt_aut_perm(n, e))
    return (
        jnp.take(lo, perm, axis=-1),
        jnp.take(hi, perm, axis=-1),
    )


def matvec_bsgs(
    ct, diags, ksks_baby, ksks_giant,
    cfg: HEConfig = DEFAULT_CONFIG, g: int = None,
):
    """Encrypted matrix-vector product: diagonal method with
    baby-step/giant-step and HOISTED baby rotations (he_np.matvec_bsgs
    is the oracle; word-identical given the same keys).

    diags: list of D encoded NTT-domain plaintext plane pairs;
    ksks_baby[j-1] = key for step j (j = 1..g-1); ksks_giant[i-1] =
    key for step g*i.  Only g-1 hoisted + b-1 plain rotations are paid
    instead of D-1 plain ones."""
    D = len(diags)
    if g is None:
        g = max(1, int(np.ceil(np.sqrt(D))))
    b = (D + g - 1) // g
    assert len(ksks_baby) >= g - 1, (
        f"need {g - 1} baby keys, got {len(ksks_baby)}"
    )
    assert len(ksks_giant) >= b - 1, (
        f"need {b - 1} giant keys, got {len(ksks_giant)}"
    )

    baby_steps = list(range(1, g))
    babies = [ct] + (
        rotate_hoisted(ct, baby_steps, ksks_baby[: g - 1], cfg)
        if baby_steps else []
    )

    # the inner sums first, then ALL b-1 giant rotations as one batched
    # 2-launch rotate (they are distinct ciphertexts with distinct
    # steps — exactly the rotate_batch shape)
    inners = []
    for i in range(b):
        inner = None
        for j in range(g):
            k = g * i + j
            if k >= D:
                break
            t = mul_plain(babies[j], pt_rotate(diags[k], -g * i, cfg), cfg)
            inner = t if inner is None else hom_add(inner, t, cfg)
        inners.append(inner)
    rotated = rotate_batch(
        inners[1:], [g * i for i in range(1, b)],
        ksks_giant[: b - 1], cfg,
    )
    acc = inners[0]
    for r in rotated:
        acc = hom_add(acc, r, cfg)
    return acc


def ct_mul(ct1, ct2, cfg: HEConfig = DEFAULT_CONFIG):
    """Ciphertext x ciphertext tensor product (NTT domain, pointwise).

    Returns the degree-2 triple (d0, d1, d2) of plane pairs with
    decrypt = d0 + d1*s + d2*s^2; feed d2 to `relinearize`
    (he_np.ct_mul semantics, bit-identical)."""
    moduli = cfg.moduli[: cfg.n_limbs]
    a1, b1 = ct1
    a2, b2 = ct2
    d0 = _per_limb2(r32.mulmod64, a1, a2, moduli)
    d2 = _per_limb2(r32.mulmod64, b1, b2, moduli)
    t1 = _per_limb2(r32.mulmod64, a1, b2, moduli)
    t2 = _per_limb2(r32.mulmod64, b1, a2, moduli)
    d1 = _per_limb2(r32.addmod64, t1, t2, moduli)
    return d0, d1, d2


def relinearize(d0, d1, d2, rlk, cfg: HEConfig = DEFAULT_CONFIG):
    """Fold the s^2 component back to degree 1 with the relin key
    (he_np.relinearize on planes).

    On the streaming backend this reuses the TWO fused keyswitch
    kernels with an identity automorphism (e = 1) and zero rider polys
    — the same compiled kernels as rotate, different runtime constants
    — so the keyswitch core costs 2 launches here too."""
    L = cfg.n_limbs
    if _use_stream() and os.environ.get("ALOHA_KS_KERNEL", "1") != "0":
        from aloha_tpu.ops import ks_kernel

        zero = tuple(jnp.zeros_like(p) for p in d2)
        ka, kb = ks_kernel.rotate_planes(zero, d2, 1, rlk, cfg)
        a = _per_limb2(r32.addmod64, d0, ka, cfg.moduli[:L])
        b = _per_limb2(r32.addmod64, d1, kb, cfg.moduli[:L])
        return (a, b)
    digits = _nt_multi(
        [_limb(d2, m) for m in range(L)],
        cfg.moduli[:L], cfg.ipsi[:L], True,
    )
    ks, _ = _hybrid_ks(digits, None, rlk, cfg)
    a = _stackp(
        [
            r32.addmod64(*_limb(d0, m), *ks[m][0], cfg.moduli[m])
            for m in range(L)
        ],
        -2,
    )
    b = _stackp(
        [
            r32.addmod64(*_limb(d1, m), *ks[m][1], cfg.moduli[m])
            for m in range(L)
        ],
        -2,
    )
    return (a, b)


def rescale(ct, cfg: HEConfig = DEFAULT_CONFIG):
    """Drop the last limb: c' = round(c / q_last) over the remaining limbs
    (he_np.rescale on planes; the CKKS modulus switch after a multiply).
    Returns a ciphertext of (L-1)-limb plane pairs."""
    L = cfg.n_limbs
    if L < 2:
        raise ValueError("rescale needs at least 2 limbs")
    q_last = cfg.moduli[L - 1]
    half = (q_last - 1) // 2
    a, b = ct
    # centered lift of the last limb of both parts — ONE INTT launch
    pair = _nt(
        _stackp([_limb(a, L - 1), _limb(b, L - 1)], -2),
        q_last, cfg.ipsi[L - 1], True,
    )
    coeffs = [
        _addc((pair[0][..., p, :], pair[1][..., p, :]), half, q_last)
        for p in (0, 1)
    ]
    # correction NTTs across the remaining limbs — ONE launch
    corr = _nt_multi(
        [
            _stackp(
                [
                    _subc(coeffs[p], half % cfg.moduli[m], cfg.moduli[m])
                    for p in (0, 1)
                ],
                -2,
            )
            for m in range(L - 1)
        ],
        cfg.moduli[: L - 1], cfg.psi[: L - 1], False,
    )
    outs = []
    for part_idx, src in ((0, a), (1, b)):
        polys = []
        for m in range(L - 1):
            q = cfg.moduli[m]
            ivlo, ivhi = r32.const64(pow(q_last, -1, q))
            t = r32.submod64(
                *_limb(src, m),
                corr[m][0][..., part_idx, :], corr[m][1][..., part_idx, :],
                q,
            )
            polys.append(
                r32.mulmod64(
                    *t, jnp.broadcast_to(ivlo, t[0].shape),
                    jnp.broadcast_to(ivhi, t[1].shape), q,
                )
            )
        outs.append(_stackp(polys, -2))
    return (outs[0], outs[1])
