"""Ciphertext-level HE operations — NumPy golden model.

These are the four "kernels" the reference accelerator ships as canned
instruction programs (reference: sim/vp/isram_file_generator/{encode_post,
mul_plain,hom_add,keyswitch}.mem; program offsets
isram_file_generator.sv:27-31), re-expressed as functional host code over RNS
polynomial arrays.  Each function is validated bit-exactly against the
reference's tv/ golden vectors by tests/test_he_tv.py.

Data model
----------
A ciphertext is ``(a, b)`` where each component is a uint64 array of shape
``(n_limbs, N)`` holding RNS residues (limb 0 = q0, limb 1 = q1), stored in
the *NTT (evaluation) domain in bit-reversed order* — the exact at-rest format
of the reference SPM (tv/README.md: ct_a(q0) | ct_a(q1) | ct_b(q0) | ct_b(q1)).
``a`` is the message component (decrypt = a + b*s), ``b`` multiplies the key.

A plaintext is a uint64 array of shape ``(n_limbs, N)``, same domain.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from aloha_tpu import ntt_np as nttm
from aloha_tpu import rns_np as rns
from aloha_tpu.config import DEFAULT_CONFIG, HEConfig


@dataclasses.dataclass
class Ciphertext:
    """RNS-CKKS ciphertext, NTT domain, bit-reversed order."""

    a: np.ndarray  # (n_limbs, N) uint64 — message component
    b: np.ndarray  # (n_limbs, N) uint64 — key component

    @classmethod
    def from_flat(cls, flat: np.ndarray, n_limbs: int = 2) -> "Ciphertext":
        """From the reference dump layout a_q0 | a_q1 | b_q0 | b_q1."""
        flat = rns.to_u64(flat)
        n = flat.shape[-1] // (2 * n_limbs)
        polys = flat.reshape(2 * n_limbs, n)
        return cls(a=polys[:n_limbs].copy(), b=polys[n_limbs:].copy())

    def to_flat(self) -> np.ndarray:
        return np.concatenate([self.a.ravel(), self.b.ravel()])


def hom_add(ct1: Ciphertext, ct2: Ciphertext, cfg: HEConfig = DEFAULT_CONFIG) -> Ciphertext:
    """ct + ct: limb-wise modular add of both components.

    (reference program: sim/vp/isram_file_generator/hom_add.mem — 4 vfqadd)
    """
    a = np.stack(
        [rns.addmod(ct1.a[i], ct2.a[i], cfg.moduli[i]) for i in range(len(ct1.a))]
    )
    b = np.stack(
        [rns.addmod(ct1.b[i], ct2.b[i], cfg.moduli[i]) for i in range(len(ct1.b))]
    )
    return Ciphertext(a=a, b=b)


def hom_sub(ct1: Ciphertext, ct2: Ciphertext, cfg: HEConfig = DEFAULT_CONFIG) -> Ciphertext:
    """ct - ct: limb-wise modular subtract of both components.

    (reference ISA: vfqsub.vv, src/vp/sequncer/expander.v:294-373 — the
    reference ships no canned hom_sub program but the instruction exists)
    """
    a = np.stack(
        [rns.submod(ct1.a[i], ct2.a[i], cfg.moduli[i]) for i in range(len(ct1.a))]
    )
    b = np.stack(
        [rns.submod(ct1.b[i], ct2.b[i], cfg.moduli[i]) for i in range(len(ct1.b))]
    )
    return Ciphertext(a=a, b=b)


def add_plain(ct: Ciphertext, pt: np.ndarray, cfg: HEConfig = DEFAULT_CONFIG) -> Ciphertext:
    """ct + pt: the plaintext (NTT domain, same scale) adds into the
    message part only (decrypt = a + b*s here, so the a-part).

    (reference ISA: vfqadd.vv exists; no canned program — API
    completeness for the standard CKKS op set.)"""
    pt = rns.to_u64(pt)
    a = np.stack(
        [rns.addmod(ct.a[i], pt[i], cfg.moduli[i]) for i in range(len(ct.a))]
    )
    return Ciphertext(a=a, b=ct.b.copy())


def mul_plain(ct: Ciphertext, pt: np.ndarray, cfg: HEConfig = DEFAULT_CONFIG) -> Ciphertext:
    """ct x pt: limb-wise pointwise modular multiply (both in NTT domain).

    (reference program: sim/vp/isram_file_generator/mul_plain.mem — 4 vfqmul)
    """
    pt = rns.to_u64(pt)
    a = np.stack(
        [rns.mulmod(ct.a[i], pt[i], cfg.moduli[i]) for i in range(len(ct.a))]
    )
    b = np.stack(
        [rns.mulmod(ct.b[i], pt[i], cfg.moduli[i]) for i in range(len(ct.b))]
    )
    return Ciphertext(a=a, b=b)


def encode_post(pt_coeff: np.ndarray, cfg: HEConfig = DEFAULT_CONFIG) -> np.ndarray:
    """Per-limb forward NTT of an encoded plaintext.

    The reference runs this VP program after the fixed-point FFT encoder has
    written coefficient-domain residues into the SPM
    (reference program: sim/vp/isram_file_generator/encode_post.mem;
    host flow: sim/top/top_noaxilite_tb.sv:419-448).
    """
    pt_coeff = rns.to_u64(pt_coeff)
    return np.stack(
        [nttm.ntt_cfg(pt_coeff[i], cfg, i) for i in range(pt_coeff.shape[0])]
    )


def keyswitch_digits(ct_b: np.ndarray, step_exp: int, cfg: HEConfig = DEFAULT_CONFIG):
    """INTT -> automorphism per limb: the rotation's digit polynomials.

    Returns the coefficient-domain digits [d0, d1] (one per ciphertext limb),
    each a plain residue vector of its own modulus.
    """
    digits = []
    for i in range(ct_b.shape[0]):
        coeff = nttm.intt_cfg(ct_b[i], cfg, i)
        digits.append(nttm.automorphism(coeff, step_exp, cfg.moduli[i]))
    return digits


def hybrid_keyswitch(
    digits, ksk: np.ndarray, cfg: HEConfig = DEFAULT_CONFIG
):
    """Hybrid key-switch core: coefficient-domain digits -> (ks_a, ks_b).

    `digits` is a list of n_limbs coefficient-domain polynomials (the
    per-limb residues of the polynomial being switched, optionally already
    automorphed); `ksk` is the 12-poly key image.  Returns NTT-domain
    (n_limbs, N) pairs.  This is steps 2-4 of the reference keyswitch
    program (sim/vp/isram_file_generator/keyswitch.mem), shared between
    rotation (digits of aut(b)) and relinearization (digits of d2).
    """
    return hybrid_keyswitch_ntt(raise_digits(digits, cfg), ksk, cfg)


def raise_digits(digits, cfg: HEConfig = DEFAULT_CONFIG):
    """Raise coefficient-domain digits to every modulus and NTT them.

    Returns nd[j][m] = NTT_qm(lift(digits[j])) — the "raised digit"
    planes the key-switch inner products consume (steps 2 of the
    reference keyswitch program).  Split out of hybrid_keyswitch so
    hoisted rotations can share ONE raise across many steps."""
    moduli = cfg.moduli
    n_limbs = cfg.n_limbs
    nd = [[None] * (n_limbs + 1) for _ in range(n_limbs)]
    for j, d in enumerate(digits):
        for m in range(n_limbs + 1):
            if m == j:
                r = d
            elif moduli[m] > moduli[j]:
                r = rns.lazy_reduce(d, moduli[m])  # vcpy semantics
            else:
                r = rns.modred(d, moduli[m])  # vfqmod semantics
            nd[j][m] = nttm.ntt(r, moduli[m], cfg.psi[m])
    return nd


def hybrid_keyswitch_ntt(
    nd, ksk: np.ndarray, cfg: HEConfig = DEFAULT_CONFIG
):
    """Key-switch core on NTT-domain raised digits nd[j][m] (steps 3-4
    of the reference program: KSK inner products + P mod-down)."""
    n = cfg.n
    moduli = cfg.moduli
    n_limbs = cfg.n_limbs
    sp = cfg.special_prime
    stride = 2 * n_limbs  # polys per modulus: L digits x (a, b)
    ksk = rns.to_u64(ksk).reshape(stride * (n_limbs + 1), n)

    def inner(m, part):
        q = moduli[m]
        acc = rns.mulmod(nd[0][m], ksk[stride * m + part], q)
        for j in range(1, n_limbs):
            acc = rns.addmod(
                acc,
                rns.mulmod(nd[j][m], ksk[stride * m + 2 * j + part], q),
                q,
            )
        return acc

    c = [[inner(m, part) for part in (0, 1)] for m in range(n_limbs + 1)]

    # mod-down by P with (P-1)/2 rounding
    half = (sp - 1) // 2
    m_coeff = [
        rns.addmod(
            nttm.intt(c[n_limbs][part], sp, cfg.ipsi[-1]), np.uint64(half), sp
        )
        for part in (0, 1)
    ]
    ks_a = np.empty((n_limbs, n), dtype=np.uint64)
    ks_b = np.empty((n_limbs, n), dtype=np.uint64)
    for m in range(n_limbs):
        q = moduli[m]
        pinv = np.uint64(cfg.pinv_mod(m))
        for part, out in ((0, ks_a), (1, ks_b)):
            corr = nttm.ntt(
                rns.submod(m_coeff[part], np.uint64(half % q), q), q,
                cfg.psi[m],
            )
            t = rns.submod(c[m][part], corr, q)
            out[m] = rns.mulmod(t, pinv, q)
    return ks_a, ks_b


def rotate(
    ct: Ciphertext,
    step: int,
    ksk: np.ndarray,
    cfg: HEConfig = DEFAULT_CONFIG,
) -> Ciphertext:
    """Slot rotation: automorphism X -> X^(3^step) + hybrid key-switch.

    Mirrors the reference's 122-instruction keyswitch program
    (reference: sim/vp/isram_file_generator/keyswitch.mem; host launch
    sim/top/top_noaxilite_tb.sv:530-532 passes 3^step mod 2N as the CSR).

    ``ksk`` is the key-switch key for this step: uint64 (12, N) in NTT
    domain, ordered as the reference KSK memory image
    (tv/*/ksk_step*.txt): for each modulus m in (q0, q1, P), for each digit
    d in (d0, d1), the pair (a-part, b-part):
        [m0d0a, m0d0b, m0d1a, m0d1b, m1d0a, ..., m2d1b]

    Algorithm (hybrid key-switching, 2 digits + special prime):
      1. digits d_j = aut(INTT(b_qj)) — coefficient domain          (vintt,vaut)
      2. raise each digit to all three moduli and NTT               (vfqmod/vcpy,vntt)
      3. inner products with the KSK under q0, q1, P                (vfqmul,vfqadd)
      4. mod-down: INTT the P part, add (P-1)/2, re-NTT under qi,
         subtract, scale by P^-1 mod qi                             (vintt,vfqadd.vs,...)
      5. add aut(a) to the message part                             (vfqadd)
    """
    n = ct.a.shape[-1]
    return galois(ct, pow(3, step, 2 * n), ksk, cfg)


def conjugate(
    ct: Ciphertext, cjk: np.ndarray, cfg: HEConfig = DEFAULT_CONFIG
) -> Ciphertext:
    """Slot conjugation: the Galois automorphism X -> X^(2N-1) + key-switch
    (z_k -> conj(z_k) on the CKKS slots).  cjk: keys.gen_conjugation_key."""
    return galois(ct, 2 * ct.a.shape[-1] - 1, cjk, cfg)


def galois(
    ct: Ciphertext,
    step_exp: int,
    ksk: np.ndarray,
    cfg: HEConfig = DEFAULT_CONFIG,
) -> Ciphertext:
    """Arbitrary Galois automorphism X -> X^step_exp + hybrid key-switch
    (the shared core of rotate/conjugate; ksk = keys.gen_galois_key for
    the same exponent)."""
    moduli = cfg.moduli
    n_limbs = cfg.n_limbs

    # digit decomposition (coefficient domain, own modulus) then key-switch
    digits = keyswitch_digits(ct.b, step_exp, cfg)
    ks_a, ks_b = hybrid_keyswitch(digits, ksk, cfg)

    # rotated message part: aut(a) + key-switch a-part
    a_rot = np.stack(
        [
            rns.addmod(
                nttm.ntt_cfg(
                    nttm.automorphism(
                        nttm.intt_cfg(ct.a[m], cfg, m), step_exp, moduli[m]
                    ),
                    cfg,
                    m,
                ),
                ks_a[m],
                moduli[m],
            )
            for m in range(n_limbs)
        ]
    )
    return Ciphertext(a=a_rot, b=ks_b)


def rotate_hoisted(
    ct: Ciphertext,
    steps,
    ksks,
    cfg: HEConfig = DEFAULT_CONFIG,
):
    """Many rotations of ONE ciphertext sharing a single digit
    decomposition + raise (Halevi-Shoup hoisting, beyond the reference).

    The expensive key-switch head — per-limb INTT, digit raise to every
    modulus, L(L+1)+L forward NTTs — runs ONCE; each step then costs
    only an NTT-domain gather (the automorphism as a permutation of
    evaluation points), the KSK inner products, and the mod-down tail.
    Valid here because the digits are plain residues d_j = b mod q_j —
    reduction is a ring homomorphism, so the automorphism commutes with
    it, and aut(lift(d_j)) over the integers has the same coefficient
    bound (< q_j) as lift(aut(d_j)): identical noise growth, applied
    AFTER the raise instead of before.  Outputs decrypt identically to
    rotate() but are NOT word-equal to it (different — equally valid —
    digit lift representatives).

    steps: slot rotation amounts; ksks: the matching per-step
    key-switch keys (the SAME keys rotate() uses).  Returns a list of
    Ciphertexts aligned with steps.
    """
    n = ct.a.shape[-1]
    return galois_hoisted(
        ct, [pow(3, s, 2 * n) for s in steps], ksks, cfg
    )


def galois_hoisted(
    ct: Ciphertext,
    step_exps,
    ksks,
    cfg: HEConfig = DEFAULT_CONFIG,
):
    """Hoisted form for ARBITRARY Galois exponents (the shared core of
    rotate_hoisted; pass 2N-1 for hoisted conjugation)."""
    assert len(step_exps) == len(ksks), (
        f"{len(step_exps)} exponents but {len(ksks)} key-switch keys"
    )
    n = ct.a.shape[-1]
    moduli = cfg.moduli
    n_limbs = cfg.n_limbs

    # aut-free head: digits of b itself, raised and NTT'd once
    digits = [nttm.intt_cfg(ct.b[j], cfg, j) for j in range(n_limbs)]
    nd = raise_digits(digits, cfg)

    outs = []
    for e, ksk in zip(step_exps, ksks):
        # LAZY-GATHER form: the automorphism rides the KEY (inverse
        # permutation, applied once per key) and the OUTPUT, never the
        # raised digit planes — g_e(sum_j nd_j * g_e^-1(K_j)) =
        # sum_j g_e(nd_j) * K_j pointwise, and the whole mod-down tail
        # is sigma_e-equivariant, so per step only the L-limb output
        # pair is gathered instead of the L(L+1) digit planes.  Word-
        # identical to the gathered-digit form away from 2^-60-rare
        # rounding ties; the plane/kernel path uses the same formulation
        # (ks_kernel.rotate_planes_hoisted), keeping word-exactness by
        # construction.
        perm = nttm.ntt_aut_perm(n, e)
        pinv = nttm.ntt_aut_perm(n, pow(e, -1, 2 * n))
        kk = rns.to_u64(ksk)[..., pinv]
        ks_a, ks_b = hybrid_keyswitch_ntt(nd, kk, cfg)
        a_rot = np.stack(
            [
                rns.addmod(ct.a[m], ks_a[m], moduli[m])[..., perm]
                for m in range(n_limbs)
            ]
        )
        b_rot = np.stack([ks_b[m][..., perm] for m in range(n_limbs)])
        outs.append(Ciphertext(a=a_rot, b=b_rot))
    return outs


def pt_rotate(pt: np.ndarray, r: int, cfg: HEConfig = DEFAULT_CONFIG):
    """Rotate an ENCODED (NTT-domain) plaintext by r slots — free for
    public data: the Galois automorphism is a permutation of evaluation
    points (one gather), no key switch needed."""
    n = pt.shape[-1]
    e = pow(3, r % n, 2 * n)
    perm = nttm.ntt_aut_perm(n, e)
    return pt[..., perm]


def matvec_bsgs(
    ct: Ciphertext,
    diags,
    ksks_baby,
    ksks_giant,
    cfg: HEConfig = DEFAULT_CONFIG,
    g: int = None,
):
    """Encrypted matrix-vector product by the diagonal method with
    baby-step/giant-step and hoisted baby rotations (beyond the
    reference; the standard CKKS linear-transform workload).

    M v = sum_k diag_k ⊙ rot_k(v) is regrouped with D = g*b:
        sum_i rot_{g i}( sum_j rot_{-g i}(diag_{g i + j}) ⊙ rot_j(v) )
    so only g-1 baby rotations (HOISTED: one shared key-switch head)
    and b-1 giant rotations are paid instead of D-1; the plaintext
    pre-rotations are free gathers (pt_rotate).

    diags: list of D encoded NTT-domain plaintexts, diags[k] holding
    the k-th (wrapped) diagonal; ksks_baby[j-1] = key for step j
    (j = 1..g-1); ksks_giant[i-1] = key for step g*i (i = 1..b-1).
    """
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

    acc = None
    for i in range(b):
        inner = None
        for j in range(g):
            k = g * i + j
            if k >= D:
                break
            d = pt_rotate(np.asarray(diags[k]), -g * i, cfg)
            t = mul_plain(babies[j], d, cfg)
            inner = t if inner is None else hom_add(inner, t, cfg)
        if i:
            # hoisted digit lift (aut after raise) even for the single
            # giant step: keeps this oracle word-identical to the plane
            # path's batched 2-launch giant rotations (he_planes
            # rotate_batch / ks_kernel.rotate_planes_batch)
            inner, = rotate_hoisted(
                inner, [g * i], [ksks_giant[i - 1]], cfg
            )
        acc = inner if acc is None else hom_add(acc, inner, cfg)
    return acc


def ct_mul(
    ct1: Ciphertext, ct2: Ciphertext, cfg: HEConfig = DEFAULT_CONFIG
):
    """Ciphertext x ciphertext tensor product (NTT domain, pointwise).

    Returns the degree-2 triple (d0, d1, d2) with
    decrypt = d0 + d1*s + d2*s^2; feed d2 to `relinearize`.
    Extends the reference's op set (it ships only ct x pt) toward the
    leveled ct-ct multiply + relinearization target (BASELINE.json).
    """
    L = cfg.n_limbs
    d0 = np.stack(
        [rns.mulmod(ct1.a[m], ct2.a[m], cfg.moduli[m]) for m in range(L)]
    )
    d2 = np.stack(
        [rns.mulmod(ct1.b[m], ct2.b[m], cfg.moduli[m]) for m in range(L)]
    )
    d1 = np.stack(
        [
            rns.addmod(
                rns.mulmod(ct1.a[m], ct2.b[m], cfg.moduli[m]),
                rns.mulmod(ct1.b[m], ct2.a[m], cfg.moduli[m]),
                cfg.moduli[m],
            )
            for m in range(L)
        ]
    )
    return d0, d1, d2


def relinearize(
    d0: np.ndarray,
    d1: np.ndarray,
    d2: np.ndarray,
    rlk: np.ndarray,
    cfg: HEConfig = DEFAULT_CONFIG,
) -> Ciphertext:
    """Fold the s^2 component back to degree 1 with the relin key (s^2->s)."""
    L = cfg.n_limbs
    digits = [nttm.intt_cfg(d2[j], cfg, j) for j in range(L)]
    ks_a, ks_b = hybrid_keyswitch(digits, rlk, cfg)
    a = np.stack(
        [rns.addmod(d0[m], ks_a[m], cfg.moduli[m]) for m in range(L)]
    )
    b = np.stack(
        [rns.addmod(d1[m], ks_b[m], cfg.moduli[m]) for m in range(L)]
    )
    return Ciphertext(a=a, b=b)


def rescale(ct: Ciphertext, cfg: HEConfig = DEFAULT_CONFIG) -> Ciphertext:
    """Drop the last ciphertext limb: c' = round(c / q_last) over remaining
    limbs (the CKKS modulus-switch that follows every multiply).

    Returns a ciphertext with n_limbs-1 limbs; scale divides by q_last.
    """
    L = cfg.n_limbs
    if L < 2:
        raise ValueError("rescale needs at least 2 limbs")
    q_last = cfg.moduli[L - 1]
    half = (q_last - 1) // 2

    def down(part):
        # centered lift of the last limb, like the keyswitch mod-down
        last_coeff = rns.addmod(
            nttm.intt_cfg(part[L - 1], cfg, L - 1), np.uint64(half), q_last
        )
        out = np.empty((L - 1, part.shape[-1]), dtype=np.uint64)
        for m in range(L - 1):
            q = cfg.moduli[m]
            inv = np.uint64(pow(q_last, -1, q))
            corr = nttm.ntt_cfg(
                rns.submod(last_coeff, np.uint64(half % q), q), cfg, m
            )
            out[m] = rns.mulmod(rns.submod(part[m], corr, q), inv, q)
        return out

    return Ciphertext(a=down(ct.a), b=down(ct.b))
