"""Fused key-switch kernels: the whole rotation in TWO launches.

The reference runs its 122-instruction keyswitch program without data
leaving the SPM (reference: sim/vp/isram_file_generator/keyswitch.mem);
the per-launch overhead of the hosted TPU backend makes launch count the
dominant rotation cost, so this module fuses the 4 multi-modulus
launches of `he_planes.rotate` into two kernels:

  ks_head:  INTT (all limbs) -> automorphism -> digit raise -> NTT
            (all L+1 residues), per-chunk in VMEM
  ks_tail:  KSK inner products -> special-prime INTT -> mod-down
            correction NTTs -> final (a_rot, b_rot) combine

The in-kernel automorphism uses the permutation decomposition proven in
tools/probe_aut_kernel.py: row-perm and lane-perm as one-hot f32 MXU
matmuls (HIGHEST precision; u16 limb planes ride exactly) plus per-lane
conditional sublane rolls and a destination sign mask — the TPU form of
the reference's vaut lane/iconn permutation (src/vp/vxu/vxu_lane.sv:594).

Both kernels iterate chunks of `bp` ciphertexts via the Pallas grid
(automatic in/out pipelining); twiddle tables for every modulus stay
VMEM-resident across the launch.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from aloha_tpu import rns_jax as r32
from aloha_tpu.config import HEConfig
from aloha_tpu.ops import ntt_stream as ns
from aloha_tpu.ops.ntt_pallas import LANES

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _OK = True
except Exception:  # pragma: no cover
    _OK = False


def available() -> bool:
    return ns.available()


# ------------------------------------------------------ automorphism math
@functools.lru_cache(maxsize=None)
def _aut_consts_np(n: int, e: int):
    """Step-dependent kernel INPUTS (numpy; the kernel itself is
    step-agnostic): one-hot row/lane permutation matrices, per-lane row
    roll bit masks, destination sign mask."""
    rows = n // LANES
    Q = np.zeros((rows, rows), dtype=np.float32)
    Q[(np.arange(rows) * e) % rows, np.arange(rows)] = 1.0
    P = np.zeros((LANES, LANES), dtype=np.float32)
    P[np.arange(LANES), (np.arange(LANES) * e) % LANES] = 1.0
    csrc = (np.arange(LANES) * pow(e, -1, LANES)) % LANES
    o = ((csrc * e) // LANES) % rows
    nbits = rows.bit_length() - 1
    rm = np.stack(
        [((o >> k) & 1).astype(np.uint32) for k in range(nbits)]
    ).reshape(nbits, 1, LANES)
    i = np.arange(n, dtype=np.int64)
    j = (i * e) % (2 * n)
    dst = j % n
    neg = np.zeros(n, dtype=bool)
    neg[dst] = j >= n
    sg = neg.reshape(rows, LANES).astype(np.uint32)
    return Q, P, rm, sg


def _perm16(x16, Qr, Pr):
    # one-hot contraction at HIGHEST precision is exact for u16 planes
    # (default f32 matmul truncates operands to bf16); Mosaic has no
    # u32 -> f32 cast, hop through i32
    f = x16.astype(jnp.int32).astype(jnp.float32)
    f = jnp.matmul(
        Qr, f, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    f = jnp.matmul(
        f, Pr, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return f.astype(jnp.int32).astype(jnp.uint32)


def _aut_tile(lo, hi, q: int, Qr, Pr, rm, sg, nbits: int):
    """Automorphism of one (rows, LANES) canonical-residue tile."""
    U = jnp.uint32
    planes = [lo & U(0xFFFF), lo >> U(16), hi & U(0xFFFF), hi >> U(16)]
    planes = [_perm16(p, Qr, Pr) for p in planes]
    lo = planes[0] | (planes[1] << U(16))
    hi = planes[2] | (planes[3] << U(16))
    for k in range(nbits):
        m = rm[k] != U(0)
        lo = jnp.where(m, pltpu.roll(lo, 1 << k, 0), lo)
        hi = jnp.where(m, pltpu.roll(hi, 1 << k, 0), hi)
    # literal q - x including x = 0 -> q (RTL sign rule)
    slo, shi = r32.sub64(U(q & 0xFFFFFFFF), U(q >> 32), lo, hi)
    m = sg != U(0)
    return jnp.where(m, slo, lo), jnp.where(m, shi, hi)


# --------------------------------------------------------- stage factories
def _mk_stages(mode, tbl_refs, m, q, rows, bp, logn, inverse, lazy=False):
    """One modulus' transform body from stacked table refs.

    mode 'stream': the butterfly stage loops (ns._make_stage_loops, 6
    stacked table planes); mode 'mxu': the 4-step int8-digit matmul form
    (ntt_mxu.make_stages, 12 stacked operands).  Both return a function
    (alo, ahi) -> (zlo, zhi) on (bp, rows, LANES) planes with canonical
    [0, q) output — except mxu with lazy=True, which emits the fold59
    window (W < 20q + 2^59) for consumers that accept arbitrary u64."""
    if mode == "mxu":
        from aloha_tpu.ops import ntt_mxu

        return ntt_mxu.make_stages(tbl_refs, m, q, rows, bp, inverse,
                                   lazy=lazy)
    tbl = tuple(ns._TblSlice(r, m) for r in tbl_refs)
    fwd, inv = ns._make_stage_loops(tbl, q, rows, bp, logn)
    return inv if inverse else fwd


def _ks_ntt_mode(cfg: HEConfig) -> str:
    """In-kernel transform selection (ALOHA_KS_NTT=auto|stream|mxu).

    auto picks the 4-step MXU form when every modulus satisfies its
    preconditions (q in (2^59, 2^60) with single-fold margin) — measured
    ~1.7x the butterfly stage loops on hardware — else the stream form."""
    mode = os.environ.get("ALOHA_KS_NTT", "auto")
    if mode != "auto":
        return mode
    from aloha_tpu.ops import ntt_mxu

    try:
        for q in cfg.moduli:
            if not (1 << 59) < q < (1 << 60):
                return "stream"
            ntt_mxu._check_fold_margin(cfg.n, q)
    except AssertionError:
        return "stream"
    return "mxu"


# ------------------------------------------------------------ head kernel
def _head_body(
    cfg: HEConfig, bp: int, rows: int, mode: str, lazy_out: bool,
    aut: bool, ni: int, nf: int,
    *refs,
    # refs: ni inverse-table refs (stacked (L, ...)), nf forward-table
    # refs (stacked (L+1, ...)), Qr, Pr, rm, sg automorphism constants,
    # xlo, xhi (L, bp, rows, LANES) b-part blocks, olo, ohi
    # (L+1, bp, L, rows, LANES) output blocks
):
    """INTT -> automorphism -> digit raise -> NTT on the b part only.

    The a part ("rider") never enters this kernel: the automorphism is a
    pure permutation of NTT evaluation points (slot k's point psi^(2
    bitrev(k)+1) maps to point*e), so the host applies it as one XLA
    gather on the NTT-domain planes instead of the INTT/aut/NTT round
    trip the reference's coefficient-domain vaut forces (5 of the
    keyswitch's 19 poly-transforms removed; reference: the 122-instr
    program, sim/vp/isram_file_generator/keyswitch.mem)."""
    itbl = refs[:ni]
    ftbl = refs[ni:ni + nf]
    Qr, Pr, rm, sg, xlo, xhi, olo, ohi = refs[ni + nf:]
    L = cfg.n_limbs
    moduli = cfg.moduli
    logn = (rows * LANES).bit_length() - 1
    nbits = rows.bit_length() - 1
    Q_ = Qr[...] if aut else None
    P_ = Pr[...] if aut else None
    rm_ = rm[...] if aut else None
    sg_ = sg[...] if aut else None

    digits = []
    for m in range(L):
        inv = _mk_stages(mode, itbl, m, moduli[m], rows, bp, logn, True)
        lo, hi = inv(xlo[m], xhi[m])
        if not aut:
            # hoisted head: digits of b itself (the per-step
            # automorphism rides later as an NTT-domain gather)
            digits.append((lo, hi))
            continue
        alo, ahi = [], []
        for p in range(bp):
            tl, th = _aut_tile(
                lo[p], hi[p], moduli[m], Q_, P_, rm_, sg_, nbits
            )
            alo.append(tl)
            ahi.append(th)
        digits.append((jnp.stack(alo), jnp.stack(ahi)))  # aut(INTT(b_m))

    for mm in range(L + 1):
        polys = []
        for j, d in enumerate(digits):
            if mm == j:
                x = d
            elif moduli[mm] > moduli[j]:
                x = r32.lazy_reduce64(*d, moduli[mm])
            else:
                x = r32.modred64(*d, moduli[mm])
            polys.append(x)
        slo = jnp.stack([p[0] for p in polys], axis=1)
        shi = jnp.stack([p[1] for p in polys], axis=1)
        # the raised digits feed ONLY the tail's inner products; on the
        # Shoup tail (x < 2^64 arbitrary -> < 3q) the forward NTT can
        # emit the lazy fold59 window and skip L+1 final folds
        fwd = _mk_stages(
            mode, ftbl, mm, moduli[mm], rows, bp * L, logn, False,
            lazy=lazy_out,
        )
        rlo, rhi = fwd(
            slo.reshape(bp * L, rows, LANES),
            shi.reshape(bp * L, rows, LANES),
        )
        olo[mm] = rlo.reshape(bp, L, rows, LANES)
        ohi[mm] = rhi.reshape(bp, L, rows, LANES)


# ------------------------------------------------------------ tail kernel
def _tail_body(
    cfg: HEConfig, bp: int, rows: int, mode: str, ni: int, nf: int,
    nks: int,
    *refs,
    # refs: ni inverse-table refs for sp (stacked (1, ...)), nf forward-
    # table refs (stacked (L, ...)), klo, khi KSK planes
    # (2L(L+1), rows, LANES), nks (0 or 4) KSK Shoup limb planes,
    # nlo, nhi head output (L+1, bp, L, ...), rlo, rhi rider planes
    # (L, bp, rows, LANES), alo_out, ahi_out (L, bp, 2, rows, LANES)
):
    itbl = refs[:ni]
    ftbl = refs[ni:ni + nf]
    klo, khi = refs[ni + nf:ni + nf + 2]
    ks = refs[ni + nf + 2:ni + nf + 2 + nks] if nks else (None,) * 4
    ks0, ks1, ks2, ks3 = ks
    nlo, nhi, rlo, rhi, alo_out, ahi_out = refs[ni + nf + 2 + nks:]
    L = cfg.n_limbs
    moduli = cfg.moduli
    sp = cfg.special_prime
    half = (sp - 1) // 2
    logn = (rows * LANES).bit_length() - 1
    stride = 2 * L

    def bc(v, shape):
        vlo, vhi = r32.const64(v)
        return jnp.broadcast_to(vlo, shape), jnp.broadcast_to(vhi, shape)

    # inner products under every residue (KSK resident in VMEM).  With a
    # PREPARED key (ks0..ks3 = 16-bit limb planes of floor(k 2^64/q),
    # computed once at key load — the TPU form of the reference's DMA
    # cmd-0 key load, src/mem_buf/axi_data_rd_top.sv), each product is a
    # Shoup multiply (~19 VPU mults) instead of a full Barrett (~38),
    # the terms accumulate lazily (< 3q each, < 3Lq total < 2^63 for
    # L <= 16), and one modred closes the sum.
    c = [[None, None] for _ in range(L + 1)]
    riders = [(rlo[m], rhi[m]) for m in range(L)]
    shoup = ks0 is not None
    for m in range(L + 1):
        q = moduli[m]
        glo = nlo[m]
        ghi = nhi[m]
        for part in (0, 1):
            if shoup:
                acc = (None, None)
                for j in range(L):
                    # leading axis: the step-block (size 1) the grid's
                    # index map selected — this chunk's own key
                    p = stride * m + 2 * j + part
                    t = ns._shoup_mul_limb(
                        glo[:, j], ghi[:, j],
                        klo[0, p][None], khi[0, p][None],
                        ks0[0, p][None], ks1[0, p][None],
                        ks2[0, p][None], ks3[0, p][None],
                        q,
                    )
                    acc = t if j == 0 else r32.add64(*acc, *t)
                c[m][part] = r32.modred64(*acc, q)
            else:
                acc = r32.mulmod64(
                    glo[:, 0], ghi[:, 0],
                    klo[0, stride * m + part][None],
                    khi[0, stride * m + part][None],
                    q,
                )
                for j in range(1, L):
                    t = r32.mulmod64(
                        glo[:, j], ghi[:, j],
                        klo[0, stride * m + 2 * j + part][None],
                        khi[0, stride * m + 2 * j + part][None],
                        q,
                    )
                    acc = r32.addmod64(*acc, *t, q)
                c[m][part] = acc

    # mod-down by P with (P-1)/2 rounding
    inv = _mk_stages(mode, itbl, 0, sp, rows, 2 * bp, logn, True)
    plo = jnp.stack([c[L][0][0], c[L][1][0]], axis=1)
    phi = jnp.stack([c[L][0][1], c[L][1][1]], axis=1)
    plo, phi = inv(
        plo.reshape(2 * bp, rows, LANES), phi.reshape(2 * bp, rows, LANES)
    )
    plo = plo.reshape(bp, 2, rows, LANES)
    phi = phi.reshape(bp, 2, rows, LANES)
    sh = (bp, rows, LANES)
    m_coeff = [
        r32.addmod64(plo[:, p], phi[:, p], *bc(half, sh), sp)
        for p in (0, 1)
    ]

    for m in range(L):
        q = moduli[m]
        slo = jnp.stack(
            [
                r32.submod64(*m_coeff[p], *bc(half, sh), q)[0]
                for p in (0, 1)
            ],
            axis=1,
        )
        shi = jnp.stack(
            [
                r32.submod64(*m_coeff[p], *bc(half, sh), q)[1]
                for p in (0, 1)
            ],
            axis=1,
        )
        fwd = _mk_stages(mode, ftbl, m, q, rows, 2 * bp, logn, False)
        clo, chi = fwd(
            slo.reshape(2 * bp, rows, LANES), shi.reshape(2 * bp, rows, LANES)
        )
        clo = clo.reshape(bp, 2, rows, LANES)
        chi = chi.reshape(bp, 2, rows, LANES)
        outs = []
        for part in (0, 1):
            t = r32.submod64(
                *c[m][part], clo[:, part], chi[:, part], q
            )
            ks = r32.mulmod64(*t, *bc(cfg.pinv_mod(m), sh), q)
            if part == 0:
                ks = r32.addmod64(*riders[m], *ks, q)
            outs.append(ks)
        alo_out[m] = jnp.stack([outs[0][0], outs[1][0]], axis=1)
        ahi_out[m] = jnp.stack([outs[0][1], outs[1][1]], axis=1)


# --------------------------------------------------------------- wrappers
def _interp() -> bool:
    return bool(os.environ.get("ALOHA_STREAM_INTERPRET"))


def _params():
    return pltpu.CompilerParams(
        vmem_limit_bytes=int(
            os.environ.get("ALOHA_STREAM_VMEM", str(100 * 2**20))
        ),
    )


@functools.lru_cache(maxsize=None)
def _head_tables(cfg: HEConfig, mode: str = "stream"):
    L = cfg.n_limbs
    if mode == "mxu":
        from aloha_tpu.ops import ntt_mxu

        return (
            ntt_mxu.stacked_tables_np(
                cfg.n, cfg.moduli[:L], cfg.psi[:L], True
            ),
            ntt_mxu.stacked_tables_np(cfg.n, cfg.moduli, cfg.psi, False),
        )
    inv = [
        ns._tables6_np(cfg.n, cfg.ipsi[m], cfg.moduli[m], True)
        for m in range(L)
    ]
    fwd = [
        ns._tables6_np(cfg.n, cfg.psi[m], cfg.moduli[m], False)
        for m in range(L + 1)
    ]
    return (
        tuple(np.stack(p) for p in zip(*inv)),
        tuple(np.stack(p) for p in zip(*fwd)),
    )


@functools.lru_cache(maxsize=None)
def _tail_tables(cfg: HEConfig, mode: str = "stream"):
    L = cfg.n_limbs
    if mode == "mxu":
        from aloha_tpu.ops import ntt_mxu

        return (
            ntt_mxu.stacked_tables_np(
                cfg.n, (cfg.special_prime,), (cfg.psi[-1],), True
            ),
            ntt_mxu.stacked_tables_np(
                cfg.n, cfg.moduli[:L], cfg.psi[:L], False
            ),
        )
    inv = ns._tables6_np(cfg.n, cfg.ipsi[-1], cfg.special_prime, True)
    fwd = [
        ns._tables6_np(cfg.n, cfg.psi[m], cfg.moduli[m], False)
        for m in range(L)
    ]
    return (
        tuple(t[None] for t in inv),
        tuple(np.stack(p) for p in zip(*fwd)),
    )


def _chunk(nb: int) -> int:
    # 16 measured 1.5x over 4 with the MXU transform mode (28.0 vs 42.6
    # us/rotation in one A/B window): bigger chunks feed the digit
    # matmuls wider N and amortize per-chunk machinery
    bp = int(os.environ.get("ALOHA_KS_BP", "16"))
    while nb % bp:
        bp //= 2
    return bp


def _ntt_aut_perm_np(n: int, e: int) -> np.ndarray:
    """NTT-domain automorphism gather table (see ntt_np.ntt_aut_perm)."""
    from aloha_tpu import ntt_np

    return ntt_np.ntt_aut_perm(n, e)


def ntt_domain_aut(plane, e: int, n: int):
    """Apply the automorphism to NTT-domain data laid out (..., n):
    gather over the last axis, batch-shape agnostic."""
    perm = jnp.asarray(_ntt_aut_perm_np(n, e))
    return jnp.take(plane, perm, axis=-1)


def ks_head(xlo, xhi, step_exp, cfg: HEConfig,
            lazy_out: bool = False):
    """(L, nb, rows, LANES) b-part planes
    -> (L+1, nb, L, rows, LANES) raised digit planes.

    step_exp=None: HOISTED head — the in-kernel automorphism is
    skipped, producing raised digits of b itself; each rotation step
    then applies its automorphism as an NTT-domain gather on these
    planes (rotate_planes_hoisted).

    lazy_out=True (mxu mode only): the raised digits come out in the
    fold59 window instead of canonical — callers must feed them to a
    consumer that accepts arbitrary u64 (the Shoup tail;
    ALOHA_KS_LAZY_HEAD=0 disables)."""
    L = cfg.n_limbs
    nb = xlo.shape[1]
    rows = cfg.n // LANES
    bp = _chunk(nb)
    mode = _ks_ntt_mode(cfg)
    lazy_out = (
        lazy_out and mode == "mxu"
        and os.environ.get("ALOHA_KS_LAZY_HEAD", "1") != "0"
    )
    itbl, ftbl = _head_tables(cfg, mode)
    aut = step_exp is not None
    # e=1 identity consts keep the kernel signature stable on the
    # hoisted path (the body never touches them when aut is False)
    Q, P, rm, sg = _aut_consts_np(cfg.n, step_exp if aut else 1)
    consts = [jnp.asarray(t) for t in (*itbl, *ftbl, Q, P, rm, sg)]
    ntbl = len(itbl) + len(ftbl)
    grid = (nb // bp,)
    full = lambda s: pl.BlockSpec(s, lambda c: (0,) * len(s))  # noqa: E731
    body = functools.partial(
        _head_body, cfg, bp, rows, mode, lazy_out, aut,
        len(itbl), len(ftbl)
    )
    with jax.enable_x64(False):
        call = pl.pallas_call(
            body,
            grid=grid,
            in_specs=(
                [full(t.shape) for t in consts[:ntbl]]
                + [
                    pl.BlockSpec((rows, rows), lambda c: (0, 0)),
                    pl.BlockSpec((LANES, LANES), lambda c: (0, 0)),
                    pl.BlockSpec(rm.shape, lambda c: (0, 0, 0)),
                    pl.BlockSpec((rows, LANES), lambda c: (0, 0)),
                ]
                + [
                    pl.BlockSpec(
                        (L, bp, rows, LANES),
                        lambda c: (0, c, 0, 0),
                    )
                ]
                * 2
            ),
            out_specs=[
                pl.BlockSpec(
                    (L + 1, bp, L, rows, LANES),
                    lambda c: (0, c, 0, 0, 0),
                )
            ]
            * 2,
            out_shape=[
                jax.ShapeDtypeStruct(
                    (L + 1, nb, L, rows, LANES), jnp.uint32
                )
            ]
            * 2,
            interpret=_interp(),
            compiler_params=_params(),
        )
        return call(*consts, xlo, xhi)


def ks_tail(nlo, nhi, rlo, rhi, klo, khi, cfg: HEConfig, kshoup=None,
            shared_inputs: bool = False):
    """Raised digit planes + NTT-domain riders + KSK -> rotated
    ciphertext planes (L, nb, 2, rows, LANES): [:, :, 0] = a_rot,
    [:, :, 1] = b_rot.  kshoup: optional (s0, s1, s2, s3) 16-bit limb
    planes of the key's Shoup constants (see prepare_ksk).

    BATCHED-KEY form: klo/khi (and each kshoup plane) may carry a
    leading step axis (K, 2L(L+1), rows, LANES) with the nb axis laid
    out step-major as K blocks of nb/K ciphertexts each — K rotations
    by DIFFERENT keys run in this ONE launch, the grid's index map
    selecting each chunk's key block (c // nchunks_per_step).  Rank-3
    keys mean K=1 (the classic single-key tail).

    shared_inputs=True (lazy-gather hoisting): nlo/nhi/rlo/rhi hold ONE
    step's worth of data (nb ciphertexts) consumed by ALL K key blocks —
    the data index maps wrap modulo nchunks, so the K (step-dependent)
    tails re-read the SAME HBM planes instead of K gathered copies;
    outputs still come out step-major (L, K*nb, 2, ...)."""
    L = cfg.n_limbs
    nb = nlo.shape[1]
    rows = cfg.n // LANES
    if klo.ndim == 3:
        klo, khi = klo[None], khi[None]
        if kshoup is not None:
            kshoup = tuple(s[None] for s in kshoup)
    K = klo.shape[0]
    if shared_inputs:
        nb_out = nb * K
        bp = _chunk(nb)
        nchunks = nb // bp
    else:
        nb_out = nb
        assert nb % K == 0, (nb, K)
        bp = _chunk(nb // K)
        nchunks = (nb // K) // bp
    mode = _ks_ntt_mode(cfg)
    itbl, ftbl = _tail_tables(cfg, mode)
    consts = [jnp.asarray(t) for t in (*itbl, *ftbl)]
    nks = 4 if kshoup is not None else 0
    body = functools.partial(
        _tail_body, cfg, bp, rows, mode, len(itbl), len(ftbl), nks
    )
    full = lambda s: pl.BlockSpec(s, lambda c: (0,) * len(s))  # noqa: E731
    kspec = pl.BlockSpec(
        (1,) + klo.shape[1:], lambda c: (c // nchunks, 0, 0, 0)
    )
    if shared_inputs:
        dix = lambda c: c % nchunks  # noqa: E731
    else:
        dix = lambda c: c  # noqa: E731
    with jax.enable_x64(False):
        call = pl.pallas_call(
            body,
            grid=(nb_out // bp,),
            in_specs=(
                [full(t.shape) for t in consts]
                + [kspec] * (2 + nks)
                + [
                    pl.BlockSpec(
                        (L + 1, bp, L, rows, LANES),
                        lambda c: (0, dix(c), 0, 0, 0),
                    )
                ]
                * 2
                + [
                    pl.BlockSpec(
                        (L, bp, rows, LANES), lambda c: (0, dix(c), 0, 0)
                    )
                ]
                * 2
            ),
            out_specs=[
                pl.BlockSpec(
                    (L, bp, 2, rows, LANES), lambda c: (0, c, 0, 0, 0)
                )
            ]
            * 2,
            out_shape=[
                jax.ShapeDtypeStruct((L, nb_out, 2, rows, LANES), jnp.uint32)
            ]
            * 2,
            interpret=_interp(),
            compiler_params=_params(),
        )
        return call(
            *consts, klo, khi, *(kshoup or ()), nlo, nhi, rlo, rhi
        )


import collections

_KSK_CACHE: "collections.OrderedDict" = collections.OrderedDict()
# enough for a full BSGS key set (g-1 baby + b-1 giant keys, default
# bench K=12) plus headroom; evicts oldest-first instead of wholesale
# (advisor r4: a >8-key workload thrashed the old clear-all cache)
_KSK_CACHE_CAP = int(os.environ.get("ALOHA_KSK_CACHE_CAP", "64"))


def prepare_ksk(ksk, cfg: HEConfig, aut_exp: int | None = None):
    """Device-key preparation: compute floor(k * 2^64 / q_m) for every
    KSK coefficient (the Shoup companion of the key, host-side bigint,
    once per key) and return (klo, khi, s0, s1, s2, s3) planes shaped
    (2L(L+1), rows, LANES).  The analogue of the reference's one-time
    key DMA into ksk_mem (reference: sim/top/top_noaxilite_tb.sv:372).

    aut_exp: Galois exponent e of the rotation this key serves — the
    key planes are INVERSE-gathered (NTT-domain permutation for
    e^-1 mod 2n) before preparation, so the hoisted/batched tails can
    consume UNGATHERED digit planes and defer the automorphism to the
    (much smaller) output ciphertext (the lazy-gather form; see
    rotate_planes_hoisted).  One-time per (key, e), like the Shoup prep.

    Results are cached by the identity of the input planes (the cache
    holds a reference, so ids stay valid)."""
    klo, khi = ksk
    ck = (id(klo), id(khi), aut_exp)
    hit = _KSK_CACHE.get(ck)
    if hit is not None and hit[0] is klo and hit[1] is khi:
        _KSK_CACHE.move_to_end(ck)
        return hit[2]
    L = cfg.n_limbs
    rows = cfg.n // LANES
    k64 = (
        np.asarray(klo).astype(np.uint64)
        | (np.asarray(khi).astype(np.uint64) << np.uint64(32))
    ).reshape(2 * L * (L + 1), cfg.n)
    if aut_exp is not None:
        pinv = _ntt_aut_perm_np(
            cfg.n, pow(aut_exp, -1, 2 * cfg.n)
        )
        k64 = np.ascontiguousarray(k64[:, pinv])
    s = np.empty_like(k64)
    stride = 2 * L
    for p in range(k64.shape[0]):
        q = cfg.moduli[p // stride]
        s[p] = (
            (k64[p].astype(object) << 64) // q
        ).astype(np.uint64)
    m16 = np.uint64(0xFFFF)
    limbs = [
        ((s >> np.uint64(16 * i)) & m16)
        .astype(np.uint32)
        .reshape(-1, rows, LANES)
        for i in range(4)
    ]
    # Materialize OUTSIDE any live trace: prepare_ksk is reached from
    # inside jit (the key is closed over concretely), and jnp.asarray
    # under a trace yields trace-local constants — caching those leaks
    # tracers into the next jit of the same key.
    with jax.ensure_compile_time_eval():
        out = (
            # the w planes come from k64 (carries the aut_exp inverse
            # gather when set), NOT the raw input planes
            jnp.asarray(
                (k64 & np.uint64(0xFFFFFFFF))
                .astype(np.uint32).reshape(-1, rows, LANES)
            ),
            jnp.asarray(
                (k64 >> np.uint64(32))
                .astype(np.uint32).reshape(-1, rows, LANES)
            ),
            *(jnp.asarray(v) for v in limbs),
        )
    while len(_KSK_CACHE) >= _KSK_CACHE_CAP:
        _KSK_CACHE.popitem(last=False)
    _KSK_CACHE[ck] = (klo, khi, out)
    return out


def rotate_planes(a, b, step_exp: int, ksk, cfg: HEConfig):
    """Full rotation in two launches.  a, b: (lo, hi) planes (..., L, N);
    ksk: (lo, hi) of (2L(L+1), N).  Returns (a_rot, b_rot) like
    he_planes.rotate.

    The a part rides outside the kernels: its automorphism is the pure
    NTT-domain permutation `ntt_domain_aut` (one XLA gather), not the
    reference's coefficient-domain INTT/vaut/NTT round trip.  When the
    key planes are concrete (not jit tracers) they are Shoup-prepared
    once and the tail's inner products run 2x cheaper."""
    L = cfg.n_limbs
    rows = cfg.n // LANES
    alo, ahi = a
    blo, bhi = b
    batch = alo.shape[:-2]
    nb = int(np.prod(batch)) if batch else 1

    def pack(lo):
        # (..., L, N) -> (L, nb, rows, LANES)
        t = lo.reshape(nb, L, rows, LANES)
        return jnp.moveaxis(t, 1, 0)

    klo, khi = ksk
    traced_key = isinstance(klo, jax.core.Tracer)
    # Shoup tail accepts arbitrary u64 digits -> the head's forward NTT
    # can skip its L+1 final folds (lazy); the traced-key Barrett tail
    # needs canonical inputs.
    nlo, nhi = ks_head(
        pack(blo), pack(bhi), step_exp, cfg, lazy_out=not traced_key
    )
    rlo = pack(ntt_domain_aut(alo, step_exp, cfg.n))
    rhi = pack(ntt_domain_aut(ahi, step_exp, cfg.n))
    if traced_key:  # key not concrete: no prepare
        kplanes = (
            klo.reshape(2 * L * (L + 1), rows, LANES),
            khi.reshape(2 * L * (L + 1), rows, LANES),
        )
        kshoup = None
    else:
        klo2, khi2, *kshoup = prepare_ksk(ksk, cfg)
        kplanes = (klo2, khi2)
        kshoup = tuple(kshoup)
    olo, ohi = ks_tail(nlo, nhi, rlo, rhi, *kplanes, cfg, kshoup=kshoup)

    def unpack(t, part):
        # (L, nb, 2, rows, LANES) -> (..., L, N)
        u = jnp.moveaxis(t[:, :, part], 0, 1)
        return u.reshape(batch + (L, cfg.n))

    a_rot = (unpack(olo, 0), unpack(ohi, 0))
    b_rot = (unpack(olo, 1), unpack(ohi, 1))
    return a_rot, b_rot


def _stacked_keys(ksks, cfg: HEConfig, aut_exps=None):
    """Stack K keys into the batched-tail layout: (klo, khi) of
    (K, 2L(L+1), rows, LANES) plus the Shoup limb-plane stack (or None
    when any key is a jit tracer — no host-side preparation possible).

    aut_exps: per-key Galois exponents for the lazy-gather form — each
    key is inverse-gathered (host-side when concrete, one jnp gather
    when traced) so the tail consumes ungathered digit planes."""
    L = cfg.n_limbs
    rows = cfg.n // LANES
    n = cfg.n
    traced = any(
        isinstance(k[0], jax.core.Tracer) or isinstance(k[1], jax.core.Tracer)
        for k in ksks
    )
    if traced:
        def prep(k, e):
            if aut_exps is not None:
                pinv = jnp.asarray(
                    _ntt_aut_perm_np(n, pow(e, -1, 2 * n))
                )
                k = jnp.take(k.reshape(2 * L * (L + 1), n), pinv, axis=-1)
            return k.reshape(2 * L * (L + 1), rows, LANES)

        exps = aut_exps or [None] * len(ksks)
        klo = jnp.stack([prep(k[0], e) for k, e in zip(ksks, exps)])
        khi = jnp.stack([prep(k[1], e) for k, e in zip(ksks, exps)])
        return klo, khi, None, traced
    exps = aut_exps or [None] * len(ksks)
    preps = [prepare_ksk(k, cfg, aut_exp=e) for k, e in zip(ksks, exps)]
    klo = jnp.stack([p[0] for p in preps])
    khi = jnp.stack([p[1] for p in preps])
    kshoup = tuple(
        jnp.stack([p[2 + i] for p in preps]) for i in range(4)
    )
    return klo, khi, kshoup, traced


def rotate_planes_hoisted(a, b, step_exps, ksks, cfg: HEConfig):
    """Hoisted rotations (Halevi-Shoup): ONE aut-free head shared by
    every step, then ONE batched tail launch covering all K steps (each
    chunk's KSK selected by the grid index map) — 2 kernel launches
    total regardless of K, vs round 4's 1 + K.

    a, b: (lo, hi) planes (..., L, N) of the ciphertext being rotated;
    step_exps: Galois exponents (3^step mod 2N); ksks: matching list of
    (lo, hi) key planes — the SAME keys rotate_planes uses.  Returns a
    list of (a_rot, b_rot) aligned with step_exps.

    Validity: the digits are plain residues (reduction = ring
    homomorphism, commutes with the automorphism) and aut(lift(d))
    over the integers carries the same < q_j coefficient bound as
    lift(aut(d)) — identical noise, so the head's INTT + digit raise +
    L(L+1)+L forward NTTs (8 of the rotation's 14 transforms) amortize
    over all steps.  Outputs decrypt identically to rotate_planes but
    are not word-equal to it (different digit lift representatives);
    word-exact against the he_np.rotate_hoisted oracle.  The per-step
    NTT-domain automorphisms run as ONE stacked gather ((K, n)
    permutation table) feeding the step-major batch axis."""
    assert len(step_exps) == len(ksks), (
        f"{len(step_exps)} steps but {len(ksks)} key-switch keys"
    )
    if not step_exps:
        return []
    L = cfg.n_limbs
    rows = cfg.n // LANES
    alo, ahi = a
    blo, bhi = b
    batch = alo.shape[:-2]
    nb = int(np.prod(batch)) if batch else 1
    n = cfg.n
    K = len(step_exps)

    def pack(lo):
        t = lo.reshape(nb, L, rows, LANES)
        return jnp.moveaxis(t, 1, 0)

    # LAZY-GATHER form: the per-step automorphism rides the KEY
    # (inverse-gathered once at preparation) and the OUTPUT ciphertext —
    # g_e(sum_j nd_j * g_e^-1(K_j)) = sum_j g_e(nd_j) * K_j and the
    # mod-down tail is sigma-equivariant, so ALL K tail blocks consume
    # the SAME ungathered digit planes and riders (shared_inputs mode:
    # no K-fold gathered copies in HBM at all); per step only the L-limb
    # output pair is gathered.  he_np.rotate_hoisted mirrors this
    # formulation exactly, keeping word-exactness by construction.
    klo, khi, kshoup, traced = _stacked_keys(
        ksks, cfg, aut_exps=list(step_exps)
    )
    nlo, nhi = ks_head(
        pack(blo), pack(bhi), None, cfg, lazy_out=not traced
    )

    olo, ohi = ks_tail(
        nlo, nhi, pack(alo), pack(ahi),
        klo, khi, cfg, kshoup=kshoup, shared_inputs=True,
    )
    return _unpack_gathered(olo, ohi, step_exps, batch, nb, cfg)


def _unpack_gathered(olo, ohi, step_exps, batch, nb, cfg: HEConfig):
    """Shared epilogue of the lazy-gather paths: slice each step's
    block out of the step-major tail output (L, K*nb, 2, rows, LANES)
    and apply ITS output gather — returns the per-step list of
    ((a_lo, a_hi), (b_lo, b_hi)) plane ciphertexts."""
    L = cfg.n_limbs
    n = cfg.n
    perms = [jnp.asarray(_ntt_aut_perm_np(n, e)) for e in step_exps]

    def unpack(t, k, part):
        u = jnp.moveaxis(t[:, k * nb:(k + 1) * nb, part], 0, 1)
        return jnp.take(
            u.reshape(batch + (L, n)), perms[k], axis=-1
        )

    return [
        ((unpack(olo, k, 0), unpack(ohi, k, 0)),
         (unpack(olo, k, 1), unpack(ohi, k, 1)))
        for k in range(len(step_exps))
    ]


def rotate_planes_batch(cts, step_exps, ksks, cfg: HEConfig):
    """Rotate K DIFFERENT ciphertexts by (generally different) steps in
    TWO launches total: the K b-parts stack on the batch axis through
    one aut-free head, each block then takes its own NTT-domain gather
    and its own KSK in one batched tail (the BSGS giant-step shape:
    b-1 distinct partial sums each needing one rotation; reference
    analogue: K separate 122-instruction keyswitch program runs,
    sim/vp/isram_file_generator/keyswitch.mem).

    cts: list of K ((alo, ahi), (blo, bhi)) plane ciphertexts with
    identical batch shape; step_exps/ksks: per-ct Galois exponent and
    key.  Returns a list of (a_rot, b_rot) aligned with cts.  Uses the
    hoisted digit lift (aut after raise), so outputs are word-exact
    against he_np.rotate_hoisted(ct_k, [step_k], [ksk_k]) and decrypt
    identically to rotate_planes."""
    assert len(cts) == len(step_exps) == len(ksks), (
        f"{len(cts)} cts, {len(step_exps)} steps, {len(ksks)} keys"
    )
    L = cfg.n_limbs
    rows = cfg.n // LANES
    n = cfg.n
    K = len(cts)
    batch = cts[0][0][0].shape[:-2]
    nb = int(np.prod(batch)) if batch else 1

    def packK(parts):
        # K x (..., L, n) -> (L, K*nb, rows, LANES) step-major
        t = jnp.stack([p.reshape(nb, L, rows, LANES) for p in parts])
        return jnp.moveaxis(t.reshape(K * nb, L, rows, LANES), 1, 0)

    # lazy-gather form (see rotate_planes_hoisted): per-block keys are
    # inverse-gathered at preparation, digits and riders enter the tail
    # ungathered, each block's small output pair takes the gather
    klo, khi, kshoup, traced = _stacked_keys(
        ksks, cfg, aut_exps=list(step_exps)
    )
    nlo, nhi = ks_head(
        packK([ct[1][0] for ct in cts]),
        packK([ct[1][1] for ct in cts]),
        None, cfg, lazy_out=not traced,
    )

    olo, ohi = ks_tail(
        nlo, nhi,
        packK([ct[0][0] for ct in cts]),
        packK([ct[0][1] for ct in cts]),
        klo, khi, cfg, kshoup=kshoup,
    )
    return _unpack_gathered(olo, ohi, step_exps, batch, nb, cfg)
