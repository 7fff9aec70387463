"""4-step MXU NTT: the butterfly arithmetic as int8 digit matmuls.

The TPU re-design of the reference's 832-beat NTT engine (reference:
src/vp/ntt/ntt_fsm.sv:49,68) that moves the multiply work from the VPU
to the MXU.  With coefficient j at (row r = j // 128, lane l = j % 128),
the negacyclic transform factors EXACTLY (proven in
tools/mxu_factor_proof.py for all three moduli, fwd + inv) as

    Y[kr, l]  = sum_r x[128 r + l] * eta^(r (2 kr + 1))      rows: (R x R) matmul
    W[kr, l]  = D[kr, l] * Y[kr, l]                          elementwise twiddle
    Z[kr, kl] = sum_l W[kr, l] * Omega^(l kl)                lanes: (128 x 128) matmul
    out[128 ir + il] = Z[rev(ir), rev7(il)]

with eta = psi^128, Omega = psi^(2R), D[kr, l] = psi^((2 kr + 1) l); the
bitrev-13 output order separates as rev_lr (x) rev7 and is baked into the
constant matrices.  The inverse runs the mirror (lanes -> D^-1 -> rows)
with 1/R and 1/128 folded into the matrices.

Exact 60-bit arithmetic on the int8 MXU:

* Data digits: 8 biased bytes s_k = byte_k(x) - 128 in [-128, 127]
  (computed as (byte ^ 0x80) reinterpreted int8).  The bias is linear, so
  it is repaired by a precomputed additive constant (the matrix row sums).
* Matrix digits: the digit weight 2^(8k) is FOLDED INTO THE MATRIX first
  (A_k = 2^(8k) M mod q, entries < q), then each A_k is split into 8
  balanced signed base-256 digits in [-128, 127].  Products therefore
  carry no cross-weights: accumulator j only ever receives digit-j
  products, so 8 int32 accumulators suffice and the reassembled value
  V = sum_j 2^(8j) e_j stays under 2^82.
* One dot per accumulator: the 8 data planes concatenate along the
  contraction axis (K = 8R or 1024), so the MXU performs the whole
  k-accumulation internally - 16 dot_generals per chunk total.
  (Stacking the 8 accumulators into ONE wide dot per step was measured
  2.7x SLOWER on hardware — slicing the accumulators back out of the
  (8R, .) / (., 8L) results forces Mosaic relayout copies that dwarf
  the systolic-array M-utilization win.)
* Reduction: V < 2^82 folds once through 2^59 = -delta (mod q), with
  delta = q - 2^59 sparse for all NTT moduli (a few shifted adds), into
  a u64 W == V (mod q); the middle twiddle is a Shoup multiply by the
  per-position constant D (quotient via 16-bit limb column sums, the
  same form as ops/ntt_stream); the final fold + two condsubs emit
  canonical [0, q).

The HBM <-> VMEM streaming shell (double-buffered chunk DMA) is shared
with ops/ntt_stream via _chunk_pipeline.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from aloha_tpu import ntt_np
from aloha_tpu import rns_jax as r32
from aloha_tpu.ops import ntt_pallas as K
from aloha_tpu.ops import ntt_stream as S
from aloha_tpu.ops.ntt_pallas import LANES

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _OK = True
except Exception:  # pragma: no cover
    _OK = False

I8 = jnp.int8
I32 = jnp.int32
U32 = jnp.uint32
NDIG = 8  # base-256 digits covering u64


def available() -> bool:
    return _OK and K.available()


def _dot_mode() -> str:
    return os.environ.get("ALOHA_MXU_DOT", "i8")


# ------------------------------------------------------------------ tables
def _balanced_digits(v: int) -> list[int]:
    """Signed base-256 digits in [-128, 127]; exact for v < 2^62."""
    out = []
    x = int(v)
    for _ in range(NDIG):
        b = x & 0xFF
        if b >= 128:
            b -= 256
        out.append(b)
        x = (x - b) >> 8
    assert x == 0, "value out of signed-digit range"
    return out


def _digitize_folded(mat: np.ndarray, q: int) -> tuple[np.ndarray, np.ndarray]:
    """mat (a, b) of ints mod q -> (cat (8, a, 8b) int8, rowbias (a,) u64).

    cat[j, i, k*b + c] = digit_j of (2^(8k) * mat[i, c] mod q); rowbias is
    the +128 data-bias repair: 128 * sum_{k, c} (2^(8k) mat[i, c] mod q).
    """
    a, b = mat.shape
    cat = np.zeros((NDIG, a, NDIG * b), dtype=np.int8)
    bias = np.zeros(a, dtype=object)
    for k in range(NDIG):
        fold = (mat.astype(object) << (8 * k)) % q
        bias += fold.sum(axis=1)
        for i in range(a):
            for c in range(b):
                digs = _balanced_digits(fold[i, c])
                for j in range(NDIG):
                    cat[j, i, k * b + c] = digs[j]
    bias = np.array([(128 * int(v)) % q for v in bias], dtype=np.uint64)
    return cat, bias


def _rev(x: int, bits: int) -> int:
    return ntt_np.bit_reverse(x, bits)


def _const_plane(
    vec: np.ndarray, rows: int, axis: int
) -> tuple[np.ndarray, np.ndarray]:
    """u64 vector -> broadcast (rows, LANES) u32 pair.  axis 0: vec is
    per-row (length rows); axis 1: per-lane (length LANES).  Explicit —
    shape-based disambiguation breaks when rows == LANES (n = 16384)."""
    v = vec.astype(np.uint64)
    if axis == 0:
        assert v.shape[0] == rows
        full = np.broadcast_to(v[:, None], (rows, LANES))
    else:
        assert v.shape[0] == LANES
        full = np.broadcast_to(v[None, :], (rows, LANES))
    lo = (full & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (full >> np.uint64(32)).astype(np.uint32)
    return np.ascontiguousarray(lo), np.ascontiguousarray(hi)


def _shoup_planes(mat: np.ndarray, q: int):
    """(a, b) u64 constants -> (wlo, whi, s0..s3) u32/16-bit-limb planes."""
    w = mat.astype(object)
    s = np.array([[int(x) * (1 << 64) // q for x in row] for row in w],
                 dtype=object)
    w64 = mat.astype(np.uint64)
    s64 = np.array([[x & ((1 << 64) - 1) for x in row] for row in s],
                   dtype=np.uint64)
    wlo = (w64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    whi = (w64 >> np.uint64(32)).astype(np.uint32)
    m = np.uint64(0xFFFF)
    s0 = (s64 & m).astype(np.uint32)
    s1 = ((s64 >> np.uint64(16)) & m).astype(np.uint32)
    s2 = ((s64 >> np.uint64(32)) & m).astype(np.uint32)
    s3 = (s64 >> np.uint64(48)).astype(np.uint32)
    return wlo, whi, s0, s1, s2, s3


def _bias_bits(kdim: int) -> int:
    """Accumulator bias exponent: |e_j| <= K * 128 * 128 = K << 14."""
    return (kdim << 14).bit_length() - 1


@functools.lru_cache(maxsize=None)
def _fwd_tables_np(n: int, q: int, psi: int):
    R = n // LANES
    lr = R.bit_length() - 1
    eta = pow(psi, LANES, q)
    omg = pow(psi, 2 * R, q)
    M = np.array(
        [[pow(eta, r * (2 * _rev(ir, lr) + 1), q) for r in range(R)]
         for ir in range(R)], dtype=object)
    D = np.array(
        [[pow(psi, (2 * _rev(ir, lr) + 1) * l, q) for l in range(LANES)]
         for ir in range(R)], dtype=object)
    # step-3 rhs is indexed [contraction c = k*LANES + l, out-lane il]
    Tt = np.array(
        [[pow(omg, l * _rev(il, 7), q) for il in range(LANES)]
         for l in range(LANES)], dtype=object)
    A1, c1 = _digitize_folded(M, q)
    # digitize T in its (il, l) orientation then transpose the cat blocks
    T3, c3 = _digitize_folded(Tt.T, q)  # T3[j, il, k*L + l]
    T3 = np.ascontiguousarray(
        T3.reshape(NDIG, LANES, NDIG, LANES).transpose(0, 2, 3, 1).reshape(
            NDIG, NDIG * LANES, LANES))
    b1, b3 = _bias_bits(NDIG * R), _bias_bits(NDIG * LANES)
    c1 = np.array([(int(v) - sum(1 << (8 * j + b1) for j in range(NDIG)))
                   % q for v in c1], dtype=np.uint64)
    c3 = np.array([(int(v) - sum(1 << (8 * j + b3) for j in range(NDIG)))
                   % q for v in c3], dtype=np.uint64)
    return (A1, T3, _shoup_planes(D.astype(np.uint64), q),
            _const_plane(c1, R, 0), _const_plane(c3, R, 1))


@functools.lru_cache(maxsize=None)
def _inv_tables_np(n: int, q: int, psi: int):
    R = n // LANES
    lr = R.bit_length() - 1
    eta = pow(psi, LANES, q)
    omg = pow(psi, 2 * R, q)
    ieta, iomg, ipsi = (pow(x, q - 2, q) for x in (eta, omg, psi))
    iR, iL = pow(R, q - 2, q), pow(LANES, q - 2, q)
    Minv = np.array(
        [[pow(ieta, r * (2 * _rev(ir, lr) + 1), q) * iR % q
          for ir in range(R)] for r in range(R)], dtype=object)
    Dinv = np.array(
        [[pow(ipsi, (2 * _rev(ir, lr) + 1) * l, q) for l in range(LANES)]
         for ir in range(R)], dtype=object)
    Tinv = np.array(
        [[pow(iomg, _rev(il, 7) * l, q) * iL % q for il in range(LANES)]
         for l in range(LANES)], dtype=object)
    MA, cc = _digitize_folded(Minv, q)
    # step-A rhs indexed [c = k*LANES + il, out-lane l]: digitize Tinv in
    # its (l, il) orientation then transpose cat blocks
    TA, ca = _digitize_folded(Tinv, q)  # TA[j, l, k*L + il]
    TA = np.ascontiguousarray(
        TA.reshape(NDIG, LANES, NDIG, LANES).transpose(0, 2, 3, 1).reshape(
            NDIG, NDIG * LANES, LANES))
    ba, bc = _bias_bits(NDIG * LANES), _bias_bits(NDIG * R)
    ca = np.array([(int(v) - sum(1 << (8 * j + ba) for j in range(NDIG)))
                   % q for v in ca], dtype=np.uint64)
    cc = np.array([(int(v) - sum(1 << (8 * j + bc) for j in range(NDIG)))
                   % q for v in cc], dtype=np.uint64)
    return (MA, TA, _shoup_planes(Dinv.astype(np.uint64), q),
            _const_plane(ca, R, 1), _const_plane(cc, R, 0))


# ---------------------------------------------------------- kernel helpers
def _split8(lo, hi):
    """u32 pair -> 8 int8 planes holding byte_k - 128 (biased digits).

    The per-byte bias flip is hoisted to ONE xor per u32 word (xor
    commutes with whole-byte extraction): 2 xors + 6 shift/masks per
    word instead of 8 xors + 10 shift/masks."""
    X4 = U32(0x80808080)
    B = U32(0xFF)
    outs = []
    for w in (lo, hi):
        wx = w ^ X4
        outs.append((wx & B).astype(I8))
        outs.append(((wx >> U32(8)) & B).astype(I8))
        outs.append(((wx >> U32(16)) & B).astype(I8))
        outs.append((wx >> U32(24)).astype(I8))
    return outs


def _dot(a, b):
    """2D digit matmul (int8 x int8 -> int32, or bf16 via f32)."""
    if _dot_mode() == "bf16":
        return jax.lax.dot_general(
            a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(I32)
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=I32
    )


def _add_carry(lo, hi, add):
    """(lo, hi) += add (u32 into the low limb), carry into hi."""
    nlo = lo + add
    return nlo, hi + (nlo < lo).astype(U32)


def _recombine(es, bias_bits: int, clo, chi, q: int):
    """8 int32 accumulators + constant planes -> u64 pair W == V (mod q),
    W < 2^63.3.  V = sum_j 2^(8j) (e_j + 2^bias) + C* < ~2^82."""
    BIAS = I32(1 << bias_bits)
    u = [(e + BIAS).astype(U32) for e in es]
    # limb 0: u0 + u1<<8 + u2<<16 + u3<<24  (u32 wraps keep the low parts)
    L0, L1 = _add_carry(u[0], U32(0), u[1] << U32(8))
    L0, L1 = _add_carry(L0, L1, u[2] << U32(16))
    L0, L1 = _add_carry(L0, L1, u[3] << U32(24))
    # limb 1 terms (carries tracked into L2)
    L2 = U32(0)
    for add in (
        u[1] >> U32(24), u[2] >> U32(16), u[3] >> U32(8), u[4],
        u[5] << U32(8), u[6] << U32(16), u[7] << U32(24),
    ):
        L1, L2 = _add_carry(L1, L2, add)
    L2 = L2 + (u[5] >> U32(24)) + (u[6] >> U32(16)) + (u[7] >> U32(8))
    # + C* (< q, two limbs)
    L0, c = _add_carry(L0, U32(0), clo)
    L1, L2 = _add_carry(L1, L2, chi + c)  # chi < 2^28, no u32 overflow
    return _fold59(L0, L1, L2, q)


def _mul_delta(a, q: int):
    """a (u32, < 2^23) * delta, delta = q - 2^59 (sparse): u64 pair."""
    delta = q - (1 << 59)
    assert delta > 0
    lo = jnp.zeros_like(a) if not (delta & 1) else a
    hi = jnp.zeros_like(a)
    for k in range(1, 64):
        if not (delta >> k) & 1:
            continue
        if k >= 32:
            hi = hi + (a << U32(k - 32) if k > 32 else a)
        else:
            lo, hi = _add_carry(lo, hi, a << U32(k))
            hi = hi + (a >> U32(32 - k))
    return lo, hi


def _fold59(L0, L1, L2, q: int):
    """(L0, L1, L2) = V < 2^82 -> u64 W == V (mod q), W < 20q + 2^59.

    2^59 == -delta (mod q): W = (V mod 2^59) + 20q - (V >> 59) * delta.
    A = V >> 59 < 2^23, so A*delta < 20q for every supported modulus
    (checked at table-build time for P, the widest delta; 16q is 0.4%
    too small for P at the K=1024 contraction)."""
    A = (L1 >> U32(27)) | (L2 << U32(5))
    slo, shi = _mul_delta(A, q)
    blo, bhi = L0, L1 & U32(0x07FFFFFF)
    tlo, thi = r32.add64(blo, bhi, *r32.const64(20 * q))
    return r32.sub64(tlo, thi, slo, shi)


def _fold_final(wlo, whi, q: int):
    """u64 W < 2^59 + 20q -> canonical [0, q): one more sparse fold then
    a condsub (post-fold value < 2q: B < 2^59 and A*delta <= 21*delta < q
    for every supported modulus)."""
    A = whi >> U32(27)
    slo, shi = _mul_delta(A, q)
    blo, bhi = wlo, whi & U32(0x07FFFFFF)
    tlo, thi = r32.add64(blo, bhi, *r32.const64(q))
    lo, hi = r32.sub64(tlo, thi, slo, shi)
    return K._condsub(lo, hi, q)


def _shoup_const(vlo, vhi, tbl, q: int):
    """x * w mod q for per-position constants w (Shoup, limb quotient);
    x < 2^64 arbitrary -> result < 3q (ALOHA_MXU_MUL=limb10: the
    10-multiply quotient, result < 6q — still a valid u64 for the digit
    split, A/B'd within window noise like the stream kernel's knob)."""
    wl, wh, s0, s1, s2, s3 = tbl
    return S._shoup_mul_limb(
        vlo, vhi, wl, wh, s0, s1, s2, s3, q,
        drop3=os.environ.get("ALOHA_MXU_MUL") == "limb10",
    )


# ------------------------------------------------------------- stage bodies
def _stagger() -> int:
    """ALOHA_MXU_STAGGER=S (default 1 = off): process S interleaved
    sub-chunks so one sub-chunk's digit matmuls (MXU) are traced adjacent
    to another's recombine/Shoup chain (VPU), giving the Mosaic scheduler
    independent work for both units at every point.  The parts probe
    (tools/probe_mxu_parts.py) measured the un-staggered body as the
    near-exact SUM of its MXU-only (0.48 us/poly) and VPU-only
    (0.86 us/poly) costs — i.e. zero overlap."""
    return max(1, int(os.environ.get("ALOHA_MXU_STAGGER", "1")))


def _staggered(phases, split_in, join_out, s: int):
    """Run `phases` (list of fns, each (state) -> state) over s sub-parts
    with the trace order staggered one phase apart:
    part0.P0; part1.P0, part0.P1; part2.P0, part1.P1, part0.P2; ..."""

    def run(*x):
        parts = split_in(*x, s=s)
        state = [p for p in parts]
        done = [0] * s
        outs = [None] * s
        nph = len(phases)
        for wave in range(nph + s - 1):
            for i in range(s):
                ph = wave - i
                if 0 <= ph < nph:
                    state[i] = phases[ph](state[i])
                    done[i] += 1
                    if done[i] == nph:
                        outs[i] = state[i]
        return join_out(outs)

    return run


def _fwd_stages(tbls, q: int, R: int, bp: int, resident: bool = False,
                lazy: bool = False):
    """resident=True: data lives in the transpose-free (R, bp, LANES)
    layout end-to-end (the fused-chain form); resident=False wraps the
    same body in the (bp, R, LANES) interface the host kernels use.

    lazy=True: skip the final fold+condsub — output is W == out (mod q),
    W < 20q + 2^59 (the _fold59 window), a valid u64.  The digit split
    (_split8) accepts any u64 and the fold-margin analysis covers the
    full +-128 digit range regardless of input magnitude, so chained
    iterations need canonicalization only ONCE at chain end (the TPU
    form of the reference ALU's lazy [0, 2q) operand windows,
    src/vp/vxu/modalu.sv:44-46)."""
    A1, T3, Dp, C1, C3 = tbls
    b1, b3 = _bias_bits(NDIG * R), _bias_bits(NDIG * LANES)

    # phases alternate MXU-heavy (p0, p2) and VPU-heavy (p1, p3) work;
    # sub-chunk width is inferred (-1) so stagger parts reuse them
    def p0(st):
        # rows: S2 (8R, bpp*L) digit planes, one dot per accumulator
        digs = _split8(*st)
        S2 = jnp.concatenate(digs, axis=0).reshape(NDIG * R, -1)
        return [_dot(A1[j], S2).reshape(R, -1, LANES) for j in range(NDIG)]

    def p1(es):
        wlo, whi = _recombine(
            es, b1, C1[0][:, None, :], C1[1][:, None, :], q)
        # middle twiddle: per-position Shoup constants
        return _shoup_const(
            wlo, whi, tuple(t[:, None, :] for t in Dp), q)

    def p2(st):
        # lanes: Y2 (R*bpp, 8L) @ T3[j] (8L, L)
        ydigs = _split8(*st)
        Y2 = jnp.concatenate(ydigs, axis=2).reshape(-1, NDIG * LANES)
        return [_dot(Y2, T3[j]).reshape(R, -1, LANES) for j in range(NDIG)]

    def p3(es3):
        zlo, zhi = _recombine(
            es3, b3, C3[0][0][None, None, :], C3[1][0][None, None, :], q)
        if lazy:
            return zlo, zhi
        return _fold_final(zlo, zhi, q)

    stages_r = _assemble((p0, p1, p2, p3), bp)

    if resident:
        return stages_r

    def stages(alo, ahi):
        # (bp, R, L) -> (R, bp, L): contraction axis to the front
        zlo, zhi = stages_r(
            jnp.transpose(alo, (1, 0, 2)), jnp.transpose(ahi, (1, 0, 2))
        )
        return (
            jnp.transpose(zlo, (1, 0, 2)), jnp.transpose(zhi, (1, 0, 2))
        )

    return stages


def _assemble(phases, bp: int):
    """Compose the phase list into a (R, bp, LANES)-resident stage
    function, staggered over ALOHA_MXU_STAGGER sub-chunks when set."""
    s = _stagger()
    while s > 1 and bp % s:
        s -= 1

    def plain(alo, ahi):
        st = (alo, ahi)
        for ph in phases:
            st = ph(st)
        return st

    if s == 1:
        return plain

    def split_in(alo, ahi, s):
        w = alo.shape[1] // s
        return [
            (alo[:, i * w:(i + 1) * w], ahi[:, i * w:(i + 1) * w])
            for i in range(s)
        ]

    def join_out(outs):
        return (
            jnp.concatenate([o[0] for o in outs], axis=1),
            jnp.concatenate([o[1] for o in outs], axis=1),
        )

    return _staggered(list(phases), split_in, join_out, s)


def _inv_stages(tbls, q: int, R: int, bp: int, resident: bool = False,
                lazy: bool = False):
    MA, TA, Dp, CA, CC = tbls
    ba, bc = _bias_bits(NDIG * LANES), _bias_bits(NDIG * R)

    def p0(st):
        # lanes first: (R, bpp, L); Z2 (R*bpp, 8L) @ TA[j]
        digs = _split8(*st)
        Z2 = jnp.concatenate(digs, axis=2).reshape(-1, NDIG * LANES)
        return [_dot(Z2, TA[j]).reshape(R, -1, LANES) for j in range(NDIG)]

    def p1(es):
        wlo, whi = _recombine(
            es, ba, CA[0][0][None, None, :], CA[1][0][None, None, :], q)
        return _shoup_const(
            wlo, whi, tuple(t[:, None, :] for t in Dp), q)

    def p2(st):
        # rows: Y2 (8R, bpp*L), contraction axis already leading
        ydigs = _split8(*st)
        Y2 = jnp.concatenate(ydigs, axis=0).reshape(NDIG * R, -1)
        return [_dot(MA[j], Y2).reshape(R, -1, LANES) for j in range(NDIG)]

    def p3(es3):
        zlo, zhi = _recombine(
            es3, bc, CC[0][:, None, :], CC[1][:, None, :], q)
        if lazy:
            return zlo, zhi
        return _fold_final(zlo, zhi, q)

    stages_r = _assemble((p0, p1, p2, p3), bp)

    if resident:
        return stages_r

    if _stagger() > 1:
        # staggered sub-chunks need the (R, bp, L) resident layout; pay
        # the two transposes so the knob is not silently inert on the
        # inverse path (the un-staggered default keeps the
        # transpose-free body below)
        def stages_t(alo, ahi):
            zlo, zhi = stages_r(
                jnp.transpose(alo, (1, 0, 2)), jnp.transpose(ahi, (1, 0, 2))
            )
            return (
                jnp.transpose(zlo, (1, 0, 2)), jnp.transpose(zhi, (1, 0, 2))
            )

        return stages_t

    def stages(alo, ahi):
        # lanes first: (bp, R, L) stays put (contraction only needs the
        # trailing lane axis); Z2 (bp*R, 8L) @ TA[j]
        digs = _split8(alo, ahi)
        Z2 = jnp.concatenate(digs, axis=2).reshape(bp * R, NDIG * LANES)
        es = [_dot(Z2, TA[j]).reshape(bp, R, LANES) for j in range(NDIG)]
        wlo, whi = _recombine(
            es, ba, CA[0][0][None, None, :], CA[1][0][None, None, :], q)
        ylo, yhi = _shoup_const(
            wlo, whi, tuple(t[None, :, :] for t in Dp), q)
        # rows: transpose then Y2 (8R, bp*L)
        ylo = jnp.transpose(ylo, (1, 0, 2))
        yhi = jnp.transpose(yhi, (1, 0, 2))
        ydigs = _split8(ylo, yhi)
        Y2 = jnp.concatenate(ydigs, axis=0).reshape(NDIG * R, bp * LANES)
        es3 = [_dot(MA[j], Y2).reshape(R, bp, LANES) for j in range(NDIG)]
        zlo, zhi = _recombine(
            es3, bc, CC[0][:, None, :], CC[1][:, None, :], q)
        zlo, zhi = _fold_final(zlo, zhi, q)
        return (
            jnp.transpose(zlo, (1, 0, 2)), jnp.transpose(zhi, (1, 0, 2))
        )

    return stages


# ------------------------------------------------- embedding in host kernels
def tables12_np(n: int, q: int, psi: int, inverse: bool):
    """Flat 12-tuple of numpy operand arrays for one (modulus, direction):
    (A, T, dwl, dwh, ds0..ds3, c_a_lo, c_a_hi, c_b_lo, c_b_hi).  `psi` is
    always the FORWARD root; the inverse tables derive their own inverses."""
    _check_fold_margin(n, q)
    A, T, Dp, Ca, Cb = (_inv_tables_np if inverse else _fwd_tables_np)(
        n, q, psi
    )
    return (A, T, *Dp, *Ca, *Cb)


def stacked_tables_np(n: int, qs, psis, inverse: bool):
    """tables12 for several moduli, each field stacked along a leading
    modulus axis — the operand form for multi-modulus host kernels
    (ks_kernel).  Digit matrices stay int8."""
    per = [tables12_np(n, q, p, inverse) for q, p in zip(qs, psis)]
    return tuple(np.stack(f) for f in zip(*per))


def make_stages(refs, m: int, q: int, rows: int, bp: int, inverse: bool,
                lazy: bool = False):
    """Build the 4-step stage closure over STACKED kernel refs (the
    12-tuple of stacked_tables_np operands); `m` selects the modulus.
    Returns a function (alo, ahi) -> (zlo, zhi) on (bp, rows, LANES)
    planes with canonical [0, q) output — interface-compatible with the
    ntt_stream stage loops consumed by ks_kernel.  lazy=True skips the
    final fold (output W == z mod q, W < 20q + 2^59): only valid when
    every consumer accepts arbitrary u64 (e.g. the Shoup inner
    products)."""
    from aloha_tpu.ops.ntt_stream import _TblSlice

    A, T, dwl, dwh, ds0, ds1, ds2, ds3, cal, cah, cbl, cbh = refs
    tbls = (
        _TblSlice(A, m), _TblSlice(T, m),
        (dwl[m], dwh[m], ds0[m], ds1[m], ds2[m], ds3[m]),
        (cal[m], cah[m]), (cbl[m], cbh[m]),
    )
    return (_inv_stages if inverse else _fwd_stages)(
        tbls, q, rows, bp, lazy=lazy
    )


# ---------------------------------------------------------------- the call
def _body(inverse, q, nchunks, bp, rows,
          A1, T3, dwl, dwh, ds0, ds1, ds2, ds3, c1l, c1h, c3l, c3h,
          xlo, xhi, olo, ohi):
    tbls = (
        A1, T3,
        (dwl[:], dwh[:], ds0[:], ds1[:], ds2[:], ds3[:]),
        (c1l[:], c1h[:]), (c3l[:], c3h[:]),
    )
    mk = _inv_stages if inverse else _fwd_stages
    stages = mk(tbls, q, rows, bp)

    def hbm_at(ref, c):
        return ref.at[pl.ds(c * np.int32(bp), bp)]

    def inner(ilo, ihi, qlo, qhi, sem_in, sem_out):
        S._chunk_pipeline(
            ilo, ihi, qlo, qhi, sem_in, sem_out,
            stages, nchunks, bp, xlo, xhi, olo, ohi, hbm_at,
        )

    S._scoped_pipeline(inner, bp, rows)


@functools.lru_cache(maxsize=None)
def _check_fold_margin(n: int, q: int):
    """V < 2^82-ish must fold in one step: A*delta <= 16q."""
    for kdim in (NDIG * (n // LANES), NDIG * LANES):
        b = _bias_bits(kdim)
        vmax = sum((1 << (8 * j)) * (1 << (b + 1)) for j in range(NDIG)) + q
        amax = vmax >> 59
        assert amax * (q - (1 << 59)) <= 20 * q, (
            f"fold margin violated for q={q}, K={kdim}")
        assert 20 * q + (1 << 59) < (1 << 64) and 22 * (q - (1 << 59)) < q


def _tables_jax(n: int, q: int, root: int, inverse: bool):
    _check_fold_margin(n, q)
    tb = (_inv_tables_np if inverse else _fwd_tables_np)(n, q, root)
    cat_dtype = jnp.bfloat16 if _dot_mode() == "bf16" else jnp.int8
    A1, T3, Dp, Ca, Cb = tb
    return (
        [jnp.asarray(A1).astype(cat_dtype), jnp.asarray(T3).astype(cat_dtype)]
        + [jnp.asarray(t) for t in Dp]
        + [jnp.asarray(Ca[0]), jnp.asarray(Ca[1]),
           jnp.asarray(Cb[0]), jnp.asarray(Cb[1])]
    )


def _mxu_call(alo, ahi, *, q, root, inverse):
    nb = alo.shape[0]
    rows = alo.shape[1]
    n = rows * LANES
    bp, nchunks = S._chunking(nb)
    tables = _tables_jax(n, q, root, inverse)
    body = functools.partial(_body, inverse, q, nchunks, bp, rows)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    with jax.enable_x64(False):
        call = pl.pallas_call(
            body,
            in_specs=[vmem] * len(tables) + [hbm] * 2,
            out_specs=[hbm] * 2,
            out_shape=[jax.ShapeDtypeStruct(alo.shape, jnp.uint32)] * 2,
            input_output_aliases={len(tables): 0, len(tables) + 1: 1},
            interpret=bool(os.environ.get("ALOHA_STREAM_INTERPRET")),
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                vmem_limit_bytes=int(
                    os.environ.get("ALOHA_STREAM_VMEM", str(100 * 2**20))
                ),
            ),
        )
        return call(*tables, alo, ahi)


def _chain_setup(inverse, q, rows, bp, k, refs):
    """Shared preamble of both chain bodies: stacked-ref table tuple,
    lazy-mode read, resident stage closure, unroll clamp — ONE place so
    the W-way body can never silently run a different protocol than the
    1-way chain it must stay bit-identical to.

    lazy chain (default on): iterations pass the _fold59 window
    (W < 20q + 2^59, a valid u64) straight into the next digit split;
    ONE canonicalizing fold+condsub runs after the loop instead of k of
    them (ALOHA_MXU_CHAIN_LAZY=0 restores per-iteration folds).

    Unroll: Mosaic in-kernel loops support unroll=1 or full only; a
    manual partial unroll (U transforms per fori iteration) trades
    compile time for cross-transform scheduling.  Default 1: the remote
    kernel-compile service prices a U-times-bigger body at minutes
    scale (a U=4 K=128 chain blew a 25-minute budget)."""
    A1, T3, dwl, dwh, ds0, ds1, ds2, ds3, c1l, c1h, c3l, c3h = refs
    tbls = (
        A1, T3,
        (dwl[:], dwh[:], ds0[:], ds1[:], ds2[:], ds3[:]),
        (c1l[:], c1h[:]), (c3l[:], c3h[:]),
    )
    mk = _inv_stages if inverse else _fwd_stages
    lazy = os.environ.get("ALOHA_MXU_CHAIN_LAZY", "1") != "0"
    stages_r = mk(tbls, q, rows, bp, resident=True, lazy=lazy)
    u = max(1, int(os.environ.get("ALOHA_MXU_CHAIN_UNROLL", "1")))
    while k % u:
        u //= 2
    return stages_r, lazy, u


def _chain_body(inverse, q, nchunks, bp, rows, k,
                *refs_io):
    """k data-dependent transforms fused in ONE launch: each chunk is
    DMA'd to VMEM once, iterated k times in the transpose-free resident
    (R, bp, LANES) layout, and written back once — the per-transform HBM
    round trip and the 4 per-transform layout transposes of the chained
    single-shot form disappear (cf. the reference keeping all 18
    keyswitch transforms SPM-resident, sim/vp/isram_file_generator/
    keyswitch.mem)."""
    *refs, xlo, xhi, olo, ohi = refs_io
    stages_r, lazy, u = _chain_setup(inverse, q, rows, bp, k, refs)

    def it(_, c):
        for _i in range(u):
            c = stages_r(*c)
        return c

    def chain_stages(alo, ahi):
        alo = jnp.transpose(alo, (1, 0, 2))
        ahi = jnp.transpose(ahi, (1, 0, 2))
        alo, ahi = jax.lax.fori_loop(
            np.int32(0), np.int32(k // u), it, (alo, ahi), unroll=1,
        )
        if lazy:
            alo, ahi = _fold_final(alo, ahi, q)
        return (
            jnp.transpose(alo, (1, 0, 2)), jnp.transpose(ahi, (1, 0, 2))
        )

    def hbm_at(ref, c):
        return ref.at[pl.ds(c * np.int32(bp), bp)]

    def inner(ilo, ihi, qlo, qhi, sem_in, sem_out):
        S._chunk_pipeline(
            ilo, ihi, qlo, qhi, sem_in, sem_out,
            chain_stages, nchunks, bp, xlo, xhi, olo, ohi, hbm_at,
        )

    S._scoped_pipeline(inner, bp, rows)


def _chain_ways_body(inverse, q, nchunks, bp, rows, k, ways,
                     *refs_io):
    """W independent chunks' chains traced in LOCKSTEP.

    A single chunk's chain is strictly serial (each transform consumes
    the previous one's output), so its MXU and VPU phases can never
    overlap — the parts probe measured the body as their exact sum.
    W >= 2 chunks are data-independent: tracing their stage calls side
    by side per iteration gives the Mosaic scheduler one chunk's digit
    matmuls (MXU) to issue under another's recombine/Shoup chain (VPU)
    at FULL matmul sizes — unlike the sub-chunk stagger, which halved
    the matmuls and measured 1.5x WORSE.  DMA is negligible against a
    K-long chain (2 MB vs ~40 ms of compute), so the W buffers load
    and store without double buffering."""
    *refs, xlo, xhi, olo, ohi = refs_io
    stages_r, lazy, u = _chain_setup(inverse, q, rows, bp, k, refs)
    W = ways
    ngroups = nchunks // W

    def inner(ib_lo, ib_hi, ob_lo, ob_hi, sem_in, sem_out):
        def group(g, _):
            ws = [np.int32(w) for w in range(W)]
            copies = []
            for w in range(W):
                c = g * np.int32(W) + ws[w]
                for p, (src, dst) in enumerate(
                    ((xlo, ib_lo), (xhi, ib_hi))
                ):
                    copies.append(pltpu.make_async_copy(
                        src.at[pl.ds(c * np.int32(bp), bp)],
                        dst.at[ws[w]], sem_in.at[ws[w], np.int32(p)],
                    ))
            for d in copies:
                d.start()
            for d in copies:
                d.wait()
            st = []
            for w in range(W):
                st.append(jnp.transpose(ib_lo[ws[w]], (1, 0, 2)))
                st.append(jnp.transpose(ib_hi[ws[w]], (1, 0, 2)))

            def it(_, cs):
                for _i in range(u):
                    nxt = []
                    for w in range(W):
                        l, h = stages_r(cs[2 * w], cs[2 * w + 1])
                        nxt += [l, h]
                    cs = tuple(nxt)
                return cs

            cs = jax.lax.fori_loop(
                np.int32(0), np.int32(k // u), it, tuple(st), unroll=1,
            )
            outs = []
            for w in range(W):
                l, h = cs[2 * w], cs[2 * w + 1]
                if lazy:
                    l, h = _fold_final(l, h, q)
                ob_lo[ws[w]] = jnp.transpose(l, (1, 0, 2))
                ob_hi[ws[w]] = jnp.transpose(h, (1, 0, 2))
                c = g * np.int32(W) + ws[w]
                for p, (src, dst) in enumerate(
                    ((ob_lo, olo), (ob_hi, ohi))
                ):
                    outs.append(pltpu.make_async_copy(
                        src.at[ws[w]],
                        dst.at[pl.ds(c * np.int32(bp), bp)],
                        sem_out.at[ws[w], np.int32(p)],
                    ))
            for d in outs:
                d.start()
            for d in outs:
                d.wait()
            return 0

        jax.lax.fori_loop(np.int32(0), np.int32(ngroups), group, 0)

    pl.run_scoped(
        inner,
        ib_lo=pltpu.VMEM((W, bp, rows, LANES), jnp.uint32),
        ib_hi=pltpu.VMEM((W, bp, rows, LANES), jnp.uint32),
        ob_lo=pltpu.VMEM((W, bp, rows, LANES), jnp.uint32),
        ob_hi=pltpu.VMEM((W, bp, rows, LANES), jnp.uint32),
        sem_in=pltpu.SemaphoreType.DMA((W, 2)),
        sem_out=pltpu.SemaphoreType.DMA((W, 2)),
    )


def ntt_chain_planes(alo, ahi, q: int, psi: int, k: int,
                     inverse: bool = False):
    """k successive MXU NTTs (data-dependent, each a full negacyclic
    transform) on (nb, rows, 128) u32 planes, fused into one kernel
    launch with the polynomials VMEM-resident across iterations.

    ALOHA_MXU_CHAIN_WAYS=W (default 1) runs W chunks' chains in
    lockstep so their independent MXU/VPU phases can overlap (see
    _chain_ways_body); nchunks must divide by W (falls back to the
    largest W that fits)."""
    root = pow(int(psi), q - 2, q) if inverse else psi
    nb = alo.shape[0]
    rows = alo.shape[1]
    n = rows * LANES
    bp, nchunks = S._chunking(nb)
    tables = _tables_jax(n, q, root, inverse)
    ways = max(1, int(os.environ.get("ALOHA_MXU_CHAIN_WAYS", "1")))
    while nchunks % ways:
        ways -= 1
    if ways > 1:
        body = functools.partial(
            _chain_ways_body, inverse, q, nchunks, bp, rows, int(k), ways
        )
    else:
        body = functools.partial(
            _chain_body, inverse, q, nchunks, bp, rows, int(k)
        )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    with jax.enable_x64(False):
        call = pl.pallas_call(
            body,
            in_specs=[vmem] * len(tables) + [hbm] * 2,
            out_specs=[hbm] * 2,
            out_shape=[jax.ShapeDtypeStruct(alo.shape, jnp.uint32)] * 2,
            input_output_aliases={len(tables): 0, len(tables) + 1: 1},
            interpret=bool(os.environ.get("ALOHA_STREAM_INTERPRET")),
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                vmem_limit_bytes=int(
                    os.environ.get("ALOHA_STREAM_VMEM", str(100 * 2**20))
                ),
            ),
        )
        return call(*tables, alo, ahi)


def ntt_planes(alo, ahi, q: int, psi: int):
    """Forward MXU NTT on (nb, rows, 128) u32 planes."""
    return _mxu_call(alo, ahi, q=q, root=psi, inverse=False)


def intt_planes(alo, ahi, q: int, ipsi: int):
    """Inverse MXU NTT on (nb, rows, 128) u32 planes.

    Note: `ipsi` is accepted for interface parity with ntt_stream but the
    inverse tables are derived from the FORWARD psi (ipsi must equal
    psi^-1 mod q; asserted at table build)."""
    # recover psi from ipsi so both directions key off the forward root
    psi = pow(int(ipsi), q - 2, q)
    return _mxu_call(alo, ahi, q=q, root=psi, inverse=True)


def ntt(a, q: int, psi: int):
    """Forward MXU NTT over the last axis (uint64 convenience)."""
    return S._u64_wrap(ntt_planes, a, q, psi)


def intt(a, q: int, ipsi: int):
    """Inverse MXU NTT over the last axis (uint64 convenience)."""
    return S._u64_wrap(intt_planes, a, q, ipsi)
