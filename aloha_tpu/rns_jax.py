"""Exact 64-bit modular arithmetic in JAX, TPU-native representation.

TPUs have no native 64-bit integer datapath; XLA emulates u64 with u32
pairs, and Pallas kernels see u32 lanes only.  This module therefore makes
the representation explicit: a logical uint64 value is a pair of uint32
planes packed along a trailing axis of size 2 ([..., 0] = lo, [..., 1] = hi).
Every primitive is pure jnp on uint32 — it runs identically under `jit` on
CPU and TPU and **inside Pallas kernels** (the functions take/return
unpacked (lo, hi) tuples so kernels can keep values in registers).

Multiplication decomposes 32x32 -> 64 into 16-bit halves (the TPU-friendly
analogue of the reference's 23-bit DSP tiling, reference:
src/vp/vxu/mul64.sv:77-117); the modular reduction is the RTL's Barrett
chain (reference: src/vp/vxu/modmul.sv:145-232), which
tests/test_rns.py certifies equal to exact a*b mod q.

Scalar constants (q, iq, twiddles) are baked in as Python ints at trace
time, so per-modulus constants cost nothing at runtime.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from aloha_tpu.config import MOD_WIDTH, barrett_iq

_M16 = np.uint32(0xFFFF)  # numpy scalar: folds into Pallas kernels
U32 = np.uint32


# ----------------------------------------------------------------- packing
def pack_np(arr: np.ndarray) -> np.ndarray:
    """Host-side: uint64 array -> (..., 2) uint32 [lo, hi]."""
    arr = np.asarray(arr, dtype=np.uint64)
    return np.stack(
        [
            (arr & np.uint64(0xFFFFFFFF)).astype(np.uint32),
            (arr >> np.uint64(32)).astype(np.uint32),
        ],
        axis=-1,
    )


def unpack_np(arr) -> np.ndarray:
    """Host-side: (..., 2) uint32 -> uint64 array."""
    arr = np.asarray(arr, dtype=np.uint32)
    return arr[..., 0].astype(np.uint64) | (
        arr[..., 1].astype(np.uint64) << np.uint64(32)
    )


def split(packed):
    """(..., 2) uint32 -> (lo, hi) planes."""
    return packed[..., 0], packed[..., 1]


def join(lo, hi):
    return jnp.stack([lo, hi], axis=-1)


def const64(value: int):
    """Python int -> (lo, hi) uint32 scalar pair (trace-time constant)."""
    value &= (1 << 64) - 1
    return np.uint32(value & 0xFFFFFFFF), np.uint32(value >> 32)


# ------------------------------------------------------------- wide multiply
def mul32_wide(a, b):
    """uint32 x uint32 -> (hi, lo) uint32, exact, via 16-bit halves."""
    a0 = a & _M16
    a1 = a >> U32(16)
    b0 = b & _M16
    b1 = b >> U32(16)
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    mid = (p00 >> U32(16)) + (p01 & _M16) + (p10 & _M16)  # <= 3*(2^16-1)
    lo = (p00 & _M16) | (mid << U32(16))
    hi = p11 + (p01 >> U32(16)) + (p10 >> U32(16)) + (mid >> U32(16))
    return hi, lo


def add64(alo, ahi, blo, bhi):
    """64-bit add (mod 2^64): (lo, hi) + (lo, hi) -> (lo, hi)."""
    lo = alo + blo
    carry = (lo < alo).astype(U32)
    return lo, ahi + bhi + carry


def sub64(alo, ahi, blo, bhi):
    """64-bit subtract (mod 2^64)."""
    lo = alo - blo
    borrow = (alo < blo).astype(U32)
    return lo, ahi - bhi - borrow


def mul64_wide(alo, ahi, blo, bhi):
    """Full 64x64 -> 128-bit product as 4 uint32 limbs (p0..p3, LE)."""
    h00, l00 = mul32_wide(alo, blo)
    h01, l01 = mul32_wide(alo, bhi)
    h10, l10 = mul32_wide(ahi, blo)
    h11, l11 = mul32_wide(ahi, bhi)
    p0 = l00
    # limb 1: h00 + l01 + l10  (collect carries into limb 2)
    s1 = h00 + l01
    c1 = (s1 < h00).astype(U32)
    p1 = s1 + l10
    c1 = c1 + (p1 < s1).astype(U32)
    # limb 2: h01 + h10 + l11 + c1
    s2 = h01 + h10
    c2 = (s2 < h01).astype(U32)
    p2 = s2 + l11
    c2 = c2 + (p2 < s2).astype(U32)
    p2c = p2 + c1
    c2 = c2 + (p2c < p2).astype(U32)
    # limb 3: h11 + c2 (cannot overflow: product < 2^128)
    p3 = h11 + c2
    return p0, p1, p2c, p3


def mul64_lo(alo, ahi, blo, bhi):
    """Low 64 bits of a 64x64 product (cheaper: skips the high half)."""
    h00, l00 = mul32_wide(alo, blo)
    lo1 = alo * bhi + ahi * blo  # low-32 products suffice for limb 1
    return l00, h00 + lo1


def mul_q_lo_cost(q: int) -> int:
    """Vector-op estimate of the mul_q_lo shift-add chain for this q."""
    bits = [k for k in range(1, 64) if (q >> k) & 1]
    return sum(2 if k >= 32 else 7 for k in bits)


def mul_q_lo(t_lo, t_hi, q: int):
    """lo64(t*q) as a shift-add chain over q's set bits (q a python int).

    NTT-friendly moduli are sparse (q = 2^59 + c*2^14 + 1 with few set
    bits), so this replaces the 6-multiply mul64_lo(t, const64(q)) with a
    handful of shift-adds: bit 0 contributes t itself; a bit k >= 32
    contributes only (t_lo << (k-32)) to the high word; a middle bit is a
    full 64-bit shifted add.  Exact mod 2^64 for any t.  Callers should
    fall back to mul64_lo when mul_q_lo_cost(q) is large.
    """
    assert q & 1, "NTT moduli are odd"
    lo, hi = t_lo, t_hi
    for k in range(1, 64):
        if not (q >> k) & 1:
            continue
        if k >= 32:
            hi = hi + (t_lo << U32(k - 32) if k > 32 else t_lo)
        else:
            slo = t_lo << U32(k)
            shi = (t_hi << U32(k)) | (t_lo >> U32(32 - k))
            nlo = lo + slo
            carry = (nlo < lo).astype(U32)
            lo, hi = nlo, hi + shi + carry
    return lo, hi


# ------------------------------------------------------- modular primitives
def ge64(alo, ahi, blo, bhi):
    """a >= b as a bool array."""
    return (ahi > bhi) | ((ahi == bhi) & (alo >= blo))


def lazy_reduce64(lo, hi, q: int):
    """One conditional subtract x >= q -> x - q
    (reference: src/vp/vxu/modalu.sv:44-46)."""
    qlo, qhi = const64(q)
    slo, shi = sub64(lo, hi, qlo, qhi)
    pred = ge64(lo, hi, qlo, qhi)
    return jnp.where(pred, slo, lo), jnp.where(pred, shi, hi)


def addmod64(alo, ahi, blo, bhi, q: int):
    """(a + b) mod q for inputs < 2q (lazy reduce then one cond-subtract)."""
    alo, ahi = lazy_reduce64(alo, ahi, q)
    blo, bhi = lazy_reduce64(blo, bhi, q)
    slo, shi = add64(alo, ahi, blo, bhi)  # < 2q < 2^61: no 64-bit overflow
    return lazy_reduce64(slo, shi, q)


def submod64(alo, ahi, blo, bhi, q: int):
    """(a - b) mod q for inputs < 2q."""
    alo, ahi = lazy_reduce64(alo, ahi, q)
    blo, bhi = lazy_reduce64(blo, bhi, q)
    qlo, qhi = const64(q)
    # a - b if a >= b else q + a - b
    dlo, dhi = sub64(alo, ahi, blo, bhi)
    plo, phi = add64(alo, ahi, qlo, qhi)
    plo, phi = sub64(plo, phi, blo, bhi)
    pred = ge64(alo, ahi, blo, bhi)
    return jnp.where(pred, dlo, plo), jnp.where(pred, dhi, phi)


def halfmod64(lo, hi, q: int):
    """a/2 mod q (reference: src/vp/vxu/halfred.sv:21-27)."""
    half_lo, half_hi = const64((q + 1) >> 1)
    shr_lo = (lo >> U32(1)) | (hi << U32(31))
    shr_hi = hi >> U32(1)
    odd = lo & U32(1)
    add_lo = jnp.where(odd.astype(bool), half_lo, U32(0))
    add_hi = jnp.where(odd.astype(bool), half_hi, U32(0))
    return add64(shr_lo, shr_hi, add_lo, add_hi)


def _shift_right_128(p0, p1, p2, p3, sh: int):
    """(p3:p2:p1:p0) >> sh, truncated to 64 bits, for 32 < sh < 64.

    Matches the RTL's assignment of a shifted 128-bit value into a 64-bit
    wire (reference: src/vp/vxu/modmul.sv:150,172).
    """
    assert 32 < sh < 64
    k = sh - 32
    lo = (p1 >> U32(k)) | (p2 << U32(32 - k))
    hi = (p2 >> U32(k)) | (p3 << U32(32 - k))
    return lo, hi


def mulmod64(alo, ahi, blo, bhi, q: int, w: int = MOD_WIDTH):
    """Exact a*b mod q for inputs < 2q (lazy reduce + Barrett chain)."""
    alo, ahi = lazy_reduce64(alo, ahi, q)
    blo, bhi = lazy_reduce64(blo, bhi, q)
    return barrett64(alo, ahi, blo, bhi, q, w)


def barrett64(alo, ahi, blo, bhi, q: int, w: int = MOD_WIDTH):
    """The RTL Barrett chain on uint32 pairs; inputs < q.

    (reference: src/vp/vxu/modmul.sv:145-232; equal to exact a*b mod q)
    """
    iq = barrett_iq(q, w)
    iqlo, iqhi = const64(iq)
    qlo, qhi = const64(q)

    p0, p1, p2, p3 = mul64_wide(alo, ahi, blo, bhi)
    ps_lo, ps_hi = _shift_right_128(p0, p1, p2, p3, w - 2)
    m0, m1, m2, m3 = mul64_wide(ps_lo, ps_hi, iqlo, iqhi)
    ms_lo, ms_hi = _shift_right_128(m0, m1, m2, m3, w + 3)
    e_lo, e_hi = mul64_lo(ms_lo, ms_hi, qlo, qhi)

    # diff = (prod - estim) mod 2^(w+1); w+1 = 61 -> mask hi to 29 bits
    mask_hi = U32((1 << (w + 1 - 32)) - 1)
    dx_lo, dx_hi = p0, p1 & mask_hi
    dy_lo, dy_hi = e_lo, e_hi & mask_hi
    dlo, dhi = sub64(dx_lo, dx_hi, dy_lo, dy_hi)
    dhi = dhi & mask_hi
    # final conditional subtract
    slo, shi = sub64(dlo, dhi, qlo, qhi)
    pred = ge64(dlo, dhi, qlo, qhi)
    return jnp.where(pred, slo, dlo), jnp.where(pred, shi, dhi)


def mulmod_shoup64(xlo, xhi, w: int, wshoup: int, q: int):
    """Shoup multiplication by the *constant* w: x*w mod q, output < 2q.

    wshoup = floor(w * 2^64 / q) precomputed on the host.  Costs one hi-half
    and two low-half 64-bit multiplies — the fast path for NTT twiddles
    (w is a per-stage constant, exactly like the reference's twiddle ROMs).
    Output is in [0, 2q): callers in lazy pipelines keep it; callers needing
    canonical form apply lazy_reduce64.
    """
    slo, shi = const64(wshoup)
    wlo, whi = const64(w)
    qlo, qhi = const64(q)
    # t = hi64(x * wshoup)
    _, _, t_lo, t_hi = mul64_wide(xlo, xhi, slo, shi)
    # r = x*w - t*q (mod 2^64): both low-half products
    xw_lo, xw_hi = mul64_lo(xlo, xhi, wlo, whi)
    tq_lo, tq_hi = mul64_lo(t_lo, t_hi, qlo, qhi)
    return sub64(xw_lo, xw_hi, tq_lo, tq_hi)


def modred64(lo, hi, q: int):
    """`vfqmod` semantics: lazy reduce, then Barrett-multiply by 1."""
    lo, hi = lazy_reduce64(lo, hi, q)
    one_lo, one_hi = const64(1)
    one_lo = jnp.broadcast_to(one_lo, lo.shape)
    one_hi = jnp.broadcast_to(one_hi, hi.shape)
    return barrett64(lo, hi, one_lo, one_hi, q)


# ------------------------------------------------- packed-array convenience
def _packed_op(op):
    def f(a, b, q: int):
        alo, ahi = split(a)
        blo, bhi = split(b)
        return join(*op(alo, ahi, blo, bhi, q))

    return f


mulmod = _packed_op(mulmod64)
addmod = _packed_op(addmod64)
submod = _packed_op(submod64)


def mulmod_scalar(a, s: int, q: int):
    alo, ahi = split(a)
    slo, shi = const64(s)
    slo = jnp.broadcast_to(slo, alo.shape)
    shi = jnp.broadcast_to(shi, ahi.shape)
    return join(*mulmod64(alo, ahi, slo, shi, q))


def addmod_scalar(a, s: int, q: int):
    alo, ahi = split(a)
    slo, shi = const64(s)
    slo = jnp.broadcast_to(slo, alo.shape)
    shi = jnp.broadcast_to(shi, ahi.shape)
    return join(*addmod64(alo, ahi, slo, shi, q))


def submod_scalar(a, s: int, q: int, reverse: bool = False):
    alo, ahi = split(a)
    slo, shi = const64(s)
    slo = jnp.broadcast_to(slo, alo.shape)
    shi = jnp.broadcast_to(shi, ahi.shape)
    if reverse:
        return join(*submod64(slo, shi, alo, ahi, q))
    return join(*submod64(alo, ahi, slo, shi, q))


def lazy_reduce(a, q: int):
    return join(*lazy_reduce64(*split(a), q))


def modred(a, q: int):
    return join(*modred64(*split(a), q))
