"""Vectorized exact 64-bit modular arithmetic on the host (NumPy).

This is the golden model of the framework: every operation here reproduces,
bit for bit, the reference accelerator's modular ALU semantics
(reference: src/vp/vxu/modalu.sv, src/vp/vxu/modmul.sv, src/vp/vxu/halfred.sv).

The reference implements a*b mod q with a Barrett pipeline
(reference: src/vp/vxu/modmul.sv:145-232):

    prod  = a * b                               # 128-bit
    mid   = (prod >> (w-2))[63:0] * iq          # iq = floor(2^(2w+1)/q)
    estim = (mid  >> (w+3))[63:0] * q
    diff  = (prod - estim) mod 2^(w+1)
    res   = diff - q if diff >= q else diff

For q < 2^w and inputs a, b < q this chain returns exactly a*b mod q (the
classic Barrett error bound gives quotient error <= 1, absorbed by the single
conditional subtract; tests/test_rns.py certifies the equivalence against
arbitrary-precision integers).  The TPU compute path is therefore free to use
any exact mulmod algorithm and still match the RTL bit for bit.

NumPy uint64 wrap-around is well-defined, which makes the 128-bit product
decomposition below exact.
"""

from __future__ import annotations

import functools

import numpy as np

from aloha_tpu import config as _cfg

_M32 = np.uint64(0xFFFFFFFF)

U64 = np.uint64


def to_u64(x) -> np.ndarray:
    return np.asarray(x, dtype=np.uint64)


def mul_wide(a: np.ndarray, b: np.ndarray):
    """Full 64x64 -> 128-bit product as (hi, lo) uint64 pair.

    Plays the role of the reference's DSP-decomposed 64-bit multiplier
    (reference: src/vp/vxu/mul64.sv:77-117), using 32-bit limbs instead of
    the FPGA's 23-bit DSP tiles.
    """
    a = to_u64(a)
    b = to_u64(b)
    a0 = a & _M32
    a1 = a >> np.uint64(32)
    b0 = b & _M32
    b1 = b >> np.uint64(32)
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    mid = (p00 >> np.uint64(32)) + (p01 & _M32) + (p10 & _M32)
    lo = (p00 & _M32) | (mid << np.uint64(32))
    hi = p11 + (p01 >> np.uint64(32)) + (p10 >> np.uint64(32)) + (
        mid >> np.uint64(32)
    )
    return hi, lo


@functools.lru_cache(maxsize=None)
def _barrett_consts(q: int, w: int):
    return np.uint64(q), np.uint64(_cfg.barrett_iq(q, w))


def mulmod(a, b, q: int, w: int = _cfg.MOD_WIDTH) -> np.ndarray:
    """Exact a*b mod q for inputs in [0, 2q), q < 2^w <= 2^60.

    Applies the ALU's one-subtract input laziness
    (reference: src/vp/vxu/modalu.sv:44-46) followed by the Barrett chain,
    i.e. exactly what one `vfqmul` lane does per element.
    """
    qe = np.uint64(q)
    a = to_u64(a)
    b = to_u64(b)
    a = np.where(a >= qe, a - qe, a)
    b = np.where(b >= qe, b - qe, b)
    return _barrett(a, b, q, w)


def _barrett(a: np.ndarray, b: np.ndarray, q: int, w: int) -> np.ndarray:
    """The literal RTL Barrett chain, inputs < q.

    (reference: src/vp/vxu/modmul.sv:145-232)
    """
    qe, iq = _barrett_consts(q, w)
    hi, lo = mul_wide(a, b)
    # prod >> (w-2), truncated to 64 bits (RTL assigns into a 64-bit wire).
    prod_shift = (lo >> np.uint64(w - 2)) | (hi << np.uint64(64 - (w - 2)))
    mhi, mlo = mul_wide(prod_shift, iq)
    mid_shift = (mlo >> np.uint64(w + 3)) | (mhi << np.uint64(64 - (w + 3)))
    estim_lo = mid_shift * qe  # low 64 bits suffice under the mask
    mask = np.uint64((1 << (w + 1)) - 1)
    top = np.uint64(1 << (w + 1))
    dx = lo & mask
    dy = estim_lo & mask
    diff = ((dx | top) - dy) & mask
    return np.where(diff >= qe, diff - qe, diff)


def addmod(a, b, q: int) -> np.ndarray:
    """(a + b) mod q, with the ALU's input laziness then one cond-subtract.

    (reference: src/vp/vxu/modalu.sv:44-46, 228-229)
    """
    qe = np.uint64(q)
    a = lazy_reduce(a, q)
    b = lazy_reduce(b, q)
    s = a + b  # < 2q < 2^61, no uint64 overflow
    return np.where(s >= qe, s - qe, s)


def submod(a, b, q: int) -> np.ndarray:
    """(a - b) mod q (reference: src/vp/vxu/modalu.sv:249)."""
    qe = np.uint64(q)
    a = lazy_reduce(a, q)
    b = lazy_reduce(b, q)
    return np.where(a >= b, a - b, qe + a - b)


def halfmod(a, q: int) -> np.ndarray:
    """a/2 mod q: (a>>1) + (a odd ? (q+1)/2 : 0).

    (reference: src/vp/vxu/halfred.sv:21-27; folds the n^-1 INTT scale into
    each GS stage)
    """
    a = to_u64(a)
    half = np.uint64((q + 1) >> 1)
    return (a >> np.uint64(1)) + np.where(
        (a & np.uint64(1)).astype(bool), half, np.uint64(0)
    )


def lazy_reduce(a, q: int) -> np.ndarray:
    """One conditional subtract x >= q -> x - q.

    The reference ALU applies this to every operand on entry
    (reference: src/vp/vxu/modalu.sv:44-46), which is what lets values in
    [0, 2q) flow between instructions (e.g. the automorphism's `q - x`
    output can be exactly q when x = 0).
    """
    a = to_u64(a)
    qe = np.uint64(q)
    return np.where(a >= qe, a - qe, a)


def modred(a, q: int) -> np.ndarray:
    """Semantics of `vfqmod`: lazy-reduce, then Barrett-multiply by 1.

    Used by the key-switch digit decomposition to re-reduce a residue of a
    larger modulus (reference: sim/vp/isram_file_generator/keyswitch.mem
    line 28 decodes to `vfqmod`; expander.v:374-395; modalu.sv:164).
    Exact x mod q for any x < 2q.
    """
    return mulmod(a, np.uint64(1), q)


def powmod(base: int, exp: int, q: int) -> int:
    return pow(base, exp, q)
