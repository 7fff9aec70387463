"""Exact 64-bit modular arithmetic for the XLA graph path (jnp.uint64).

XLA:TPU has no 64-bit integer hardware but *emulates* u64 ops during
lowering (as uint32 pairs).  Using jnp.uint64 directly keeps the traced HLO
graph ~10x smaller than hand-written pair arithmetic — which matters a lot
here, because the replayer compiles entire instruction programs (dozens of
NTTs) into single XLA executables.  The hand-written uint32-pair versions
live in `aloha_tpu.rns_jax` and are used inside Pallas kernels, where u64 is
not available.

This module is a line-for-line mirror of the NumPy golden model
`aloha_tpu.rns_np` (same Barrett chain, same laziness windows —
reference: src/vp/vxu/modmul.sv, modalu.sv:44-46, halfred.sv); equality is
certified by tests/test_jax_backend.py.

Importing this module enables jax_enable_x64 (required for u64 dtypes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from aloha_tpu import config as _cfg

# u64 dtypes require the x64 flag; this framework is exact 64-bit integer
# crypto, so we turn it on at import.
jax.config.update("jax_enable_x64", True)

_M32 = jnp.uint64(0xFFFFFFFF)


def u64(x: int):
    return jnp.uint64(x & ((1 << 64) - 1))


def mul_wide(a, b):
    """Full 64x64 -> 128-bit product as (hi, lo) uint64 arrays.

    (reference: src/vp/vxu/mul64.sv — here 32-bit limbs; the low-64 product
    itself is a single emulated HLO multiply)
    """
    a0 = a & _M32
    a1 = a >> jnp.uint64(32)
    b0 = b & _M32
    b1 = b >> jnp.uint64(32)
    lo = a * b  # low 64 bits, exact mod 2^64
    p01 = a0 * b1
    p10 = a1 * b0
    mid = ((a0 * b0) >> jnp.uint64(32)) + (p01 & _M32) + (p10 & _M32)
    hi = a1 * b1 + (p01 >> jnp.uint64(32)) + (p10 >> jnp.uint64(32)) + (
        mid >> jnp.uint64(32)
    )
    return hi, lo


def _consts(q: int, w: int):
    # NOTE: returns freshly created jnp scalars on purpose — caching jnp
    # arrays across traces leaks trace/mesh context (barrett_iq itself is
    # lru-cached on the host side).
    return u64(q), u64(_cfg.barrett_iq(q, w))


def lazy_reduce(a, q: int):
    """One conditional subtract (reference: modalu.sv:44-46)."""
    qe = u64(q)
    return jnp.where(a >= qe, a - qe, a)


def mulmod(a, b, q: int, w: int = _cfg.MOD_WIDTH):
    """Exact a*b mod q for inputs < 2q (ALU laziness + Barrett chain)."""
    a = lazy_reduce(a, q)
    b = lazy_reduce(b, q)
    return barrett(a, b, q, w)


def barrett(a, b, q: int, w: int = _cfg.MOD_WIDTH):
    """The RTL Barrett chain (reference: src/vp/vxu/modmul.sv:145-232);
    equal to exact a*b mod q for inputs < q."""
    qe, iq = _consts(q, w)
    hi, lo = mul_wide(a, b)
    prod_shift = (lo >> jnp.uint64(w - 2)) | (hi << jnp.uint64(64 - (w - 2)))
    mhi, mlo = mul_wide(prod_shift, iq)
    mid_shift = (mlo >> jnp.uint64(w + 3)) | (mhi << jnp.uint64(64 - (w + 3)))
    estim_lo = mid_shift * qe
    mask = u64((1 << (w + 1)) - 1)
    diff = ((lo & mask) | u64(1 << (w + 1))) - (estim_lo & mask)
    diff = diff & mask
    return jnp.where(diff >= qe, diff - qe, diff)


def addmod(a, b, q: int):
    qe = u64(q)
    s = lazy_reduce(a, q) + lazy_reduce(b, q)
    return jnp.where(s >= qe, s - qe, s)


def submod(a, b, q: int):
    qe = u64(q)
    a = lazy_reduce(a, q)
    b = lazy_reduce(b, q)
    return jnp.where(a >= b, a - b, qe + a - b)


def halfmod(a, q: int):
    """(a>>1) + (a odd ? (q+1)/2 : 0)  (reference: halfred.sv:21-27)."""
    half = u64((q + 1) >> 1)
    return (a >> jnp.uint64(1)) + jnp.where(
        (a & jnp.uint64(1)).astype(bool), half, jnp.uint64(0)
    )


def modred(a, q: int):
    """`vfqmod`: lazy reduce then Barrett-multiply by 1; exact for a < 2q."""
    a = lazy_reduce(a, q)
    return barrett(a, jnp.broadcast_to(u64(1), a.shape), q)
