"""Marginal in-kernel cost of the streaming-NTT building blocks.

    python tools/op_probe.py v0 v1 v2 ...

Each variant runs REPS data-dependent repetitions of one building block on
a VMEM-resident (BP, 64, 128) u32-plane pair inside a single pallas call;
cost = (t(REPS_HI) - t(REPS_LO)) / (REPS_HI - REPS_LO).  Used to decide
which term of the ~3.5 us/poly stage budget to attack next.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aloha_tpu import rns_jax as r32
from aloha_tpu.config import DEFAULT_CONFIG as CFG
from aloha_tpu.ops import ntt_pallas as K
from aloha_tpu.ops import ntt_stream as S

q, psi = CFG.moduli[0], CFG.psi[0]
ROWS, LANES = 64, 128
BP = int(os.environ.get("BP", "8"))
I32 = jnp.int32

tbl_np = S._tables6_np(CFG.n, psi, q, False)


def _rows(tbl):
    """stage-5 rows: (wl, wh, s0, s1, s2, s3, sl, sh)"""
    wl, wh, s0, s1, s2, s3 = (t[5][None] for t in tbl)
    sl = s0 | (s1 << np.uint32(16))
    sh = s2 | (s3 << np.uint32(16))
    return wl, wh, s0, s1, s2, s3, sl, sh


def _stage_env():
    lane_ids = jax.lax.broadcasted_iota(I32, (1, ROWS, LANES), 2)
    return lane_ids


# every variant: (alo, ahi, tbl) -> (alo', ahi')  [data-dependent]
def v0_full_stage(alo, ahi, tbl):
    """the real _ct_stage at a fixed traced lane distance t=32"""
    ids = _stage_env()
    return S._ct_stage(alo, ahi, I32(5), I32(32), ids, 2, I32(LANES), tbl, q)


def v1_shoup(alo, ahi, tbl):
    wl, wh, s0, s1, s2, s3, sl, sh = _rows(tbl)
    return S._shoup_mul_sloppy(alo, ahi, wl, wh, sl, sh, q)


def v2_mulhi_sloppy(alo, ahi, tbl):
    *_r, sl, sh = _rows(tbl)
    return S._mul64_hi_sloppy(alo, ahi, sl, sh)


def v3_mul64lo(alo, ahi, tbl):
    wl, wh = tbl[0][5][None], tbl[1][5][None]
    return r32.mul64_lo(alo, ahi, wl, wh)


def v4_mul32wide(alo, ahi, tbl):
    h, l = r32.mul32_wide(alo, ahi)
    return l, h


def v5_baremul(alo, ahi, tbl):
    return alo * ahi, ahi + alo


def v6_roll(alo, ahi, tbl):
    t = I32(32)
    return pltpu.roll(alo, t, 2), pltpu.roll(ahi, t, 2)


def v7_condsub(alo, ahi, tbl):
    return K._condsub(alo, ahi, 4 * q)


def v8_add64(alo, ahi, tbl):
    return r32.add64(alo, ahi, ahi, alo)


def v9_select(alo, ahi, tbl):
    ids = _stage_env()
    bit = (ids & I32(32)) != 0
    return jnp.where(bit, alo, ahi), jnp.where(bit, ahi, alo)


_M16 = np.uint32(0xFFFF)


def _mul64_hi_limb(alo, ahi, s0, s1, s2, s3):
    """hi64(a*s) from 16-bit limb planes of s; error in {0, -1} * q-scale.

    13 multiplies (vs 16 in _mul64_hi_sloppy) and column-sum assembly in
    u32 accumulators (16-bit headroom) instead of mul32_wide packing."""
    S16 = U32 = np.uint32
    a0 = alo & _M16
    a1 = alo >> S16(16)
    a2 = ahi & _M16
    a3 = ahi >> S16(16)
    p02 = a0 * s2
    p11 = a1 * s1
    p20 = a2 * s0
    p03 = a0 * s3
    p12 = a1 * s2
    p21 = a2 * s1
    p30 = a3 * s0
    p13 = a1 * s3
    p22 = a2 * s2
    p31 = a3 * s1
    p23 = a2 * s3
    p32 = a3 * s2
    p33 = a3 * s3
    col3 = (
        (p03 & _M16) + (p12 & _M16) + (p21 & _M16) + (p30 & _M16)
        + (p02 >> S16(16)) + (p11 >> S16(16)) + (p20 >> S16(16))
    )
    col4 = (
        (p13 & _M16) + (p22 & _M16) + (p31 & _M16)
        + (p03 >> S16(16)) + (p12 >> S16(16)) + (p21 >> S16(16))
        + (p30 >> S16(16))
    )
    col5 = (
        (p23 & _M16) + (p32 & _M16)
        + (p13 >> S16(16)) + (p22 >> S16(16)) + (p31 >> S16(16))
    )
    col6 = (p33 & _M16) + (p23 >> S16(16)) + (p32 >> S16(16))
    col7 = p33 >> S16(16)
    l4 = col4 + (col3 >> S16(16))
    l5 = col5 + (l4 >> S16(16))
    l6 = col6 + (l5 >> S16(16))
    l7 = col7 + (l6 >> S16(16))
    t_lo = (l4 & _M16) | (l5 << S16(16))
    t_hi = (l6 & _M16) | (l7 << S16(16))
    return t_lo, t_hi


def v10_mulhi_limb(alo, ahi, tbl):
    wl, wh, s0, s1, s2, s3, sl, sh = _rows(tbl)
    return _mul64_hi_limb(alo, ahi, s0, s1, s2, s3)


def v11_shoup_limb(alo, ahi, tbl):
    """full shoup mul with the limb hi-half"""
    wl, wh, s0, s1, s2, s3, sl, sh = _rows(tbl)
    t_lo, t_hi = _mul64_hi_limb(alo, ahi, s0, s1, s2, s3)
    xw_lo, xw_hi = r32.mul64_lo(alo, ahi, wl, wh)
    tq_lo, tq_hi = r32.mul64_lo(t_lo, t_hi, *r32.const64(q))
    return r32.sub64(xw_lo, xw_hi, tq_lo, tq_hi)


def _mul_q_lo(t_lo, t_hi, qv: int):
    """lo64(t*q) as a shift-add chain over q's set bits (q static).

    bit 0 -> t itself; bit k >= 32 -> hi += tlo << (k-32); 0 < k < 32 ->
    full 64-bit shifted add.  NTT-friendly moduli are sparse, so this
    replaces a 6-multiply mul64_lo with a handful of shift-adds."""
    U = np.uint32
    bits = [k for k in range(64) if (qv >> k) & 1]
    assert bits[0] == 0, "expects odd q"
    lo, hi = t_lo, t_hi
    for k in bits[1:]:
        if k >= 32:
            hi = hi + (t_lo << U(k - 32)) if k > 32 else hi + t_lo
        else:
            slo = t_lo << U(k)
            shi = (t_hi << U(k)) | (t_lo >> U(32 - k))
            nlo = lo + slo
            carry = (nlo < lo).astype(U)
            lo, hi = nlo, hi + shi + carry
    return lo, hi


def v12_shoup_limb_q(alo, ahi, tbl):
    """the full candidate: limb hi-half + q shift-add chain"""
    wl, wh, s0, s1, s2, s3, sl, sh = _rows(tbl)
    t_lo, t_hi = _mul64_hi_limb(alo, ahi, s0, s1, s2, s3)
    xw_lo, xw_hi = r32.mul64_lo(alo, ahi, wl, wh)
    tq_lo, tq_hi = _mul_q_lo(t_lo, t_hi, q)
    return r32.sub64(xw_lo, xw_hi, tq_lo, tq_hi)


def v13_stage_limb(alo, ahi, tbl):
    """full _ct_stage with the candidate multiply (fixed t=32 lane)"""
    ids = _stage_env()
    t = I32(32)
    bit = (ids & t) != 0
    wl, wh, s0, s1, s2, s3, sl, sh = _rows(tbl)
    xplo, xphi = K._condsub(alo, ahi, 4 * q)
    t_lo, t_hi = _mul64_hi_limb(alo, ahi, s0, s1, s2, s3)
    xw_lo, xw_hi = r32.mul64_lo(alo, ahi, wl, wh)
    tq_lo, tq_hi = _mul_q_lo(t_lo, t_hi, q)
    ylo, yhi = r32.sub64(xw_lo, xw_hi, tq_lo, tq_hi)
    sz = I32(LANES)
    from jax.experimental.pallas import tpu as _pt

    tlo2, thi2 = r32.add64(
        xplo, xphi, _pt.roll(ylo, sz - t, 2), _pt.roll(yhi, sz - t, 2)
    )
    zlo, zhi = r32.sub64(*r32.const64(4 * q), ylo, yhi)
    blo, bhi = r32.add64(
        _pt.roll(xplo, t, 2), _pt.roll(xphi, t, 2), zlo, zhi
    )
    return jnp.where(bit, blo, tlo2), jnp.where(bit, bhi, thi2)


def v14_stage_sloppy_inline(alo, ahi, tbl):
    """the current kernel math, inlined the same way as v13 (A/B control)"""
    ids = _stage_env()
    t = I32(32)
    bit = (ids & t) != 0
    wl, wh, s0, s1, s2, s3, sl, sh = _rows(tbl)
    xplo, xphi = K._condsub(alo, ahi, 4 * q)
    ylo, yhi = S._shoup_mul_sloppy(alo, ahi, wl, wh, sl, sh, q)
    sz = I32(LANES)
    from jax.experimental.pallas import tpu as _pt

    tlo2, thi2 = r32.add64(
        xplo, xphi, _pt.roll(ylo, sz - t, 2), _pt.roll(yhi, sz - t, 2)
    )
    zlo, zhi = r32.sub64(*r32.const64(4 * q), ylo, yhi)
    blo, bhi = r32.add64(
        _pt.roll(xplo, t, 2), _pt.roll(xphi, t, 2), zlo, zhi
    )
    return jnp.where(bit, blo, tlo2), jnp.where(bit, bhi, thi2)


VARIANTS = {
    "v0": v0_full_stage, "v1": v1_shoup, "v2": v2_mulhi_sloppy,
    "v3": v3_mul64lo, "v4": v4_mul32wide, "v5": v5_baremul,
    "v6": v6_roll, "v7": v7_condsub, "v8": v8_add64, "v9": v9_select,
    "v10": v10_mulhi_limb, "v11": v11_shoup_limb, "v12": v12_shoup_limb_q,
    "v13": v13_stage_limb, "v14": v14_stage_sloppy_inline,
}


def make(fn, reps):
    def body(wl, wh, s0, s1, s2, s3, xl, xh, ol, oh):
        tbl = (wl, wh, s0, s1, s2, s3)

        def rep(i, c):
            return fn(c[0], c[1], tbl)

        alo, ahi = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(reps), rep, (xl[...], xh[...])
        )
        ol[...] = alo
        oh[...] = ahi

    tbls = [jnp.asarray(t) for t in tbl_np]
    with jax.enable_x64(False):
        call = pl.pallas_call(
            body,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_shape=[
                jax.ShapeDtypeStruct((BP, ROWS, LANES), jnp.uint32)
            ] * 2,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20
            ),
        )
        return jax.jit(lambda a, b: call(*tbls, a, b))


def measure(name, fn):
    rng = np.random.default_rng(0)
    xlo = jnp.asarray(
        rng.integers(0, 1 << 31, size=(BP, ROWS, LANES), dtype=np.int64
                     ).astype(np.uint32))
    xhi = jnp.asarray(
        rng.integers(0, 1 << 27, size=(BP, ROWS, LANES), dtype=np.int64
                     ).astype(np.uint32))
    res = {}
    for reps in (50, 450):
        f = make(fn, reps)
        r = f(xlo, xhi)
        _ = np.asarray(r[0][0, 0, 0])
        times = []
        for _i in range(6):
            t0 = time.perf_counter()
            r = f(xlo, xhi)
            _ = np.asarray(r[0][0, 0, 0])
            times.append(time.perf_counter() - t0)
        res[reps] = min(times)
    per = (res[450] - res[50]) / 400 / BP
    print(f"{name}: {per*1e9:.1f} ns/poly/rep  (x13 = {per*13*1e6:.3f} us)",
          flush=True)


if __name__ == "__main__":
    names = sys.argv[1:] or list(VARIANTS)
    for nm in names:
        measure(nm, VARIANTS[nm])
