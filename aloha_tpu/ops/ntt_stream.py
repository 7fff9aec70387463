"""Single-launch streaming NTT: HBM-resident batch, manual DMA pipeline.

The TPU re-design of the reference's overlapped DMA/VP pipelining
(independent FSMs + poly_id handshake; reference: SURVEY.md 2g item 5,
src/mem_buf/axi_data_rd_top.sv) combined with its 832-beat NTT engine
schedule (reference: src/vp/ntt/ntt_fsm.sv:49,68):

    start in-DMA(chunk 0)
    for c in chunks:
        start in-DMA(c+1)          # overlap next load with compute
        wait  in-DMA(c)
        compute all 13 stages on chunk c (VMEM, two fori_loops)
        wait  out-DMA(c-2)         # slot-reuse guard
        start out-DMA(c)
    drain

Compile-time design: the round-1 kernel unrolled all 13 butterfly stages
and the Mosaic compile time grew superlinearly with the unrolled body
(bisected in tools/dma_bisect_stages.py: 4 stages OK, 7 blow a 9-minute
budget).  Here every stage runs under an in-kernel `fori_loop` with a
*traced* stage index: butterfly distance, partner masks, twiddle-table
rows and `pltpu.roll` shifts (lane axis AND sublane axis) are all dynamic,
so the traced body is two small loop bodies regardless of n.  Verified on
hardware by tools/probe_dynstage.py / probe_dynsub.py.

Layout: a polynomial is a (rows=n/128, 128) u32-pair tile (lo, hi planes);
`bp` polys stack along sublanes as (bp*rows, 128).  Butterfly partner of
element i is i XOR t: t >= 128 -> sublane roll by t/128, t < 128 -> lane
roll by t.  The XOR-select keeps every read inside its own polynomial, so
stacked polys never mix even though rolls wrap across them.

Twiddle tables stay resident in VMEM for the whole launch (the analogue
of the per-lane tf_rom images, reference: sim/vp/tf_rom_generator/).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from aloha_tpu import rns_jax as r32
from aloha_tpu.ops import ntt_pallas as K
from aloha_tpu.ops.ntt_pallas import LANES

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _OK = True
except Exception:  # pragma: no cover
    _OK = False

I32 = jnp.int32
U32_16 = np.uint32(16)


def available() -> bool:
    return _OK and K.available()


def _roll(a, t, axis):
    return pltpu.roll(a, t, axis)


def _mul64_hi_sloppy(alo, ahi, blo, bhi):
    """hi64(a*b) with error in {0, -1, -2}: skips the low*low product and
    the low-limb carry assembly (Harvey's quotient estimate tolerates it;
    the butterfly window widens from [0,4q) to [0,8q) to absorb the
    up-to-2q overshoot — 8q < 2^63 for 60-bit moduli)."""
    h00, _l00 = r32.mul32_wide(alo, blo)  # need only the high half
    h01, l01 = r32.mul32_wide(alo, bhi)
    h10, l10 = r32.mul32_wide(ahi, blo)
    h11, l11 = r32.mul32_wide(ahi, bhi)
    # limb1 ~ h00 + l01 + l10 (its carry into limb2 is kept; the carry
    # *into* limb1 from limb0 is the dropped term)
    s1 = h00 + l01
    c1 = (s1 < h00).astype(np.uint32)
    p1 = s1 + l10
    c1 = c1 + (p1 < s1).astype(np.uint32)
    s2 = h01 + h10
    c2 = (s2 < h01).astype(np.uint32)
    p2 = s2 + l11
    c2 = c2 + (p2 < s2).astype(np.uint32)
    p2c = p2 + c1
    c2 = c2 + (p2c < p2).astype(np.uint32)
    return p2c, h11 + c2


def _shoup_mul_sloppy(vlo, vhi, wlo, whi, slo, shi, q: int):
    """x*w mod q with the sloppy quotient: output in [0, 4q)."""
    t_lo, t_hi = _mul64_hi_sloppy(vlo, vhi, slo, shi)
    xw_lo, xw_hi = r32.mul64_lo(vlo, vhi, wlo, whi)
    tq_lo, tq_hi = r32.mul64_lo(t_lo, t_hi, *r32.const64(q))
    return r32.sub64(xw_lo, xw_hi, tq_lo, tq_hi)


_M16 = np.uint32(0xFFFF)


def _mul64_hi_limb(alo, ahi, s0, s1, s2, s3):
    """hi64(a*s) from 16-bit limb planes of s, quotient error in {0, -1}.

    13 multiplies (vs 16 in _mul64_hi_sloppy) with column-sum assembly in
    u32 accumulators: every 16x16 partial product lands directly in its
    output column, skipping the mul32_wide pack/carry machinery.  The only
    dropped term is the carry into column 3 from the low columns (<= 5),
    which perturbs the quotient by at most 1 — the butterfly window
    tightens to [0, 3q) per product (verified exhaustively in
    tools/op_probe.py's CPU check)."""
    S = np.uint32
    a0 = alo & _M16
    a1 = alo >> S(16)
    a2 = ahi & _M16
    a3 = ahi >> S(16)
    return _hi_limb_parts(a0, a1, a2, a3, s0, s1, s2, s3, False)


def _hi_limb_parts(a0, a1, a2, a3, s0, s1, s2, s3, drop3: bool):
    """Column-sum hi64 estimate from pre-split 16-bit limbs.

    drop3 additionally drops the p02/p11/p20 products (whose only use is
    column 3, which feeds the quotient solely through its carry): the
    column-3 deficit is < 3*2^16 + 5, so the quotient underestimates by
    at most 4 (on top of the base {0,-1}) — 10 multiplies, products land
    in [0, 6q), and the forward ride window widens to [0, 16q), which
    still fits u64 for any q < 2^60."""
    S = np.uint32
    if not drop3:
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
    col3 = (p03 & _M16) + (p12 & _M16) + (p21 & _M16) + (p30 & _M16)
    if not drop3:
        col3 = col3 + (p02 >> S(16)) + (p11 >> S(16)) + (p20 >> S(16))
    col4 = (
        (p13 & _M16) + (p22 & _M16) + (p31 & _M16)
        + (p03 >> S(16)) + (p12 >> S(16)) + (p21 >> S(16))
        + (p30 >> S(16))
    )
    col5 = (
        (p23 & _M16) + (p32 & _M16)
        + (p13 >> S(16)) + (p22 >> S(16)) + (p31 >> S(16))
    )
    col6 = (p33 & _M16) + (p23 >> S(16)) + (p32 >> S(16))
    col7 = p33 >> S(16)
    l4 = col4 + (col3 >> S(16))
    l5 = col5 + (l4 >> S(16))
    l6 = col6 + (l5 >> S(16))
    l7 = col7 + (l6 >> S(16))
    t_lo = (l4 & _M16) | (l5 << S(16))
    t_hi = (l6 & _M16) | (l7 << S(16))
    return t_lo, t_hi


def _mul64_lo_parts(a0, a1, vlo, vhi, wlo, whi):
    """lo64(v*w) reusing v's pre-split low limbs; w's 16-bit split runs
    on the (broadcast) twiddle row, not the data."""
    S = np.uint32
    w0 = wlo & _M16
    w1 = wlo >> S(16)
    p00 = a0 * w0
    p01 = a0 * w1
    p10 = a1 * w0
    p11 = a1 * w1
    mid = (p00 >> S(16)) + (p01 & _M16) + (p10 & _M16)
    lo = (p00 & _M16) | (mid << S(16))
    hi = (
        p11 + (p01 >> S(16)) + (p10 >> S(16)) + (mid >> S(16))
        + vlo * whi + vhi * wlo
    )
    return lo, hi


def _shoup_mul_limb(vlo, vhi, wlo, whi, s0, s1, s2, s3, q: int,
                    drop3: bool = False):
    """x*w mod q, limb quotient + shift-add t*q: output in [0, 3q)
    (drop3: 10-multiply quotient, output in [0, 6q) — see
    _hi_limb_parts).

    The t*q product exploits the sparsity of NTT-friendly moduli
    (rns_jax.mul_q_lo); dense q falls back to the generic low multiply."""
    S = np.uint32
    a0 = vlo & _M16
    a1 = vlo >> S(16)
    a2 = vhi & _M16
    a3 = vhi >> S(16)
    t_lo, t_hi = _hi_limb_parts(a0, a1, a2, a3, s0, s1, s2, s3, drop3)
    xw_lo, xw_hi = _mul64_lo_parts(a0, a1, vlo, vhi, wlo, whi)
    if r32.mul_q_lo_cost(q) <= 26:
        tq_lo, tq_hi = r32.mul_q_lo(t_lo, t_hi, q)
    else:  # pragma: no cover - default moduli are sparse
        tq_lo, tq_hi = r32.mul64_lo(t_lo, t_hi, *r32.const64(q))
    return r32.sub64(xw_lo, xw_hi, tq_lo, tq_hi)


def _mul_mode() -> str:
    return os.environ.get("ALOHA_STREAM_MUL", "limb")


def _off_mult() -> int:
    """Butterfly offset/condsub threshold multiple: the limb10 quotient
    overshoots by up to 4q extra, so products ride < 6q and the forward
    window widens from [0, 8q) to [0, 16q) (16q < 2^64 for q < 2^60)."""
    return 8 if _mul_mode() == "limb10" else 4


def _stage_mul(alo, ahi, wl, wh, s0, s1, s2, s3, q: int):
    """Twiddle multiply selected by ALOHA_STREAM_MUL
    (limb | limb10 | sloppy)."""
    mode = _mul_mode()
    if mode in ("limb", "limb10"):
        return _shoup_mul_limb(
            alo, ahi, wl, wh, s0, s1, s2, s3, q, drop3=mode == "limb10"
        )
    sl = s0 | (s1 << np.uint32(16))
    sh = s2 | (s3 << np.uint32(16))
    return _shoup_mul_sloppy(alo, ahi, wl, wh, sl, sh, q)


def _ct_stage(alo, ahi, s, t, ids, axis, size, tbl, q):
    """One forward (Harvey CT) stage with traced distance t along `axis`.

    Roll-the-outputs formulation — 4 rolls and 2 selects per stage instead
    of the naive 8 rolls and 12 selects: with x' = condsub(x, 4q) and
    y = w*x (sloppy Shoup, < 4q; the twiddle of partners is identical, a
    property of the psi^bitrev tables), the butterfly is

        out = bit ? roll(x', +t) + (4q - y)    # u' + 4q - w v
              :     x' + roll(y, -t)           # u' + w v

    Values ride in [0, 8q) between stages (< 2^63 for 60-bit moduli).

    Data is (bp, rows, LANES); twiddle rows (1, rows, LANES) broadcast
    inside the ops."""
    bit = (ids & t) != 0
    OFF = _off_mult() * q
    wl, wh, s0, s1, s2, s3 = (ref[s][None] for ref in tbl)
    xplo, xphi = K._condsub(alo, ahi, OFF)
    ylo, yhi = _stage_mul(alo, ahi, wl, wh, s0, s1, s2, s3, q)
    # top = x' + y[i + t]
    tlo, thi = r32.add64(
        xplo, xphi, _roll(ylo, size - t, axis), _roll(yhi, size - t, axis)
    )
    # bottom = x'[i - t] + (OFF - y)
    zlo, zhi = r32.sub64(*r32.const64(OFF), ylo, yhi)
    blo, bhi = r32.add64(
        _roll(xplo, t, axis), _roll(xphi, t, axis), zlo, zhi
    )
    return jnp.where(bit, blo, tlo), jnp.where(bit, bhi, thi)


def _ct_stage_pair(alo, ahi, s, t, ids, tbl, q):
    """Forward lane stage on POLY PAIRS: half the twiddle multiplies.

    The Shoup product is only ever consumed at v positions (bit t set):
    top[i] = u'[i] + y[i+t] reads y at i+t (a v lane), bottom[j] =
    u'[j-t] + 4q - y[j] reads y at j itself (a v lane).  Since butterfly
    partners share a twiddle, TWO polys' v halves pack into one full
    vector: A's v elements stay at their bit=1 lanes, B's v elements
    roll by t into the bit=0 lanes — and the shared twiddle table is
    correct at every lane of the packed vector.  One _stage_mul then
    serves both polys:

        Y = w * where(bit, A, roll(B, -t))
        A: top = u'_A + roll(Y, -t),  bottom = roll(u'_A, t) + (4q - Y)
        B: top = u'_B + Y,            bottom = roll(u'_B, t) + (4q - roll(Y, t))

    Data is (bp/2, 2, rows, LANES); same [0, 8q) ride window (16q under
    limb10)."""
    bit = (ids & t) != 0
    OFF = _off_mult() * q
    wl, wh, s0, s1, s2, s3 = (ref[s][None] for ref in tbl)
    SZ = I32(LANES)
    a_lo, a_hi = alo[:, 0], ahi[:, 0]
    b_lo, b_hi = alo[:, 1], ahi[:, 1]
    plo = jnp.where(bit, a_lo, _roll(b_lo, SZ - t, 2))
    phi = jnp.where(bit, a_hi, _roll(b_hi, SZ - t, 2))
    ylo, yhi = _stage_mul(plo, phi, wl, wh, s0, s1, s2, s3, q)
    ualo, uahi = K._condsub(a_lo, a_hi, OFF)
    ublo, ubhi = K._condsub(b_lo, b_hi, OFF)
    # poly A combine (product at its own v lanes)
    talo, tahi = r32.add64(
        ualo, uahi, _roll(ylo, SZ - t, 2), _roll(yhi, SZ - t, 2)
    )
    zalo, zahi = r32.sub64(*r32.const64(OFF), ylo, yhi)
    balo, bahi = r32.add64(_roll(ualo, t, 2), _roll(uahi, t, 2), zalo, zahi)
    oalo = jnp.where(bit, balo, talo)
    oahi = jnp.where(bit, bahi, tahi)
    # poly B combine (product for v position j sits at lane j-t);
    # bottom_B[i] = u'_B[i-t] + OFF - Y[i-t] = roll(u'_B + OFF - Y, t),
    # one rolled sum instead of rolling u'_B and Y separately
    tblo, tbhi = r32.add64(ublo, ubhi, ylo, yhi)
    gblo, gbhi = r32.add64(ublo, ubhi, zalo, zahi)
    bblo, bbhi = _roll(gblo, t, 2), _roll(gbhi, t, 2)
    oblo = jnp.where(bit, bblo, tblo)
    obhi = jnp.where(bit, bbhi, tbhi)
    return (
        jnp.stack([oalo, oblo], axis=1), jnp.stack([oahi, obhi], axis=1)
    )


def _gs_stage(alo, ahi, s, t, ids, axis, size, tbl, q):
    """One inverse (lazy GS) stage with traced distance t along `axis`:

        out = bit ? halfq(w * (x[i-t] - x + 4q))   # ((u - v) w)/2
              :     halfq(condsub(x + x[i+t], 2q)) # (u + v)/2

    Sloppy-quotient window: values ride in [0, 2.5q) between stages
    (sum path < 2q after condsub+halve; diff path: sloppy product < 4q,
    halved < 2.5q); the 4q offset keeps u - v positive."""
    bit = (ids & t) != 0
    wl, wh, s0, s1, s2, s3 = (ref[s][None] for ref in tbl)
    # sum path (valid at bit = 0): x + p < 5q, condsub -> < 3q, halve -> < 2q
    slo_, shi_ = r32.add64(
        alo, ahi, _roll(alo, size - t, axis), _roll(ahi, size - t, axis)
    )
    s0lo, s0hi = K._halfq(*K._condsub(slo_, shi_, 2 * q), q)
    # diff path (valid at bit = 1): u - v + 4q = x[i-t] - x + 4q in (0, 6.5q)
    dlo, dhi = r32.sub64(*r32.const64(4 * q), alo, ahi)
    dlo, dhi = r32.add64(_roll(alo, t, axis), _roll(ahi, t, axis), dlo, dhi)
    wvlo, wvhi = _stage_mul(dlo, dhi, wl, wh, s0, s1, s2, s3, q)
    s1lo, s1hi = K._halfq(wvlo, wvhi, q)
    return jnp.where(bit, s1lo, s0lo), jnp.where(bit, s1hi, s0hi)


def _gs_stage_pair(alo, ahi, s, t, ids, tbl, q):
    """Inverse lane stage on POLY PAIRS: half the twiddle multiplies.

    The GS product operand d = u - v + 4q is only consumed at v positions
    (bit t set); two polys' d vectors pack into one full vector exactly as
    in _ct_stage_pair (A's at bit=1 lanes, B's shifted into bit=0 lanes):

        P = where(bit, roll(A, t) - A + 4q,  B - roll(B, -t) + 4q)
        Y = w * P
        A: out = halfq(where(bit, Y,          condsub(A + roll(A, -t), 2q)))
        B: out = halfq(where(bit, roll(Y, t), condsub(B + roll(B, -t), 2q)))

    Data is (bp/2, 2, rows, LANES); same [0, 2.5q) ride window."""
    bit = (ids & t) != 0
    wl, wh, s0, s1, s2, s3 = (ref[s][None] for ref in tbl)
    SZ = I32(LANES)
    a_lo, a_hi = alo[:, 0], ahi[:, 0]
    b_lo, b_hi = alo[:, 1], ahi[:, 1]
    rblo, rbhi = _roll(b_lo, SZ - t, 2), _roll(b_hi, SZ - t, 2)
    dalo, dahi = r32.sub64(*r32.const64(4 * q), a_lo, a_hi)
    dalo, dahi = r32.add64(_roll(a_lo, t, 2), _roll(a_hi, t, 2), dalo, dahi)
    dblo, dbhi = r32.sub64(*r32.const64(4 * q), rblo, rbhi)
    dblo, dbhi = r32.add64(b_lo, b_hi, dblo, dbhi)
    plo = jnp.where(bit, dalo, dblo)
    phi = jnp.where(bit, dahi, dbhi)
    ylo, yhi = _stage_mul(plo, phi, wl, wh, s0, s1, s2, s3, q)
    # sum paths (valid at bit = 0)
    salo, sahi = r32.add64(
        a_lo, a_hi, _roll(a_lo, SZ - t, 2), _roll(a_hi, SZ - t, 2)
    )
    salo, sahi = K._condsub(salo, sahi, 2 * q)
    sblo, sbhi = K._condsub(*r32.add64(b_lo, b_hi, rblo, rbhi), 2 * q)
    oalo, oahi = K._halfq(
        jnp.where(bit, ylo, salo), jnp.where(bit, yhi, sahi), q
    )
    rylo, ryhi = _roll(ylo, t, 2), _roll(yhi, t, 2)
    oblo, obhi = K._halfq(
        jnp.where(bit, rylo, sblo), jnp.where(bit, ryhi, sbhi), q
    )
    return (
        jnp.stack([oalo, oblo], axis=1), jnp.stack([oahi, obhi], axis=1)
    )


def _fori(lo, hi, body, init):
    """fori_loop with a compile-time unroll knob (ALOHA_STREAM_UNROLL).

    Mosaic's for-loop lowering supports unroll=1 or full unroll only;
    "full" unrolls at LOWERING time — the traced body stays one stage, so
    the round-1 trace blowup does not return, while the backend gets
    straight-line code to schedule.  Full is the default (2.4x the
    rolled-loop throughput); it costs a minutes-scale first compile
    through the hosted remote service — set "1" for quick bring-up."""
    mode = os.environ.get("ALOHA_STREAM_UNROLL", "full")
    if mode == "full":
        return jax.lax.fori_loop(lo, hi, body, init, unroll=hi - lo)
    return jax.lax.fori_loop(lo, hi, body, init)


def _make_stage_loops(tbl, q, rows, bp, logn):
    """Row-axis and lane-axis stage loops over (bp, rows, LANES) planes."""
    log_rows = rows.bit_length() - 1
    lane_ids = jax.lax.broadcasted_iota(I32, (1, rows, LANES), 2)
    row_ids = jax.lax.broadcasted_iota(I32, (1, rows, LANES), 1)

    def row_stage(s, carry, stage_fn):
        alo, ahi = carry
        # stage s: t = n >> (s+1) -> row distance tr = t / LANES
        tr = I32(rows) >> (s + I32(1))
        return stage_fn(
            alo, ahi, s, tr, row_ids, 1, I32(rows), tbl, q
        )

    def lane_stage(s, carry, stage_fn):
        alo, ahi = carry
        t = I32(rows * LANES) >> (s + I32(1))
        return stage_fn(
            alo, ahi, s, t, lane_ids, 2, I32(LANES), tbl, q
        )

    def _row_static_fwd(alo, ahi, s: int):
        """Row stage with a COMPILE-TIME stage index: pure sublane
        regrouping via reshapes instead of dynamic sublane rotates —
        enabled by ALOHA_STREAM_ROWMODE=static.

        Unlike the roll formulation (which multiplies every element,
        exploiting that butterfly partners share a twiddle), the separated
        halves let the twiddle multiply run on the v half only — half the
        multiplies on the 6 row stages.  Same [0, 8q) ride window:
        u' = condsub(u, 4q); y = w*v < 3q (limb) / 4q (sloppy);
        top = u' + y < 8q; bottom = u' + (OFF - y) < 2*OFF."""
        OFF = _off_mult() * q
        tr = rows >> (s + 1)
        shp = (bp, rows // (2 * tr), 2, tr, LANES)
        vlo = alo.reshape(shp)
        vhi = ahi.reshape(shp)
        w = [ref[s][None].reshape((1,) + shp[1:])[:, :, 0] for ref in tbl]
        ulo, uhi = K._condsub(vlo[:, :, 0], vhi[:, :, 0], OFF)
        ylo, yhi = _stage_mul(
            vlo[:, :, 1], vhi[:, :, 1], w[0], w[1], w[2], w[3], w[4], w[5], q
        )
        tlo, thi = r32.add64(ulo, uhi, ylo, yhi)
        zlo, zhi = r32.sub64(*r32.const64(OFF), ylo, yhi)
        blo, bhi = r32.add64(ulo, uhi, zlo, zhi)
        alo = jnp.stack([tlo, blo], axis=2).reshape(bp, rows, LANES)
        ahi = jnp.stack([thi, bhi], axis=2).reshape(bp, rows, LANES)
        return alo, ahi

    def _row_static_inv(alo, ahi, s: int):
        """Inverse (GS) row stage with a compile-time stage index: sublane
        regrouping via reshapes; the twiddle multiply runs on the diff
        path only — half the multiplies vs the roll formulation.  Same
        [0, 2.5q) ride window as _gs_stage."""
        tr = (1 << s) // LANES
        shp = (bp, rows // (2 * tr), 2, tr, LANES)
        vlo = alo.reshape(shp)
        vhi = ahi.reshape(shp)
        w = [ref[s][None].reshape((1,) + shp[1:])[:, :, 0] for ref in tbl]
        ulo, uhi = vlo[:, :, 0], vhi[:, :, 0]
        plo, phi = vlo[:, :, 1], vhi[:, :, 1]
        # sum path: u + v < 5q, condsub -> < 3q, halve -> < 2q
        slo_, shi_ = r32.add64(ulo, uhi, plo, phi)
        s0lo, s0hi = K._halfq(*K._condsub(slo_, shi_, 2 * q), q)
        # diff path: u - v + 4q in (0, 6.5q); product < 3q; halve < 2q
        dlo, dhi = r32.sub64(*r32.const64(4 * q), plo, phi)
        dlo, dhi = r32.add64(ulo, uhi, dlo, dhi)
        ylo, yhi = _stage_mul(
            dlo, dhi, w[0], w[1], w[2], w[3], w[4], w[5], q
        )
        s1lo, s1hi = K._halfq(ylo, yhi, q)
        alo = jnp.stack([s0lo, s1lo], axis=2).reshape(bp, rows, LANES)
        ahi = jnp.stack([s0hi, s1hi], axis=2).reshape(bp, rows, LANES)
        return alo, ahi

    # static (compile-time stage indices, half the row-stage multiplies)
    # measured 19% faster than the dynamic-roll formulation and is the
    # default; dyn remains for A/B and as the formulation reference.
    _rowmode = os.environ.get("ALOHA_STREAM_ROWMODE", "static")
    # pair (two polys share each twiddle multiply, half the lane-stage
    # multiplies) needs an even bp; roll is the single-poly fallback.
    _lanemode = os.environ.get("ALOHA_STREAM_LANEMODE", "pair")
    pair_ok = _lanemode == "pair" and bp % 2 == 0

    def lane_pair(s, carry):
        alo, ahi = carry
        t = I32(rows * LANES) >> (s + I32(1))
        return _ct_stage_pair(alo, ahi, s, t, lane_ids, tbl, q)

    def forward(alo, ahi):
        if _rowmode == "static":
            for s in range(log_rows):
                alo, ahi = _row_static_fwd(alo, ahi, s)
        else:
            alo, ahi = _fori(
                0, log_rows,
                lambda s, c: row_stage(s, c, _ct_stage), (alo, ahi),
            )
        if pair_ok:
            alo = alo.reshape(bp // 2, 2, rows, LANES)
            ahi = ahi.reshape(bp // 2, 2, rows, LANES)
            alo, ahi = _fori(log_rows, logn, lane_pair, (alo, ahi))
            alo = alo.reshape(bp, rows, LANES)
            ahi = ahi.reshape(bp, rows, LANES)
        else:
            alo, ahi = _fori(
                log_rows, logn,
                lambda s, c: lane_stage(s, c, _ct_stage), (alo, ahi),
            )
        # canonicalize: the ride window is [0, 2*OFF)
        if _off_mult() == 8:
            alo, ahi = K._condsub(alo, ahi, 8 * q)
        alo, ahi = K._condsub(alo, ahi, 4 * q)
        alo, ahi = K._condsub(alo, ahi, 2 * q)
        return K._condsub(alo, ahi, q)

    def inverse(alo, ahi):
        log_lanes = LANES.bit_length() - 1

        def inv_lane(s, c):
            alo, ahi = c
            t = I32(1) << s
            return _gs_stage(
                alo, ahi, s, t, lane_ids, 2, I32(LANES), tbl, q
            )

        def inv_lane_pair(s, c):
            alo, ahi = c
            t = I32(1) << s
            return _gs_stage_pair(alo, ahi, s, t, lane_ids, tbl, q)

        def inv_row(s, c):
            alo, ahi = c
            tr = (I32(1) << s) // I32(LANES)
            return _gs_stage(
                alo, ahi, s, tr, row_ids, 1, I32(rows), tbl, q
            )

        if pair_ok:
            alo = alo.reshape(bp // 2, 2, rows, LANES)
            ahi = ahi.reshape(bp // 2, 2, rows, LANES)
            alo, ahi = _fori(0, log_lanes, inv_lane_pair, (alo, ahi))
            alo = alo.reshape(bp, rows, LANES)
            ahi = ahi.reshape(bp, rows, LANES)
        else:
            alo, ahi = _fori(0, log_lanes, inv_lane, (alo, ahi))
        if _rowmode == "static":
            for s in range(log_lanes, logn):
                alo, ahi = _row_static_inv(alo, ahi, s)
        else:
            alo, ahi = _fori(log_lanes, logn, inv_row, (alo, ahi))
        # canonicalize from the sloppy window [0, 2.5q)
        alo, ahi = K._condsub(alo, ahi, 2 * q)
        return K._condsub(alo, ahi, q)

    return forward, inverse


def _chunk_pipeline(
    ilo, ihi, qlo, qhi, sem_in, sem_out,
    stages, nchunks: int, bp: int,
    xlo, xhi, olo, ohi, hbm_at,
):
    """The double-buffered load/compute/store loop over one group of
    chunks.  `hbm_at(ref, c)` slices the HBM operand for chunk c (the
    multi-modulus body prepends its modulus index here)."""

    def in_copy(slot, c):
        return [
            pltpu.make_async_copy(
                hbm_at(src, c), dst.at[slot], sem_in.at[slot, np.int32(p)]
            )
            for p, (src, dst) in enumerate(((xlo, ilo), (xhi, ihi)))
        ]

    def out_copy(slot, c):
        return [
            pltpu.make_async_copy(
                src.at[slot], hbm_at(dst, c), sem_out.at[slot, np.int32(p)]
            )
            for p, (src, dst) in enumerate(((qlo, olo), (qhi, ohi)))
        ]

    for d in in_copy(np.int32(0), np.int32(0)):
        d.start()
    TWO, ONE = np.int32(2), np.int32(1)

    def step(c, _):
        cur = c % TWO
        nxt = (c + ONE) % TWO

        @pl.when(c + ONE < np.int32(nchunks))
        def _():
            for d in in_copy(nxt, c + ONE):
                d.start()

        for d in in_copy(cur, c):
            d.wait()
        alo, ahi = stages(ilo[cur], ihi[cur])

        @pl.when(c >= TWO)
        def _():
            for d in out_copy(cur, c - TWO):
                d.wait()

        qlo[cur] = alo
        qhi[cur] = ahi
        for d in out_copy(cur, c):
            d.start()
        return 0

    jax.lax.fori_loop(np.int32(0), np.int32(nchunks), step, 0)
    for back in (2, 1):
        c = nchunks - back
        if c >= 0:
            for d in out_copy(np.int32(c % 2), np.int32(c)):
                d.wait()


def _scoped_pipeline(body, bp: int, rows: int):
    pl.run_scoped(
        body,
        ilo=pltpu.VMEM((2, bp, rows, LANES), jnp.uint32),
        ihi=pltpu.VMEM((2, bp, rows, LANES), jnp.uint32),
        qlo=pltpu.VMEM((2, bp, rows, LANES), jnp.uint32),
        qhi=pltpu.VMEM((2, bp, rows, LANES), jnp.uint32),
        sem_in=pltpu.SemaphoreType.DMA((2, 2)),
        sem_out=pltpu.SemaphoreType.DMA((2, 2)),
    )


def _stream_body(
    inverse: bool, q: int, nchunks: int, bp: int, rows: int,
    wl, wh, s0, s1, s2, s3, xlo, xhi, olo, ohi,
):
    logn = (rows * LANES).bit_length() - 1
    fwd, inv = _make_stage_loops((wl, wh, s0, s1, s2, s3), q, rows, bp, logn)
    stages = inv if inverse else fwd

    def hbm_at(ref, c):
        return ref.at[pl.ds(c * np.int32(bp), bp)]

    def inner(ilo, ihi, qlo, qhi, sem_in, sem_out):
        _chunk_pipeline(
            ilo, ihi, qlo, qhi, sem_in, sem_out,
            stages, nchunks, bp, xlo, xhi, olo, ohi, hbm_at,
        )

    _scoped_pipeline(inner, bp, rows)


class _TblSlice:
    """One modulus' view of a stacked (M, logn, rows, LANES) table ref,
    presenting the single-modulus `ref[s]` interface the stage functions
    consume."""

    def __init__(self, ref, m: int):
        self.ref, self.m = ref, m

    def __getitem__(self, s):
        return self.ref[self.m, s]


def _stream_body_multi(
    inverse: bool, qs: tuple, nchunks: int, bp: int, rows: int,
    wl, wh, s0, s1, s2, s3, xlo, xhi, olo, ohi,
):
    """Transform M same-shaped poly groups, EACH UNDER ITS OWN MODULUS,
    in one kernel launch: data is (M, nb, rows, LANES), tables are
    stacked (M, logn, rows, LANES).  The TPU fusion of the keyswitch
    inner loop's per-residue NTT sweep (reference: the per-modq twiddle
    set select, src/vp/ntt/ntt_fsm.sv + sim/vp/isram_file_generator/
    keyswitch.mem) — one launch instead of one per residue.  Each
    modulus runs the same double-buffered pipeline; the only cost vs a
    single-modulus launch is a DMA bubble at each modulus boundary."""
    logn = (rows * LANES).bit_length() - 1

    def inner(ilo, ihi, qlo, qhi, sem_in, sem_out):
        for m, q in enumerate(qs):
            tbl = tuple(
                _TblSlice(r, m) for r in (wl, wh, s0, s1, s2, s3)
            )
            fwd, inv = _make_stage_loops(tbl, q, rows, bp, logn)

            def hbm_at(ref, c, m=np.int32(m)):
                return ref.at[m, pl.ds(c * np.int32(bp), bp)]

            _chunk_pipeline(
                ilo, ihi, qlo, qhi, sem_in, sem_out,
                inv if inverse else fwd, nchunks, bp,
                xlo, xhi, olo, ohi, hbm_at,
            )

    _scoped_pipeline(inner, bp, rows)


@functools.lru_cache(maxsize=None)
def _tables6_np(n: int, root: int, q: int, inverse: bool):
    """(w_lo, w_hi, s0, s1, s2, s3): twiddles as u32 planes, Shoup
    constants pre-split into 16-bit limb planes for _mul64_hi_limb."""
    w_lo, w_hi, s_lo, s_hi = K._tables_np(n, root, q, inverse)
    m = np.uint32(0xFFFF)
    return (
        w_lo, w_hi,
        s_lo & m, s_lo >> 16, s_hi & m, s_hi >> 16,
    )


def _stream_call_planes(alo, ahi, *, q, root, inverse, n, bp, nchunks):
    # NOT nested-jitted: a nested jit whose body flips jax.enable_x64
    # leaks tracers across trace contexts when inlined into an outer jit
    # (observed as UnexpectedTracerError from rotation graphs); invoked
    # plainly, the pallas_call traces its kernel body in its own scope
    # exactly like the grid kernel's host wrapper.
    rows = n // LANES
    tables = [jnp.asarray(t) for t in _tables6_np(n, root, q, inverse)]
    body = functools.partial(_stream_body, inverse, q, nchunks, bp, rows)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    # the kernel body must trace with x64 disabled (x64 tracing of the
    # in-kernel loop counters trips a JAX promotion recursion)
    with jax.enable_x64(False):
        call = pl.pallas_call(
            body,
            in_specs=[vmem] * 6 + [hbm] * 2,
            out_specs=[hbm] * 2,
            out_shape=[jax.ShapeDtypeStruct(alo.shape, jnp.uint32)] * 2,
            # in-place on the HBM planes: the chunk pipeline only starts
            # out-DMA(c) after in-DMA(c) completed, and later in-DMAs read
            # disjoint regions, so aliasing input->output is race-free; it
            # halves the HBM footprint of chained transforms (XLA inserts
            # a copy when the caller still needs the input)
            input_output_aliases={6: 0, 7: 1},
            # CPU-side validation of kernel-math changes (CI without the
            # remote compile service); slow — small batches only
            interpret=bool(os.environ.get("ALOHA_STREAM_INTERPRET")),
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                # the default 16 MiB scoped-vmem budget forces spills
                # with chunked double-buffering; v5e has far more VMEM
                vmem_limit_bytes=int(
                    os.environ.get("ALOHA_STREAM_VMEM", str(100 * 2**20))
                ),
            ),
        )
        return call(*tables, alo, ahi)


def _chunking(nb: int):
    bp = int(os.environ.get("ALOHA_STREAM_BP", "16"))
    while nb % bp:
        bp //= 2
    return bp, nb // bp


def ntt_planes_with_tables(alo, ahi, tables6, q: int, inverse: bool):
    """Streaming transform with CALLER-SUPPLIED table planes (traced
    values allowed): tables6 = (w_lo, w_hi, s0, s1, s2, s3), each
    (log2(rows*LANES), rows, LANES) — the _tables6_np layout, but e.g. a
    per-shard slice of a LARGER ring's stage tables.  This is the
    composed multi-chip form's local body: when a size-n ring is
    coefficient-sharded over D devices, the global stages with t < C
    (= n/D) are exactly a size-C stage loop whose twiddles are the
    global tables' stage/row slice for this shard (the XOR butterfly
    partner of a local index stays shard-local, and K._tables_np stores
    pair-identical per-element twiddles).  Cross-shard stages stay
    outside (ppermute; parallel/ntt_sharded.py).  Reference analogue:
    the iconn fl tap sits inside the engine's hot loop
    (src/vp/iconn/iconn_top.sv:56-58) — here the ICI exchanges wrap the
    SAME production kernel instead of a separate slow path."""
    nb, rows = alo.shape[0], alo.shape[1]
    bp, nchunks = _chunking(nb)
    body = functools.partial(_stream_body, inverse, q, nchunks, bp, rows)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    with jax.enable_x64(False):
        call = pl.pallas_call(
            body,
            in_specs=[vmem] * 6 + [hbm] * 2,
            out_specs=[hbm] * 2,
            out_shape=[jax.ShapeDtypeStruct(alo.shape, jnp.uint32)] * 2,
            input_output_aliases={6: 0, 7: 1},
            interpret=bool(os.environ.get("ALOHA_STREAM_INTERPRET")),
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                vmem_limit_bytes=int(
                    os.environ.get("ALOHA_STREAM_VMEM", str(100 * 2**20))
                ),
            ),
        )
        return call(*tables6, alo, ahi)


@functools.lru_cache(maxsize=None)
def _tables6_multi_np(n: int, roots: tuple, qs: tuple, inverse: bool):
    """Stacked (M, logn, rows, LANES) u32 table planes for qs/roots."""
    per = [_tables6_np(n, r, q, inverse) for r, q in zip(roots, qs)]
    return tuple(np.stack(p) for p in zip(*per))


def _stream_call_planes_multi(alo, ahi, *, qs, roots, inverse):
    """One launch over (M, nb, rows, LANES) planes, modulus m for group m."""
    M, nb = alo.shape[0], alo.shape[1]
    n = alo.shape[2] * LANES
    bp, nchunks = _chunking(nb)
    tables = [
        jnp.asarray(t)
        for t in _tables6_multi_np(n, tuple(roots), tuple(qs), inverse)
    ]
    body = functools.partial(
        _stream_body_multi, inverse, tuple(qs), nchunks, bp, n // LANES
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    with jax.enable_x64(False):
        call = pl.pallas_call(
            body,
            in_specs=[vmem] * 6 + [hbm] * 2,
            out_specs=[hbm] * 2,
            out_shape=[jax.ShapeDtypeStruct(alo.shape, jnp.uint32)] * 2,
            # race-free in-place aliasing, as in _stream_call_planes
            input_output_aliases={6: 0, 7: 1},
            interpret=bool(os.environ.get("ALOHA_STREAM_INTERPRET")),
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                vmem_limit_bytes=int(
                    os.environ.get("ALOHA_STREAM_VMEM", str(100 * 2**20))
                ),
            ),
        )
        return call(*tables, alo, ahi)


def ntt_planes_multi(alo, ahi, qs, roots):
    """Forward NTT of M same-shaped groups, group m under modulus qs[m].

    alo/ahi: (M, nb, rows, 128) u32 planes; roots[m] is psi for qs[m]."""
    return _stream_call_planes_multi(
        alo, ahi, qs=qs, roots=roots, inverse=False
    )


def intt_planes_multi(alo, ahi, qs, iroots):
    """Inverse NTT of M same-shaped groups, group m under modulus qs[m]."""
    return _stream_call_planes_multi(
        alo, ahi, qs=qs, roots=iroots, inverse=True
    )


def ntt_planes(alo, ahi, q: int, psi: int):
    """Forward NTT on (nb, rows, 128) u32 planes (native layout)."""
    nb = alo.shape[0]
    n = alo.shape[1] * LANES
    bp, nchunks = _chunking(nb)
    return _stream_call_planes(
        alo, ahi, q=q, root=psi, inverse=False, n=n, bp=bp, nchunks=nchunks
    )


def intt_planes(alo, ahi, q: int, ipsi: int):
    """Inverse NTT on (nb, rows, 128) u32 planes."""
    nb = alo.shape[0]
    n = alo.shape[1] * LANES
    bp, nchunks = _chunking(nb)
    return _stream_call_planes(
        alo, ahi, q=q, root=ipsi, inverse=True, n=n, bp=bp, nchunks=nchunks
    )


def _u64_wrap(fn, a, q, root):
    n = a.shape[-1]
    rows = n // LANES
    batch = a.shape[:-1]
    nb = int(np.prod(batch)) if batch else 1
    a3 = a.reshape(nb, rows, LANES)
    alo = (a3 & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    ahi = (a3 >> jnp.uint64(32)).astype(jnp.uint32)
    olo, ohi = fn(alo, ahi, q, root)
    out = olo.astype(jnp.uint64) | (ohi.astype(jnp.uint64) << jnp.uint64(32))
    return out.reshape(batch + (n,))


def ntt(a, q: int, psi: int):
    """Streaming forward NTT over the last axis (uint64 convenience)."""
    return _u64_wrap(ntt_planes, a, q, psi)


def intt(a, q: int, ipsi: int):
    """Streaming inverse NTT over the last axis (uint64 convenience)."""
    return _u64_wrap(intt_planes, a, q, ipsi)
