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

from aloha_tpu.ops import ntt_pallas as K
from aloha_tpu.ops.ntt_pallas import LANES

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _OK = True
except Exception:  # pragma: no cover
    _OK = False

I32 = jnp.int32


def available() -> bool:
    return _OK and K.available()


def _dyn_partner(a, bit, t, axis, size):
    """Value at index (i XOR t) along `axis`; t is a traced non-negative
    int32.  Select keeps reads inside each XOR block, so roll wraparound
    is masked out."""
    fwd = pltpu.roll(a, t, axis)          # value from i - t
    bwd = pltpu.roll(a, size - t, axis)   # value from i + t
    return jnp.where(bit, fwd, bwd)


def _stage_any(alo, ahi, s, t, ids, axis, size, tbl, q, butterfly):
    """One butterfly stage with traced distance t along `axis`.

    Data is (bp, rows, LANES); twiddle rows are (1, rows, LANES) and
    broadcast *inside* the butterfly ops (never materialized at bp)."""
    bit = (ids & t) != 0
    plo = _dyn_partner(alo, bit, t, axis, size)
    phi = _dyn_partner(ahi, bit, t, axis, size)
    ulo = jnp.where(bit, plo, alo)
    uhi = jnp.where(bit, phi, ahi)
    vlo = jnp.where(bit, alo, plo)
    vhi = jnp.where(bit, ahi, phi)
    wl, wh, sl, sh = (ref[s][None] for ref in tbl)
    (tlo, thi), (blo, bhi) = butterfly(
        ulo, uhi, vlo, vhi, wl, wh, sl, sh, q
    )
    return jnp.where(bit, blo, tlo), jnp.where(bit, bhi, thi)


def _fori(lo, hi, body, init):
    """fori_loop with a compile-time unroll knob (ALOHA_STREAM_UNROLL)."""
    unroll = int(os.environ.get("ALOHA_STREAM_UNROLL", "1"))
    if unroll > 1:
        return jax.lax.fori_loop(lo, hi, body, init, unroll=unroll)
    return jax.lax.fori_loop(lo, hi, body, init)


def _make_stage_loops(tbl, q, rows, bp, logn):
    """Row-axis and lane-axis stage loops over (bp, rows, LANES) planes."""
    log_rows = rows.bit_length() - 1
    lane_ids = jax.lax.broadcasted_iota(I32, (1, rows, LANES), 2)
    row_ids = jax.lax.broadcasted_iota(I32, (1, rows, LANES), 1)

    def row_stage(s, carry, butterfly):
        alo, ahi = carry
        # stage s: t = n >> (s+1) -> row distance tr = t / LANES
        tr = I32(rows) >> (s + I32(1))
        return _stage_any(
            alo, ahi, s, tr, row_ids, 1, I32(rows), tbl, q, butterfly
        )

    def lane_stage(s, carry, butterfly):
        alo, ahi = carry
        t = I32(rows * LANES) >> (s + I32(1))
        return _stage_any(
            alo, ahi, s, t, lane_ids, 2, I32(LANES), tbl, q, butterfly
        )

    def _row_static_fwd(alo, ahi, s: int):
        """Row stage with a COMPILE-TIME stage index: pure sublane
        regrouping via reshapes (the grid kernel's formulation) instead of
        dynamic sublane rotates — enabled by ALOHA_STREAM_ROWMODE=static."""
        tr = rows >> (s + 1)
        shp = (bp, rows // (2 * tr), 2, tr, LANES)
        vlo = alo.reshape(shp)
        vhi = ahi.reshape(shp)
        w = [ref[s][None].reshape((1,) + shp[1:])[:, :, 0] for ref in tbl]
        (tlo, thi), (blo, bhi) = K._ct_butterfly(
            vlo[:, :, 0], vhi[:, :, 0], vlo[:, :, 1], vhi[:, :, 1],
            w[0], w[1], w[2], w[3], q,
        )
        alo = jnp.stack([tlo, blo], axis=2).reshape(bp, rows, LANES)
        ahi = jnp.stack([thi, bhi], axis=2).reshape(bp, rows, LANES)
        return alo, ahi

    _rowmode = os.environ.get("ALOHA_STREAM_ROWMODE", "dyn")

    def forward(alo, ahi):
        if _rowmode == "static":
            for s in range(log_rows):
                alo, ahi = _row_static_fwd(alo, ahi, s)
        else:
            alo, ahi = _fori(
                0, log_rows,
                lambda s, c: row_stage(s, c, K._ct_butterfly), (alo, ahi),
            )
        alo, ahi = _fori(
            log_rows, logn,
            lambda s, c: lane_stage(s, c, K._ct_butterfly), (alo, ahi),
        )
        alo, ahi = K._condsub(alo, ahi, 2 * q)
        return K._condsub(alo, ahi, q)

    def inverse(alo, ahi):
        log_lanes = LANES.bit_length() - 1

        def inv_lane(s, c):
            alo, ahi = c
            t = I32(1) << s
            return _stage_any(
                alo, ahi, s, t, lane_ids, 2, I32(LANES), tbl, q,
                K._gs_butterfly,
            )

        def inv_row(s, c):
            alo, ahi = c
            tr = (I32(1) << s) // I32(LANES)
            return _stage_any(
                alo, ahi, s, tr, row_ids, 1, I32(rows), tbl, q,
                K._gs_butterfly,
            )

        alo, ahi = _fori(0, log_lanes, inv_lane, (alo, ahi))
        alo, ahi = _fori(log_lanes, logn, inv_row, (alo, ahi))
        return K._condsub(alo, ahi, q)

    return forward, inverse


def _stream_body(
    inverse: bool, q: int, nchunks: int, bp: int, rows: int,
    wl, wh, sl, sh, xlo, xhi, olo, ohi,
):
    logn = (rows * LANES).bit_length() - 1
    fwd, inv = _make_stage_loops((wl, wh, sl, sh), q, rows, bp, logn)
    stages = inv if inverse else fwd

    def inner(ilo, ihi, qlo, qhi, sem_in, sem_out):
        def in_copy(slot, c):
            return [
                pltpu.make_async_copy(
                    src.at[pl.ds(c * np.int32(bp), bp)], dst.at[slot],
                    sem_in.at[slot, np.int32(p)],
                )
                for p, (src, dst) in enumerate(((xlo, ilo), (xhi, ihi)))
            ]

        def out_copy(slot, c):
            return [
                pltpu.make_async_copy(
                    src.at[slot], dst.at[pl.ds(c * np.int32(bp), bp)],
                    sem_out.at[slot, np.int32(p)],
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

    pl.run_scoped(
        inner,
        ilo=pltpu.VMEM((2, bp, rows, LANES), jnp.uint32),
        ihi=pltpu.VMEM((2, bp, rows, LANES), jnp.uint32),
        qlo=pltpu.VMEM((2, bp, rows, LANES), jnp.uint32),
        qhi=pltpu.VMEM((2, bp, rows, LANES), jnp.uint32),
        sem_in=pltpu.SemaphoreType.DMA((2, 2)),
        sem_out=pltpu.SemaphoreType.DMA((2, 2)),
    )


@functools.partial(
    jax.jit, static_argnames=("q", "root", "inverse", "n", "bp", "nchunks")
)
def _stream_call_planes(alo, ahi, *, q, root, inverse, n, bp, nchunks):
    rows = n // LANES
    tables = [jnp.asarray(t) for t in K._tables_np(n, root, q, inverse)]
    body = functools.partial(_stream_body, inverse, q, nchunks, bp, rows)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pltpu.ANY)
    with jax.enable_x64(False):
        call = pl.pallas_call(
            body,
            in_specs=[vmem] * 4 + [hbm] * 2,
            out_specs=[hbm] * 2,
            out_shape=[
                jax.ShapeDtypeStruct(alo.shape, jnp.uint32)
            ] * 2,
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                # the default 16 MiB scoped-vmem budget forces spills with
                # chunked double-buffering; v5e has far more physical VMEM
                vmem_limit_bytes=int(
                    os.environ.get("ALOHA_STREAM_VMEM", str(100 * 2**20))
                ),
            ),
        )
        return call(*tables, alo, ahi)


def _chunking(nb: int):
    bp = int(os.environ.get("ALOHA_STREAM_BP", "8"))
    while nb % bp:
        bp //= 2
    return bp, nb // bp


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
