"""Single-launch streaming NTT: HBM-resident batch, manual DMA pipeline.

STATUS: EXPERIMENTAL — traces and lowers correctly, but the hosted
remote-compile service (tpu_compile_helper) crashes on the manual-DMA
body without diagnostics; not yet wired into the dispatcher.  Tracked in
docs/DESIGN.md (performance roadmap item 1).

The grid-per-poly kernel in `ntt_pallas` pays ~10us of block-copy/step
machinery per polynomial; this variant launches ONCE over the whole batch
and double-buffers chunks through VMEM with explicit async copies — the
TPU analogue of the reference's overlapped DMA/VP pipelining (independent
FSMs with a poly_id handshake, reference: SURVEY.md 2g item 5):

    start in-DMA(chunk 0)
    for c in chunks:
        start in-DMA(c+1)          # overlap next load with compute
        wait  in-DMA(c)
        compute 13 stages on chunk c (VMEM)
        wait  out-DMA(c-2)         # slot reuse guard
        start out-DMA(c)
    drain

Twiddle tables stay resident in VMEM for the entire launch.
"""

from __future__ import annotations

import functools

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

#: polys per VMEM chunk (2 slots x 2 planes x in/out = 16*bp KiB each)
CHUNK = 8


def _stream_body(
    stages_fn, nchunks: int, bp: int, rows: int,
    wl, wh, sl, sh, xlo, xhi, olo, ohi,
):
    """Kernel body: tables in VMEM, x/o in HBM (ANY); manual DMA pipeline."""

    def inner(ilo, ihi, qlo, qhi, sem_in, sem_out):
        def _i32(v):
            return np.int32(v) if isinstance(v, int) else v

        def in_copy(slot, c):
            slot, c = _i32(slot), _i32(c)
            return [
                pltpu.make_async_copy(
                    src.at[pl.ds(c * bp, bp)], dst.at[slot],
                    sem_in.at[slot, np.int32(p)],
                )
                for p, (src, dst) in enumerate(((xlo, ilo), (xhi, ihi)))
            ]

        def out_copy(slot, c):
            slot, c = _i32(slot), _i32(c)
            return [
                pltpu.make_async_copy(
                    src.at[slot], dst.at[pl.ds(c * bp, bp)],
                    sem_out.at[slot, np.int32(p)],
                )
                for p, (src, dst) in enumerate(((qlo, olo), (qhi, ohi)))
            ]

        for d in in_copy(0, 0):
            d.start()

        TWO = np.int32(2)
        ONE = np.int32(1)

        def step(c, _):
            cur = c % TWO
            nxt = (c + ONE) % TWO

            @pl.when(c + ONE < np.int32(nchunks))
            def _():
                for d in in_copy(nxt, c + ONE):
                    d.start()

            for d in in_copy(cur, c):
                d.wait()

            alo, ahi = stages_fn(
                ilo[cur].reshape(bp * rows, LANES),
                ihi[cur].reshape(bp * rows, LANES),
                wl, wh, sl, sh,
            )

            # before writing into the out slot, ensure its previous DMA
            # (chunk c-2) has drained
            @pl.when(c >= TWO)
            def _():
                for d in out_copy(cur, c - TWO):
                    d.wait()

            qlo[cur] = alo.reshape(bp, rows, LANES)
            qhi[cur] = ahi.reshape(bp, rows, LANES)
            for d in out_copy(cur, c):
                d.start()
            return 0

        # i32 bounds: Mosaic requires i32 memref indices and the
        # counter dtype follows the bounds
        jax.lax.fori_loop(np.int32(0), np.int32(nchunks), step, 0)
        # drain the final (up to) two outstanding output copies
        for back in (2, 1):
            c = nchunks - back
            if c >= 0:
                for d in out_copy(c % 2, c):
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


def _call_stream(stages, a, q, root, inverse):
    import sys

    # the unrolled 13-stage body inside fori_loop nests deeply during trace
    if sys.getrecursionlimit() < 20000:
        sys.setrecursionlimit(20000)
    n = a.shape[-1]
    rows = n // LANES
    batch = a.shape[:-1]
    nb = int(np.prod(batch)) if batch else 1
    logn = n.bit_length() - 1
    bp = CHUNK
    while nb % bp:
        bp //= 2
    nchunks = nb // bp

    w_lo, w_hi, s_lo, s_hi = (
        jnp.asarray(t) for t in K._tables_np(n, root, q, inverse)
    )
    a3 = a.reshape(nb, rows, LANES)
    alo = (a3 & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    ahi = (a3 >> jnp.uint64(32)).astype(jnp.uint32)

    stages_fn = functools.partial(
        stages, q=q, rows=rows, bp=bp, interpret=False
    )
    body = functools.partial(_stream_body, stages_fn, nchunks, bp, rows)

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pltpu.ANY)
    with jax.enable_x64(False):
        call = pl.pallas_call(
            body,
            in_specs=[vmem] * 4 + [hbm] * 2,
            out_specs=[hbm] * 2,
            out_shape=[
                jax.ShapeDtypeStruct((nb, rows, LANES), jnp.uint32)
            ] * 2,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )
    # the kernel body traces lazily at invocation: keep that trace in
    # 32-bit mode too (Mosaic rejects i64 indices; x64 tracing of the
    # loop counter also trips a JAX promotion recursion)
    with jax.enable_x64(False):
        olo, ohi = call(w_lo, w_hi, s_lo, s_hi, alo, ahi)
    out = olo.astype(jnp.uint64) | (ohi.astype(jnp.uint64) << jnp.uint64(32))
    return out.reshape(batch + (n,))


def ntt(a, q: int, psi: int):
    """Streaming forward NTT over the last axis (batch in HBM)."""
    return _call_stream(K._ntt_stages, a, q, psi, False)


def intt(a, q: int, ipsi: int):
    """Streaming inverse NTT over the last axis."""
    return _call_stream(K._intt_stages, a, q, ipsi, True)
