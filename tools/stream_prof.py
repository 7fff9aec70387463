"""Isolate streaming-kernel cost: time kernels that run ONLY
(a) the 13-stage loops with real butterflies (no DMA, data resident),
(b) the loops with add-only butterflies (no multiplies),
(c) the loops with butterflies but no rolls (partner = self),
on a resident (bp*64, 128) block iterated in-kernel many times."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys, time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aloha_tpu.config import DEFAULT_CONFIG as CFG
from aloha_tpu.ops import ntt_pallas as K
from aloha_tpu.ops import ntt_stream as S

q, psi = CFG.moduli[0], CFG.psi[0]
n = CFG.n
rows, LANES = 64, 128
BP = 8
REPS = 50   # transforms per launch on the resident block
logn = 13

tbls = [jnp.asarray(t) for t in K._tables_np(n, psi, q, False)]

def make_body(mode):
    def body(wl, wh, sl, sh, xlo_ref, xhi_ref, olo_ref, ohi_ref):
        fwd, _ = S._make_stage_loops((wl, wh, sl, sh), q, rows, BP, logn)
        R = BP * rows
        lane_ids = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0) % np.int32(rows)

        def add_stage(axis_ids, axis, size):
            def f(s, c):
                alo, ahi = c
                t = jnp.int32(64) >> (s % jnp.int32(6) + jnp.int32(1))
                bit = (axis_ids & t) != 0
                plo = S._dyn_partner(alo, bit, t, axis, size)
                phi = S._dyn_partner(ahi, bit, t, axis, size)
                return alo + plo, ahi + phi
            return f

        def noroll_fwd(alo, ahi):
            def f(s, c):
                alo, ahi = c
                wl_, wh_, sl_, sh_ = (
                    jnp.broadcast_to(ref[s][None], (BP, rows, LANES)).reshape(R, LANES)
                    for ref in (wl, wh, sl, sh))
                (tlo, thi), (blo, bhi) = K._ct_butterfly(
                    alo, ahi, alo, ahi, wl_, wh_, sl_, sh_, q)
                return tlo, thi
            return jax.lax.fori_loop(jnp.int32(0), jnp.int32(13), f, (alo, ahi))

        def rep(i, c):
            alo, ahi = c
            if mode == "full":
                alo, ahi = fwd(alo, ahi)
            elif mode == "rollsonly":
                alo, ahi = jax.lax.fori_loop(jnp.int32(0), jnp.int32(6),
                                             add_stage(row_ids, 0, jnp.int32(R)), (alo, ahi))
                alo, ahi = jax.lax.fori_loop(jnp.int32(0), jnp.int32(7),
                                             add_stage(lane_ids, 1, jnp.int32(LANES)), (alo, ahi))
            elif mode == "noroll":
                alo, ahi = noroll_fwd(alo, ahi)
            return alo, ahi

        alo, ahi = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(REPS), rep,
            (xlo_ref[...], xhi_ref[...]),
        )
        olo_ref[...] = alo
        ohi_ref[...] = ahi
    return body

rng = np.random.default_rng(0)
xlo = jnp.asarray(rng.integers(0, 1 << 31, size=(BP * rows, LANES), dtype=np.uint64).astype(np.uint32))
xhi = jnp.asarray(rng.integers(0, 1 << 27, size=(BP * rows, LANES), dtype=np.uint64).astype(np.uint32))

for mode in ("full", "rollsonly", "noroll"):
    with jax.enable_x64(False):
        call = pl.pallas_call(
            make_body(mode),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_shape=[jax.ShapeDtypeStruct((BP * rows, LANES), jnp.uint32)] * 2,
        )
        f = jax.jit(lambda a, b: call(*tbls, a, b))
    r = f(xlo, xhi)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    iters = 5
    for _ in range(iters):
        r = f(xlo, xhi)
        _ = np.asarray(r[0][0, 0])
    dt = (time.perf_counter() - t0) / iters
    per_poly = dt / (REPS * BP)
    print(f"{mode}: {dt*1e3:.2f} ms/launch -> {per_poly*1e6:.2f} us/poly-transform", flush=True)
