"""Cost decomposition of the in-kernel stage loop (3D layout).

Variants (lane stages only, REPS transforms on resident data):
  full-N    : N loop iterations of the real lane stage (dynamic everything)
  statT-N   : same but table row fixed to ref[0] (no dynamic table load)
  statS-N   : same but shift fixed t=16 (no dynamic roll shift)
  nobfly-N  : rolls + selects only, no butterfly arithmetic
"""
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
rows, LANES, BP, REPS = 64, 128, 8, 20
I32 = jnp.int32
tbls = [jnp.asarray(t) for t in K._tables_np(CFG.n, psi, q, False)]

def make_body(mode, nstages):
    def body(wl, wh, sl, sh, x_lo, x_hi, o_lo, o_hi):
        lane_ids = jax.lax.broadcasted_iota(I32, (1, rows, LANES), 2)

        def stage(s, carry):
            alo, ahi = carry
            t = I32(rows * LANES) >> (s % I32(7) + I32(7))  # 64..1
            if mode == "statS":
                t = I32(16)
            bit = (lane_ids & t) != 0
            plo = S._dyn_partner(alo, bit, t, 2, I32(LANES))
            phi = S._dyn_partner(ahi, bit, t, 2, I32(LANES))
            ulo = jnp.where(bit, plo, alo)
            uhi = jnp.where(bit, phi, ahi)
            vlo = jnp.where(bit, alo, plo)
            vhi = jnp.where(bit, ahi, phi)
            if mode == "nobfly":
                return ulo + vlo, uhi + vhi
            si = I32(0) if mode == "statT" else (s % I32(13))
            w = (ref[si][None] for ref in (wl, wh, sl, sh))
            (tlo, thi), (blo, bhi) = K._ct_butterfly(ulo, uhi, vlo, vhi, *w, q)
            return jnp.where(bit, blo, tlo), jnp.where(bit, bhi, thi)

        def rep(i, c):
            return jax.lax.fori_loop(I32(0), I32(nstages), stage, c)

        alo, ahi = jax.lax.fori_loop(I32(0), I32(REPS), rep,
                                     (x_lo[...], x_hi[...]))
        o_lo[...] = alo
        o_hi[...] = ahi
    return body

rng = np.random.default_rng(0)
xlo = jnp.asarray(rng.integers(0, 1 << 31, size=(BP, rows, LANES), dtype=np.uint64).astype(np.uint32))
xhi = jnp.asarray(rng.integers(0, 1 << 27, size=(BP, rows, LANES), dtype=np.uint64).astype(np.uint32))

for mode in ("full", "statT", "statS", "nobfly"):
    for nstages in (2, 13):
        with jax.enable_x64(False):
            call = pl.pallas_call(
                make_body(mode, nstages),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
                out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_shape=[jax.ShapeDtypeStruct((BP, rows, LANES), jnp.uint32)] * 2,
            )
            f = jax.jit(lambda a, b: call(*tbls, a, b))
        r = f(xlo, xhi)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        iters = 5
        for _ in range(iters):
            r = f(xlo, xhi)
            _ = np.asarray(r[0][0, 0, 0])
        dt = (time.perf_counter() - t0) / iters
        per_stage = dt / (REPS * nstages)
        print(f"{mode} n={nstages}: {dt*1e3:.2f} ms -> {per_stage*1e6:.2f} us/stage"
              f" ({dt/REPS*1e6:.1f} us/rep)", flush=True)
