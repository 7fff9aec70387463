import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys, time, functools
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from aloha_tpu.ops import ntt_pallas as K
from aloha_tpu.config import DEFAULT_CONFIG as CFG

NSTAGES = int(sys.argv[1]) if len(sys.argv) > 1 else 4
NB, R, L, BP = 32, 64, 128, 8
NCH = NB // BP
q, psi = CFG.moduli[0], CFG.psi[0]
tbls = [jnp.asarray(t) for t in K._tables_np(CFG.n, psi, q, False)]

def body(wl, wh, sl, sh, xlo, xhi, olo, ohi):
    def inner(ilo, ihi, qlo, qhi, sem_in, sem_out):
        def copies(srcs, dsts, slot, c, sems, to_scratch):
            out = []
            for p, (s_, d_) in enumerate(zip(srcs, dsts)):
                if to_scratch:
                    out.append(pltpu.make_async_copy(
                        s_.at[pl.ds(c * np.int32(BP), BP)], d_.at[slot],
                        sems.at[slot, np.int32(p)]))
                else:
                    out.append(pltpu.make_async_copy(
                        s_.at[slot], d_.at[pl.ds(c * np.int32(BP), BP)],
                        sems.at[slot, np.int32(p)]))
            return out
        def in_copy(slot, c): return copies((xlo, xhi), (ilo, ihi), slot, c, sem_in, True)
        def out_copy(slot, c): return copies((qlo, qhi), (olo, ohi), slot, c, sem_out, False)
        for d in in_copy(np.int32(0), np.int32(0)): d.start()
        TWO, ONE = np.int32(2), np.int32(1)
        roll = K._make_roll(False)
        lane_ids = jax.lax.broadcasted_iota(jnp.int32, (BP*R, L), 1)
        def step(c, _):
            cur = c % TWO; nxt = (c + ONE) % TWO
            @pl.when(c + ONE < np.int32(NCH))
            def _():
                for d in in_copy(nxt, c + ONE): d.start()
            for d in in_copy(cur, c): d.wait()
            alo = ilo[cur].reshape(BP*R, L)
            ahi = ihi[cur].reshape(BP*R, L)
            def tile(w):
                return jnp.broadcast_to(w[None], (BP, R, L)).reshape(BP*R, L)
            # real lane-stage Harvey butterflies, NSTAGES of them
            for s in range(6, 6 + NSTAGES):
                t = (R * L) >> (s + 1)
                bit = (lane_ids & t) != 0
                plo = K._partner(alo, bit, t, -1, roll)
                phi = K._partner(ahi, bit, t, -1, roll)
                ulo = jnp.where(bit, plo, alo); uhi = jnp.where(bit, phi, ahi)
                vlo = jnp.where(bit, alo, plo); vhi = jnp.where(bit, ahi, phi)
                (tlo, thi), (blo, bhi) = K._ct_butterfly(
                    ulo, uhi, vlo, vhi, tile(wl[s]), tile(wh[s]),
                    tile(sl[s]), tile(sh[s]), q)
                alo = jnp.where(bit, blo, tlo); ahi = jnp.where(bit, bhi, thi)
            @pl.when(c >= TWO)
            def _():
                for d in out_copy(cur, c - TWO): d.wait()
            qlo[cur] = alo.reshape(BP, R, L)
            qhi[cur] = ahi.reshape(BP, R, L)
            for d in out_copy(cur, c): d.start()
            return 0
        jax.lax.fori_loop(np.int32(0), np.int32(NCH), step, 0)
        for back in (2, 1):
            cc = NCH - back
            if cc >= 0:
                for d in out_copy(np.int32(cc % 2), np.int32(cc)): d.wait()
    pl.run_scoped(inner,
        ilo=pltpu.VMEM((2, BP, R, L), jnp.uint32),
        ihi=pltpu.VMEM((2, BP, R, L), jnp.uint32),
        qlo=pltpu.VMEM((2, BP, R, L), jnp.uint32),
        qhi=pltpu.VMEM((2, BP, R, L), jnp.uint32),
        sem_in=pltpu.SemaphoreType.DMA((2, 2)),
        sem_out=pltpu.SemaphoreType.DMA((2, 2)))

with jax.enable_x64(False):
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    call = pl.pallas_call(body,
        in_specs=[vmem]*4 + [hbm]*2, out_specs=[hbm]*2,
        out_shape=[jax.ShapeDtypeStruct((NB, R, L), jnp.uint32)]*2,
        compiler_params=pltpu.CompilerParams(has_side_effects=True))
    f = jax.jit(lambda a, b: call(*tbls, a, b))
    rng = np.random.default_rng(0)
    xlo = jnp.asarray(rng.integers(0, 1<<31, size=(NB,R,L), dtype=np.uint64).astype(np.uint32))
    xhi = jnp.asarray(rng.integers(0, 1<<27, size=(NB,R,L), dtype=np.uint64).astype(np.uint32))
    t0=time.perf_counter()
    out = f(xlo, xhi)
    v = np.asarray(out[0])
    print(f"stages={NSTAGES}: compiled+ran {time.perf_counter()-t0:.0f}s nonzero={v.any()}", flush=True)
