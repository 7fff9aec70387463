import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NB, R, L, BP = 32, 64, 128, 8
NCH = NB // BP

def body(t_ref, x_ref, o_ref):
    def inner(ibuf, obuf, sem_in, sem_out):
        def in_copy(slot, c):
            return pltpu.make_async_copy(
                x_ref.at[pl.ds(c * np.int32(BP), BP)], ibuf.at[slot],
                sem_in.at[slot, np.int32(0)])
        def out_copy(slot, c):
            return pltpu.make_async_copy(
                obuf.at[slot], o_ref.at[pl.ds(c * np.int32(BP), BP)],
                sem_out.at[slot, np.int32(0)])
        in_copy(np.int32(0), np.int32(0)).start()
        TWO, ONE = np.int32(2), np.int32(1)
        def step(c, _):
            cur = c % TWO; nxt = (c + ONE) % TWO
            @pl.when(c + ONE < np.int32(NCH))
            def _():
                in_copy(nxt, c + ONE).start()
            in_copy(cur, c).wait()
            # read the OUTER VMEM input ref inside run_scoped + fori:
            acc = ibuf[cur]
            for s in range(13):
                acc = acc + t_ref[s][None]
            @pl.when(c >= TWO)
            def _():
                out_copy(cur, c - TWO).wait()
            obuf[cur] = acc
            out_copy(cur, c).start()
            return 0
        jax.lax.fori_loop(np.int32(0), np.int32(NCH), step, 0)
        for back in (2, 1):
            cc = NCH - back
            if cc >= 0:
                out_copy(np.int32(cc % 2), np.int32(cc)).wait()
    pl.run_scoped(inner,
        ibuf=pltpu.VMEM((2, BP, R, L), jnp.uint32),
        obuf=pltpu.VMEM((2, BP, R, L), jnp.uint32),
        sem_in=pltpu.SemaphoreType.DMA((2, 2)),
        sem_out=pltpu.SemaphoreType.DMA((2, 2)))

with jax.enable_x64(False):
    call = pl.pallas_call(body,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((NB, R, L), jnp.uint32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True))
    f = jax.jit(lambda t, x: call(t, x))
    t = jnp.ones((13, R, L), jnp.uint32)
    x = jnp.arange(NB*R*L, dtype=jnp.uint32).reshape(NB, R, L)
    t0=time.perf_counter()
    out = np.asarray(f(t, x))
    ok = (out == np.asarray(x) + 13).all()
    print(f"tblread: compiled+ran {time.perf_counter()-t0:.0f}s correct={ok}", flush=True)
