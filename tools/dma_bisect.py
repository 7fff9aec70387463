"""Bisect: does a minimal manual-DMA pallas kernel compile on this stack?"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys, time, functools
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

mode = sys.argv[1]
NB, R, L = 16, 64, 128
BP = 8
def body(x_ref, o_ref):
    def inner(buf, sem_in, sem_out):
        n = np.int32(NB // BP)
        def step(c, _):
            din = pltpu.make_async_copy(
                x_ref.at[pl.ds(c * np.int32(BP), BP)], buf, sem_in)
            din.start(); din.wait()
            v = buf[...]
            if mode == "compute":
                v = v * np.uint32(3) + np.uint32(1)
            buf[...] = v
            dout = pltpu.make_async_copy(
                buf, o_ref.at[pl.ds(c * np.int32(BP), BP)], sem_out)
            dout.start(); dout.wait()
            return 0
        jax.lax.fori_loop(np.int32(0), n, step, 0)
    pl.run_scoped(inner,
        buf=pltpu.VMEM((BP, R, L), jnp.uint32),
        sem_in=pltpu.SemaphoreType.DMA(()),
        sem_out=pltpu.SemaphoreType.DMA(()))

with jax.enable_x64(False):
    call = pl.pallas_call(body,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((NB, R, L), jnp.uint32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True))
    f = jax.jit(lambda x: call(x))
    x = jnp.arange(NB*R*L, dtype=jnp.uint32).reshape(NB, R, L)
    t0=time.perf_counter()
    out = np.asarray(f(x))
    ok = (out == (np.asarray(x)*3+1 if mode=="compute" else np.asarray(x))).all()
    print(f"{mode}: compiled+ran in {time.perf_counter()-t0:.0f}s, correct={ok}", flush=True)

# Appended bisect stages (run: python tools/dma_bisect.py <mode>)
# mode "doublebuf": 2-slot double buffering + (2,2) semaphore arrays +
# traced-slot scratch indexing + ref[traced] stores — the exact control
# structure of ops/ntt_stream.py with trivial compute.
