"""Pure-compute cost of the current streaming stages (no DMA): REPS
forward transforms on resident VMEM data, marginal over REPS."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os, sys, time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aloha_tpu.config import DEFAULT_CONFIG as CFG
from aloha_tpu.ops import ntt_pallas as K
from aloha_tpu.ops import ntt_stream as S

q, psi = CFG.moduli[0], CFG.psi[0]
rows, LANES = 64, 128
BP = int(os.environ.get("BP", "4"))
tbls = [jnp.asarray(t) for t in S._tables6_np(CFG.n, psi, q, False)]

def make(reps):
    def body(wl, wh, s0, s1, s2, s3, xl, xh, ol, oh):
        fwd, _ = S._make_stage_loops((wl, wh, s0, s1, s2, s3), q, rows, BP, 13)
        def rep(i, c):
            return fwd(*c)
        alo, ahi = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(reps), rep, (xl[...], xh[...]))
        ol[...] = alo
        oh[...] = ahi
    with jax.enable_x64(False):
        call = pl.pallas_call(
            body,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_shape=[jax.ShapeDtypeStruct((BP, rows, LANES), jnp.uint32)] * 2,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20),
        )
        return jax.jit(lambda a, b: call(*tbls, a, b))

rng = np.random.default_rng(0)
xlo = jnp.asarray(rng.integers(0, 1 << 31, size=(BP, rows, LANES), dtype=np.uint64).astype(np.uint32))
xhi = jnp.asarray(rng.integers(0, 1 << 27, size=(BP, rows, LANES), dtype=np.uint64).astype(np.uint32))

res = {}
R0 = int(os.environ.get('R0', '20')); R1 = int(os.environ.get('R1', '120'))
for reps in (R0, R1):
    f = make(reps)
    r = f(xlo, xhi)
    _ = np.asarray(r[0][0, 0, 0])
    times = []
    for _i in range(5):
        t0 = time.perf_counter()
        r = f(xlo, xhi)
        _ = np.asarray(r[0][0, 0, 0])
        times.append(time.perf_counter() - t0)
    res[reps] = min(times)
    print(f"reps={reps}: min {res[reps]*1e3:.2f} ms", flush=True)
per_poly = (res[R1] - res[R0]) / ((R1 - R0) * BP)
print(f"BP={BP} compute-only: {per_poly*1e6:.3f} us/poly", flush=True)
