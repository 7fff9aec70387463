"""Probe: dynamic-shift pltpu.roll on the SUBLANE axis (axis 0) inside a
fori_loop.  If this works, row stages can also run under a loop and the
streaming NTT body shrinks to two tiny loops."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys, time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, L = 64, 128

def body(x_ref, o_ref):
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (R, L), 0)
    a = x_ref[...]

    def stage(s, a):
        t = jnp.int32(R) >> (s + jnp.int32(1))   # 32, 16, 8, ...
        bit = (row_ids & t) != 0
        fwd = pltpu.roll(a, t, 0)
        bwd = pltpu.roll(a, jnp.int32(R) - t, 0)
        p = jnp.where(bit, bwd, fwd)
        u = jnp.where(bit, p, a)
        v = jnp.where(bit, a, p)
        return jnp.where(bit, u - v, u + v)

    o_ref[...] = jax.lax.fori_loop(jnp.int32(0), jnp.int32(6), stage, a)

with jax.enable_x64(False):
    call = pl.pallas_call(
        body,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, L), jnp.uint32),
    )
    x = jnp.asarray(np.random.default_rng(1).integers(0, 1 << 20, size=(R, L), dtype=np.uint32))
    t0 = time.perf_counter()
    out = np.asarray(jax.jit(call)(x))
    dt = time.perf_counter() - t0

a = np.asarray(x).copy()
ids = np.arange(R)[:, None].repeat(L, 1)
for s in range(6):
    t = R >> (s + 1)
    bit = (ids & t) != 0
    fwd = np.roll(a, t, 0); bwd = np.roll(a, -t, 0)
    p = np.where(bit, bwd, fwd)
    u = np.where(bit, p, a); v = np.where(bit, a, p)
    a = np.where(bit, u - v, u + v)
ok = np.array_equal(a, out)
print(f"probe_dynsub: compiled+ran in {dt:.0f}s, bitexact={ok}", flush=True)
sys.exit(0 if ok else 1)
