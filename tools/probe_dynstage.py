"""Probe: can a SINGLE lane-stage body run under an in-kernel fori_loop
with a TRACED stage index (dynamic pltpu.roll shift, dynamic twiddle-table
load, dynamic partner bitmask)?  This is the compile-time fix direction
from tools/dma_bisect_stages.py: 13 unrolled stages blow up the remote
Mosaic compile; a loop body traced once should not.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys, time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, L = 64, 128
LOGN = 13

def body(w_ref, x_ref, o_ref):
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    a = x_ref[...]

    def stage(s, a):
        t = jnp.int32((R * L)) >> (s + jnp.int32(1))      # traced distance
        w = w_ref[s]                                       # dynamic (64,128) load
        bit = (lane_ids & t) != 0
        fwd = pltpu.roll(a, t, 1)                          # dynamic lane roll
        bwd = pltpu.roll(a, jnp.int32(L) - t, 1)
        p = jnp.where(bit, bwd, fwd)                       # partner value
        u = jnp.where(bit, p, a)
        v = jnp.where(bit, a, p)
        top = u + v * w
        bot = u - v * w
        return jnp.where(bit, bot, top)

    a = jax.lax.fori_loop(jnp.int32(6), jnp.int32(LOGN), stage, a)
    o_ref[...] = a

with jax.enable_x64(False):
    call = pl.pallas_call(
        body,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, L), jnp.uint32),
    )
    w = jnp.asarray(np.random.default_rng(0).integers(1, 97, size=(LOGN, R, L), dtype=np.uint32))
    x = jnp.asarray(np.random.default_rng(1).integers(0, 1 << 20, size=(R, L), dtype=np.uint32))
    t0 = time.perf_counter()
    out = np.asarray(jax.jit(lambda w, x: call(w, x))(w, x))
    dt = time.perf_counter() - t0

# CPU oracle of the same arithmetic (plain uint32 wraparound)
a = np.asarray(x).copy()
ids = np.arange(L)[None, :].repeat(R, 0)
wn = np.asarray(w)
for s in range(6, LOGN):
    t = (R * L) >> (s + 1)
    bit = (ids & t) != 0
    fwd = np.roll(a, t, 1); bwd = np.roll(a, -(t), 1)
    p = np.where(bit, bwd, fwd)
    u = np.where(bit, p, a); v = np.where(bit, a, p)
    top = u + v * wn[s]; bot = u - v * wn[s]
    a = np.where(bit, bot, top)
ok = np.array_equal(a, out)
print(f"probe_dynstage: compiled+ran in {dt:.0f}s, bitexact_vs_numpy={ok}", flush=True)
sys.exit(0 if ok else 1)
