"""Probe: int8 MXU matmul rate on the v5e through Pallas.

Measures the core loop of the planned 4-step MXU NTT: 64 digit-pair
matmuls (8 data digits x 8 matrix digits) accumulated into 8 int32
diagonal buffers, for the step-3 shape (bp*64, 128) @ (128, 128).

Run:  python tools/probe_mxu.py
Env:  BP (polys/chunk, default 32), K (chained kernel calls, default 8)
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os, time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BP = int(os.environ.get("BP", "32"))
KCH = int(os.environ.get("K", "8"))
DX = 8   # data digits
DM = 8   # matrix digits
M = BP * 64
N = 128


def kernel(x_ref, w_ref, o_ref):
    # x: (DX, M, 128) i8 digit planes; w: (DM, 128, 128) i8 digit planes
    # accumulate e_j = sum_k x_k @ w[(j,k) pair]  (j = 0..7, k = 0..7 with
    # the pair's matrix plane indexed j to mimic the folded-weight scheme)
    acc = [jnp.zeros((M, N), jnp.int32) for _ in range(8)]
    for k in range(DX):
        xk = x_ref[k]
        for j in range(DM):
            acc[j] = acc[j] + jax.lax.dot_general(
                xk, w_ref[j],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
    # cheap combine so nothing is dead; also produces the next i8 input
    s = acc[0]
    for j in range(1, 8):
        s = s + (acc[j] << jnp.int32(j % 4))
    o_ref[0] = s.astype(jnp.int8)
    for k in range(1, DX):
        o_ref[k] = (s >> jnp.int32(k)).astype(jnp.int8)


def main():
    print(jax.devices())
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-128, 128, size=(DX, M, N), dtype=np.int8))
    w = jnp.asarray(rng.integers(-128, 128, size=(DM, N, N), dtype=np.int8))

    call = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((DX, M, N), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20,
        ),
    )

    res = {}
    for KC in (KCH, KCH * 6):
        def chain(x, KC=KC):
            for _ in range(KC):
                x = call(x, w)
            return x

        with jax.enable_x64(False):
            f = jax.jit(chain)
            r = f(x)
            _ = np.asarray(r[0, 0, 0])
            times = []
            for _i in range(6):
                t0 = time.perf_counter()
                r = f(x)
                _ = np.asarray(r[0, 0, 0])
                times.append(time.perf_counter() - t0)
        res[KC] = min(times)
        print(f"K={KC}: min {res[KC]*1e3:.2f} ms")
    per_call = (res[KCH * 6] - res[KCH]) / (KCH * 5)
    macs = DX * DM * M * N * N
    print(f"marginal per kernel call: {per_call*1e6:.1f} us "
          f"({macs/per_call/1e12:.1f} T-MACs/s, {BP} polys/call "
          f"-> {per_call/BP*1e6:.3f} us/poly for {DX*DM} pair-matmuls)")


if __name__ == "__main__":
    main()
