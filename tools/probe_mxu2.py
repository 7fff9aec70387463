"""Probe 2: which matmul dtype/path actually hits the MXU fast on this
v5e through the remote-compile tunnel.

Variants (all XLA-level jit, chained K times, scalar readback):
  i8xi8->i32, bf16xbf16->f32, f32xf32->f32, i32 (upcast) matmul
Shapes: (4096, 512) @ (512, 512).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

M, K, N = 4096, 512, 512
KCH = 16
rng = np.random.default_rng(0)


def bench(name, make_x, make_w, dot):
    x = jnp.asarray(make_x())
    w = jnp.asarray(make_w())

    def chain(x):
        for _ in range(KCH):
            x = dot(x, w)
        return x

    f = jax.jit(chain)
    try:
        r = f(x)
        _ = np.asarray(jax.tree.leaves(r)[0][0, 0])
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {e}")
        return
    times = []
    for _i in range(5):
        t0 = time.perf_counter()
        r = f(x)
        _ = np.asarray(jax.tree.leaves(r)[0][0, 0])
        times.append(time.perf_counter() - t0)
    tmin = min(times)
    macs = M * K * N * KCH
    print(f"{name}: {tmin*1e3/KCH:.3f} ms/matmul, {macs/tmin/1e12:.1f} T-MACs/s")


def main():
    print(jax.devices())

    bench(
        "i8.i8->i32",
        lambda: rng.integers(-128, 128, size=(M, K), dtype=np.int8),
        lambda: rng.integers(-128, 128, size=(K, N), dtype=np.int8),
        lambda x, w: jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )[:, :K].astype(jnp.int8),
    )
    bench(
        "bf16.bf16->f32",
        lambda: rng.standard_normal((M, K)).astype(np.float32),
        lambda: rng.standard_normal((K, N)).astype(np.float32),
        lambda x, w: jax.lax.dot_general(
            x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[:, :K] * jnp.float32(1e-3),
    )
    bench(
        "f32.f32->f32",
        lambda: rng.standard_normal((M, K)).astype(np.float32),
        lambda: rng.standard_normal((K, N)).astype(np.float32),
        lambda x, w: jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[:, :K] * jnp.float32(1e-3),
    )
    bench(
        "i32.i32->i32",
        lambda: rng.integers(-128, 128, size=(M, K), dtype=np.int32),
        lambda: rng.integers(-128, 128, size=(K, N), dtype=np.int32),
        lambda x, w: jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )[:, :K] & jnp.int32(127),
    )


if __name__ == "__main__":
    main()
