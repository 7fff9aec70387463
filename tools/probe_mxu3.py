"""Probe 3: matmul rates with the K-slope protocol (dispatch removed)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

M, K, N = 4096, 512, 512
rng = np.random.default_rng(0)


def slope(name, x, w, dot, k_lo=8, k_hi=64):
    res = {}
    for KCH in (k_lo, k_hi):
        def chain(x, KCH=KCH):
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
        for _i in range(6):
            t0 = time.perf_counter()
            r = f(x)
            _ = np.asarray(jax.tree.leaves(r)[0][0, 0])
            times.append(time.perf_counter() - t0)
        res[KCH] = min(times)
    per = (res[k_hi] - res[k_lo]) / (k_hi - k_lo)
    macs = M * K * N
    print(f"{name}: {per*1e6:.1f} us/matmul marginal, "
          f"{macs/per/1e12:.1f} T-MACs/s  "
          f"(K={k_lo}:{res[k_lo]*1e3:.1f}ms K={k_hi}:{res[k_hi]*1e3:.1f}ms)")


def main():
    print(jax.devices())
    xi8 = jnp.asarray(rng.integers(-128, 128, size=(M, K), dtype=np.int8))
    wi8 = jnp.asarray(rng.integers(-128, 128, size=(K, N), dtype=np.int8))
    slope("i8.i8->i32", xi8, wi8,
          lambda x, w: jax.lax.dot_general(
              x, w, (((1,), (0,)), ((), ())),
              preferred_element_type=jnp.int32)[:, :K].astype(jnp.int8))
    xbf = jnp.asarray(rng.standard_normal((M, K))).astype(jnp.bfloat16)
    wbf = jnp.asarray(rng.standard_normal((K, N))).astype(jnp.bfloat16)
    slope("bf16.bf16->f32", xbf, wbf,
          lambda x, w: (jax.lax.dot_general(
              x, w, (((1,), (0,)), ((), ())),
              preferred_element_type=jnp.float32)[:, :K]
              * jnp.float32(1e-3)).astype(jnp.bfloat16))


if __name__ == "__main__":
    main()
