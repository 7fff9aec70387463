"""Same-window A/B: fused-chain MXU NTT with and without lazy mode.

Compiles all four (variant x K) programs first, then interleaves the
timed trials round-robin so tunnel-window drift hits both arms equally.
Marginal per variant = K-slope on the min times.

Env: NB (default 256), K0/K1 (default 32/128), TRIALS (default 8),
     ALOHA_STREAM_BP.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os, time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from aloha_tpu.config import DEFAULT_CONFIG as CFG
from aloha_tpu import ntt_np
from aloha_tpu.ops import ntt_mxu

NB = int(os.environ.get("NB", "256"))
K0 = int(os.environ.get("K0", "32"))
K1 = int(os.environ.get("K1", "128"))
TRIALS = int(os.environ.get("TRIALS", "8"))
q, psi = CFG.moduli[0], CFG.psi[0]
n = CFG.n
rng = np.random.default_rng(0)
a = rng.integers(0, q, size=(NB, n), dtype=np.uint64)
alo = jnp.asarray((a & 0xFFFFFFFF).astype(np.uint32).reshape(NB, n // 128, 128))
ahi = jnp.asarray((a >> np.uint64(32)).astype(np.uint32).reshape(NB, n // 128, 128))

fns = {}
for lazy in ("0", "1"):
    os.environ["ALOHA_MXU_CHAIN_LAZY"] = lazy
    for K in (K0, K1):
        f = jax.jit(lambda l, h, K=K: ntt_mxu.ntt_chain_planes(l, h, q, psi, K))
        t0 = time.perf_counter()
        out = f(alo, ahi)
        _ = np.asarray(out[0][0, 0, 0])
        print(f"lazy={lazy} K={K}: compile+run {time.perf_counter()-t0:.1f}s",
              flush=True)
        # bit-exactness of this variant at this K (2 polys)
        got = (np.asarray(out[0][:2]).astype(np.uint64)
               | (np.asarray(out[1][:2]).astype(np.uint64) << np.uint64(32)))
        want = a[:2]
        for _ in range(K):
            want = ntt_np.ntt(want, q, psi)
        assert np.array_equal(got.reshape(2, n), want), (lazy, K)
        fns[(lazy, K)] = f

best = {k: 1e9 for k in fns}
for t in range(TRIALS):
    for key, f in fns.items():
        t0 = time.perf_counter()
        out = f(alo, ahi)
        _ = np.asarray(out[0][0, 0, 0])
        best[key] = min(best[key], time.perf_counter() - t0)
print({k: round(v * 1e3, 1) for k, v in best.items()}, flush=True)
for lazy in ("0", "1"):
    marg = (best[(lazy, K1)] - best[(lazy, K0)]) / (NB * (K1 - K0)) * 1e6
    print(f"lazy={lazy}: marginal {marg:.3f} us/poly -> "
          f"{1e6/marg:,.0f} NTT/s".replace(",", "_"), flush=True)
