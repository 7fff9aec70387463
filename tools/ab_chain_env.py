"""Same-window A/B of the fused-chain MXU NTT across env-knob settings.

Compiles a (variant x K) grid of chain programs first (env knobs are
read at trace time), verifies each variant bit-exact at both K, then
interleaves the timed trials round-robin so tunnel-window drift hits
every arm equally.  Marginal per variant = K-slope on min times.

    AB_VAR=ALOHA_MXU_MUL AB_VALS=limb,limb10 python tools/ab_chain_env.py

Env: AB_VAR (knob name), AB_VALS (comma list), NB (default 256),
     K0/K1 (default 32/128), TRIALS (default 8), ALOHA_STREAM_BP.
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

VAR = os.environ["AB_VAR"]
VALS = os.environ["AB_VALS"].split(",")
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

want = {0: a[:2]}
for K in sorted((K0, K1)):
    w = want[max(k for k in want if k <= K)]
    for _ in range(K - max(k for k in want if k <= K)):
        w = ntt_np.ntt(w, q, psi)
    want[K] = w

fns = {}
for val in VALS:
    os.environ[VAR] = val
    for K in (K0, K1):
        f = jax.jit(lambda l, h, K=K: ntt_mxu.ntt_chain_planes(l, h, q, psi, K))
        t0 = time.perf_counter()
        out = f(alo, ahi)
        _ = np.asarray(out[0][0, 0, 0])
        print(f"{VAR}={val} K={K}: compile+run {time.perf_counter()-t0:.1f}s",
              flush=True)
        got = (np.asarray(out[0][:2]).astype(np.uint64)
               | (np.asarray(out[1][:2]).astype(np.uint64) << np.uint64(32)))
        assert np.array_equal(got.reshape(2, n), want[K]), (val, K)
        fns[(val, K)] = f

best = {k: 1e9 for k in fns}
for t in range(TRIALS):
    for key, f in fns.items():
        t0 = time.perf_counter()
        out = f(alo, ahi)
        _ = np.asarray(out[0][0, 0, 0])
        best[key] = min(best[key], time.perf_counter() - t0)
print({k: round(v * 1e3, 1) for k, v in best.items()}, flush=True)
for val in VALS:
    marg = (best[(val, K1)] - best[(val, K0)]) / (NB * (K1 - K0)) * 1e6
    print(f"{VAR}={val}: marginal {marg:.3f} us/poly -> "
          f"{1e6/marg:,.0f} NTT/s".replace(",", "_"), flush=True)
