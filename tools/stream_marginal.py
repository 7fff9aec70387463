"""Marginal throughput of the streaming NTT.  Chained launches; the
K-scaling slope removes dispatch overhead; min-of-iters tames the
tunnel's latency variance."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os, sys, time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from aloha_tpu.config import DEFAULT_CONFIG as CFG
from aloha_tpu.ops import ntt_stream

NB = int(os.environ.get("NB", "256"))
q, psi = CFG.moduli[0], CFG.psi[0]
n = CFG.n
rng = np.random.default_rng(0)
a = rng.integers(0, q, size=(NB, n), dtype=np.uint64)
alo = jnp.asarray((a & 0xFFFFFFFF).astype(np.uint32).reshape(NB, n // 128, 128))
ahi = jnp.asarray((a >> np.uint64(32)).astype(np.uint32).reshape(NB, n // 128, 128))

def chain(alo, ahi, k):
    for _ in range(k):
        alo, ahi = ntt_stream.ntt_planes(alo, ahi, q, psi)
    return alo, ahi

res = {}
for K in (4, 12):
    f = jax.jit(lambda al, ah, K=K: chain(al, ah, K))
    r = f(alo, ahi)
    _ = np.asarray(r[0][0, 0, 0])
    times = []
    for _i in range(6):
        t0 = time.perf_counter()
        r = f(alo, ahi)
        _ = np.asarray(r[0][0, 0, 0])
        times.append(time.perf_counter() - t0)
    res[K] = min(times)
    print(f"K={K}: min {res[K]*1e3:.1f} ms over {sorted(round(t*1e3) for t in times)}", flush=True)
slope = (res[12] - res[4]) / (8 * NB)
cfgs = {k: os.environ.get(k, "") for k in
        ("ALOHA_STREAM_BP", "ALOHA_STREAM_UNROLL", "NB")}
print(f"{cfgs}: marginal {slope*1e6:.3f} us/poly -> {1/max(slope,1e-9):,.0f} NTT/s", flush=True)
