"""Batched rotation throughput on the u32-plane path (streaming NTT).

Marginal protocol (K-chained rotations, min-of-iters) — see
tools/stream_marginal.py for why one-shot timings lie here.

ALOHA_KS_KERNEL=0 reverts to the 4-launch multi-modulus form for A/B
against the fused head/tail keyswitch kernels."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import functools
import os, time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from aloha_tpu import he_planes, keys
from aloha_tpu.config import DEFAULT_CONFIG as CFG
from aloha_tpu.ops import dispatch

B = int(os.environ.get("B", "16"))  # batch of independent ciphertexts
KS = (1, int(os.environ.get("K", "3")))
L, n = CFG.n_limbs, CFG.n
rng = np.random.default_rng(0)
a = rng.integers(0, CFG.moduli[0], size=(B, L, n), dtype=np.uint64)
b = rng.integers(0, CFG.moduli[0], size=(B, L, n), dtype=np.uint64)
sk = keys.gen_secret(CFG, rng=np.random.default_rng(1))
ksk = keys.gen_rotation_key(sk, 2, CFG, rng=np.random.default_rng(2))

pa = he_planes.from_u64(a)
pb = he_planes.from_u64(b)
pk = he_planes.from_u64(ksk)
# The key is CLOSED OVER, not a jit argument: concrete planes let
# ks_kernel Shoup-prepare the KSK once per key (a traced key falls back
# to the Barrett inner products).  ALOHA_KS_TRACED_KEY=1 passes the key
# through jit instead, for A/B against the Barrett tail.
TRACED_KEY = bool(os.environ.get("ALOHA_KS_TRACED_KEY"))

def chain(pa, pb, k, key=pk):
    for _ in range(k):
        pa, pb = he_planes.rotate((pa, pb), 2, key, CFG)
    return pa, pb

def stamp(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)

stamp(f"impl: {dispatch.get_impl()} ks_kernel="
      f"{os.environ.get('ALOHA_KS_KERNEL', '1')} B={B} K={KS}")
res = {}
for K in KS:
    if TRACED_KEY:
        f = jax.jit(lambda x, y, kk, K=K: chain(x, y, K, kk))
        f = functools.partial(lambda g, x, y: g(x, y, pk), f)
    else:
        f = jax.jit(lambda x, y, K=K: chain(x, y, K))
    t0 = time.perf_counter()
    r = f(pa, pb)
    _ = np.asarray(r[0][0][0, 0, 0])
    stamp(f"K={K}: compiled+ran in {time.perf_counter()-t0:.1f} s")
    times = []
    for _i in range(5):
        t0 = time.perf_counter()
        r = f(pa, pb)
        _ = np.asarray(r[0][0][0, 0, 0])
        times.append(time.perf_counter() - t0)
    res[K] = min(times)
    stamp(f"K={K}: min {res[K]*1e3:.1f} ms over "
          f"{sorted(round(t*1e3) for t in times)}")
k0, k1 = KS
slope = (res[k1] - res[k0]) / ((k1 - k0) * B)
stamp(f"marginal {slope*1e6:.1f} us/rotation -> "
      f"{1/max(slope,1e-12):,.0f} rotations/s")
