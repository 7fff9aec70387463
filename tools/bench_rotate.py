"""Batched rotation throughput on the u32-plane path (streaming NTT).

Marginal protocol (K-chained rotations, min-of-iters) — see
tools/stream_marginal.py for why one-shot timings lie here."""
import os, time
import numpy as np
import jax, jax.numpy as jnp

from aloha_tpu import he_planes, keys
from aloha_tpu.config import DEFAULT_CONFIG as CFG
from aloha_tpu.ops import dispatch

B = int(os.environ.get("B", "32"))  # batch of independent ciphertexts
L, n = CFG.n_limbs, CFG.n
rng = np.random.default_rng(0)
a = rng.integers(0, CFG.moduli[0], size=(B, L, n), dtype=np.uint64)
b = rng.integers(0, CFG.moduli[0], size=(B, L, n), dtype=np.uint64)
sk = keys.gen_secret(CFG, rng=np.random.default_rng(1))
ksk = keys.gen_rotation_key(sk, 2, CFG, rng=np.random.default_rng(2))

pa = he_planes.from_u64(a)
pb = he_planes.from_u64(b)
pk = he_planes.from_u64(ksk)

def chain(pa, pb, k):
    for _ in range(k):
        pa, pb = he_planes.rotate((pa, pb), 2, pk, CFG)
    return pa, pb

print("impl:", dispatch.get_impl(), flush=True)
res = {}
for K in (1, 4):
    f = jax.jit(lambda x, y, K=K: chain(x, y, K))
    r = f(pa, pb)
    _ = np.asarray(r[0][0][0, 0, 0])
    times = []
    for _i in range(5):
        t0 = time.perf_counter()
        r = f(pa, pb)
        _ = np.asarray(r[0][0][0, 0, 0])
        times.append(time.perf_counter() - t0)
    res[K] = min(times)
    print(f"K={K}: min {res[K]*1e3:.1f} ms over {sorted(round(t*1e3) for t in times)}", flush=True)
slope = (res[4] - res[1]) / (3 * B)
print(f"marginal {slope*1e6:.1f} us/rotation -> {1/max(slope,1e-12):,.0f} rotations/s", flush=True)
