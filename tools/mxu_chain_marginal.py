"""Hardware check + throughput of the FUSED-CHAIN MXU NTT.

One pallas_call runs K data-dependent transforms with the chunk
VMEM-resident (transpose-free layout) — vs the chained single-shot
kernel, this removes the per-transform HBM round trip and 4 layout
transposes.  Verifies bit-exactness (K=3 vs iterated NumPy golden),
then measures:
  * marginal us/poly-transform via the K-slope,
  * the recorded-protocol rate (whole dispatch incl. readback) at
    several (NB, K, S-streams) points.

Env: NB (default 256), KS (default "32,128"), S (streams, default 6),
     ALOHA_STREAM_BP (chunk, default library default).
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
S = int(os.environ.get("S", "6"))
q, psi = CFG.moduli[0], CFG.psi[0]
n = CFG.n
rng = np.random.default_rng(0)
a = rng.integers(0, q, size=(NB, n), dtype=np.uint64)
alo = jnp.asarray((a & 0xFFFFFFFF).astype(np.uint32).reshape(NB, n // 128, 128))
ahi = jnp.asarray((a >> np.uint64(32)).astype(np.uint32).reshape(NB, n // 128, 128))

# correctness: K=3 fused vs iterated golden
t0 = time.perf_counter()
olo, ohi = jax.jit(
    lambda l, h: ntt_mxu.ntt_chain_planes(l, h, q, psi, 3)
)(alo, ahi)
got = (np.asarray(olo[:4]).astype(np.uint64)
       | (np.asarray(ohi[:4]).astype(np.uint64) << np.uint64(32)))
print(f"first call (K=3): {time.perf_counter()-t0:.1f}s", flush=True)
want = a[:4]
for _ in range(3):
    want = ntt_np.ntt(want, q, psi)
ok = np.array_equal(got.reshape(4, n), want)
print("fused chain bit-exact vs golden:", "OK" if ok else "MISMATCH", flush=True)
if not ok:
    raise SystemExit(1)

KS = tuple(int(x) for x in os.environ.get("KS", "32,128").split(","))
res = {}
for K in KS:
    f = jax.jit(lambda l, h, K=K: ntt_mxu.ntt_chain_planes(l, h, q, psi, K))
    out = f(alo, ahi)
    _ = np.asarray(out[0][0, 0, 0])
    times = []
    for _t in range(6):
        t0 = time.perf_counter()
        out = f(alo, ahi)
        _ = np.asarray(out[0][0, 0, 0])
        times.append(time.perf_counter() - t0)
    res[K] = min(times)
    print(f"K={K}: min {res[K]*1e3:.1f} ms over "
          f"{[round(t*1e3) for t in times]}", flush=True)

k0, k1 = KS[0], KS[-1]
marg = (res[k1] - res[k0]) / (NB * (k1 - k0)) * 1e6
print(f"marginal {marg:.3f} us/poly -> {1e6/marg:,.0f} NTT/s".replace(",", "_"),
      flush=True)

# recorded protocol: S streams, single stacked readback
fK = jax.jit(lambda l, h: ntt_mxu.ntt_chain_planes(l, h, q, psi, k1))
xs = [
    jax.block_until_ready(
        jax.jit(lambda l, h, i=i: (jnp.roll(l, i, 0), jnp.roll(h, i, 0)))(
            alo, ahi))
    for i in range(S)
]
best = 0.0
for _t in range(4):
    t0 = time.perf_counter()
    outs = [fK(*x) for x in xs]
    comb = jnp.stack([o[0][0, 0, 0] for o in outs])
    _ = np.asarray(comb)
    dt = time.perf_counter() - t0
    best = max(best, S * NB * k1 / dt)
print(f"recorded-protocol (S={S}, NB={NB}, K={k1}): "
      f"{best:,.0f} NTT/s".replace(",", "_"), flush=True)
