"""Hardware check + marginal throughput of the MXU 4-step NTT.

Verifies bit-exactness vs the NumPy golden on the real chip, then
measures marginal throughput with the K-slope protocol.

Env: NB (batch, default 256), ALOHA_STREAM_BP (chunk), INV=1 (inverse),
     ALOHA_MXU_DOT (i8|bf16).
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
INV = bool(os.environ.get("INV"))
q, psi = CFG.moduli[0], CFG.psi[0]
n = CFG.n
rng = np.random.default_rng(0)
a = rng.integers(0, q, size=(NB, n), dtype=np.uint64)
alo = jnp.asarray((a & 0xFFFFFFFF).astype(np.uint32).reshape(NB, n // 128, 128))
ahi = jnp.asarray((a >> np.uint64(32)).astype(np.uint32).reshape(NB, n // 128, 128))

if INV:
    root = pow(psi, q - 2, q)
    fn = lambda al, ah: ntt_mxu.intt_planes(al, ah, q, root)  # noqa: E731
    want = ntt_np.intt(a[:4], q, root)
else:
    fn = lambda al, ah: ntt_mxu.ntt_planes(al, ah, q, psi)  # noqa: E731
    want = ntt_np.ntt(a[:4], q, psi)

t0 = time.perf_counter()
olo, ohi = jax.jit(fn)(alo, ahi)
got = (np.asarray(olo[:4]).astype(np.uint64)
       | (np.asarray(ohi[:4]).astype(np.uint64) << np.uint64(32)))
print(f"first call: {time.perf_counter()-t0:.1f}s", flush=True)
ok = np.array_equal(got.reshape(4, n), want)
print("hardware bit-exact vs golden:", "OK" if ok else "MISMATCH", flush=True)
if not ok:
    d = np.nonzero(got.reshape(4, n) != want)
    print("  mismatches:", len(d[0]), d[0][:4], d[1][:4])
    raise SystemExit(1)


def chain(al, ah, k):
    for _ in range(k):
        al, ah = fn(al, ah)
    return al, ah


# default spread widened 4,12 -> 4,36 (r5): a 4->12 spread puts only
# ~2-3 ms of device work in the delta at NB=256, inside the tunnel's
# ~1 ms min-of-iters jitter — it once read 0.803 us/poly in a window
# whose wide-spread truth was ~1.5 (see docs/DESIGN.md correction note)
KS = tuple(int(x) for x in os.environ.get("KS", "4,36").split(","))
res = {}
for K in KS:
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
    print(f"K={K}: min {res[K]*1e3:.1f} ms over "
          f"{sorted(round(t*1e3) for t in times)}", flush=True)
delta = res[KS[-1]] - res[KS[0]]
slope = delta / ((KS[-1] - KS[0]) * NB)
cfgs = {k: os.environ.get(k, "") for k in
        ("ALOHA_STREAM_BP", "ALOHA_MXU_DOT", "NB", "INV")}
reliable = delta > 0.005
print(f"{cfgs}: marginal {slope*1e6:.3f} us/poly -> "
      f"{1/max(slope,1e-9):,.0f} NTT/s"
      f"{'' if reliable else '  [UNRELIABLE: delta < 5 ms]'}", flush=True)
