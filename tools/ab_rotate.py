"""Same-window rotation A/B across keyswitch configurations.

Variants are (ALOHA_KS_NTT, ALOHA_KS_BP) pairs; knobs are read at trace
time, so all variants compile in ONE process and the timed trials
interleave round-robin (window drift hits every arm equally).  Outputs
are cross-checked word-identical between variants before timing.

    AB_VARIANTS="mxu:16,stream:16,mxu:32" python tools/ab_rotate.py

Env: AB_VARIANTS (default "mxu:16,stream:16"), B (default 16),
     K0/K1 (default 1/3), TRIALS (default 6).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os, time
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from aloha_tpu import he_planes, keys
from aloha_tpu.config import DEFAULT_CONFIG as CFG

VARIANTS = [
    tuple(v.split(":"))
    for v in os.environ.get("AB_VARIANTS", "mxu:16,stream:16").split(",")
]
B = int(os.environ.get("B", "16"))
K0 = int(os.environ.get("K0", "1"))
K1 = int(os.environ.get("K1", "3"))
TRIALS = int(os.environ.get("TRIALS", "6"))
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


def stamp(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


fns, ref = {}, {}
for mode, bp in VARIANTS:
    os.environ["ALOHA_KS_NTT"] = mode
    os.environ["ALOHA_KS_BP"] = bp
    for K in (K0, K1):
        f = jax.jit(lambda x, y, K=K: chain(x, y, K))
        t0 = time.perf_counter()
        r = f(pa, pb)
        # compare EVERY output leaf (a+b parts, lo+hi planes) — a
        # variant corrupting only hi words or only b_rot must not pass
        out = [np.asarray(t) for t in jax.tree_util.tree_leaves(r)]
        stamp(f"{mode}:{bp} K={K}: compiled+ran {time.perf_counter()-t0:.1f}s")
        if K in ref:
            assert len(out) == len(ref[K]) and all(
                np.array_equal(o, w) for o, w in zip(out, ref[K])
            ), f"{mode}:{bp} K={K} mismatch"
        else:
            ref[K] = out
        fns[(mode, bp, K)] = f

best = {k: 1e9 for k in fns}
for _t in range(TRIALS):
    for key, f in fns.items():
        t0 = time.perf_counter()
        r = f(pa, pb)
        _ = np.asarray(r[0][0][0, 0, 0])
        best[key] = min(best[key], time.perf_counter() - t0)
print({k: round(v * 1e3, 1) for k, v in best.items()}, flush=True)
for mode, bp in VARIANTS:
    slope = (best[(mode, bp, K1)] - best[(mode, bp, K0)]) / ((K1 - K0) * B)
    stamp(f"{mode}:BP{bp}: marginal {slope*1e6:.1f} us/rotation -> "
          f"{1/max(slope, 1e-12):,.0f} rotations/s")
