#!/usr/bin/env python
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
"""Same-window A/B: hoisted rotations vs plain rotations.

Hoisting (he_planes.rotate_hoisted) shares ONE key-switch head across
K steps; plain rotation pays the head per step.  Paired protocol: both
arms are ONE jitted program computing K rotations of a B-batch (keys
closed over concretely -> Shoup-prepared tails), ended by a stacked
scalar readback; best of TRIALS.  A null program (same dispatch +
readback, no compute) is measured in the same window and subtracted, so
the per-rotation figures are device time — at these sizes a K-slope
would need minutes-long chains to rise above tunnel-dispatch variance,
but the dispatch constant is identical across arms, so the paired
difference is pure device win.

Env: B (batch, default 128), K (steps, default 12), TRIALS (default 6),
ARMS (comma list of hoisted,plain — run a subset to save compile time;
two runs at different K give the hoisted arm's K-slope = the tail-only
per-step asymptote, the head having amortized out).
"""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from aloha_tpu import he_planes as hp, keys
from aloha_tpu.config import DEFAULT_CONFIG as CFG

B = int(os.environ.get("B", "128"))
K = int(os.environ.get("K", "12"))
TRIALS = int(os.environ.get("TRIALS", "6"))
L, n = CFG.n_limbs, CFG.n

rng = np.random.default_rng(0)
sk = keys.gen_secret(CFG, np.random.default_rng(1))
a = rng.integers(0, CFG.moduli[0], size=(B, L, n), dtype=np.uint64)
b = rng.integers(0, CFG.moduli[0], size=(B, L, n), dtype=np.uint64)
ct = (hp.from_u64(jnp.asarray(a)), hp.from_u64(jnp.asarray(b)))
steps = list(range(1, K + 1))
ksks = [
    hp.from_u64(jnp.asarray(
        keys.gen_rotation_key(sk, s, CFG, np.random.default_rng(10 + s))
    ))
    for s in steps
]


def scalar0(t):
    leaf = jax.tree_util.tree_leaves(t)[0]
    return leaf[(0,) * leaf.ndim]


def run(fn):
    out = fn(ct)  # warmup/compile
    _ = np.asarray(scalar0(out))
    best = np.inf
    for _t in range(TRIALS):
        t0 = time.perf_counter()
        _ = np.asarray(scalar0(fn(ct)))
        best = min(best, time.perf_counter() - t0)
    return best


hoisted = jax.jit(lambda ct: jnp.stack(
    [scalar0(o) for o in hp.rotate_hoisted(ct, steps, ksks, CFG)]
))
plain = jax.jit(lambda ct: jnp.stack(
    [scalar0(hp.rotate(ct, s, kk, CFG)) for s, kk in zip(steps, ksks)]
))
null = jax.jit(lambda ct: scalar0(ct) + jnp.uint32(1))

t_null = run(null)
print(f"B={B} K={K}: null dispatch+readback {t_null*1e3:.1f} ms")
arms = os.environ.get("ARMS", "hoisted,plain").split(",")
res = {}
for name, fn in (("hoisted", hoisted), ("plain", plain)):
    if name not in arms:
        continue
    t = run(fn)
    per = (t - t_null) / (K * B)
    res[name] = per
    print(f"{name:8s}: {t*1e3:7.1f} ms total -> {per*1e6:6.1f} us/rotation "
          f"device = {1/per:,.0f} rot/s/chip")
if len(res) == 2:
    print(f"hoisting speedup (device per-rotation): "
          f"{res['plain']/res['hoisted']:.2f}x")
