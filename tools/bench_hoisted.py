#!/usr/bin/env python
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
"""Same-window A/B: hoisted rotations vs plain rotations.

Hoisting (he_planes.rotate_hoisted) shares ONE key-switch head across
K steps; plain rotation pays the head per step.  Protocol: each arm is
ONE jitted program computing K rotations of a B-batch (keys closed over
concretely so the Shoup-prepared tail rides), ended by a stacked scalar
readback that data-depends on every output; best of `TRIALS`.  The
per-rotation marginal comes from the K-slope (K_LO vs K_HI), removing
the dispatch constant.

Env: B (batch, default 16), K_LO/K_HI (default 2/8), TRIALS (default 4).
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

B = int(os.environ.get("B", "16"))
K_LO = int(os.environ.get("K_LO", "2"))
K_HI = int(os.environ.get("K_HI", "8"))
TRIALS = int(os.environ.get("TRIALS", "4"))
L, n = CFG.n_limbs, CFG.n

rng = np.random.default_rng(0)
sk = keys.gen_secret(CFG, np.random.default_rng(1))
a = rng.integers(0, CFG.moduli[0], size=(B, L, n), dtype=np.uint64)
b = rng.integers(0, CFG.moduli[0], size=(B, L, n), dtype=np.uint64)
ct = (hp.from_u64(jnp.asarray(a)), hp.from_u64(jnp.asarray(b)))
steps = list(range(1, K_HI + 1))
ksks = [
    hp.from_u64(jnp.asarray(
        keys.gen_rotation_key(sk, s, CFG, np.random.default_rng(10 + s))
    ))
    for s in steps
]


def scalar0(t):
    leaf = jax.tree_util.tree_leaves(t)[0]
    return leaf[(0,) * leaf.ndim]


def run(fn, nrot):
    out = fn(ct)  # warmup/compile
    _ = np.asarray(scalar0(out))
    best = np.inf
    for _t in range(TRIALS):
        t0 = time.perf_counter()
        _ = np.asarray(scalar0(fn(ct)))
        best = min(best, time.perf_counter() - t0)
    return best


def hoisted_fn(k):
    def f(ct):
        outs = hp.rotate_hoisted(ct, steps[:k], ksks[:k], CFG)
        return jnp.stack([scalar0(o) for o in outs])
    return jax.jit(f)


def plain_fn(k):
    def f(ct):
        outs = [hp.rotate(ct, s, kk, CFG)
                for s, kk in zip(steps[:k], ksks[:k])]
        return jnp.stack([scalar0(o) for o in outs])
    return jax.jit(f)


print(f"B={B} K={K_LO}/{K_HI} (hoisted head shared across steps)")
res = {}
for name, mk in (("hoisted", hoisted_fn), ("plain", plain_fn)):
    t_lo = run(mk(K_LO), K_LO)
    t_hi = run(mk(K_HI), K_HI)
    marg = (t_hi - t_lo) / ((K_HI - K_LO) * B)
    res[name] = marg
    print(f"{name:8s}: K={K_LO}: {t_lo*1e3:.1f} ms  K={K_HI}: "
          f"{t_hi*1e3:.1f} ms  marginal {marg*1e6:.1f} us/rotation "
          f"= {1/marg:,.0f} rot/s")
print(f"hoisting speedup (marginal per-rotation): "
      f"{res['plain']/res['hoisted']:.2f}x")
