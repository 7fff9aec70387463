#!/usr/bin/env python
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
"""Per-op throughput bench: the reference's four kernels + ct-ct multiply.

    python tools/bench_ops.py [--batch 64] [--iters 10]

Prints one JSON line per op:
  {"metric": "<op>_throughput", "value": ops/s, "unit": "ops/s/chip", ...}

Set ALOHA_NTT_IMPL=pallas (and optionally ALOHA_NTT_BP) to run the NTTs
through the Pallas kernels.
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from aloha_tpu import he_jax
    from aloha_tpu.config import DEFAULT_CONFIG as CFG

    B, n = args.batch, CFG.n
    rng = np.random.default_rng(0)

    def rand_ct():
        return tuple(
            jnp.asarray(
                rng.integers(0, CFG.moduli[0], size=(B, 2, n), dtype=np.uint64)
            )
            for _ in range(2)
        )

    ct1, ct2 = rand_ct(), rand_ct()
    pt = jnp.asarray(
        rng.integers(0, CFG.moduli[0], size=(B, 2, n), dtype=np.uint64)
    )
    ksk = jnp.asarray(
        rng.integers(0, CFG.moduli[0], size=(12, n), dtype=np.uint64)
    )

    ops = {
        "hom_add": jax.jit(lambda c1, c2: he_jax.hom_add(c1, c2, CFG)),
        "mul_plain": jax.jit(lambda c1, _c2: he_jax.mul_plain(c1, pt, CFG)),
        "ct_mul_like": jax.jit(
            # tensor product (d0, d1, d2) — the ct x ct hot path
            lambda c1, c2: (
                he_jax.mul_plain(c1, c2[0], CFG),
                he_jax.mul_plain(c1, c2[1], CFG),
            )
        ),
        "rotate": jax.jit(lambda c1, _c2: he_jax.rotate(c1, 2, ksk, CFG)),
        "encode_post": jax.jit(
            lambda c1, _c2: (he_jax.encode_post(c1[0], CFG), c1[1])
        ),
    }

    for name, fn in ops.items():
        out = fn(ct1, ct2)
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = np.asarray(leaf.ravel()[0])
        best = 0.0
        for _t in range(3):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fn(ct1, ct2)
            # device executes the stream in order; reading the last result
            # back drains everything queued before it
            leaf = jax.tree_util.tree_leaves(out)[0]
            _ = np.asarray(leaf.ravel()[0])
            dt = (time.perf_counter() - t0) / args.iters
            best = max(best, B / dt)
        print(
            json.dumps(
                {
                    "metric": f"{name}_throughput",
                    "value": round(best, 1),
                    "unit": "ops/s/chip",
                    "batch": B,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
