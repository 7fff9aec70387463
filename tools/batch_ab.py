"""A/B the streaming NTT marginal cost vs batch size IN ONE PROCESS.

Round-2 sessions saw NB=1024 measure 4.46 us/poly while NB=256 measured
2.49 us/poly in adjacent windows — this probe interleaves the two batch
sizes in one process so tunnel-epoch swings hit both equally.

    ALOHA_STREAM_BP=32 python tools/batch_ab.py [--batches 256,1024] [--k 8,24]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse
import os
import time

import numpy as np

os.environ.setdefault("ALOHA_STREAM_BP", "32")
os.environ.setdefault("ALOHA_STREAM_UNROLL", "full")

import jax
import jax.numpy as jnp

from aloha_tpu.config import DEFAULT_CONFIG as CFG
from aloha_tpu.ops import ntt_stream


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="256,1024")
    ap.add_argument("--k", default="8,24")
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    n, q, psi = CFG.n, CFG.moduli[0], CFG.psi[0]
    rows = n // 128
    k_lo, k_hi = (int(v) for v in args.k.split(","))
    batches = [int(v) for v in args.batches.split(",")]
    rng = np.random.default_rng(0)

    cases = {}
    for nb in batches:
        x = rng.integers(0, q, size=(nb, rows, 128), dtype=np.uint64)
        lo = jnp.asarray(x & np.uint64(0xFFFFFFFF), dtype=jnp.uint32)
        hi = jnp.asarray(x >> np.uint64(32)).astype(jnp.uint32)

        def chain(lo, hi, k):
            for _ in range(k):
                lo, hi = ntt_stream.ntt_planes(lo, hi, q, psi)
            return lo, hi

        fns = {}
        for k in (k_lo, k_hi):
            f = jax.jit(lambda a, b, k=k: chain(a, b, k))
            out = f(lo, hi)
            _ = np.asarray(out[0][0, 0, 0])  # force compile + complete
            fns[k] = f
        cases[nb] = (lo, hi, fns)
        print(f"compiled nb={nb}", flush=True)

    for r in range(args.rounds):
        for nb in batches:
            lo, hi, fns = cases[nb]
            t = {}
            for k in (k_lo, k_hi):
                best = float("inf")
                for _ in range(args.trials):
                    t0 = time.perf_counter()
                    out = fns[k](lo, hi)
                    _ = np.asarray(out[0][0, 0, 0])
                    best = min(best, time.perf_counter() - t0)
                t[k] = best
            slope = (t[k_hi] - t[k_lo]) / ((k_hi - k_lo) * nb)
            print(
                f"round {r} nb={nb}: t{k_lo}={t[k_lo]*1e3:.1f}ms "
                f"t{k_hi}={t[k_hi]*1e3:.1f}ms marginal {slope*1e6:.2f} us/poly"
                f" -> {1/max(slope,1e-12):,.0f} NTT/s",
                flush=True,
            )


if __name__ == "__main__":
    main()
