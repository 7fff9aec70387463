#!/usr/bin/env python
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
"""Per-op throughput bench on the native u32-plane ciphertext path.

    python tools/bench_planes.py [--batch 64] [--iters 16] [--ops hom_add,...]

Protocol (honest through the tunneled backend): each op is measured as a
K-long data-dependent chain inside ONE jitted program (one dispatch),
ended by a scalar host readback; best of 4 trials.  This is the same
protocol as bench.py — per-call timing through the tunnel (~30 ms
dispatch) says nothing about device throughput.

Ops ride on `aloha_tpu.he_planes` (separate (lo, hi) u32 arrays), the
kernels' native representation — no u64 emulation, no pack/unpack.
Reference analogues: hom_add/mul_plain = the 64-beat elementwise
instructions (src/vp/sequncer/seq_top.v:516); rotate = the keyswitch
kernel (sim/vp/isram_file_generator/keyswitch.mem).
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--ops", type=str, default="hom_add,mul_plain,ct_mul_like")
    ap.add_argument("--trials", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from aloha_tpu import he_planes as hp
    from aloha_tpu.config import DEFAULT_CONFIG as CFG

    B, n, L = args.batch, CFG.n, CFG.n_limbs
    rng = np.random.default_rng(0)

    def rand_planes(shape):
        lim = np.broadcast_to(
            np.asarray(CFG.moduli[:L], dtype=np.uint64)[:, None], (L, n)
        )
        v = (
            rng.integers(0, 1 << 63, size=shape + (L, n), dtype=np.uint64)
            % lim
        )
        return (
            jnp.asarray(v & np.uint64(0xFFFFFFFF), dtype=jnp.uint32).astype(
                jnp.uint32
            ),
            jnp.asarray(v >> np.uint64(32)).astype(jnp.uint32),
        )

    def rand_ct(shape):
        return (rand_planes(shape), rand_planes(shape))

    ct1 = rand_ct((B,))
    ct2 = rand_ct((B,))
    pt = rand_planes((B,))
    ksk_u64 = rng.integers(
        0, CFG.moduli[0], size=(2 * L * (L + 1), n), dtype=np.uint64
    )
    ksk = hp.from_u64(jnp.asarray(ksk_u64))

    # op name -> (chain step: ct -> ct, bytes moved per op for the bound)
    ct_bytes = 2 * L * n * 8
    ops = {
        "hom_add": (lambda ct: hp.hom_add(ct, ct2, CFG), 3 * ct_bytes),
        "mul_plain": (lambda ct: hp.mul_plain(ct, pt, CFG),
                      2 * ct_bytes + ct_bytes // 2),
        # tensor product's hot shape: two mul_plains feeding one hom_add
        "ct_mul_like": (
            lambda ct: hp.hom_add(
                hp.mul_plain(ct, pt, CFG), hp.mul_plain(ct2, pt, CFG), CFG
            ),
            5 * ct_bytes,
        ),
        "rotate": (lambda ct: hp.rotate(ct, 2, ksk, CFG), None),
        # the hot loop of encrypted matvec/conv: rotate-and-accumulate
        # (rotate -> diagonal mul_plain -> accumulate)
        "matvec_step": (
            lambda ct: hp.hom_add(
                hp.mul_plain(hp.rotate(ct, 2, ksk, CFG), pt, CFG),
                ct2, CFG,
            ),
            None,
        ),
        "encode_post": (
            lambda ct: (hp.encode_post(ct[0], CFG), ct[1]),
            None,
        ),
    }

    for name in args.ops.split(","):
        step, _nbytes = ops[name]

        def measure(k, step=step):
            """Best-time (seconds) for a k-long data-dependent chain."""
            def chain(ct):
                for _ in range(k):
                    ct = step(ct)
                return ct

            cfn = jax.jit(chain)
            out = cfn(ct1)
            leaf = jax.tree_util.tree_leaves(out)[0]
            _ = np.asarray(leaf[(0,) * leaf.ndim])
            best = np.inf
            for _t in range(args.trials):
                t0 = time.perf_counter()
                out = cfn(ct1)
                leaf = jax.tree_util.tree_leaves(out)[0]
                _ = np.asarray(leaf[(0,) * leaf.ndim])
                best = min(best, time.perf_counter() - t0)
            return best

        # recorded = full dispatch+readback; marginal = K-slope (the
        # ~30 ms tunnel dispatch says nothing about device throughput)
        t_lo = measure(args.iters // 2)
        t_hi = measure(args.iters)
        recorded = B * args.iters / t_hi
        # a tunnel-window drift between the two samples can make the
        # full chain beat the half chain; a slope from that is noise,
        # not a measurement — report null rather than an absurd number
        marginal = (
            round(B * (args.iters - args.iters // 2) / (t_hi - t_lo), 1)
            if t_hi > t_lo else None
        )
        print(
            json.dumps(
                {
                    "metric": f"{name}_planes_throughput",
                    "value": round(recorded, 1),
                    "marginal": marginal,
                    "unit": "ops/s/chip",
                    "batch": B,
                    "chain": args.iters,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
