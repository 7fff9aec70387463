#!/usr/bin/env python
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
"""Scaling-efficiency bench: batched rotations over a device mesh.

Run the SAME command on every host of a slice (or once on one host):

    python tools/bench_scaling.py [--batch-per-device 8] [--iters 10]

Prints one JSON line per process:
  {"metric": "rotate_throughput", "devices": D, "hosts": H,
   "value": rot/s, "per_device": rot/s/D, "unit": "rotations/s"}

Scaling efficiency to N hosts = per_device(N hosts) / per_device(1 host)
(the BASELINE.json >= 85% target).  Data-parallel over `dp`, so the only
cross-host traffic is program dispatch — efficiency loss measures runtime
overheads, not algorithmic communication.
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-per-device", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--step", type=int, default=2)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend via the config API (the "
                    "hosted environment ignores JAX_PLATFORMS env vars)")
    args = ap.parse_args()

    if args.cpu:
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")

    from aloha_tpu.parallel import multihost

    multihost.initialize()

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from aloha_tpu import he_jax
    from aloha_tpu.config import DEFAULT_CONFIG as CFG

    mesh = multihost.pod_mesh(("dp", "coeff"))
    D = len(jax.devices())
    B = args.batch_per_device * mesh.shape["dp"]
    n = CFG.n
    rng = np.random.default_rng(0)
    q0 = CFG.moduli[0]

    ct_sh = NamedSharding(mesh, P("dp", None, "coeff"))
    ksk_sh = NamedSharding(mesh, P(None, "coeff"))
    a = jax.device_put(
        jnp.asarray(rng.integers(0, q0, size=(B, 2, n), dtype=np.uint64)), ct_sh
    )
    b = jax.device_put(
        jnp.asarray(rng.integers(0, q0, size=(B, 2, n), dtype=np.uint64)), ct_sh
    )
    ksk = jax.device_put(
        jnp.asarray(rng.integers(0, q0, size=(12, n), dtype=np.uint64)), ksk_sh
    )

    fn = jax.jit(
        lambda x, y, k: he_jax.rotate((x, y), args.step, k, CFG),
        in_shardings=(ct_sh, ct_sh, ksk_sh),
        out_shardings=(ct_sh, ct_sh),
    )
    oa, ob = fn(a, b, ksk)
    _ = np.asarray(oa.addressable_shards[0].data[0, 0, 0])

    best = 0.0
    for _trial in range(3):
        xa, xb = a, b
        t0 = time.perf_counter()
        for _ in range(args.iters):
            xa, xb = fn(xa, xb, ksk)
        _ = np.asarray(xa.addressable_shards[0].data[0, 0, 0])
        dt = (time.perf_counter() - t0) / args.iters
        best = max(best, B / dt)

    print(
        json.dumps(
            {
                "metric": "rotate_throughput",
                "devices": D,
                "hosts": jax.process_count(),
                "value": round(best, 2),
                "per_device": round(best / D, 2),
                "unit": "rotations/s",
            }
        )
    )


if __name__ == "__main__":
    main()
