"""Scaling evidence on the virtual mesh: collectives, bytes, balance.

Real multi-chip hardware is not reachable from this environment, so this
tool produces the best available proxy for the >= 85% host-scaling
target (BASELINE.json): static evidence that the sharded kernels move
the minimum possible bytes over the interconnect, plus an end-to-end
2-process jax.distributed run of tools/bench_scaling.py on CPU.

Sections:
  1. coefficient-sharded NTT at N=8192 over coeff=8: HLO collective
     census (must be exactly log2(D) collective-permutes) + bytes per
     device per transform.
  2. digit-sharded keyswitch at N=8192 (dp=4 x digit=2): all-reduce
     census (ONE psum) + payload bytes.
  3. per-device balance: SPMD shard shapes (uniform by construction) +
     compiled FLOP estimate per device.
  4. 2-process DCN-layer run: bench_scaling.py under jax.distributed
     (2 CPU processes x 4 virtual devices), per-device rates for the
     1-process and 2-process configurations of the SAME program.

Results are recorded in docs/DESIGN.md (round-4 scaling evidence).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import json
import re
import socket
import subprocess
import sys

import numpy as np

REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))


_WIDTH = {"ui64": 8, "i64": 8, "f64": 8, "ui32": 4, "i32": 4, "f32": 4}


def _census(text: str) -> dict:
    """Count collective ops in lowered StableHLO text and sum the
    per-device payload bytes (from each op's tensor result type)."""
    out = {}
    all_lines = text.splitlines()
    for op in ("collective_permute", "all_reduce", "all_gather",
               "all_to_all"):
        idxs = [i for i, ln in enumerate(all_lines)
                if f"stablehlo.{op}" in ln]
        lines = []
        for i in idxs:
            ln = all_lines[i]
            if op == "all_reduce":
                # region op: the payload type sits on the closing
                # "}) : (tensor<...>)" line a few lines down (the op
                # line's only tensor is the replica_groups attribute)
                for j in range(i + 1, min(i + 12, len(all_lines))):
                    if "}) :" in all_lines[j] and "tensor<" in all_lines[j]:
                        ln = all_lines[j]
                        break
            lines.append(ln)
        nbytes = 0
        for ln in lines:
            # take the LARGEST tensor type on the op line (the payload;
            # attribute tensors like source_target_pairs are tiny)
            cands = [0]
            for m in re.finditer(
                r"tensor<(?:([0-9]+(?:x[0-9]+)*)x)?([a-z]+[0-9]+)>", ln
            ):
                dims, dt = m.groups()
                if dt not in _WIDTH:
                    continue
                size = int(np.prod(
                    [int(d) for d in (dims or "1").split("x")]
                ))
                cands.append(size * _WIDTH[dt])
            nbytes += max(cands)
        if lines:
            out[op] = {"count": len(lines), "bytes_per_device": nbytes}
    return out


def main():
    os_flags = _os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in os_flags:
        _os.environ["XLA_FLAGS"] = (
            os_flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from aloha_tpu import ntt_jax
    from aloha_tpu.config import DEFAULT_CONFIG as CFG
    from aloha_tpu.parallel import ntt_sharded as sh
    from aloha_tpu.parallel.keyswitch_sharded import rotate_sharded

    n = CFG.n
    q, psi = CFG.moduli[0], CFG.psi[0]
    rng = np.random.default_rng(0)

    # ---- 1. coefficient-sharded NTT over 8 devices
    D = 8
    mesh = Mesh(np.array(jax.devices()[:D]), axis_names=("coeff",))
    a = rng.integers(0, q, size=(1, n), dtype=np.uint64)
    a_d = jax.device_put(
        jnp.asarray(a), NamedSharding(mesh, P(None, "coeff"))
    )
    table = jnp.asarray(ntt_jax._tables(n, psi, q, inverse=False))
    lowered = jax.jit(
        jax.shard_map(
            lambda tbl, x: sh._ntt_local(tbl, x, q, D, "coeff"),
            mesh=mesh,
            in_specs=(P(None, "coeff"), P(None, "coeff")),
            out_specs=P(None, "coeff"),
        )
    ).lower(table, a_d)
    cen = _census(lowered.as_text())
    C = n // D
    print(f"[1] sharded NTT n={n} D={D} (shard C={C}):")
    print(f"    HLO collectives: {cen}")
    print(f"    theory: log2(D)={int(np.log2(D))} exchanges x "
          f"{C * 8} B/device = {int(np.log2(D)) * C * 8} B/device/transform")
    comp = lowered.compile()
    ca = comp.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    if ca:
        print(f"    compiled flops (per device, SPMD-uniform): "
              f"{ca.get('flops', float('nan')):.3g}")

    # ---- 2. digit-sharded keyswitch
    L = CFG.n_limbs
    dp = 4
    mesh2 = Mesh(
        np.array(jax.devices()[: dp * L]).reshape(dp, L),
        axis_names=("dp", "digit"),
    )
    ab = rng.integers(0, q, size=(dp, L, n), dtype=np.uint64)
    bb = rng.integers(0, q, size=(dp, L, n), dtype=np.uint64)
    ksk = rng.integers(0, q, size=(2 * L * (L + 1), n), dtype=np.uint64)
    sh2 = NamedSharding(mesh2, P("dp", "digit", None))
    args = (
        jax.device_put(jnp.asarray(ab), sh2),
        jax.device_put(jnp.asarray(bb), sh2),
    )
    lowered2 = jax.jit(
        lambda x, y: rotate_sharded((x, y), 2, ksk, mesh2, CFG, dp_axis="dp")
    ).lower(*args)
    cen2 = _census(lowered2.as_text())
    psum_payload = 2 * (L + 1) * 1 * n * 8  # flat stack, per dp group
    print(f"[2] digit-psum keyswitch n={n} mesh dp={dp} x digit={L}:")
    print(f"    HLO collectives: {cen2}")
    print(f"    theory: ONE psum of {psum_payload} B per dp group "
          f"(2(L+1)={2*(L+1)} polys x {n} x 8 B)")

    # ---- 3. per-device balance
    shard_shapes = {
        str(d.id): tuple(s.data.shape)
        for d, s in zip(mesh2.devices.flat, args[0].addressable_shards)
    }
    uniform = len(set(shard_shapes.values())) == 1
    print(f"[3] per-device shard shapes uniform: {uniform} "
          f"({next(iter(shard_shapes.values()))} on every device; SPMD "
          f"lowering = identical per-device program)")

    # ---- 4. two-process DCN run of bench_scaling.py
    if _os.environ.get("SKIP_2PROC"):
        return
    print("[4] 2-process jax.distributed bench_scaling (CPU, 4 vdev each):")
    for nproc in (1, 2):
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        procs = []
        for pid in range(nproc):
            env = dict(_os.environ)
            env.pop("XLA_FLAGS", None)
            env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
            env["JAX_PLATFORMS"] = "cpu"
            if nproc > 1:
                env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
                env["JAX_NUM_PROCESSES"] = str(nproc)
                env["JAX_PROCESS_ID"] = str(pid)
            procs.append(subprocess.Popen(
                [sys.executable,
                 _os.path.join(REPO, "tools", "bench_scaling.py"),
                 "--batch-per-device", "2", "--iters", "2", "--cpu"],
                env=env, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            ))
        for pid, p in enumerate(procs):
            out, _ = p.communicate(timeout=1800)
            line = [ln for ln in out.splitlines() if ln.startswith("{")]
            assert p.returncode == 0, f"proc {pid} rc={p.returncode}:\n{out[-2000:]}"
            if pid == 0 and line:
                rec = json.loads(line[-1])
                print(f"    {nproc} process(es): {rec}")


if __name__ == "__main__":
    main()
