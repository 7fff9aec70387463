"""Worker for the 2-process DCN test: initialize jax.distributed, build a
(dp, digit) pod mesh over 2 processes x 4 virtual CPU devices, run the
digit-sharded rotation, and verify this process's output shards against
the NumPy golden model.

Usage: multihost_worker.py <process_id> <num_processes> <coordinator>
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

pid, nprocs, coord = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from aloha_tpu.parallel import multihost  # noqa: E402

multihost.initialize(
    coordinator_address=coord, num_processes=nprocs, process_id=pid
)
assert jax.process_count() == nprocs, jax.process_count()
assert jax.device_count() == 4 * nprocs

import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from aloha_tpu import he_np, keys  # noqa: E402
from aloha_tpu.config import DEFAULT_CONFIG, HEConfig  # noqa: E402
from aloha_tpu.parallel.keyswitch_sharded import rotate_sharded  # noqa: E402

# small ring (same code path, fast XLA CPU compiles): psi^(N/n) is a
# primitive 2n-th root
_C = DEFAULT_CONFIG
_k = _C.n // 1024
CFG = HEConfig(
    n=1024,
    moduli=_C.moduli,
    psi=tuple(pow(p, _k, q) for p, q in zip(_C.psi, _C.moduli)),
    ipsi=tuple(pow(ip, _k, q) for ip, q in zip(_C.ipsi, _C.moduli)),
)

mesh = multihost.pod_mesh(axis_names=("dp", "digit"), dp=4)
assert mesh.shape["digit"] == CFG.n_limbs

# deterministic inputs, identical in every process
rng = np.random.default_rng(7)
step = 2
n = CFG.n
L = CFG.n_limbs
B = 4  # batch = dp size
a = rng.integers(0, CFG.moduli[0], size=(B, L, n), dtype=np.uint64)
b = rng.integers(0, CFG.moduli[0], size=(B, L, n), dtype=np.uint64)
sk = keys.gen_secret(CFG, rng=np.random.default_rng(1))
ksk = keys.gen_rotation_key(sk, step, CFG, rng=np.random.default_rng(2))

ct_spec = NamedSharding(mesh, P("dp", "digit", None))


def from_global(spec, arr):
    return jax.make_array_from_callback(
        arr.shape, spec, lambda idx: arr[idx]
    )


ga = from_global(ct_spec, a)
gb = from_global(ct_spec, b)
# rotate_sharded takes the raw reference-layout KSK and regroups it
# internally; pass it replicated (it is identical in every process)
gk = from_global(NamedSharding(mesh, P(None, None)), ksk)
out_a, out_b = rotate_sharded((ga, gb), step, gk, mesh, CFG)

# golden: per-batch NumPy rotate
for shard in out_a.addressable_shards:
    bi = shard.index[0].start or 0
    li = shard.index[1].start or 0
    ct = he_np.Ciphertext(a=a[bi].copy(), b=b[bi].copy())
    want = he_np.rotate(ct, step, ksk, CFG)
    got = np.asarray(shard.data)[0, 0]
    if not np.array_equal(got, want.a[li]):
        print(f"MISMATCH a batch={bi} limb={li}", flush=True)
        sys.exit(1)
for shard in out_b.addressable_shards:
    bi = shard.index[0].start or 0
    li = shard.index[1].start or 0
    ct = he_np.Ciphertext(a=a[bi].copy(), b=b[bi].copy())
    want = he_np.rotate(ct, step, ksk, CFG)
    got = np.asarray(shard.data)[0, 0]
    if not np.array_equal(got, want.b[li]):
        print(f"MISMATCH b batch={bi} limb={li}", flush=True)
        sys.exit(1)

print(f"proc {pid}: OK ({len(out_a.addressable_shards)} shards verified)",
      flush=True)
