"""Coefficient-sharded NTT/INTT over a device mesh (shard_map + ppermute).

When a polynomial's n coefficients are block-sharded over D devices
(C = n/D per shard), the butterfly partner of element i is i XOR t:

  * stages with t >= C pair elements on *different* shards — shard d
    exchanges its whole block with shard d XOR (t/C) over ICI
    (`lax.ppermute`), then keeps either the add or the sub half.  This is
    exactly where the reference's Omega interconnect sits in its NTT
    dataflow (the "fl" first-level tap, reference: src/vp/iconn/
    iconn_top.sv:56-58, SURVEY.md 3.3) — pairwise exchanges ride the ICI
    instead of an on-chip shuffle network.
  * stages with t < C are shard-local and run the constant-shape XOR
    formulation under `lax.fori_loop` (see aloha_tpu.ntt_jax).

The (logn, n) per-element twiddle table is passed in sharded over its last
axis, so each shard reads only its own columns.

Total cross-chip traffic: log2(D) block exchanges of C elements each —
the bandwidth-optimal butterfly exchange schedule.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from aloha_tpu import ntt_jax
from aloha_tpu import rns_xla as r


def _log2(x: int) -> int:
    return x.bit_length() - 1


def _ntt_local(table_local, a, q: int, n_devices: int, axis: str):
    """Per-shard body of the forward NTT; a is (..., C)."""
    C = a.shape[-1]
    D = n_devices
    d = jax.lax.axis_index(axis)
    # cross-shard stages: global stage s has t = (D*C) >> (s+1); k = t/C
    for s in range(_log2(D)):
        k = D >> (s + 1)
        perm = [(j, j ^ k) for j in range(D)]
        partner = jax.lax.ppermute(a, axis, perm)
        bit = (d & k) != 0
        u = jnp.where(bit, partner, a)
        v = jnp.where(bit, a, partner)
        xw = r.mulmod(v, table_local[s], q)
        a = jnp.where(bit, r.submod(u, xw, q), r.addmod(u, xw, q))
    # local stages
    local_i = jnp.arange(C, dtype=jnp.int32)
    logD = _log2(D)

    def stage(s2, a):
        t = jnp.int32(C) >> (s2 + 1)
        bit = (local_i & t) != 0
        idx = jnp.bitwise_xor(local_i, t)
        partner = a[..., idx]
        u = jnp.where(bit, partner, a)
        v = jnp.where(bit, a, partner)
        xw = r.mulmod(v, table_local[logD + s2], q)
        return jnp.where(bit, r.submod(u, xw, q), r.addmod(u, xw, q))

    return jax.lax.fori_loop(0, _log2(C), stage, a)


def _intt_local(table_local, a, q: int, n_devices: int, axis: str):
    """Per-shard body of the inverse NTT (GS, local stages first)."""
    C = a.shape[-1]
    D = n_devices
    d = jax.lax.axis_index(axis)
    local_i = jnp.arange(C, dtype=jnp.int32)

    def stage(s, a):
        t = jnp.int32(1) << s
        bit = (local_i & t) != 0
        idx = jnp.bitwise_xor(local_i, t)
        partner = a[..., idx]
        u = jnp.where(bit, partner, a)
        v = jnp.where(bit, a, partner)
        s0 = r.halfmod(r.addmod(u, v, q), q)
        s1 = r.halfmod(r.mulmod(r.submod(u, v, q), table_local[s], q), q)
        return jnp.where(bit, s1, s0)

    a = jax.lax.fori_loop(0, _log2(C), stage, a)
    # cross-shard stages: global stage s = logC + s2 has t = C << s2; k = t/C
    for s2 in range(_log2(D)):
        k = 1 << s2
        perm = [(j, j ^ k) for j in range(D)]
        partner = jax.lax.ppermute(a, axis, perm)
        bit = (d & k) != 0
        u = jnp.where(bit, partner, a)
        v = jnp.where(bit, a, partner)
        s0 = r.halfmod(r.addmod(u, v, q), q)
        s1 = r.halfmod(
            r.mulmod(r.submod(u, v, q), table_local[_log2(C) + s2], q), q
        )
        a = jnp.where(bit, s1, s0)
    return a


@functools.partial(
    jax.jit, static_argnames=("q", "psi", "mesh", "axis", "inverse")
)
def _run(a, table, q, psi, mesh, axis, inverse):
    D = mesh.shape[axis]
    body = _intt_local if inverse else _ntt_local
    spec_in = P(*([None] * (a.ndim - 1) + [axis]))
    f = jax.shard_map(
        lambda tbl, x: body(tbl, x, q, D, axis),
        mesh=mesh,
        in_specs=(P(None, axis), spec_in),
        out_specs=spec_in,
    )
    return f(table, a)


def ntt_sharded(a, q: int, psi: int, mesh: Mesh, axis: str = "coeff"):
    """Forward NTT with the last axis sharded over `axis` of `mesh`."""
    n = a.shape[-1]
    table = jnp.asarray(ntt_jax._tables(n, psi, q, inverse=False))
    return _run(a, table, q, psi, mesh, axis, False)


def intt_sharded(a, q: int, ipsi: int, mesh: Mesh, axis: str = "coeff"):
    """Inverse NTT with the last axis sharded over `axis` of `mesh`."""
    n = a.shape[-1]
    table = jnp.asarray(ntt_jax._tables(n, ipsi, q, inverse=True))
    return _run(a, table, q, ipsi, mesh, axis, True)
