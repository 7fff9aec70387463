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


# --------------------------------------------------------------------------
# Composed form: ppermute cross-shard stages wrapping the PRODUCTION
# u32-plane streaming kernel as the per-shard body (round-4 verdict #3:
# the parallel form and the fast form must be the same codepath — the
# reference's iconn sits inside its engine's hot loop,
# src/vp/iconn/iconn_top.sv:56-58, not in a separate slow path).
# --------------------------------------------------------------------------

def _tables6_global_np(n: int, root: int, q: int, inverse: bool):
    """Global-ring stage tables in the streaming kernel's 6-plane format
    ((logn, rows, LANES) each) — exactly ntt_stream's own builder, so
    the composed path can never drift from the kernel's table layout."""
    from aloha_tpu.ops import ntt_stream as ns

    return ns._tables6_np(n, root, q, inverse)


def _plane_specs(n: int, mesh: Mesh, axis: str):
    from aloha_tpu.ops.ntt_pallas import LANES

    D = mesh.shape[axis]
    C = n // D
    assert C % LANES == 0, (
        f"per-shard block {C} must be a multiple of {LANES} lanes"
    )
    return D, C, C // LANES


@functools.partial(
    jax.jit, static_argnames=("q", "root", "mesh", "axis", "inverse")
)
def _run_planes(alo, ahi, q, root, mesh, axis, inverse):
    """(nb, n) u32 planes, last axis sharded: cross-shard XOR stages via
    ppermute on the plane pair, shard-local stages via the streaming
    Pallas kernel with this shard's slice of the GLOBAL stage tables
    (ntt_stream.ntt_planes_with_tables)."""
    import numpy as np

    from aloha_tpu import rns_jax as r32
    from aloha_tpu.ops import ntt_stream as ns
    from aloha_tpu.ops.ntt_pallas import LANES

    n = alo.shape[-1]
    D, C, rows_l = _plane_specs(n, mesh, axis)
    logD, logC = _log2(D), _log2(C)
    t6 = _tables6_global_np(n, root, q, inverse)
    if inverse:
        local_t = tuple(jnp.asarray(t[:logC]) for t in t6)
        cross_w = [t[logC:].reshape(logD, n) for t in t6[:2]]
    else:
        local_t = tuple(jnp.asarray(t[logD:]) for t in t6)
        cross_w = [t[:logD].reshape(logD, n) for t in t6[:2]]
    cross_w = [jnp.asarray(t) for t in cross_w]

    def local_kernel(tl, alo, ahi):
        nb = alo.shape[0]
        a3 = alo.reshape(nb, rows_l, LANES)
        b3 = ahi.reshape(nb, rows_l, LANES)
        olo, ohi = ns.ntt_planes_with_tables(a3, b3, tl, q, inverse)
        return olo.reshape(nb, C), ohi.reshape(nb, C)

    def body(wlo, whi, tl, alo, ahi):
        d = jax.lax.axis_index(axis)
        if inverse:
            alo, ahi = local_kernel(tl, alo, ahi)
        for s in range(logD):
            k = (1 << s) if inverse else (D >> (s + 1))
            perm = [(j, j ^ k) for j in range(D)]
            plo = jax.lax.ppermute(alo, axis, perm)
            phi = jax.lax.ppermute(ahi, axis, perm)
            bit = (d & k) != 0
            ulo = jnp.where(bit, plo, alo)
            uhi = jnp.where(bit, phi, ahi)
            vlo = jnp.where(bit, alo, plo)
            vhi = jnp.where(bit, ahi, phi)
            if inverse:
                s0 = r32.halfmod64(
                    *r32.addmod64(ulo, uhi, vlo, vhi, q), q
                )
                dlo, dhi = r32.submod64(ulo, uhi, vlo, vhi, q)
                s1 = r32.halfmod64(
                    *r32.mulmod64(dlo, dhi, wlo[s], whi[s], q), q
                )
                alo = jnp.where(bit, s1[0], s0[0])
                ahi = jnp.where(bit, s1[1], s0[1])
            else:
                xlo, xhi = r32.mulmod64(vlo, vhi, wlo[s], whi[s], q)
                add = r32.addmod64(ulo, uhi, xlo, xhi, q)
                sub = r32.submod64(ulo, uhi, xlo, xhi, q)
                alo = jnp.where(bit, sub[0], add[0])
                ahi = jnp.where(bit, sub[1], add[1])
        if not inverse:
            alo, ahi = local_kernel(tl, alo, ahi)
        return alo, ahi

    spec = P(None, axis)
    f = jax.shard_map(
        body,
        mesh=mesh,
        # the table tuple shares one spec (pytree prefix): stage axis and
        # lanes replicated, the ROW axis sharded — contiguous coefficient
        # blocks are contiguous row blocks of the (logn, rows, LANES)
        # global tables
        in_specs=(spec, spec, P(None, axis, None), spec, spec),
        out_specs=(spec, spec),
        check_vma=False,
    )
    return f(*cross_w, local_t, alo, ahi)


def ntt_sharded_planes(alo, ahi, q: int, psi: int, mesh: Mesh,
                       axis: str = "coeff"):
    """Forward negacyclic NTT on (nb, n) u32 plane pairs with the
    coefficient axis sharded: log2(D) ppermute exchanges + the
    production streaming kernel per shard.  Bit-exact vs ntt_np."""
    return _run_planes(alo, ahi, q, psi, mesh, axis, False)


def intt_sharded_planes(alo, ahi, q: int, ipsi: int, mesh: Mesh,
                        axis: str = "coeff"):
    """Inverse counterpart of ntt_sharded_planes (local GS stages in the
    kernel first, then the cross-shard exchanges)."""
    return _run_planes(alo, ahi, q, ipsi, mesh, axis, True)
