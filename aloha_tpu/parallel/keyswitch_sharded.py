"""Limb/digit-sharded rotation with psum accumulation (shard_map).

The hybrid key-switch sums per-digit contributions under every modulus:
    c_m = sum_j NTT_m(digit_j) * ksk[m, j]
With ciphertext limbs sharded over a mesh axis ("digit": shard j owns limb
j's polynomials and its key slice), each shard computes its digit's
contribution to all moduli locally and ONE `psum` over the digit axis
accumulates the inner products — the TPU-native form of the reference's
per-limb accumulation loop (keyswitch.mem lines 43-78), with the
reduction riding ICI instead of a register accumulator.

After the psum every shard holds the full inner products (replicated);
shard j then finishes the mod-down and the aut(a)+ks_a combination for its
own limb, so outputs stay sharded exactly like inputs.

Batch axes compose: arrays are (..., L, N) sharded (dp, "digit", None).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from aloha_tpu import ntt_jax as nt
from aloha_tpu import rns_xla as r
from aloha_tpu.config import DEFAULT_CONFIG, HEConfig


def _use_kernel() -> bool:
    """Route the per-shard raised-digit NTT sweep through the production
    u32-plane multi-modulus streaming kernel (the composed form: the
    digit-psum layer wraps the SAME kernel the single-chip path runs —
    the reference's iconn/accumulator sits inside its engine, not a
    separate slow path).  Gating mirrors he_planes._use_stream;
    ALOHA_SHARD_KERNEL=0 disables."""
    if os.environ.get("ALOHA_SHARD_KERNEL", "1") == "0":
        return False
    from aloha_tpu import he_planes

    return he_planes._use_stream()


def _ntt_multi_u64(xs, qs, roots):
    """Forward-NTT a list of same-shape u64 arrays (one per modulus) in
    ONE multi-modulus kernel launch; returns the transformed list."""
    import numpy as np

    from aloha_tpu.ops import ntt_stream as ns
    from aloha_tpu.ops.ntt_pallas import LANES

    shape = xs[0].shape
    n = shape[-1]
    rows = n // LANES
    nb = int(np.prod(shape[:-1])) if shape[:-1] else 1
    st = jnp.stack([x.reshape(nb, rows, LANES) for x in xs])
    lo = (st & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    hi = (st >> jnp.uint64(32)).astype(jnp.uint32)
    olo, ohi = ns.ntt_planes_multi(lo, hi, tuple(qs), tuple(roots))
    out = olo.astype(jnp.uint64) | (ohi.astype(jnp.uint64) << jnp.uint64(32))
    return [out[m].reshape(shape) for m in range(len(xs))]


def _local_rotate_shard(a_l, b_l, ksk_l, step_exp, cfg: HEConfig, axis: str):
    """Per-shard body: this shard owns limb j = axis index.

    a_l, b_l: (..., 1, N); ksk_l: (L+1, 2, 1, N) — this digit's key columns
    under every modulus m, parts (a, b).
    """
    L = cfg.n_limbs
    moduli = cfg.moduli
    sp = cfg.special_prime
    half = (sp - 1) // 2
    j = jax.lax.axis_index(axis)

    a_own = a_l[..., 0, :]
    b_own = b_l[..., 0, :]

    # digit: aut(INTT_qj(b_j)) — the per-limb branch is a static unroll over
    # the small limb count, selected by the shard index; lax.switch traces
    # every branch but executes only this shard's.
    def per_limb(fn):
        return jax.lax.switch(
            j, [functools.partial(fn, m) for m in range(L)]
        )

    d = per_limb(
        lambda m: nt.automorphism(
            nt.intt(b_own, moduli[m], cfg.ipsi[m]), step_exp, moduli[m]
        )
    )

    # raise this digit to every modulus, NTT (ONE multi-modulus kernel
    # launch on the composed path — the hot transform block runs the
    # production streaming kernel per shard), multiply with the key
    xs = []
    for m in range(L + 1):
        xs.append(per_limb(
            lambda src: d
            if src == m
            else (
                r.lazy_reduce(d, moduli[m])
                if moduli[m] > moduli[src]
                else r.modred(d, moduli[m])
            )
        ))
    if _use_kernel():
        nds = _ntt_multi_u64(xs, moduli[:L + 1], cfg.psi[:L + 1])
    else:
        nds = [
            nt.ntt(x, moduli[m], cfg.psi[m]) for m, x in enumerate(xs)
        ]
    contrib = []
    for m in range(L + 1):
        pair = [
            r.mulmod(nds[m], ksk_l[m, part, 0], moduli[m])
            for part in (0, 1)
        ]
        contrib.append(pair)

    # ONE psum over the digit axis accumulates the inner products; values
    # must be in a common ring first — they are (each entry is mod its own
    # modulus, summed lazily then reduced).
    flat = jnp.stack([contrib[m][p] for m in range(L + 1) for p in (0, 1)])
    # raw sum of L canonical terms < L*q_m < 2^62 for same-magnitude moduli
    # (HEConfig validates max(q) < 2*min(q)), so the u64 psum cannot wrap.
    summed = jax.lax.psum(flat, axis)
    c = {}
    for k, (m, p) in enumerate([(m, p) for m in range(L + 1) for p in (0, 1)]):
        # the sum is < L*q: each conditional subtract removes at most one q,
        # so chain L-1 of them (trace-time unrolled; L is tiny) to restore
        # the consumers' [0, 2q) laziness window for any limb count.
        v = summed[k]
        for _ in range(max(1, L - 1)):
            v = r.lazy_reduce(v, moduli[m])
        c[(m, p)] = v

    # mod-down by P (replicated work, negligible) then finish own limb
    m_coeff = [
        r.addmod(nt.intt(c[(L, p)], sp, cfg.ipsi[-1]), r.u64(half), sp)
        for p in (0, 1)
    ]

    def finish(m):
        q = moduli[m]
        pinv = cfg.pinv_mod(m)
        outs = []
        for p in (0, 1):
            corr = nt.ntt(r.submod(m_coeff[p], r.u64(half), q), q, cfg.psi[m])
            t = r.submod(c[(m, p)], corr, q)
            outs.append(r.mulmod(t, jnp.broadcast_to(r.u64(pinv), t.shape), q))
        a_rot = r.addmod(
            nt.ntt(
                nt.automorphism(
                    nt.intt(a_own, q, cfg.ipsi[m]), step_exp, q
                ),
                q,
                cfg.psi[m],
            ),
            outs[0],
            q,
        )
        return a_rot, outs[1]

    a_out, b_out = per_limb(finish)
    return a_out[..., None, :], b_out[..., None, :]


def rotate_sharded(
    ct,
    step: int,
    ksk,
    mesh: Mesh,
    cfg: HEConfig = DEFAULT_CONFIG,
    digit_axis: str = "digit",
    dp_axis=None,
):
    """Rotation with limbs sharded over `digit_axis` (size must equal
    n_limbs) and optional batch sharding over `dp_axis`.

    ct: (a, b) uint64 (..., L, N); ksk: (12, N) reference layout.
    """
    a, b = ct
    n = a.shape[-1]
    L = cfg.n_limbs
    if mesh.shape[digit_axis] != L:
        raise ValueError(
            f"digit axis size {mesh.shape[digit_axis]} != n_limbs {L}"
        )
    step_exp = pow(3, step, 2 * n)
    # regroup the KSK: (2L(L+1), N) -> (L+1 moduli, 2 parts, L digits, N)
    ksk4 = ksk.reshape(L + 1, L, 2, n).transpose(0, 2, 1, 3)

    batch_spec = [dp_axis] + [None] * (a.ndim - 3) if dp_axis else [None] * (
        a.ndim - 2
    )
    ct_spec = P(*batch_spec, digit_axis, None)
    ksk_spec = P(None, None, digit_axis, None)

    f = jax.shard_map(
        functools.partial(
            _local_rotate_shard, step_exp=step_exp, cfg=cfg, axis=digit_axis
        ),
        mesh=mesh,
        in_specs=(ct_spec, ct_spec, ksk_spec),
        out_specs=(ct_spec, ct_spec),
        # pallas_call results carry no varying-mesh-axes metadata; the
        # composed kernel body needs the check off (outputs are honestly
        # digit-varying, exactly as the specs state)
        check_vma=False,
    )
    return f(a, b, ksk4)
