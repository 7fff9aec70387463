"""Negacyclic NTT / INTT / automorphism for the XLA graph path (uint64).

Same transform semantics as `aloha_tpu.ntt_np` (natural->bitrev CT forward,
bitrev->natural GS inverse with per-stage halving, RTL automorphism sign
rule), but structured for XLA:

The 13 stages run under `lax.fori_loop` in a *constant-shape* formulation:
at stage s the butterfly partner of element i is i XOR t (t = the stage's
butterfly distance), so a stage is one gather + one twiddle multiply + a
select — the same op pattern every iteration.  Twiddles come from a
precomputed (logn, n) per-element table indexed by the loop counter.  This
keeps the traced graph ~40 ops per NTT regardless of n, so replaying whole
instruction programs (18+ NTTs) compiles quickly, while XLA still fuses the
butterfly arithmetic.  It is the compiler-friendly analogue of the
reference's shared NTT address generator walking 13 x 64 beats
(reference: src/vp/ntt/ntt_fsm.sv:40-81).

The hand-tiled lazy/Shoup variant for peak throughput lives in
`aloha_tpu.ops.ntt_pallas`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from aloha_tpu import rns_xla as r
from aloha_tpu.ntt_np import bit_reverse


@functools.lru_cache(maxsize=None)
def _tables(n: int, root: int, q: int, inverse: bool):
    """(logn, n) per-element twiddle tables.

    Forward stage s (t = n >> (s+1)): W[s][i] = root^bitrev(m + (i >> (logn-s)))
    with m = 2^s — the same values the reference bakes into its per-lane
    twiddle ROMs (reference: sim/vp/tf_rom_generator/tf_rom_generator.sv).
    Inverse stage s (t = 1 << s, h = n >> (s+1)): W[s][i] = root^bitrev(h + (i >> (s+1))).
    """
    logn = n.bit_length() - 1
    psis = np.array(
        [pow(root, bit_reverse(i, logn), q) for i in range(n)], dtype=np.uint64
    )
    i = np.arange(n)
    rows = []
    for s in range(logn):
        if inverse:
            h = n >> (s + 1)
            rows.append(psis[h + (i >> (s + 1))])
        else:
            m = 1 << s
            rows.append(psis[m + (i >> (logn - s))])
    return np.stack(rows)  # numpy: safe to cache across jit traces


def _xor_partner(a, t, n):
    """Gather a[..., i ^ t] for a traced power-of-two t."""
    idx = jnp.bitwise_xor(jnp.arange(n, dtype=jnp.int32), t)
    return a[..., idx]


def ntt(a, q: int, psi: int):
    """Forward NTT over the last axis of a (..., n) uint64 array."""
    n = a.shape[-1]
    logn = n.bit_length() - 1
    table = jnp.asarray(_tables(n, psi, q, inverse=False))
    hi_bit = jnp.arange(n, dtype=jnp.int32)

    def stage(s, a):
        t = jnp.int32(n) >> (s + 1)
        bit = (hi_bit & t) != 0
        partner = _xor_partner(a, t, n)
        u = jnp.where(bit, partner, a)  # the "top" element of the pair
        v = jnp.where(bit, a, partner)  # the "bottom" element
        xw = r.mulmod(v, table[s], q)
        return jnp.where(bit, r.submod(u, xw, q), r.addmod(u, xw, q))

    return jax.lax.fori_loop(0, logn, stage, a)


def intt(a, q: int, ipsi: int):
    """Inverse NTT (bitrev in, natural out), divide-by-two per GS stage."""
    n = a.shape[-1]
    logn = n.bit_length() - 1
    table = jnp.asarray(_tables(n, ipsi, q, inverse=True))
    hi_bit = jnp.arange(n, dtype=jnp.int32)

    def stage(s, a):
        t = jnp.int32(1) << s
        bit = (hi_bit & t) != 0
        partner = _xor_partner(a, t, n)
        u = jnp.where(bit, partner, a)
        v = jnp.where(bit, a, partner)
        s0 = r.halfmod(r.addmod(u, v, q), q)
        s1 = r.halfmod(r.mulmod(r.submod(u, v, q), table[s], q), q)
        return jnp.where(bit, s1, s0)

    return jax.lax.fori_loop(0, logn, stage, a)


def automorphism(a, step, q: int):
    """X -> X^step with the RTL sign rule (`q - x`, literally).

    `step` may be a traced scalar (the rot_step CSR is a runtime value,
    reference: src/mem_buf/axil_parse.sv:70); the index map is computed on
    device and applied as a scatter (reference math:
    src/vp/vxu/vxu_lane.sv:594-598).
    """
    n = a.shape[-1]
    i = jnp.arange(n, dtype=jnp.uint32)
    j = (i * jnp.asarray(step, jnp.uint32)) & jnp.uint32(2 * n - 1)
    dst = (j & jnp.uint32(n - 1)).astype(jnp.int32)
    neg = j >= jnp.uint32(n)
    vals = jnp.where(neg, r.u64(q) - a, a)
    return jnp.zeros_like(a).at[..., dst].set(vals)


def rotate_lanes(a, step):
    """`vroli`: out[j] = a[(j+step) mod n]; pure data movement."""
    return jnp.roll(a, -step, axis=-1)
