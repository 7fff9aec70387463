"""Ciphertext-level HE ops on native u32-plane arrays (TPU datapath form).

TPUs have no 64-bit vector lanes; the round-1 `he_jax` path carried
uint64 arrays and paid XLA's u64 emulation plus a u32 pack/unpack around
every Pallas kernel call.  This module keeps ciphertexts in the kernels'
native representation end-to-end — packed u32 planes, shape
(..., L, N, 2) with [..., 0] = low and [..., 1] = high word — so
elementwise ops are pure u32 vector arithmetic (aloha_tpu.rns_jax, the
same primitives the kernels inline) and the streaming NTT consumes its
input without conversion.  Semantics are bit-identical to he_jax/he_np
(certified by tests/test_he_planes.py).

The reference analogue: the SPM stores 64-bit coefficients as what are
physically two 32-bit URAM words per lane; this layout is that fact made
architectural (reference: src/mem_buf/spm.sv, src/vp/vxu/mul64.sv).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from aloha_tpu import rns_jax as r32
from aloha_tpu.config import DEFAULT_CONFIG, HEConfig
from aloha_tpu.ops import dispatch as nt_dispatch
from aloha_tpu.ops.ntt_pallas import LANES


# ------------------------------------------------------------- conversion
def from_u64(a) -> jnp.ndarray:
    """uint64 (..., N) -> packed planes (..., N, 2) uint32."""
    a = jnp.asarray(a, dtype=jnp.uint64)
    lo = (a & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    hi = (a >> jnp.uint64(32)).astype(jnp.uint32)
    return jnp.stack([lo, hi], axis=-1)


def to_u64(p) -> jnp.ndarray:
    """packed planes (..., N, 2) -> uint64 (..., N)."""
    return p[..., 0].astype(jnp.uint64) | (
        p[..., 1].astype(jnp.uint64) << jnp.uint64(32)
    )


# ------------------------------------------------------------ transforms
def _use_stream() -> bool:
    from aloha_tpu.ops import ntt_stream

    return nt_dispatch.get_impl() in ("pallas", "stream") and (
        ntt_stream.available()
    )


def _nt(p, q: int, root: int, inverse: bool):
    """NTT/INTT over the last coefficient axis of packed planes."""
    n = p.shape[-2]
    if _use_stream():
        from aloha_tpu.ops import ntt_stream

        batch = p.shape[:-2]
        nb = int(np.prod(batch)) if batch else 1
        lo = p[..., 0].reshape(nb, n // LANES, LANES)
        hi = p[..., 1].reshape(nb, n // LANES, LANES)
        fn = ntt_stream.intt_planes if inverse else ntt_stream.ntt_planes
        olo, ohi = fn(lo, hi, q, root)
        return jnp.stack(
            [olo.reshape(batch + (n,)), ohi.reshape(batch + (n,))], axis=-1
        )
    # portable path: exact same results through the u64 dispatcher
    a = to_u64(p)
    out = nt_dispatch.intt(a, q, root) if inverse else nt_dispatch.ntt(
        a, q, root
    )
    return from_u64(out)


def automorphism(p, step, q: int):
    """X -> X^step with the RTL sign rule (`q - x`), on packed planes
    (coefficient domain; reference: src/vp/vxu/vxu_lane.sv:594-598)."""
    n = p.shape[-2]
    i = jnp.arange(n, dtype=jnp.uint32)
    j = (i * jnp.asarray(step, jnp.uint32)) & jnp.uint32(2 * n - 1)
    dst = (j & jnp.uint32(n - 1)).astype(jnp.int32)
    neg = (j >= jnp.uint32(n))[..., None]
    # literal q - x including x = 0 -> q, as the RTL writes it
    qlo, qhi = r32.const64(q)
    qmx_lo, qmx_hi = r32.sub64(
        jnp.broadcast_to(qlo, p[..., 0].shape),
        jnp.broadcast_to(qhi, p[..., 1].shape),
        p[..., 0],
        p[..., 1],
    )
    qmx = jnp.stack([qmx_lo, qmx_hi], axis=-1)
    vals = jnp.where(neg, qmx, p)
    return jnp.zeros_like(p).at[..., dst, :].set(vals)


# ------------------------------------------------------------ public ops
def _per_limb(fn, a, b, moduli):
    outs = [fn(a[..., i, :, :], b[..., i, :, :], q) for i, q in enumerate(moduli)]
    return jnp.stack(outs, axis=-3)


def hom_add(ct1, ct2, cfg: HEConfig = DEFAULT_CONFIG):
    """(a1+a2, b1+b2) limb-wise on packed planes (..., L, N, 2)."""
    moduli = cfg.moduli[: cfg.n_limbs]
    return (
        _per_limb(r32.addmod, ct1[0], ct2[0], moduli),
        _per_limb(r32.addmod, ct1[1], ct2[1], moduli),
    )


def mul_plain(ct, pt, cfg: HEConfig = DEFAULT_CONFIG):
    """(a*pt, b*pt) limb-wise pointwise (NTT domain), packed planes."""
    moduli = cfg.moduli[: cfg.n_limbs]
    return (
        _per_limb(r32.mulmod, ct[0], pt, moduli),
        _per_limb(r32.mulmod, ct[1], pt, moduli),
    )


def encode_post(pt_coeff, cfg: HEConfig = DEFAULT_CONFIG):
    outs = [
        _nt(pt_coeff[..., i, :, :], cfg.moduli[i], cfg.psi[i], False)
        for i in range(cfg.n_limbs)
    ]
    return jnp.stack(outs, axis=-3)


def rotate(ct, step: int, ksk, cfg: HEConfig = DEFAULT_CONFIG):
    """Slot rotation (automorphism + hybrid key-switch) on packed planes.

    ksk: (2L(L+1), N, 2) packed planes, reference layout (use
    `from_u64(ksk_u64)`); see he_np.rotate for the algorithm and the
    keyswitch.mem correspondence.
    """
    a, b = ct
    n = a.shape[-2]
    step_exp = pow(3, step, 2 * n)
    moduli = cfg.moduli
    L = cfg.n_limbs
    sp = cfg.special_prime
    half = (sp - 1) // 2

    digits, a_aut = [], []
    for m in range(L):
        pair = _nt(
            jnp.stack([b[..., m, :, :], a[..., m, :, :]], axis=-3),
            moduli[m],
            cfg.ipsi[m],
            True,
        )
        digits.append(automorphism(pair[..., 0, :, :], step_exp, moduli[m]))
        a_aut.append(automorphism(pair[..., 1, :, :], step_exp, moduli[m]))

    nd = [[None] * (L + 1) for _ in range(L)]
    for m in range(L + 1):
        polys = []
        for j, d in enumerate(digits):
            if m == j:
                x = d
            elif moduli[m] > moduli[j]:
                x = r32.lazy_reduce(d, moduli[m])
            else:
                x = r32.modred(d, moduli[m])
            polys.append(x)
        if m < L:
            polys.append(a_aut[m])
        stacked = _nt(
            jnp.stack(polys, axis=-3), moduli[m], cfg.psi[m], False
        )
        for j in range(L):
            nd[j][m] = stacked[..., j, :, :]
        if m < L:
            a_aut[m] = stacked[..., L, :, :]

    stride = 2 * L

    def inner(m, part):
        q = moduli[m]
        acc = r32.mulmod(nd[0][m], ksk[stride * m + part], q)
        for j in range(1, L):
            acc = r32.addmod(
                acc,
                r32.mulmod(nd[j][m], ksk[stride * m + 2 * j + part], q),
                q,
            )
        return acc

    c = [[inner(m, part) for part in (0, 1)] for m in range(L + 1)]

    p_pair = _nt(
        jnp.stack([c[L][0], c[L][1]], axis=-3), sp, cfg.ipsi[-1], True
    )
    m_coeff = [
        r32.addmod_scalar(p_pair[..., part, :, :], half, sp)
        for part in (0, 1)
    ]
    ks = [[None, None] for _ in range(L)]
    for m in range(L):
        q = moduli[m]
        pinv = cfg.pinv_mod(m)
        corr2 = _nt(
            jnp.stack(
                [r32.submod_scalar(m_coeff[p], half, q) for p in (0, 1)],
                axis=-3,
            ),
            q,
            cfg.psi[m],
            False,
        )
        for part in (0, 1):
            t = r32.submod(c[m][part], corr2[..., part, :, :], q)
            ks[m][part] = r32.mulmod_scalar(t, pinv, q)

    a_rot = jnp.stack(
        [r32.addmod(a_aut[m], ks[m][0], moduli[m]) for m in range(L)],
        axis=-3,
    )
    b_rot = jnp.stack([ks[m][1] for m in range(L)], axis=-3)
    return (a_rot, b_rot)
