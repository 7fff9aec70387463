"""Ciphertext-level HE operations — JAX/TPU functional path.

The jit-facing mirror of `aloha_tpu.he_np` (same algorithms, same
bit-exact semantics, certified against it by tests/test_he_jax.py): hom_add,
mul_plain, encode_post, and rotation with hybrid key-switching
(reference programs: sim/vp/isram_file_generator/*.mem — see he_np for the
step-by-step correspondence).

Data model: a ciphertext is a pair of uint64 arrays shaped (..., L, N)
(leading axes = batch), NTT domain, bit-reversed order; a plaintext is
(..., L, N).  All functions are pure and jittable; under `jax.jit` with
sharded inputs the GSPMD partitioner distributes them over a device mesh
(see aloha_tpu.parallel for the mesh/sharding layer).

Being batch-polymorphic over leading axes is the TPU-native throughput
story: one rotate() call over a (B, L, N) batch keeps every vector unit
busy, where the reference streams ciphertexts one at a time through its
128 lanes.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from aloha_tpu import ntt_jax
from aloha_tpu import rns_xla as r
from aloha_tpu.ops import dispatch as nt_dispatch


class _NT:
    """Indirection so rotate/encode_post pick up the dispatcher's NTT
    implementation (xla or pallas) at trace time; automorphism/rotate_lanes
    stay on the XLA path (index-map ops)."""

    @staticmethod
    def ntt(a, q, psi):
        return nt_dispatch.ntt(a, q, psi)

    @staticmethod
    def intt(a, q, ipsi):
        return nt_dispatch.intt(a, q, ipsi)

    automorphism = staticmethod(ntt_jax.automorphism)
    rotate_lanes = staticmethod(ntt_jax.rotate_lanes)


nt = _NT
from aloha_tpu.config import DEFAULT_CONFIG, HEConfig


def _per_limb(fn, a, b, moduli):
    """Apply fn(a_limb, b_limb, q) over the limb axis (-2)."""
    outs = [
        fn(a[..., i, :], b[..., i, :], q) for i, q in enumerate(moduli)
    ]
    return jnp.stack(outs, axis=-2)


def hom_add(ct1, ct2, cfg: HEConfig = DEFAULT_CONFIG):
    """(a1+a2, b1+b2) limb-wise; cts are (a, b) tuples of (..., L, N)."""
    moduli = cfg.moduli[: cfg.n_limbs]
    return (
        _per_limb(r.addmod, ct1[0], ct2[0], moduli),
        _per_limb(r.addmod, ct1[1], ct2[1], moduli),
    )


def add_plain(ct, pt, cfg: HEConfig = DEFAULT_CONFIG):
    """ct + pt into the message part (he_np.add_plain semantics)."""
    moduli = cfg.moduli[: cfg.n_limbs]
    return (_per_limb(r.addmod, ct[0], pt, moduli), ct[1])


def mul_plain(ct, pt, cfg: HEConfig = DEFAULT_CONFIG):
    """(a*pt, b*pt) limb-wise pointwise (NTT domain)."""
    moduli = cfg.moduli[: cfg.n_limbs]
    return (
        _per_limb(r.mulmod, ct[0], pt, moduli),
        _per_limb(r.mulmod, ct[1], pt, moduli),
    )


def encode_post(pt_coeff, cfg: HEConfig = DEFAULT_CONFIG):
    """Per-limb forward NTT of an encoded (coefficient-domain) plaintext."""
    outs = [
        nt.ntt(pt_coeff[..., i, :], cfg.moduli[i], cfg.psi[i])
        for i in range(cfg.n_limbs)
    ]
    return jnp.stack(outs, axis=-2)


def encode(cleartext, cfg: HEConfig = DEFAULT_CONFIG):
    """Full device encode: (..., N) interleaved re/im fp64 cleartext ->
    (..., n_limbs, N) NTT-domain plaintext, batched and jittable — the
    TPU form of the reference's encoder-pipeline DMA op + encode_post
    (reference: src/encoder/controller.sv + encode_post.mem).  The
    fixed-point stage is bit-identical to the RTL-faithful emulation
    (aloha_tpu.encoder_jax)."""
    from aloha_tpu import encoder_jax

    return encode_post(encoder_jax.encode(cleartext, cfg), cfg)


def rotate(ct, step: int, ksk, cfg: HEConfig = DEFAULT_CONFIG):
    """Slot rotation: automorphism X -> X^(3^step) + hybrid key-switch.

    ksk: (12, N) uint64, NTT domain, reference KSK layout
    [m0d0a, m0d0b, m0d1a, m0d1b, m1...] (see he_np.rotate).
    `step` is the slot amount (python int; the automorphism exponent
    3^step mod 2N is folded in at trace time).
    """
    a, b = ct
    n = a.shape[-1]
    step_exp = pow(3, step, 2 * n)
    return _rotate_exp(ct, step_exp, ksk, cfg)


def _rotate_exp(ct, step_exp, ksk, cfg: HEConfig):
    a, b = ct
    moduli = cfg.moduli
    L = cfg.n_limbs
    sp = cfg.special_prime
    half = (sp - 1) // 2

    # 1. digits: d_j = aut(INTT(b_qj)), coefficient domain; also the
    #    aut(a) coefficient polys (computed here so step 5's NTTs can
    #    batch with this stage's per-modulus calls)
    digits, a_aut = [], []
    for m in range(L):
        pair = nt.intt(
            jnp.stack([b[..., m, :], a[..., m, :]], axis=-2),
            moduli[m],
            cfg.ipsi[m],
        )
        digits.append(
            nt.automorphism(pair[..., 0, :], step_exp, moduli[m])
        )
        a_aut.append(
            nt.automorphism(pair[..., 1, :], step_exp, moduli[m])
        )

    # 2. raise digits to every modulus; batch each modulus' NTTs into one
    #    call (the Pallas kernel amortizes per-launch cost over the batch)
    nd = [[None] * (L + 1) for _ in range(L)]
    for m in range(L + 1):
        polys = []
        for j, d in enumerate(digits):
            if m == j:
                x = d
            elif moduli[m] > moduli[j]:
                x = r.lazy_reduce(d, moduli[m])  # vcpy semantics
            else:
                x = r.modred(d, moduli[m])  # vfqmod semantics
            polys.append(x)
        if m < L:
            polys.append(a_aut[m])
        stacked = nt.ntt(jnp.stack(polys, axis=-2), moduli[m], cfg.psi[m])
        for j in range(L):
            nd[j][m] = stacked[..., j, :]
        if m < L:
            a_aut[m] = stacked[..., L, :]  # now NTT domain

    # 3. KSK inner products per modulus (stride 2L polys per modulus)
    stride = 2 * L

    def inner(m, part):
        q = moduli[m]
        acc = r.mulmod(nd[0][m], ksk[stride * m + part], q)
        for j in range(1, L):
            acc = r.addmod(
                acc, r.mulmod(nd[j][m], ksk[stride * m + 2 * j + part], q), q
            )
        return acc

    c = [[inner(m, part) for part in (0, 1)] for m in range(L + 1)]

    # 4. mod-down by P with (P-1)/2 rounding, scale by P^-1 mod q
    p_pair = nt.intt(
        jnp.stack([c[L][0], c[L][1]], axis=-2), sp, cfg.ipsi[-1]
    )
    m_coeff = [
        r.addmod(p_pair[..., part, :], r.u64(half), sp) for part in (0, 1)
    ]
    ks = [[None, None] for _ in range(L)]
    for m in range(L):
        q = moduli[m]
        pinv = cfg.pinv_mod(m)
        corr2 = nt.ntt(
            jnp.stack(
                [r.submod(m_coeff[p], r.u64(half), q) for p in (0, 1)],
                axis=-2,
            ),
            q,
            cfg.psi[m],
        )
        for part in (0, 1):
            t = r.submod(c[m][part], corr2[..., part, :], q)
            ks[m][part] = r.mulmod(t, jnp.broadcast_to(r.u64(pinv), t.shape), q)

    # 5. rotated message part: aut(a) (NTT'd in step 2's batched calls)
    #    + key-switch a-part
    a_rot = jnp.stack(
        [r.addmod(a_aut[m], ks[m][0], moduli[m]) for m in range(L)], axis=-2
    )
    b_rot = jnp.stack([ks[m][1] for m in range(L)], axis=-2)
    return (a_rot, b_rot)


# ---- leveled-multiply flow: u64 wrappers over the plane path ----------
# (he_planes holds the native implementations; these keep the u64 API
# complete for users of this module.  Bit-identical to he_np.)
def ct_mul(ct1, ct2, cfg: HEConfig = DEFAULT_CONFIG):
    """Ciphertext x ciphertext tensor product -> (d0, d1, d2), uint64."""
    from aloha_tpu import he_planes as hp

    d0, d1, d2 = hp.ct_mul(
        (hp.from_u64(ct1[0]), hp.from_u64(ct1[1])),
        (hp.from_u64(ct2[0]), hp.from_u64(ct2[1])), cfg,
    )
    return hp.to_u64(d0), hp.to_u64(d1), hp.to_u64(d2)


def relinearize(d0, d1, d2, rlk, cfg: HEConfig = DEFAULT_CONFIG):
    """Fold the s^2 component back to degree 1 (uint64 surface)."""
    from aloha_tpu import he_planes as hp

    a, b = hp.relinearize(
        hp.from_u64(d0), hp.from_u64(d1), hp.from_u64(d2),
        hp.from_u64(rlk), cfg,
    )
    return hp.to_u64(a), hp.to_u64(b)


def rescale(ct, cfg: HEConfig = DEFAULT_CONFIG):
    """Drop the last limb: round(c / q_last) (uint64 surface)."""
    from aloha_tpu import he_planes as hp

    a, b = hp.rescale((hp.from_u64(ct[0]), hp.from_u64(ct[1])), cfg)
    return hp.to_u64(a), hp.to_u64(b)


def rotate_hoisted(ct, steps, ksks, cfg: HEConfig = DEFAULT_CONFIG):
    """Many rotations of one ciphertext sharing a single key-switch
    head (uint64 surface; he_planes.rotate_hoisted holds the native
    implementation, he_np.rotate_hoisted is the oracle)."""
    from aloha_tpu import he_planes as hp

    outs = hp.rotate_hoisted(
        (hp.from_u64(ct[0]), hp.from_u64(ct[1])),
        steps, [hp.from_u64(k) for k in ksks], cfg,
    )
    return [(hp.to_u64(a), hp.to_u64(b)) for a, b in outs]


def rotate_batch(cts, steps, ksks, cfg: HEConfig = DEFAULT_CONFIG):
    """Rotate K different ciphertexts (each by its own step/key) in two
    kernel launches total (uint64 surface; he_planes.rotate_batch is the
    native implementation — the BSGS giant-step shape)."""
    from aloha_tpu import he_planes as hp

    outs = hp.rotate_batch(
        [(hp.from_u64(a), hp.from_u64(b)) for a, b in cts],
        steps, [hp.from_u64(k) for k in ksks], cfg,
    )
    return [(hp.to_u64(a), hp.to_u64(b)) for a, b in outs]
