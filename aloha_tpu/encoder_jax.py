"""TPU-native (jittable, batched) fixed-point encoder.

The device form of `aloha_tpu.encoder_hw` — bit-identical arithmetic,
expressed as XLA-friendly int64 tensor ops so encode runs ON the chip,
batched, instead of on the host one cleartext at a time (the reference
encoder is itself a hardware pipeline fed by DMA cmd 2; reference:
src/encoder/controller.sv:225-645, and docs/ENCODER.md for the decoded
structure).  Design choices for the TPU:

* the st1 half-spectrum store (3^k walk + conjugation, addr_gen.sv) and
  the per-channel bank reads (pp_st1.sv) COMPOSE into one static gather
  + sign plane per channel, built once per ring size on the host — no
  scatter, no data-dependent control flow;
* the four 2048-pt 34-bit inverse FFTs run as one (batch, 4, L)-shaped
  radix-2^2 level loop (python-unrolled: 5 stage pairs + 1 radix-2 —
  static trip count, static shapes), with the same convergent-rounding
  arithmetic as encoder_hw (products split at 16 bits so everything
  stays inside int64 — exact under XLA's i64 emulation on TPU);
* the cmpy combine and sign-fix are elementwise int64 ops.

Bit-identity to encoder_hw.encode is pinned by tests/test_encoder_jax.py
(and encoder_hw itself is pinned to the reference's true RTL dumps —
97.9% word-exact with the residual attributed to shipped-input
precision; docs/ENCODER.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from aloha_tpu import encoder_hw as H
from aloha_tpu.config import DEFAULT_CONFIG, HEConfig

# x64 is required for the int64 fixed-point arithmetic but must stay
# LEXICAL: the Pallas kernels trace with x64 disabled (CLAUDE.md), so
# the public entry points wrap trace-time in jax.enable_x64(True)
# instead of mutating global config at import.

I64 = jnp.int64


# ---------------------------------------------------------- static tables
@functools.lru_cache(maxsize=None)
def _channel_gather_np(n: int):
    """Compose st1 store (slot k -> address/conj) with the per-channel
    bank reads into direct gathers from the quantized slot arrays:

        x_c[j].re = z_re[src[c, j]]
        x_c[j].im = sgn[c, j] * z_im[src[c, j]]

    src: (4, n/4) int32 slot indices; sgn: (4, n/4) int64 in {-1, +1}.
    (reference: addr_gen.sv:36-60 + cnt.sv:71-113 + pp_st1.sv:45-114)"""
    S = n // 2
    M = 2 * n
    # st1[a] = z[st_src[a]] with im sign st_sgn[a]
    st_src = np.zeros(S, dtype=np.int64)
    st_sgn = np.zeros(S, dtype=np.int64)
    v3 = 1
    for k in range(S):
        t = (v3 - 1) // 2
        if t < S:
            st_src[t], st_sgn[t] = k, -1
        else:
            st_src[n - 1 - t], st_sgn[n - 1 - t] = k, +1
        v3 = v3 * 3 % M
    # channel c: bank c ascending, then bank 3-c descending conjugated
    Lc = S // 4
    j = np.arange(Lc)
    jr = np.arange(Lc - 1, -1, -1)
    src = np.zeros((4, 2 * Lc), dtype=np.int32)
    sgn = np.zeros((4, 2 * Lc), dtype=np.int64)
    for c in range(4):
        a_up = 4 * j + c
        a_dn = 4 * jr + (3 - c)
        src[c, :Lc] = st_src[a_up]
        sgn[c, :Lc] = st_sgn[a_up]
        src[c, Lc:] = st_src[a_dn]
        sgn[c, Lc:] = -st_sgn[a_dn]
    return src, sgn


@functools.lru_cache(maxsize=None)
def _fft_consts(L: int):
    """Per-level phase-factor planes + the output reorder, as numpy."""
    levels = []
    Lc = L
    while Lc > 2:
        tws = H._tw_tables(Lc)
        levels.append(
            (
                Lc,
                {q: (tws[q][0].copy(), tws[q][1].copy()) for q in (1, 2, 3)},
            )
        )
        Lc //= 4
    return levels, H._dit_perm(L).copy()


# ------------------------------------------------------------- arithmetic
def _shr_conv(v, s: int):
    """Convergent (half-to-even) rounding of v / 2^s on int64 tensors."""
    q = v >> s
    frac = v & ((1 << s) - 1)
    half = 1 << (s - 1)
    tie_up = (frac == half) & ((q & 1) == 1)
    return q + (frac > half).astype(I64) + tie_up.astype(I64)


def _cmul_shr_conv(vr, vi, wr, wi, s: int):
    """Convergent-rounded (v * w) >> s on complex int64 pairs; 16-bit
    twiddle splits keep every product inside int64 (same chain as
    encoder_hw._cmul_shift_conv)."""
    def raw(v, w):
        return v * (w >> 16), v * (w & 0xFFFF)

    ar_hi, ar_lo = raw(vr, wr)
    bi_hi, bi_lo = raw(vi, wi)
    cr_hi, cr_lo = raw(vr, wi)
    di_hi, di_lo = raw(vi, wr)
    re_hi, re_lo = ar_hi - bi_hi, ar_lo - bi_lo
    im_hi, im_lo = cr_hi + di_hi, cr_lo + di_lo

    def fin(hi, lo):
        q1 = hi + (lo >> 16)
        rem = lo & 0xFFFF
        k = s - 16
        qf = q1 >> k
        frac = ((q1 & ((1 << k) - 1)) << 16) | rem
        half = 1 << (s - 1)
        tie_up = (frac == half) & ((qf & 1) == 1)
        return qf + (frac > half).astype(I64) + tie_up.astype(I64)

    return fin(re_hi, re_lo), fin(im_hi, im_lo)


def xfft(xr, xi):
    """The 34-bit scaled radix-2^2 inverse FFT over the last axis
    ((..., L) int64 in, natural-order out) — jittable; arithmetic
    identical to encoder_hw.xfft2048."""
    with jax.enable_x64(True):
        return _xfft_impl(xr, xi)


def _xfft_impl(xr, xi):
    L = xr.shape[-1]
    lead = xr.shape[:-1]
    levels, perm = _fft_consts(L)
    vr = xr.reshape(lead + (1, L))
    vi = xi.reshape(lead + (1, L))
    for Lc, tws in levels:
        Lq = Lc // 4
        a_r, b_r, c_r, d_r = (vr[..., i * Lq:(i + 1) * Lq] for i in range(4))
        a_i, b_i, c_i, d_i = (vi[..., i * Lq:(i + 1) * Lq] for i in range(4))
        t0r, t0i = a_r + c_r, a_i + c_i
        t1r, t1i = b_r + d_r, b_i + d_i
        u0r, u0i = a_r - c_r, a_i - c_i
        u1r, u1i = b_r - d_r, b_i - d_i
        raw = [
            (t0r + t1r, t0i + t1i),
            (u0r - u1i, u0i + u1r),
            (t0r - t1r, t0i - t1i),
            (u0r + u1i, u0i - u1r),
        ]
        sub = [(_shr_conv(raw[0][0], 2), _shr_conv(raw[0][1], 2))]
        for q in (1, 2, 3):
            wr = jnp.asarray(tws[q][0])
            wi = jnp.asarray(tws[q][1])
            sub.append(_cmul_shr_conv(raw[q][0], raw[q][1], wr, wi, 35))
        vr = jnp.stack([s[0] for s in sub], axis=-2).reshape(lead + (-1, Lq))
        vi = jnp.stack([s[1] for s in sub], axis=-2).reshape(lead + (-1, Lq))
    er = jnp.stack(
        [
            _shr_conv(vr[..., 0] + vr[..., 1], 1),
            _shr_conv(vr[..., 0] - vr[..., 1], 1),
        ],
        -1,
    ).reshape(lead + (L,))
    ei = jnp.stack(
        [
            _shr_conv(vi[..., 0] + vi[..., 1], 1),
            _shr_conv(vi[..., 0] - vi[..., 1], 1),
        ],
        -1,
    ).reshape(lead + (L,))
    src = jnp.asarray(perm)
    return er[..., src], ei[..., src]


def _combine_trunc(Fr, Fi, Tr, Ti):
    """sum_c trunc((F * T).re >> 28) over the channel axis (axis -2) —
    the per-product cmpy truncation (cmpy_0: RoundMode=Truncate)."""
    re_hi = Fr * (Tr >> 16) - Fi * (Ti >> 16)
    re_lo = Fr * (Tr & 0xFFFF) - Fi * (Ti & 0xFFFF)
    q1 = re_hi + (re_lo >> 16)
    return (q1 >> 12).sum(axis=-2)


# ------------------------------------------------------------ the pipeline
def encode(
    cleartext,
    cfg: HEConfig = DEFAULT_CONFIG,
) -> jnp.ndarray:
    """Batched device encode: (..., N) interleaved re/im fp64 cleartext
    -> (..., n_limbs, N) uint64 coefficient-domain plaintext, bit-identical
    to encoder_hw.encode(combine="rtl") per batch element.  Jittable."""
    if cfg.n != 8192:
        raise NotImplementedError(
            "the encoder hardware pipeline is fixed at N = 8192 "
            "(4 channels x 2048-pt FFTs, reference: src/encoder/)"
        )
    with jax.enable_x64(True):
        return _encode_impl(cleartext, cfg)


def _encode_impl(cleartext, cfg: HEConfig):
    c = jnp.asarray(cleartext, dtype=jnp.float64)
    lead = c.shape[:-1]
    z_re = jnp.rint(c[..., 0::2] * 2.0**32).astype(I64)
    z_im = jnp.rint(c[..., 1::2] * 2.0**32).astype(I64)
    src, sgn = _channel_gather_np(cfg.n)
    xr = z_re[..., jnp.asarray(src)]
    xi = z_im[..., jnp.asarray(src)] * jnp.asarray(sgn)
    Fr, Fi = _xfft_impl(xr, xi)  # (..., 4, 2048)
    T = H.get_combine_roms(cfg.n)  # (4, 4, 2048, 2)
    rows = [
        _combine_trunc(
            Fr, Fi,
            jnp.asarray(T[:, r, :, 0]), jnp.asarray(T[:, r, :, 1]),
        )
        for r in range(4)
    ]
    m = jnp.concatenate(rows, axis=-1)  # (..., 8192), coefficient i = 2048r+k
    out = [
        jnp.where(m < 0, m + q, m).astype(jnp.uint64)
        for q in (cfg.moduli[limb] for limb in range(cfg.n_limbs))
    ]
    return jnp.stack(out, axis=len(lead))
