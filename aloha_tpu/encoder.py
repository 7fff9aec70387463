"""CKKS encoder: cleartext slots -> RNS plaintext coefficients.

The reference implements encode as a dedicated fixed-point pipeline feeding
the SPM (reference: src/encoder/): fp64 -> Q1.32 quantize -> four 2048-pt
34-bit fixed IFFTs (scaled 1/2048, convergent rounding; config word
controller.sv:358) -> 4x4 twiddle-matrix combine (16 cmpy, tf_buf ROMs) ->
real part -> sign-fix x<0 -> x+q (controller.sv:643) -> SPM rows per limb.
The VP then NTTs the result (`encode_post`).

Semantics (established empirically against tv/ golden vectors,
tests/test_encoder.py):

  * the cleartext file holds 4096 complex slots INTERLEAVED:
    z_k = file[2k] + i*file[2k+1]
  * slot k lives at evaluation point zeta^(3^k), zeta = e^(i*pi/N) the
    primitive 2N-th root (the same 3^k orbit the rotation automorphism
    walks; the hardware's ecd_addr_gen computes the (3^k-1)/2 position
    map, reference: src/encoder/addr_gen.sv)
  * effective scale Delta = 2^38 (Q1.32 quantization x the pipeline's
    4-channel gain): m(zeta^(3^k)) ~= Delta * z_k

This module provides the *float* implementation: exact inverse canonical
embedding in float64, then round-to-nearest.  It reproduces the reference
values to ~1e-6 relative (|error| <~ 256 out of ~2^28-scale coefficients,
the reference's own 34-bit fixed-point FFT rounding noise).  A bit-exact
emulation of the fixed-point pipeline is tracked as future work; every
other component of this framework is bit-exact today.
"""

from __future__ import annotations

import functools

import numpy as np

from aloha_tpu.config import DEFAULT_CONFIG, HEConfig

#: Effective encode scale of the reference pipeline.
DELTA_LOG2 = 38
DELTA = float(1 << DELTA_LOG2)


@functools.lru_cache(maxsize=None)
def _slot_positions(n: int):
    """t_k = (3^k - 1)/2: spectrum position of slot k (and its mirror)."""
    m = 2 * n
    t = np.empty(n // 2, dtype=np.int64)
    v = 1
    for k in range(n // 2):
        t[k] = (v - 1) // 2
        v = (v * 3) % m
    return t


def slots_from_cleartext(cleartext: np.ndarray) -> np.ndarray:
    """Interleaved re/im file image -> complex slot vector (n/2,)."""
    c = np.asarray(cleartext, dtype=np.float64).ravel()
    if c.size % 2:
        raise ValueError(
            f"cleartext length {c.size} is odd; expected interleaved "
            "re/im pairs"
        )
    return c[0::2] + 1j * c[1::2]


def cleartext_from_slots(z: np.ndarray) -> np.ndarray:
    out = np.empty(2 * z.size, dtype=np.float64)
    out[0::2] = z.real
    out[1::2] = z.imag
    return out


def encode(
    cleartext: np.ndarray, cfg: HEConfig = DEFAULT_CONFIG
) -> np.ndarray:
    """Cleartext image (N floats = n/2 interleaved re/im slot pairs)
    -> (n_limbs, N) uint64.

    Coefficient-domain RNS plaintext (run `encode_post` / he.encode_post to
    move it to the NTT domain).
    """
    n = cfg.n
    z = slots_from_cleartext(cleartext)
    if z.size != n // 2:
        raise ValueError(f"expected {n // 2} slots, got {z.size}")
    t = _slot_positions(n)
    spectrum = np.zeros(n, dtype=np.complex128)
    spectrum[t] += z
    np.add.at(spectrum, n - 1 - t, np.conj(z))
    i = np.arange(n)
    twist = np.exp(-1j * np.pi * i / n)
    m_float = (twist * np.fft.fft(spectrum)).real * (DELTA / n)
    m_int = np.rint(m_float).astype(np.int64)
    out = np.empty((cfg.n_limbs, n), dtype=np.uint64)
    for limb in range(cfg.n_limbs):
        q = cfg.moduli[limb]
        # sign-fix: x < 0 -> x + q (reference: controller.sv:643)
        out[limb] = np.where(
            m_int < 0, m_int + q, m_int
        ).astype(np.uint64)
    return out


def decode(
    pt_coeff: np.ndarray, cfg: HEConfig = DEFAULT_CONFIG, limb: int = 0
) -> np.ndarray:
    """(.., N) coefficient-domain residues (one limb) -> complex slots."""
    n = cfg.n
    q = cfg.moduli[limb]
    m = np.asarray(pt_coeff, dtype=np.uint64).reshape(-1, n)[limb if pt_coeff.ndim > 1 else 0]
    mc = np.where(m > q // 2, m.astype(np.float64) - float(q), m.astype(np.float64))
    i = np.arange(n)
    v = n * np.fft.ifft(mc * np.exp(1j * np.pi * i / n))
    return v[_slot_positions(n)] / DELTA
