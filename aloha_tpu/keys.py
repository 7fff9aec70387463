"""Key generation, encryption, decryption — host-side (NumPy).

The reference accelerator consumes externally generated keys (KSK images
DMA'd into its key memory, reference: sim/top/top_noaxilite_tb.sv:372-393;
tv/*/ksk_step*.txt) and never generates them.  A complete framework needs
the full lifecycle, so this module provides RNS-CKKS key generation that
emits key-switch keys in the *exact memory layout the accelerator expects*
([m0d0a, m0d0b, m0d1a, m0d1b, m1...], certified against the tv/ dumps by
tests/test_he_tv.py::test_ksk_layout), plus RLWE encrypt/decrypt used by
the end-to-end homomorphic-correctness tests.

Hybrid key-switching relations (2 digits {q0},{q1} + special prime P):

    digit_j(c) = [c]_{q_j}  (plain residue, as the accelerator's keyswitch
                             program decomposes, see he_np.rotate)
    c == sum_j digit_j(c) * e_j  (mod Q),  e_j the CRT idempotents
    KSK_j = (ka_j, kb_j) with  ka_j + kb_j*s_tgt == P*e_j*s_src + err
                                                   (mod q_m, every modulus)

so that sum_j d_j*KSK_j ~= P*(c's key part)*s_src, and the accelerator's
(P-1)/2-rounded mod-down (keyswitch.mem lines 79-110) divides P back out.
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional

import numpy as np

from aloha_tpu import ntt_np, rns_np
from aloha_tpu.config import DEFAULT_CONFIG, HEConfig
from aloha_tpu.he_np import Ciphertext


class SecureRng:
    """OS-entropy randomness for key material.

    Exposes the subset of the numpy Generator API the key module uses
    (`integers`, `normal`), sourced from os.urandom:

      * `integers` draws 128 bits of slack beyond the range's bit length
        before reducing, so modular bias is < 2^-128;
      * `normal` is Box-Muller over urandom-derived uniforms (discrete
        Gaussian rounding happens in the caller, as with numpy).

    Tests pass an explicit seeded numpy Generator for determinism; the
    default (rng=None) path uses this class so secret keys, KSK masks and
    encryption randomness are not predictable PCG64 output.
    """

    @staticmethod
    def _uniform_bits(nbits: int, size: int) -> np.ndarray:
        nbytes = (nbits + 7) // 8
        raw = os.urandom(nbytes * size)
        out = np.empty(size, dtype=object)
        for i in range(size):
            out[i] = int.from_bytes(raw[i * nbytes:(i + 1) * nbytes], "little")
        return out

    def integers(self, low, high, size=None, dtype=np.int64, endpoint=False):
        span = int(high) - int(low) + (1 if endpoint else 0)
        n = int(np.prod(size)) if size is not None else 1
        vals = self._uniform_bits(span.bit_length() + 128, n)
        out = np.array([int(v) % span + int(low) for v in vals], dtype=dtype)
        return out.reshape(size) if size is not None else out[0]

    def normal(self, loc=0.0, scale=1.0, size=None):
        n = int(np.prod(size)) if size is not None else 1
        m = (n + 1) // 2 * 2
        raw = np.frombuffer(os.urandom(8 * 2 * m), dtype=np.uint64)
        u = (raw >> np.uint64(11)).astype(np.float64) / float(1 << 53)
        u1 = np.clip(u[:m], 1e-300, 1.0)
        u2 = u[m:]
        r = np.sqrt(-2.0 * np.log(u1))
        z = np.concatenate(
            [r * np.cos(2 * np.pi * u2), r * np.sin(2 * np.pi * u2)]
        )[:n]
        z = loc + scale * z
        return z.reshape(size) if size is not None else z[0]


def _default_rng():
    return SecureRng()


@dataclasses.dataclass
class SecretKey:
    coeff: np.ndarray  # (N,) int64 in {-1, 0, 1}
    ntt: np.ndarray  # (n_moduli, N) uint64, NTT domain residues


def _to_residues(signed_coeff: np.ndarray, cfg: HEConfig) -> np.ndarray:
    """Signed integers -> residues under every modulus (incl. P)."""
    out = np.empty((len(cfg.moduli), cfg.n), dtype=np.uint64)
    for m, q in enumerate(cfg.moduli):
        out[m] = np.mod(signed_coeff, q).astype(np.uint64)
    return out


def gen_secret(cfg: HEConfig = DEFAULT_CONFIG, rng=None) -> SecretKey:
    rng = rng if rng is not None else _default_rng()
    coeff = rng.integers(-1, 2, size=cfg.n, dtype=np.int64)
    res = _to_residues(coeff, cfg)
    ntt = np.stack(
        [ntt_np.ntt(res[m], q, cfg.psi[m]) for m, q in enumerate(cfg.moduli)]
    )
    return SecretKey(coeff=coeff, ntt=ntt)


def _noise(cfg: HEConfig, rng, sigma: float = 3.2) -> np.ndarray:
    return np.rint(rng.normal(0.0, sigma, size=cfg.n)).astype(np.int64)


def _uniform_ntt(cfg: HEConfig, rng) -> np.ndarray:
    """One uniform *integer* polynomial mod prod(all moduli), returned as
    per-modulus NTT-domain residues.

    Sampling residues per modulus independently would not correspond to a
    single ring element; instead sample big integers and reduce.
    """
    moduli = cfg.moduli
    big_q = 1
    for q in moduli:
        big_q *= q
    bits = big_q.bit_length()
    n_chunks = (bits + 128 + 62) // 63  # 128 bits of slack: modular bias < 2^-128
    vals = np.zeros(cfg.n, dtype=object)
    for c in range(n_chunks):
        chunk = rng.integers(0, 1 << 63, size=cfg.n, dtype=np.uint64)
        vals = vals + (chunk.astype(object) << (63 * c))
    vals = vals % big_q
    out = np.empty((len(moduli), cfg.n), dtype=np.uint64)
    for m, q in enumerate(moduli):
        out[m] = (vals % q).astype(np.uint64)
        out[m] = ntt_np.ntt(out[m], q, cfg.psi[m])
    return out


def _crt_idempotents(cfg: HEConfig) -> List[int]:
    """e_j for the ciphertext limbs: e_j == 1 mod q_j, == 0 mod other limbs
    (as integers mod Q = prod of ciphertext limbs)."""
    L = cfg.n_limbs
    Q = 1
    for q in cfg.moduli[:L]:
        Q *= q
    out = []
    for j in range(L):
        qj = cfg.moduli[j]
        qhat = Q // qj
        out.append(qhat * pow(qhat, -1, qj) % Q)
    return out


def gen_ksk(
    s_src_coeff: np.ndarray,
    s_tgt: SecretKey,
    cfg: HEConfig = DEFAULT_CONFIG,
    rng=None,
) -> np.ndarray:
    """Key-switch key s_src -> s_tgt in the accelerator's memory layout.

    Returns (2*n_limbs*(n_limbs+1), N) uint64 ordered
    [m0d0a, m0d0b, m0d1a, m0d1b, ..., m1d0a, ...] (per modulus: the L
    digits' (a, b) pairs) — for the default 2-limb config this is the
    reference's 12-poly ksk_step*.txt image / KSK DMA format.
    """
    rng = rng if rng is not None else _default_rng()
    L = cfg.n_limbs
    nmod = L + 1
    sp = cfg.special_prime
    idem = _crt_idempotents(cfg)
    src_res = _to_residues(s_src_coeff, cfg)
    src_ntt = np.stack(
        [
            ntt_np.ntt(src_res[m], q, cfg.psi[m])
            for m, q in enumerate(cfg.moduli)
        ]
    )
    stride = 2 * L  # polys per modulus: L digits x (a, b)
    out = np.zeros((stride * nmod, cfg.n), dtype=np.uint64)
    for j in range(L):
        kb = _uniform_ntt(cfg, rng)
        err = _noise(cfg, rng)
        err_res = _to_residues(err, cfg)
        for m, q in enumerate(cfg.moduli):
            # P*e_j mod q_m: e_j == 1 mod q_j, == 0 mod other limbs, and
            # P == 0 mod P — so only the digit's own modulus is nonzero.
            pe = sp % q if m == j else 0
            target = rns_np.mulmod(
                src_ntt[m], np.uint64(pe), q
            )  # P*e_j*s_src (NTT domain)
            e_ntt = ntt_np.ntt(err_res[m], q, cfg.psi[m])
            target = rns_np.addmod(target, e_ntt, q)
            ka = rns_np.submod(
                target, rns_np.mulmod(kb[m], s_tgt.ntt[m], q), q
            )
            out[stride * m + 2 * j + 0] = ka
            out[stride * m + 2 * j + 1] = kb[m]
    return out


def gen_galois_key(
    sk: SecretKey, exp: int, cfg: HEConfig = DEFAULT_CONFIG, rng=None
) -> np.ndarray:
    """KSK for an arbitrary Galois automorphism X -> X^exp (exp odd):
    switches aut(s) back to s.  Rotation keys use exp = 3^step;
    conjugation uses exp = 2N - 1."""
    if exp % 2 == 0:
        raise ValueError("Galois exponent must be odd")
    # automorphism on the signed secret: coefficient permutation with sign
    n = cfg.n
    i = np.arange(n)
    jdx = (i * exp) % (2 * n)
    s_aut = np.zeros(n, dtype=np.int64)
    s_aut[jdx & (n - 1)] = np.where(jdx >= n, -sk.coeff, sk.coeff)
    return gen_ksk(s_aut, sk, cfg, rng)


def gen_rotation_key(
    sk: SecretKey, step: int, cfg: HEConfig = DEFAULT_CONFIG, rng=None
) -> np.ndarray:
    """KSK for the slot rotation by `step`: aut(s) -> s, aut = X -> X^(3^step)."""
    return gen_galois_key(sk, pow(3, step, 2 * cfg.n), cfg, rng)


def gen_conjugation_key(
    sk: SecretKey, cfg: HEConfig = DEFAULT_CONFIG, rng=None
) -> np.ndarray:
    """KSK for slot conjugation: aut = X -> X^(2N-1) (z_k -> conj(z_k))."""
    return gen_galois_key(sk, 2 * cfg.n - 1, cfg, rng)


def gen_relin_key(
    sk: SecretKey, cfg: HEConfig = DEFAULT_CONFIG, rng=None
) -> np.ndarray:
    """KSK for relinearization: s^2 -> s.

    s^2 is not ternary; gen_ksk takes signed coefficients, so compute the
    integer coefficients of s^2 in the negacyclic ring.
    """
    n = cfg.n
    s = sk.coeff
    # negacyclic convolution (exact, small ints)
    s2 = np.zeros(n, dtype=np.int64)
    for shift in range(n):  # O(n * nnz) — acceptable for ternary s
        c = s[shift]
        if c == 0:
            continue
        s2[shift:] += c * s[: n - shift]
        s2[:shift] -= c * s[n - shift :]
    return gen_ksk(s2, sk, cfg, rng)


def encrypt(
    m_signed: np.ndarray,
    sk: SecretKey,
    cfg: HEConfig = DEFAULT_CONFIG,
    rng=None,
) -> Ciphertext:
    """Symmetric RLWE encryption of signed coefficients (decrypt = a + b*s)."""
    rng = rng if rng is not None else _default_rng()
    L = cfg.n_limbs
    n = cfg.n
    b = np.empty((L, n), dtype=np.uint64)
    a = np.empty((L, n), dtype=np.uint64)
    e = _noise(cfg, rng)
    me = _to_residues(np.asarray(m_signed, dtype=np.int64) + e, cfg)
    for m, q in enumerate(cfg.moduli[:L]):
        b[m] = rng.integers(0, q, size=n, dtype=np.uint64)  # NTT domain
        msg_ntt = ntt_np.ntt(me[m], q, cfg.psi[m])
        a[m] = rns_np.submod(
            msg_ntt, rns_np.mulmod(b[m], sk.ntt[m], q), q
        )
    return Ciphertext(a=a, b=b)


def decrypt(
    ct: Ciphertext, sk: SecretKey, cfg: HEConfig = DEFAULT_CONFIG, limb: int = 0
) -> np.ndarray:
    """Signed (centered) coefficients of a + b*s under one limb."""
    q = cfg.moduli[limb]
    m_ntt = rns_np.addmod(
        ct.a[limb], rns_np.mulmod(ct.b[limb], sk.ntt[limb], q), q
    )
    m = ntt_np.intt(m_ntt, q, cfg.ipsi[limb])
    half = np.uint64(q // 2)
    return np.where(
        m > half, m.astype(np.int64) - np.int64(q), m.astype(np.int64)
    )
