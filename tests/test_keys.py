"""End-to-end homomorphic correctness with self-generated keys.

The reference consumes externally produced KSK images; these tests close
the loop: generate keys, encrypt, run the *accelerator's own bit-exact
pipelines* (he_np / the ISA replayer), decrypt, and check the plaintext
semantics (slot rotation, ct x ct multiply, rescale).
"""

import numpy as np
import pytest

from aloha_tpu import encoder, he_np as he, keys
from aloha_tpu.config import DEFAULT_CONFIG as CFG

N = CFG.n
S = N // 2
RNG = np.random.default_rng(1)


@pytest.fixture(scope="module")
def sk():
    return keys.gen_secret(CFG, np.random.default_rng(7))


def _centered(vals, q):
    v = vals.astype(np.int64)
    return np.where(vals > q // 2, v - np.int64(q), v)


def _encode_signed(z):
    pt = encoder.encode(encoder.cleartext_from_slots(z), CFG)
    return _centered(pt[0], CFG.moduli[0])


def _slots(ct, sk):
    m = keys.decrypt(ct, sk, CFG)
    res = np.where(m < 0, m + np.int64(CFG.moduli[0]), m).astype(np.uint64)
    return encoder.decode(res[None, :], CFG, limb=0)


def test_encrypt_decrypt_roundtrip(sk):
    m = RNG.integers(-(1 << 30), 1 << 30, size=N, dtype=np.int64)
    ct = keys.encrypt(m, sk, CFG, np.random.default_rng(2))
    got = keys.decrypt(ct, sk, CFG)
    assert np.abs(got - m).max() < 64  # fresh-encryption noise only


def test_encrypt_decrypt_both_limbs_consistent(sk):
    m = RNG.integers(-(1 << 30), 1 << 30, size=N, dtype=np.int64)
    ct = keys.encrypt(m, sk, CFG, np.random.default_rng(3))
    g0 = keys.decrypt(ct, sk, CFG, limb=0)
    g1 = keys.decrypt(ct, sk, CFG, limb=1)
    assert (g0 == g1).all()


def test_rotation_with_generated_key(sk):
    z = RNG.uniform(-1, 1, size=S) + 1j * RNG.uniform(-1, 1, size=S)
    ct = keys.encrypt(_encode_signed(z), sk, CFG, np.random.default_rng(4))
    step = 2
    ksk = keys.gen_rotation_key(sk, step, CFG, np.random.default_rng(5))
    ct_rot = he.rotate(ct, step, ksk, CFG)
    got = _slots(ct_rot, sk)
    want = np.roll(z, -step)
    assert np.abs(got - want).max() < 1e-4  # key-switch noise over Delta


def test_rotation_key_through_isa_replay(sk):
    """The generated KSK drives the bit-exact ISA keyswitch program too."""
    from aloha_tpu.runtime.device import AlohaDevice

    z = RNG.uniform(-1, 1, size=S) + 1j * RNG.uniform(-1, 1, size=S)
    ct = keys.encrypt(_encode_signed(z), sk, CFG, np.random.default_rng(6))
    step = 4
    ksk = keys.gen_rotation_key(sk, step, CFG, np.random.default_rng(8))
    dev = AlohaDevice(CFG)
    dev.dma_load_ksk(ksk, row=(2 - 1) * 12 * dev.poly_rows)  # slot for step 4
    dev.load_cipher(0, ct.to_flat())
    dev.run_rotate(dest=256, src=0, step=step)
    out = he.Ciphertext.from_flat(dev.store_cipher(256))
    got = _slots(out, sk)
    want = np.roll(z, -step)
    assert np.abs(got - want).max() < 1e-4
    # and the device result matches the functional path word-for-word
    func = he.rotate(ct, step, ksk, CFG)
    assert (out.to_flat() == func.to_flat()).all()


def test_rotate_any_composition(sk):
    """Arbitrary-step rotation at the DEVICE level: run_rotate_any
    composes power-of-two keyswitches (step 5 = 1 + 4) and lands
    word-identical to the functional composition."""
    from aloha_tpu.runtime.device import AlohaDevice

    z = RNG.uniform(-1, 1, size=S) + 1j * RNG.uniform(-1, 1, size=S)
    ct = keys.encrypt(_encode_signed(z), sk, CFG, np.random.default_rng(14))
    ksk = {
        c: keys.gen_rotation_key(sk, c, CFG, np.random.default_rng(20 + c))
        for c in (1, 4)
    }
    dev = AlohaDevice(CFG)
    for c, k in ksk.items():
        dev.dma_load_ksk(k, row=dev.rotation_ksk_ptr(c))
    dev.load_cipher(0, ct.to_flat())
    dev.run_rotate_any(dest=256, src=0, step=5, scratch=512)
    out = he.Ciphertext.from_flat(dev.store_cipher(256))
    got = _slots(out, sk)
    assert np.abs(got - np.roll(z, -5)).max() < 1e-4
    func = he.rotate(he.rotate(ct, 1, ksk[1], CFG), 4, ksk[4], CFG)
    assert (out.to_flat() == func.to_flat()).all()
    # single-bit steps need no scratch
    dev.run_rotate_any(dest=256, src=0, step=4)
    single = he.Ciphertext.from_flat(dev.store_cipher(256))
    assert (
        single.to_flat() == he.rotate(ct, 4, ksk[4], CFG).to_flat()
    ).all()


def _slots_crt(ct, sk, scale_log2):
    """Decode a ciphertext whose coefficients exceed one limb (e.g. a
    Delta^2-scaled product): CRT-reconstruct over both limbs, center mod Q,
    then evaluate slots at the usual scale."""
    q0, q1 = CFG.moduli[0], CFG.moduli[1]
    m0 = keys.decrypt(ct, sk, CFG, limb=0)
    m1 = keys.decrypt(ct, sk, CFG, limb=1)
    r0 = np.where(m0 < 0, m0 + np.int64(q0), m0).astype(object)
    r1 = np.where(m1 < 0, m1 + np.int64(q1), m1).astype(object)
    Q = q0 * q1
    c0 = q1 * pow(q1, -1, q0)
    c1 = q0 * pow(q0, -1, q1)
    x = (r0 * c0 + r1 * c1) % Q
    x = np.where(x > Q // 2, x - Q, x)
    mc = (x / float(2**scale_log2)).astype(np.float64)
    n = CFG.n
    i = np.arange(n)
    v = n * np.fft.ifft(mc * np.exp(1j * np.pi * i / n))
    return v[encoder._slot_positions(n)]


def test_ct_mul_relinearize(sk):
    z1 = RNG.uniform(-1, 1, size=S) + 1j * RNG.uniform(-1, 1, size=S)
    z2 = RNG.uniform(-1, 1, size=S) + 1j * RNG.uniform(-1, 1, size=S)
    ct1 = keys.encrypt(_encode_signed(z1), sk, CFG, np.random.default_rng(9))
    ct2 = keys.encrypt(_encode_signed(z2), sk, CFG, np.random.default_rng(10))
    rlk = keys.gen_relin_key(sk, CFG, np.random.default_rng(11))
    d0, d1, d2 = he.ct_mul(ct1, ct2, CFG)
    ct_out = he.relinearize(d0, d1, d2, rlk, CFG)
    got = _slots_crt(ct_out, sk, 2 * encoder.DELTA_LOG2)  # Delta^2 product
    want = z1 * z2
    assert np.abs(got - want).max() < 1e-4


def test_ct_mul_rescale(sk):
    z1 = RNG.uniform(-1, 1, size=S) + 1j * RNG.uniform(-1, 1, size=S)
    z2 = RNG.uniform(-1, 1, size=S) + 1j * RNG.uniform(-1, 1, size=S)
    ct1 = keys.encrypt(_encode_signed(z1), sk, CFG, np.random.default_rng(12))
    ct2 = keys.encrypt(_encode_signed(z2), sk, CFG, np.random.default_rng(13))
    rlk = keys.gen_relin_key(sk, CFG, np.random.default_rng(14))
    ct_out = he.rescale(he.relinearize(*he.ct_mul(ct1, ct2, CFG), rlk, CFG), CFG)
    assert ct_out.a.shape[0] == 1  # one limb dropped
    # decrypt at level 1: scale is Delta^2 / q1
    q0 = CFG.moduli[0]
    m_ntt = he.rns.addmod(
        ct_out.a[0],
        he.rns.mulmod(ct_out.b[0], sk.ntt[0], q0),
        q0,
    )
    m = he.nttm.intt(m_ntt, q0, CFG.ipsi[0])
    res = m[None, :]
    z = encoder.decode(res, CFG, limb=0)
    scale = encoder.DELTA / CFG.moduli[1]  # Delta^2/q1 then decode's 1/Delta
    got = z / scale
    # Precision note: after one rescale the effective scale is
    # Delta^2/q1 ~ 2^17, and the rescale's rounding error (~0.5 per coeff,
    # amplified by sqrt(N) in the slot basis and by the ternary key weight)
    # leaves ~4-5 bits of slot precision at this parameterization — the
    # same trade any CKKS stack makes with Delta << q.
    assert np.abs(got - z1 * z2).max() < 0.15


def test_add_plain_slots(sk):
    z1 = RNG.uniform(-1, 1, size=S) + 1j * RNG.uniform(-1, 1, size=S)
    z2 = RNG.uniform(-1, 1, size=S) + 1j * RNG.uniform(-1, 1, size=S)
    ct = keys.encrypt(_encode_signed(z1), sk, CFG, np.random.default_rng(42))
    pt = he.encode_post(
        encoder.encode(encoder.cleartext_from_slots(z2), CFG), CFG
    )
    got = _slots(he.add_plain(ct, pt, CFG), sk)
    assert np.abs(got - (z1 + z2)).max() < 1e-4


def test_hom_sub_slots(sk):
    z1 = RNG.uniform(-1, 1, size=S) + 1j * RNG.uniform(-1, 1, size=S)
    z2 = RNG.uniform(-1, 1, size=S) + 1j * RNG.uniform(-1, 1, size=S)
    ct1 = keys.encrypt(_encode_signed(z1), sk, CFG, np.random.default_rng(15))
    ct2 = keys.encrypt(_encode_signed(z2), sk, CFG, np.random.default_rng(16))
    got = _slots(he.hom_sub(ct1, ct2, CFG), sk)
    assert np.abs(got - (z1 - z2)).max() < 1e-4


def test_conjugate_with_generated_key(sk):
    z = RNG.uniform(-1, 1, size=S) + 1j * RNG.uniform(-1, 1, size=S)
    ct = keys.encrypt(_encode_signed(z), sk, CFG, np.random.default_rng(17))
    cjk = keys.gen_conjugation_key(sk, CFG, np.random.default_rng(18))
    got = _slots(he.conjugate(ct, cjk, CFG), sk)
    assert np.abs(got - np.conj(z)).max() < 1e-4  # key-switch noise


def test_galois_matches_rotate_word_exact(sk):
    """galois with exponent 3^step mod 2N IS the rotation (API contract:
    he_np.rotate == he_np.galois at the matching Galois exponent)."""
    z = RNG.uniform(-1, 1, size=S) + 1j * RNG.uniform(-1, 1, size=S)
    ct = keys.encrypt(_encode_signed(z), sk, CFG, np.random.default_rng(19))
    step = 3
    ksk = keys.gen_rotation_key(sk, step, CFG, np.random.default_rng(20))
    ct_r = he.rotate(ct, step, ksk, CFG)
    ct_g = he.galois(ct, pow(3, step, 2 * N), ksk, CFG)
    assert (ct_r.a == ct_g.a).all() and (ct_r.b == ct_g.b).all()
