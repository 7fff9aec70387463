"""Negative probes: failures must be loud, never silently 'close'.

Everything here is exact integer math — a wrong key or a corrupted key
word must produce wholesale (or precisely-localized) word mismatches,
not near-misses a tolerance could absorb.  (These mirror the project's
verification checklist probes.)
"""

import numpy as np
import pytest

from aloha_tpu import he_np as he, keys
from aloha_tpu.config import DEFAULT_CONFIG as CFG

L, N = CFG.n_limbs, CFG.n


@pytest.fixture(scope="module")
def material():
    rng = np.random.default_rng(77)
    a = rng.integers(0, CFG.moduli[0], size=(L, N), dtype=np.uint64)
    b = rng.integers(0, CFG.moduli[0], size=(L, N), dtype=np.uint64)
    sk = keys.gen_secret(CFG, np.random.default_rng(78))
    ksk2 = keys.gen_rotation_key(sk, 2, CFG, np.random.default_rng(79))
    ksk4 = keys.gen_rotation_key(sk, 4, CFG, np.random.default_rng(80))
    return a, b, ksk2, ksk4


def test_wrong_step_key_mismatches_wholesale(material):
    """Rotating with the key for a DIFFERENT step must disagree almost
    everywhere — a silent 'mostly right' result would mean the
    keyswitch isn't actually exercising the key."""
    a, b, ksk2, ksk4 = material
    ct = lambda: he.Ciphertext(a=a.copy(), b=b.copy())  # noqa: E731
    good = he.rotate(ct(), 2, ksk2, CFG)
    bad = he.rotate(ct(), 2, ksk4, CFG)
    frac = (bad.b != good.b).mean()
    assert frac > 0.99, f"only {frac:.3f} of b-part words differ"


def test_tampered_ksk_word_localizes(material):
    """Flipping ONE KSK word (limb-0 digit-0 a-part) must change
    exactly the matching output component: the KSK inner products are
    POINTWISE in the NTT domain, and the q0 lane feeds only the limb-0
    a-part after mod-down (the special-prime rows are the only ones
    that fan out) — so the corruption surfaces as a small set of words
    in out.a[0] and nowhere else."""
    a, b, ksk2, _ = material
    ct = lambda: he.Ciphertext(a=a.copy(), b=b.copy())  # noqa: E731
    good = he.rotate(ct(), 2, ksk2, CFG)
    tampered = ksk2.copy()
    # row 0 = modulus 0, digit 0, a-part (layout [m0d0a, m0d0b, ...])
    tampered[0, 123] ^= np.uint64(1)
    bad = he.rotate(ct(), 2, tampered, CFG)
    assert np.array_equal(bad.b, good.b)  # b-part untouched
    assert np.array_equal(bad.a[1], good.a[1])  # other limb untouched
    ndiff = int((bad.a[0] != good.a[0]).sum())
    assert 1 <= ndiff <= 2, f"{ndiff} words differ in a[0]"


def test_tampered_special_prime_row_fans_out(material):
    """Corrupting a SPECIAL-PRIME KSK word must instead spread through
    the mod-down into every limb (the c[L] component is INTT'd,
    rounded, and re-NTT'd under every q_m) — the complementary
    localization fact."""
    a, b, ksk2, _ = material
    ct = lambda: he.Ciphertext(a=a.copy(), b=b.copy())  # noqa: E731
    good = he.rotate(ct(), 2, ksk2, CFG)
    tampered = ksk2.copy()
    # last modulus block = special prime; row stride 2L per modulus
    tampered[2 * L * L, 123] ^= np.uint64(1)  # P, digit 0, a-part
    bad = he.rotate(ct(), 2, tampered, CFG)
    frac = (bad.a != good.a).mean()
    assert frac > 0.99, f"only {frac:.3f} of a-part words differ"


def test_tampered_ksk_word_localizes_hoisted(material):
    """The same one-word localization through the HOISTED (lazy-gather)
    path: the corrupted q0-lane product rides the inverse-gathered key,
    so after the final output gather it must surface at exactly the
    permuted position(s) of out.a[0] — still nowhere else.  Guards the
    key-side automorphism bookkeeping (a perm/inverse mixup would smear
    the corruption or move it to the wrong limb)."""
    a, b, ksk2, _ = material
    ct = lambda: he.Ciphertext(a=a.copy(), b=b.copy())  # noqa: E731
    good, = he.rotate_hoisted(ct(), [2], [ksk2], CFG)
    tampered = ksk2.copy()
    tampered[0, 123] ^= np.uint64(1)
    bad, = he.rotate_hoisted(ct(), [2], [tampered], CFG)
    assert np.array_equal(bad.b, good.b)
    assert np.array_equal(bad.a[1], good.a[1])
    ndiff = int((bad.a[0] != good.a[0]).sum())
    assert 1 <= ndiff <= 2, f"{ndiff} words differ in a[0]"
