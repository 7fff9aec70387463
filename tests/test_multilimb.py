"""Generality beyond the reference's fixed 2-limb workload: a 3-limb
(+special prime) configuration through the full HE lifecycle.

The reference hardwires q0/q1/P; this framework parameterizes the limb
count — these tests pin the generalized KSK layout (stride 2L per modulus)
and the guards for paths that are intentionally 2-limb-only.
"""

import numpy as np
import pytest

from aloha_tpu import encoder, he_np as he, keys
from aloha_tpu.config import HEConfig
from aloha_tpu.isa import programs

#: 60-bit NTT-friendly primes (q-1 divisible by 2N) with 2N-th roots,
#: 3 ciphertext limbs + special prime.
_P3 = [
    (576460752303439873, 572686754113469876, 509288606595595249),
    (576460752303702017, 518640146586316029, 547209705829931988),
    (576460752304439297, 191393272803421785, 427853369549297084),
    (576460752304619521, 151596679657857464, 439393009888152773),
]

CFG3 = HEConfig(
    moduli=tuple(p[0] for p in _P3),
    psi=tuple(p[1] for p in _P3),
    ipsi=tuple(p[2] for p in _P3),
)


def test_three_limb_rotate_end_to_end():
    sk = keys.gen_secret(CFG3, np.random.default_rng(0))
    ksk = keys.gen_rotation_key(sk, 2, CFG3, np.random.default_rng(1))
    assert ksk.shape == (2 * 3 * 4, CFG3.n)  # stride 2L per modulus

    z = np.zeros(CFG3.n // 2, complex)
    z[:8] = np.arange(8) * 0.1
    raw = encoder.encode(encoder.cleartext_from_slots(z), CFG3)[0]
    m = np.where(
        raw > CFG3.moduli[0] // 2,
        raw.astype(np.int64) - CFG3.moduli[0],
        raw.astype(np.int64),
    )
    ct = keys.encrypt(m, sk, CFG3, np.random.default_rng(2))
    out = he.rotate(ct, 2, ksk, CFG3)
    dec = keys.decrypt(out, sk, CFG3)
    res = np.where(
        dec < 0, dec + np.int64(CFG3.moduli[0]), dec
    ).astype(np.uint64)
    got = encoder.decode(res[None, :], CFG3, 0)
    want = np.roll(z, -2)
    assert np.abs(got[:16] - want[:16]).max() < 1e-4


def test_isa_keyswitch_three_limbs_matches_functional():
    """The SPM-spilling ISA keyswitch (L >= 3) replays the functional
    rotation word-exactly through the full device stack."""
    from aloha_tpu.runtime.device import AlohaDevice

    rng = np.random.default_rng(5)
    sk = keys.gen_secret(CFG3, np.random.default_rng(0))
    ksk = keys.gen_rotation_key(sk, 2, CFG3, np.random.default_rng(1))
    L, n = CFG3.n_limbs, CFG3.n
    a = rng.integers(0, CFG3.moduli[0], size=(L, n), dtype=np.uint64)
    b = rng.integers(0, CFG3.moduli[0], size=(L, n), dtype=np.uint64)
    want = he.rotate(he.Ciphertext(a=a.copy(), b=b.copy()), 2, ksk, CFG3)

    dev = AlohaDevice(CFG3)
    dev.dma_load_ksk(ksk)
    rows = n // 128
    dev.dma_write_spm(0, np.concatenate([a, b]))
    dev.run_rotate(dest=2 * L * rows * 4, src=0, step=2)
    out = dev.dma_read_spm(2 * L * rows * 4, 2 * L * rows).reshape(2 * L, n)
    assert np.array_equal(out[:L], want.a)
    assert np.array_equal(out[L:], want.b)


def test_small_modulus_rejected():
    from aloha_tpu.config import barrett_iq

    with pytest.raises(ValueError, match="Barrett"):
        barrett_iq((1 << 50) + 1)


def test_rotate_step_validation():
    from aloha_tpu.runtime.device import AlohaDevice

    dev = AlohaDevice()
    for bad in (0, 1, 3, 6):
        with pytest.raises(ValueError, match="power of two"):
            dev.run_rotate(dest=256, src=0, step=bad)
