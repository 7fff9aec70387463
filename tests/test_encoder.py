"""Encoder tests: float-path accuracy vs golden vectors, decode roundtrip.

The float encoder is NOT yet bit-exact (see aloha_tpu.encoder docstring):
it reproduces the reference's fixed-point pipeline to ~1e-6 relative.
These tests pin both the convention (slot layout, evaluation points,
scale) and the current accuracy envelope.
"""

import numpy as np
import pytest

from aloha_tpu import encoder
from aloha_tpu.config import DEFAULT_CONFIG as CFG

from conftest import TV_ROOT, load_tv, requires_tv, tv_cases, tv_kernels

N = CFG.n

#: |encoded - golden| bound for the float path (the reference's own 34-bit
#: fixed-point FFT noise, ~2^-30 of the 2^38 scale).
FLOAT_PATH_TOLERANCE = 512


def _centered(vals, q):
    v = vals.astype(np.float64)
    return np.where(vals > q // 2, v - float(q), v)


def _encode_params():
    out = []
    for case in tv_cases():
        for k in tv_kernels(case, "pt_after_encode_fft_mod"):
            out.append((case, k))
    return out


@requires_tv
@pytest.mark.parametrize("case,kernel", _encode_params())
def test_encode_float_accuracy(case, kernel):
    clear = np.loadtxt(
        TV_ROOT / case / f"kernel{kernel}_cleartext_before_encode_re_im.txt"
    )
    gold = load_tv(case, f"kernel{kernel}_pt_after_encode_fft_mod").reshape(2, N)
    got = encoder.encode(clear, CFG)
    for limb in range(2):
        q = CFG.moduli[limb]
        err = np.abs(
            _centered(got[limb], q) - _centered(gold[limb], q)
        )
        assert err.max() <= FLOAT_PATH_TOLERANCE, err.max()


@requires_tv
def test_decode_golden_recovers_cleartext():
    case = "case1_8_8"
    clear = np.loadtxt(
        TV_ROOT / case / "kernel1_cleartext_before_encode_re_im.txt"
    )
    gold = load_tv(case, "kernel1_pt_after_encode_fft_mod").reshape(2, N)
    z = encoder.decode(gold, CFG, limb=0)
    want = encoder.slots_from_cleartext(clear)
    assert np.abs(z - want).max() < 1e-5


def test_encode_decode_roundtrip():
    rng = np.random.default_rng(3)
    z = rng.uniform(-1, 1, size=N // 2) + 1j * rng.uniform(-1, 1, size=N // 2)
    pt = encoder.encode(encoder.cleartext_from_slots(z), CFG)
    z2 = encoder.decode(pt, CFG, limb=0)
    assert np.abs(z2 - z).max() < 1e-7  # rounding bound 0.5*N/Delta ~ 1.5e-8


def test_limbs_consistent():
    """Both limbs hold the same signed integer, reduced into each modulus."""
    rng = np.random.default_rng(4)
    z = rng.uniform(-1, 1, size=N // 2)
    pt = encoder.encode(encoder.cleartext_from_slots(z + 0j), CFG)
    c0 = _centered(pt[0], CFG.moduli[0])
    c1 = _centered(pt[1], CFG.moduli[1])
    assert (c0 == c1).all()


def test_wrong_slot_count_raises():
    with pytest.raises(ValueError, match="slots"):
        encoder.encode(np.zeros(100), CFG)
