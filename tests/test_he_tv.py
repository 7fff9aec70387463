"""Ciphertext-op bit-exactness against the reference tv/ golden vectors.

These are the correctness baselines called out in the reference's test
strategy (reference: tv/README.md, sim/top/top_noaxilite_tb.sv:663-683):
every before/after kernel dump must match word for word.
"""

import numpy as np
import pytest

from aloha_tpu import he_np as he
from aloha_tpu.config import DEFAULT_CONFIG as CFG

from conftest import TV_ROOT, load_tv, requires_tv, tv_cases, tv_kernels

N = CFG.n


def _params(suffix):
    out = []
    for case in tv_cases():
        for k in tv_kernels(case, suffix):
            out.append((case, k))
    return out


@requires_tv
@pytest.mark.parametrize("case,kernel", _params("ct_after_homadd"))
def test_hom_add(case, kernel):
    ct1 = he.Ciphertext.from_flat(load_tv(case, f"kernel{kernel}_ct_before_homaddct1"))
    ct2 = he.Ciphertext.from_flat(load_tv(case, f"kernel{kernel}_ct_before_homaddct2"))
    want = load_tv(case, f"kernel{kernel}_ct_after_homadd")
    got = he.hom_add(ct1, ct2, CFG).to_flat()
    assert (got == want).all()


@requires_tv
@pytest.mark.parametrize("case,kernel", _params("ct_after_mulplain"))
def test_mul_plain(case, kernel):
    ct = he.Ciphertext.from_flat(load_tv(case, f"kernel{kernel}_ct_before_mulplain"))
    pt = load_tv(case, f"kernel{kernel}_pt_before_mulplain").reshape(2, N)
    want = load_tv(case, f"kernel{kernel}_ct_after_mulplain")
    got = he.mul_plain(ct, pt, CFG).to_flat()
    assert (got == want).all()


@requires_tv
@pytest.mark.parametrize("case,kernel", _params("pt_after_encode"))
def test_encode_post(case, kernel):
    try:
        pre = load_tv(case, f"kernel{kernel}_pt_after_encode_fft_mod")
    except OSError:
        pytest.skip("no coefficient-domain dump for this kernel")
    want = load_tv(case, f"kernel{kernel}_pt_after_encode")
    got = he.encode_post(pre.reshape(2, N), CFG)
    assert (got.ravel() == want).all()


def _rotate_params():
    out = []
    for case in tv_cases():
        steps = sorted(
            int(p.stem.removeprefix("ksk_step"))
            for p in (TV_ROOT / case).glob("ksk_step?.txt")
        )
        for k in tv_kernels(case, "ct_after_rotate"):
            out.append((case, k, tuple(steps)))
    return out


@requires_tv
@pytest.mark.parametrize("case,kernel,steps", _rotate_params())
def test_rotate(case, kernel, steps):
    """Rotation + hybrid key-switch, bit-exact, for whichever KSK step the
    kernel was generated with (the op list isn't shipped, so try each
    available step; exactly one must match)."""
    ct = he.Ciphertext.from_flat(load_tv(case, f"kernel{kernel}_ct_before_rotate"))
    want = load_tv(case, f"kernel{kernel}_ct_after_rotate")
    matched = []
    for step in steps:
        ksk = load_tv(case, f"ksk_step{step}")
        got = he.rotate(ct, step, ksk, CFG).to_flat()
        if (got == want).all():
            matched.append(step)
    assert matched, f"no KSK step in {steps} reproduces kernel{kernel}"


@requires_tv
@pytest.mark.parametrize("case", tv_cases())
def test_ksk_layout(case):
    """The KSK image layout assumed by `rotate`.

    The reference's ksk_stepK_decomposeJ.txt dumps are the key-switch key
    split by digit J: 6 polys [a_q0, a_q1, a_P, b_q0, b_q1, b_P].  They must
    be row-permutations of ksk_stepK.txt under the
    [m0d0a, m0d0b, m0d1a, m0d1b, m1d0a, ...] interleave that
    `aloha_tpu.he_np.rotate` indexes as ksk[4*m + 2*j + part].
    """
    files = sorted((TV_ROOT / case).glob("ksk_step*_decompose0.txt"))
    if not files:
        pytest.skip("case has no decompose dumps")
    for f in files:
        stem = f.name.replace("_decompose0.txt", "")
        ksk = load_tv(case, stem).reshape(12, N)
        for j in range(2):
            dec = np.loadtxt(
                TV_ROOT / case / f"{stem}_decompose{j}.txt", dtype=np.uint64
            ).reshape(6, N)
            for m in range(3):
                assert (dec[m] == ksk[4 * m + 2 * j]).all()  # a-part
                assert (dec[3 + m] == ksk[4 * m + 2 * j + 1]).all()  # b-part
