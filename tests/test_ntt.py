"""NTT/INTT/automorphism golden tests (NumPy model)."""

import numpy as np
import pytest

from aloha_tpu import ntt_np as nttm
from aloha_tpu import rns_np as rns
from aloha_tpu.config import DEFAULT_CONFIG as CFG

from conftest import load_tv, requires_tv

RNG = np.random.default_rng(7)
N = CFG.n


def rand_poly(q, shape=(N,)):
    return RNG.integers(0, q, size=shape, dtype=np.uint64)


@pytest.mark.parametrize("limb", range(3))
def test_roundtrip(limb):
    q = CFG.moduli[limb]
    a = rand_poly(q)
    fwd = nttm.ntt_cfg(a, CFG, limb)
    back = nttm.intt_cfg(fwd, CFG, limb)
    assert (back == a).all()


@pytest.mark.parametrize("limb", range(3))
def test_roundtrip_batched(limb):
    q = CFG.moduli[limb]
    a = rand_poly(q, (3, 2, N))
    assert (nttm.intt_cfg(nttm.ntt_cfg(a, CFG, limb), CFG, limb) == a).all()


def test_ntt_is_negacyclic_evaluation():
    """Output k holds the evaluation at psi^(2*bitrev(k)+1) — i.e. the
    engine's bit-reversed CT ordering."""
    q, psi = CFG.moduli[0], CFG.psi[0]
    n = 64  # small ring for the O(n^2) check
    psi_n = pow(psi, N // n, q)  # primitive 2n-th root
    from aloha_tpu.config import HEConfig

    a = RNG.integers(0, q, size=n, dtype=np.uint64)
    out = nttm.ntt(a, q, psi_n)
    logn = 6
    for k in [0, 1, 5, n - 1]:
        root = pow(psi_n, 2 * nttm.bit_reverse(k, logn) + 1, q)
        want = sum(int(a[i]) * pow(root, i, q) for i in range(n)) % q
        assert int(out[k]) == want


def test_ntt_multiplication_is_negacyclic_convolution():
    q, psi, ipsi = CFG.moduli[0], CFG.psi[0], CFG.ipsi[0]
    n = 128
    psi_n = pow(psi, N // n, q)
    ipsi_n = pow(ipsi, N // n, q)
    a = RNG.integers(0, q, size=n, dtype=np.uint64)
    b = RNG.integers(0, q, size=n, dtype=np.uint64)
    prod = nttm.intt(
        rns.mulmod(nttm.ntt(a, q, psi_n), nttm.ntt(b, q, psi_n), q), q, ipsi_n
    )
    # schoolbook negacyclic convolution
    want = [0] * n
    for i in range(n):
        for j in range(n):
            k = i + j
            s = int(a[i]) * int(b[j])
            if k >= n:
                want[k - n] = (want[k - n] - s) % q
            else:
                want[k] = (want[k] + s) % q
    assert [int(x) for x in prod] == want


@pytest.mark.parametrize("limb", range(2))
def test_automorphism_inverse(limb):
    q = CFG.moduli[limb]
    a = rand_poly(q)
    s = pow(3, 5, 2 * N)
    s_inv = pow(s, -1, 2 * N)
    back = nttm.automorphism(nttm.automorphism(a, s, q), s_inv, q)
    # The RTL sign rule writes `q - x`, so 0 can come back as q (never here,
    # since rand_poly excludes the exact-zero -> q -> 0 chain only at x=0).
    assert (rns.lazy_reduce(back, q) == a).all()


def test_automorphism_polynomial_identity():
    """aut_s(a)(X) == a(X^s) in the ring Z_q[X]/(X^n+1)."""
    q = CFG.moduli[0]
    n = 16
    a = RNG.integers(0, q, size=n, dtype=np.uint64)
    s = 3
    out = rns.lazy_reduce(nttm.automorphism(a, s, q), q)
    # evaluate both sides at X = 2 symbolically mod (X^n + 1) via coefficients
    want = np.zeros(n, dtype=object)
    for i in range(n):
        k = (i * s) % (2 * n)
        if k < n:
            want[k] = (want[k] + int(a[i])) % q
        else:
            want[k - n] = (want[k - n] - int(a[i])) % q
    assert (out.astype(object) == want).all()


def test_rotate_lanes():
    q = CFG.moduli[0]
    a = rand_poly(q)
    out = nttm.rotate_lanes(a, 5)
    assert (out[:-5] == a[5:]).all() and (out[-5:] == a[:5]).all()


@requires_tv
@pytest.mark.parametrize("case,kernel", [("case1_8_8", "1"), ("case2_16_16", "1")])
def test_ntt_bit_exact_vs_reference(case, kernel):
    """Coefficient-domain -> NTT-domain golden pairs from the encoder flow."""
    pre = load_tv(case, f"kernel{kernel}_pt_after_encode_fft_mod")
    post = load_tv(case, f"kernel{kernel}_pt_after_encode")
    for limb in range(2):
        got = nttm.ntt_cfg(pre[limb * N : (limb + 1) * N], CFG, limb)
        assert (got == post[limb * N : (limb + 1) * N]).all()


@requires_tv
@pytest.mark.parametrize("case", ["case1_8_8"])
def test_intt_bit_exact_vs_reference(case):
    post = load_tv(case, "kernel1_pt_after_encode")
    pre = load_tv(case, "kernel1_pt_after_encode_fft_mod")
    for limb in range(2):
        got = nttm.intt_cfg(post[limb * N : (limb + 1) * N], CFG, limb)
        assert (got == pre[limb * N : (limb + 1) * N]).all()
