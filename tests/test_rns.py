"""Modular-arithmetic golden tests.

Mirrors the reference's randomized ALU testbenches, which check the RTL
against 128-bit exact reference functions
(reference: sim/vp/vxu/modalu_tb.sv:11,294, modmul_tb.sv:11,133).
"""

import numpy as np
import pytest

from aloha_tpu import config as cfg
from aloha_tpu import rns_np as rns

MODULI = cfg.MODULI_DEFAULT
RNG = np.random.default_rng(1234)


def rand_u64(n, bound):
    return RNG.integers(0, bound, size=n, dtype=np.uint64)


@pytest.mark.parametrize("q", MODULI)
def test_mul_wide_exact(q):
    a = rand_u64(4096, 1 << 64)
    b = rand_u64(4096, 1 << 64)
    hi, lo = rns.mul_wide(a, b)
    got = (hi.astype(object) << 64) | lo.astype(object)
    want = a.astype(object) * b.astype(object)
    assert (got == want).all()


@pytest.mark.parametrize("q", MODULI)
def test_barrett_equals_exact_mod(q):
    """The RTL Barrett chain == exact a*b mod q for all inputs < q.

    This is the theorem that frees the TPU kernels to use any exact mulmod.
    """
    a = rand_u64(65536, q)
    b = rand_u64(65536, q)
    got = rns._barrett(a, b, q, cfg.MOD_WIDTH)
    want = (a.astype(object) * b.astype(object)) % q
    assert (got.astype(object) == want).all()


@pytest.mark.parametrize("q", MODULI)
def test_barrett_edge_cases(q):
    edge = np.array([0, 1, 2, q - 2, q - 1], dtype=np.uint64)
    a, b = np.meshgrid(edge, edge)
    a, b = a.ravel(), b.ravel()
    got = rns._barrett(a, b, q, cfg.MOD_WIDTH)
    want = (a.astype(object) * b.astype(object)) % q
    assert (got.astype(object) == want).all()


@pytest.mark.parametrize("q", MODULI)
def test_mulmod_lazy_inputs(q):
    """mulmod accepts inputs in [0, 2q) like the ALU's lazy operand reduce."""
    a = rand_u64(8192, 2 * q)
    b = rand_u64(8192, 2 * q)
    got = rns.mulmod(a, b, q)
    want = (a.astype(object) * b.astype(object)) % q
    assert (got.astype(object) == want).all()


@pytest.mark.parametrize("q", MODULI)
def test_addsub(q):
    a = rand_u64(8192, q)
    b = rand_u64(8192, q)
    assert (
        rns.addmod(a, b, q).astype(object)
        == (a.astype(object) + b.astype(object)) % q
    ).all()
    assert (
        rns.submod(a, b, q).astype(object)
        == (a.astype(object) - b.astype(object)) % q
    ).all()


@pytest.mark.parametrize("q", MODULI)
def test_halfmod(q):
    a = rand_u64(8192, q)
    inv2 = pow(2, -1, q)
    want = (a.astype(object) * inv2) % q
    assert (rns.halfmod(a, q).astype(object) == want).all()


def test_modred_cross_modulus():
    """vfqmod semantics: reduce a q1 residue mod q0 (q1 < 2*q0)."""
    q0, q1, _ = MODULI
    a = rand_u64(8192, q1)
    assert (rns.modred(a, q0).astype(object) == a.astype(object) % q0).all()


def test_barrett_iq_constants_match_programs():
    """iq constants the reference programs set via vsetiq.

    q0/q1 immediates equal floor(2^121/q); the P program uses floor+1
    (reference: keyswitch.mem line 11 imm 0x3ffff00001fdfff9), which the
    Barrett error bound also absorbs — certified by the P case of
    test_barrett_equals_exact_mod via config's computed constant.
    """
    assert cfg.barrett_iq(cfg.Q0) == 0x3FFFFF78000120F7
    assert cfg.barrett_iq(cfg.Q1) == 0x3FFFFEC000063FF7
    assert cfg.barrett_iq(cfg.SP) == 0x3FFFF00001FDFFF9 - 1


def test_pinv_constants_match_programs():
    from aloha_tpu.config import DEFAULT_CONFIG as C

    assert C.pinv_mod(0) == 0x02EE781FE82B127B
    assert C.pinv_mod(1) == 0x05A2E116B0060C1C
