"""JAX (XLA u64) backend vs NumPy golden: primitives and program replay.

The reference certifies its engine against a software oracle per-lane,
per-beat (reference: sim/vp/top/vp_top_tb.sv); here the oracle is the NumPy
model and the device-under-test is the traced/jitted JAX path.
"""

import functools

import jax
import numpy as np
import pytest

from aloha_tpu import ntt_jax, ntt_np, rns_np, rns_xla


@functools.lru_cache(maxsize=None)
def J(mod, fname, *static):
    """jit with static trailing args (eager dispatch is ~1ms/op here)."""
    f = getattr(mod, fname)
    return jax.jit(lambda *args: f(*args, *static))
from aloha_tpu.config import DEFAULT_CONFIG as CFG
from aloha_tpu.config import NUM_LANES
from aloha_tpu.isa import programs
from aloha_tpu.isa.interp import LaunchArgs, VectorProcessor
from aloha_tpu.jax_backend import JaxBackend, make_executable

from conftest import load_tv, requires_tv

RNG = np.random.default_rng(99)
N = CFG.n
POLY_ROWS = N // NUM_LANES
MODULI = CFG.moduli


@pytest.mark.parametrize("q", MODULI)
def test_elementwise_ops_match_numpy(q):
    a = RNG.integers(0, 2 * q, size=4096, dtype=np.uint64)
    b = RNG.integers(0, 2 * q, size=4096, dtype=np.uint64)
    assert (np.asarray(J(rns_xla, 'mulmod', q)(a, b)) == rns_np.mulmod(a, b, q)).all()
    assert (np.asarray(J(rns_xla, 'addmod', q)(a, b)) == rns_np.addmod(a, b, q)).all()
    assert (np.asarray(J(rns_xla, 'submod', q)(a, b)) == rns_np.submod(a, b, q)).all()
    assert (np.asarray(J(rns_xla, 'modred', q)(a)) == rns_np.modred(a, q)).all()
    c = RNG.integers(0, q, size=4096, dtype=np.uint64)
    assert (np.asarray(J(rns_xla, 'halfmod', q)(c)) == rns_np.halfmod(c, q)).all()


def test_mul_wide_matches():
    a = RNG.integers(0, 1 << 64, size=4096, dtype=np.uint64)
    b = RNG.integers(0, 1 << 64, size=4096, dtype=np.uint64)
    jhi, jlo = jax.jit(rns_xla.mul_wide)(a, b)
    nhi, nlo = rns_np.mul_wide(a, b)
    assert (np.asarray(jhi) == nhi).all() and (np.asarray(jlo) == nlo).all()


@pytest.mark.parametrize("limb", range(3))
def test_ntt_intt_match_numpy(limb):
    q, psi, ipsi = CFG.moduli[limb], CFG.psi[limb], CFG.ipsi[limb]
    a = RNG.integers(0, q, size=N, dtype=np.uint64)
    fwd = J(ntt_jax, 'ntt', q, psi)(a)
    assert (np.asarray(fwd) == ntt_np.ntt(a, q, psi)).all()
    assert (np.asarray(J(ntt_jax, 'intt', q, ipsi)(fwd)) == a).all()


def test_ntt_batched():
    q, psi = CFG.moduli[0], CFG.psi[0]
    a = RNG.integers(0, q, size=(3, N), dtype=np.uint64)
    assert (np.asarray(J(ntt_jax, 'ntt', q, psi)(a)) == ntt_np.ntt(a, q, psi)).all()


@pytest.mark.parametrize("step", [9, 81, 2 * N - 1])
def test_automorphism_matches(step):
    q = CFG.moduli[0]
    a = RNG.integers(0, q, size=N, dtype=np.uint64)
    got = np.asarray(J(ntt_jax, 'automorphism', q)(a, step))
    assert (got == ntt_np.automorphism(a, step, q)).all()


def _random_ct_spm(rows=1024):
    spm = np.zeros((rows, NUM_LANES), dtype=np.uint64)
    for limb in range(2):
        q = CFG.moduli[limb]
        for part in range(2):
            row = (part * 2 + limb) * POLY_ROWS
            spm[row : row + POLY_ROWS] = RNG.integers(
                0, q, size=(POLY_ROWS, NUM_LANES), dtype=np.uint64
            )
    return spm


@pytest.mark.parametrize("name", ["mul_plain", "hom_add"])
def test_program_replay_jax_vs_numpy(name):
    prog = getattr(programs, name)(CFG)
    spm = _random_ct_spm()
    args = LaunchArgs(rslt=512)
    want = VectorProcessor(CFG).run(prog, spm.copy(), None, args)
    be = JaxBackend()
    got = VectorProcessor(CFG, be).run(
        prog, be.wrap(spm), be.wrap(np.zeros((1, NUM_LANES), np.uint64)), args
    )
    assert (be.unwrap(got) == want).all()


@requires_tv
def test_keyswitch_jitted_replay_golden():
    """The whole 114-instruction keyswitch as ONE jitted XLA program."""
    ct = load_tv("case0_4_4", "kernel1_ct_before_rotate")
    ksk = load_tv("case0_4_4", "ksk_step2")
    gold = load_tv("case0_4_4", "kernel1_ct_after_rotate")
    spm = np.zeros((1024, NUM_LANES), dtype=np.uint64)
    spm[: 4 * POLY_ROWS] = ct.reshape(-1, NUM_LANES)
    args = LaunchArgs(rslt=512, step=pow(3, 2, 2 * N))
    exe = make_executable(
        CFG, programs.keyswitch(CFG), args, program_key="keyswitch-test"
    )
    be = JaxBackend()
    out = exe(be.wrap(spm), be.wrap(ksk.reshape(-1, NUM_LANES)))
    got = be.unwrap(out)[512 : 512 + 4 * POLY_ROWS].reshape(-1)
    assert (got == gold).all()
    # second launch reuses the compiled executable (cache hit)
    out2 = exe(be.wrap(spm), be.wrap(ksk.reshape(-1, NUM_LANES)))
    assert (be.unwrap(out2)[512 : 512 + 4 * POLY_ROWS].reshape(-1) == gold).all()
