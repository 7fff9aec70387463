"""uint32-pair arithmetic (`aloha_tpu.rns_jax`) vs the NumPy golden model.

These primitives are the in-kernel building blocks for Pallas (where u64
dtypes don't exist); they must match the u64 semantics bit for bit.
"""

import functools

import jax
import numpy as np
import pytest

from aloha_tpu import rns_jax, rns_np


@functools.lru_cache(maxsize=None)
def J(fname, q):
    """jit-compiled packed op with static modulus (eager dispatch on this
    host is ~1ms/op; compiled graphs run in microseconds)."""
    f = getattr(rns_jax, fname)
    return jax.jit(lambda a, b=None: f(a, q) if b is None else f(a, b, q))
from aloha_tpu.config import DEFAULT_CONFIG as CFG

RNG = np.random.default_rng(7)
MODULI = CFG.moduli


def pk(a):
    return rns_jax.pack_np(a)


def unpk(a):
    return rns_jax.unpack_np(np.asarray(a))


def test_pack_roundtrip():
    a = RNG.integers(0, 1 << 64, size=1024, dtype=np.uint64)
    assert (unpk(pk(a)) == a).all()


def test_mul64_wide():
    a = RNG.integers(0, 1 << 64, size=1024, dtype=np.uint64)
    b = RNG.integers(0, 1 << 64, size=1024, dtype=np.uint64)
    f = jax.jit(lambda x, y: rns_jax.mul64_wide(*rns_jax.split(x), *rns_jax.split(y)))
    p0, p1, p2, p3 = f(pk(a), pk(b))
    got = (
        np.asarray(p0).astype(object)
        | (np.asarray(p1).astype(object) << 32)
        | (np.asarray(p2).astype(object) << 64)
        | (np.asarray(p3).astype(object) << 96)
    )
    assert (got == a.astype(object) * b.astype(object)).all()


@pytest.mark.parametrize("q", MODULI)
def test_mulmod_pairs(q):
    a = RNG.integers(0, 2 * q, size=4096, dtype=np.uint64)
    b = RNG.integers(0, 2 * q, size=4096, dtype=np.uint64)
    assert (unpk(J('mulmod', q)(pk(a), pk(b))) == rns_np.mulmod(a, b, q)).all()
    assert (unpk(J('addmod', q)(pk(a), pk(b))) == rns_np.addmod(a, b, q)).all()
    assert (unpk(J('submod', q)(pk(a), pk(b))) == rns_np.submod(a, b, q)).all()
    c = RNG.integers(0, 2 * q, size=4096, dtype=np.uint64)
    assert (unpk(J('modred', q)(pk(c))) == rns_np.modred(c, q)).all()


@pytest.mark.parametrize("q", MODULI)
def test_halfmod_pairs(q):
    a = RNG.integers(0, q, size=4096, dtype=np.uint64)
    f = jax.jit(lambda x: rns_jax.halfmod64(*rns_jax.split(x), q))
    lo, hi = f(pk(a))
    assert (unpk(rns_jax.join(lo, hi)) == rns_np.halfmod(a, q)).all()


@pytest.mark.parametrize("q", MODULI)
def test_shoup_mul_lazy(q):
    """Shoup constant multiply: congruent mod q and < 2q."""
    a = RNG.integers(0, q, size=4096, dtype=np.uint64)
    w = int(RNG.integers(1, q))
    wsh = (w << 64) // q
    f = jax.jit(lambda x: rns_jax.mulmod_shoup64(*rns_jax.split(x), w, wsh, q))
    lo, hi = f(pk(a))
    got = unpk(rns_jax.join(lo, hi))
    want = rns_np.mulmod(a, np.uint64(w), q)
    assert (got < np.uint64(2 * q)).all()
    assert (np.where(got >= q, got - np.uint64(q), got) == want).all()
