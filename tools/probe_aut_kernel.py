"""Probe: in-kernel automorphism via the perm-decomposition.

X -> X^e on a (rows, 128) tile decomposes (validated in NumPy) as
  1. row perm r -> e*r mod rows        (one-hot f32 matmul Q @ x)
  2. lane perm c -> e*c mod 128        (one-hot f32 matmul x @ P)
  3. per-dst-lane row roll by o(c)     (6 conditional sublane rolls)
  4. sign fix q - x at wrapped slots   (precomputed dst mask)
with o(c_dst) = floor(e*c_src/128) mod rows, c_src = c_dst * e^-1 mod 128.

Data rides as u16 limb planes through the f32 matmuls (exact: one-hot
contraction, values < 2^16 < 2^24).  Run with ALOHA_STREAM_INTERPRET=1
for CPU validation; without it, compiles on the TPU.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def aut_consts(n: int, e: int, rows: int):
    """Host-side constants for the in-kernel automorphism (step-agnostic
    kernel: these are inputs, not compile-time values)."""
    Q = np.zeros((rows, rows), dtype=np.float32)
    Q[(np.arange(rows) * e) % rows, np.arange(rows)] = 1.0
    P = np.zeros((LANES, LANES), dtype=np.float32)
    P[np.arange(LANES), (np.arange(LANES) * e) % LANES] = 1.0
    csrc = (np.arange(LANES) * pow(e, -1, LANES)) % LANES
    o = ((csrc * e) // LANES) % rows
    nbits = rows.bit_length() - 1
    roll_masks = np.stack(
        [((o >> k) & 1).astype(np.uint32) for k in range(nbits)]
    ).reshape(nbits, 1, LANES)
    i = np.arange(n, dtype=np.int64)
    j = (i * e) % (2 * n)
    dst = j % n
    neg = np.zeros(n, dtype=bool)
    neg[dst] = j >= n
    sign = neg.reshape(rows, LANES).astype(np.uint32)
    return Q, P, roll_masks, sign


def _perm16(x16, Qr, Pr):
    # HIGHEST precision: default f32 matmul truncates operands to bf16
    # (measured 128-ULP error on u16-ranged planes); one-hot contractions
    # at full f32 are exact for values < 2^24
    # Mosaic has no u32 -> f32 cast; hop through i32 (planes < 2^16)
    f = x16.astype(jnp.int32).astype(jnp.float32)
    f = jnp.matmul(
        Qr, f, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    f = jnp.matmul(
        f, Pr, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return f.astype(jnp.int32).astype(jnp.uint32)


def kernel(q: int, nbits: int, Qr, Pr, rm, sg, xlo, xhi, olo, ohi):
    lo, hi = xlo[...], xhi[...]
    U = jnp.uint32
    planes = [lo & U(0xFFFF), lo >> U(16), hi & U(0xFFFF), hi >> U(16)]
    planes = [_perm16(p, Qr[...], Pr[...]) for p in planes]
    lo = planes[0] | (planes[1] << U(16))
    hi = planes[2] | (planes[3] << U(16))
    for k in range(nbits):
        m = rm[k] != U(0)
        lo = jnp.where(m, pltpu.roll(lo, 1 << k, 0), lo)
        hi = jnp.where(m, pltpu.roll(hi, 1 << k, 0), hi)
    # sign: q - x (literal RTL rule incl. x = 0 -> q)
    qlo = U(q & 0xFFFFFFFF)
    qhi = U(q >> 32)
    slo = qlo - lo
    borrow = (qlo < lo).astype(U)
    shi = qhi - hi - borrow
    m = sg[...] != U(0)
    olo[...] = jnp.where(m, slo, lo)
    ohi[...] = jnp.where(m, shi, hi)


def main():
    n = 8192
    rows = n // LANES
    q = 576460825317867521
    rng = np.random.default_rng(0)
    x = rng.integers(0, q, size=n, dtype=np.uint64)
    ok_all = True
    for step in (2, 4, 5):
        e = pow(3, step, 2 * n)
        Q, P, rm, sg = aut_consts(n, e, rows)
        xlo = jnp.asarray((x & 0xFFFFFFFF).astype(np.uint32).reshape(rows, LANES))
        xhi = jnp.asarray((x >> np.uint64(32)).astype(np.uint32).reshape(rows, LANES))
        import functools
        call = pl.pallas_call(
            functools.partial(kernel, q, rows.bit_length() - 1),
            out_shape=[jax.ShapeDtypeStruct((rows, LANES), jnp.uint32)] * 2,
            interpret=bool(os.environ.get("ALOHA_STREAM_INTERPRET")),
        )
        olo, ohi = call(jnp.asarray(Q), jnp.asarray(P), jnp.asarray(rm),
                        jnp.asarray(sg), xlo, xhi)
        got = (np.asarray(olo).astype(np.uint64)
               | (np.asarray(ohi).astype(np.uint64) << 32)).reshape(-1)
        i = np.arange(n, dtype=np.int64)
        j = (i * e) % (2 * n)
        dst = j % n
        want = np.zeros(n, dtype=np.uint64)
        want[dst] = np.where(j >= n, q - x, x)
        ok = np.array_equal(got, want)
        ok_all &= ok
        print(f"step {step}: in-kernel automorphism ok = {ok}", flush=True)
    sys.exit(0 if ok_all else 1)


if __name__ == "__main__":
    main()
