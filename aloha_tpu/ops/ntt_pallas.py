"""Hand-tiled Pallas TPU kernel: negacyclic NTT/INTT at speed of light.

This is the TPU re-design of the reference's 128-lane NTT engine
(reference: src/vp/ntt/ntt_fsm.sv schedule, src/vp/vxu/ lanes,
src/vp/iconn/ lane interconnect):

  * A polynomial's 8192 coefficients live as a (64, 128) tile —
    coefficient i at (row i>>7, lane i&127), the same lane-striding as the
    reference SPM rows.  Values are uint32 (lo, hi) planes: TPU vector
    units have no 64-bit lanes, so 64-bit arithmetic is built from
    uint32/16-bit products (aloha_tpu.rns_jax), exactly as the reference
    builds 64-bit multiplies from 23-bit FPGA DSP tiles (mul64.sv).

  * Butterfly partner of element i is i XOR t.  For t >= 128 the partner
    sits t/128 *rows* away -> a sublane roll; for t < 128 it sits t
    *lanes* away -> a lane roll.  Rolls+selects replace the reference's
    Omega network / even-odd lane pairing: all 13 stages stay inside one
    kernel, in VMEM/registers.

  * Arithmetic is Harvey-lazy: values ride in [0, 4q) between stages,
    twiddle multiplies use Shoup precomputed quotients (floor(w*2^64/q)),
    costing one high and two low 64-bit products instead of a full
    Barrett chain.  A final canonicalization restores [0, q) — the result
    is bit-identical to the reference's per-butterfly-reduced datapath
    because both compute the exact transform.

Twiddles are per-element tables (logn, 64, 128) x {w_lo, w_hi, s_lo, s_hi}
precomputed on the host (the analogue of the reference's per-lane tf_rom
images, reference: sim/vp/tf_rom_generator/).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from aloha_tpu import rns_jax as r32
from aloha_tpu import rns_xla as _  # noqa: F401  (enables x64 for the u64 host wrappers)
from aloha_tpu.ntt_np import bit_reverse

try:  # pallas imports fail gracefully off-TPU
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

LANES = 128
U32 = np.uint32


def available() -> bool:
    if not _PALLAS_OK:
        return False
    try:
        plat = jax.default_backend()
    except Exception:  # pragma: no cover
        return False
    return plat not in ("cpu",)


# ------------------------------------------------------------------ tables
@functools.lru_cache(maxsize=None)
def _tables_np(n: int, root: int, q: int, inverse: bool):
    """(logn, rows, 128) float-free uint32 twiddle planes (w, shoup)."""
    logn = n.bit_length() - 1
    rows = n // LANES
    psis = [pow(root, bit_reverse(i, logn), q) for i in range(n)]
    i = np.arange(n)
    w_stage = []
    for s in range(logn):
        if inverse:
            idx = (n >> (s + 1)) + (i >> (s + 1))
        else:
            idx = (1 << s) + (i >> (logn - s))
        w_stage.append(np.array([psis[k] for k in idx], dtype=np.uint64))
    w = np.stack(w_stage).reshape(logn, rows, LANES)
    sh = np.zeros_like(w)
    flat_w = w.reshape(-1)
    flat_s = sh.reshape(-1)
    for k in range(flat_w.size):
        flat_s[k] = (int(flat_w[k]) << 64) // q
    w_lo = (w & 0xFFFFFFFF).astype(np.uint32)
    w_hi = (w >> np.uint64(32)).astype(np.uint32)
    s_lo = (sh & 0xFFFFFFFF).astype(np.uint32)
    s_hi = (sh >> np.uint64(32)).astype(np.uint32)
    return w_lo, w_hi, s_lo, s_hi


# ------------------------------------------------------------ in-kernel math
def _shoup_mul(vlo, vhi, wlo, whi, slo, shi, q: int):
    """x*w mod q, lazy output in [0, 2q), for x < 2^62 (Shoup constants)."""
    # t = hi64(x * wshoup)
    _, _, t_lo, t_hi = r32.mul64_wide(vlo, vhi, slo, shi)
    xw_lo, xw_hi = r32.mul64_lo(vlo, vhi, wlo, whi)
    tq_lo, tq_hi = r32.mul64_lo(t_lo, t_hi, *r32.const64(q))
    return r32.sub64(xw_lo, xw_hi, tq_lo, tq_hi)


def _condsub(lo, hi, c: int):
    """x - c if x >= c else x (c a python int)."""
    clo, chi = r32.const64(c)
    slo, shi = r32.sub64(lo, hi, clo, chi)
    pred = r32.ge64(lo, hi, clo, chi)
    return jnp.where(pred, slo, lo), jnp.where(pred, shi, hi)


def _add_const(lo, hi, c: int):
    return r32.add64(lo, hi, *r32.const64(c))


def _halfq(lo, hi, q: int):
    """x/2 mod q, lazy-safe: input < 2q -> output < 1.5q."""
    half_lo, half_hi = r32.const64((q + 1) >> 1)
    shr_lo = (lo >> U32(1)) | (hi << U32(31))
    shr_hi = hi >> U32(1)
    odd = (lo & U32(1)).astype(bool)
    return r32.add64(
        shr_lo,
        shr_hi,
        jnp.where(odd, half_lo, U32(0)),
        jnp.where(odd, half_hi, U32(0)),
    )


def _partner(x, bit, t: int, axis: int, roll):
    """Value at index (i XOR t) along `axis` via two rolls + select."""
    return jnp.where(bit, roll(x, t, axis), roll(x, -t, axis))


def _make_roll(interpret: bool):
    if interpret:
        return lambda x, s, a: jnp.roll(x, s, axis=a)
    return lambda x, s, a: pltpu.roll(
        x, shift=np.int32(s % x.shape[a]), axis=a % x.ndim
    )


# ------------------------------------------------------------------ kernels
#
# Row stages (butterfly distance t >= 128) use static reshapes: the pair
# halves are contiguous sublane groups, so no data movement primitive is
# needed.  Lane stages (t < 128) use lane rolls + selects (Mosaic supports
# dynamic rotates on the lane axis only).


def _ct_butterfly(ulo, uhi, vlo, vhi, wlo, whi, slo, shi, q):
    """Harvey CT: u in [0,4q) -> outputs in [0,4q).

    top = u' + w*v ; bottom = u' + 2q - w*v  (u' = u cond-sub 2q).
    """
    ulo, uhi = _condsub(ulo, uhi, 2 * q)
    wvlo, wvhi = _shoup_mul(vlo, vhi, wlo, whi, slo, shi, q)
    tlo, thi = r32.add64(ulo, uhi, wvlo, wvhi)
    blo, bhi = _add_const(ulo, uhi, 2 * q)
    blo, bhi = r32.sub64(blo, bhi, wvlo, wvhi)
    return (tlo, thi), (blo, bhi)


def _gs_butterfly(ulo, uhi, vlo, vhi, wlo, whi, slo, shi, q):
    """Lazy GS: inputs < 2q -> s0 = (u+v)/2 < 2q ; s1 = ((u-v)*w)/2 < 1.5q."""
    alo, ahi = r32.add64(ulo, uhi, vlo, vhi)  # < 4q
    s0lo, s0hi = _halfq(*_condsub(alo, ahi, 2 * q), q)
    dlo, dhi = _add_const(ulo, uhi, 2 * q)
    dlo, dhi = r32.sub64(dlo, dhi, vlo, vhi)  # u - v + 2q in (0,4q)
    wvlo, wvhi = _shoup_mul(dlo, dhi, wlo, whi, slo, shi, q)
    s1lo, s1hi = _halfq(wvlo, wvhi, q)
    return (s0lo, s0hi), (s1lo, s1hi)


def _row_split(x, tr: int):
    """(R, LANES) -> top/bottom halves of each 2*tr-row block.

    R may be bp*rows (several polys stacked along sublanes): 2*tr always
    divides the per-poly row count, so blocks never straddle polys.
    """
    R = x.shape[0]
    v = x.reshape(R // (2 * tr), 2, tr, LANES)
    return v[:, 0], v[:, 1]


def _row_join(top, bot):
    m, tr, lanes = top.shape
    return jnp.stack([top, bot], axis=1).reshape(m * 2 * tr, lanes)


def _ntt_stages(
    alo, ahi, wlo_ref, whi_ref, slo_ref, shi_ref,
    *, q: int, rows: int, bp: int, interpret: bool,
):
    """All 13 forward stages on (bp*rows, LANES) planes; returns planes in
    [0, q) canonical form."""
    logn = (rows * LANES).bit_length() - 1
    log_rows = rows.bit_length() - 1
    roll = _make_roll(interpret)
    R = bp * rows
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)

    def _tile(wrow):
        if bp == 1:
            return wrow
        return jnp.broadcast_to(wrow[None], (bp, rows, LANES)).reshape(
            R, LANES
        )

    # row stages: t = n/2 .. 128  (s = 0 .. log_rows-1)
    for s in range(log_rows):
        tr = rows >> (s + 1)
        ulo, vlo = _row_split(alo, tr)
        uhi, vhi = _row_split(ahi, tr)
        w = [
            _row_split(_tile(ref[s]), tr)[0]
            for ref in (wlo_ref, whi_ref, slo_ref, shi_ref)
        ]
        (tlo, thi), (blo, bhi) = _ct_butterfly(
            ulo, uhi, vlo, vhi, w[0], w[1], w[2], w[3], q
        )
        alo = _row_join(tlo, blo)
        ahi = _row_join(thi, bhi)

    # lane stages: t = 64 .. 1
    for s in range(log_rows, logn):
        t = (rows * LANES) >> (s + 1)
        bit = (lane_ids & t) != 0
        plo = _partner(alo, bit, t, -1, roll)
        phi = _partner(ahi, bit, t, -1, roll)
        ulo = jnp.where(bit, plo, alo)
        uhi = jnp.where(bit, phi, ahi)
        vlo = jnp.where(bit, alo, plo)
        vhi = jnp.where(bit, ahi, phi)
        (tlo, thi), (blo, bhi) = _ct_butterfly(
            ulo, uhi, vlo, vhi, _tile(wlo_ref[s]), _tile(whi_ref[s]),
            _tile(slo_ref[s]), _tile(shi_ref[s]), q,
        )
        alo = jnp.where(bit, blo, tlo)
        ahi = jnp.where(bit, bhi, thi)

    # canonicalize [0,4q) -> [0,q)
    alo, ahi = _condsub(alo, ahi, 2 * q)
    alo, ahi = _condsub(alo, ahi, q)
    return alo, ahi


def _ntt_kernel_body(
    wlo_ref, whi_ref, slo_ref, shi_ref, xlo_ref, xhi_ref, olo_ref, ohi_ref,
    *, q: int, rows: int, bp: int, interpret: bool,
):
    R = bp * rows
    alo, ahi = _ntt_stages(
        xlo_ref[...].reshape(R, LANES), xhi_ref[...].reshape(R, LANES),
        wlo_ref, whi_ref, slo_ref, shi_ref,
        q=q, rows=rows, bp=bp, interpret=interpret,
    )
    olo_ref[...] = alo.reshape(bp, rows, LANES)
    ohi_ref[...] = ahi.reshape(bp, rows, LANES)


def _intt_stages(
    alo, ahi, wlo_ref, whi_ref, slo_ref, shi_ref,
    *, q: int, rows: int, bp: int, interpret: bool,
):
    """All 13 inverse stages on (bp*rows, LANES) planes, canonical output."""
    logn = (rows * LANES).bit_length() - 1
    log_lanes = LANES.bit_length() - 1
    roll = _make_roll(interpret)
    R = bp * rows
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)

    def _tile(wrow):
        if bp == 1:
            return wrow
        return jnp.broadcast_to(wrow[None], (bp, rows, LANES)).reshape(
            R, LANES
        )

    # lane stages: t = 1 .. 64
    for s in range(log_lanes):
        t = 1 << s
        bit = (lane_ids & t) != 0
        plo = _partner(alo, bit, t, -1, roll)
        phi = _partner(ahi, bit, t, -1, roll)
        ulo = jnp.where(bit, plo, alo)
        uhi = jnp.where(bit, phi, ahi)
        vlo = jnp.where(bit, alo, plo)
        vhi = jnp.where(bit, ahi, phi)
        (s0lo, s0hi), (s1lo, s1hi) = _gs_butterfly(
            ulo, uhi, vlo, vhi, _tile(wlo_ref[s]), _tile(whi_ref[s]),
            _tile(slo_ref[s]), _tile(shi_ref[s]), q,
        )
        alo = jnp.where(bit, s1lo, s0lo)
        ahi = jnp.where(bit, s1hi, s0hi)

    # row stages: t = 128 .. n/2
    for s in range(log_lanes, logn):
        tr = (1 << s) // LANES
        ulo, vlo = _row_split(alo, tr)
        uhi, vhi = _row_split(ahi, tr)
        w = [
            _row_split(_tile(ref[s]), tr)[0]
            for ref in (wlo_ref, whi_ref, slo_ref, shi_ref)
        ]
        (s0lo, s0hi), (s1lo, s1hi) = _gs_butterfly(
            ulo, uhi, vlo, vhi, w[0], w[1], w[2], w[3], q
        )
        alo = _row_join(s0lo, s1lo)
        ahi = _row_join(s0hi, s1hi)

    alo, ahi = _condsub(alo, ahi, q)
    return alo, ahi


def _intt_kernel_body(
    wlo_ref, whi_ref, slo_ref, shi_ref, xlo_ref, xhi_ref, olo_ref, ohi_ref,
    *, q: int, rows: int, bp: int, interpret: bool,
):
    R = bp * rows
    alo, ahi = _intt_stages(
        xlo_ref[...].reshape(R, LANES), xhi_ref[...].reshape(R, LANES),
        wlo_ref, whi_ref, slo_ref, shi_ref,
        q=q, rows=rows, bp=bp, interpret=interpret,
    )
    olo_ref[...] = alo.reshape(bp, rows, LANES)
    ohi_ref[...] = ahi.reshape(bp, rows, LANES)


# ------------------------------------------------------------- host wrappers
def _call(kernel_body, a, q, root, inverse, interpret):
    """a: (..., n) uint64 -> (..., n) uint64, transform over last axis."""
    n = a.shape[-1]
    rows = n // LANES
    batch = a.shape[:-1]
    nb = int(np.prod(batch)) if batch else 1
    logn = n.bit_length() - 1

    # Polys per grid step.  >1 amortizes per-step overhead but multiplies
    # the VMEM table footprint and trips Mosaic compiler crashes on the
    # hosted remote-compile toolchain (bp=4 compiles only sometimes, bp=8
    # never) — default to the reliable 1, override via ALOHA_NTT_BP for
    # tuning runs.
    import os

    bp_req = int(os.environ.get("ALOHA_NTT_BP", "1"))
    bp = bp_req if (bp_req > 0 and nb % bp_req == 0) else 1

    w_lo, w_hi, s_lo, s_hi = (
        jnp.asarray(t) for t in _tables_np(n, root, q, inverse)
    )

    a3 = a.reshape(nb, rows, LANES)
    alo = (a3 & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    ahi = (a3 >> jnp.uint64(32)).astype(jnp.uint32)

    body = functools.partial(
        kernel_body, q=q, rows=rows, bp=bp, interpret=interpret
    )
    grid = (nb // bp,)
    # Index maps must stay int32 under Mosaic (python-int zeros trace as
    # i64 when x64 is on) AND must be *literal* constants for the table
    # blocks, so Pallas recognizes the block as revisited and skips the
    # HBM->VMEM re-fetch each grid step (6.8 MiB of twiddles otherwise
    # dominates the kernel).  np.int32 zeros satisfy both.
    z = np.int32(0)
    tbl_spec = pl.BlockSpec(
        (logn, rows, LANES), lambda i: (z, z, z),
        memory_space=pltpu.VMEM,
    )
    dat_spec = pl.BlockSpec(
        (bp, rows, LANES), lambda i: (i, z, z),
        memory_space=pltpu.VMEM,
    )
    # pallas index maps must trace in 32-bit (Mosaic rejects i64 grid
    # indices); the framework otherwise runs with x64 enabled.
    with jax.enable_x64(False):
        call = pl.pallas_call(
            lambda wl, wh, sl, sh, xl, xh, ol, oh: body(
                wl, wh, sl, sh, xl, xh, ol, oh
            ),
            grid=grid,
            in_specs=[tbl_spec] * 4 + [dat_spec] * 2,
            out_specs=[dat_spec] * 2,
            out_shape=[
                jax.ShapeDtypeStruct((nb, rows, LANES), jnp.uint32),
                jax.ShapeDtypeStruct((nb, rows, LANES), jnp.uint32),
            ],
            interpret=interpret,
        )
    olo, ohi = call(w_lo, w_hi, s_lo, s_hi, alo, ahi)

    out = olo.astype(jnp.uint64) | (ohi.astype(jnp.uint64) << jnp.uint64(32))
    return out.reshape(batch + (n,))


def ntt(a, q: int, psi: int, interpret: bool = False):
    """Forward negacyclic NTT (natural in, bitrev out) over the last axis."""
    return _call(_ntt_kernel_body, a, q, psi, False, interpret)


def intt(a, q: int, ipsi: int, interpret: bool = False):
    """Inverse NTT (bitrev in, natural out) over the last axis."""
    return _call(_intt_kernel_body, a, q, ipsi, True, interpret)
