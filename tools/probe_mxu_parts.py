"""Where does the MXU NTT's time go?  Timing-only kernel variants.

Builds three streaming kernels sharing the production chunk pipeline
(ALOHA_STREAM_BP chunking, double-buffered DMA) whose stage body is:

  full  - the production 4-step body (baseline),
  mxu   - digit splits + the 16 dots only (recombine/Shoup/fold replaced
          by trivial glue): the matmul + split cost,
  vpu   - the recombine/Shoup/recombine/fold chain only (dots skipped):
          the modular-arithmetic VPU cost.

NOT bit-exact (except full) - timing forensics only.
Env: NB (256), ALOHA_STREAM_BP (32), KS ("4,12").
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import functools
import os, time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aloha_tpu.config import DEFAULT_CONFIG as CFG
from aloha_tpu.ops import ntt_mxu as M
from aloha_tpu.ops import ntt_stream as S
from aloha_tpu.ops.ntt_pallas import LANES

NB = int(os.environ.get("NB", "256"))
q, psi = CFG.moduli[0], CFG.psi[0]
n = CFG.n
rows = n // LANES
I32, U32, NDIG = M.I32, M.U32, M.NDIG


def make_stages(variant, tbls, bp):
    A1, T3, Dp, C1, C3 = tbls
    b1, b3 = M._bias_bits(NDIG * rows), M._bias_bits(NDIG * LANES)

    def full(alo, ahi):
        return M._fwd_stages(tbls, q, rows, bp)(alo, ahi)

    def mxu(alo, ahi):
        alo = jnp.transpose(alo, (1, 0, 2))
        ahi = jnp.transpose(ahi, (1, 0, 2))
        digs = M._split8(alo, ahi)
        S2 = jnp.concatenate(digs, axis=0).reshape(NDIG * rows, bp * LANES)
        es = [M._dot(A1[j], S2).reshape(rows, bp, LANES)
              for j in range(NDIG)]
        # trivial glue: xor-fold the accumulators into a u32 pair
        acc = es[0]
        for e in es[1:]:
            acc = acc ^ e
        ylo, yhi = acc.astype(U32), (acc + 1).astype(U32)
        ydigs = M._split8(ylo, yhi)
        Y2 = jnp.concatenate(ydigs, axis=2).reshape(
            rows * bp, NDIG * LANES)
        es3 = [M._dot(Y2, T3[j]).reshape(rows, bp, LANES)
               for j in range(NDIG)]
        acc = es3[0]
        for e in es3[1:]:
            acc = acc ^ e
        zlo, zhi = acc.astype(U32), (acc ^ 3).astype(U32)
        return (
            jnp.transpose(zlo, (1, 0, 2)), jnp.transpose(zhi, (1, 0, 2))
        )

    def vpu(alo, ahi):
        alo = jnp.transpose(alo, (1, 0, 2))
        ahi = jnp.transpose(ahi, (1, 0, 2))
        # fake accumulators derived from the input (no dots)
        es = [(alo ^ U32(j)).astype(I32) for j in range(NDIG)]
        wlo, whi = M._recombine(
            es, b1, C1[0][:, None, :], C1[1][:, None, :], q)
        ylo, yhi = M._shoup_const(
            wlo, whi, tuple(t[:, None, :] for t in Dp), q)
        es3 = [(ylo ^ yhi ^ U32(j)).astype(I32) for j in range(NDIG)]
        zlo, zhi = M._recombine(
            es3, b3, C3[0][0][None, None, :], C3[1][0][None, None, :], q)
        zlo, zhi = M._fold_final(zlo, zhi, q)
        return (
            jnp.transpose(zlo, (1, 0, 2)), jnp.transpose(zhi, (1, 0, 2))
        )

    return {"full": full, "mxu": mxu, "vpu": vpu}[variant]


def build(variant):
    nb = NB
    bp, nchunks = S._chunking(nb)
    tables = M._tables_jax(n, q, psi, False)

    def body(*refs):
        A1, T3, dwl, dwh, ds0, ds1, ds2, ds3, c1l, c1h, c3l, c3h, \
            xlo, xhi, olo, ohi = refs
        tbls = (
            A1, T3,
            (dwl[:], dwh[:], ds0[:], ds1[:], ds2[:], ds3[:]),
            (c1l[:], c1h[:]), (c3l[:], c3h[:]),
        )
        stages = make_stages(variant, tbls, bp)

        def hbm_at(ref, c):
            return ref.at[pl.ds(c * np.int32(bp), bp)]

        def inner(ilo, ihi, qlo, qhi, sem_in, sem_out):
            S._chunk_pipeline(
                ilo, ihi, qlo, qhi, sem_in, sem_out,
                stages, nchunks, bp, xlo, xhi, olo, ohi, hbm_at,
            )

        S._scoped_pipeline(inner, bp, rows)

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    shape = (nb, rows, LANES)

    def call(alo, ahi):
        with jax.enable_x64(False):
            return pl.pallas_call(
                body,
                in_specs=[vmem] * len(tables) + [hbm] * 2,
                out_specs=[hbm] * 2,
                out_shape=[jax.ShapeDtypeStruct(shape, jnp.uint32)] * 2,
                input_output_aliases={len(tables): 0, len(tables) + 1: 1},
                compiler_params=pltpu.CompilerParams(
                    has_side_effects=True,
                    vmem_limit_bytes=int(os.environ.get(
                        "ALOHA_STREAM_VMEM", str(100 * 2**20))),
                ),
            )(*tables, alo, ahi)

    return call


rng = np.random.default_rng(0)
a = rng.integers(0, q, size=(NB, n), dtype=np.uint64)
alo = jnp.asarray((a & 0xFFFFFFFF).astype(np.uint32).reshape(NB, rows, LANES))
ahi = jnp.asarray((a >> np.uint64(32)).astype(np.uint32).reshape(NB, rows, LANES))
KS = tuple(int(x) for x in os.environ.get("KS", "4,12").split(","))

for variant in ("full", "mxu", "vpu"):
    fn = build(variant)
    res = {}
    for K in KS:
        def chain(l, h, K=K):
            for _ in range(K):
                l, h = fn(l, h)
            return l, h
        f = jax.jit(chain)
        t0 = time.perf_counter()
        out = f(alo, ahi)
        _ = np.asarray(out[0][0, 0, 0])
        compile_s = time.perf_counter() - t0
        times = []
        for _t in range(6):
            t0 = time.perf_counter()
            out = f(alo, ahi)
            _ = np.asarray(out[0][0, 0, 0])
            times.append(time.perf_counter() - t0)
        res[K] = min(times)
        print(f"{variant} K={K}: min {res[K]*1e3:.1f} ms "
              f"(compile {compile_s:.0f}s)", flush=True)
    k0, k1 = KS[0], KS[-1]
    marg = (res[k1] - res[k0]) / (NB * (k1 - k0)) * 1e6
    print(f"{variant}: marginal {marg:.3f} us/poly", flush=True)
