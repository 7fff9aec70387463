"""JAX execution backend: the TPU compute path of the replayer.

`JaxBackend` implements the same backend protocol as
`aloha_tpu.isa.interp.NumpyBackend` but over jnp.uint64 arrays, so the
`VectorProcessor` doubles as a *tracer*: replaying a program under
`jax.jit` (see `make_executable`) compiles the entire instruction sequence
— every load, NTT, butterfly and store — into ONE fused XLA program.  That
is the TPU-native equivalent of the reference's in-order sequencer
streaming micro-ops through the 128-lane array
(reference: src/vp/sequncer/seq_top.v): decode work happens once on the
host, the device runs a single optimized executable per (program, launch
pointers) pair, and repeated launches hit the executable cache.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from aloha_tpu import ntt_jax
from aloha_tpu import rns_xla as r
from aloha_tpu.config import HEConfig, NUM_LANES
from aloha_tpu.isa.interp import LaunchArgs, VectorProcessor


class JaxBackend:
    """jnp.uint64 arrays + XLA-emulated 64-bit ops; traced (jit) or eager."""

    name = "jax"

    def wrap(self, arr):
        return jnp.asarray(np.asarray(arr, dtype=np.uint64))

    def unwrap(self, arr):
        return np.asarray(arr, dtype=np.uint64)

    def zeros(self, shape):
        return jnp.zeros(shape, dtype=jnp.uint64)

    # element-wise
    def mulmod(self, a, b, q):
        return r.mulmod(a, b, q)

    def mulmod_scalar(self, a, s, q):
        return r.mulmod(a, jnp.broadcast_to(r.u64(int(s)), a.shape), q)

    def addmod(self, a, b, q):
        return r.addmod(a, b, q)

    def addmod_scalar(self, a, s, q):
        return r.addmod(a, r.u64(int(s)), q)

    def submod(self, a, b, q):
        return r.submod(a, b, q)

    def submod_scalar(self, a, s, q, reverse=False):
        s = r.u64(int(s))
        return r.submod(s, a, q) if reverse else r.submod(a, s, q)

    def modred(self, a, q):
        return r.modred(a, q)

    def lazy_reduce(self, a, q):
        return r.lazy_reduce(a, q)

    # transforms
    def ntt(self, a, q, psi):
        return ntt_jax.ntt(a, q, psi)

    def intt(self, a, q, ipsi):
        return ntt_jax.intt(a, q, ipsi)

    def automorphism(self, a, step, q):
        return ntt_jax.automorphism(a, step, q)

    def rotate_lanes(self, a, step):
        return ntt_jax.rotate_lanes(a, int(step))

    # memory: SPM/KSK arrays are (rows, 128) uint64
    def begin_launch(self, mem):
        return mem  # functional updates below; no snapshot needed

    def read_rows(self, mem, row, nrows):
        return mem[row : row + nrows].reshape(-1)

    def write_rows(self, mem, row, value):
        return mem.at[row : row + value.shape[0] // NUM_LANES].set(
            value.reshape(-1, NUM_LANES)
        )


_PROGRAM_REGISTRY = {}


@functools.lru_cache(maxsize=None)
def _cached_executable(
    cfg: HEConfig, program_digest, pc, src0, src1, rslt, step, ksk_ptr
):
    program = _PROGRAM_REGISTRY[program_digest]
    vp = VectorProcessor(cfg, JaxBackend())
    args = LaunchArgs(
        pc=pc, src0=src0, src1=src1, rslt=rslt, step=step, ksk_ptr=ksk_ptr
    )

    @jax.jit
    def run(spm, ksk_mem):
        return vp.run(program, spm, ksk_mem, args)

    return run


def make_executable(cfg: HEConfig, program, args: LaunchArgs, program_key=None):
    """Compile one (program, launch CSRs) pair into a jitted executable.

    Cached by the program's *contents* (instruction encodings), so reusing
    a name for a different program can never return a stale executable.
    `program_key` is accepted for API compatibility but only the digest
    matters.
    """
    del program_key  # caching is content-addressed
    digest = tuple(i.encode() for i in program)
    _PROGRAM_REGISTRY[digest] = program
    return _cached_executable(
        cfg, digest, args.pc, args.src0, args.src1, args.rslt, args.step,
        args.ksk_ptr,
    )
