"""Transform dispatch: choose the NTT implementation for the HE ops.

Two implementations share semantics (bit-identical results):
  * `xla`    — aloha_tpu.ntt_jax, compiler-friendly graphs, runs anywhere
  * `pallas` — aloha_tpu.ops.ntt_pallas, hand-tiled TPU kernels

Selection: explicit `set_impl("pallas"|"xla")`, or env ALOHA_NTT_IMPL;
default is `xla` (the Pallas path is opt-in because remote kernel-compile
availability varies across hosted TPU environments — see docs/DESIGN.md).
"""

from __future__ import annotations

import os

from aloha_tpu import ntt_jax

_impl = os.environ.get("ALOHA_NTT_IMPL", "xla")


def set_impl(name: str) -> None:
    global _impl
    if name not in ("xla", "pallas"):
        raise ValueError(f"unknown NTT impl {name!r}")
    _impl = name


def get_impl() -> str:
    return _impl


def ntt(a, q: int, psi: int):
    if _impl == "pallas":
        from aloha_tpu.ops import ntt_pallas

        return ntt_pallas.ntt(a, q, psi)
    return ntt_jax.ntt(a, q, psi)


def intt(a, q: int, ipsi: int):
    if _impl == "pallas":
        from aloha_tpu.ops import ntt_pallas

        return ntt_pallas.intt(a, q, ipsi)
    return ntt_jax.intt(a, q, ipsi)
