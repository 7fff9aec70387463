"""Transform dispatch: choose the NTT implementation for the HE ops.

Four implementations share semantics (bit-identical results):
  * `xla`    — aloha_tpu.ntt_jax, compiler-friendly graphs, runs anywhere
  * `pallas` — aloha_tpu.ops.ntt_pallas, hand-tiled grid kernel
  * `stream` — aloha_tpu.ops.ntt_stream, single-launch DMA-pipelined batch
               kernel (best for large batches)
  * `mxu`    — aloha_tpu.ops.ntt_mxu, 4-step int8-digit matmul kernel
               (fastest measured; needs q in (2^59, 2^60) — other moduli
               fall through to `stream` transparently)

Selection: explicit `set_impl(...)`, or env ALOHA_NTT_IMPL; by default the
fastest available path is picked automatically — the MXU kernel on a TPU
backend when the modulus/ring fit, else the grid kernel, else the XLA
graph — with a one-shot fallback to `xla` if the kernel path fails to
compile on the hosted toolchain.
"""

from __future__ import annotations

import os
import warnings

from aloha_tpu import ntt_jax

_impl = os.environ.get("ALOHA_NTT_IMPL", "auto")
_IMPLS = ("auto", "xla", "pallas", "stream", "mxu")


def set_impl(name: str) -> None:
    global _impl
    if name not in _IMPLS:
        raise ValueError(f"unknown NTT impl {name!r}; pick one of {_IMPLS}")
    _impl = name


def get_impl() -> str:
    return _resolve() if _impl == "auto" else _impl


def _resolve(a=None, q=None) -> str:
    """Auto-selection order, fastest measured first:
    mxu (1.02M NTT/s) -> stream (~400k) -> pallas grid (~110k) -> xla.
    Shape/modulus-gated tiers fall through to the next when the operand
    does not fit (or when no operand is given, e.g. `get_impl()`)."""
    from aloha_tpu.ops import ntt_pallas

    if not ntt_pallas.available():
        return "xla"
    if a is not None and q is not None and _mxu_fits(a, q):
        return "mxu"
    if a is not None and _stream_fits(a):
        return "stream"
    return "pallas"


def _stream_fits(a) -> bool:
    """The streaming kernel tiles the ring as (rows, 128) with at least
    two sublane rows; any power-of-two n >= 256 qualifies."""
    n = a.shape[-1]
    if n < 256 or n & (n - 1):
        return False
    from aloha_tpu.ops import ntt_stream

    return ntt_stream.available()


def _fallback(exc: Exception) -> None:
    """Kernel compile failed (hosted remote-compile toolchains vary):
    demote to the XLA path for the rest of the process."""
    global _impl
    warnings.warn(
        f"Pallas NTT kernel unavailable ({type(exc).__name__}: {exc}); "
        "falling back to the XLA path"
    )
    _impl = "xla"


def _mxu_fits(a, q: int) -> bool:
    """The MXU kernel's preconditions: 60-bit modulus with a positive
    sparse delta (q - 2^59 > 0) and a power-of-two n with at least two
    sublane rows so the 4-step row factor is a real (R, R) matmul."""
    n = a.shape[-1]
    if n < 256 or n & (n - 1) or not (1 << 59) < q < (1 << 60):
        return False
    from aloha_tpu.ops import ntt_mxu

    try:
        ntt_mxu._check_fold_margin(n, q)
    except AssertionError:
        return False
    return ntt_mxu.available()


def _run(kind: str, a, q: int, root: int):
    # auto resolution is fully shape/availability-gated in _resolve; an
    # EXPLICIT mxu request still demotes to stream when the modulus
    # cannot use the single-fold reduction (the caller opted into the
    # kernel family, not a wrong answer), but no further — explicit
    # choices are otherwise trusted (interpret mode runs them on CPU).
    impl = _impl if _impl != "auto" else _resolve(a, q)
    if impl == "mxu" and not _mxu_fits(a, q):
        impl = "stream"
    if impl in ("pallas", "stream", "mxu"):
        try:
            if impl == "stream":
                from aloha_tpu.ops import ntt_stream as mod
            elif impl == "mxu":
                from aloha_tpu.ops import ntt_mxu as mod
            else:
                from aloha_tpu.ops import ntt_pallas as mod
            return getattr(mod, kind)(a, q, root)
        except Exception as exc:  # pragma: no cover - toolchain dependent
            _fallback(exc)
    return getattr(ntt_jax, kind)(a, q, root)


def ntt(a, q: int, psi: int):
    return _run("ntt", a, q, psi)


def intt(a, q: int, ipsi: int):
    return _run("intt", a, q, ipsi)
