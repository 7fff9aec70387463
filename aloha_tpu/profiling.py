"""Launch profiling: per-kernel wall time + device profiler traces.

The reference's observability is simulation artifacts — FSDB waves, cycle
counters in the testbenches, per-op latency fields in the shadow pipeline
(reference: sim/vp/*/run_verdi.sh, vp_top_tb.sv:107-108,285-292).  The TPU
equivalents: wall-clock timers around launches plus the JAX device
profiler (XPlane traces viewable in TensorBoard/Perfetto).
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Dict, List, Optional


@dataclasses.dataclass
class LaunchRecord:
    name: str
    seconds: float


class Profiler:
    """Collects per-launch wall times; optionally wraps jax.profiler."""

    def __init__(self, trace_dir: Optional[str] = None):
        self.records: List[LaunchRecord] = []
        self.trace_dir = trace_dir

    @contextlib.contextmanager
    def launch(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.records.append(
                LaunchRecord(name=name, seconds=time.perf_counter() - t0)
            )

    @contextlib.contextmanager
    def device_trace(self):
        """Capture an XLA device profile (jax.profiler) around a region."""
        if self.trace_dir is None:
            yield
            return
        import jax

        jax.profiler.start_trace(self.trace_dir)
        try:
            yield
        finally:
            jax.profiler.stop_trace()

    def summary(self) -> Dict[str, dict]:
        out: Dict[str, dict] = {}
        for r in self.records:
            s = out.setdefault(
                r.name, {"count": 0, "total_s": 0.0, "max_s": 0.0}
            )
            s["count"] += 1
            s["total_s"] += r.seconds
            s["max_s"] = max(s["max_s"], r.seconds)
        for s in out.values():
            s["mean_s"] = s["total_s"] / s["count"]
        return out


def profile_device(device, profiler: Profiler):
    """Wrap an AlohaDevice so every run_vp launch is timed."""
    orig = device.run_vp

    def run_vp(pc, src0, src1, rslt, step=0, ksk_ptr=0):
        with profiler.launch(f"run_vp[pc={pc}]"):
            return orig(pc, src0, src1, rslt, step, ksk_ptr)

    device.run_vp = run_vp
    return device
