"""Multi-host scaling: jax.distributed bring-up and pod meshes.

The reference is single-chip; its host link is AXI-Lite + DMA
(reference: src/top/h2_top.sv:40-89).  Scaling this framework beyond one
host follows the standard JAX recipe: every process calls
`initialize()`, builds the same global mesh over `jax.devices()` (all
processes' devices), and the GSPMD/shard_map code in this package runs
unchanged — batch (dp) and coefficient axes land on ICI within a slice
and DCN across hosts.

Single-process use is a no-op passthrough, so the same entry point works
from 1 chip to a pod. Multi-host paths are exercised by
tools/bench_scaling.py (requires a real multi-host slice; the hosted
single-chip environment can't run them — see docs/DESIGN.md).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Bring up jax.distributed when running multi-process.

    Arguments default from the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or the
    TPU pod runtime's automatic values).  Single-process: returns without
    initializing.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if (num_processes or 1) <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def pod_mesh(axis_names: Sequence[str] = ("dp", "coeff"), dp: int = 0):
    """Global mesh over every device in the job (all hosts).

    `dp` = size of the data-parallel axis (0 = auto: one dp group per
    host, so the coeff axis stays inside each host's ICI domain and only
    batch-parallel traffic crosses DCN — the layout SURVEY.md 2g calls
    for).
    """
    import jax
    from jax.sharding import Mesh

    devs = np.array(jax.devices())
    if dp <= 0:
        dp = max(1, jax.process_count())
    if devs.size % dp:
        raise ValueError(f"{devs.size} devices not divisible by dp={dp}")
    return Mesh(devs.reshape(dp, devs.size // dp), axis_names=tuple(axis_names))
