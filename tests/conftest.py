"""Test configuration.

Sharding tests run on a virtual 8-device CPU mesh (the reference validates
its engine "without a real cluster" the same way — a pure-simulation harness
against a software oracle, reference: sim/vp/top/vp_top_tb.sv).  The XLA
flags must be set before jax is first imported, hence this conftest.
"""

import os
import pathlib

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The hosted environment pins JAX_PLATFORMS to its TPU plugin; the env var
# route is overridden there, so force the CPU backend through jax.config
# (tests must not burn TPU time — and need the 8 virtual devices above).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

#: Location of the reference repo's golden vectors (not shipped with this
#: package; tests that need them are skipped when absent).
REF_ROOT = pathlib.Path(os.environ.get("ALOHA_REF", "/root/reference"))
TV_ROOT = REF_ROOT / "tv"

requires_tv = pytest.mark.skipif(
    not TV_ROOT.is_dir(), reason="reference tv/ golden vectors not available"
)


def load_tv(case: str, name: str) -> np.ndarray:
    """Load one tv/ dump: decimal uint64 values, one per line."""
    path = TV_ROOT / case / f"{name}.txt"
    return np.loadtxt(path, dtype=np.uint64)


def tv_cases():
    if not TV_ROOT.is_dir():
        return []
    return sorted(p.name for p in TV_ROOT.iterdir() if p.is_dir())


def tv_kernels(case: str, suffix: str):
    """All kernel indices in a case that have files ending with `suffix`."""
    d = TV_ROOT / case
    out = []
    for p in sorted(d.glob(f"kernel*_{suffix}.txt")):
        out.append(p.name.split("_")[0].removeprefix("kernel"))
    return out


@pytest.fixture(scope="session")
def cfg():
    from aloha_tpu.config import DEFAULT_CONFIG

    return DEFAULT_CONFIG
