"""CPU (interpret-mode) bit-exactness of the streaming NTT kernel.

The streaming kernel's math previously had hardware-only coverage
(tests/test_tpu_hw.py); ALOHA_STREAM_INTERPRET=1 runs the same pallas
body through the interpreter so every formulation (static/dyn row
stages, pair/roll lane stages) is certified against the NumPy golden
model in CI.  Small batches only — interpret mode is slow.

(reference semantics: the 832-beat NTT engine schedule,
src/vp/ntt/ntt_fsm.sv:49,68)
"""

import numpy as np
import pytest

from aloha_tpu import ntt_np
from aloha_tpu.config import DEFAULT_CONFIG as CFG

pytest.importorskip("jax.experimental.pallas")


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setenv("ALOHA_STREAM_INTERPRET", "1")


def _run(nb, q, psi, ipsi):
    import jax.numpy as jnp

    from aloha_tpu.ops import ntt_stream

    rng = np.random.default_rng(nb)
    a = rng.integers(0, q, size=(nb, CFG.n), dtype=np.uint64)
    want = np.stack([ntt_np.ntt(a[i], q, psi) for i in range(nb)])
    got = np.asarray(ntt_stream.ntt(jnp.asarray(a), q, psi))
    assert np.array_equal(got, want)
    back = np.asarray(ntt_stream.intt(jnp.asarray(got), q, ipsi))
    assert np.array_equal(back, a)


@pytest.mark.parametrize("mode", ["pair", "roll"])
def test_lane_modes(monkeypatch, mode):
    monkeypatch.setenv("ALOHA_STREAM_LANEMODE", mode)
    monkeypatch.setenv("ALOHA_STREAM_BP", "2")
    _run(2, CFG.moduli[0], CFG.psi[0], CFG.ipsi[0])


@pytest.mark.parametrize("rowmode", ["static", "dyn"])
def test_row_modes(monkeypatch, rowmode):
    monkeypatch.setenv("ALOHA_STREAM_ROWMODE", rowmode)
    monkeypatch.setenv("ALOHA_STREAM_BP", "2")
    _run(2, CFG.moduli[1], CFG.psi[1], CFG.ipsi[1])


def test_odd_bp_falls_back_to_roll(monkeypatch):
    # nb=1 forces bp=1: the pair path requires even bp and must fall back
    monkeypatch.setenv("ALOHA_STREAM_BP", "4")
    _run(1, CFG.special_prime, CFG.psi[-1], CFG.ipsi[-1])
