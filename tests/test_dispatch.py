"""NTT implementation dispatch: auto-selection and the one-shot fallback."""
import numpy as np
import pytest

from aloha_tpu import ntt_jax, ntt_np
from aloha_tpu.config import DEFAULT_CONFIG as CFG
from aloha_tpu.ops import dispatch


@pytest.fixture(autouse=True)
def _restore_impl():
    old = dispatch._impl
    yield
    dispatch._impl = old


def test_auto_resolves_to_xla_on_cpu():
    dispatch.set_impl("auto")
    assert dispatch.get_impl() == "xla"  # the suite pins the CPU backend


def test_auto_resolution_order(monkeypatch):
    """auto resolves mxu -> stream -> pallas-grid -> xla; an
    MXU-ineligible modulus must land on the stream kernel (~400k NTT/s),
    not the 4x-slower grid kernel."""
    from aloha_tpu.ops import ntt_mxu, ntt_pallas, ntt_stream

    monkeypatch.setattr(ntt_pallas, "available", lambda: True)
    monkeypatch.setattr(ntt_stream, "available", lambda: True)
    monkeypatch.setattr(ntt_mxu, "available", lambda: True)
    dispatch.set_impl("auto")
    a = np.zeros((1, 8192), dtype=np.uint64)
    q_fit = CFG.moduli[0]  # in (2^59, 2^60): the MXU kernel qualifies
    assert dispatch._resolve(a, q_fit) == "mxu"
    q_low = (1 << 59) - 45  # valid datapath modulus below the 2^59 floor
    assert dispatch._resolve(a, q_low) == "stream"
    a_small = np.zeros((1, 128), dtype=np.uint64)  # single sublane row
    assert dispatch._resolve(a_small, q_low) == "pallas"
    monkeypatch.setattr(ntt_pallas, "available", lambda: False)
    assert dispatch._resolve(a, q_fit) == "xla"


def test_explicit_rejects_unknown():
    with pytest.raises(ValueError):
        dispatch.set_impl("cuda")


def test_mxu_impl_runs_bit_exact(monkeypatch):
    """Explicit `mxu` reaches the 4-step kernel (interpret mode on CPU)
    and returns the golden transform."""
    from aloha_tpu.ops import ntt_mxu

    monkeypatch.setenv("ALOHA_STREAM_INTERPRET", "1")
    monkeypatch.setenv("ALOHA_STREAM_BP", "2")
    monkeypatch.setattr(ntt_mxu, "available", lambda: True)
    dispatch.set_impl("mxu")
    q, psi = CFG.moduli[0], CFG.psi[0]
    n = 1024
    psi_n = pow(psi, CFG.n // n, q)
    a = np.random.default_rng(1).integers(0, q, size=(2, n), dtype=np.uint64)
    out = dispatch.ntt(a, q, psi_n)
    assert np.array_equal(np.asarray(out), ntt_np.ntt(a, q, psi_n))


def test_mxu_unfit_modulus_demotes_to_stream(monkeypatch):
    """A modulus outside (2^59, 2^60) cannot use the single-fold MXU
    reduction; the dispatcher must route it to the stream kernel."""
    from aloha_tpu.ops import ntt_mxu, ntt_stream

    seen = {}

    def fake_stream_ntt(a, q, root):
        seen["q"] = q
        return a

    monkeypatch.setattr(ntt_mxu, "available", lambda: True)
    monkeypatch.setattr(ntt_stream, "ntt", fake_stream_ntt)
    dispatch.set_impl("mxu")
    q = (1 << 59) - 45  # valid datapath modulus, but below the 2^59 floor
    a = np.zeros((1, 1024), dtype=np.uint64)
    dispatch.ntt(a, q, 3)
    assert seen["q"] == q


def test_kernel_failure_falls_back_to_xla(monkeypatch):
    """A kernel-path compile failure must demote to XLA and still return
    the bit-exact result (the hosted remote-compile service can 500)."""
    from aloha_tpu.ops import ntt_pallas

    def boom(*a, **k):
        raise RuntimeError("tpu_compile_helper exit code 1")

    monkeypatch.setattr(ntt_pallas, "ntt", boom)
    dispatch.set_impl("pallas")
    q, psi = CFG.moduli[0], CFG.psi[0]
    a = np.random.default_rng(0).integers(0, q, size=CFG.n, dtype=np.uint64)
    with pytest.warns(UserWarning, match="falling back"):
        out = dispatch.ntt(a, q, psi)
    assert np.array_equal(np.asarray(out), ntt_np.ntt(a, q, psi))
    assert dispatch.get_impl() == "xla"  # demotion sticks for the process
