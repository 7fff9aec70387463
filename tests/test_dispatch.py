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


def test_explicit_rejects_unknown():
    with pytest.raises(ValueError):
        dispatch.set_impl("cuda")


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
