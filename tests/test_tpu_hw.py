"""Hardware-marked kernel bit-exactness (auto-skips off-TPU).

The rest of the suite pins the CPU backend (conftest), so real-TPU
verification runs in a clean subprocess: the streaming kernel and the
grid kernel must produce bit-exact transforms on hardware vs the NumPy
golden model.  Skips when no TPU platform is configured, and skips
(with reason) if the hosted remote-compile service exceeds the budget —
pass ALOHA_TPU_TEST_BUDGET to change it.
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import numpy as np
import jax.numpy as jnp
from aloha_tpu import ntt_np
from aloha_tpu.config import DEFAULT_CONFIG as CFG
from aloha_tpu.ops import ntt_pallas, ntt_stream

assert ntt_pallas.available(), "no TPU backend"
q, psi, ipsi = CFG.moduli[0], CFG.psi[0], CFG.ipsi[0]
rng = np.random.default_rng(0)
a = rng.integers(0, q, size=(8, CFG.n), dtype=np.uint64)
want = np.stack([ntt_np.ntt(a[i], q, psi) for i in range(8)])

got_stream = np.asarray(ntt_stream.ntt(jnp.asarray(a), q, psi))
assert np.array_equal(got_stream, want), "streaming kernel mismatch"
back = np.asarray(ntt_stream.intt(jnp.asarray(got_stream), q, ipsi))
assert np.array_equal(back, a), "streaming roundtrip mismatch"

got_grid = np.asarray(ntt_pallas.ntt(jnp.asarray(a), q, psi))
assert np.array_equal(got_grid, want), "grid kernel mismatch"
print("TPU_HW_OK")
"""

_ROTATE_SCRIPT = r"""
import numpy as np
from aloha_tpu import he_np, he_planes, keys
from aloha_tpu.config import DEFAULT_CONFIG as CFG
from aloha_tpu.ops import ks_kernel

assert ks_kernel.available(), "no TPU backend"
L, N = CFG.n_limbs, CFG.n
rng = np.random.default_rng(7)
a = rng.integers(0, CFG.moduli[0], size=(L, N), dtype=np.uint64)
b = rng.integers(0, CFG.moduli[0], size=(L, N), dtype=np.uint64)
sk = keys.gen_secret(CFG, rng=np.random.default_rng(1))
ksk = keys.gen_rotation_key(sk, 2, CFG, rng=np.random.default_rng(2))
ct = (he_planes.from_u64(a), he_planes.from_u64(b))
oa, ob = he_planes.rotate(ct, 2, he_planes.from_u64(ksk), CFG)
want = he_np.rotate(he_np.Ciphertext(a=a.copy(), b=b.copy()), 2, ksk, CFG)
assert np.array_equal(np.asarray(he_planes.to_u64(oa)), want.a), "a mismatch"
assert np.array_equal(np.asarray(he_planes.to_u64(ob)), want.b), "b mismatch"
print("TPU_ROTATE_OK")
"""


@pytest.mark.tpu
def test_kernels_bitexact_on_hardware():
    if os.environ.get("JAX_PLATFORMS", "") not in ("axon", "tpu"):
        pytest.skip("no TPU platform configured (JAX_PLATFORMS)")
    if not os.environ.get("ALOHA_TPU_TESTS"):
        pytest.skip(
            "TPU hardware test is opt-in (set ALOHA_TPU_TESTS=1): it costs "
            "minutes of remote kernel-compile and must not contend with "
            "benchmark runs on the single shared chip"
        )
    budget = int(os.environ.get("ALOHA_TPU_TEST_BUDGET", "480"))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # drop the CPU-suite virtual-device flags
    try:
        out = subprocess.run(
            [sys.executable, "-c", _SCRIPT],
            cwd=REPO, env=env, capture_output=True, text=True,
            timeout=budget,
        )
    except subprocess.TimeoutExpired:
        pytest.skip(f"remote kernel-compile exceeded {budget}s budget")
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "TPU_HW_OK" in out.stdout


@pytest.mark.tpu
def test_fused_rotate_bitexact_on_hardware():
    """The 2-launch ks_head/ks_tail rotation (in-kernel automorphism via
    one-hot MXU matmuls + sublane rolls) vs the NumPy oracle on the real
    chip.  Opt-in like the kernel test; the fused bodies are minutes-scale
    remote compiles."""
    if os.environ.get("JAX_PLATFORMS", "") not in ("axon", "tpu"):
        pytest.skip("no TPU platform configured (JAX_PLATFORMS)")
    if not os.environ.get("ALOHA_TPU_TESTS"):
        pytest.skip("TPU hardware test is opt-in (set ALOHA_TPU_TESTS=1)")
    budget = int(os.environ.get("ALOHA_TPU_TEST_BUDGET", "900"))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    try:
        out = subprocess.run(
            [sys.executable, "-c", _ROTATE_SCRIPT],
            cwd=REPO, env=env, capture_output=True, text=True,
            timeout=budget,
        )
    except subprocess.TimeoutExpired:
        pytest.skip(f"remote kernel-compile exceeded {budget}s budget")
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "TPU_ROTATE_OK" in out.stdout
