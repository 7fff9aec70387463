"""Digit-sharded rotation (psum keyswitch) vs the golden vectors."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from aloha_tpu.config import DEFAULT_CONFIG as CFG
from aloha_tpu.parallel.keyswitch_sharded import rotate_sharded

from conftest import load_tv, requires_tv

N = CFG.n

requires_2dev = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs 2+ virtual devices"
)


def _ct(flat):
    p = np.asarray(flat, dtype=np.uint64).reshape(4, N)
    return p[:2].copy(), p[2:].copy()


@pytest.mark.slow
@requires_tv
@requires_2dev
def test_rotate_sharded_bit_exact_golden():
    case = "case0_4_4"
    a, b = _ct(load_tv(case, "kernel1_ct_before_rotate"))
    ksk = load_tv(case, "ksk_step2").reshape(12, N)
    want = load_tv(case, "kernel1_ct_after_rotate").reshape(4, N)

    mesh = Mesh(np.array(jax.devices()[:2]), axis_names=("digit",))
    sh = NamedSharding(mesh, P("digit", None))
    a_d = jax.device_put(a, sh)
    b_d = jax.device_put(b, sh)
    out_a, out_b = rotate_sharded((a_d, b_d), 2, ksk, mesh, CFG)
    assert (np.asarray(out_a) == want[:2]).all()
    assert (np.asarray(out_b) == want[2:]).all()


@pytest.mark.slow
@requires_tv
@requires_2dev
def test_rotate_sharded_batched_dp():
    """dp x digit mesh: 2 ciphertexts x 2 limb shards."""
    case = "case0_4_4"
    a, b = _ct(load_tv(case, "kernel1_ct_before_rotate"))
    ksk = load_tv(case, "ksk_step2").reshape(12, N)
    want = load_tv(case, "kernel1_ct_after_rotate").reshape(4, N)

    mesh = Mesh(
        np.array(jax.devices()[:4]).reshape(2, 2), axis_names=("dp", "digit")
    )
    ab = np.stack([a, a])
    bb = np.stack([b, b])
    sh = NamedSharding(mesh, P("dp", "digit", None))
    out_a, out_b = rotate_sharded(
        (jax.device_put(ab, sh), jax.device_put(bb, sh)), 2, ksk, mesh,
        CFG, dp_axis="dp",
    )
    for i in range(2):
        assert (np.asarray(out_a)[i] == want[:2]).all()
        assert (np.asarray(out_b)[i] == want[2:]).all()


@requires_2dev
def test_wrong_digit_axis_size():
    mesh = Mesh(np.array(jax.devices()[:1]), axis_names=("digit",))
    a = np.zeros((2, N), dtype=np.uint64)
    with pytest.raises(ValueError, match="digit axis"):
        rotate_sharded((a, a), 2, np.zeros((12, N), np.uint64), mesh, CFG)


@requires_tv
@requires_2dev
def test_rotate_sharded_composed_kernel_body(monkeypatch):
    """COMPOSED digit-psum keyswitch: the per-shard raised-digit NTT
    sweep runs the production multi-modulus streaming Pallas kernel
    (interpret mode on the CPU mesh) — bit-exact vs the same golden
    rotation the XLA-body test pins."""
    monkeypatch.setenv("ALOHA_STREAM_INTERPRET", "1")
    monkeypatch.setenv("ALOHA_STREAM_BP", "1")
    case = "case0_4_4"
    a, b = _ct(load_tv(case, "kernel1_ct_before_rotate"))
    ksk = load_tv(case, "ksk_step2").reshape(12, N)
    want = load_tv(case, "kernel1_ct_after_rotate").reshape(4, N)

    mesh = Mesh(np.array(jax.devices()[:2]), axis_names=("digit",))
    sh = NamedSharding(mesh, P("digit", None))
    out_a, out_b = rotate_sharded(
        (jax.device_put(a, sh), jax.device_put(b, sh)), 2, ksk, mesh, CFG
    )
    assert (np.asarray(out_a) == want[:2]).all()
    assert (np.asarray(out_b) == want[2:]).all()
