"""Sharded-transform tests on a virtual 8-device CPU mesh.

The conftest forces JAX_PLATFORMS=cpu with 8 virtual devices, mirroring how
the reference validates its engine without hardware (software-oracle
simulation, reference: sim/vp/top/vp_top_tb.sv).
"""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from aloha_tpu import ntt_np
from aloha_tpu.config import DEFAULT_CONFIG as CFG, HEConfig
from aloha_tpu.parallel import ntt_sharded as sh

RNG = np.random.default_rng(11)

requires_8dev = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def small_cfg(n):
    k = CFG.n // n
    return HEConfig(
        n=n,
        moduli=CFG.moduli,
        psi=tuple(pow(p, k, q) for p, q in zip(CFG.psi, CFG.moduli)),
        ipsi=tuple(pow(ip, k, q) for ip, q in zip(CFG.ipsi, CFG.moduli)),
    )


@requires_8dev
@pytest.mark.parametrize("n", [512, 8192])
def test_ntt_sharded_matches_golden(n):
    cfg = small_cfg(n) if n != CFG.n else CFG
    q, psi, ipsi = cfg.moduli[0], cfg.psi[0], cfg.ipsi[0]
    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("coeff",))
    a = RNG.integers(0, q, size=n, dtype=np.uint64)
    a_d = jax.device_put(a, NamedSharding(mesh, P("coeff")))
    out = sh.ntt_sharded(a_d, q, psi, mesh)
    assert (np.asarray(out) == ntt_np.ntt(a, q, psi)).all()
    back = sh.intt_sharded(out, q, ipsi, mesh)
    assert (np.asarray(back) == a).all()


@requires_8dev
def test_ntt_sharded_batched_2d_mesh():
    """dp x coeff mesh: batch over dp, coefficients over coeff."""
    n = 512
    cfg = small_cfg(n)
    q, psi = cfg.moduli[0], cfg.psi[0]
    mesh = Mesh(
        np.array(jax.devices()[:8]).reshape(2, 4), axis_names=("dp", "coeff")
    )
    a = RNG.integers(0, q, size=(4, n), dtype=np.uint64)
    a_d = jax.device_put(a, NamedSharding(mesh, P("dp", "coeff")))
    out = sh.ntt_sharded(a_d, q, psi, mesh)
    assert (np.asarray(out) == ntt_np.ntt(a, q, psi)).all()


@requires_8dev
def test_collective_count():
    """The sharded NTT must use exactly log2(D) ppermutes (one block
    exchange per cross-shard stage) — the bandwidth-optimal schedule."""
    n = 512
    cfg = small_cfg(n)
    q, psi = cfg.moduli[0], cfg.psi[0]
    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("coeff",))
    a = RNG.integers(0, q, size=n, dtype=np.uint64)
    a_d = jax.device_put(a, NamedSharding(mesh, P("coeff")))
    import jax.numpy as jnp

    from aloha_tpu import ntt_jax

    table = jnp.asarray(ntt_jax._tables(n, psi, q, inverse=False))
    lowered = jax.jit(
        jax.shard_map(
            lambda tbl, x: sh._ntt_local(tbl, x, q, 8, "coeff"),
            mesh=mesh,
            in_specs=(P(None, "coeff"), P("coeff")),
            out_specs=P("coeff"),
        )
    ).lower(table, a_d)
    text = lowered.as_text()
    assert text.count("collective-permute") <= 3 + 1  # 3 exchanges (+1 slack)
