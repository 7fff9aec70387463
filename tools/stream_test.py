"""Verify the streaming NTT kernel on hardware vs the NumPy golden model,
then measure throughput with the chained+readback protocol."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys, time
import numpy as np
import jax
import jax.numpy as jnp

from aloha_tpu import ntt_np
from aloha_tpu.config import DEFAULT_CONFIG as CFG
from aloha_tpu.ops import ntt_stream

NB = int(sys.argv[1]) if len(sys.argv) > 1 else 64
q, psi, ipsi = CFG.moduli[0], CFG.psi[0], CFG.ipsi[0]
n = CFG.n
rng = np.random.default_rng(0)
a = rng.integers(0, q, size=(NB, n), dtype=np.uint64)

t0 = time.perf_counter()
out = np.asarray(ntt_stream.ntt(jnp.asarray(a), q, psi))
print(f"forward compile+run: {time.perf_counter()-t0:.0f}s", flush=True)
ref = np.stack([ntt_np.ntt(a[i], q, psi) for i in range(min(NB, 8))])
ok_f = np.array_equal(out[:ref.shape[0]], ref)
print("forward bit-exact vs ntt_np:", ok_f, flush=True)

t0 = time.perf_counter()
back = np.asarray(ntt_stream.intt(jnp.asarray(out), q, ipsi))
print(f"inverse compile+run: {time.perf_counter()-t0:.0f}s", flush=True)
ok_i = np.array_equal(back, a)
print("roundtrip bit-exact:", ok_i, flush=True)

if not (ok_f and ok_i):
    sys.exit(1)

# throughput: chain K launches, then read back one element
alo = jnp.asarray((a & 0xFFFFFFFF).astype(np.uint32).reshape(NB, n // 128, 128))
ahi = jnp.asarray((a >> np.uint64(32)).astype(np.uint32).reshape(NB, n // 128, 128))

def chain(alo, ahi, k):
    for _ in range(k):
        alo, ahi = ntt_stream.ntt_planes(alo, ahi, q, psi)
    return alo, ahi

for K in (1, 8):
    f = jax.jit(lambda al, ah: chain(al, ah, K))
    r = f(alo, ahi)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    iters = 3
    for _ in range(iters):
        r = f(alo, ahi)
        _ = np.asarray(r[0][0, 0, 0])
    dt = (time.perf_counter() - t0) / iters
    rate = NB * K / dt
    print(f"chain K={K}: {dt*1e3:.1f} ms -> {rate:,.0f} NTT/s  ({dt/NB/K*1e6:.2f} us/poly)", flush=True)
