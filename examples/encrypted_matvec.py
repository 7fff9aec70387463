#!/usr/bin/env python
"""End-to-end encrypted matrix-vector product (runs on CPU in seconds).

The classic CKKS serving workload: a bank of wrapped diagonals applied
to an encrypted vector by the diagonal method, with baby-step/giant-step
and HOISTED baby rotations (one key-switch head shared across steps).

    JAX_PLATFORMS=cpu python examples/encrypted_matvec.py

Pipeline: encode -> encrypt -> matvec_bsgs (hoisted rotations + free
plaintext diagonal rotation) -> rescale -> decrypt -> decode, checked
against the cleartext product.  The same calls run on TPU via the
he_planes surface (fused Pallas keyswitch kernels + 4-step MXU NTT).
"""
import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

from aloha_tpu import encoder, he_np as he, keys
from aloha_tpu.config import DEFAULT_CONFIG as CFG

rng = np.random.default_rng(7)
S = CFG.n // 2  # 4096 complex slots

# -- keys
sk = keys.gen_secret(CFG)
D, G = 4, 2  # diagonals, baby-step count (g*b >= D)
ksks_baby = [keys.gen_rotation_key(sk, j, CFG) for j in range(1, G)]
ksks_giant = [
    keys.gen_rotation_key(sk, G * i, CFG)
    for i in range(1, (D + G - 1) // G)
]

# -- encrypt the vector
z = rng.uniform(-1, 1, size=S) + 1j * rng.uniform(-1, 1, size=S)
pt = encoder.encode(encoder.cleartext_from_slots(z), CFG)
q0 = CFG.moduli[0]
signed = np.where(
    pt[0] > q0 // 2,
    pt[0].astype(np.int64) - np.int64(q0),
    pt[0].astype(np.int64),
)
ct = keys.encrypt(signed, sk, CFG)

# -- encode the matrix diagonals (public data)
dvecs = [rng.uniform(-1, 1, size=S) for _ in range(D)]
diags = [
    he.encode_post(
        encoder.encode(encoder.cleartext_from_slots(d + 0j), CFG), CFG
    )
    for d in dvecs
]

# -- encrypted matvec: g-1 hoisted + b-1 plain rotations (vs D-1 plain)
out = he.matvec_bsgs(ct, diags, ksks_baby, ksks_giant, CFG, g=G)
out = he.rescale(out, CFG)

# -- decrypt + decode at the post-rescale scale Delta^2/q1
m = keys.decrypt(out, sk, CFG)
res = np.where(m < 0, m + np.int64(q0), m).astype(np.uint64)
got = encoder.decode(res[None, :], CFG, limb=0) * (
    CFG.moduli[1] / encoder.DELTA
)

want = sum(np.asarray(d) * np.roll(z, -k) for k, d in enumerate(dvecs))
err = np.abs(got - want).max()
print(f"slots checked: {S}; max |error| = {err:.3f} "
      f"(rescale-path envelope at this parameterization is ~0.15)")
assert err < 0.15
print("encrypted matvec OK")
