"""Multi-chip parallelism: mesh axes, sharded transforms, collectives.

The reference is a single-chip design whose parallel dimensions are the 128
SIMD lanes, the even/odd butterfly pairing, and the Omega all-to-all lane
interconnect (SURVEY.md 2g; reference: src/vp/iconn/).  On TPU those map to:

  lane dim        -> vector lanes inside a chip (free)
  iconn exchange  -> `ppermute` / `all_to_all` over the ICI mesh when
                     coefficients shard across chips
  RNS limb dim    -> a mesh axis; key-switch inner products reduce via psum
  ciphertext batch-> pure data parallelism (dp axis)
"""
