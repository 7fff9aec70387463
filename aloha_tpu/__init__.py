"""ALOHA-TPU: a TPU-native leveled-FHE (RNS-CKKS) primitive framework.

A from-scratch re-design of the capabilities of the ALOHA FPGA accelerator
(an RNS-CKKS leveled-HE engine: negacyclic NTT/INTT, Barrett modular SIMD
arithmetic, automorphism/rotation with hybrid key-switching, a CKKS encoder
pipeline, an HE vector ISA and a host runtime) for TPUs:

* the 128-lane modular SIMD datapath   -> vectorized JAX / Pallas kernels
* the Omega lane-interconnect          -> in-register lane permutations and,
                                          across chips, ICI collectives
* the HE RISC-V instruction programs   -> traced/jitted JAX op sequences
* the SPM / KSK memories + DMA + CSRs  -> a device-buffer runtime with the
                                          same segment/pointer launch API
* RNS limbs / coefficient / batch dims -> shardable mesh axes (pjit/shard_map)

Layers (bottom-up): `rns_*` modular arithmetic -> `ntt_*` transforms ->
`he_*` / `ops/` ciphertext kernels -> `isa/` assembler + replayer ->
`runtime/` device + host API -> `parallel/` multi-chip sharding.
"""

__version__ = "0.1.0"

from aloha_tpu.config import DEFAULT_CONFIG, HEConfig  # noqa: F401
