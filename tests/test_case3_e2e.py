"""End-to-end replay of the reference's case3 system test.

The reference's Vivado E2E simulation runs the 29-op program
`vivado_prj/.../model_run/case3.txt` against a DDR image and diffs the
final store against `case3_expected_result.txt` (32768 words, reference:
sim/top/top_noaxilite_tb.sv:663-683, "TEST PASSED!").

The DDR image is not shipped, but case3 is exactly the case2_16_16
program (its expected result is word-identical to
tv/case2_16_16/rtl_result/inst_28_out.txt), so the image is
reconstructible: the input ciphertext and KSK images from the tv files,
and the encoder inputs from the kernel cleartexts.  Encode steps inject
the RTL's own pre-NTT dumps (inst_<i>_0_out.txt) — the encoder itself is
pinned separately in tests/test_encoder_hw.py — making everything
downstream (all 29 ops incl. three chained rotations with two KSK steps)
word-exact against the silicon-accurate expected result.
"""
import os

import numpy as np
import pytest

from aloha_tpu.config import DEFAULT_CONFIG as CFG
from aloha_tpu.runtime.host import DRAM_VP_BASE, HostRunner, parse_op_list

REF = "/root/reference"
TV2 = f"{REF}/tv/case2_16_16"
CASE3 = (
    f"{REF}/vivado_prj/top_noaxilite.srcs/sources_1/imports/sim/"
    "model_run/case3.txt"
)
EXPECTED = (
    f"{REF}/vivado_prj/top_noaxilite.srcs/sources_1/new/"
    "case3_expected_result.txt"
)

pytestmark = pytest.mark.skipif(
    not os.path.exists(CASE3), reason="reference vivado_prj not mounted"
)

#: case2 inst indices that are encode steps, in program order — their
#: rtl_result pre-NTT dumps are the encode results to inject.
ENCODE_INSTS = [1, 2, 6, 7, 13, 14, 20, 21]


def _load_dump_pre(inst):
    vals = []
    for line in open(f"{TV2}/rtl_result/inst_{inst}_0_out.txt"):
        s = line.strip()
        if s:
            vals.append(int(s) if s.isdigit() else 0)
    return np.array(vals, dtype=np.uint64).reshape(-1, CFG.n)[:2]


def test_case3_end_to_end():
    ops = parse_op_list(open(CASE3).read())
    assert len(ops) == 29

    injections = iter(ENCODE_INSTS)

    def encoder(cleartext):
        return _load_dump_pre(next(injections))

    runner = HostRunner(cfg=CFG, encoder=encoder)

    # DRAM image: input ciphertext at VP base 0 (the first op loads it)
    ct0 = np.loadtxt(f"{TV2}/kernel5_ct_before_rotate.txt", dtype=np.uint64)
    runner.load_dram(DRAM_VP_BASE + 0, ct0)
    # KSK image: slot 0 = step 2, slot 1 = step 4 (unused), slot 2 = step 8
    ksk_base = 32 * 2**20
    runner.load_dram(
        ksk_base, np.loadtxt(f"{TV2}/ksk_step2.txt", dtype=np.uint64)
    )
    runner.load_dram(
        ksk_base + 2 * 12 * CFG.n * 8,
        np.loadtxt(f"{TV2}/ksk_step8.txt", dtype=np.uint64),
    )
    runner.load_ksk_from_dram(ksk_base, n_steps=3)

    runner.run(ops)

    got = runner.read_dram(DRAM_VP_BASE + 0, 4 * CFG.n)
    want = np.loadtxt(EXPECTED, dtype=np.uint64)
    assert got.shape == want.shape == (32768,)
    assert np.array_equal(got, want), (
        f"{(got != want).sum()} of 32768 words differ"
    )
