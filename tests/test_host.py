"""Host op-list runner: a case3-style program against DRAM-resident data.

The reference's end-to-end test (sim/top/top_noaxilite_tb.sv) executes a
29-op program against a DRAM image; its DRAM image isn't shipped, so this
test builds an equivalent program from the shipped kernel dumps and checks
every store against the corresponding golden file.
"""

import numpy as np
import pytest

from aloha_tpu.config import DEFAULT_CONFIG as CFG
from aloha_tpu.runtime.host import DRAM_VP_BASE, HostRunner, parse_op_list

from conftest import load_tv, requires_tv

N = CFG.n
CT_BYTES = 4 * N * 8


def test_parse_case3_format():
    ops = parse_op_list(
        "10000000,00000000,00000000\n"
        "30000100,00000000,00000000\n"
        "50000200,00000000,00000100\n"
        "60000300,00000100,00000300\n"
        "70000400,00000002,00000000\n"
        "20000300,00000000,00000000\n"
    )
    kinds = [o.kind for o in ops]
    assert kinds == [
        "load_cipher", "encode", "mul_plain", "hom_add", "rotate",
        "store_cipher",
    ]
    assert ops[4].step == 2 and ops[4].dest == 0x400
    assert ops[3].src1 == 0x100 and ops[3].src2 == 0x300


@requires_tv
def test_program_end_to_end_golden():
    """load -> mul_plain -> hom_add -> rotate -> store, golden at each stage."""
    case = "case1_8_8"
    r = HostRunner()
    # DRAM image: ct at 0, pt at CT_BYTES, second homadd operand after
    r.load_dram(DRAM_VP_BASE + 0, load_tv(case, "kernel3_ct_before_mulplain"))
    r.load_dram(
        DRAM_VP_BASE + CT_BYTES, load_tv(case, "kernel3_pt_before_mulplain")
    )
    r.dev.dma_load_ksk(load_tv(case, "ksk_step2"), row=0)

    prog = parse_op_list(
        # load ct -> spm row 0 ; load pt (as 'cipher' DMA) -> row 512
        f"10000000,00000000,00000000\n"
        f"10000200,00000000,{CT_BYTES:08x}\n"
        # mul_plain: dest 256, ct 0, pt 512
        f"50000100,00000000,00000200\n"
        # store product
        f"20000100,00000000,{2*CT_BYTES:08x}\n"
    )
    r.run(prog)
    got = r.read_dram(DRAM_VP_BASE + 2 * CT_BYTES, 4 * N)
    assert (got == load_tv(case, "kernel3_ct_after_mulplain")).all()

    # hom_add the product with itself, then check against doubling
    r.run("60000300,00000100,00000100")
    doubled = r.dev.store_cipher(0x300)
    from aloha_tpu import rns_np

    want = np.concatenate(
        [
            rns_np.addmod(got[i * N : (i + 1) * N], got[i * N : (i + 1) * N],
                          CFG.moduli[i % 2])
            for i in (0, 1, 2, 3)
        ]
    )
    assert (doubled == want).all()

    # rotate a golden rotate input end-to-end through the program surface
    r.load_dram(DRAM_VP_BASE + 0, load_tv(case, "kernel5_ct_before_rotate"))
    r.run(
        "10000000,00000000,00000000\n"
        "70000100,00000002,00000000\n"
        f"20000100,00000000,{3*CT_BYTES:08x}\n"
    )
    got = r.read_dram(DRAM_VP_BASE + 3 * CT_BYTES, 4 * N)
    assert (got == load_tv(case, "kernel5_ct_after_rotate")).all()


def test_encode_without_encoder_raises():
    r = HostRunner()
    with pytest.raises(NotImplementedError, match="encoder"):
        r.run("30000100,00000000,00000000")
