"""ISA layer tests: encoding round-trips, byte-identical program images,
and bit-exact replay of the reference instruction images.

This layer mirrors the reference's decode-golden and trace-replay tiers
(reference: sim/vp/sequncer/seq_top_tb.sv golden diffs;
sim/vp/top/vp_top_tb.sv trace-replay co-simulation).
"""

import numpy as np
import pytest

from aloha_tpu.config import DEFAULT_CONFIG as CFG
from aloha_tpu.config import NUM_LANES
from aloha_tpu.isa import programs
from aloha_tpu.isa.encoding import Funct6, Instr, load_program
from aloha_tpu.isa.interp import LaunchArgs, VectorProcessor
from aloha_tpu.runtime.device import AlohaDevice

from conftest import REF_ROOT, load_tv, requires_tv

N = CFG.n
POLY_ROWS = N // NUM_LANES
RNG = np.random.default_rng(42)

REF_PROGS = REF_ROOT / "sim" / "vp" / "isram_file_generator"
requires_ref_progs = pytest.mark.skipif(
    not REF_PROGS.is_dir(), reason="reference program images not available"
)


def ref_program(name):
    with open(REF_PROGS / f"{name}.mem") as f:
        return load_program(f)


# --------------------------------------------------------------- encoding
def test_encode_decode_roundtrip():
    for prog in (
        programs.encode_post(CFG),
        programs.mul_plain(CFG),
        programs.hom_add(CFG),
        programs.keyswitch(CFG),
    ):
        for instr in prog:
            assert Instr.decode(instr.hex()) == instr


def test_vv_bank_constraint_enforced():
    a = programs.Asm()
    with pytest.raises(ValueError, match="bank"):
        a.vfqadd(2, 0, 2)  # both even


@requires_ref_progs
@pytest.mark.parametrize("name", ["encode_post", "mul_plain", "hom_add"])
def test_program_images_byte_identical(name):
    """Our generators reproduce the reference .mem images exactly."""
    ours = getattr(programs, name)(CFG)
    theirs = ref_program(name)
    assert [i.hex() for i in ours] == [i.hex() for i in theirs]


@requires_ref_progs
def test_keyswitch_image_same_instruction_multiset():
    """Our keyswitch is a re-derivation (different schedule/registers) but
    must use the same operation mix as the reference's 122-instruction
    kernel: 12 NTTs, 6 INTTs, 4 automorphisms, 12 KSK loads..."""
    ours = programs.keyswitch(CFG)
    theirs = ref_program("keyswitch")

    def mix(prog):
        out = {}
        for i in prog:
            out[i.funct6] = out.get(i.funct6, 0) + 1
        return out

    ours_mix, theirs_mix = mix(ours), mix(theirs)
    for f6 in (Funct6.VNTT, Funct6.VINTT, Funct6.VAUT, Funct6.VSE):
        assert ours_mix[f6] == theirs_mix[f6], f6


# ----------------------------------------------------------------- replay
def _random_ct_spm():
    """SPM with a random 4-poly ciphertext at row 0."""
    spm = np.zeros((1024, NUM_LANES), dtype=np.uint64)
    for limb in range(2):
        q = CFG.moduli[limb]
        for part in range(2):
            row = (part * 2 + limb) * POLY_ROWS
            spm[row : row + POLY_ROWS] = RNG.integers(
                0, q, size=(POLY_ROWS, NUM_LANES), dtype=np.uint64
            )
    return spm


@requires_ref_progs
@pytest.mark.parametrize("name", ["encode_post", "mul_plain", "hom_add"])
def test_replay_matches_reference_image(name):
    """Replaying our program == replaying the reference image, any input."""
    vp = VectorProcessor(CFG)
    spm = _random_ct_spm()
    args = LaunchArgs(src0=0, src1=0, rslt=512)
    got = vp.run(getattr(programs, name)(CFG), spm.copy(), None, args)
    want = vp.run(ref_program(name), spm.copy(), None, args)
    assert (got == want).all()


@requires_tv
def test_keyswitch_replay_matches_reference_image():
    """Both keyswitch images produce identical SPM results on tv/ data."""
    vp = VectorProcessor(CFG)
    ct = load_tv("case0_4_4", "kernel1_ct_before_rotate")
    ksk = load_tv("case0_4_4", "ksk_step2")
    spm = np.zeros((1024, NUM_LANES), dtype=np.uint64)
    spm[: 4 * POLY_ROWS] = ct.reshape(-1, NUM_LANES)
    ksk_mem = ksk.reshape(-1, NUM_LANES)
    args = LaunchArgs(src0=0, src1=0, rslt=512, step=pow(3, 2, 2 * N))
    got = vp.run(programs.keyswitch(CFG), spm.copy(), ksk_mem, args)
    want = vp.run(ref_program("keyswitch"), spm.copy(), ksk_mem, args)
    assert (got == want).all()
    # and both match the golden output
    gold = load_tv("case0_4_4", "kernel1_ct_after_rotate")
    assert (got[512 : 512 + 4 * POLY_ROWS].reshape(-1) == gold).all()


# ---------------------------------------------------------------- device
@requires_tv
def test_device_rotate_golden():
    dev = AlohaDevice(CFG)
    dev.dma_load_ksk(load_tv("case0_4_4", "ksk_step2"), row=0)
    dev.load_cipher(0, load_tv("case0_4_4", "kernel1_ct_before_rotate"))
    dev.run_rotate(dest=256, src=0, step=2)
    gold = load_tv("case0_4_4", "kernel1_ct_after_rotate")
    assert (dev.store_cipher(256) == gold).all()


@requires_tv
def test_device_pipeline_golden():
    """Chained ops through the device API: encode_post -> mul_plain -> hom_add,
    each checked against its golden dump (case1 kernels 1, 3, 9)."""
    dev = AlohaDevice(CFG)
    # encode_post on kernel1
    pre = load_tv("case1_8_8", "kernel1_pt_after_encode_fft_mod")
    dev.dma_write_spm(0, pre)
    dev.run_encode_post(dest=128, src=0)
    want = load_tv("case1_8_8", "kernel1_pt_after_encode")
    assert (dev.store_poly(128, 2) == want).all()

    # mul_plain on kernel3
    dev.load_cipher(0, load_tv("case1_8_8", "kernel3_ct_before_mulplain"))
    dev.dma_write_spm(512, load_tv("case1_8_8", "kernel3_pt_before_mulplain"))
    dev.run_mul_plain(dest=640, src_ct=0, src_pt=512)
    want = load_tv("case1_8_8", "kernel3_ct_after_mulplain")
    assert (dev.store_cipher(640) == want).all()

    # hom_add on kernel9
    dev.load_cipher(0, load_tv("case1_8_8", "kernel9_ct_before_homaddct1"))
    dev.load_cipher(256, load_tv("case1_8_8", "kernel9_ct_before_homaddct2"))
    dev.run_hom_add(dest=640, src1=0, src2=256)
    want = load_tv("case1_8_8", "kernel9_ct_after_homadd")
    assert (dev.store_cipher(640) == want).all()


@requires_tv
def test_device_multi_step_ksk():
    """KSK slot addressing: load steps 2 and 4 like the reference testbench
    (3 steps x 12 polys at consecutive slots) and rotate with each."""
    case = "case1_8_8"
    dev = AlohaDevice(CFG)
    dev.dma_load_ksk(load_tv(case, "ksk_step2"), row=0)
    dev.dma_load_ksk(load_tv(case, "ksk_step4"), row=12 * POLY_ROWS)
    for kernel in ["5", "12"]:
        ct = load_tv(case, f"kernel{kernel}_ct_before_rotate")
        gold = load_tv(case, f"kernel{kernel}_ct_after_rotate")
        dev.load_cipher(0, ct)
        hits = []
        for step in (2, 4):
            dev.run_rotate(dest=256, src=0, step=step)
            if (dev.store_cipher(256) == gold).all():
                hits.append(step)
        assert len(hits) == 1, f"kernel{kernel}: steps matched {hits}"
