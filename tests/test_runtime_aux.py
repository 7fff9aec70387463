"""Auxiliary runtime subsystems: checkpoint/resume, status, profiling,
and full-ISA instruction coverage (vroli/vcpy/vfqmod/vfqsub.sv/vaut-imm)."""

import numpy as np
import pytest

from aloha_tpu import profiling, rns_np
from aloha_tpu.config import DEFAULT_CONFIG as CFG, NUM_LANES
from aloha_tpu.isa.interp import LaunchArgs, VectorProcessor
from aloha_tpu.isa.programs import Asm, SEG_RSLT, SEG_SRC0
from aloha_tpu.runtime.device import VERSION, AlohaDevice

N = CFG.n
POLY_ROWS = N // NUM_LANES
RNG = np.random.default_rng(23)


def test_checkpoint_resume(tmp_path):
    dev = AlohaDevice(CFG)
    poly = RNG.integers(0, CFG.moduli[0], size=N, dtype=np.uint64)
    dev.load_poly(7, poly)
    p = tmp_path / "ckpt.npz"
    dev.save_state(p)

    dev2 = AlohaDevice(CFG)
    dev2.load_state(p)
    assert (dev2.store_poly(7) == poly).all()
    # resumed device is fully operational
    dev2.run_encode_post(dest=100, src=7)  # treats poly as limb0+garbage limb1
    assert dev2.status()["vp_done"]


def test_checkpoint_version_mismatch(tmp_path):
    dev = AlohaDevice(CFG)
    p = tmp_path / "ckpt.npz"
    dev.save_state(p)
    import zipfile

    # forge a wrong version by rewriting the array
    data = np.load(p)
    np.savez(p, spm=data["spm"], ksk_mem=data["ksk_mem"],
             version=np.uint64(0xDEAD))
    with pytest.raises(ValueError, match="version"):
        AlohaDevice(CFG).load_state(p)


def test_status_surface():
    s = AlohaDevice(CFG).status()
    assert s["version"] == VERSION and s["spm_rows"] == 16384


def test_profiler_records_launches():
    prof = profiling.Profiler()
    dev = profiling.profile_device(AlohaDevice(CFG), prof)
    dev.run_hom_add(dest=512, src1=0, src2=0)
    dev.run_hom_add(dest=512, src1=0, src2=0)
    summary = prof.summary()
    (name,) = summary
    assert summary[name]["count"] == 2 and summary[name]["total_s"] > 0


def test_remaining_isa_instructions():
    """vroli / vcpy / vfqmod / vfqsub.sv / vaut-with-imm through the
    assembler + replayer, against direct golden ops (these instructions are
    decodable by the reference but unused by its four canned programs)."""
    q0, q1 = CFG.moduli[0], CFG.moduli[1]
    a = Asm()
    a.vsetvl(N * 64)
    a.set_modulus(CFG, 1)
    a.vle(0, SEG_SRC0, 0)
    a.vroli(2, 0, 5)             # cyclic rotate by 5
    a.vse(2, SEG_RSLT, 0)
    a.set_modulus(CFG, 0)
    a.vfqmod(4, 0)               # reduce q1-residues into q0
    a.vse(4, SEG_RSLT, 0x10000)
    a.vfqsub_sv(6, 4, 12345)     # 12345 - x mod q0
    a.vse(6, SEG_RSLT, 0x20000)
    a.vcpy(8, 6)
    a.vaut(8, 8, 3)              # aut with immediate step (csr step = 0)
    a.vse(8, SEG_RSLT, 0x30000)
    a.vbreak()

    x = RNG.integers(0, q1, size=N, dtype=np.uint64)
    spm = np.zeros((512, NUM_LANES), dtype=np.uint64)
    spm[:POLY_ROWS] = x.reshape(-1, NUM_LANES)
    out = VectorProcessor(CFG).run(a.prog, spm, None, LaunchArgs(rslt=256))

    got = lambda k: out[256 + k * POLY_ROWS : 256 + (k + 1) * POLY_ROWS].reshape(-1)
    assert (got(0) == np.roll(x, -5)).all()
    red = rns_np.modred(x, q0)
    assert (got(1) == red).all()
    sub = rns_np.submod(np.uint64(12345), red, q0)
    assert (got(2) == sub).all()
    from aloha_tpu import ntt_np

    assert (got(3) == ntt_np.automorphism(rns_np.lazy_reduce(sub, q0), 3, q0)).all()
