"""Trace-database + co-simulation tests (the reference's tdb replay tier)."""

import numpy as np
import pytest

from aloha_tpu import native, trace_db
from aloha_tpu.config import DEFAULT_CONFIG as CFG, NUM_LANES
from aloha_tpu.isa import programs
from aloha_tpu.isa.interp import LaunchArgs, VectorProcessor

N = CFG.n
POLY_ROWS = N // NUM_LANES
RNG = np.random.default_rng(17)


def _spm():
    spm = np.zeros((1024, NUM_LANES), dtype=np.uint64)
    for limb in range(2):
        q = CFG.moduli[limb]
        for part in range(2):
            row = (part * 2 + limb) * POLY_ROWS
            spm[row : row + POLY_ROWS] = RNG.integers(
                0, q, size=(POLY_ROWS, NUM_LANES), dtype=np.uint64
            )
    return spm


def test_record_write_read_roundtrip(tmp_path):
    vp = VectorProcessor(CFG)
    rows = trace_db.record(
        vp, programs.mul_plain(CFG), _spm(), None, LaunchArgs(rslt=512)
    )
    assert len(rows) > 0
    path = tmp_path / "mul_plain.tdb"
    trace_db.write(path, rows, N)
    back = trace_db.read(path)
    assert len(back) == len(rows)
    for a, b in zip(rows, back):
        assert a.pc == b.pc and a.instr == b.instr
        assert (a.result == b.result).all()


def test_python_and_native_readers_agree(tmp_path):
    if not native.available():
        pytest.skip("no C++ toolchain")
    vp = VectorProcessor(CFG)
    rows = trace_db.record(
        vp, programs.hom_add(CFG), _spm(), None, LaunchArgs(rslt=512)
    )
    path = tmp_path / "t.tdb"
    trace_db.write(path, rows, N)
    a = trace_db._read_python(path)
    b = trace_db._read_native(native.load(), path)
    for x, y in zip(a, b):
        assert x.pc == y.pc and x.instr == y.instr
        assert (x.result == y.result).all()


def test_cosim_jax_backend_vs_oracle_trace(tmp_path):
    """The JAX backend replays instruction-for-instruction bit-identically
    against the NumPy oracle's recorded trace (the vp_top_tb role)."""
    from aloha_tpu.jax_backend import JaxBackend

    spm = _spm()
    args = LaunchArgs(rslt=512)
    prog = programs.mul_plain(CFG)
    rows = trace_db.record(VectorProcessor(CFG), prog, spm.copy(), None, args)
    be = JaxBackend()
    mismatches = trace_db.verify(
        VectorProcessor(CFG, be), prog, be.wrap(spm),
        be.wrap(np.zeros((1, NUM_LANES), np.uint64)), args, rows,
    )
    assert mismatches == []


def test_cosim_detects_divergence():
    """A corrupted reference trace is reported per-instruction."""
    spm = _spm()
    args = LaunchArgs(rslt=512)
    prog = programs.hom_add(CFG)
    rows = trace_db.record(VectorProcessor(CFG), prog, spm.copy(), None, args)
    rows[3].result[5] ^= np.uint64(1)
    bad = trace_db.verify(
        VectorProcessor(CFG), prog, spm.copy(), None, args, rows
    )
    assert len(bad) == 1 and bad[0][2] == 1


def test_native_text_io_roundtrip(tmp_path):
    vals = RNG.integers(0, 1 << 63, size=10000, dtype=np.uint64)
    p = tmp_path / "vals.txt"
    native.write_u64_file(p, vals)
    back = native.parse_u64_file(p)
    assert (back == vals).all()


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_native_parser_matches_numpy_on_golden(tmp_path):
    from conftest import TV_ROOT

    f = TV_ROOT / "case0_4_4" / "kernel1_ct_before_rotate.txt"
    if not f.exists():
        pytest.skip("no tv data")
    a = native.parse_u64_file(f)
    b = np.loadtxt(f, dtype=np.uint64)
    assert (a == b).all()
