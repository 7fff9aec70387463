"""Trace database: record and replay-verify per-instruction engine results.

This is the framework's co-simulation tier — the role the reference fills
with its golden C-model traces (`issue.tdb`/`exe.tdb`) replayed against the
RTL (reference: sim/vp/top/vp_top_tb.sv, tdb_reader.cpp): one engine
produces a trace, another implementation replays the same program and every
instruction's result is diffed.  Here the NumPy oracle records, and the JAX
(or any future) backend verifies — instruction-granular instead of the
RTL's beat-granular, which is the natural unit on TPU (one fused op per
instruction).

Binary format (see native/aloha_native.cpp for the exact layout); the
native C++ reader gives row-random access, with a pure-Python fallback.

Row = one traced instruction: [pc, instr_hi, instr_lo, result[0..n-1]].
"""

from __future__ import annotations

import ctypes
import dataclasses
import struct
from typing import List, Optional

import numpy as np

from aloha_tpu import native
from aloha_tpu.isa.encoding import Instr

_MAGIC = 0x42445441  # "ATDB"
_VERSION = 1


@dataclasses.dataclass
class TraceRow:
    pc: int
    instr: Instr
    result: np.ndarray  # (n,) uint64 destination value (vreg or store data)


def write(path, rows: List[TraceRow], n: int) -> None:
    """Write a trace database (pure Python; format shared with the C++ reader)."""
    fields = [("pc", 0, 1), ("instr", 1, 2), ("result", 3, n)]
    names = b"".join(f[0].encode() for f in fields)
    row_words = 3 + n
    with open(path, "wb") as f:
        f.write(struct.pack("<IIII", _MAGIC, _VERSION, len(fields), len(names)))
        f.write(struct.pack("<QQ", len(rows), row_words))
        off = 0
        for name, woff, wlen in fields:
            f.write(struct.pack("<IIII", off, len(name), woff, wlen))
            off += len(name)
        f.write(names)
        buf = np.empty((len(rows), row_words), dtype="<u8")
        for i, r in enumerate(rows):
            enc = r.instr.encode()
            buf[i, 0] = r.pc
            buf[i, 1] = enc >> 64
            buf[i, 2] = enc & ((1 << 64) - 1)
            buf[i, 3:] = r.result
        f.write(buf.tobytes())


def read(path) -> List[TraceRow]:
    """Read a trace database (native reader when built, Python otherwise)."""
    lib = native.load()
    if lib is not None:
        return _read_native(lib, path)
    return _read_python(path)


def _read_python(path) -> List[TraceRow]:
    with open(path, "rb") as f:
        magic, _ver, n_fields, name_bytes = struct.unpack("<IIII", f.read(16))
        if magic != _MAGIC:
            raise ValueError(f"{path}: not a trace database")
        n_rows, row_words = struct.unpack("<QQ", f.read(16))
        f.read(16 * n_fields + name_bytes)
        data = np.frombuffer(f.read(n_rows * row_words * 8), dtype="<u8")
    return _rows_from(data.reshape(n_rows, row_words))


def _read_native(lib, path) -> List[TraceRow]:
    h = lib.aloha_tdb_open(str(path).encode())
    if not h:
        raise ValueError(f"{path}: not a trace database")
    try:
        n_rows = lib.aloha_tdb_rows(h)
        row_words = lib.aloha_tdb_row_words(h)
        out = np.empty((n_rows, row_words), dtype=np.uint64)
        got = lib.aloha_tdb_read(
            h, 0, n_rows, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))
        )
        assert got == n_rows, (got, n_rows)
    finally:
        lib.aloha_tdb_close(h)
    return _rows_from(out)


def _rows_from(mat: np.ndarray) -> List[TraceRow]:
    rows = []
    for r in mat:
        enc = (int(r[1]) << 64) | int(r[2])
        rows.append(
            TraceRow(pc=int(r[0]), instr=Instr.decode(enc), result=r[3:].copy())
        )
    return rows


# ----------------------------------------------------------- co-simulation
def record(vp, program, spm, ksk_mem=None, args=None) -> List[TraceRow]:
    """Replay `program` on `vp` (oracle backend) recording every result."""
    sink: list = []
    vp.run(program, spm, ksk_mem, args, trace=sink)
    # copy: the replayer may hand out views of live register arrays
    return [
        TraceRow(pc=pc, instr=i, result=np.array(v, dtype=np.uint64))
        for pc, i, v in sink
    ]


def verify(vp, program, spm, ksk_mem, args, rows: List[TraceRow]):
    """Replay on another backend and diff every instruction against `rows`.

    Returns a list of (pc, mnemonic, n_mismatches); empty == bit-exact.
    """
    sink: list = []
    vp.run(program, spm, ksk_mem, args, trace=sink)
    if len(sink) != len(rows):
        raise ValueError(
            f"trace length mismatch: {len(sink)} vs {len(rows)} rows"
        )
    bad = []
    for (pc, instr, val), ref in zip(sink, rows):
        if instr.encode() != ref.instr.encode():
            bad.append((pc, instr.disasm(), -1))
            continue
        n_mis = int((np.asarray(val) != ref.result).sum())
        if n_mis:
            bad.append((pc, instr.disasm(), n_mis))
    return bad
