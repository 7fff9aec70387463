"""Fit per-entry phase-factor corrections for the encoder's Xilinx FFT.

The xfft core's stored phase factors are round-to-nearest of
2^33 e^{2 pi i qn/L} on MOST entries (per-stage-pair ROMs, 1.33
format), but some carry small generator noise (docs/ENCODER.md).  The
corrections are identified from the 14 true RTL encode dumps by
coordinate descent on (mismatching words, total |err|); candidates no
data flows through are pruned via the raw-magnitude stats hook.

    python tools/encoder_fit.py [--levels 8,32,128,512,2048]
                                [--deltas 1,2] [--rounds 8]
                                [--out tools/encoder_fits.json]

Checkpoints after every improvement; seeds from --out when it exists.
The fitted table ships as encoder_hw.PHASE_FIX.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse
import glob
import json
import os
import time

import numpy as np

from aloha_tpu import encoder_hw as E
from aloha_tpu.config import DEFAULT_CONFIG as CFG

TV = "/root/reference/tv"

#: RTL encode dump -> cleartext kernel (determined by best-match search).
PAIRS = [
    ("case0_4_4", "2", "kernel2"),
    ("case0_4_4", "3", "kernel3"),
    ("case1_8_8", "1", "kernel1"),
    ("case1_8_8", "2", "kernel2"),
    ("case1_8_8", "6", "kernel6"),
    ("case1_8_8", "7", "kernel7"),
    ("case2_16_16", "1", "kernel1"),
    ("case2_16_16", "2", "kernel2"),
    ("case2_16_16", "6", "kernel6"),
    ("case2_16_16", "7", "kernel7"),
    ("case2_16_16", "13", "kernel13"),
    ("case2_16_16", "14", "kernel14"),
    ("case2_16_16", "20", "kernel20"),
    ("case2_16_16", "21", "kernel21"),
]


def _load_dump(path):
    vals = []
    for line in open(path):
        s = line.strip()
        if s:
            vals.append(int(s) if s.isdigit() else -1)
    return np.array(vals, dtype=np.int64)


def load_all():
    """-> channel inputs (D, 4, 2048) re/im, golden signed m (D, 2, 8192),
    valid masks (D, 2, 8192)."""
    xr, xi, gold, valid = [], [], [], []
    for case, inst, kern in PAIRS:
        clear = np.loadtxt(
            f"{TV}/{case}/{kern}_cleartext_before_encode_re_im.txt"
        )
        st1 = E.build_st1(*E.quantize_slots(clear), CFG.n)
        j = np.arange(1024)
        jr = np.arange(1023, -1, -1)
        cr = np.zeros((4, 2048), dtype=np.int64)
        ci = np.zeros((4, 2048), dtype=np.int64)
        for c in range(4):
            cr[c, :1024] = st1[0][4 * j + c]
            ci[c, :1024] = st1[1][4 * j + c]
            cr[c, 1024:] = st1[0][4 * jr + (3 - c)]
            ci[c, 1024:] = -st1[1][4 * jr + (3 - c)]
        xr.append(cr)
        xi.append(ci)
        dump = _load_dump(
            f"{TV}/{case}/rtl_result/inst_{inst}_0_out.txt"
        ).reshape(-1, CFG.n)
        g = np.zeros((2, CFG.n), dtype=np.int64)
        v = np.zeros((2, CFG.n), dtype=bool)
        for limb in range(2):
            q = CFG.moduli[limb]
            v[limb] = dump[limb] >= 0
            g[limb] = np.where(dump[limb] > q // 2, dump[limb] - q,
                               dump[limb])
        gold.append(g)
        valid.append(v)
    return (np.stack(xr), np.stack(xi), np.stack(gold), np.stack(valid))


class Evaluator:
    def __init__(self):
        self.xr, self.xi, self.gold, self.valid = load_all()
        self.T = E.get_combine_roms(CFG.n)

    def _m(self, fix: dict, raw_stats=None) -> np.ndarray:
        E.PHASE_FIX.clear()
        E.PHASE_FIX.update(fix)
        E._tw_tables.cache_clear()
        Fr, Fi = E.xfft2048(self.xr, self.xi, raw_stats)  # (D, 4, 2048)
        Fr = np.moveaxis(Fr, 1, 0)  # (4, D, 2048)
        Fi = np.moveaxis(Fi, 1, 0)
        D = Fr.shape[1]
        m = np.zeros((D, CFG.n), dtype=np.int64)
        for r in range(4):
            m[:, 2048 * r:2048 * (r + 1)] = E._trunc_prod_sum(
                Fr, Fi, self.T[:, r, None, :, 0], self.T[:, r, None, :, 1]
            )
        return m

    def per_dump(self, fix: dict) -> np.ndarray:
        m = self._m(fix)
        bad = (m[:, None, :] != self.gold) & self.valid
        return bad.sum(axis=(1, 2))

    def mismatches(self, fix: dict) -> int:
        m = self._m(fix)
        bad = 0
        for limb in range(2):
            bad += int(
                ((m != self.gold[:, limb]) & self.valid[:, limb]).sum()
            )
        return bad

    def objective(self, fix: dict) -> tuple:
        """(mismatching words, total |err|): the second key lets the
        descent cross plateaus where an entry shrinks errors without
        yet zeroing any word."""
        m = self._m(fix)
        bad = abserr = 0
        for limb in range(2):
            d = np.abs(m - self.gold[:, limb])
            v = self.valid[:, limb]
            bad += int(((d != 0) & v).sum())
            abserr += int(d[v].sum())
        return bad, abserr

    def live_entries(self) -> set:
        """(L, q, n) entries some nonzero data actually flows through —
        only these can affect any output."""
        stats: dict = {}
        self._m({}, raw_stats=stats)
        live = set()
        for (L, q), mag in stats.items():
            for n in np.nonzero(mag)[0]:
                live.add((L, q, int(n)))
        return live


def _save(fix: dict, path: str):
    clean = {k: v for k, v in sorted(fix.items()) if v != (0, 0)}
    with open(path, "w") as f:
        json.dump({str(k): list(v) for k, v in clean.items()}, f, indent=1)
    return clean


def load_fits(path: str) -> dict:
    with open(path) as f:
        return {
            tuple(int(x) for x in k.strip("()").split(",")): tuple(v)
            for k, v in json.load(f).items()
        }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="8,32,128,512,2048")
    ap.add_argument("--deltas", default="1,2")
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--out", default="tools/encoder_fits.json")
    ap.add_argument("--seed", default="", help="JSON of prior fits "
                    "(defaults to --out when it exists)")
    args = ap.parse_args()

    ev = Evaluator()
    fix = dict(E.PHASE_FIX)
    seed = args.seed or (args.out if os.path.exists(args.out) else "")
    if seed:
        fix.update(load_fits(seed))
        print(f"seeded {len(fix)} entries from {seed}", flush=True)
    base = ev.objective(fix)
    total = int(ev.valid.sum())
    print(f"baseline: {base[0]}/{total} mismatching "
          f"({100 * (1 - base[0] / total):.3f}% exact), |err| {base[1]}",
          flush=True)

    deltas = []
    for d in (int(v) for v in args.deltas.split(",")):
        deltas += [d, -d]
    live = ev.live_entries()
    levels = [int(v) for v in args.levels.split(",")]
    cands = [
        (L, q, n)
        for L in levels
        for q in (1, 2, 3)
        for n in range(1, L // 4)
        if (L, q, n) in live
    ]
    pruned = sum(3 * (L // 4 - 1) for L in levels) - len(cands)
    print(f"{len(cands)} candidate entries ({pruned} pruned as zero-flow), "
          f"deltas {deltas}", flush=True)
    t0 = time.time()
    for rnd in range(args.rounds):
        improved = False
        for key in cands:
            for comp in (0, 1):
                cur = fix.get(key, (0, 0))
                best_d, best_bad = 0, base
                for d in deltas:
                    trial = list(cur)
                    trial[comp] = cur[comp] + d
                    f2 = dict(fix)
                    f2[key] = tuple(trial)
                    bad = ev.objective(f2)
                    if bad < best_bad:
                        best_d, best_bad = d, bad
                if best_d:
                    cur = list(cur)
                    cur[comp] += best_d
                    fix[key] = tuple(cur)
                    base = best_bad
                    improved = True
                    _save(fix, args.out)
                    print(f"  [{time.time()-t0:6.0f}s] W_{key[0]}^"
                          f"{{{key[1]}*{key[2]}}}"
                          f"{'re' if comp == 0 else 'im'} += {best_d} -> "
                          f"{base[0]} bad / |err| {base[1]} "
                          f"({100*(1-base[0]/total):.3f}%)",
                          flush=True)
        clean = _save(fix, args.out)
        print(f"round {rnd}: {base[0]} bad / |err| {base[1]}, "
              f"{len(clean)} fixes; per-dump "
              f"{ev.per_dump(fix).tolist()}", flush=True)
        if not improved:
            break
    clean = _save(fix, args.out)
    print(f"final: {base[0]}/{total} ({100*(1-base[0]/total):.3f}% exact); "
          f"{len(clean)} entries -> {args.out}", flush=True)


if __name__ == "__main__":
    main()
