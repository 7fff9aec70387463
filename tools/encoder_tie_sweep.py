"""Exhaustive tie-break sweep for the encoder's Xilinx FFT emulation.

The one structural unknown left in the encoder emulation (docs/ENCODER.md,
docs/STATUS.md "one unresolved rounding-tie detail") is the xfft core's
behavior at EXACT .5 fractions.  encoder_hw ships convergent rounding
(tie-to-even) at both rounding sites:

  * the plain scale shifts (>> 2 per stage pair, >> 1 at the final
    radix-2 level), and
  * the twiddle-product shift (>> 35 per stage pair).

This tool sweeps every combination of six tie behaviors (even, odd, up,
down, away-from-zero, toward-zero) at each site independently — 36
variants — against all 14 true RTL encode dumps, both with the shipped
PHASE_FIX table and without it (the table was fitted under even/even, so
the unfitted column is the bias-free comparison).  A variant that models
the hardware better than tie-to-even would beat it on BOTH columns.

    python tools/encoder_tie_sweep.py

Result (2026-08-20, recorded in docs/ENCODER.md): even/even is the
unique optimum on both columns; every alternative is strictly worse.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
import time

from aloha_tpu import encoder_hw as E
from encoder_fit import Evaluator  # noqa: E402 (tools dir on sys.path)

MODES = ("even", "odd", "up", "down", "away", "toward")


def main():
    ev = Evaluator()
    shipped_fix = dict(E.PHASE_FIX)
    total = int(ev.valid.sum())
    print(f"{total} golden words across {ev.gold.shape[0]} dumps", flush=True)

    results = []
    t0 = time.time()
    for ts in MODES:
        for tp in MODES:
            E.TIE_SHIFT, E.TIE_PROD = ts, tp
            bad_fit, err_fit = ev.objective(shipped_fix)
            bad_raw, err_raw = ev.objective({})
            results.append((ts, tp, bad_fit, err_fit, bad_raw, err_raw))
            print(
                f"shift={ts:6s} prod={tp:6s}  "
                f"fitted: {bad_fit:6d} bad (|err| {err_fit:8d})   "
                f"unfitted: {bad_raw:6d} bad (|err| {err_raw:8d})",
                flush=True,
            )
    E.TIE_SHIFT = E.TIE_PROD = "even"
    E.PHASE_FIX.clear()
    E.PHASE_FIX.update(shipped_fix)
    E._tw_tables.cache_clear()

    by_fit = sorted(results, key=lambda r: (r[2], r[3]))
    by_raw = sorted(results, key=lambda r: (r[4], r[5]))
    print(f"\nswept {len(results)} variants in {time.time()-t0:.0f}s")
    print("best by fitted objective:   shift=%s prod=%s (%d bad)" % (
        by_fit[0][0], by_fit[0][1], by_fit[0][2]))
    print("best by unfitted objective: shift=%s prod=%s (%d bad)" % (
        by_raw[0][0], by_raw[0][1], by_raw[0][4]))
    ee_fit = next(r for r in results if r[0] == r[1] == "even")
    print(
        f"tie-to-even (shipped): {ee_fit[2]} bad fitted "
        f"({100*(1-ee_fit[2]/total):.3f}% exact), {ee_fit[4]} bad unfitted"
    )

    # per-level refinement: flip the tie mode at ONE FFT level only
    # (the core keeps independent rounding hardware per stage pair, so a
    # single level could in principle deviate) — every single-level
    # deviation must also lose for the uniform result to be terminal.
    print("\nper-level single-deviation sweep (fitted objective):")
    E.TIE_SHIFT = E.TIE_PROD = "even"
    base_bad, base_err = ev.objective(shipped_fix)
    best_lvl = ("-", "-", base_bad, base_err)
    for lvl in (2048, 512, 128, 32, 8, 2):
        for mode in MODES[1:]:
            for site in (0, 1):
                if lvl == 2 and site == 1:
                    continue  # final radix-2 has no twiddle product
                ov = ["even", "even"]
                ov[site] = mode
                E.TIE_LEVEL_OVERRIDE.clear()
                E.TIE_LEVEL_OVERRIDE[lvl] = tuple(ov)
                bad, err = ev.objective(shipped_fix)
                tag = "shift" if site == 0 else "prod"
                delta = bad - base_bad
                print(f"  L={lvl:4d} {tag}={mode:6s}: {bad:6d} bad "
                      f"({'+' if delta >= 0 else ''}{delta})", flush=True)
                if (bad, err) < best_lvl[2:]:
                    best_lvl = (f"L={lvl}", f"{tag}={mode}", bad, err)
    E.TIE_LEVEL_OVERRIDE.clear()
    print(f"baseline even-everywhere: {base_bad} bad; best single "
          f"deviation: {best_lvl[0]} {best_lvl[1]} -> {best_lvl[2]} bad")


if __name__ == "__main__":
    main()
