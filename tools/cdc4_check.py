#!/usr/bin/env python3
"""CDC4 commit-cost regression gate (r15 verdict item 3).

The solo sum of the four CDC-heavy gates (q113 change-feed relay, q114
incremental view fold, q118 replica fold, q134 IVF reindex) is the
canary that caught three rounds of per-commit machinery accretion. This
makes it self-enforcing instead of verdict-enforced: run the four gates
solo via graft.BenchOne (min of runs 2-3; run1 carries session warmup),
sum the wall minima, FAIL (exit 1) if the sum exceeds the bar.

Honest refusal: if the 1-min loadavg at start is >= 3 the number is
weather, not signal - the check exits 2 (INCONCLUSIVE) without judging.

Box-speed normalization (r16): the same code read 11.9 s on the r16
session-1 box and 14.6-18.0 s on the session-2 box (min-of-3, loadavg
<= 1.1, older code slower in the same-day A/B - box speed, not code).
Absolute bars don't transfer across boxes, so the run now also times
BenchOne's `calibrate` pseudo-gate (a fixed CPU-bound spark.range +
xxhash64 fold, no I/O) and judges wall_sum * (CALIB_REF / calib): a
box that runs the calibration 20% slower is allowed a 20% slower CDC4.

Usage: python3 tools/cdc4_check.py [sfdir] [bar_seconds]
Defaults: /root/testdata/sf0.1, 14.0 s in CALIB_REF-box seconds
(r13 solo baseline 12.44 s + the r15-accepted +8%; re-baseline
deliberately, never silently).

Prints a COVERAGE.md-pasteable line with the wall AND engine split
(fixture seconds self-reported by the gates via FixtureClock).
"""
import os
import re
import subprocess
import sys
import time

GATES = ("q113_change_feed_stream,q114_incremental_view,"
         "q118_cdc_replica,q134_ivf_reindex")
# calibrate-gate seconds on the box where the 14.0 s bar was settled
# (r16 session 2, quiet min-of-3). Rebaseline BOTH together or neither.
CALIB_REF = 1.55
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    bar = float(sys.argv[2]) if len(sys.argv) > 2 else 14.0
    load = os.getloadavg()[0]
    if load >= 3.0:
        print(f"INCONCLUSIVE: start loadavg1m {load:.1f} >= 3 - "
              "a CDC4 number measured under co-tenant load is weather; rerun when quiet")
        sys.exit(2)
    t0 = time.time()
    out = subprocess.run(
        ["sbt", "-batch", f"runMain graft.BenchOne calibrate,{GATES} {sf}"],
        capture_output=True, text=True, cwd=REPO).stdout
    mins = {m.group(1): (float(m.group(2)), float(m.group(3)), float(m.group(4)))
            for m in re.finditer(
                r"(\w+) MIN: wall=([\d.]+) fixture=([\d.]+) engine=([\d.]+)", out)}
    want = set(GATES.split(",")) | {"calibrate"}
    if set(mins) != want:
        print(f"ERROR: expected MIN lines for {sorted(want)}, got {sorted(mins)}")
        print(out[-2000:])
        sys.exit(3)
    calib = mins.pop("calibrate")[0]
    wall = sum(v[0] for v in mins.values())
    fixture = sum(v[1] for v in mins.values())
    engine = sum(v[2] for v in mins.values())
    # judge in reference-box seconds: a box whose calibration runs N%
    # slower is allowed an N%-slower CDC4 (box speed cancels)
    norm = wall * (CALIB_REF / calib)
    per = " ".join(f"{k.split('_')[0]}={v[0]:.2f}" for k, v in sorted(mins.items()))
    verdict = "PASS" if norm <= bar else "FAIL"
    print(f"CDC4 {verdict}: solo min-of-3 wall sum {wall:.2f} s = "
          f"{norm:.2f} s box-normalized (bar {bar:.1f} s, calib {calib:.2f} vs "
          f"ref {CALIB_REF:.2f}, engine {engine:.2f} s + fixture {fixture:.2f} s) "
          f"@ start loadavg {load:.1f} [{per}] in {time.time() - t0:.0f} s total")
    sys.exit(0 if norm <= bar else 1)


if __name__ == "__main__":
    main()
