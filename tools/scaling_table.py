#!/usr/bin/env python3
"""Per-gate scale table: t_sf1 / t_sf0.1 ratios (r15 verdict item 1).

Reads two BENCH_FULL-format JSON lines (an sf0.1 run and an sf1 run of
the same tree), prints a markdown table of the gates whose ratio
exceeds the flag threshold plus summary stats, and exits 1 if any gate
errored at sf1 or scaled worse than the super-linear flag.

Ratios are read with the fixture split when present: for gates that
self-report fixture_s, the ENGINE ratio (wall - fixture) is what's
judged — a gate whose fixture rebuilds a 10x table is expected to pay
10x there.

Usage: python3 tools/scaling_table.py BENCH_sf01.json BENCH_sf1.json [flag_ratio=15]

Gates in INTRINSIC are exempt from the exit-1 flag (still printed, with
an [intrinsic] mark): their super-linear growth is a property of the
declared semantics on this corpus, documented in-code with measured
rejection of the alternatives. Keep this list SHORT and justified.
"""
import json
import sys

INTRINSIC = {
    # exact top-5 Jaccard costs T(overlapping pairs); the 30-word-vocab
    # corpus makes ~every same-lang pair overlap (quadratic HERE, sparse
    # on real text). Measured: DuckDB-32t needs 189 s at sf1 vs our
    # 29.9 s. Sub-quadratic regime is covered by q35/q41/q44.
    # Full analysis: TextOps.scala q37 header comment.
    "q37_ngram_jaccard",
    # exact k-NN join is |corpus|x|probes| by declaration; metric
    # pruning measured and rejected in Similarity.scala:97-118. The
    # scale paths are the ANN gates (q41/q44/q58/q146).
    "q42_knn_join",
}


def load(p):
    with open(p) as f:
        return json.loads(f.read())


def main():
    a, b = load(sys.argv[1]), load(sys.argv[2])
    flag = float(sys.argv[3]) if len(sys.argv) > 3 else 15.0
    qa, qb = a["queries"], b["queries"]
    fa, fb = a.get("fixture_s", {}), b.get("fixture_s", {})
    bad_errors = sorted(k for k, v in qb.items() if v < 0)
    rows = []
    for k in sorted(qa):
        if k not in qb or qa[k] < 0 or qb[k] < 0:
            continue
        ea = max(qa[k] - fa.get(k, 0.0), 1e-3)
        eb = max(qb[k] - fb.get(k, 0.0), 1e-3)
        # floor the denominator: a 20 ms sf0.1 gate that reads 60 ms at
        # sf1 is scheduling noise, not a 3x scale signal
        rows.append((k, qa[k], qb[k], eb / max(ea, 0.05)))
    rows.sort(key=lambda r: -r[3])
    print(f"| gate | t_sf0.1 | t_sf1 | engine ratio |")
    print(f"|---|---|---|---|")
    for k, t1, t10, r in rows[:20]:
        mark = (" [intrinsic]" if k in INTRINSIC else " **(flag)**") \
            if r > flag else ""
        print(f"| {k} | {t1:.2f} | {t10:.2f} | {r:.1f}x{mark} |")
    n = len(rows)
    over = [k for k, _, _, r in rows if r > flag and k not in INTRINSIC]
    med = sorted(r for _, _, _, r in rows)[n // 2] if n else 0
    # when the boards carry different gate sets (a "skipped" extreme-scale
    # board), raw totals are apples-to-oranges: sum the COMPARED gates
    if set(qa) != set(qb):
        ta, tb = sum(r[1] for r in rows), sum(r[2] for r in rows)
        skipped = sorted(set(qa) ^ set(qb))
        print(f"\n[gate sets differ; totals below are over the {n} common "
              f"gates; absent from one board: {skipped}]")
    else:
        ta, tb = a["value"], b["value"]
    print(f"\ngates compared: {n}; median engine ratio {med:.1f}x; "
          f"total {ta:.1f} s -> {tb:.1f} s "
          f"({tb / ta:.1f}x); "
          f"flag >{flag:g}x: {over or 'none'}; sf1 errors: {bad_errors or 'none'}")
    sys.exit(1 if (over or bad_errors) else 0)


if __name__ == "__main__":
    main()
