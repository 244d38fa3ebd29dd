#!/usr/bin/env python3
"""Self-check: emulate the driver's correctness gate.

Runs DuckDB on each oracle SQL from Verify's oracle_sql.json against the
same parquet tables, and compares with the Spark result parquet dumped by
graft.Verify. Columns are sorted by name (like the driver), rows sorted by
all columns. Reports exact and tolerant (1e-9 rel) match per query.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    return [cols[i] for i in order], sorted(out, key=lambda t: tuple(
        (x is None, str(type(x)), str(x)) for x in t))


def cmp_cell(a, b):
    if a is None and b is None:
        return True, True
    if isinstance(a, float) or isinstance(b, float):
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return False, False
        if math.isnan(af) and math.isnan(bf):
            return True, True
        exact = af == bf
        tol = abs(af - bf) <= 1e-9 * max(1.0, abs(af), abs(bf))
        return exact, tol
    exact = a == b
    return exact, exact


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            want = con.sql(sql)
            wcols, wrows = want.columns, want.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            gcols, grows = got.columns, got.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        wc, wr = canon(wrows, wcols)
        gc, gr = canon(grows, gcols)
        if [c.lower() for c in wc] != [c.lower() for c in gc]:
            print(f"FAIL {name}: schema mismatch oracle={wc} spark={gc}")
            n_fail += 1
            continue
        if len(wr) != len(gr):
            print(f"FAIL {name}: rowcount oracle={len(wr)} spark={len(gr)}")
            n_fail += 1
            continue
        bad = None
        n_exact = 0
        ok = True
        for i, (a, b) in enumerate(zip(wr, gr)):
            for j, (x, y) in enumerate(zip(a, b)):
                exact, tol = cmp_cell(x, y)
                if exact:
                    n_exact += 1
                if not tol:
                    ok = False
                    if bad is None:
                        bad = (i, wc[j], x, y)
        ncells = len(wr) * len(wc) if wr else 0
        if ok:
            note = "" if n_exact == ncells else \
                f"  [WARN {ncells - n_exact}/{ncells} cells only tol-equal]"
            print(f"PASS {name}: {len(wr)} rows{note}")
            n_pass += 1
        else:
            print(f"FAIL {name}: first diff row={bad[0]} col={bad[1]} "
                  f"oracle={bad[2]!r} spark={bad[3]!r}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
