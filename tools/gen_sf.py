#!/usr/bin/env python3
"""Generate driver-shaped testdata at an arbitrary scale factor.

The driver only ships sf0.001/0.01/0.1 (TESTDATA.md); the 100 TB story
needs at least one measured point above that. This reproduces the driver
generator's observed shapes (schemas, value distributions, planted
near-dup structure in `documents`, sorted exponential-gap event times)
at 10x so `graft.Bench` can run a controlled sf1 board. Distributions
were measured off /root/testdata/sf0.1 (see COVERAGE.md r16 notes):

  - lineitem orderkeys are drawn iid uniform (sf0.1 has 147,236 distinct
    of 150,000 ~= 150000*(1-e^-4): independent draws, not per-order);
  - l_shipdate is NOT correlated with o_orderdate (joined diff spans
    -2399..+2496 days): both are independent uniform over their ranges;
  - events.value is exponential(mean 50) (q50=34.7, q90=114, q99=228);
    ts is sorted with exponential gaps over 30 days of 2024-01;
  - documents: 31-word vocab, lengths uniform 10..100 words; 5% of docs
    are a near-copy of an earlier doc (each word resampled w.p. 2%) with
    " dup" appended - shingle-Jaccard 0.97..1.0 vs the base, matching
    the planted pairs the MinHash/SimHash gates bucket;
  - embeddings grow 4x per decade (500 @sf0.01, 2000 @sf0.1 -> 8000
    @sf1): unit-norm random 64-dim, labels uniform 0..9 (measured
    within-label cosine ~0.0008, i.e. labels are NOT clustered).

Usage: python3 tools/gen_sf.py <out_dir> [ratio_vs_sf0.1=10]
Writes one parquet per table; region/nation copied verbatim from sf0.1.
"""
import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]  # 30 words; the 31st ("dup") only ever appears as the planted suffix
ADJS = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
NOUNS = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
SEGS = ["MACHINERY", "HOUSEHOLD", "FURNITURE", "AUTOMOBILE", "BUILDING"]
PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
ETYPES = ["signup", "click", "error", "view", "purchase"]
LANGS = ["en", "zh", "fr", "es", "de"]
LANGP = [0.41, 0.15, 0.15, 0.15, 0.14]

EPOCH95 = np.datetime64("1995-01-01")
EPOCH24 = np.datetime64("2024-01-01T00:00:00.000000")


def write(out, name, table):
    pq.write_table(table, os.path.join(out, f"{name}.parquet"))
    print(f"[gen] {name}: {table.num_rows} rows", flush=True)


def ts_days(rng, n, lo_day, n_days):
    days = rng.integers(lo_day, lo_day + n_days, n)
    return (EPOCH95 + days.astype("timedelta64[D]")).astype("datetime64[us]")


def main():
    out = sys.argv[1]
    r = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)

    for t in ("region", "nation"):
        shutil.copy(os.path.join(SRC, f"{t}.parquet"), os.path.join(out, f"{t}.parquet"))
        print(f"[gen] {t}: copied", flush=True)

    n_cust = int(150_000 * r)
    n_supp = int(10_000 * r)
    n_part = int(200_000 * r)
    n_ord = int(1_500_000 * r)
    n_li = int(6_000_000 * r)
    n_ev = int(1_000_000 * r)
    n_users = int(15_000 * r)
    n_doc = int(5_000 * r)
    n_emb = int(2000 * (4 ** np.log10(r)))  # 4x per decade above sf0.1

    write(out, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": pa.array(np.array(SEGS)[rng.integers(0, 5, n_cust)]),
    }))

    write(out, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }))

    adj = np.array(ADJS)[rng.integers(0, 8, n_part)]
    noun = np.array(NOUNS)[rng.integers(0, 8, n_part)]
    write(out, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": np.char.add(np.char.add(adj, " "), noun),
        "p_brand": np.array([f"Brand#{b}" for b in range(1, 26)])[rng.integers(0, 25, n_part)],
        "p_type": np.array(PTYPES)[rng.integers(0, 6, n_part)],
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900, 1000, n_part), 1),
    }))

    write(out, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": np.array(["O", "P", "F"])[rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": ts_days(rng, n_ord, 0, 2405),
        "o_orderpriority": np.array(PRIOS)[rng.integers(0, 5, n_ord)],
    }))

    # lineitem is the big one - stream it in chunks through one writer
    li_schema = pa.schema([
        ("l_orderkey", pa.int64()), ("l_partkey", pa.int64()),
        ("l_suppkey", pa.int64()), ("l_linenumber", pa.int32()),
        ("l_quantity", pa.float64()), ("l_extendedprice", pa.float64()),
        ("l_discount", pa.float64()), ("l_tax", pa.float64()),
        ("l_returnflag", pa.string()), ("l_linestatus", pa.string()),
        ("l_shipdate", pa.timestamp("us")),
    ])
    chunk = 5_000_000
    with pq.ParquetWriter(os.path.join(out, "lineitem.parquet"), li_schema) as w:
        done = 0
        while done < n_li:
            n = min(chunk, n_li - done)
            w.write_table(pa.table({
                "l_orderkey": pa.array(rng.integers(0, n_ord, n), pa.int64()),
                "l_partkey": pa.array(rng.integers(0, n_part, n), pa.int64()),
                "l_suppkey": pa.array(rng.integers(0, n_supp, n), pa.int64()),
                "l_linenumber": pa.array(rng.integers(1, 8, n), pa.int32()),
                "l_quantity": rng.integers(1, 51, n).astype(np.float64),
                "l_extendedprice": np.round(rng.uniform(900, 105000, n), 2),
                "l_discount": rng.integers(0, 11, n) / 100.0,
                "l_tax": rng.integers(0, 9, n) / 100.0,
                "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.integers(0, 3, n)]),
                "l_linestatus": pa.array(np.array(["O", "F"])[rng.integers(0, 2, n)]),
                "l_shipdate": ts_days(rng, n, 1, 2499),
            }, schema=li_schema))
            done += n
    print(f"[gen] lineitem: {n_li} rows", flush=True)

    # events: sorted exponential-gap timestamps over ~30 days
    gaps = rng.exponential(30 * 86400e6 / n_ev, n_ev)
    ts = EPOCH24 + np.cumsum(gaps).astype("timedelta64[us]")
    k = rng.integers(0, 100, n_ev)
    write(out, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": ts,
        "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
        "event_type": np.array(ETYPES)[rng.integers(0, 5, n_ev)],
        "value": np.round(rng.exponential(50, n_ev), 2),
        "props": np.array([f'{{"k": {v}}}' for v in range(100)])[k],
    }))

    # documents: 95% fresh random docs, 5% near-copies of an earlier doc
    vocab = np.array(VOCAB)
    texts, langs = [], np.array(LANGS)[rng.choice(5, n_doc, p=LANGP)]
    for i in range(n_doc):
        if i > 0 and rng.random() < 0.05:
            base = texts[int(rng.integers(0, i))].split()
            words = [w if rng.random() >= 0.02 else vocab[int(rng.integers(0, 30))]
                     for w in base if w != "dup"]
            words.append("dup")
        else:
            words = list(vocab[rng.integers(0, 30, int(rng.integers(10, 101)))])
        texts.append(" ".join(words))
    write(out, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": langs,
        "source": np.array([f"src{i}" for i in range(20)])[rng.integers(0, 20, n_doc)],
        "n_chars": pa.array(np.array([len(t) for t in texts]), pa.int64()),
    }))

    vec = rng.standard_normal((n_emb, 64)).astype(np.float32)
    vec /= np.linalg.norm(vec, axis=1, keepdims=True)
    write(out, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(list(vec), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_emb), pa.int32()),
    }))
    print("[gen] done", flush=True)


if __name__ == "__main__":
    main()
