"""Generate an sf-scaled synthetic dataset with the same schemas and
distribution shapes as the driver's /root/testdata tables (TESTDATA.md
— those are read-only, and no generator ships with them, so this is a
reimplementation from the observed shapes: bag-of-word documents over
the same small vocabulary, uniform dims, 30-day event stream,
TPC-H-ish fact tables).  Used for the sf1 operator sweep (VERDICT r3
ask #7); NOT byte-compatible with the driver's seed.

Usage: python tools/gen_sf.py <sf> <out_dir>   (sf=1 -> 6M lineitem)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = ("batch part spark line column order small sort fast value scan "
         "a hash slow group agg filter query big key window row table "
         "stream merge data join plan shuffle page disk read write cache "
         "task stage node core limit").split()
LANGS = ["en"] * 14 + ["zh", "de", "fr", "es", "ru", "ja"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]


def _write(out: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out, f"{name}.parquet"))
    print(f"{name}: {table.num_rows} rows", flush=True)


def main(sf: float, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)
    n_li = int(6_000_000 * sf)
    n_ord = n_li // 4
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)

    _write(out, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS}))
    _write(out, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"nation_{i:02d}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32())}))

    _write(out, "customer", pa.table({
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-999, 9999, n_cust), 2),
        "c_mktsegment": np.array(
            ["AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY",
             "HOUSEHOLD"])[rng.integers(0, 5, n_cust)]}))
    _write(out, "supplier", pa.table({
        "s_suppkey": pa.array(range(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-999, 9999, n_supp), 2)}))
    _write(out, "part", pa.table({
        "p_partkey": pa.array(range(n_part), pa.int64()),
        "p_name": [f"part {i % 97} {VOCAB[i % len(VOCAB)]}"
                   for i in range(n_part)],
        "p_brand": [f"Brand#{i % 25:02d}" for i in range(n_part)],
        "p_type": [f"TYPE {i % 150}" for i in range(n_part)],
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900, 2100, n_part), 2)}))

    day_ns = 86_400_000_000_000
    o_date = (np.datetime64("1995-01-01").astype("datetime64[ns]")
              + (rng.integers(0, 2404, n_ord) * day_ns
                 ).astype("timedelta64[ns]"))
    _write(out, "orders", pa.table({
        "o_orderkey": pa.array(range(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": np.array(["F", "O", "P"])[
            rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(800, 500_000, n_ord), 2),
        "o_orderdate": o_date.astype("datetime64[us]"),
        "o_orderpriority": np.array(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
             "5-LOW"])[rng.integers(0, 5, n_ord)]}))

    l_order = rng.integers(0, n_ord, n_li)
    ship = (o_date[l_order]
            + (rng.integers(1, 122, n_li) * day_ns
               ).astype("timedelta64[ns]"))
    _write(out, "lineitem", pa.table({
        "l_orderkey": pa.array(l_order, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype("float64"),
        "l_extendedprice": np.round(rng.uniform(900, 105_000, n_li), 2),
        "l_discount": np.round(rng.uniform(0, 0.1, n_li), 2),
        "l_tax": np.round(rng.uniform(0, 0.08, n_li), 2),
        "l_returnflag": np.array(["A", "N", "R"])[
            rng.integers(0, 3, n_li)],
        "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, n_li)],
        "l_shipdate": ship.astype("datetime64[us]")}))

    ev_ts = (np.datetime64("2024-01-01").astype("datetime64[ns]")
             + np.sort(rng.integers(0, 30 * day_ns, n_ev))
             .astype("timedelta64[ns]"))
    _write(out, "events", pa.table({
        "event_id": pa.array(range(n_ev), pa.int64()),
        "ts": ev_ts.astype("datetime64[us]"),
        "user_id": pa.array(
            rng.integers(0, max(2, n_ev // 50), n_ev), pa.int64()),
        "event_type": np.array(
            ["signup", "click", "purchase", "error", "view"])[
            rng.integers(0, 5, n_ev)],
        "value": np.round(rng.uniform(0, 500, n_ev), 2),
        "props": [f'{{"k": {int(k)}}}'
                  for k in rng.integers(0, 100, n_ev)]}))

    # documents: ~50-word bags over VOCAB, ~0.3% exact dups and a few
    # near-dups (one word changed) like the driver tables show
    lens = rng.integers(8, 100, n_doc)
    words = rng.integers(0, len(VOCAB), int(lens.sum()))
    texts: list[str] = []
    pos = 0
    for ln in lens:
        texts.append(" ".join(VOCAB[w] for w in words[pos:pos + ln]))
        pos += ln
    for i in rng.integers(0, n_doc, max(2, n_doc // 300)):
        texts[int(i)] = texts[(int(i) + 1) % n_doc]       # exact dup
    for i in rng.integers(0, n_doc, max(2, n_doc // 300)):
        src = texts[(int(i) + 2) % n_doc].split()
        if len(src) > 3:
            src[1] = VOCAB[int(i) % len(VOCAB)]           # near dup
            texts[int(i)] = " ".join(src)
    _write(out, "documents", pa.table({
        "doc_id": pa.array(range(n_doc), pa.int64()),
        "text": texts,
        "lang": np.array(LANGS)[rng.integers(0, len(LANGS), n_doc)],
        "source": [f"src{int(s)}"
                   for s in rng.integers(0, 20, n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64())}))

    emb = rng.normal(0, 1, (n_emb, 64)).astype("float32")
    _write(out, "embeddings", pa.table({
        "vec_id": pa.array(range(n_emb), pa.int64()),
        "embedding": pa.array(list(emb), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 16, n_emb), pa.int32())}))


if __name__ == "__main__":
    main(float(sys.argv[1]), sys.argv[2])
