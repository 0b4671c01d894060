#!/usr/bin/env python3
"""Generate a LARGER testdata corpus with the same schemas/domains as the
driver-written /root/testdata/sf* tables, so the oracle gate can run at a
scale factor the small corpora can't reach (broadcast thresholds, spill
paths, plan changes that only appear big).

Usage: python3 tools/gen_testdata.py <out_dir> <scale_vs_sf001>
  e.g. python3 tools/gen_testdata.py /root/repo/target/sf0.5 50
(scale 50 over the sf0.01 row counts == "sf0.5")

region/nation are copied verbatim from sf0.01 (fixed dimensions).
Timestamp physical types mirror the originals: events ts is
timestamp[ns] (the TIMESTAMP(NANOS) path Tables.events handles),
order/ship dates are timestamp[ms]. All text is pure ASCII (d9's
character-fold oracle requires it). Deterministic: numpy PCG64 seed 7.
"""
import sys
import shutil
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.01"


def money(rng, lo, hi, n):
    return np.round(rng.uniform(lo, hi, n), 2)


def main(out, scale):
    rng = np.random.default_rng(7)
    import os
    os.makedirs(out, exist_ok=True)
    for t in ("region", "nation"):
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")

    n_cust = 1500 * scale
    n_supp = 100 * scale
    n_part = 2000 * scale
    n_ord = 15000 * scale
    n_li = 60000 * scale
    n_ev = 10000 * scale
    n_doc = 500 * scale
    n_vec = 500 * scale

    segs = ["MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "BUILDING", "FURNITURE"]
    pq.write_table(pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": money(rng, -999.99, 9999.99, n_cust),
        "c_mktsegment": [segs[i] for i in rng.integers(0, 5, n_cust)],
    }), f"{out}/customer.parquet")

    pq.write_table(pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": money(rng, -999.99, 9999.99, n_supp),
    }), f"{out}/supplier.parquet")

    adjs = ["small", "large", "shiny", "plain", "rusty", "green", "red"]
    nouns = ["ring", "bolt", "gear", "pipe", "valve", "wheel", "plate"]
    types = ["ECONOMY", "STANDARD", "PROMO", "MEDIUM", "SMALL", "LARGE"]
    pq.write_table(pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": [f"{adjs[a]} {nouns[b]}" for a, b in
                   zip(rng.integers(0, 7, n_part), rng.integers(0, 7, n_part))],
        "p_brand": [f"Brand#{i}" for i in rng.integers(1, 6, n_part)],
        "p_type": [types[i] for i in rng.integers(0, 6, n_part)],
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": money(rng, 900.0, 999.9, n_part),
    }), f"{out}/part.parquet")

    day_ms = 86400000
    base95 = np.datetime64("1995-01-01").astype("datetime64[ms]").astype(np.int64)
    stats = ["P", "O", "F"]
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    odate = base95 + rng.integers(0, 2405, n_ord) * day_ms
    pq.write_table(pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": [stats[i] for i in rng.integers(0, 3, n_ord)],
        "o_totalprice": money(rng, 1000.0, 400000.0, n_ord),
        "o_orderdate": pa.array(odate, pa.timestamp("ms")),
        "o_orderpriority": [prios[i] for i in rng.integers(0, 5, n_ord)],
    }), f"{out}/orders.parquet")

    flags = ["A", "N", "R"]
    lstat = ["F", "O"]
    sdate = base95 + rng.integers(1, 2500, n_li) * day_ms
    pq.write_table(pa.table({
        "l_orderkey": pa.array(rng.integers(0, n_ord, n_li), pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": money(rng, 901.0, 104998.0, n_li),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": [flags[i] for i in rng.integers(0, 3, n_li)],
        "l_linestatus": [lstat[i] for i in rng.integers(0, 2, n_li)],
        "l_shipdate": pa.array(sdate, pa.timestamp("ms")),
    }), f"{out}/lineitem.parquet")

    # events: ts strictly increasing micros over ~30 days, stored as NANOS
    etypes = ["click", "view", "purchase", "signup", "error"]
    base24_us = (np.datetime64("2024-01-01").astype("datetime64[us]")
                 .astype(np.int64))
    span_us = 30 * 86400000000 // 1
    steps = rng.integers(1, 2 * span_us // n_ev, n_ev)
    ts_us = base24_us + np.cumsum(steps)
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": pa.array(ts_us * 1000, pa.timestamp("ns")),
        "user_id": pa.array(rng.integers(0, 150 * scale // 10 + 10, n_ev),
                            pa.int64()),
        "event_type": [etypes[i] for i in rng.integers(0, 5, n_ev)],
        "value": money(rng, 0.01, 490.02, n_ev),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)],
    }), f"{out}/events.parquet")

    vocab = ("window merge spark batch table join line agg small slow "
             "stream customer group data vector big the a query shuffle "
             "sort hash scan filter index column row cache plan stage "
             "task node disk memory net key value count sum").split()
    langs = ["en", "de", "zh", "fr", "es"]
    texts = []
    for i in range(n_doc):
        n_tok = int(rng.integers(8, 101))
        toks = [vocab[j] for j in rng.integers(0, len(vocab), n_tok)]
        texts.append(" ".join(toks))
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": [langs[i] for i in rng.integers(0, 5, n_doc)],
        "source": [f"src{i}" for i in rng.integers(0, 20, n_doc)],
        "n_chars": pa.array(np.array([len(t) for t in texts]), pa.int64()),
    }), f"{out}/documents.parquet")

    emb = rng.uniform(-0.3125, 0.3125, (n_vec, 64)).astype(np.float32)
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(n_vec), pa.int64()),
        "embedding": pa.array(list(emb), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_vec), pa.int32()),
    }), f"{out}/embeddings.parquet")
    print(f"wrote scale={scale} corpus to {out}: lineitem={n_li} "
          f"events={n_ev} docs={n_doc} vecs={n_vec}")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]))
