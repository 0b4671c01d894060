#!/usr/bin/env python3
"""Generate an ADVERSARIALLY SKEWED corpus with the same schemas/domains
as /root/testdata/sf0.01, so the oracle gate can check correctness under
the distributions that break naive plans (uniform corpora exercise the
shuffle machinery but never its skew paths):

  - one customer receives 30% of all orders (hot aggregation/join key)
  - one order carries 20% of all lineitems (hot join fan-out)
  - one user produces 30% of all events (monster session / hot window
    partition); 60% of events are one type (hot pivot column)
  - documents: 20% byte-identical boilerplate (mega dedup cluster),
    10% boilerplate + unique suffix (near-dup tail for setsim/LSH),
    token draws Zipf-weighted (real heavy hitters, skewed df for BM25)
  - embeddings: 40% of vectors packed into one tight cluster (skewed
    IVF cells for k-means training/serving)

Row counts mirror sf0.01 exactly; all schemas, physical timestamp types
(events ts = NANOS) and value domains match gen_testdata.py. The point
is DISTRIBUTION, not volume: every query's oracle must still match
bit-for-bit when the data is hostile. Deterministic: numpy PCG64 seed 13.

Usage: python3 tools/gen_skew_corpus.py <out_dir>
"""
import sys
import shutil
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.01"


def money(rng, lo, hi, n):
    return np.round(rng.uniform(lo, hi, n), 2)


def skewed_ids(rng, n_draws, n_keys, hot_share, hot_key=0):
    """hot_share of draws -> hot_key; the rest uniform over the keys."""
    out = rng.integers(0, n_keys, n_draws)
    hot = rng.random(n_draws) < hot_share
    out[hot] = hot_key
    return out


def main(out):
    rng = np.random.default_rng(13)
    import os
    os.makedirs(out, exist_ok=True)
    for t in ("region", "nation", "customer", "supplier", "part"):
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")

    n_cust, n_part, n_supp = 1500, 2000, 100
    n_ord, n_li, n_ev, n_doc, n_vec = 15000, 60000, 10000, 500, 500

    day_ms = 86400000
    base95 = np.datetime64("1995-01-01").astype("datetime64[ms]").astype(np.int64)
    stats = ["P", "O", "F"]
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    odate = base95 + rng.integers(0, 2405, n_ord) * day_ms
    pq.write_table(pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(skewed_ids(rng, n_ord, n_cust, 0.30), pa.int64()),
        "o_orderstatus": [stats[i] for i in rng.integers(0, 3, n_ord)],
        "o_totalprice": money(rng, 1000.0, 400000.0, n_ord),
        "o_orderdate": pa.array(odate, pa.timestamp("ms")),
        "o_orderpriority": [prios[i] for i in rng.integers(0, 5, n_ord)],
    }), f"{out}/orders.parquet")

    flags = ["A", "N", "R"]
    lstat = ["F", "O"]
    sdate = base95 + rng.integers(1, 2500, n_li) * day_ms
    pq.write_table(pa.table({
        "l_orderkey": pa.array(skewed_ids(rng, n_li, n_ord, 0.20), pa.int64()),
        "l_partkey": pa.array(skewed_ids(rng, n_li, n_part, 0.15), pa.int64()),
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

    etypes = ["click", "view", "purchase", "signup", "error"]
    base24_us = (np.datetime64("2024-01-01").astype("datetime64[us]")
                 .astype(np.int64))
    span_us = 30 * 86400000000
    steps = rng.integers(1, 2 * span_us // n_ev, n_ev)
    ts_us = base24_us + np.cumsum(steps)
    etype_idx = rng.integers(0, 5, n_ev)
    hot_t = rng.random(n_ev) < 0.60
    etype_idx[hot_t] = 0  # 60% clicks
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": pa.array(ts_us * 1000, pa.timestamp("ns")),
        "user_id": pa.array(skewed_ids(rng, n_ev, 160, 0.30), pa.int64()),
        "event_type": [etypes[i] for i in etype_idx],
        "value": money(rng, 0.01, 490.02, n_ev),
        "props": [f'{{"k": {k}}}' for k in skewed_ids(rng, n_ev, 100, 0.25)],
    }), f"{out}/events.parquet")

    vocab = ("window merge spark batch table join line agg small slow "
             "stream customer group data vector big the a query shuffle "
             "sort hash scan filter index column row cache plan stage "
             "task node disk memory net key value count sum").split()
    zipf_w = 1.0 / np.arange(1, len(vocab) + 1)
    zipf_w /= zipf_w.sum()
    langs = ["en", "de", "zh", "fr", "es"]
    boiler = " ".join(vocab[i] for i in
                      rng.choice(len(vocab), 60, p=zipf_w))
    texts = []
    for i in range(n_doc):
        if i % 5 == 0:               # 20%: byte-identical boilerplate
            texts.append(boiler)
        elif i % 10 == 1:            # 10%: boilerplate + unique suffix
            texts.append(boiler + f" doc{i} variant")
        else:
            n_tok = int(rng.integers(8, 101))
            toks = [vocab[j] for j in
                    rng.choice(len(vocab), n_tok, p=zipf_w)]
            texts.append(" ".join(toks))
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": [langs[i] for i in rng.integers(0, 5, n_doc)],
        "source": [f"src{i}" for i in
                   skewed_ids(rng, n_doc, 20, 0.40)],
        "n_chars": pa.array(np.array([len(t) for t in texts]), pa.int64()),
    }), f"{out}/documents.parquet")

    emb = rng.uniform(-0.3125, 0.3125, (n_vec, 64)).astype(np.float32)
    center = rng.uniform(-0.25, 0.25, 64).astype(np.float32)
    hot_v = rng.random(n_vec) < 0.40  # 40% in one tight cluster
    noise = rng.uniform(-0.02, 0.02, (n_vec, 64)).astype(np.float32)
    emb[hot_v] = center + noise[hot_v]
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(n_vec), pa.int64()),
        "embedding": pa.array(list(emb), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_vec), pa.int32()),
    }), f"{out}/embeddings.parquet")
    print(f"wrote skewed corpus to {out}")


if __name__ == "__main__":
    main(sys.argv[1])
