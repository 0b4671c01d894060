#!/usr/bin/env python3
"""Local pre-check of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the same tables,
and compares column-sorted, row-sorted values EXACTLY (bit-exact doubles;
NaN == NaN). This is a strictly-harsher stand-in for the driver's hash
compare, so green here should mean green in CORRECTNESS_r{N}.json.
"""
import duckdb, json, sys, glob

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sfdir, outdir, only=None):
    con = duckdb.connect()
    # DUCKDB_THREADS caps the oracle's parallelism so a long check can
    # share the box with a same-JVM Spark measurement without shading it
    import os, re
    if os.environ.get("DUCKDB_THREADS"):
        raw = os.environ["DUCKDB_THREADS"]
        try:
            threads = int(raw)
        except ValueError:
            sys.exit(f"DUCKDB_THREADS must be an integer, got '{raw}'")
        if threads < 1:
            sys.exit(f"DUCKDB_THREADS must be >= 1, got {threads}")
        con.execute(f"SET threads={threads}")
    # the comparator sorts both frames itself, so result order is free —
    # but empirically dropping insertion-order preservation made the big
    # oracle CTE pipelines spill MORE on this box (plan change toward
    # materializing parallel operators), so it is opt-in, not default
    if os.environ.get("DUCKDB_NO_ORDER"):
        con.execute("SET preserve_insertion_order=false")
    # DUCKDB_MEMORY caps the buffer pool (e.g. "48GB"): the default
    # (~80% of RAM) let the sf5 e18 oracle grow to 108 GB RSS and get
    # OOM-killed beside a Spark JVM; an explicit cap trades that for
    # orderly spill to temp
    if os.environ.get("DUCKDB_MEMORY"):
        raw = os.environ["DUCKDB_MEMORY"]
        # validate before interpolating into SET: a quote would break the
        # statement and a garbage value would surface as an opaque
        # DuckDB error instead of naming the env var (ADVICE round 14)
        if not re.fullmatch(r"\d+(\.\d+)?\s*(KB|MB|GB|TB|KiB|MiB|GiB|TiB)",
                            raw.strip(), re.IGNORECASE):
            sys.exit(f"DUCKDB_MEMORY must look like '48GB', got '{raw}'")
        con.execute(f"SET memory_limit='{raw.strip()}'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            a = con.execute(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").fetchdf()
            b = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        a = a.reindex(sorted(a.columns), axis=1)
        b = b.reindex(sorted(b.columns), axis=1)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns spark={list(a.columns)} oracle={list(b.columns)}")
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows spark={len(a)} oracle={len(b)}")
            n_fail += 1
            continue
        cols = list(a.columns)
        a = a.sort_values(by=cols, na_position="first").reset_index(drop=True)
        b = b.sort_values(by=cols, na_position="first").reset_index(drop=True)
        dt_mismatch = [(c, str(a[c].dtype), str(b[c].dtype)) for c in cols
                       if str(a[c].dtype) != str(b[c].dtype)]
        if not a.equals(b):
            bad = (a != b) & ~(a.isna() & b.isna())
            badrows = bad.any(axis=1)
            print(f"FAIL {name}: {int(badrows.sum())}/{len(a)} rows differ; "
                  f"dtype diffs={dt_mismatch}")
            if badrows.any():
                i = badrows.idxmax()
                print("  spark :", a.loc[i].to_dict())
                print("  oracle:", b.loc[i].to_dict())
            n_fail += 1
        else:
            note = f" (dtype diffs={dt_mismatch})" if dt_mismatch else ""
            print(f"ok   {name}: {len(a)} rows{note}")
            n_pass += 1
    print(f"\n{n_pass} ok, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:]) or None))
