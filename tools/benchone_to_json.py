#!/usr/bin/env python3
"""Convert a BenchOne log (`[benchone] <name> <secs> s  rows=N` lines)
into the Bench.scala one-line JSON shape so alpha_fit.py can consume
isolated-family runs (e.g. the sf2 100k-vector embeddings corpus).

Usage: benchone_to_json.py <benchone.log> <out.json> <sfLabel>
"""
import json
import re
import sys


def main(log, out, sf):
    qs = {}
    pat = re.compile(r"\[benchone\]\s+(\S+)\s+([0-9.]+)\s+s\s+rows=(-?\d+)")
    with open(log) as f:
        for line in f:
            m = pat.search(line)
            if m:
                qs[m.group(1)] = float(m.group(2))
    if not qs:
        sys.exit(f"no [benchone] lines found in {log}")
    with open(out, "w") as f:
        json.dump({"metric": "total", "value": sum(qs.values()),
                   "unit": "sec", "queries": qs, "sf": sf,
                   "source": "BenchOne (single-pass, warmed)"}, f)
    print(f"{out}: {len(qs)} queries, total {sum(qs.values()):.2f}s")


if __name__ == "__main__":
    main(*sys.argv[1:4])
