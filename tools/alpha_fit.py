#!/usr/bin/env python3
"""Fit per-query and per-family scaling exponents over >= 2 bench
artifacts (the SCALE.md alpha tables).

alpha = slope of log(time) vs log(data-ratio), least-squares over all
provided scale points. Row tables scale with the sf ratio; e-queries
read the embeddings table whose ratio differs (e.g. sf0.1 -> sf0.5 is
12.5x vectors, not 5x), so each artifact is given BOTH ratios and each
query picks by family.

Usage:
  alpha_fit.py out.md ART1:ROWR1:EMBR1 ART2:ROWR2:EMBR2 [ART3:...]

where ARTn is a bench json (the Bench.scala one-line format), ROWRn the
row-table data ratio vs the FIRST artifact, EMBRn the embeddings ratio.
Example:
  alpha_fit.py /dev/stdout \
    bench_artifacts/bench_r07b_sf01.json:1:1 \
    bench_artifacts/bench_r08_sf05.json:5:12.5 \
    bench_artifacts/bench_r08_sf1.json:10:25
"""
import json
import math
import sys
from collections import defaultdict

EMB_FAMILIES = ("e",)  # e-queries read embeddings.parquet


def family(name):
    # leading alphabetic run of the first "_" token: q104->q, bb_...->bb,
    # e8b->e (digits terminate the scan), mm10->mm, ev_...->ev
    head = name.split("_")[0]
    fam = ""
    for c in head:
        if c.isalpha():
            fam += c
        else:
            break
    return fam or "?"


def main(out, specs):
    arts = []
    for spec in specs:
        path, rowr, embr = spec.rsplit(":", 2)
        with open(path) as f:
            j = json.load(f)
        arts.append((path, float(rowr), float(embr), j["queries"],
                     set(j.get("skipped", []))))
    names = set(arts[0][3])
    for _, _, _, qs, _ in arts[1:]:
        names &= set(qs)
    rows = []
    for n in sorted(names):
        fam = family(n)
        pts = [(math.log(embr if fam in EMB_FAMILIES else rowr),
                math.log(max(qs[n], 1e-3)))
               for _, rowr, embr, qs, _ in arts]
        xm = sum(x for x, _ in pts) / len(pts)
        ym = sum(y for _, y in pts) / len(pts)
        den = sum((x - xm) ** 2 for x, _ in pts)
        alpha = (sum((x - xm) * (y - ym) for x, y in pts) / den
                 if den > 0 else float("nan"))
        rows.append((n, fam, [qs[n] for _, _, _, qs, _ in arts], alpha))
    with open(out, "w") as f:
        f.write("| query | fam | " + " | ".join(
            f"t@{p.split('/')[-1]}" for p, *_ in arts) + " | alpha |\n")
        f.write("|" + "---|" * (len(arts) + 3) + "\n")
        for n, fam, ts, a in sorted(rows, key=lambda r: -r[3]):
            f.write(f"| {n} | {fam} | " +
                    " | ".join(f"{t:.2f}" for t in ts) + f" | {a:.2f} |\n")
        f.write("\nPer-family median alpha:\n\n")
        byfam = defaultdict(list)
        for _, fam, _, a in rows:
            if not math.isnan(a):
                byfam[fam].append(a)
        for fam in sorted(byfam):
            xs = sorted(byfam[fam])
            med = xs[len(xs) // 2]
            f.write(f"- {fam}: median {med:.2f} over {len(xs)} queries, "
                    f"max {xs[-1]:.2f}\n")
        flagged = [(n, a) for n, _, _, a in rows if a > 1.05]
        f.write(f"\nFlagged (fitted alpha > 1.05): "
                f"{flagged if flagged else 'none'}\n")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2:])
