#!/usr/bin/env python3
"""Generate a synthetic report-TSV corpus shared by the engine/reference
head-to-head benchmark: N samples x T taxa, each sample seeing ~60% of
the taxa universe. Deterministic (seed 42).

Usage: gen_stress_corpus.py N_SAMPLES N_TAXA OUT_DIR
"""
import random
import sys
from pathlib import Path


def main() -> None:
    n_samples, n_taxa, out = int(sys.argv[1]), int(sys.argv[2]), Path(sys.argv[3])
    out.mkdir(parents=True, exist_ok=True)
    rnd = random.Random(42)
    for i in range(n_samples):
        lines = [
            "# synthetic",
            "# stress",
            "%\treads\ttaxReads\tkmers\tdup\tcov\ttaxID\trank\ttaxName",
            "40.0\t4000000\t4000000\t0\t0\t0\t0\tunclassified\tunclassified",
            "60.0\t6000000\t6000000\t100\t0\t0\t1\troot\troot",
        ]
        for tax_id in range(10, 10 + n_taxa):
            if rnd.random() < 0.6:
                reads = rnd.randrange(5000) + 1
                lines.append(
                    f"0.1\t{reads}\t{reads}\t{reads * 7}\t1.0\t0.5"
                    f"\t{tax_id}\tspecies\tTax {tax_id}"
                )
        (out / f"SAMPLE_{i:04d}_report.tsv").write_text("\n".join(lines) + "\n")
    print(f"wrote {n_samples} reports to {out}")


if __name__ == "__main__":
    main()
