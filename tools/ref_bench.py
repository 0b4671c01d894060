#!/usr/bin/env python3
"""Time the REFERENCE pipeline (/root/reference/bigbugdata.py, read-only)
on a corpus produced by gen_stress_corpus.py, for the single-node
throughput comparison in BASELINE.md.

scipy is not installed in this environment; the reference only uses
scipy.stats.zscore (population ddof=0), so a minimal shim is injected
before import. The reference module itself is untouched.

Usage: ref_bench.py REPORTS_DIR RESULTS_DIR
"""
import importlib.util
import math
import sys
import time
import types
from pathlib import Path


def _install_scipy_shim() -> None:
    def zscore(values):
        n = len(values)
        mean = sum(values) / n
        var = sum((x - mean) ** 2 for x in values) / n
        sd = math.sqrt(var)
        if sd == 0.0:
            return [float("nan")] * n
        return [(x - mean) / sd for x in values]

    scipy = types.ModuleType("scipy")
    stats = types.ModuleType("scipy.stats")
    stats.zscore = zscore
    scipy.stats = stats
    sys.modules["scipy"] = scipy
    sys.modules["scipy.stats"] = stats


def main() -> None:
    reports_dir, results_dir = Path(sys.argv[1]), sys.argv[2]
    _install_scipy_shim()
    spec = importlib.util.spec_from_file_location(
        "bigbugdata_ref", "/root/reference/bigbugdata.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    paths = sorted(str(p) for p in reports_dir.glob("*_report.tsv"))
    t0 = time.time()
    mod.run(
        report_paths=paths,
        results_path=results_dir,
        rank="species",
        n_tophits=15,
        group_patterns=[("SAMPLE_0000", "SAMPLE_00")],
    )
    dt = time.time() - t0
    print(f'{{"engine":"reference","samples":{len(paths)},"sec":{dt:.1f}}}')


if __name__ == "__main__":
    main()
