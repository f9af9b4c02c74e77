"""Regression comparison of two benchmark CSVs.

Port of the reference regression gate (``test/compare_benchmarks.jl`` +
``benchmark_comparison_git.sh``, wired as ctest JuliaBenchmark,
CMakeLists.txt:132-148): flags any row whose solve time regressed by more
than ``--threshold`` (default 5%, the reference's gate).

Usage:  python benchmarks/compare.py baseline.csv candidate.csv [--threshold 0.05]
Exit status 1 if any regression exceeds the threshold.
"""
import argparse
import csv
import sys


def load(path):
    with open(path) as fh:
        return {(r["kind"], r["n"], r["m"], r["ms"]): float(r["solve_ms"])
                for r in csv.DictReader(fh)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("baseline")
    ap.add_argument("candidate")
    ap.add_argument("--threshold", type=float, default=0.05)
    args = ap.parse_args()

    base = load(args.baseline)
    cand = load(args.candidate)
    failed = False
    for key, t0 in sorted(base.items()):
        if key not in cand:
            print(f"MISSING {key}")
            failed = True
            continue
        t1 = cand[key]
        ratio = t1 / t0 if t0 > 0 else float("inf")
        tag = "REGRESSION" if ratio > 1 + args.threshold else "ok"
        if tag != "ok":
            failed = True
        print(f"{key}: {t0:.3f} ms -> {t1:.3f} ms  ({ratio:.2%})  {tag}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
