#!/usr/bin/env python3
"""One-shot large-SF gate runner (harness tooling): wraps
check_oracle.py + sf1_oracle_subs.py + check_components.py and emits
a machine-readable SCALE_r{N}.json so the sf1 scale-proof is a
driver-diffable artifact instead of prose.

Per query it records:
  status : "green" | "fail" | "missing"
  oracle : "stock"            (check_oracle on the stock SQL)
         | "substitute"       (sf1_oracle_subs planted-truth SQL —
                               the all-pairs STOCK oracle is the
                               scale-limited side, not the engine)
         | "component-check"  (check_components union-find replay of
                               the stock recursive-CTE oracle)
  ratio  : big/small per-query median from two Bench detail logs
           (null when a log is absent or lacks the query)

Usage:
  scale_gate.py <verify_out_dir> <sf_dir> <round> \
      [--small-bench LOG] [--big-bench LOG] [--out FILE]
"""
import argparse
import json
import os
import re
import shutil
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
from sf1_oracle_subs import SUBS  # noqa: E402

# queries whose stock oracle is a recursive transitive-closure CTE —
# intractable in DuckDB at sf1; check_components.py replays them
# exactly (same edge derivation, union-find closure)
COMPONENT_QUERIES = [
    "q60_neardup_clusters",
    "q65_curation_funnel",
    "q90_entity_clusters",
    "q115_soft_dedup_weights",
    "q125_leakage_safe_split",
]

LINE = re.compile(r"^\s*([.X])\s+(\S+):\s+(.*)$")


def parse_check_lines(text):
    out = {}
    for line in text.splitlines():
        m = LINE.match(line)
        if m:
            out[m.group(2)] = (m.group(1) == ".", m.group(3))
    return out


def bench_medians(path, key="median"):
    """Per-query seconds from a Bench detail log. key="median" is the
    warm-median default; key="cold" reads each query's first-iteration
    time instead — pass it (via --cold) when ONE of the two logs was a
    single-iteration run, so the ratio compares cold-to-cold rather
    than conflating warm-up with data scale."""
    last = None
    for line in open(path):
        line = line.strip()
        if line.startswith('{"metric":"detail"'):
            last = line
    if not last:
        return {}
    # detail-line keys are FULL query names; ratio lookup is by the
    # short qNN prefix, so normalize here — and fail loudly if two
    # registered queries ever share a prefix (a silent dict overwrite
    # would attach a ratio to the wrong query)
    out = {}
    for k, v in json.loads(last)[key].items():
        short = k.split("_")[0]
        if short in out:
            raise SystemExit(
                f"bench_medians: duplicate query prefix {short!r} in {path} "
                f"— prefixes must be unique for ratio attribution")
        out[short] = v
    return out


def rows_out(out_dir, query):
    """Row count of a Verify result directory (parquet part files)."""
    try:
        import pyarrow.parquet as pq
    except ImportError:
        return None
    d = os.path.join(out_dir, query)
    total = 0
    for root, _, files in os.walk(d):
        for f in files:
            if f.endswith(".parquet"):
                total += pq.read_metadata(os.path.join(root, f)).num_rows
    return total


# machine-readable provenance for every non-stock oracle row: WHY the
# stock SQL was not run at this SF (previously prose-only in SCALE.md)
ORACLE_NOTES = {
    "substitute": ("stock all-pairs oracle SQL is the scale-limited side "
                   "at this SF; planted-truth substitute SQL from "
                   "sf1_oracle_subs.py verifies the same contract"),
    "component-check": ("stock recursive-CTE closure oracle is intractable "
                        "in DuckDB at this SF; check_components.py replays "
                        "the same edge derivation + union-find closure"),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("sf_dir")
    ap.add_argument("round", type=int)
    ap.add_argument("--small-bench")
    ap.add_argument("--big-bench")
    ap.add_argument("--small-out-dir",
                    help="Verify out dir from the SMALL-SF run; when given, "
                         "per-query rows_out_small is recorded so output "
                         "growth (vs plan-shape growth) is machine-decomposable")
    ap.add_argument("--cold", action="store_true",
                    help="ratio from per-query COLD times instead of warm "
                         "medians — use when one log is single-iteration")
    ap.add_argument("--out")
    args = ap.parse_args()

    oracle_path = os.path.join(args.out_dir, "oracle_sql.json")
    backup = oracle_path + ".stock"
    shutil.copy(oracle_path, backup)
    try:
        subprocess.run(
            [sys.executable, os.path.join(HERE, "sf1_oracle_subs.py"),
             args.out_dir], check=True, capture_output=True, text=True)
        substituted = sorted(SUBS)

        skip = "|".join(q.split("_")[0] + "_" for q in COMPONENT_QUERIES)
        oracle_run = subprocess.run(
            [sys.executable, os.path.join(HERE, "check_oracle.py"),
             args.out_dir, args.sf_dir, "", skip],
            capture_output=True, text=True)
        oracle_results = parse_check_lines(oracle_run.stdout)

        comp_run = subprocess.run(
            [sys.executable, os.path.join(HERE, "check_components.py"),
             args.out_dir, args.sf_dir],
            capture_output=True, text=True)
        comp_results = parse_check_lines(comp_run.stdout)
    finally:
        shutil.move(backup, oracle_path)

    key = "cold" if args.cold else "median"
    small = bench_medians(args.small_bench, key) if args.small_bench else {}
    big = bench_medians(args.big_bench, key) if args.big_bench else {}

    registered = sorted(
        d for d in os.listdir(args.out_dir)
        if os.path.isdir(os.path.join(args.out_dir, d)))
    queries = {}
    for q in registered:
        if q in comp_results:
            ok, note = comp_results[q]
            oracle = "component-check"
        elif q in oracle_results:
            ok, note = oracle_results[q]
            oracle = "substitute" if q in substituted else "stock"
        else:
            ok, note, oracle = None, "no check ran", "none"
        short = q.split("_")[0]
        ratio = None
        if short in small and short in big and small[short] and big[short]:
            ratio = round(big[short] / small[short], 2)
        queries[q] = {
            "status": "green" if ok else ("missing" if ok is None else "fail"),
            "oracle": oracle,
            # failures keep the checker's message; green non-stock rows
            # carry the one-line WHY so the artifact is self-justifying
            "note": note if not ok else ORACLE_NOTES.get(oracle),
            "ratio": ratio,
            "rows_out_big": rows_out(args.out_dir, q),
            "rows_out_small": (rows_out(args.small_out_dir, q)
                               if args.small_out_dir else None),
        }

    ratios = [v["ratio"] for v in queries.values() if v["ratio"]]
    small_total = sum(v for v in small.values() if v)
    big_total = sum(v for v in big.values() if v)
    result = {
        "round": args.round,
        "sf_dir": args.sf_dir,
        "n_queries": len(queries),
        "n_green": sum(v["status"] == "green" for v in queries.values()),
        "n_stock_oracle": sum(v["oracle"] == "stock" for v in queries.values()),
        "n_substitute_oracle": sum(
            v["oracle"] == "substitute" for v in queries.values()),
        "n_component_check": sum(
            v["oracle"] == "component-check" for v in queries.values()),
        "suite_ratio": (round(big_total / small_total, 2)
                        if small_total and big_total else None),
        "ratio_basis": key,
        "worst_ratio": max(ratios) if ratios else None,
        "queries": queries,
    }
    out = args.out or os.path.join(
        os.path.dirname(HERE), f"SCALE_r{args.round}.json")
    json.dump(result, open(out, "w"), indent=1)
    print(f"wrote {out}: {result['n_green']}/{result['n_queries']} green "
          f"(stock={result['n_stock_oracle']} "
          f"sub={result['n_substitute_oracle']} "
          f"comp={result['n_component_check']}) "
          f"suite_ratio={result['suite_ratio']}")
    return 0 if result["n_green"] == result["n_queries"] else 1


if __name__ == "__main__":
    sys.exit(main())
