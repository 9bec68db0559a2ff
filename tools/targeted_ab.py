"""Targeted many-pass A/B for a SINGLE query: adjudicate a per-query
bench drift that repeats across rounds (round-9 verdict item 2b:
e_compression_recall_matrix read as the worst best-of-passes regression
two rounds running — +0.89 s r8, +1.12 s r9 — while the totals stayed
inside the null floor; 5 passes of best-of cannot separate a real plan
regression from one side drawing the slower half of a bimodal session).

Method: one Spark session, one untimed warmup per side, then N
interleaved counterbalanced passes (ABBA across passes, like bench.py)
timing ONLY the target query on HEAD vs the pinned ref. With 20+ passes
per side the per-side distributions (min / median / mean) separate a
session-drift artifact (overlapping distributions, sign flips between
halves) from a plan regression (disjoint distributions, same sign in
every pass-pair).

    python tools/targeted_ab.py e_compression_recall_matrix [--passes 20]
        [--ref e393ab0] [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# the adjudication instrument must measure the SAME protocol as the
# number it adjudicates: counterbalancing sequence and module-purge
# discipline are imported from bench, never re-implemented
from bench import _PASS_ORDERS, _run_side, ensure_baseline_worktree  # noqa: E402


def _time_one(root: str, spark, name: str, sf_dir: str) -> float:
    return _run_side(root, spark, [name], sf_dir)[name]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--passes", type=int, default=20)
    ap.add_argument("--ref", default="e393ab0")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    head_root = str(Path(__file__).resolve().parent.parent)
    wt = os.path.join(tempfile.gettempdir(), f"targeted_ab_{args.ref}")
    # shared with the headline A/B: reuse only a verified-clean
    # checkout of --ref, recreate anything else (ADVICE r10)
    created = ensure_baseline_worktree(head_root, wt, args.ref)
    try:
        from etl_data_peri_institute_spark.session import get_spark

        spark = get_spark("targeted-ab")
        sides = {"H": head_root, "B": wt}
        # untimed warmup: codegen compile for both plan versions
        for root in sides.values():
            _time_one(root, spark, args.query, args.sf)
        times: dict[str, list[float]] = {"H": [], "B": []}
        for i in range(args.passes):
            order = _PASS_ORDERS[i % len(_PASS_ORDERS)]
            for key in order:
                times[key].append(
                    round(_time_one(sides[key], spark, args.query, args.sf), 3)
                )
        h, b = times["H"], times["B"]
        # sign consistency across interleaved pass-pairs: a real plan
        # regression is slower in (nearly) every pair, session drift
        # flips sign with the session's own swings
        pairs_h_slower = sum(1 for x, y in zip(h, b) if x > y)
        report = {
            "query": args.query,
            "ref": args.ref,
            "passes_per_side": args.passes,
            "head_times": h,
            "baseline_times": b,
            "head_min": min(h),
            "baseline_min": min(b),
            "head_median": statistics.median(h),
            "baseline_median": statistics.median(b),
            "head_mean": round(statistics.fmean(h), 3),
            "baseline_mean": round(statistics.fmean(b), 3),
            "delta_min_pct": round((min(h) - min(b)) / min(b) * 100, 2),
            "delta_median_pct": round(
                (statistics.median(h) - statistics.median(b))
                / statistics.median(b) * 100, 2,
            ),
            "pairs_head_slower": pairs_h_slower,
            "n_pairs": len(h),
        }
        print(json.dumps(report, indent=1))
        return 0
    finally:
        if created:
            subprocess.run(
                ["git", "worktree", "remove", "--force", wt],
                cwd=head_root, check=False, capture_output=True,
            )


if __name__ == "__main__":
    sys.exit(main())
