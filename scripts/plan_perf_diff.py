"""Release-review artifact: per-query wall time × plan shape, diffed.

The r9 bench post-mortem had to reconstruct "did this query get slower
AND did its plan change?" by hand from two BENCH_FULL_*.json files and
a pair of EXPLAIN dumps. This script makes that a one-command artifact:

    python scripts/plan_perf_diff.py --rebaseline [sf_dir] [filters...]
        EXPLAIN every corpus query at sf_dir and persist the plan
        shapes to PLAN_SHAPES_BASELINE.json (diffable in git).

    python scripts/plan_perf_diff.py [sf_dir] [filters...]
        Recompute current plan shapes, join them against the baseline
        shapes plus the per-query second maps in BENCH_FULL_LATEST.json
        (prev) and BENCH_FULL_CANDIDATE.json (now), and write
        PLAN_PERF_DIFF.json sorted review-first: slower+plan_changed,
        then slower, then plan_changed. Exit 1 if any query lands in
        the slower+plan_changed bucket.

Declaring a query's DataFrame is lazy for the relational corpus but
EAGER for the stream_*/train-persist queries (they run their jobs on
declaration), so a full run costs roughly one bench pass; pass name
filters (substring match, like selfcheck.py) to scope a quick audit.
"""

from __future__ import annotations

import json
import os
import sys
import traceback

sys.path.insert(0, ".")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BASELINE_PATH = os.path.join(REPO, "PLAN_SHAPES_BASELINE.json")
OUT_PATH = os.path.join(REPO, "PLAN_PERF_DIFF.json")
BENCH_PREV = os.path.join(REPO, "BENCH_FULL_LATEST.json")
BENCH_NOW = os.path.join(REPO, "BENCH_FULL_CANDIDATE.json")

PLAN_SHAPE_SCHEMA = (
    "query string, n_shuffles int, n_broadcasts int, n_scans int, "
    "n_python_nodes int, has_cartesian boolean, est_rows double, "
    "est_size_bytes double"
)


def _bench_secs(path: str) -> dict[str, float]:
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return dict(json.load(f).get("queries") or {})


def _bench_calibration(path: str) -> float | None:
    """calibration_sec the bench run recorded (bench.py
    _calibration_probe) — a host-speed sample taken alongside the
    per-query seconds, or None for files predating the probe."""
    if not os.path.exists(path):
        return None
    with open(path) as f:
        v = json.load(f).get("calibration_sec")
    return float(v) if v else None


def _host_factor() -> float:
    """now-host-speed / prev-host-speed from the two bench files'
    calibration probes. Dividing the candidate's seconds by this
    before the ratio join makes `slower` mean "slower after removing
    host drift" — the r10→r11 driver samples moved 25% with zero code
    changes, which otherwise floods the review artifact with false
    `slower` rows. Clamped to [1/3, 3]: a factor outside that band
    means a broken probe, not a believable host window, so fall back
    to raw seconds (factor 1.0) rather than normalize by garbage."""
    prev, now = _bench_calibration(BENCH_PREV), _bench_calibration(BENCH_NOW)
    if not prev or not now:
        return 1.0
    factor = now / prev
    if not (1 / 3 <= factor <= 3):
        print(
            f"plan_perf_diff: calibration factor {factor:.2f} outside "
            f"sanity band — ignoring (raw seconds used)",
            file=sys.stderr,
        )
        return 1.0
    return factor


def compute_shapes(spark, sf_dir: str, filters: list[str]) -> list[dict]:
    """EXPLAIN every (filtered) corpus query; one shape row each.

    Queries whose declaration itself fails are recorded with an
    ``error`` field rather than aborting the audit — a release review
    wants the full table, not the first stack trace.
    """
    from etl_global_mobility_spark.corpus import all_queries
    from etl_global_mobility_spark.operators.planaudit import plan_shape_row

    rows: list[dict] = []
    for name, spec in all_queries().items():
        if filters and not any(f in name for f in filters):
            continue
        try:
            df = spec.fn(spark, sf_dir)
            rows.append(plan_shape_row(name, df))
        except Exception:
            rows.append({"query": name, "error": traceback.format_exc(limit=1)})
    return rows


def _filtered_rebaseline_sf_conflict(sf_dir: str) -> dict | None:
    """Refuse a FILTERED rebaseline computed at a different scale
    factor than the existing baseline (ADVICE r12): plan shapes
    legitimately differ by sf (AQE / broadcast-threshold decisions),
    so merging would produce a baseline whose declared sf_dir no
    longer describes all of its pinned shapes — a silent provenance
    lie. A full (unfiltered) rebaseline at the new sf is the correct
    move instead. Returns the refusal payload, or None when the merge
    is provenance-safe."""
    if not os.path.exists(BASELINE_PATH):
        return None
    try:
        with open(BASELINE_PATH) as f:
            prev_sf = json.load(f).get("sf_dir")
    except (json.JSONDecodeError, OSError) as exc:
        # a corrupt/unreadable baseline must produce the structured
        # refusal payload like every other conflict, not a raw
        # traceback (r13 advice finding)
        return {
            "error": f"unreadable baseline: {exc}",
            "baseline_sf_dir": None,
            "requested_sf_dir": sf_dir,
            "hint": "run one full (unfiltered) --rebaseline to "
            "rewrite the baseline",
        }
    if prev_sf is None:
        # a legacy baseline with NO sf provenance cannot be merged
        # into safely either: the merged file would be stamped with
        # THIS run's sf_dir, fabricating provenance for every legacy
        # pin (r13 review finding) — one full rebaseline stamps it
        return {
            "error": "filtered rebaseline onto a baseline without "
            "sf_dir provenance",
            "baseline_sf_dir": None,
            "requested_sf_dir": sf_dir,
            "hint": "run one full (unfiltered) --rebaseline first to "
            "stamp sf provenance",
        }
    if os.path.abspath(prev_sf) == os.path.abspath(sf_dir):
        return None
    return {
        "error": "filtered rebaseline sf mismatch",
        "baseline_sf_dir": prev_sf,
        "requested_sf_dir": sf_dir,
        "hint": "rerun unfiltered at the new sf, or filter-rebaseline "
        "at the baseline's own sf_dir",
    }


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--rebaseline"]
    rebaseline = "--rebaseline" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    filters = args[1:]

    if rebaseline and filters:
        refusal = _filtered_rebaseline_sf_conflict(sf_dir)
        if refusal is not None:  # refuse BEFORE paying for a session
            print(json.dumps(refusal))
            return 2

    from etl_global_mobility_spark.session import get_spark

    spark = get_spark()
    shapes = compute_shapes(spark, sf_dir, filters)
    errors = [r for r in shapes if "error" in r]
    shapes = [r for r in shapes if "error" not in r]

    if rebaseline:
        # A FILTERED rebaseline merges into the existing baseline
        # instead of replacing it: `--rebaseline <sf> some_query` used
        # to silently shrink the 250+-query baseline file to the one
        # filtered shape, wiping every other query's pin.
        out_sf = sf_dir
        if filters and os.path.exists(BASELINE_PATH):
            with open(BASELINE_PATH) as f:
                prev = json.load(f)
            # sf-mismatch merges were already refused pre-session by
            # _filtered_rebaseline_sf_conflict (ADVICE r12)
            # drop old pins ONLY for queries successfully recomputed
            # this run: keying the drop on the filter string would also
            # delete the pin of a filtered query whose declaration
            # ERRORED (it is absent from `shapes`), silently removing
            # it from all future plan-regression diffs
            recomputed = {r["query"] for r in shapes}
            kept = [r for r in prev["shapes"] if r["query"] not in recomputed]
            shapes = sorted(kept + shapes, key=lambda r: r["query"])
            # the unfiltered pins keep the sf_dir they were computed at
            out_sf = prev.get("sf_dir", sf_dir)
        with open(BASELINE_PATH, "w") as f:
            json.dump(
                {"sf_dir": out_sf, "shapes": shapes}, f, indent=1, sort_keys=True
            )
        print(
            json.dumps(
                {
                    "action": "rebaseline",
                    "merged": bool(filters),
                    "queries": len(shapes),
                    "errors": len(errors),
                    "path": os.path.relpath(BASELINE_PATH, REPO),
                }
            )
        )
        return 0

    if not os.path.exists(BASELINE_PATH):
        print(
            json.dumps(
                {"error": "no PLAN_SHAPES_BASELINE.json — run --rebaseline first"}
            )
        )
        return 2

    with open(BASELINE_PATH) as f:
        baseline = json.load(f)["shapes"]
    if filters:
        baseline = [
            r for r in baseline if any(f in r["query"] for f in filters)
        ]

    from etl_global_mobility_spark.operators.planaudit import perf_plan_diff

    plan_prev = spark.createDataFrame(baseline, PLAN_SHAPE_SCHEMA)
    plan_now = spark.createDataFrame(shapes, PLAN_SHAPE_SCHEMA)
    host_factor = _host_factor()
    now_secs = {
        k: v / host_factor for k, v in _bench_secs(BENCH_NOW).items()
    }
    report = perf_plan_diff(
        spark, plan_prev, plan_now, _bench_secs(BENCH_PREV), now_secs
    )
    rows = [r.asDict() for r in report.collect()]
    by_status: dict[str, int] = {}
    for r in rows:
        by_status[r["status"]] = by_status.get(r["status"], 0) + 1
    with open(OUT_PATH, "w") as f:
        json.dump(
            {"sf_dir": sf_dir, "host_factor": round(host_factor, 3),
             "rows": rows},
            f, indent=1, default=str,
        )
    print(
        json.dumps(
            {
                "queries": len(rows),
                "by_status": by_status,
                "host_factor": round(host_factor, 3),
                "errors": len(errors),
                "out": os.path.relpath(OUT_PATH, REPO),
            }
        )
    )
    for r in rows:
        if r["status"] != "ok":
            print(
                f"  {r['status']:>20}  {r['query']}  "
                f"ratio={r['time_ratio']}  deltas={r['plan_deltas']}"
            )
    return 1 if by_status.get("slower+plan_changed") else 0


if __name__ == "__main__":
    sys.exit(main())
