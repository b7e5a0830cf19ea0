"""Benchmark harness: headline corpus queries at sf0.1.

Runs each headline query to full materialization (noop sink — executes
the whole plan, no driver-side row transfer) and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

#: Per-query perf-gate EXEMPTIONS. Round-8 verdict closed the coverage
#: gap the other way: the ratchet now covers EVERY registered query
#: (the full corpus, not a hand-maintained headline list — a 3x
#: regression in an unlisted query used to be invisible). A query may
#: be exempted ONLY by name, with the reason recorded here; exemptions
#: are skipped entirely (not timed), so they must name queries whose
#: bench cost is dominated by out-of-scope machinery, not plan cost.
#: Currently empty: every registered query is timed and ratcheted.
BENCH_EXEMPT: dict[str, str] = {}


def headline_names() -> list[str]:
    """Every registered query, in registration order (driver window
    first, then module order) minus BENCH_EXEMPT — the bench surface
    IS the corpus, so a new query is ratcheted the round it lands."""
    from etl_global_mobility_spark.corpus import all_queries

    return [n for n in all_queries() if n not in BENCH_EXEMPT]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from etl_global_mobility_spark.corpus import all_queries
    from etl_global_mobility_spark.corpus.base import TABLES, load_table
    from etl_global_mobility_spark.session import release_session_state

    # Warmup: touch every table once, then run one tiny join+agg+window
    # over the smallest dims, so the first timed query doesn't absorb
    # JVM/codegen/file-listing warmup (scans alone leave the join/agg
    # codegen paths cold — measured ~1.8s on the first timed join).
    for t in TABLES:
        load_table(spark, sf_dir, t).write.format("noop").mode("overwrite").save()
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("rk", F.row_number().over(Window.orderBy(F.col("n").desc(), "r_name")))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    _warm_python_workers(spark, int(cpus))
    cal_start = _calibration_probe(spark, int(cpus))

    specs = all_queries()
    headline = headline_names()
    times: dict[str, float] = {}
    total = 0.0
    # Best-of-N per query: single-run times on this host swing up to
    # 2-5x run-to-run from VM/host scheduler noise (measured: the same
    # query 1.0s vs 5.6s across back-to-back bench runs with an idle
    # load average). The host's ABSOLUTE speed also drifts between
    # rounds: round 5 A/B-ran llm_minhash_neardup with round-3 code in
    # a worktree vs current code on the same day — identical minima
    # (0.883s vs 0.875s over n=8), while round 3 had recorded 0.625s.
    # Round 6 repeated the protocol for llm_lsh_ann (flagged 1.40s →
    # 1.93s in r5 with no code change on its path): round-4 code in a
    # worktree vs current, n=8 interleaved, minima 1.557s vs 1.584s —
    # identical again, and both sides above the 1.40s r4 record.
    # Cross-ROUND per-query deltas under ~1.5x are therefore host
    # drift unless an A/B on the same day reproduces them. Two runs always; a third only when the first two
    # disagree by >1.5x (a noise hit landed on one of them). The min
    # estimates the actual plan cost; every run executes the full plan
    # to a noop sink.
    def run_once(spec) -> float:
        t0 = time.time()
        df = spec.fn(spark, sf_dir)
        if df.isStreaming:  # pragma: no cover - none currently
            df.count()
        else:
            df.write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    for i, name in enumerate(headline):
        spec = specs[name]
        runs = [run_once(spec), run_once(spec)]
        if max(runs) > 1.5 * min(runs):
            runs.append(run_once(spec))
        times[name] = min(runs)
        # Session hygiene every 32 queries (outside any timed region):
        # a 248-query suite in ONE session accumulates localCheckpoint
        # blocks, shuffle files, and broadcasts that only a driver GC
        # releases (Spark's own periodic-GC interval is 30 min — longer
        # than the whole run). The r9 driver bench tripped on the LAST
        # block of queries after ~4700 stages; this bounds that state
        # for the same reason a 100 TB nightly session must.
        if i % 32 == 31:
            release_session_state(spark)

    # Noise-robust regression confirmation BEFORE reporting: a flagged
    # query gets two more runs (min wins). Host scheduler noise on this
    # box has been measured at 2-7x on identical plans (e.g. the same
    # join 1.5s vs 10.6s back-to-back under an external load spike), so
    # a single bad sample must not fail the bench — only a regression
    # that survives 4 total runs does. Before retrying, restore the
    # session to the state the BASELINE was measured in: hygiene pass +
    # re-warmed python worker pool. The r9 driver trip (grouped-pandas
    # 15.9s vs 1.52s surviving min-of-4 back-to-back retries) is
    # magnitude-consistent with a dead/cold worker pool (32 workers x
    # ~0.45s pandas import, serialized under load) — retries that
    # inherit the degraded pool measure the environment, not the plan.
    # A genuine plan regression survives a warm pool just the same.
    _, baseline = _load_baseline() if abs(sf - 0.1) < 1e-9 else ("none", {})
    # Mid-run flagging stays RAW (factor 1.0): the final gate divides
    # by min(cal_start, cal_end), which mid-run is unknowable — a
    # noisy-high START probe once suppressed the clearing retries for
    # two noise-hit queries and turned them into an RC=1 (round 13,
    # measured: start 0.681 / end 0.493). Flagging is the cheap safety
    # net — an extra retry pair costs seconds, a missed flag fails the
    # run — so only the final verdict is host-calibrated.
    flagged = [
        n for n in headline
        if baseline.get(n) and times[n] > 2.0 * baseline[n] + 0.5
    ]
    if flagged:
        release_session_state(spark)
        rewarm = time.time()
        _warm_python_workers(spark, int(cpus))
        print(
            f"bench: {len(flagged)} flagged ({', '.join(flagged)}); "
            f"re-warm took {time.time() - rewarm:.2f}s "
            f"(>2s means the worker pool had died mid-session); "
            f"{_session_diagnostics(spark)}",
            file=sys.stderr,
        )
    for name in flagged:
        retries = [run_once(specs[name]), run_once(specs[name])]
        times[name] = min([times[name], *retries])
    total = sum(times.values())

    # Host-speed calibration: the same fixed synthetic plan at suite
    # start and end, compared against the sec recorded when the
    # baseline was promoted. The driver's full-suite samples drift
    # ±25% round-over-round with ZERO per-query code changes (209.4 →
    # 262.0 s across r10→r11, movement uniform across all queries);
    # this one number attributes a slow window to host-vs-code without
    # per-query A/Bs. vs_baseline > 1 means THIS host window is slower
    # than the baseline's window — scale per-query ratios down by it
    # before blaming code (plan_perf_diff.py does this automatically).
    cal_end = _calibration_probe(spark, int(cpus))
    cal_sec = min(cal_start, cal_end)
    cal_base = _baseline_calibration()
    calibration = {
        "start_sec": cal_start,
        "end_sec": cal_end,
        "vs_baseline": round(cal_sec / cal_base, 3) if cal_base else None,
    }
    print(f"bench: calibration {calibration}", file=sys.stderr)

    # COMPACT stdout line: the driver tail-captures only ~2 KB, and the
    # full 100+-query map outgrew that in round 6 (BENCH_r06.json
    # recorded `parsed: null` — no headline number, no driver-side
    # baseline). Keep the contract keys (metric/value/unit/queries/sf)
    # but put only the SLOWEST queries inline; the complete map is
    # persisted to BENCH_FULL_LATEST.json (committed, preferred by
    # _load_baseline) so the per-query ratchet never loses resolution.
    # STABLE comparison set (round-15 fix for the driver's round-over-
    # round diff): a query that improves OUT of the top-12 used to
    # vanish from the stdout map and show up as "dropped", and one
    # that degrades INTO it as "new" (PERF_r14 recorded 3 such false
    # drops). Emit the UNION of this run's top-12 and the promoted
    # baseline's top-12 — existing keys never disappear round-over-
    # round unless the baseline itself rotates, and the addition is
    # bounded at 24 entries ≈ +450 bytes, inside the 2 KB budget.
    slowest = dict(sorted(times.items(), key=lambda kv: -kv[1])[:12])
    _, _baseline_map = _load_baseline()
    for n in sorted(_baseline_map, key=lambda n: -_baseline_map[n])[:12]:
        if n in times:
            slowest.setdefault(n, times[n])
    print(
        json.dumps(
            {
                "metric": "headline_corpus_total_runtime",
                "value": round(total, 3),
                "unit": "sec",
                "queries": slowest,
                "n_queries": len(times),
                "queries_full": "BENCH_FULL_LATEST.json",
                "calibration": calibration,
                "sf": sf,
            }
        )
    )
    spark.stop()
    # Regression gate AFTER the JSON line (the driver parses stdout's
    # single line either way): exit nonzero so a >2x per-query
    # regression fails loudly instead of shipping silently.
    regressed = _check_regressions(times, sf, _ratchet_host_factor(cal_sec))
    # Persist the full map as a CANDIDATE, never directly as the
    # baseline: if every green run rewrote BENCH_FULL_LATEST.json,
    # each sub-2x regression would rebase the gate and compound
    # invisibly (1.0s → 2.4s → 5.2s in two green runs). The baseline
    # rebases ONCE PER ROUND, deliberately: at round end, promote the
    # candidate (cp BENCH_FULL_CANDIDATE.json BENCH_FULL_LATEST.json)
    # and commit — within a round every run keeps comparing against
    # the same round-start baseline. A tripped run doesn't even write
    # the candidate.
    if not regressed and abs(sf - 0.1) < 1e-9:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_FULL_CANDIDATE.json"),
            "w",
        ) as f:
            json.dump(
                {
                    "metric": "headline_corpus_total_runtime",
                    "value": round(total, 3),
                    "unit": "sec",
                    "queries": times,
                    "sf": sf,
                    # label carries the measured code state so
                    # KNOWN_BASELINE_ARTIFACTS entries (matched by
                    # label) SELF-EXPIRE at the next promotion — a
                    # constant label would let an exemption mask real
                    # regressions forever
                    "label": f"full-latest@{_git_head()}",
                    "calibration_sec": cal_sec,
                },
                f,
                indent=1,
            )
            f.write("\n")
    if regressed:
        sys.exit(1)


def _git_head() -> str:
    """Short HEAD hash for the candidate label (promotion provenance);
    'unknown' outside a git checkout — labels must never fail a run."""
    import subprocess

    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=os.path.dirname(os.path.abspath(__file__)),
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or "unknown"
    except Exception:
        return "unknown"


def _calibration_probe(spark, cpus: int) -> float:
    """Host-speed probe: min-of-3 of a FIXED synthetic plan — 8M-row
    range → sha256 + modulo key → hash-shuffle groupBy — that reads no
    files, so its cost is pure (CPU × shuffle × scheduler) on this
    host at this moment. ~1.6s/run steady-state on the reference box;
    min-of-3 because single runs swing with scheduler noise just like
    real queries. The value is only ever USED as a ratio against the
    calibration_sec recorded in BENCH_FULL_LATEST.json, so absolute
    magnitude doesn't matter — stability of the plan does: do not
    change this workload without re-baselining."""
    from pyspark.sql import functions as F

    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        (
            spark.range(0, 8_000_000, 1, cpus)
            .select(
                (F.col("id") % 9973).alias("k"),
                F.sha2(F.col("id").cast("string"), 256).alias("h"),
            )
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"), F.max("h").alias("mx"))
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        best = min(best, time.time() - t0)
    return round(best, 3)


def _baseline_calibration() -> float | None:
    """calibration_sec recorded in BENCH_FULL_LATEST.json at promotion
    time, or None while the baseline predates the probe."""
    try:
        with open(
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "BENCH_FULL_LATEST.json",
            )
        ) as f:
            v = json.load(f).get("calibration_sec")
        if not isinstance(v, (int, float)) or isinstance(v, bool):
            return None  # absent or non-numeric JSON type
        return float(v) if v else None
    except (OSError, ValueError, TypeError, KeyError):
        return None


def _warm_python_workers(spark, cpus: int) -> None:
    """Force a pandas import in one python worker per core: the first
    pandas import per worker costs ~0.5s, and a cold 32-way
    mapInPandas query would absorb 32 of them at once. Run at session
    start and again before regression retries (a worker pool killed
    mid-session — e.g. by host memory pressure — would otherwise bill
    its re-fork cost to whichever pandas query runs next)."""

    def _identity(it):
        for pdf in it:
            yield pdf

    (
        spark.range(cpus * 10)
        .repartition(cpus)
        .mapInPandas(_identity, "id long")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )


def _session_diagnostics(spark) -> str:
    """One-line session state summary for flagged-regression triage:
    driver heap, retained RDD storage (localCheckpoint leftovers), and
    live python daemon count."""
    try:
        rt = spark.sparkContext._jvm.java.lang.Runtime.getRuntime()
        heap = f"heap={(rt.totalMemory() - rt.freeMemory()) / (1 << 30):.1f}G"
        infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
        rdd_mem = sum(i.memSize() for i in infos)
        rdds = f"stored_rdds={len(infos)} ({rdd_mem / (1 << 20):.0f}MB)"
        import subprocess

        daemons = subprocess.run(
            ["pgrep", "-cf", "pyspark.daemon"], capture_output=True, text=True
        ).stdout.strip() or "0"
        return f"{heap} {rdds} py_daemons={daemons}"
    except Exception as ex:  # diagnostics must never fail the bench
        return f"diagnostics unavailable: {ex!r}"


_BASELINE_CACHE: tuple[str, dict[str, float]] | None = None


def _load_baseline() -> tuple[str, dict[str, float]]:
    """Per-query seconds for the regression ratchet. Preference order:

    1. BENCH_FULL_LATEST.json — the complete map, rebased ONCE PER
       ROUND by deliberately promoting BENCH_FULL_CANDIDATE.json (the
       file each green sf0.1 run writes) and committing. Runs never
       rewrite the baseline themselves — that would let sub-2x
       regressions compound rebase-by-rebase within a round. Survives
       the driver's ~2 KB tail-capture limit that nulled BENCH_r06's
       parsed map.
    2. the NEWEST BENCH_r*.json the driver recorded that carries a
       FULL per-query map. Files from round 7 onward print a compact
       line (12 slowest only, detectable via n_queries > len(queries));
       falling back to one of those would silently shrink the ratchet
       to 12 queries, so compact files are SKIPPED in favor of the
       newest full-map file, and any fallback past BENCH_FULL_LATEST
       warns loudly on stderr.
    """
    import glob
    import re

    global _BASELINE_CACHE
    if _BASELINE_CACHE is not None:
        return _BASELINE_CACHE

    def _done(v):
        global _BASELINE_CACHE
        _BASELINE_CACHE = v
        return v

    here = os.path.dirname(os.path.abspath(__file__))
    full = os.path.join(here, "BENCH_FULL_LATEST.json")
    if os.path.exists(full):
        try:
            with open(full) as f:
                data = json.load(f)
            if abs(float(data.get("sf", 0.1)) - 0.1) < 1e-9 and data.get("queries"):
                return _done(
                    (str(data.get("label", "full-latest")), dict(data["queries"]))
                )
        except (OSError, ValueError):
            pass
    print(
        "bench: WARNING — BENCH_FULL_LATEST.json missing or unusable; "
        "falling back to driver-recorded BENCH_r*.json files "
        "(full-map files only — compact 12-slowest files are skipped)",
        file=sys.stderr,
    )
    candidates: list[tuple[int, str]] = []
    for p in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if m:
            candidates.append((int(m.group(1)), p))
    for rnd, path in sorted(candidates, reverse=True):
        try:
            with open(path) as f:
                data = json.load(f)
            if "queries" not in data:  # driver wraps our line under "parsed"
                data = data.get("parsed") or {}
            if abs(float(data.get("sf", 0.1)) - 0.1) > 1e-9:
                continue  # baseline only holds at its own SF
            queries = dict(data.get("queries", {}))
            n_queries = data.get("n_queries", len(queries))
            if n_queries > len(queries):  # compact file: 12-slowest only
                print(
                    f"bench: skipping compact BENCH_r{rnd}.json "
                    f"({len(queries)} of {n_queries} queries inline)",
                    file=sys.stderr,
                )
                continue
            if queries:
                return _done((f"r{rnd}", queries))
        except (OSError, ValueError):
            continue
    print(
        "bench: WARNING — no full-map baseline found; per-query "
        "ratchet is INACTIVE this run",
        file=sys.stderr,
    )
    return _done(("none", {}))


#: Baseline entries known to be measurement ARTIFACTS, not achievable
#: plan costs. Each exemption names the ONE baseline label it applies
#: against, so it SELF-EXPIRES: as soon as a newer BENCH_r file
#: re-baselines at the honest number, the label no longer matches and
#: the query is back under the full gate — a forgotten entry cannot
#: mask a future genuine regression. Each carries the investigation
#: that earned the exemption.
KNOWN_BASELINE_ARTIFACTS: dict[str, dict[str, str]] = {
    # EMPTY at round 13: every prior exemption has expired. The two
    # precedents live in git history (round 6: llm_dup_ngram_spans
    # vs the r5 label — a leaked persist() made best-of-2's second
    # run hit the still-cached plan; round 12: five graph-family
    # entries vs the pre-promotion "full-latest" label — the
    # coalesce(1)-REBOUND unpersist missed the cache entry, so the
    # persisted edge/pair frames leaked and propped up the family's
    # baselines). Labels now always embed the HEAD hash
    # ("full-latest@<hash>"), so any entry added here must name the
    # CURRENT promoted label and dies at the next promotion; a
    # hygiene test (tests/test_bench_gate.py) fails on any entry
    # whose only_vs can no longer match the live baseline label.
}


def _ratchet_host_factor(cal_sec: float | None) -> float:
    """Clamped now/baseline calibration ratio for the regression
    ratchet. A genuinely slow host window (measured 1.46x at the
    round-12 close with zero code changes) pushes every ~1.5x query
    toward the 2x trip line and burns min-of-4 retries; dividing the
    observed seconds by this factor makes ratchet verdicts invariant
    under the measured host band. Clamped to [1.0, 1.3] so a broken
    or drifted probe can never MASK a real regression: at the cap a
    query still trips at 2.6x raw, and a fast host window (ratio < 1)
    never tightens the gate below the raw threshold."""
    base = _baseline_calibration()
    if not base or not cal_sec:
        return 1.0
    return max(1.0, min(1.3, cal_sec / base))


def _check_regressions(
    times: dict[str, float], sf: float, host_factor: float = 1.0
) -> bool:
    """True if any query regressed >2x (+0.5s noise floor) vs the last
    round's recorded bench, after dividing out the measured host-speed
    band (``host_factor``, see :func:`_ratchet_host_factor`)."""
    if abs(sf - 0.1) > 1e-9:  # baseline only holds at its own SF
        return False
    label, baseline = _load_baseline()
    bad = False
    for name, raw_t in times.items():
        base = baseline.get(name)
        t = raw_t / host_factor
        if base and t > 2.0 * base + 0.5:
            art = KNOWN_BASELINE_ARTIFACTS.get(name)
            if art is not None and art["only_vs"] == label:
                print(
                    f"bench: {name} {t:.2f}s vs {label} {base:.2f}s — "
                    f"baseline-artifact exempt: {art['reason']}",
                    file=sys.stderr,
                )
                continue
            bad = True
            print(
                f"bench: REGRESSION {name}: {raw_t:.2f}s raw / "
                f"{t:.2f}s host-normalized (factor {host_factor:.3f}) "
                f"vs {label} baseline {base:.2f}s (>2x)",
                file=sys.stderr,
            )
    return bad


if __name__ == "__main__":
    main()
