"""Shared-session concurrency — one SparkSession, many query threads.

A nightly 100 TB deployment does not run 251 queries one at a time: a
single long-lived session serves concurrent query threads (Spark's
scheduler is thread-safe; each action becomes an independent job).
The operator surface therefore has to be thread-safe too — in
particular the process-local memos and on-disk artifacts that the
train-once composers share (corpus/llm.py `_kmeans_artifact_centroids`:
before the round-10 lock, two threads missing the memo concurrently
`write.mode("overwrite")` the SAME artifact directory).

What these tests pin:

* a mixed batch of relational / llm / pandas-UDF queries returns
  BIT-IDENTICAL results under 8-way thread concurrency vs sequential
  execution in the same session (the pandas-UDF entries additionally
  stress the shared Python worker pool);
* the same pure-compute query run 4x concurrently agrees with itself;
* the three kmeans composers, raced from a cold memo AND a cold
  on-disk artifact, serialize through the artifact lock: exactly one
  training lands, all callers read the same centroids, and the
  results match a sequential warm re-run.
"""

from __future__ import annotations

import pytest

import shutil
from concurrent.futures import ThreadPoolExecutor

from etl_global_mobility_spark.corpus import all_queries

#: Diverse compute-only queries (no shared roundtrip artifacts):
#: scans+joins+aggs, windows, grouping sets, dedup, text scoring, and
#: two pandas-UDF entries that contend for the Python worker pool.
DISTINCT_BATCH = [
    "rel_agg_pricing_summary",
    "rel_join_revenue_by_nation",
    "rel_window_topk_per_group",
    "rel_agg_grouping_sets",
    "rel_topk_global",
    "rel_pivot_linestatus",
    "llm_exact_dedup",
    "llm_minhash_neardup",
    "llm_quality_score",
    "llm_tfidf_topterms",
    "udf_pandas_grouped_agg",
    "udf_pandas_scalar",
]


def _canon(df) -> list[tuple[str, ...]]:
    """Order-insensitive canonical rows (Spark-vs-Spark compare only)."""
    return sorted(tuple(str(c) for c in row) for row in df.collect())


def test_concurrent_distinct_queries_match_sequential(spark, sf_smoke):
    specs = all_queries()
    sequential = {
        n: _canon(specs[n].fn(spark, sf_smoke)) for n in DISTINCT_BATCH
    }
    with ThreadPoolExecutor(max_workers=8) as pool:
        futures = {
            n: pool.submit(lambda q=n: _canon(specs[q].fn(spark, sf_smoke)))
            for n in DISTINCT_BATCH
        }
        concurrent = {n: f.result(timeout=600) for n, f in futures.items()}
    for n in DISTINCT_BATCH:
        assert concurrent[n] == sequential[n], f"{n} diverged under concurrency"


def test_concurrent_same_query_agrees_with_itself(spark, sf_smoke):
    specs = all_queries()
    for name in ("rel_agg_pricing_summary", "llm_quality_score"):
        with ThreadPoolExecutor(max_workers=4) as pool:
            results = list(
                pool.map(
                    lambda _i, q=name: _canon(specs[q].fn(spark, sf_smoke)),
                    range(4),
                )
            )
        assert all(r == results[0] for r in results), name


@pytest.mark.slow
def test_hygiene_racing_live_queries_is_correctness_safe(spark, sf_smoke):
    """release_session_state(drop_sql_cache=False) fired WHILE other
    threads are mid-query must never change results: the GC→detach→
    cleaner chain releases DEAD objects only — an in-flight job holds
    strong JVM references to every RDD it executes, including
    localCheckpointed ones (whose blocks are unrecoverable by lineage,
    the dangerous case — llm_dedup_components composes them, so it
    rides in the racing mix). This is the nightly shape: hygiene on a
    timer while query threads keep running.

    This soak is what CAUGHT the barrier rule the first time it ran:
    with clearCache() left in the racing loop, llm_dedup_components
    intermittently returned an EMPTY (silently wrong) result — the
    cleared cache entry made a materialized AQE query stage report
    zero rows, empty-relation propagation rewrote the join to
    EmptyRelation, and the iterative loop 'converged' on nothing.
    Hence drop_sql_cache=True documents a hard no-queries-in-flight
    barrier (bench.py's shape), and the concurrent-safe mode below is
    what a multi-threaded deployment must use."""
    import time

    from etl_global_mobility_spark.session import release_session_state

    specs = all_queries()
    names = [
        "llm_dedup_components",
        "llm_minhash_neardup",
        "rel_join_revenue_by_nation",
        "llm_tfidf_topterms",
        "rel_window_topk_per_group",
        "udf_pandas_grouped_agg",
    ]
    sequential = {n: _canon(specs[n].fn(spark, sf_smoke)) for n in names}

    stop = {"flag": False}

    def hygiene_loop():
        while not stop["flag"]:
            release_session_state(spark, settle_secs=0.5, drop_sql_cache=False)
            time.sleep(0.1)

    with ThreadPoolExecutor(max_workers=7) as pool:
        h = pool.submit(hygiene_loop)
        futures = {}
        for rep in range(3):  # widen the race window: 3 passes per query
            for n in names:
                futures[(n, rep)] = pool.submit(
                    lambda q=n: _canon(specs[q].fn(spark, sf_smoke))
                )
        try:
            raced = {k: f.result(timeout=900) for k, f in futures.items()}
        finally:
            stop["flag"] = True
        h.result(timeout=60)
    for (n, rep), got in raced.items():
        assert got == sequential[n], (
            f"{n} (pass {rep}) diverged under racing hygiene"
        )


@pytest.mark.slow
def test_unsafe_hygiene_race_fails_loudly_never_silently(spark, sf_smoke):
    """Violating the barrier rule (clearCache racing live queries) may
    corrupt AQE runtime stats and empty a join mid-plan — the engine's
    contract is that iterative operators then RAISE their node-count
    conservation guard instead of returning a silently wrong (empty)
    result. Each racing pass must therefore end in exactly one of two
    states: the correct answer, or the guard's RuntimeError. The race
    is probabilistic; the assertion holds either way, and when the
    window hits, this exercises the guard against the real corruption
    (not an injected fake)."""
    import time

    from etl_global_mobility_spark.session import release_session_state

    specs = all_queries()
    name = "llm_dedup_components"
    expected = _canon(specs[name].fn(spark, sf_smoke))

    stop = {"flag": False}

    def hygiene_loop():
        while not stop["flag"]:
            # deliberately unsafe: full barrier-mode release while the
            # query thread is mid-flight
            release_session_state(spark, settle_secs=0.3)
            time.sleep(0.05)

    outcomes = []
    with ThreadPoolExecutor(max_workers=2) as pool:
        h = pool.submit(hygiene_loop)
        try:
            for _ in range(8):
                try:
                    got = _canon(specs[name].fn(spark, sf_smoke))
                    assert got == expected, (
                        "silently wrong result under unsafe race: "
                        f"{len(got)} rows vs {len(expected)}"
                    )
                    outcomes.append("ok")
                except AssertionError:
                    raise
                except Exception as ex:  # noqa: BLE001
                    # ANY loud failure is acceptable under a barrier
                    # violation (the guard's RuntimeError, a lost
                    # checkpoint block, a destroyed broadcast) — only
                    # silent wrongness is forbidden
                    outcomes.append(f"loud:{type(ex).__name__}")
        finally:
            stop["flag"] = True
        h.result(timeout=60)
    # informational: how often the race window actually hit
    assert len(outcomes) == 8, outcomes


@pytest.mark.slow
def test_concurrent_kmeans_composers_share_one_artifact(spark, sf_smoke):
    """Race the three kmeans composers from a fully cold start (memo
    cleared, on-disk artifact removed): the artifact lock must admit
    exactly one trainer, and every caller must see the same centroids."""
    import glob
    import os

    from etl_global_mobility_spark.corpus import llm as llm_mod
    from etl_global_mobility_spark.corpus.relational import _roundtrip_dir

    specs = all_queries()
    names = [
        "llm_kmeans_refine",
        "llm_cluster_profile",
        "llm_cluster_balanced_sample",
    ]
    warm = {n: _canon(specs[n].fn(spark, sf_smoke)) for n in names}

    llm_mod._KMEANS_ARTIFACT_MEM.clear()
    for d in glob.glob(os.path.join(_roundtrip_dir(""), "kmeans_*")):
        shutil.rmtree(d, ignore_errors=True)

    with ThreadPoolExecutor(max_workers=3) as pool:
        futures = {
            n: pool.submit(lambda q=n: _canon(specs[q].fn(spark, sf_smoke)))
            for n in names
        }
        raced = {n: f.result(timeout=600) for n, f in futures.items()}

    for n in names:
        assert raced[n] == warm[n], f"{n} diverged after cold-start race"
    # all three composers share one (sf_dir, params, fingerprint) key —
    # the race must not have produced duplicate trainings under
    # distinct keys or clobbered the artifact
    assert len(llm_mod._KMEANS_ARTIFACT_MEM) == 1
