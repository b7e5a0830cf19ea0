"""Driver-contract gate, locally enforced: every corpus query must
hash-match its DuckDB oracle at sf0.001 (the driver runs the same
comparison at sf0.01 → CORRECTNESS_r{N}.json).

Runs scripts/selfcheck.py in a subprocess: it builds its own
SparkSession, which must not displace the session-scoped fixture.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_every_corpus_query_matches_oracle():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "selfcheck.py"),
         "/root/testdata/sf0.001"],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=900,
    )
    tail = "\n".join(proc.stdout.splitlines()[-25:])
    assert proc.returncode == 0, f"selfcheck failed:\n{tail}\n{proc.stderr[-2000:]}"
    assert ", 0 fail" in proc.stdout


def test_contract_surface_is_complete():
    """entry/queries/oracle_sql exist and agree with the corpus."""
    sys.path.insert(0, REPO)
    import __spark_entry__ as e
    from etl_global_mobility_spark.corpus import all_queries

    specs = all_queries()
    qs = e.queries()
    osql = e.oracle_sql()
    assert set(qs) == set(specs)
    assert set(osql) == {k for k, s in specs.items() if s.oracle is not None}
    assert len(qs) >= 50


#: Novel (llm_/stream_/udf_) queries deliberately registered PAST the
#: driver's 50-query window. Every entry must name the in-window query
#: that evidences the same component — additions without a listed
#: representative fail the invariant below.
ALLOWED_OUTSIDE_WINDOW = {
    "llm_token_count_by_lang": "llm_text_stats",  # text analysis
    "llm_salient_terms": "llm_text_stats",  # text analysis
    "stream_sliding_counts": "stream_tumbling_counts",  # windowed agg
    "llm_quality_score": "llm_filter_rules",  # quality (rule-engine superset)
    "llm_knn_label_vote": "llm_cosine_topk",  # similarity (same top-k core)
    "llm_stratified_sample": "llm_mix_sources",  # md5 sampling (data-derived rates)
    "stream_python_source": "stream_tumbling_counts",  # streamed agg-to-memory
    "udf_cogroup_profile": "udf_pandas_grouped_map",  # grouped pandas hook
    "llm_e2e_curation": "llm_filter_rules",  # composition of in-window stages
    "llm_dedup_keep_best": "llm_dedup_components",  # same cluster machinery
    "llm_per_source_cap": "llm_mix_sources",  # md5-deterministic sampling
    "llm_split_leakage": "llm_ngram_jaccard",  # composition of in-window stages
}


def test_driver_window_invariants():
    """The driver checks the FIRST 50 registered queries (ordering
    policy in corpus/__init__.py). Pin what must stay inside:

    * the window is exactly 50 names and registration starts with it;
    * every llm_*/stream_*/udf_* query is inside (they had zero driver
      evidence in round 2 purely from ordering), except the curated
      ALLOWED_OUTSIDE_WINDOW variants whose component has another
      in-window representative;
    * everything in the window carries a DuckDB oracle (no rows-only
      checks spending a window slot).
    """
    sys.path.insert(0, REPO)
    from etl_global_mobility_spark.corpus import DRIVER_WINDOW, all_queries

    specs = all_queries()
    names = list(specs)
    assert len(DRIVER_WINDOW) == 50
    assert tuple(names[:50]) == tuple(DRIVER_WINDOW)

    novel = {
        n for n in specs if n.startswith(("llm_", "stream_", "udf_"))
    }
    outside = novel - set(DRIVER_WINDOW) - set(ALLOWED_OUTSIDE_WINDOW)
    assert not outside, f"novel operators outside the driver window: {outside}"
    for variant, representative in ALLOWED_OUTSIDE_WINDOW.items():
        assert representative in DRIVER_WINDOW, (
            f"{variant} allowed outside only because {representative} is "
            "inside — but it is not"
        )

    no_oracle = [n for n in DRIVER_WINDOW if specs[n].oracle is None]
    assert not no_oracle, f"rows-only queries inside the window: {no_oracle}"
