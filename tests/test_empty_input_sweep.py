"""Round-10 adversarial sweep: EVERY corpus query against 0-row
tables. At 100 TB an empty input is a legal, routine state — a new
source's first day, a filter that matched nothing, an empty partition
of a date range — and the failure mode this sweep hunts is the
operator that only works because data happens to exist (collected
seed lists indexed blind, array literals built from empty collects
typing as VOID, schema inference over never-written sinks).

Policy (enforced here):

* transforms / dedup / search / reports: empty-in -> EMPTY-OUT with
  the contract schema;
* model TRAINING and explicit config-vs-data guards: a CLEAR
  ``ValueError`` naming the problem — never an IndexError or an
  AnalysisException from deep inside a plan. Every such query is
  allowlisted below WITH its reason; an unlisted raise is a failure.

Round-10 sweep results that shaped the policy: 241/251 already passed;
6 crashed badly and were fixed (ivf/semantic-dedup VOID centroid
literals, kmeans seed IndexError -> clear trainer error, wholetext
partition-discovery miss, medallion read of a never-committed sink,
weighted-sample empty-population), 4 raised acceptably and were
tightened/allowlisted.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F  # noqa: F401  (parity with peers)

#: Queries ALLOWED to raise on empty input — each must raise
#: ValueError with a message matching the fragment.
CLEAR_RAISE = {
    # model training cannot produce an empty-but-valid artifact
    "llm_pq_ann": "0 rows",
    "llm_kmeans_refine": "cannot train k-means",
    "llm_cluster_profile": "cannot train k-means",
    "llm_cluster_balanced_sample": "cannot train k-means",
    # explicit config references sources that the (empty) corpus lacks
    "llm_epoch_plan": "weight keys not in corpus",
}


@pytest.fixture(scope="module")
def empty_sf(spark, tmp_path_factory):
    src = "/root/testdata/sf0.001"
    dst = str(tmp_path_factory.mktemp("sf_empty"))
    from etl_global_mobility_spark.corpus.base import TABLES

    for t in TABLES:
        spark.read.parquet(f"{src}/{t}.parquet").limit(0).write.mode(
            "overwrite"
        ).parquet(os.path.join(dst, f"{t}.parquet"))
    return dst


@pytest.mark.slow
def test_every_query_survives_empty_tables(spark, empty_sf):
    from etl_global_mobility_spark.corpus import all_queries
    from etl_global_mobility_spark.session import release_session_state

    bad: list[str] = []
    for i, (name, spec) in enumerate(all_queries().items()):
        try:
            spec.fn(spark, empty_sf).count()
            if name in CLEAR_RAISE:
                # the allowlist must not rot: if a query stops raising,
                # its entry must be removed
                bad.append(f"{name}: allowlisted to raise but succeeded")
        except ValueError as ex:
            frag = CLEAR_RAISE.get(name)
            if frag is None:
                bad.append(f"{name}: unallowlisted ValueError: {ex}")
            elif frag not in str(ex):
                bad.append(f"{name}: raise message drifted: {ex}")
        except Exception as ex:  # noqa: BLE001 - the sweep's whole point
            msg = str(ex).splitlines()[0][:120] if str(ex) else ""
            bad.append(f"{name}: {type(ex).__name__}: {msg}")
        if i % 40 == 39:
            release_session_state(spark)
    assert not bad, "empty-input failures:\n" + "\n".join(bad)
