"""Session-lifetime memory hygiene — the 100 TB "nightly long-lived
session" claim, MEASURED (round-10 verdict item: the r9 driver bench
tripped at the END of a 248-query single-session run, and
localCheckpoint-based lineage truncation was the suspected
accumulator).

What these tests pin:

* heavy queries DO leave unreleasable-by-default state behind
  (localCheckpoint RDD blocks survive the Python references dying —
  py4j detach is asynchronous and Spark's periodic-GC safety net is
  30 minutes);
* :func:`release_session_state` releases ALL of it — RDD storage back
  to zero, SQL cache empty — in bounded time;
* the release is observable at the OS level too: the block-manager
  disk directory stops growing once hygiene runs between query
  batches.

bench.py calls the same function every 32 queries, so this suite is
the evidence that the bench's long-session behavior is a property of
the code, not luck.
"""

from __future__ import annotations

import os
import time

import pytest

#: Queries whose operators localCheckpoint or persist internally —
#: the state-accumulating worst case (sites: dedup.py:224,297,366,
#: 478-535,821, bpe.py:105,123, unigram.py train_unigram_lm,
#: retrieval.py:269, graph.py).
HEAVY = [
    "llm_minhash_neardup",
    "llm_minhash_verified",
    "llm_incremental_neardup",
    "llm_dedup_components",
    "llm_dup_ngram_spans",
    "llm_bpe_train",
    "llm_unigram_train",
    "llm_hard_negative_mining",
    "rel_pagerank",
]


def _stored_rdds(spark):
    return [
        (i.id(), i.memSize() + i.diskSize())
        for i in spark.sparkContext._jsc.sc().getRDDStorageInfo()
    ]


def _run(spark, name, sf):
    from etl_global_mobility_spark.corpus import all_queries

    df = all_queries()[name].fn(spark, sf)
    df.write.format("noop").mode("overwrite").save()
    # returned so a caller can HOLD the frame: its plan references the
    # localCheckpointed RDDs, keeping their blocks alive until the
    # caller drops it — without a live reference the ContextCleaner may
    # release them as soon as driver GC runs
    return df


@pytest.mark.slow
def test_release_session_state_returns_storage_to_zero(spark, sf_smoke):
    """After a batch of checkpoint-heavy queries, retained RDD storage
    is nonzero (the accumulation is real); one hygiene pass releases
    every block and cache entry within a bounded settle window."""
    from etl_global_mobility_spark.session import release_session_state

    # other session-fixture tests may have left state; start clean so
    # the "accumulates" assertion below is attributable to HEAVY
    release_session_state(spark)
    deadline = time.time() + 15
    while _stored_rdds(spark) and time.time() < deadline:
        time.sleep(0.25)

    # HOLD the result frames while sampling: checkpoint blocks are
    # only pinned while something references the checkpointed RDDs.
    # (Before round 12 this assertion passed WITHOUT holding — but
    # only because the graph family leaked cache entries; with the
    # leak fixed, an unlucky driver GC between the last run and the
    # sample could release every block and make this vacuously red.)
    held = [_run(spark, name, sf_smoke) for name in HEAVY]
    leftover = _stored_rdds(spark)
    assert leftover, (
        "expected checkpoint-heavy queries to retain RDD blocks — if "
        "this ever becomes empty, the operators stopped truncating "
        "lineage and the hygiene tests are vacuous"
    )

    del held  # drop the only references; hygiene must now release all
    release_session_state(spark)
    deadline = time.time() + 15
    while _stored_rdds(spark) and time.time() < deadline:
        time.sleep(0.25)
    assert _stored_rdds(spark) == [], (
        f"RDD blocks still retained 15s after release_session_state: "
        f"{_stored_rdds(spark)}"
    )
    # SQL cache must be empty too (clearCache is part of the pass)
    jcm = spark._jsparkSession.sharedState().cacheManager()
    assert jcm.isEmpty(), "CacheManager entries survived hygiene"


@pytest.mark.slow
def test_storage_growth_is_bounded_across_batches(spark, sf_smoke):
    """Run the heavy block THREE times with hygiene between batches:
    retained storage after each hygiene pass must return to zero every
    time (growth bound = 0 retained bytes at every batch boundary), so
    a session's footprint is set by its single heaviest query, not by
    how many queries ran before it."""
    from etl_global_mobility_spark.session import release_session_state

    retained_after_pass = []
    for _ in range(3):
        for name in HEAVY[:4]:
            _run(spark, name, sf_smoke)
        release_session_state(spark)
        deadline = time.time() + 15
        while _stored_rdds(spark) and time.time() < deadline:
            time.sleep(0.25)
        retained_after_pass.append(
            sum(b for _, b in _stored_rdds(spark))
        )
    assert retained_after_pass == [0, 0, 0], retained_after_pass


@pytest.mark.slow
def test_block_manager_disk_stops_growing_with_hygiene(spark, sf_smoke):
    """OS-level check: the driver's block-manager directory (shuffle
    files + checkpoint blocks spilled to disk) must not grow
    monotonically across hygienic batches. Bound: bytes after batch 3
    <= bytes after batch 1 + 20% slack (steady state, not monotone
    growth). ContextCleaner removes dead shuffle files only after the
    GC nudge — without hygiene this directory grows with every query
    (measured ~0.5 GB over one 248-query bench session)."""
    from etl_global_mobility_spark.session import release_session_state

    sc = spark.sparkContext
    # find the block-manager dir for THIS session
    bm_root = None
    local_dirs = sc._jvm.org.apache.spark.SparkEnv.get().blockManager(
    ).diskBlockManager().localDirs()
    bm_root = [str(d) for d in local_dirs]
    assert bm_root, "no block manager local dirs?"

    def disk_bytes() -> int:
        total = 0
        for root in bm_root:
            for dirpath, _, files in os.walk(root):
                for f in files:
                    try:
                        total += os.path.getsize(os.path.join(dirpath, f))
                    except OSError:
                        pass
        return total

    sizes = []
    for _ in range(3):
        for name in HEAVY[:4]:
            _run(spark, name, sf_smoke)
        release_session_state(spark)
        deadline = time.time() + 15
        while _stored_rdds(spark) and time.time() < deadline:
            time.sleep(0.25)
        time.sleep(1.0)  # shuffle-file removal is a separate async queue
        sizes.append(disk_bytes())
    assert sizes[2] <= sizes[0] * 1.2 + (1 << 20), (
        f"block-manager disk grew across hygienic batches: {sizes}"
    )
