"""Round-14 optimization invariants.

Two families of change, each pinned to produce BIT-IDENTICAL results:

1. Small-graph single-task fast paths: below
   ``parallelism.SINGLE_TASK_MAX_EDGES`` the iterative operators
   (``dedup_components``, ``label_propagation``,
   ``label_propagation_convergence``) run one Arrow-batched job
   (union-find / in-memory synchronous LPA) instead of distributed
   join+aggregate rounds. Equality with the distributed rounds is the
   whole correctness story — these tests force BOTH paths over the
   same graphs (chains that exercise pointer jumping, stars, cliques,
   isolated pairs) by monkeypatching the module-level threshold.

2. ``ngram_jaccard_pairs`` packs (id_a, id_b) into one BIGINT
   aggregation key. Exact for ids in [0, 2^31), which the operator now
   ASSERTS (a wrong silent answer is the failure mode the assert
   exists to prevent); the reference result is recomputed in pure
   Python from the same shingle/df-cap definitions.
"""

from __future__ import annotations

import random
import re

import pytest
from pyspark.sql import functions as F

import etl_global_mobility_spark.operators.dedup as dedup_mod
import etl_global_mobility_spark.operators.graph as graph_mod
from etl_global_mobility_spark.operators.dedup import (
    dedup_components,
    ngram_jaccard_pairs,
)
from etl_global_mobility_spark.operators.graph import (
    label_propagation,
    label_propagation_convergence,
)


def _mixed_graph(seed: int) -> list[tuple[int, int]]:
    """Chains (deep paths — the pointer-jumping case), stars, cliques
    and isolated pairs, with shuffled edge order and orientation."""
    rng = random.Random(seed)
    edges: list[tuple[int, int]] = []
    base = 0
    for _ in range(5):
        n = rng.randint(2, 60)
        ids = [base + i for i in range(n)]
        base += n + rng.randint(1, 4)
        edges += list(zip(ids, ids[1:]))
    for _ in range(4):
        n = rng.randint(2, 25)
        hub = base
        base += n + 3
        edges += [(hub, hub + i) for i in range(1, n)]
    for _ in range(3):
        n = rng.randint(3, 9)
        ids = [base + i for i in range(n)]
        base += n + 2
        edges += [(x, y) for i, x in enumerate(ids) for y in ids[i + 1 :]]
    for _ in range(6):
        edges.append((base, base + 1))
        base += 3
    rng.shuffle(edges)
    return [(b, a) if rng.random() < 0.5 else (a, b) for a, b in edges]


@pytest.fixture()
def force_distributed(monkeypatch):
    """Pin the distributed rounds regardless of graph size."""

    def _force():
        monkeypatch.setattr(dedup_mod, "SINGLE_TASK_MAX_EDGES", 0)
        monkeypatch.setattr(graph_mod, "SINGLE_TASK_MAX_EDGES", 0)

    return _force


@pytest.mark.parametrize("seed", [7, 23])
def test_components_fast_path_equals_distributed(
    spark, seed, force_distributed
):
    pairs = spark.createDataFrame(_mixed_graph(seed), "id_a long, id_b long")
    fast = dedup_components(pairs).orderBy("id").collect()
    force_distributed()
    slow = dedup_components(pairs).orderBy("id").collect()
    assert fast == slow
    assert len(fast) > 0


@pytest.mark.parametrize("seed", [11])
def test_lpa_fast_path_equals_distributed(spark, seed, force_distributed):
    edges = spark.createDataFrame(_mixed_graph(seed), "src long, dst long")
    fast = label_propagation(edges, n_iters=3).orderBy("node").collect()
    fast0 = label_propagation(edges, n_iters=0).orderBy("node").collect()
    force_distributed()
    slow = label_propagation(edges, n_iters=3).orderBy("node").collect()
    slow0 = label_propagation(edges, n_iters=0).orderBy("node").collect()
    assert fast == slow
    assert fast0 == slow0  # 0 rounds: every node keeps its own label


def test_lpa_convergence_fast_path_equals_distributed(
    spark, force_distributed
):
    edges = spark.createDataFrame(_mixed_graph(31), "src long, dst long")
    fast = label_propagation_convergence(edges, n_iters=4).orderBy(
        "round"
    ).collect()
    force_distributed()
    slow = label_propagation_convergence(edges, n_iters=4).orderBy(
        "round"
    ).collect()
    assert fast == slow
    assert [r.round for r in fast] == [1, 2, 3, 4]


def test_pagerank_convergence_fast_path_equals_distributed(
    spark, force_distributed
):
    """The residual curve is exact integer arithmetic on both paths —
    bit-identical rows, including the L1 deltas."""
    from etl_global_mobility_spark.operators.graph import (
        pagerank_convergence,
    )

    edges = spark.createDataFrame(
        _mixed_graph(17), "src long, dst long"
    )
    fast = pagerank_convergence(edges, n_iters=3).orderBy("round").collect()
    force_distributed()
    slow = pagerank_convergence(edges, n_iters=3).orderBy("round").collect()
    assert fast == slow
    assert [r.round for r in fast] == [1, 2, 3]
    assert all(r.l1_delta > 0 for r in fast)


def test_pagerank_convergence_empty_graph(spark):
    from etl_global_mobility_spark.operators.graph import (
        pagerank_convergence,
    )

    edges = spark.createDataFrame([], "src long, dst long")
    conv = pagerank_convergence(edges, n_iters=2).orderBy("round").collect()
    assert [(r.round, r.l1_delta, r.n_nodes, r.avg_move) for r in conv] == [
        (1, 0, 0, 0.0),
        (2, 0, 0, 0.0),
    ]


def test_fast_paths_empty_graph(spark):
    """Empty edge lists keep the pre-optimization contracts: empty
    label frames for components/LPA, n_iters all-zero diagnostic rows
    for the convergence report."""
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert dedup_components(pairs).count() == 0
    edges = spark.createDataFrame([], "src long, dst long")
    assert label_propagation(edges, n_iters=3).count() == 0
    conv = label_propagation_convergence(edges, n_iters=3).orderBy(
        "round"
    ).collect()
    assert [(r.round, r.n_changed, r.n_nodes, r.frac_changed) for r in conv] == [
        (1, 0, 0, 0.0),
        (2, 0, 0, 0.0),
        (3, 0, 0, 0.0),
    ]


def _reference_jaccard_pairs(docs, k, threshold, df_max):
    """Pure-Python recomputation of the operator's contract: distinct
    k-word shingles, drop shingles with document frequency > df_max,
    sizes on the capped universe, exact Jaccard, id_a < id_b."""
    shingles = {}
    for doc_id, text in docs:
        toks = [t for t in re.split(r"\s+", text.lower().strip()) if t]
        ss = {
            " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
        }
        shingles[doc_id] = ss
    df_count: dict[str, int] = {}
    for ss in shingles.values():
        for s in ss:
            df_count[s] = df_count.get(s, 0) + 1
    capped = {
        d: {s for s in ss if df_count[s] <= df_max}
        for d, ss in shingles.items()
    }
    out = []
    ids = sorted(capped)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(capped[a] & capped[b])
            if inter == 0:
                continue
            jac = inter / (len(capped[a]) + len(capped[b]) - inter)
            if jac >= threshold:
                out.append((a, b, jac))
    return sorted(out)


def test_ngram_jaccard_packed_key_matches_reference(spark):
    rng = random.Random(5)
    vocab = [f"w{i}" for i in range(30)]
    docs = []
    for i in range(80):
        docs.append((i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 25)))))
    # planted near-dups including one id far above the doc count (but
    # inside the packed range) so the unpack path is exercised
    docs.append((2_000_000_000, docs[3][1]))
    docs.append((81, docs[3][1] + " w0"))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(
        (r.id_a, r.id_b, r.jaccard)
        for r in ngram_jaccard_pairs(df, k=2, threshold=0.3, df_max=40).collect()
    )
    want = _reference_jaccard_pairs(docs, k=2, threshold=0.3, df_max=40)
    assert [(a, b) for a, b, _ in got] == [(a, b) for a, b, _ in want]
    for (_, _, gj), (_, _, wj) in zip(got, want):
        assert gj == pytest.approx(wj, abs=0.0)


@pytest.mark.parametrize("bad_id", [-1, 1 << 31])
def test_ngram_jaccard_rejects_out_of_pack_range_ids(spark, bad_id):
    """An id outside [0, 2^31) must FAIL the query (assert_true in the
    doc-sizes frame) rather than risk a silently wrong packed key."""
    df = spark.createDataFrame(
        [(bad_id, "a b c d"), (1, "a b c d")], "doc_id long, text string"
    )
    with pytest.raises(Exception, match="2\\^31|ASSERT|assert"):
        ngram_jaccard_pairs(df, k=2, threshold=0.1).collect()


def test_stream_compute_parallelism_guard(spark):
    """ensure_stream_compute_parallelism: None disables (same plan
    object), target<=1 disables, AUTO rebalances a batch frame to
    defaultParallelism partitions — and on a STREAMING frame it stays
    streaming and preserves rows (the neardup banding stream's
    stream≡batch equality test covers the composed operator; this pins
    the guard's own contract)."""
    from etl_global_mobility_spark.operators.parallelism import (
        ensure_stream_compute_parallelism,
    )
    from etl_global_mobility_spark.streaming.ops import run_stream_to_memory

    df = spark.range(100).coalesce(1)
    assert ensure_stream_compute_parallelism(df, None) is df
    assert ensure_stream_compute_parallelism(df, 1) is df
    fanned = ensure_stream_compute_parallelism(df)
    assert (
        fanned.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )
    assert fanned.count() == 100

    sdf = spark.readStream.format("rate").option(
        "numPartitions", "1"
    ).load()
    out = ensure_stream_compute_parallelism(sdf)
    assert out.isStreaming
