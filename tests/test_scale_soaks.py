"""Round-9 scale soaks: the dedup / ANN / streaming families whose
100 TB claims rested on sf0.1 plans, exercised at 10-500x the
oracle-gate volume with MEASURED scaling ratios asserted — candidate
volume must track the duplicate STRUCTURE (planted pairs, distinct
contents, probed cells), never the corpus size squared. Wall-clock
budgets are deliberately generous (host noise is real); the sharp
assertions are the deterministic work-volume counts.

Data is synthetic-by-expression (hash-derived, no Python UDFs) so
every soak is deterministic and JVM-side.
"""

import time

import pytest
from pyspark.sql import functions as F


def _clustered_docs(spark, n_clusters, cluster_size, n_unique, words=12):
    """Docs 0..n_clusters*cluster_size-1 form identical-text clusters
    (cluster = id // cluster_size); the next n_unique docs are unique.
    Word vocabulary is keyed so clusters share ALL shingles and unique
    docs share none."""
    n_dup = n_clusters * cluster_size
    key = (
        F.when(F.col("id") < n_dup, (F.col("id") / cluster_size).cast("long"))
        .otherwise(F.col("id") + 1_000_000)
    )
    text = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.lit(words)),
            lambda i: F.concat(
                F.lit("w"), key.cast("string"), F.lit("x"), i.cast("string")
            ),
        ),
    )
    return spark.range(n_dup + n_unique).select(
        F.col("id").alias("doc_id"), text.alias("text")
    )


@pytest.mark.slow
def test_minhash_neardup_soak_candidates_track_dup_structure(spark):
    """MinHash+LSH at 50k docs: 500 planted 4-doc identical clusters in
    a sea of uniques. The banded self-join must surface EXACTLY the
    3000 within-cluster pairs (est_jaccard 1.0) — and, the measured
    scaling ratio, the candidate-pair count must be IDENTICAL when the
    unique mass quadruples: LSH candidate volume scales with duplicate
    structure, not corpus size (an all-pairs design would grow the
    count ~16x)."""
    from etl_global_mobility_spark.operators.dedup import (
        minhash_near_duplicates,
    )

    n_clusters, cluster_size = 500, 4
    expected_pairs = n_clusters * (cluster_size * (cluster_size - 1) // 2)

    counts = {}
    for n_unique in (12_000, 48_000):
        docs = _clustered_docs(spark, n_clusters, cluster_size, n_unique)
        t0 = time.time()
        # threshold 0.0 => every LSH candidate pair survives: this IS
        # the candidate volume, not the post-verify survivor count
        cands = minhash_near_duplicates(
            docs, jaccard_threshold=0.0
        ).collect()
        elapsed = time.time() - t0
        counts[n_unique] = len(cands)
        assert elapsed < 150, f"minhash soak({n_unique}) took {elapsed:.0f}s"
        exact = [r for r in cands if r.est_jaccard == 1.0]
        assert len(exact) == expected_pairs
        # identical texts => same cluster; ids of a pair differ by < size
        assert all(
            r.id_a // cluster_size == r.id_b // cluster_size for r in exact
        )
    # the measured ratio: candidate volume invariant under 4x unique mass
    # (md5 band-bucket collisions could add a stray pair; allow 1%)
    assert counts[48_000] <= counts[12_000] * 1.01 + 5, counts


@pytest.mark.slow
def test_ngram_jaccard_soak_hot_shingle_cap_bounds_fanout(spark):
    """The df-cap as dup density grows. Small corpus, measured ratio:
    2000 docs sharing one boilerplate sentence produce >= C(2000,2) ~
    2.0M candidate pairs UNCAPPED, versus exactly the 20 planted pairs
    with the cap on — a >=10^5 reduction from dropping the signal-free
    hot shingles. Large corpus: 30k boiler docs + 200 planted dup
    pairs complete inside budget ONLY because the cap prunes the hot
    keys before the self-join (uncapped would fan out ~4.5e9 join
    rows), and the planted pairs still come back jaccard-exact over
    the capped shingle universe."""
    from etl_global_mobility_spark.operators.dedup import ngram_jaccard_pairs

    boiler = " ".join(f"B{i}" for i in range(1, 13))

    def corpus(n_boiler, n_plant_pairs):
        base = spark.range(n_boiler).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit(boiler + " "),
                F.concat_ws(
                    " ",
                    F.transform(
                        F.sequence(F.lit(1), F.lit(6)),
                        lambda i: F.concat(
                            F.lit("u"),
                            F.col("id").cast("string"),
                            F.lit("x"),
                            i.cast("string"),
                        ),
                    ),
                ),
            ).alias("text"),
        )
        plants = spark.range(2 * n_plant_pairs).select(
            (F.col("id") + 1_000_000).alias("doc_id"),
            F.concat(
                F.lit(boiler + " "),
                F.concat_ws(
                    " ",
                    F.transform(
                        F.sequence(F.lit(1), F.lit(6)),
                        lambda i: F.concat(
                            F.lit("p"),
                            (F.col("id") / 2).cast("long").cast("string"),
                            F.lit("x"),
                            i.cast("string"),
                        ),
                    ),
                ),
            ).alias("text"),
        )
        return base.unionByName(plants)

    # measured ratio at small scale (uncapped is affordable at 2k docs)
    small = corpus(2_000, 10)
    uncapped = ngram_jaccard_pairs(small, threshold=0.0, df_max=None).count()
    capped = ngram_jaccard_pairs(small, threshold=0.0, df_max=100).collect()
    assert uncapped >= 1_999_000  # every boiler pair shares hot shingles
    assert len(capped) == 10
    assert uncapped / len(capped) > 100_000

    # volume run: feasible ONLY with the cap
    big = corpus(30_000, 200)
    t0 = time.time()
    out = ngram_jaccard_pairs(big, threshold=0.5, df_max=1_000).collect()
    elapsed = time.time() - t0
    assert elapsed < 150, f"ngram soak took {elapsed:.0f}s"
    got = {(r.id_a, r.id_b): r.jaccard for r in out}
    want = {
        (1_000_000 + 2 * j, 1_000_000 + 2 * j + 1) for j in range(200)
    }
    assert set(got) == want
    # planted twins are textually identical -> jaccard exactly 1.0
    # over the capped shingle universe
    assert all(v == 1.0 for v in got.values())


@pytest.mark.slow
def test_semantic_dedup_soak_output_invariant_in_cell_count(spark):
    """SemDeDup at 20k vectors (dim 64): 1000 planted exact-duplicate
    pairs. Identical vectors always land in the same cell, so the dup
    set must be EXACTLY the plants — and invariant when n_cells goes
    16 -> 64, even though the within-cell candidate volume drops ~16x
    (the knob a 100 TB run turns: cells grow with the corpus, output
    does not change for true duplicates)."""
    from etl_global_mobility_spark.operators.similarity import semantic_dedup

    n = 20_000
    # ids 2j/2j+1 (j < 1000) share a vector; everything else unique.
    # Signed hash components keep random cosines near 0 (sigma ~ 1/8),
    # so threshold 0.99 admits only true duplicates (~7.9 sigma).
    gid = F.when(F.col("id") < 2_000, (F.col("id") / 2).cast("long")).otherwise(
        F.col("id") + 1_000_000
    )
    vec = F.transform(
        F.sequence(F.lit(1), F.lit(64)),
        lambda i: ((F.hash(gid, i) % 2001) - 1000).cast("double") / 1000.0,
    )
    corpus = spark.range(n).select(
        F.col("id").alias("vec_id"), vec.alias("embedding")
    )
    want = {(2 * j + 1, 2 * j) for j in range(1_000)}
    results = {}
    for n_cells in (16, 64):
        t0 = time.time()
        rows = semantic_dedup(
            corpus, n_cells=n_cells, threshold=0.99
        ).collect()
        elapsed = time.time() - t0
        assert elapsed < 150, f"semdedup({n_cells}) took {elapsed:.0f}s"
        results[n_cells] = {(r.vec_id, r.dup_of) for r in rows}
        assert all(r.cos > 0.99 for r in rows)
    assert results[16] == want
    assert results[64] == want  # output invariant, cost ~16x lower


@pytest.mark.slow
def test_ivf_pq_recall_vs_cost_soak(spark):
    """ANN recall-vs-cost at 50k vectors (dim 32), 20 queries: IVF with
    a TRAINED quantizer probing 8/32 cells must keep recall@10 well
    above the scan-fraction it pays (~25%), the trained cells must not
    degenerate (max cell bounded vs mean — the real IVF scale risk),
    and PQ ADC with exact re-rank must reach comparable recall while
    paying table lookups instead of full-dim folds."""
    from etl_global_mobility_spark.operators.similarity import (
        cosine_topk_exact,
        ivf_topk,
        pq_topk,
        train_ivf_centroids,
        train_pq_codebook,
    )

    n, dim, n_q, k = 50_000, 32, 20, 10
    vec = F.transform(
        F.sequence(F.lit(1), F.lit(dim)),
        lambda i: ((F.hash(F.col("id"), i) % 2001) - 1000).cast("double")
        / 1000.0,
    )
    corpus = spark.range(n).select(
        F.col("id").alias("vec_id"), vec.alias("embedding")
    )
    queries = corpus.filter(F.col("vec_id") < n_q)

    exact = {
        (r.q_id, r.c_id)
        for r in cosine_topk_exact(corpus, queries, k=k).collect()
    }
    assert len(exact) == n_q * k

    t0 = time.time()
    cents = train_ivf_centroids(corpus, n_cells=32, n_iters=2)
    ivf = {
        (r.q_id, r.c_id)
        for r in ivf_topk(
            corpus, queries, n_cells=32, nprobe=8, k=k, centroids=cents
        ).collect()
    }
    ivf_elapsed = time.time() - t0
    ivf_recall = len(ivf & exact) / len(exact)
    # observed 1.00 on this deterministic corpus; the floor leaves room
    # for training's float partial-sum order shifting cell boundaries
    assert ivf_recall >= 0.80, f"IVF recall@10 {ivf_recall:.2f}"
    assert ivf_elapsed < 180, f"IVF train+search took {ivf_elapsed:.0f}s"

    # quantizer balance: a degenerate all-in-one-cell training run is
    # what turns nprobe/n_cells into a lie at scale
    from etl_global_mobility_spark.operators.similarity import (
        _centroid_scores,
        _resolve_centroids,
    )

    cents_r, norms = _resolve_centroids(
        corpus, 32, "vec_id", "embedding", cents
    )
    assigned = corpus.withColumn(
        "nv",
        F.aggregate(
            F.zip_with(
                "embedding", "embedding", lambda a, b: a * b
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    ).select(
        (
            -F.array_max(
                _centroid_scores(cents_r, norms, "embedding", "nv")
            ).getField("neg_id")
        ).alias("cell")
    )
    sizes = [r.n for r in assigned.groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()]
    assert max(sizes) <= 5 * (n / 32), f"degenerate IVF cell: {max(sizes)}"

    t0 = time.time()
    book = train_pq_codebook(corpus, dim=dim, m=8, k=16, n_iters=1)
    pq = {
        (r.q_id, r.c_id)
        for r in pq_topk(
            corpus, queries, book, k=k, rerank=500
        ).collect()
    }
    pq_elapsed = time.time() - t0
    pq_recall = len(pq & exact) / len(exact)
    # uniform random data is PQ's WORST case (no subspace structure for
    # the codebook to exploit — the literature's clustered-data recall
    # does not transfer): measured 0.60 at m=8/rerank=500, and raising
    # rerank to 1000 only buys 0.61, so the shortlist is not the
    # bottleneck — the floor is a regression tripwire, not a quality
    # claim; the 1%-of-corpus rerank cost bound is the scale claim
    assert pq_recall >= 0.45, f"PQ recall@10 {pq_recall:.2f}"
    assert pq_elapsed < 180, f"PQ train+search took {pq_elapsed:.0f}s"


@pytest.mark.slow
def test_stream_neardup_state_tracks_distinct_content_not_rows(spark, tmp_path):
    """Streaming near-dup ownership state growth: 400 distinct contents
    duplicated 5x (2k rows) versus 50x (20k rows) across multi-file
    micro-batch streams. The drained state must be IDENTICAL — rows
    (band, bucket, owner) — because MIN-id-per-bucket state grows with
    DISTINCT content, never with duplicate volume (the honest cost of
    remembering what's been seen)."""
    from etl_global_mobility_spark.streaming.ops import (
        neardup_bucket_owners_stream,
        run_stream_to_memory,
    )

    n_contents = 400

    def docs(dup_factor):
        # content c, replica r -> id c*1000 + r: min id per content is
        # c*1000 under EVERY dup factor, so owners must match exactly
        return (
            spark.range(n_contents * dup_factor)
            .select(
                (
                    (F.col("id") / dup_factor).cast("long") * 1000
                    + F.col("id") % dup_factor
                ).alias("doc_id"),
                F.concat_ws(
                    " ",
                    F.transform(
                        F.sequence(F.lit(1), F.lit(12)),
                        lambda i: F.concat(
                            F.lit("c"),
                            (F.col("id") / dup_factor).cast("long").cast(
                                "string"
                            ),
                            F.lit("x"),
                            i.cast("string"),
                        ),
                    ),
                ).alias("text"),
            )
        )

    states = {}
    for dup_factor in (5, 50):
        land = str(tmp_path / f"docs_{dup_factor}")
        docs(dup_factor).repartition(4).write.parquet(land)
        batch = spark.read.parquet(land)
        sdf = (
            spark.readStream.schema(batch.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(land)
        )
        t0 = time.time()
        states[dup_factor] = {
            (r.band, r.bucket, r.owner_id)
            for r in run_stream_to_memory(
                neardup_bucket_owners_stream(sdf), "complete"
            ).collect()
        }
        elapsed = time.time() - t0
        assert elapsed < 150, f"stream soak({dup_factor}) took {elapsed:.0f}s"
    assert states[5] == states[50]
    # state size = bands x distinct contents (minus any md5 bucket
    # collisions — none expected at this size)
    assert len(states[50]) == 4 * n_contents


@pytest.mark.slow
def test_incremental_neardup_soak_shard_cost_not_corpus_cost(
    spark, tmp_path
):
    """The daily-ingest shape at volume: a 2k-doc shard probed against
    PERSISTED band indexes of 12.5k and 50k unique docs. All 500
    planted shard-vs-corpus near-dups come back exactly under BOTH
    index sizes — and the candidate volume (threshold 0) is IDENTICAL:
    the shard meets only its planted partners, so quadrupling the
    indexed corpus adds nothing to the shard's work beyond the
    map-only index scan (the measured basis of the 'cost ∝ shard, not
    corpus' claim)."""
    from etl_global_mobility_spark.operators.dedup import (
        incremental_minhash_neardup,
        minhash_band_index,
    )

    n_plants, n_shard = 500, 2_000

    def shard():
        # first 500 shard docs duplicate corpus docs 0..499 (identical
        # text by cluster-key construction: key = id for uniques, so
        # copy the key expression); rest are unique in a high namespace
        dup = spark.range(n_plants).select(
            (F.col("id") + 1_000_000).alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(1), F.lit(12)),
                    lambda i: F.concat(
                        F.lit("w"),
                        (F.col("id") + 1_000_000).cast("string"),
                        F.lit("x"),
                        i.cast("string"),
                    ),
                ),
            ).alias("text"),
        )
        fresh = spark.range(n_shard - n_plants).select(
            (F.col("id") + 5_000_000).alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(1), F.lit(12)),
                    lambda i: F.concat(
                        F.lit("w"),
                        (F.col("id") + 5_000_000).cast("string"),
                        F.lit("x"),
                        i.cast("string"),
                    ),
                ),
            ).alias("text"),
        )
        return dup.unionByName(fresh)

    # plant: corpus doc i (i < 500) must share text with shard doc
    # 1_000_000 + i — uniques build text from key id + 1_000_000 in
    # _clustered_docs, so rebuild the corpus with that same namespace
    def corpus_ns(n):
        text = F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(12)),
                lambda i: F.concat(
                    F.lit("w"),
                    (F.col("id") + 1_000_000).cast("string"),
                    F.lit("x"),
                    i.cast("string"),
                ),
            ),
        )
        return spark.range(n).select(F.col("id").alias("doc_id"), text.alias("text"))

    results = {}
    for n_corpus in (12_500, 50_000):
        land = str(tmp_path / f"index_{n_corpus}")
        minhash_band_index(corpus_ns(n_corpus)).write.parquet(land)
        index = spark.read.parquet(land)
        t0 = time.time()
        cands = incremental_minhash_neardup(
            index, shard(), jaccard_threshold=0.0
        ).collect()
        elapsed = time.time() - t0
        assert elapsed < 150, f"incremental soak({n_corpus}) took {elapsed:.0f}s"
        exact = {
            (r.id_a, r.id_b) for r in cands if r.est_jaccard == 1.0
        }
        assert exact == {(i, 1_000_000 + i) for i in range(n_plants)}
        results[n_corpus] = len(cands)
    # the measured ratio: candidate volume invariant under a 4x corpus
    assert results[50_000] <= results[12_500] * 1.01 + 5, results


@pytest.mark.slow
def test_dedup_components_deep_chain_soak(spark, monkeypatch):
    """Pointer-jumping convergence: a 5000-deep duplicate CHAIN (graph
    diameter 4999) plus 500 star clusters. Plain hash-min needs
    diameter rounds and would abort at the max_iters=20 cap; the
    label-shortcut halves chain depth per round, so the whole graph
    resolves in O(log diameter) rounds — every chain node labels to
    component 0, every star to its hub, inside the runtime budget.
    The DISTRIBUTED rounds are pinned via the threshold (round 14):
    the graph is under SINGLE_TASK_MAX_EDGES, and the union-find fast
    path that would otherwise take it is chain-depth-insensitive by
    construction — this soak exists to cover the at-scale path."""
    import etl_global_mobility_spark.operators.dedup as dedup_mod

    from etl_global_mobility_spark.operators.dedup import dedup_components

    monkeypatch.setattr(dedup_mod, "SINGLE_TASK_MAX_EDGES", 0)

    chain_n = 5_000
    chain = spark.range(chain_n - 1).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    # 500 disjoint 5-node stars in a high id namespace
    stars = spark.range(500 * 4).select(
        ((F.col("id") / 4).cast("long") * 10 + 1_000_000).alias("id_a"),
        (
            (F.col("id") / 4).cast("long") * 10
            + 1_000_000
            + (F.col("id") % 4)
            + 1
        ).alias("id_b"),
    )
    t0 = time.time()
    labels = {
        r.id: r.component
        for r in dedup_components(chain.unionByName(stars)).collect()
    }
    elapsed = time.time() - t0
    assert elapsed < 150, f"components soak took {elapsed:.0f}s"
    assert all(labels[i] == 0 for i in range(chain_n))
    for hub in range(1_000_000, 1_000_000 + 500 * 10, 10):
        for spoke in range(1, 5):
            assert labels[hub + spoke] == hub
    assert len(labels) == chain_n + 500 * 5


def test_parallelism_guard_targets_cluster_scale_not_local_cores(spark):
    """The r8 parallelism guard's repartition target must scale past
    the 32 local cores: AUTO follows max(defaultParallelism,
    spark.sql.shuffle.partitions) — on a 1000-executor cluster that is
    the thousands-wide shuffle width, not a hardcoded 32 — and
    explicit targets are honored verbatim (REPARTITION_BY_NUM, which
    AQE never coalesces)."""
    from etl_global_mobility_spark.operators.parallelism import (
        ensure_compute_parallelism,
        ensure_grouped_compute_parallelism,
    )

    df = spark.range(1_000).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    )
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "256")
        fanned = ensure_grouped_compute_parallelism(df, ["k"])
        assert fanned.rdd.getNumPartitions() == 256
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert (
        ensure_compute_parallelism(df, 256).rdd.getNumPartitions() == 256
    )
    assert (
        ensure_grouped_compute_parallelism(df, ["k"], 512)
        .rdd.getNumPartitions()
        == 512
    )
    # and the row guard stays a no-op when the input is already wide
    wide = df.repartition(300)
    assert (
        ensure_compute_parallelism(wide, 256).rdd.getNumPartitions() == 300
    )


@pytest.mark.slow
def test_label_propagation_soak_recovers_planted_communities(spark):
    """Round-10 soak: majority label propagation at ~45k edges — two
    planted 150-cliques joined by ONE bridge edge must resolve to
    exactly two uniform communities in 3 synchronous rounds (connected
    components would merge them — the density-splitting claim at
    volume), and the label frame stays node-sized: per-round work is
    |edges| join rows + |nodes| aggregate rows, never quadratic.
    Budget generous (host noise); the sharp assertion is the label
    structure."""
    from etl_global_mobility_spark.operators.graph import label_propagation

    n = 150  # per clique -> 2 * C(150,2) = 22,350 directed pairs
    base = spark.range(n).select(F.col("id").alias("a"))
    clique = (
        base.crossJoin(spark.range(n).select(F.col("id").alias("b")))
        .filter(F.col("a") < F.col("b"))
    )
    edges = (
        clique.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(
            clique.select(
                (F.col("a") + 1000).alias("src"), (F.col("b") + 1000).alias("dst")
            )
        )
        # one bridge between the cliques
        .unionByName(
            spark.range(1).select(
                F.lit(149).alias("src"), F.lit(1000).alias("dst")
            )
        )
    )
    t0 = time.time()
    got = {r.node: r.label for r in label_propagation(edges, n_iters=3).collect()}
    wall = time.time() - t0
    assert len(got) == 2 * n
    labels_a = {got[i] for i in range(n)}
    labels_b = {got[i + 1000] for i in range(n)}
    assert labels_a == {0}, f"clique A not uniform: {labels_a}"
    assert labels_b == {1000}, f"clique B not uniform: {labels_b}"
    assert wall < 120, f"LP soak exceeded budget: {wall:.1f}s"


@pytest.mark.slow
def test_ivf_incremental_soak_shard_probes_persisted_quantizer(spark, tmp_path):
    """The ANN daily-ingest shape at volume: a 1k-vector shard probed
    against 10k and 40k corpora through a quantizer artifact that is
    trained/persisted ONCE per corpus snapshot (save→load→probe, the
    llm_ivf_incremental loop). Every shard vector has an IDENTICAL
    planted twin in the corpus; identical vectors land in the same
    Voronoi cell, so even nprobe=1 must return the twin at rank 1
    (cos=1.0 is the max) — at BOTH corpus sizes, proving the probe's
    recall doesn't decay as the indexed corpus grows 4x while the
    shard-side work stays shard-shaped (broadcast probe rows into
    cells; the corpus side is one map-only assignment scan)."""
    import time

    from etl_global_mobility_spark.operators.similarity import (
        ivf_topk,
        load_ann_artifacts,
        save_ann_artifacts,
    )

    n_shard, dim = 1_000, 16

    def vec(id_col):
        # deterministic, id-unique direction: components spread over
        # two coprime moduli so no two ids are colinear
        return F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda d: (
                ((id_col * 7 + d * 13) % 101 + 1).cast("double")
                + ((id_col * 31 + d * 3) % 53).cast("double") / 100.0
            ),
        )

    def corpus(n):
        return spark.range(n).select(
            F.col("id").alias("vec_id"), vec(F.col("id")).alias("embedding")
        )

    # shard ids live in a high namespace; shard vector i twins corpus
    # vector i (same direction => same cell, cosine exactly 1.0)
    shard = spark.range(n_shard).select(
        (F.col("id") + 10_000_000).alias("vec_id"),
        vec(F.col("id")).alias("embedding"),
    )

    for n_corpus in (10_000, 40_000):
        cents = [
            [float(x) for x in r[1]]
            for r in corpus(n_corpus).orderBy("vec_id").limit(16).collect()
        ]
        path = str(tmp_path / f"ivf_art_{n_corpus}")
        save_ann_artifacts(spark, path, centroids=cents)
        loaded, _ = load_ann_artifacts(spark, path)
        t0 = time.time()
        top1 = {
            r.q_id: r.c_id
            for r in ivf_topk(
                corpus(n_corpus), shard, n_cells=16, nprobe=1, k=1,
                centroids=loaded,
            ).collect()
        }
        elapsed = time.time() - t0
        assert elapsed < 150, f"ivf soak({n_corpus}) took {elapsed:.0f}s"
        missed = {
            q for q, c in top1.items() if c != q - 10_000_000
        }
        assert not missed and len(top1) == n_shard, (
            f"corpus={n_corpus}: {len(missed)} shard vectors missed "
            f"their planted twin (found {len(top1)}/{n_shard})"
        )


@pytest.mark.slow
def test_maximal_shared_substrings_soak_cost_tracks_duplication(spark):
    """The variable-length substring operator's 100 TB claim: anchor
    self-join fan-out is sum(df^2) over DUPLICATED anchors only —
    unique text contributes zero join rows, so the candidate set (and
    the output) must be INVARIANT in corpus size while only planted
    duplication drives it. Also exercises the island fold on a deep
    run: a 500-token shared passage must come back as ONE span of
    exactly 500 (a 481-anchor consecutive run), not fragments."""
    from etl_global_mobility_spark.operators.dedup import (
        maximal_shared_substrings,
    )

    def corpus(n_unique):
        # unique filler docs: 40 tokens each, vocabulary keyed by id so
        # no 20-gram ever repeats across docs
        uniq = spark.range(n_unique).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(1), F.lit(40)),
                    lambda i: F.concat(
                        F.lit("u"),
                        F.col("id").cast("string"),
                        F.lit("x"),
                        i.cast("string"),
                    ),
                ),
            ).alias("text"),
        )
        # 8 planted pairs sharing a 60-token passage (pair = id // 2)
        plants = spark.range(16).select(
            (F.col("id") + 2_000_000).alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(1), F.lit(60)),
                    lambda i: F.concat(
                        F.lit("p"),
                        F.floor(F.col("id") / 2).cast("string"),
                        F.lit("x"),
                        i.cast("string"),
                    ),
                ),
            ).alias("text"),
        )
        # one deep pair sharing a 500-token passage
        deep = spark.range(2).select(
            (F.col("id") + 3_000_000).alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(1), F.lit(500)),
                    lambda i: F.concat(F.lit("d"), i.cast("string")),
                ),
            ).alias("text"),
        )
        return uniq.unionByName(plants).unionByName(deep)

    def run(n_unique):
        t0 = time.time()
        rows = sorted(
            map(tuple, maximal_shared_substrings(corpus(n_unique), min_len=20).collect())
        )
        return rows, time.time() - t0

    small_rows, small_s = run(3_000)
    big_rows, big_s = run(30_000)
    # output invariant in corpus size: only the planted structure shows
    assert big_rows == small_rows
    assert len(big_rows) == 9  # 8 planted pairs + 1 deep pair
    by_pair = {(a, b): (n, mx, tot) for a, b, n, mx, tot in big_rows}
    assert by_pair[(3_000_000, 3_000_001)] == (1, 500, 500)
    assert all(
        by_pair[(2_000_000 + 2 * p, 2_000_001 + 2 * p)] == (1, 60, 60)
        for p in range(8)
    )
    # 10x the unique corpus must not cost anywhere near 10x^2; generous
    # budget, sharp structure above
    assert big_s < max(12.0, 25 * small_s), (small_s, big_s)


@pytest.mark.slow
def test_maximal_shared_substrings_anchor_cap_bounds_spam_fanout(spark):
    """The adversarial case the operator's docstring prices: a
    single-token-spam document makes ONE anchor with occurrence count
    ~doc_len, and the anchor self-join fan-out is sum(df^2) — a
    5k-token one-word document alone is ~25M join rows, and every
    diagonal's position array lands in one island fold. The
    ``max_anchor_occ`` guard must drop hot anchors BEFORE the
    self-join so that cost never materializes.

    Two assertions: (1) semantics — on a small corpus where the
    uncapped run is affordable, capped suppresses the spam-pair span
    wholesale while keeping the genuine planted pair, and uncapped
    (the control) proves the spam span WAS there to suppress;
    (2) scale — with a 5,000-token spam doc planted in an 8,000-doc
    corpus, the capped run completes inside a budget the 25M-row
    fan-out could not touch, with the planted structure intact."""
    from etl_global_mobility_spark.operators.dedup import (
        maximal_shared_substrings,
    )

    def spam_doc(doc_id, n_tokens):
        return spark.range(1).select(
            F.lit(doc_id).cast("long").alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(1), F.lit(n_tokens)),
                    lambda _i: F.lit("spam"),
                ),
            ).alias("text"),
        )

    def planted_pair(base):
        return spark.range(2).select(
            (F.col("id") + base).alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(1), F.lit(60)),
                    lambda i: F.concat(F.lit("g"), i.cast("string")),
                ),
            ).alias("text"),
        )

    def filler(n):
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(1), F.lit(40)),
                    lambda i: F.concat(
                        F.lit("u"),
                        F.col("id").cast("string"),
                        F.lit("x"),
                        i.cast("string"),
                    ),
                ),
            ).alias("text"),
        )

    # (1) semantics at affordable scale: two 400-token spam docs
    # (uncapped cross-doc fan-out ~145k rows — fine as a control)
    small = (
        filler(500)
        .unionByName(spam_doc(7_000_000, 400))
        .unionByName(spam_doc(7_000_001, 400))
        .unionByName(planted_pair(8_000_000))
    )
    uncapped = {
        (a, b): (n, mx, tot)
        for a, b, n, mx, tot in maximal_shared_substrings(
            small, min_len=20
        ).collect()
    }
    # the control: spam pair IS a (degenerate) maximal-substring hit
    assert (7_000_000, 7_000_001) in uncapped
    assert uncapped[(8_000_000, 8_000_001)] == (1, 60, 60)
    capped = {
        (a, b): (n, mx, tot)
        for a, b, n, mx, tot in maximal_shared_substrings(
            small, min_len=20, max_anchor_occ=64
        ).collect()
    }
    # capped: boilerplate-only pair suppressed wholesale, genuine kept
    assert (7_000_000, 7_000_001) not in capped
    assert capped[(8_000_000, 8_000_001)] == (1, 60, 60)

    # (2) scale: one 5,000-token spam doc (the docstring's ~25M-row
    # case) in an 8,000-doc corpus; capped must stay cheap and exact
    big = (
        filler(8_000)
        .unionByName(spam_doc(7_000_000, 5_000))
        .unionByName(spam_doc(7_000_001, 5_000))
        .unionByName(planted_pair(8_000_000))
    )
    t0 = time.time()
    rows = {
        (a, b): (n, mx, tot)
        for a, b, n, mx, tot in maximal_shared_substrings(
            big, min_len=20, max_anchor_occ=64
        ).collect()
    }
    capped_s = time.time() - t0
    assert (7_000_000, 7_000_001) not in rows
    assert rows[(8_000_000, 8_000_001)] == (1, 60, 60)
    assert len(rows) == 1
    # generous wall budget; the uncapped 50M-element fold cannot meet it
    assert capped_s < 60.0, capped_s
