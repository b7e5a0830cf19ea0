"""Property tests for §2C operators (SURVEY §5: planted-duplicate
recall for near-dup dedup, ANN recall@k vs exact, multimodal plumbing,
streaming replay determinism)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from etl_global_mobility_spark.operators.dedup import (
    dedup_components,
    exact_dedup,
    minhash_near_duplicates,
    ngram_jaccard_pairs,
    simhash_fingerprint,
)
from etl_global_mobility_spark.operators.similarity import (
    cosine_topk_exact,
    ivf_topk,
    lsh_ann_candidates,
)

VOCAB = (
    "data spark batch stream query table row column join filter sort hash "
    "merge window agg value key part line customer order small big fast slow"
).split()


def _mk_docs(spark, n=60, words=80, n_dups=8, seed=11):
    """Corpus with planted near-duplicates: dup docs differ from their
    source in ~5% of tokens."""
    rng = random.Random(seed)
    rows, planted = [], []
    for i in range(n):
        toks = [rng.choice(VOCAB) for _ in range(words)]
        rows.append((i, " ".join(toks)))
    for j in range(n_dups):
        src_id, src_text = rows[j]
        toks = src_text.split()
        for _ in range(max(1, words // 20)):
            toks[rng.randrange(words)] = rng.choice(VOCAB)
        dup_id = n + j
        rows.append((dup_id, " ".join(toks)))
        planted.append((src_id, dup_id))
    return spark.createDataFrame(rows, "doc_id long, text string"), planted


def test_exact_dedup_keeps_lowest_id(spark):
    df = spark.createDataFrame(
        [(1, "aaa"), (5, "aaa"), (3, "bbb"), (9, "aaa")], "doc_id long, text string"
    )
    out = exact_dedup(df).select("doc_id", "n_copies").collect()
    got = {(r.doc_id, r.n_copies) for r in out}
    assert got == {(1, 3), (3, 1)}


def test_minhash_recall_on_planted_duplicates(spark):
    docs, planted = _mk_docs(spark)
    pairs = minhash_near_duplicates(docs, jaccard_threshold=0.3)
    found = {(r.id_a, r.id_b) for r in pairs.collect()}
    recall = sum(1 for p in planted if p in found) / len(planted)
    assert recall >= 0.75, f"planted-dup recall {recall}: found {found}"


def test_minhash_verified_exact_jaccard_on_candidates(spark):
    """Stage-2 verification contract: the returned pairs are EXACTLY
    the banding candidates whose true shingle-set Jaccard clears the
    threshold (computed independently in Python), with the exact value
    attached — est_jaccard noise neither admits nor evicts a pair."""
    import re

    from etl_global_mobility_spark.operators.dedup import (
        minhash_near_duplicates,
        minhash_verified_pairs,
    )

    docs, _ = _mk_docs(spark)
    thr = 0.5

    def shingles(text, k=3):
        toks = [t for t in re.split(r"\s+", text.lower().strip()) if t]
        return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}

    texts = {r.doc_id: r.text for r in docs.collect()}
    cands = {
        (r.id_a, r.id_b)
        for r in minhash_near_duplicates(docs, jaccard_threshold=0.0).collect()
    }

    def jac(a, b):
        sa, sb = shingles(texts[a]), shingles(texts[b])
        u = len(sa | sb)
        return len(sa & sb) / u if u else 0.0

    expected = {p: jac(*p) for p in cands if jac(*p) >= thr}
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_verified_pairs(docs, jaccard_threshold=thr).collect()
    }
    assert set(got) == set(expected) and expected
    for p, j in got.items():
        assert abs(j - expected[p]) < 1e-12, (p, j, expected[p])
    # the estimate must disagree with the exact value somewhere —
    # otherwise this test isn't exercising the verification stage
    est = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in minhash_verified_pairs(docs, jaccard_threshold=thr).collect()
    }
    assert any(abs(est[p] - got[p]) > 1e-9 for p in got)


def test_incremental_neardup_equals_full_recompute(spark, tmp_path):
    """The maintenance contract: dedup of a new shard against a
    persisted band index must emit EXACTLY the pairs a full recompute
    over (corpus ∪ shard) emits that involve a shard document —
    new-vs-corpus and new-vs-new, nothing more, nothing less."""
    from pyspark.sql import functions as F

    from etl_global_mobility_spark.operators.dedup import (
        incremental_minhash_neardup,
        minhash_band_index,
    )

    docs, _ = _mk_docs(spark)
    existing = docs.filter(F.col("doc_id") % 4 != 0)
    shard = docs.filter(F.col("doc_id") % 4 == 0)

    idx_path = str(tmp_path / "bandindex")
    minhash_band_index(existing).write.parquet(idx_path)
    index = spark.read.parquet(idx_path)

    inc = {
        (r.id_a, r.id_b, r.est_jaccard)
        for r in incremental_minhash_neardup(
            index, shard, jaccard_threshold=0.3
        ).collect()
    }
    full = {
        (r.id_a, r.id_b, r.est_jaccard)
        for r in minhash_near_duplicates(docs, jaccard_threshold=0.3).collect()
        if r.id_a % 4 == 0 or r.id_b % 4 == 0
    }
    assert inc == full and inc  # identical, and non-trivially so


def test_incremental_neardup_two_shard_maintenance_loop(spark, tmp_path):
    """The full daily-ingest loop over TWO days: dedup shard 1 against
    the day-0 index, APPEND shard 1's band rows to the index table,
    dedup shard 2 against the grown index. The union of the three
    result sets (day-0 batch pairs + two incremental deltas) must
    equal one full batch recompute over everything — the invariant
    that makes the incremental path trustworthy indefinitely."""
    from pyspark.sql import functions as F

    from etl_global_mobility_spark.operators.dedup import (
        incremental_minhash_neardup,
        minhash_band_index,
    )

    docs, _ = _mk_docs(spark)
    day0 = docs.filter(F.col("doc_id") % 3 == 0)
    shard1 = docs.filter(F.col("doc_id") % 3 == 1)
    shard2 = docs.filter(F.col("doc_id") % 3 == 2)

    idx_path = str(tmp_path / "bandindex")
    minhash_band_index(day0).write.parquet(idx_path)

    pairs = {
        (r.id_a, r.id_b)
        for r in minhash_near_duplicates(day0, jaccard_threshold=0.3).collect()
    }
    for shard in (shard1, shard2):
        index = spark.read.parquet(idx_path)
        delta = incremental_minhash_neardup(index, shard, jaccard_threshold=0.3)
        pairs |= {(r.id_a, r.id_b) for r in delta.collect()}
        # close the loop: the shard's band rows join the index
        minhash_band_index(shard).write.mode("append").parquet(idx_path)

    full = {
        (r.id_a, r.id_b)
        for r in minhash_near_duplicates(docs, jaccard_threshold=0.3).collect()
    }
    assert pairs == full and full


def test_ngram_jaccard_finds_planted_duplicates(spark):
    docs, planted = _mk_docs(spark)
    pairs = ngram_jaccard_pairs(docs, k=3, threshold=0.5)
    found = {(r.id_a, r.id_b) for r in pairs.collect()}
    recall = sum(1 for p in planted if p in found) / len(planted)
    assert recall >= 0.9, f"exact-jaccard recall {recall}"


def test_hash_split_is_stable_and_partition_invariant(spark):
    """The same id must get the same split regardless of partition
    layout (randomSplit fails this), and fractions must roughly hold."""
    from etl_global_mobility_spark.operators.splits import hash_split

    df = spark.range(2000).select(F.col("id").alias("doc_id"))
    a = {r.doc_id: r.split for r in hash_split(df).collect()}
    b = {
        r.doc_id: r.split
        for r in hash_split(df.repartition(17, "doc_id")).collect()
    }
    assert a == b
    from collections import Counter

    c = Counter(a.values())
    assert 0.75 <= c["train"] / 2000 <= 0.85
    assert 0.05 <= c["valid"] / 2000 <= 0.15
    assert 0.05 <= c["test"] / 2000 <= 0.15

    with __import__("pytest").raises(ValueError):
        from etl_global_mobility_spark.operators.splits import split_column

        split_column("doc_id", (("a", 50), ("b", 40)))


def test_dedup_components_labels_clusters_with_min_id(spark):
    """Chain 1-2-3 and pair 10-11 → two components labeled by min id;
    a transitive chain needs >1 propagation round (diameter 2)."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    got = {(r.id, r.component) for r in dedup_components(pairs).collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}


def test_dedup_components_raises_when_not_converged(spark, monkeypatch):
    """The max_iters cap must raise rather than return wrong clusters.
    Only the DISTRIBUTED rounds iterate (the single-task union-find
    fast path always converges), so pin that path via the threshold."""
    import pytest

    import etl_global_mobility_spark.operators.dedup as dedup_mod

    monkeypatch.setattr(dedup_mod, "SINGLE_TASK_MAX_EDGES", 0)
    pairs = spark.createDataFrame([(i, i + 1) for i in range(8)], "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="converge"):
        dedup_components(pairs, max_iters=1)  # chain of 9 has diameter 8


def test_ngram_jaccard_df_cap_is_lossless_below_threshold(spark):
    """With no shingle over the cap, df_max must not change results."""
    docs, _ = _mk_docs(spark)
    uncapped = {
        (r.id_a, r.id_b, round(r.jaccard, 9))
        for r in ngram_jaccard_pairs(docs, k=3, threshold=0.5, df_max=None).collect()
    }
    capped = {
        (r.id_a, r.id_b, round(r.jaccard, 9))
        for r in ngram_jaccard_pairs(docs, k=3, threshold=0.5, df_max=10_000).collect()
    }
    assert capped == uncapped


def test_ngram_jaccard_df_cap_drops_hot_shingles(spark):
    """A shingle shared by every doc must not create pairs once its
    document frequency exceeds the cap (the 100 TB skew guard)."""
    hot = "the quick fox"
    rows = [(i, f"{hot} unique{i} token{i} word{i}") for i in range(12)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = ngram_jaccard_pairs(docs, k=3, threshold=0.01, df_max=5)
    assert pairs.count() == 0  # only the hot shingle was shared


def test_simhash_near_dups_have_small_hamming_distance(spark):
    docs, planted = _mk_docs(spark)
    fp = {r.id: r.simhash for r in simhash_fingerprint(docs).collect()}
    rng = random.Random(3)
    ids = sorted(fp)

    def ham(a, b):
        return bin(fp[a] ^ fp[b]).count("1")

    dup_d = [ham(a, b) for a, b in planted]
    rand_d = [ham(rng.choice(ids), rng.choice(ids)) for _ in range(50)]
    assert max(dup_d) <= 8, f"planted dup hamming distances {dup_d}"
    assert sum(rand_d) / len(rand_d) > max(dup_d), "random pairs not separated"


def test_ann_recall_vs_exact(spark):
    rng = random.Random(5)
    rows = [
        (i, [rng.gauss(0, 1) for _ in range(16)], 0) for i in range(200)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    queries = emb.filter(F.col("vec_id") < 10)
    exact = cosine_topk_exact(emb, queries, k=5)
    single = lsh_ann_candidates(emb, queries, dim=16, n_planes=3, k=5, n_tables=1)
    multi = lsh_ann_candidates(emb, queries, dim=16, n_planes=3, k=5, n_tables=4)
    e = {(r.q_id, r.c_id) for r in exact.collect()}
    r1 = len(e & {(r.q_id, r.c_id) for r in single.collect()}) / len(e)
    recall = len(e & {(r.q_id, r.c_id) for r in multi.collect()}) / len(e)
    # OR-construction across 4 tables must amplify single-table recall
    assert recall >= 0.6, f"multi-table ANN recall@5 {recall} (single {r1})"
    assert recall >= r1
    ann = multi
    # every ANN hit must be a genuine bucket-mate ranked correctly:
    # rank within each q_id strictly increasing from 1
    for q in {r.q_id for r in ann.collect()}:
        ranks = sorted(r.rank for r in ann.collect() if r.q_id == q)
        assert ranks == list(range(1, len(ranks) + 1))


def test_ivf_recall_improves_with_nprobe(spark):
    rng = random.Random(7)
    rows = [(i, [rng.gauss(0, 1) for _ in range(16)], 0) for i in range(200)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = cosine_topk_exact(emb, queries, k=5)
    e = {(r.q_id, r.c_id) for r in exact.collect()}

    def recall(nprobe):
        got = ivf_topk(emb, queries, n_cells=8, nprobe=nprobe, k=5)
        return len(e & {(r.q_id, r.c_id) for r in got.collect()}) / len(e)

    r2, r8 = recall(2), recall(8)
    # probing every cell IS the exact search; more probes → more recall
    assert r8 == 1.0, f"full-probe recall {r8}"
    assert r2 <= r8
    assert r2 >= 0.3, f"nprobe=2 recall {r2}"


def test_kmeans_trainer_recovers_planted_clusters(spark):
    """4 well-separated direction clusters → each true direction must
    have a trained centroid at cosine ≥ 0.9, and a trained quantizer
    must beat the degenerate lowest-id quantizer at nprobe=1."""
    from etl_global_mobility_spark.operators.similarity import train_ivf_centroids

    rng = random.Random(13)
    axes = [
        [10.0 if d == a else 0.0 for d in range(8)] for a in range(4)
    ]  # 4 orthogonal directions
    rows = []
    for i in range(160):
        base = axes[i % 4]
        rows.append((i, [x + rng.gauss(0, 0.5) for x in base], i % 4))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")

    cents = train_ivf_centroids(emb, n_cells=4, n_iters=4)

    def cos(a, b):
        dp = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(x * x for x in b) ** 0.5
        return dp / (na * nb)

    for axis in axes:
        best = max(cos(axis, c) for c in cents)
        assert best >= 0.9, f"no trained centroid near axis {axis}: {best}"

    queries = emb.filter(F.col("vec_id") < 8)
    e = {(r.q_id, r.c_id) for r in cosine_topk_exact(emb, queries, k=5).collect()}

    def recall(centroids):
        got = ivf_topk(emb, queries, n_cells=4, nprobe=1, k=5, centroids=centroids)
        return len(e & {(r.q_id, r.c_id) for r in got.collect()}) / len(e)

    r_trained = recall(cents)
    r_default = recall(None)
    assert r_trained >= 0.9, f"trained-quantizer recall@5 {r_trained}"
    assert r_trained >= r_default, (r_trained, r_default)


def test_multimodal_feature_plumbing(spark):
    from etl_global_mobility_spark.operators.multimodal import (
        attach_media_metadata,
        documents_as_media,
        extract_features,
    )

    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "")], "doc_id long, text string"
    )
    media = attach_media_metadata(documents_as_media(docs), mime="text/plain")
    meta = {r.media_id: r.meta for r in media.collect()}
    assert meta[1].n_bytes == 11 and meta[1].mime == "text/plain"
    feats = extract_features(media, dim=8).collect()
    by_id = {r.media_id: r for r in feats}
    assert len(by_id[1].feature) == 8
    assert abs(sum(by_id[1].feature) - 1.0) < 1e-6  # histogram normalized
    assert by_id[2].n_bytes == 0

    try:
        import PIL  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False
    if not has_pil:
        # honest stub: the real path must refuse, not silently fake
        with pytest.raises(NotImplementedError):
            extract_features(media, decode_stub=False)


def test_multimodal_real_decode_when_pillow_present(spark):
    """Feature-detected real path: with Pillow installed, raw image
    bytes decode into a normalized pixel feature and undecodable bytes
    yield NULL (never a job failure). Skipped when the env ships no
    media libraries — the stub path above stays the tested default."""
    Image = pytest.importorskip(
        "PIL.Image",
        reason="Pillow not installed and not installable here: "
        "`pip install --dry-run Pillow` was attempted in-session "
        "(round 5, re-attested rounds 7-13 and 14) and failed with 'No matching distribution found' / NewConnectionError '[Errno -2] Name "
        "or service not known' resolving the package index — the build "
        "env has no network route (and prohibits pip/apt regardless)",
    )
    import io

    from etl_global_mobility_spark.operators.multimodal import extract_features

    buf = io.BytesIO()
    Image.new("L", (4, 4), color=128).save(buf, format="PNG")
    rows = [(1, bytearray(buf.getvalue())), (2, bytearray(b"not an image"))]
    media = spark.createDataFrame(rows, "media_id long, content binary")
    by_id = {
        r.media_id: r for r in extract_features(media, dim=4, decode_stub=False).collect()
    }
    assert by_id[1].feature is not None and len(by_id[1].feature) == 4
    assert all(abs(v - 128 / 255.0) < 1e-6 for v in by_id[1].feature)
    assert by_id[2].feature is None  # undecodable -> NULL, job survives


def test_stream_neardup_dedup_equals_batch_and_drops_neardups(spark, tmp_path):
    """The streaming ownership state (min doc_id per band bucket,
    merged across one-file micro-batches) must equal the batch
    aggregation, and the survivor rule must actually drop the planted
    near-duplicates while keeping their earlier-id originals."""
    from etl_global_mobility_spark.streaming.ops import (
        neardup_bucket_owners_stream,
        neardup_survivors,
        run_stream_to_memory,
    )

    docs, planted = _mk_docs(spark)
    land = str(tmp_path / "docs")
    docs.repartition(3).write.parquet(land)
    batch = spark.read.parquet(land)

    sdf = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(land)
    )
    stream_owners = {
        (r.band, r.bucket, r.owner_id)
        for r in run_stream_to_memory(
            neardup_bucket_owners_stream(sdf), "complete"
        ).collect()
    }
    batch_owners_df = neardup_bucket_owners_stream(batch)
    batch_owners = {
        (r.band, r.bucket, r.owner_id) for r in batch_owners_df.collect()
    }
    assert stream_owners == batch_owners and stream_owners

    kept = {
        r.doc_id: r.kept
        for r in neardup_survivors(batch_owners_df, batch).collect()
    }
    assert set(kept) == {r.doc_id for r in docs.select("doc_id").collect()}
    # planted dups (higher ids, ~5% word noise) share ≥1 band bucket
    # with their originals for most plants — those must be dropped,
    # and every original (lowest id of its cluster) must survive
    dropped_dups = sum(1 for src, dup in planted if not kept[dup])
    assert dropped_dups / len(planted) >= 0.75
    assert all(kept[src] for src, _ in planted)


def test_streaming_replay_determinism(spark):
    """Two independent replays of the same bounded stream produce the
    identical windowed aggregation (SURVEY §5 streaming property)."""
    from etl_global_mobility_spark.corpus.streaming import q_stream_tumbling

    sf_dir = "/root/testdata/sf0.001"
    a = sorted(map(str, q_stream_tumbling(spark, sf_dir).collect()))
    b = sorted(map(str, q_stream_tumbling(spark, sf_dir).collect()))
    assert a == b and len(a) > 0


def test_foreach_batch_sink_exactly_once(spark, tmp_path):
    """foreachBatch parquet sink over a 3-file stream (one file per
    micro-batch): rows written exactly once; restarting the finished
    stream on the same checkpoint reprocesses nothing; and replaying
    one batch id overwrites (not duplicates) its partition."""
    from etl_global_mobility_spark.streaming.ops import (
        run_stream_foreach_batch_parquet,
    )

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    batch = spark.range(90).select(
        F.col("id").alias("event_id"), (F.col("id") % 7).alias("user_id")
    )
    batch.repartition(3).write.parquet(src)

    stream = (
        spark.readStream.schema("event_id long, user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    run_stream_foreach_batch_parquet(stream, out, ckpt)
    got = spark.read.parquet(out)
    assert got.select("_batch_id").distinct().count() >= 2  # multi-batch
    assert sorted(r.event_id for r in got.collect()) == list(range(90))

    # restart on the same checkpoint: nothing new to process, no dupes
    stream2 = (
        spark.readStream.schema("event_id long, user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    run_stream_foreach_batch_parquet(stream2, out, ckpt)
    assert spark.read.parquet(out).count() == 90

    # simulate an at-least-once replay of batch 0: same rows, same id →
    # dynamic overwrite of that partition keeps the row set identical
    b0 = spark.read.parquet(out).filter("_batch_id = 0").drop("_batch_id")
    (
        b0.withColumn("_batch_id", F.lit(0))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_batch_id")
        .parquet(out)
    )
    assert spark.read.parquet(out).count() == 90


def test_approx_count_distinct_error_bound(spark):
    """HLL++ estimate within the configured 2% rsd (allow 3x slack)."""
    from etl_global_mobility_spark.corpus.relational import q_agg_approx_distinct

    rows = q_agg_approx_distinct(spark, "/root/testdata/sf0.01").collect()
    assert rows
    for r in rows:
        rel_err = abs(r.approx_parts - r.exact_parts) / max(r.exact_parts, 1)
        assert rel_err < 0.06, f"{r.l_returnflag}: {r.approx_parts} vs {r.exact_parts}"


# ----------------------------------------------------------------- PQ ----
def _pq_fixture(spark, n=120, dim=16, n_clusters=6, seed=5):
    """Clustered vectors: cluster centers + small noise, unit-normalized
    — PQ must beat chance comfortably on clustered data."""
    rng = random.Random(seed)
    centers = [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_clusters)
    ]
    rows = []
    for i in range(n):
        c = centers[i % n_clusters]
        v = [x + rng.gauss(0.0, 0.15) for x in c]
        nrm = sum(x * x for x in v) ** 0.5
        rows.append((i, [float(x / nrm) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_pq_codebook_shape_and_validation(spark):
    from etl_global_mobility_spark.operators.similarity import (
        pq_codebook_from_corpus,
    )

    e = _pq_fixture(spark)
    book = pq_codebook_from_corpus(e, dim=16, m=4, k=8)
    assert len(book) == 4 and len(book[0]) == 8 and len(book[0][0]) == 4
    with pytest.raises(ValueError):
        pq_codebook_from_corpus(e, dim=16, m=5, k=8)  # 16 % 5 != 0


def test_pq_encode_is_deterministic_and_bounded(spark):
    from etl_global_mobility_spark.operators.similarity import (
        pq_codebook_from_corpus,
        pq_encode,
    )

    e = _pq_fixture(spark)
    book = pq_codebook_from_corpus(e, dim=16, m=4, k=8)
    a = pq_encode(e, book).select("vec_id", "pq_codes").collect()
    b = pq_encode(e.repartition(7), book).select("vec_id", "pq_codes").collect()
    assert {r.vec_id: r.pq_codes for r in a} == {r.vec_id: r.pq_codes for r in b}
    assert all(0 <= c < 8 for r in a for c in r.pq_codes)
    assert all(len(r.pq_codes) == 4 for r in a)


def test_pq_adc_rerank_recall_beats_chance(spark):
    from etl_global_mobility_spark.operators.similarity import (
        cosine_topk_exact,
        pq_codebook_from_corpus,
        pq_topk,
    )

    e = _pq_fixture(spark)
    q = e.filter(F.col("vec_id") < 6)
    book = pq_codebook_from_corpus(e, dim=16, m=4, k=8)
    exact = cosine_topk_exact(e, q, k=5).collect()
    got = pq_topk(e, q, book, k=5, rerank=30).collect()
    ex: dict[int, set] = {}
    for r in exact:
        ex.setdefault(r.q_id, set()).add(r.c_id)
    hits = sum(1 for r in got if r.c_id in ex[r.q_id])
    recall = hits / len(got)
    # chance level is 5/119 ≈ 0.04; clustered data should be far above
    assert recall >= 0.5, f"PQ rerank recall {recall}"
    # rerank output is exact squared L2 — non-negative, sorted per query
    by_q: dict[int, list] = {}
    for r in sorted(got, key=lambda r: (r.q_id, r.rank)):
        by_q.setdefault(r.q_id, []).append(r.dist)
    for dists in by_q.values():
        assert dists == sorted(dists) and all(d >= -1e-12 for d in dists)


def test_pq_training_reduces_quantization_error(spark):
    from etl_global_mobility_spark.operators.similarity import (
        dot,
        pq_codebook_from_corpus,
        pq_encode,
        train_pq_codebook,
    )

    e = _pq_fixture(spark)

    def qerr(book):
        m, sub = len(book), len(book[0][0])
        enc = pq_encode(e, book)
        err = None
        for j in range(m):
            s = F.slice("embedding", j * sub + 1, sub)
            cents = F.expr(
                "array("
                + ",".join(
                    "array(" + ",".join(repr(float(x)) + "D" for x in c) + ")"
                    for c in book[j]
                )
                + ")"
            )
            c = F.element_at(cents, F.element_at("pq_codes", j + 1) + 1)
            d = dot(s, s) - 2.0 * dot(s, c) + dot(c, c)
            err = d if err is None else err + d
        return enc.select(F.sum(err).alias("e")).collect()[0]["e"]

    base = qerr(pq_codebook_from_corpus(e, dim=16, m=4, k=8))
    trained = qerr(train_pq_codebook(e, dim=16, m=4, k=8, n_iters=2))
    assert trained <= base * 1.0001, (trained, base)


@pytest.mark.slow
def test_minhash_neardup_soak_recall_and_runtime(spark):
    """Scale soak for MinHash+LSH near-dup (VERDICT r4 task 5): 10k
    hash-derived documents (~17x the sf0.01 documents table) with 100
    planted near-copies (last 5 of 50 words rewritten → true shingle
    Jaccard ≈ 0.78). Asserts a recall floor the sf0.01 oracle can't
    see (banding probability only matters at volume), zero
    false-positive pairs among hash-unique base docs, and a runtime
    budget that fails if the candidate generation ever degenerates
    toward all-pairs."""
    import time

    from pyspark.sql import functions as F

    from etl_global_mobility_spark.operators.dedup import (
        minhash_near_duplicates,
    )

    n, words = 10_000, 50
    def doc_text(id_col):
        return F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(words)),
                lambda j: F.concat(
                    F.lit("w"), (F.pmod(F.hash(id_col, j), F.lit(800))).cast("string")
                ),
            ),
        )

    base = spark.range(n).select(
        F.col("id").alias("doc_id"), doc_text(F.col("id")).alias("text")
    )
    # planted near-copies: doc n+i copies source (i*97) % n with its
    # last 5 words replaced by fresh ones (suffix drawn from the copy id)
    src = (F.col("id") * 97) % n
    dups = spark.range(100).select(
        (F.lit(n) + F.col("id")).alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(words - 5)),
                lambda j: F.concat(
                    F.lit("w"), (F.pmod(F.hash(src, j), F.lit(800))).cast("string")
                ),
            ),
            F.transform(
                F.sequence(F.lit(1), F.lit(5)),
                lambda j: F.concat(
                    F.lit("x"), (F.pmod(F.hash(F.col("id") + n, j), F.lit(800))).cast("string")
                ),
            ),
        ).alias("text"),
    )
    corpus = base.unionByName(dups)
    t0 = time.time()
    pairs = minhash_near_duplicates(
        corpus, n_hashes=16, bands=4, k=3, jaccard_threshold=0.5
    ).collect()
    elapsed = time.time() - t0
    planted = {((i * 97) % n, n + i) for i in range(100)}
    got = {(r.id_a, r.id_b) for r in pairs}
    recall = len(planted & got) / len(planted)
    # J≈0.78 → per-band match p≈J^4≈0.37, candidate p≈1-(1-p)^4≈0.84,
    # and est_jaccard≥0.5 holds for nearly all candidates: floor 0.6
    # trips on any banding/signature regression, not on variance
    # (hash-derived → deterministic across runs and partitionings).
    assert recall >= 0.6, f"planted near-dup recall {recall}"
    false_pairs = got - planted
    assert not false_pairs, f"false-positive pairs: {sorted(false_pairs)[:5]}"
    # 10k docs through banded LSH runs in seconds on local[8]; an
    # all-pairs degeneration (50M candidate pairs) blows this budget
    assert elapsed < 120, f"minhash soak took {elapsed:.0f}s"


@pytest.mark.slow
def test_dup_ngram_spans_soak_skewed_grams_and_runtime(spark):
    """Scale soak for exact-substring dup coverage (VERDICT r5 task 7):
    10k hash-derived docs, every one sharing a 5-word boilerplate
    prefix — a df=10k HOT gram the sf0.001 oracle volume cannot
    exercise (stopword-gram skew is where the semi-join marking and
    AQE matter) — plus 50 planted full copies. Closed-form expected
    coverage: the shared prefix contributes exactly 3 dup 3-grams
    covering 5 tokens on every non-copied doc; copies and their
    sources are covered end-to-end. Runtime budget trips if the
    marking ever degenerates toward occurrence×gram blowup."""
    import time

    from pyspark.sql import functions as F

    from etl_global_mobility_spark.operators.dedup import duplicated_ngram_spans

    n, words = 10_000, 40
    # unique region: word universe 10^9 → cross-doc 3-gram collisions
    # outside the planted structure are (#grams² / universe³)-improbable
    unique_part = F.transform(
        F.sequence(F.lit(1), F.lit(words - 5)),
        lambda j: F.concat(
            F.lit("u"),
            F.pmod(F.hash(F.col("doc_id"), j), F.lit(1_000_000_000)).cast("string"),
        ),
    )
    text = F.concat_ws(
        " ", F.concat_ws(" ", F.lit("c1 c2 c3 c4 c5")), F.concat_ws(" ", unique_part)
    )
    base = spark.range(n).select(F.col("id").alias("doc_id")).select(
        "doc_id", text.alias("text")
    )
    # 50 full copies of docs 0..49 (copy id = n + i → same text ⇒ every
    # gram of both sides is duplicated)
    copies = spark.range(50).select((F.col("id") + n).alias("doc_id")).select(
        "doc_id",
        F.concat_ws(
            " ",
            F.lit("c1 c2 c3 c4 c5"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(1), F.lit(words - 5)),
                    lambda j: F.concat(
                        F.lit("u"),
                        F.pmod(
                            F.hash(F.col("doc_id") - n, j), F.lit(1_000_000_000)
                        ).cast("string"),
                    ),
                ),
            ),
        ).alias("text"),
    )
    t0 = time.time()
    rows = duplicated_ngram_spans(
        base.unionByName(copies), k=3, min_docs=2
    ).collect()
    elapsed = time.time() - t0
    by_id = {r.doc_id: r for r in rows}
    assert len(by_id) == n + 50
    copied_ids = set(range(50)) | set(range(n, n + 50))
    for did, r in by_id.items():
        assert r.n_tokens == words and r.n_grams == words - 2
        if did in copied_ids:  # full copy: everything duplicated
            assert r.covered_tokens == words and r.n_dup_grams == words - 2, did
        else:  # only the boilerplate prefix: grams at pos 1-3, tokens 1-5
            assert r.n_dup_grams == 3 and r.covered_tokens == 5, (did, r)
    assert elapsed < 120, f"dup-ngram soak took {elapsed:.0f}s"


@pytest.mark.slow
def test_interval_overlap_soak_skew_and_exactly_once(spark):
    """Scale soak for the bucketized interval×interval join (VERDICT r5
    task 7): 100k lattice intervals + a 400-interval HOT cluster on one
    spot (dense-bucket skew) + 4 corpus-spanning long intervals (the
    explode-factor knob: each explodes into ~100k bucket rows). The
    construction's overlap count is closed-form, so the test asserts
    EXACT cardinality (any double-count from the overlap-start
    arithmetic, or any miss from bucket assignment, shifts it) plus
    pair-level exactly-once, under a runtime budget."""
    import time

    from pyspark.sql import functions as F

    from etl_global_mobility_spark.operators.temporal import interval_overlap_join

    n, m, nl = 100_000, 400, 4
    base = spark.range(n).select(
        F.col("id").alias("iid"),
        (F.col("id") * 10).alias("start"),
        (F.col("id") * 10 + 14).alias("end"),
    )
    hot_anchor = 10 * 5_000
    hot = spark.range(m).select(
        (F.col("id") + 1_000_000).alias("iid"),
        F.lit(hot_anchor).cast("long").alias("start"),
        F.lit(hot_anchor + 14).cast("long").alias("end"),
    )
    longs = spark.range(nl).select(
        (F.col("id") + 2_000_000).alias("iid"),
        F.lit(0).cast("long").alias("start"),
        F.lit(10 * n).cast("long").alias("end"),
    )
    ab = base.unionByName(hot).unionByName(longs)
    t0 = time.time()
    joined = interval_overlap_join(ab, ab, bucket_width=10).select(
        "a_iid", "b_iid"
    )
    total = joined.count()
    distinct = joined.distinct().count()
    elapsed = time.time() - t0
    # base×base: i overlaps i and i±1 → 3n-2 ordered pairs; hot×hot:
    # m²; hot×base both orders: each hot interval overlaps base
    # 4999/5000/5001 → 2·3m; long×(base|hot|long): every pair → 2·nl·n
    # + 2·nl·m + nl²
    expected = (3 * n - 2) + m * m + 6 * m + 2 * nl * n + 2 * nl * m + nl * nl
    assert total == expected, (total, expected)
    assert distinct == total  # exactly-once by arithmetic, no dedup pass
    assert elapsed < 120, f"interval soak took {elapsed:.0f}s"


@pytest.mark.slow
def test_ann_soak_recall_floor_at_scale(spark):
    """Larger-scale ANN soak (VERDICT r3 task 8): IVF and PQ recall@10
    against exact cosine on a 20k-vector corpus — ~20x the sf0.01
    embeddings table the oracle gate exercises. Property, not oracle:
    the sf0.01 hash-match can't catch a recall regression that only
    shows up once cells/codebooks are trained on non-trivial data
    volumes. Vectors are closed-form hash-derived (deterministic under
    any partitioning), so the floors are stable across runs.
    """
    from pyspark.sql import functions as F

    from etl_global_mobility_spark.operators.similarity import (
        cosine_topk_exact,
        ivf_topk,
        pq_topk,
        train_ivf_centroids,
        train_pq_codebook,
    )

    n, dim, k = 20_000, 16, 10
    vec = F.array(
        *[
            (F.hash(F.col("vec_id"), F.lit(j)) % 1000).cast("double") / 500.0
            for j in range(dim)
        ]
    )
    corpus = (
        spark.range(n)
        .withColumnRenamed("id", "vec_id")
        .withColumn("embedding", vec)
    )
    queries = corpus.filter(F.col("vec_id") % 2500 == 0)  # 8 queries
    exact = {
        (r.q_id, r.c_id)
        for r in cosine_topk_exact(corpus, queries, k=k).collect()
    }
    assert len(exact) == 8 * k

    cents = train_ivf_centroids(corpus, n_cells=32, n_iters=3)
    ivf = {
        (r.q_id, r.c_id)
        for r in ivf_topk(
            corpus, queries, n_cells=32, nprobe=8, k=k, centroids=cents
        ).collect()
    }
    ivf_recall = len(exact & ivf) / len(exact)
    # nprobe/n_cells = 1/4 of the corpus scanned; hash-uniform vectors
    # are the adversarial case (no cluster structure), so the floor is
    # deliberately modest — regressions to ~random (0.25) still fail.
    assert ivf_recall >= 0.5, f"IVF recall@{k} collapsed: {ivf_recall}"

    book = train_pq_codebook(corpus, dim=dim, m=4, k=16, n_iters=2)
    pq = {
        (r.q_id, r.c_id)
        for r in pq_topk(corpus, queries, book, k=k, rerank=200).collect()
    }
    pq_recall = len(exact & pq) / len(exact)
    # NOTE: exact ranks by COSINE, PQ by squared-L2 ADC; on these
    # unnormalized vectors the metrics legitimately disagree for some
    # neighbors, so the floor guards against collapse, not metric skew.
    assert pq_recall >= 0.5, f"PQ recall@{k} collapsed: {pq_recall}"


def test_semantic_dedup_flags_planted_copies_with_min_dup_of(spark):
    """SemDeDup contract: a near-copy is flagged against the SMALLEST
    smaller-id cell-mate above the threshold; independent gaussians are
    never flagged at a high threshold."""
    from etl_global_mobility_spark.operators.similarity import semantic_dedup

    rng = random.Random(13)
    base = [[rng.gauss(0, 1) for _ in range(16)] for _ in range(40)]
    rows = [(i, v, 0) for i, v in enumerate(base)]
    # near-copies: 100/101/102 of sources 3/7/11, plus 103 = second
    # copy of 3 (must dedup against 3, the minimum, not against 100)
    for j, src in enumerate((3, 7, 11, 3)):
        v = [x + 1e-3 * rng.gauss(0, 1) for x in base[src]]
        rows.append((100 + j, v, 0))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = semantic_dedup(emb, n_cells=8, threshold=0.95).collect()
    flagged = {r.vec_id: r.dup_of for r in out}
    assert flagged == {100: 3, 101: 7, 102: 11, 103: 3}, flagged
    for r in out:
        assert r.dup_of < r.vec_id
        assert r.cos >= 0.95


def test_semantic_dedup_honors_trained_centroids(spark):
    """Passing explicit centroids re-indexes cells 0..k-1 and keeps the
    same dedup semantics (the 100 TB path: train once, assign map-only)."""
    from etl_global_mobility_spark.operators.similarity import semantic_dedup

    rng = random.Random(29)
    rows = [(i, [rng.gauss(0, 1) for _ in range(8)], 0) for i in range(30)]
    rows.append((50, [x * 1.001 for x in rows[5][1]], 0))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    cents = [rows[i][1] for i in range(4)]
    out = semantic_dedup(emb, threshold=0.99, centroids=cents).collect()
    assert {(r.vec_id, r.dup_of) for r in out} == {(50, 5)}
    assert all(0 <= r.cell < 4 for r in out)


def _pagerank_reference(edges, n_iters=3, damping=85, unit=1_000_000):
    """Pure-Python mirror of operators/graph.py::pagerank (integer
    floor-division semantics)."""
    e = sorted(set(edges))
    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    outdeg = {}
    for s, _ in e:
        outdeg[s] = outdeg.get(s, 0) + 1
    teleport = unit - unit * damping // 100
    score = {n: unit for n in nodes}
    for _ in range(n_iters):
        contrib = {}
        for s, d in e:
            contrib[d] = contrib.get(d, 0) + (score[s] * damping // 100) // outdeg[s]
        score = {n: teleport + contrib.get(n, 0) for n in nodes}
    return score


def test_pagerank_matches_python_reference_and_handles_dangling(spark):
    """Integer fixed-point PageRank equals the sequential reference on
    a graph with a dangling node (4: receives teleport, sends nothing)
    and a cycle; results must be partitioning-independent by
    construction (integer arithmetic)."""
    from etl_global_mobility_spark.operators.graph import pagerank

    edges = [(0, 1), (1, 2), (2, 0), (0, 2), (3, 4), (2, 4), (0, 4)]
    df = spark.createDataFrame(edges + edges[:3], "src long, dst long")  # dups collapse
    got = {r.node: r.score for r in pagerank(df, n_iters=3).collect()}
    assert got == _pagerank_reference(edges)
    # hub node 4 (three in-edges, no out-edges) must outrank the cycle
    assert got[4] > got[1]


def test_pagerank_zero_iterations_returns_uniform_init(spark):
    from etl_global_mobility_spark.operators.graph import pagerank

    df = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    got = {r.node: r.score for r in pagerank(df, n_iters=0).collect()}
    assert got == {1: 1_000_000, 2: 1_000_000}


def test_stateful_stream_on_rocksdb_state_store(spark):
    """The large-state scale path: RocksDB state store (bundled
    rocksdbjni) keeps streaming state off-heap and spillable — at
    100 TB the HDFS-backed in-memory provider OOMs on wide key spaces.
    Both the built-in windowed agg and the custom
    applyInPandasWithState operator must produce identical results on
    either provider."""
    from etl_global_mobility_spark.corpus.streaming import (
        q_stream_stateful_profile,
        q_stream_tumbling,
    )

    sf_dir = "/root/testdata/sf0.001"
    key = "spark.sql.streaming.stateStore.providerClass"
    rocks = (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    )
    base_prof = sorted(map(str, q_stream_stateful_profile(spark, sf_dir).collect()))
    base_tumb = sorted(map(str, q_stream_tumbling(spark, sf_dir).collect()))
    prev = spark.conf.get(key, None)
    try:
        spark.conf.set(key, rocks)
        rock_prof = sorted(
            map(str, q_stream_stateful_profile(spark, sf_dir).collect())
        )
        rock_tumb = sorted(map(str, q_stream_tumbling(spark, sf_dir).collect()))
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    assert rock_prof == base_prof and len(base_prof) > 0
    assert rock_tumb == base_tumb and len(base_tumb) > 0


def test_preference_pairs_tiebreak_and_null_exclusion(spark):
    """Pair contract: chosen/rejected distinct under full score ties;
    NULL scores never enter a pair; singleton groups emit nothing."""
    from etl_global_mobility_spark.operators.splits import preference_pairs

    rows = [
        # group A: clear ordering
        ("A", 1, 0.5), ("A", 2, -0.25), ("A", 3, 2.0),
        # group B: all scores tie → chosen = min id, rejected = max id
        ("B", 10, 1.0), ("B", 11, 1.0), ("B", 12, 1.0),
        # group C: one scored row + one NULL → < 2 scored, no pair
        ("C", 20, 0.75), ("C", 21, None),
        # group D: two rows, one NULL-scored → no pair
        ("D", 30, None), ("D", 31, None),
    ]
    df = spark.createDataFrame(rows, "src string, doc_id long, quality_logit double")
    out = {r.src: r for r in preference_pairs(df, ["src"]).collect()}
    assert set(out) == {"A", "B"}
    assert (out["A"].chosen_id, out["A"].rejected_id) == (3, 2)
    assert out["A"].margin == 2.0 - (-0.25)
    assert (out["B"].chosen_id, out["B"].rejected_id) == (10, 12)
    assert out["B"].margin == 0.0


def _bpe_reference_train(word_freqs, n_merges, min_freq=2):
    """Sequential Sennrich BPE (chars, no end-marker) for comparison."""
    words = {tuple(w): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(n_merges):
        pairs = {}
        for syms, f in words.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] = pairs.get((syms[i], syms[i + 1]), 0) + f
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], [-ord(c) for c in kv[0][0]], [-ord(c) for c in kv[0][1]]))
        # deterministic tie-break: count DESC then left ASC then right ASC
        top = max(pairs.values())
        cand = sorted([p for p, n in pairs.items() if n == top])
        best = (cand[0], top)
        if best[1] < min_freq:
            break
        (l, r) = best[0]
        merges.append((l, r))
        new_words = {}
        for syms, f in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words[tuple(out)] = new_words.get(tuple(out), 0) + f
        words = new_words
    return merges


def test_bpe_training_matches_sequential_reference(spark):
    from etl_global_mobility_spark.operators.bpe import train_bpe_merges

    texts = [
        "low lower lowest low low",
        "new newer newest new newer",
        "low new lower newer",
        "widest wide wider wide",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = train_bpe_merges(df, n_merges=8, min_freq=2)
    freqs = {}
    for t in texts:
        for w in t.lower().split():
            freqs[w] = freqs.get(w, 0) + 1
    want = _bpe_reference_train(freqs, 8, min_freq=2)
    assert got == want, f"{got} != {want}"
    assert len(got) > 0


def test_bpe_token_count_applies_trained_merges(spark):
    """After training on 'aaab'-heavy text, 'aa' merges, so counting
    tokens reflects the merge table; unknown chars stay singletons."""
    from etl_global_mobility_spark.operators.bpe import (
        bpe_token_count,
        train_bpe_merges,
    )

    df = spark.createDataFrame(
        [(1, "aaab aaab aaab"), (2, "zq")], "doc_id long, text string"
    )
    merges = train_bpe_merges(df, n_merges=3, min_freq=2)
    out = {r.doc_id: r.bpe_tokens for r in bpe_token_count(df, merges).collect()}
    # 'aaab' (4 chars) compresses under the learned merges
    assert out[1] < 3 * 4
    assert out[2] == 2  # no merges apply to unseen 'zq'
    # NULL-safe
    df2 = spark.createDataFrame([(3, None)], "doc_id long, text string")
    assert bpe_token_count(df2, merges).collect()[0].bpe_tokens == 0


def test_bpe_token_count_matches_training_tokenizer_on_unicode_ws(spark):
    """Application must segment words EXACTLY like training: tokenize()
    splits on Java `\\s+` (ASCII whitespace only), so NBSP/Unicode
    spaces stay INSIDE a word. Python str.split() would break on them
    and count against a token stream the merges were never trained on
    (ADVICE r4, bpe.py)."""
    from etl_global_mobility_spark.operators.bpe import bpe_token_count
    from etl_global_mobility_spark.operators.text import tokenize

    # 'a<NBSP>b c' — tokenize() sees words ['a b', 'c']
    df = spark.createDataFrame(
        [(1, "a b c")], "doc_id long, text string"
    )
    toks = df.select(tokenize("text").alias("t")).collect()[0].t
    assert toks == ["a b", "c"]  # training-side segmentation
    # with no merges, the BPE count is the total char count of those
    # words: 3 + 1 = 4. A Unicode-whitespace split would yield 3.
    out = bpe_token_count(df, merges=[]).collect()[0].bpe_tokens
    assert out == 4


def test_semantic_dedup_null_embedding_gets_null_cell(spark):
    """NULL-embedding rows take a NULL cell and sit out of the
    self-join entirely (ADVICE r4: they used to land in cell 0 and fan
    out for nothing): output is identical with and without them, and
    never mentions them."""
    from etl_global_mobility_spark.operators.similarity import semantic_dedup

    rows = [
        (1, [1.0, 0.0]),
        (2, [1.0, 0.0]),   # dup of 1
        (3, [0.0, 1.0]),
    ]
    base = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    with_null = spark.createDataFrame(
        rows + [(4, None)], "vec_id long, embedding array<double>"
    )
    want = sorted(
        (r.vec_id, r.dup_of)
        for r in semantic_dedup(base, n_cells=2, threshold=0.9).collect()
    )
    got_rows = semantic_dedup(with_null, n_cells=2, threshold=0.9).collect()
    got = sorted((r.vec_id, r.dup_of) for r in got_rows)
    assert got == want == [(2, 1)]
    assert all(r.vec_id != 4 and r.dup_of != 4 for r in got_rows)


def test_bpe_training_early_stops_below_min_freq(spark):
    from etl_global_mobility_spark.operators.bpe import train_bpe_merges

    df = spark.createDataFrame([(1, "ab cd ef")], "doc_id long, text string")
    # every adjacent pair occurs once -> below min_freq=2, no merges
    assert train_bpe_merges(df, n_merges=5, min_freq=2) == []


@pytest.mark.slow
def test_watermark_drops_late_events_in_append_mode(spark, tmp_path):
    """Late-data contract: once the watermark passes an event's time,
    the event is DROPPED from windowed aggregation — append mode then
    finalizes each window exactly once. Two availableNow runs on one
    checkpoint (the watermark PERSISTS across restarts): run 1
    advances the watermark to 10:50 and closes the 10:00 window; run
    2's 10:02 straggler is behind the restored watermark and must not
    re-open or change it, while 11:30 closes the 11:00 window."""
    import glob
    import os
    import shutil

    src = str(tmp_path / "wm_src")
    ckpt = str(tmp_path / "wm_ckpt")
    os.makedirs(src)

    def write_one(name, ts_list):
        stage = str(tmp_path / f"stage_{name}")
        (
            spark.createDataFrame([(t,) for t in ts_list], "ts_s string")
            .select(F.col("ts_s").cast("timestamp").alias("ts"))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(stage)
        )
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        shutil.copy(part, os.path.join(src, f"{name}.parquet"))

    out = str(tmp_path / "wm_out")

    def drain(run_name):
        counts = (
            spark.readStream.schema("ts timestamp")
            .parquet(src)
            .withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "10 minutes"))
            .count()
            .select(F.col("window.start").cast("string").alias("ws"), "count")
        )

        def sink(batch_df, _bid):
            batch_df.withColumn("run", F.lit(run_name)).write.mode(
                "append"
            ).parquet(out)

        q = (
            counts.writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            r.ws: r["count"]
            for r in spark.read.parquet(out)
            .filter(F.col("run") == run_name)
            .collect()
        }

    write_one(
        "a", ["2024-01-01 10:00:00", "2024-01-01 10:05:00", "2024-01-01 11:00:00"]
    )
    run1 = drain("wm_late_drop_1")
    # watermark after run 1 = 11:00 - 10m = 10:50 -> the 10:00 window
    # closed with exactly file a's two events
    assert run1 == {"2024-01-01 10:00:00": 2}, run1

    write_one("b", ["2024-01-01 10:02:00", "2024-01-01 11:30:00"])
    run2 = drain("wm_late_drop_2")
    # the straggler (10:02 < restored watermark 10:50) was dropped —
    # its window is already finalized and never re-emits; 11:30 pushes
    # the watermark to 11:20, closing the 11:00 window; 11:30's own
    # window stays open (nothing emitted for it)
    assert run2 == {"2024-01-01 11:00:00": 1}, run2


@pytest.mark.slow
def test_semantic_dedup_soak_recall_at_scale(spark):
    """Scale soak for SemDeDup: 20k hash-derived vectors + 60 planted
    near-copies, trained coarse quantizer (64 cells). The property the
    sf0.01 oracle can't check: with REAL trained cells at volume, a
    planted copy still lands in its source's cell and is flagged —
    recall of planted duplicates stays above a floor, and nothing else
    fires at a 0.999 threshold on hash-uniform vectors."""
    from pyspark.sql import functions as F

    from etl_global_mobility_spark.operators.similarity import (
        semantic_dedup,
        train_ivf_centroids,
    )

    n, dim = 20_000, 16
    vec = F.array(
        *[
            (F.hash(F.col("vec_id"), F.lit(j)) % 1000).cast("double") / 500.0
            for j in range(dim)
        ]
    )
    base = spark.range(n).select(F.col("id").alias("vec_id"), vec.alias("embedding"))
    # plant near-copies: id n+i duplicates source id (i*333) % n (scaled
    # by 1.0009765625 = 1 + 2^-10: same direction -> cosine exactly 1.0)
    dups = spark.range(60).select(
        (F.lit(n) + F.col("id")).alias("vec_id"),
        F.transform(
            F.array(
                *[
                    (F.hash((F.col("id") * 333) % n, F.lit(j)) % 1000)
                    .cast("double")
                    / 500.0
                    for j in range(dim)
                ]
            ),
            lambda x: x * 1.0009765625,
        ).alias("embedding"),
    )
    corpus = base.unionByName(dups)
    cents = train_ivf_centroids(corpus, n_cells=64, n_iters=3)
    out = semantic_dedup(
        corpus, threshold=0.999, centroids=cents
    ).collect()
    planted = {n + i: (i * 333) % n for i in range(60)}
    hits = {r.vec_id: r.dup_of for r in out if r.vec_id >= n}
    recall = sum(1 for d, s in planted.items() if hits.get(d) == s) / len(planted)
    # a scaled copy has cosine 1.0 with its source; it is missed only
    # if quantization separates the pair — the floor guards collapse
    assert recall >= 0.9, f"planted-duplicate recall {recall}"
    # hash-uniform non-copies must not reach a 0.999 cosine
    extra = [r for r in out if r.vec_id < n]
    assert not extra, f"unexpected base-corpus duplicates: {extra[:3]}"


def test_udtf_with_analyze_polymorphic_schema(spark):
    """Spark 4 polymorphic UDTF: analyze() computes the OUTPUT SCHEMA
    from the call-site literal — table functions whose shape depends on
    their arguments (the dynamic-schema escape hatch)."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import IntegerType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class FirstN:
        @staticmethod
        def analyze(n: AnalyzeArgument) -> AnalyzeResult:
            schema = StructType()
            for i in range(n.value):
                schema = schema.add(f"c{i}", IntegerType())
            return AnalyzeResult(schema=schema)

        def eval(self, n: int):
            yield tuple(range(n))

    spark.udtf.register("first_n", FirstN)
    df3 = spark.sql("SELECT * FROM first_n(3)")
    assert df3.columns == ["c0", "c1", "c2"]
    assert [tuple(r) for r in df3.collect()] == [(0, 1, 2)]
    df5 = spark.sql("SELECT * FROM first_n(5)")
    assert df5.columns == ["c0", "c1", "c2", "c3", "c4"]


def test_spark4_collation_case_insensitive_semantics(spark):
    """Spark 4 string collations: UTF8_LCASE makes compare/group/join
    case-insensitive WITHOUT rewriting data through lower() — the
    governed way to get case-insensitive keys."""
    df = spark.createDataFrame(
        [("Alpha",), ("ALPHA",), ("beta",)], "s string"
    )
    ci = df.select(F.collate(F.col("s"), "UTF8_LCASE").alias("cs"))
    counts = sorted(r["count"] for r in ci.groupBy("cs").count().collect())
    assert counts == [1, 2]
    # equality under the collation, not byte equality
    eq = df.filter(
        F.collate(F.col("s"), "UTF8_LCASE") == F.lit("alpha")
    ).count()
    assert eq == 2


def test_spark4_sql_scripting_control_flow(spark):
    """Spark 4 SQL scripting (BEGIN/END, DECLARE, WHILE/SET): real
    procedural control flow inside the SQL engine — the migration path
    for stored-procedure workloads. Declarative operators remain the
    scale path; this pins that the scripting surface exists and
    evaluates correctly."""
    prev = spark.conf.get("spark.sql.scripting.enabled", None)
    spark.conf.set("spark.sql.scripting.enabled", "true")
    try:
        df = spark.sql(
            """
            BEGIN
              DECLARE total INT DEFAULT 0;
              DECLARE i INT DEFAULT 0;
              WHILE i < 5 DO
                SET total = total + i;
                SET i = i + 1;
              END WHILE;
              SELECT total AS s;
            END
            """
        )
        assert [tuple(r) for r in df.collect()] == [(10,)]
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.scripting.enabled")
        else:
            spark.conf.set("spark.sql.scripting.enabled", prev)


def test_temperature_mix_rate_semantics(spark):
    """Closed-form rate contract: the smallest source is kept whole
    (rate exactly 1.0), larger sources get sqrt(t_min/t_s) at T=0.5,
    T=1 keeps everything, T=0 equalizes expected tokens; a misspelled
    temperature raises."""
    import pytest

    from etl_global_mobility_spark.operators.splits import temperature_mix

    # source 'big' has 16x the tokens of 'small' -> rate sqrt(1/16)=0.25
    docs = spark.createDataFrame(
        [(i, "big", "w " * 16) for i in range(100)]
        + [(1000 + i, "small", "w " * 16) for i in range(100 // 16 + 1)],
        "doc_id long, source string, text string",
    )
    # token totals: big=1600, small=112 -> not exactly 16x; build exact:
    docs = spark.createDataFrame(
        [(i, "big", "a b c d") for i in range(400)]          # 1600 tokens
        + [(10_000 + i, "small", "a b c d") for i in range(25)],  # 100
        "doc_id long, source string, text string",
    )
    out = temperature_mix(docs, temperature=0.5)
    rates = {
        r.source: r.rate for r in out.select("source", "rate").distinct().collect()
    }
    assert rates["small"] == 1.0
    assert rates["big"] == 0.25  # sqrt(100/1600), exact in binary
    kept = out.groupBy("source").count().collect()
    kept = {r.source: r["count"] for r in kept}
    # md5 buckets are uniform: expect ~100 of 400 'big' docs; the
    # deterministic sample is fixed, so pin a generous sanity band
    assert kept["small"] == 25
    assert 60 <= kept["big"] <= 140
    # T=1: natural mixture, everything kept
    assert temperature_mix(docs, temperature=1.0).count() == 425
    with pytest.raises(ValueError, match="temperature"):
        temperature_mix(docs, temperature=1.5)


def test_duplicated_ngram_spans_coverage_union(spark):
    """Planted cross-doc substring: covered_tokens counts the UNION of
    overlapping duplicated k-gram spans, within-doc repetition does not
    fire, sub-k docs appear with zeros."""
    from etl_global_mobility_spark.operators.dedup import (
        duplicated_ngram_spans,
    )

    shared = "alpha beta gamma delta"  # 4 tokens -> 2 shared 3-grams
    docs = spark.createDataFrame(
        [
            (1, shared + " unique1 unique2"),
            (2, "prefix0 " + shared),
            (3, "solo solo solo solo solo2"),  # repeats only within itself
            (4, "tiny doc"),                   # < k tokens
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in duplicated_ngram_spans(docs, k=3).collect()}
    # doc 1: grams (a b g) and (b g d) duplicated; union covers 4 tokens
    assert rows[1].n_dup_grams == 2 and rows[1].covered_tokens == 4
    assert rows[1].n_tokens == 6 and rows[1].n_grams == 4
    assert abs(rows[1].dup_token_fraction - 4 / 6) < 1e-15
    # doc 2: same two grams at offset 1 -> also 4 covered of 5
    assert rows[2].n_dup_grams == 2 and rows[2].covered_tokens == 4
    # doc 3: its grams appear in only ONE document -> nothing duplicated
    assert rows[3].n_dup_grams == 0 and rows[3].covered_tokens == 0
    # doc 4: shorter than k -> zero grams, present with zeros, fraction defined
    assert rows[4].n_grams == 0 and rows[4].covered_tokens == 0
    assert rows[4].dup_token_fraction == 0.0


def test_within_doc_repeated_spans_hand_computed(spark):
    """The within-document complement: repeats INSIDE a doc fire, text
    shared with other docs does not; coverage is the span UNION; the
    plan is a zero-exchange map-only projection."""
    from etl_global_mobility_spark.operators.dedup import (
        within_doc_repeated_spans,
    )

    docs = spark.createDataFrame(
        [
            # grams: (a b c)@0, (b c a)@1, (c a b)@2, (a b c)@3, (b c d)@4
            # repeated: "a b c" at 0 and 3 -> union covers tokens 0-5 = 6
            (1, "a b c a b c d"),
            # overlapping repeats: "a a a" at 0 and 1 -> union = 4 = all
            (2, "a a a a"),
            (3, "x y z w"),          # no repeats
            (4, "tiny doc"),          # < k tokens
            (5, ""),                  # empty -> NULL fraction
            # identical to doc 3: CROSS-doc sharing must NOT fire here
            (6, "x y z w"),
        ],
        "doc_id long, text string",
    )
    out = within_doc_repeated_spans(docs, k=3)
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[1].n_tokens == 7 and rows[1].n_grams == 5
    assert rows[1].n_rep_grams == 2 and rows[1].covered_tokens == 6
    assert abs(rows[1].rep_token_fraction - 6 / 7) < 1e-15
    assert rows[2].n_rep_grams == 2 and rows[2].covered_tokens == 4
    assert rows[2].rep_token_fraction == 1.0
    for d in (3, 6):
        assert rows[d].n_rep_grams == 0 and rows[d].covered_tokens == 0
    assert rows[4].n_grams == 0 and rows[4].covered_tokens == 0
    assert rows[5].n_tokens == 0 and rows[5].rep_token_fraction is None

    # the scale claim: zero exchanges — pure map-side codegen
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_kmeans_artifact_fingerprint_invalidates_on_data_change(
    spark, tmp_path
):
    """The shared centroid artifact is keyed by (sf_dir, params,
    embeddings mtime+size): refreshed testdata must map to a DIFFERENT
    artifact path and retrain, never silently serve stale centroids —
    and the same unchanged dir must reuse both the in-memory memo and
    the on-disk artifact."""
    import os
    import time as _time

    from pyspark.sql import functions as F

    from etl_global_mobility_spark.corpus.llm import (
        _KMEANS_ARTIFACT_MEM,
        _kmeans_artifact_centroids,
    )

    sf = str(tmp_path)
    vec = F.transform(
        F.sequence(F.lit(1), F.lit(8)),
        lambda i: ((F.hash(F.col("id"), i) % 100) - 50).cast("double") / 50.0,
    )
    spark.range(200).select(
        F.col("id").alias("vec_id"), vec.alias("embedding")
    ).write.mode("overwrite").parquet(os.path.join(sf, "embeddings.parquet"))

    c1 = _kmeans_artifact_centroids(spark, sf, k=3, iters=1)
    st = os.stat(os.path.join(sf, "embeddings.parquet"))
    key = (
        os.path.abspath(sf), 3, 1, 1 << 20,
        f"{st.st_mtime_ns}-{st.st_size}",
    )
    assert key in _KMEANS_ARTIFACT_MEM
    # memoized second call returns the identical object
    assert _kmeans_artifact_centroids(spark, sf, k=3, iters=1) is c1

    # rewrite the data (different vectors, new mtime) WITHOUT touching
    # the process memo (ADVICE r9: the fingerprint is part of the memo
    # key, so the in-memory cache invalidates on data refresh exactly
    # like the on-disk artifact path does): the refresh must route to
    # a NEW artifact and the retrained centroids must differ
    _time.sleep(0.05)  # ensure mtime_ns advances
    vec2 = F.transform(
        F.sequence(F.lit(1), F.lit(8)),
        lambda i: ((F.hash(F.col("id"), i + 7) % 100) - 50).cast("double")
        / 50.0,
    )
    spark.range(200).select(
        F.col("id").alias("vec_id"), vec2.alias("embedding")
    ).write.mode("overwrite").parquet(os.path.join(sf, "embeddings.parquet"))
    assert key in _KMEANS_ARTIFACT_MEM  # stale entry remains, but is unreachable
    c2 = _kmeans_artifact_centroids(spark, sf, k=3, iters=1)
    assert c2 != c1, "stale artifact served after a data refresh"


def test_stats_moments_degenerate_groups_guarded(spark, tmp_path):
    """Round-9 adversarial sweep: a single-row group divides by
    n-1 = 0 in the sample variance, and a constant column makes the
    correlation denominator exactly 0 — both ANSI DIVIDE_BY_ZERO
    crashes unguarded. Contract: NULL, matching SQL var_samp/corr
    semantics."""
    from etl_global_mobility_spark.corpus.relational import (
        q_agg_stats_moments,
    )

    rows = [
        ("A", 5.0, 0.1),            # single-row group: var undefined
        ("B", 3.0, 0.05),           # constant-discount group: corr undef
        ("B", 7.0, 0.05),
        ("C", 1.0, 0.01),           # healthy group
        ("C", 2.0, 0.04),
        ("C", 9.0, 0.09),
    ]
    spark.createDataFrame(
        rows, "l_returnflag string, l_quantity double, l_discount double"
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    out = {r.l_returnflag: r for r in q_agg_stats_moments(spark, str(tmp_path)).collect()}
    assert out["A"].n == 1 and out["A"].var_qty is None
    assert out["A"].corr_qty_disc is None
    assert out["B"].var_qty is not None and out["B"].corr_qty_disc is None
    assert out["C"].corr_qty_disc is not None
    assert out["C"].corr_qty_disc > 0  # qty and discount co-increase


def test_zero_norm_vectors_guarded_in_lsh_paths(spark):
    """Round-9 adversarial sweep: ALL-ZERO vectors project to 0 on
    every hyperplane, so they share an LSH bucket and WILL reach the
    cosine — unguarded that is an ANSI DIVIDE_BY_ZERO crash, and an
    unfiltered NaN would pass >= threshold (embedding_near_duplicates)
    or rank FIRST descending (lsh_ann_candidates), eating top-k slots.
    Contract (the cosine_topk_exact convention): degenerate pairs are
    guarded to NaN and dropped before any threshold/ranking."""
    from pyspark.sql import functions as F

    from etl_global_mobility_spark.operators.similarity import (
        embedding_near_duplicates,
        lsh_ann_candidates,
    )

    dim = 8
    zero = [0.0] * dim
    base = [1.0, 0.5, -0.25, 0.75, -1.0, 0.125, 0.5, -0.5]
    near = [v * 1.01 for v in base]
    df = spark.createDataFrame(
        [(0, base), (1, near), (2, zero), (3, zero)],
        "vec_id long, embedding array<double>",
    )
    # must not raise; the zero-zero pair (guaranteed same bucket) and
    # zero-vs-real pairs must not appear even at threshold 0
    pairs = embedding_near_duplicates(
        df, dim=dim, threshold=0.0, n_planes=2
    ).collect()
    ids = {(r.id_a, r.id_b) for r in pairs}
    assert all(2 not in p and 3 not in p for p in ids)
    assert (0, 1) in ids  # the real near-dup pair still comes through

    # lsh_ann_candidates: zero-vector corpus rows never outrank real
    # candidates, zero-vector queries return nothing (all-NaN scores)
    queries = df.filter(F.col("vec_id").isin(0, 2))
    out = lsh_ann_candidates(
        df, queries, dim=dim, n_planes=1, k=3, n_tables=2
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.q_id, []).append(r)
    assert all(r.c_id not in (2, 3) for r in by_q.get(0, []))
    assert 2 not in by_q  # zero-norm query has no real-similarity hits


def test_within_doc_repeated_spans_python_reference(spark):
    """Independent pure-Python reconstruction over 200 random token
    streams (seeded): per-doc repeated-gram positions and span-union
    coverage must match the HOF pipeline exactly — the same
    cross-check discipline as the URL-dedup/weighted-sample reference
    tests."""
    import random

    from etl_global_mobility_spark.operators.dedup import (
        within_doc_repeated_spans,
    )

    rng = random.Random(31)
    k = 3
    docs, want = [], {}
    for doc_id in range(200):
        n = rng.randrange(0, 30)
        # tiny vocabulary forces plenty of repeats
        toks = [rng.choice("abcdef") for _ in range(n)]
        docs.append((doc_id, " ".join(toks)))
        grams = [
            " ".join(toks[i : i + k]) for i in range(max(len(toks) - k + 1, 0))
        ]
        from collections import Counter

        c = Counter(grams)
        rep = sorted(i for i, g in enumerate(grams) if c[g] >= 2)
        covered, last_end = 0, -1
        for p in rep:
            new_end = max(last_end, p + k - 1)
            covered += k if p > last_end else new_end - last_end
            last_end = new_end
        want[doc_id] = (len(toks), len(grams), len(rep), covered)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.n_grams, r.n_rep_grams, r.covered_tokens)
        for r in within_doc_repeated_spans(df, k=k).collect()
    }
    assert got == want


def test_spark4_group_by_all_and_order_by_all(spark):
    """GROUP BY ALL / ORDER BY ALL (Spark 4): grouping keys inferred
    from the non-aggregate select items — the analyst-SQL surface,
    pinned equivalent to the explicit form."""
    df = spark.createDataFrame(
        [("a", "x", 1), ("a", "x", 2), ("b", "y", 3)], "g string, h string, v int"
    )
    df.createOrReplaceTempView("v_gba")
    got = spark.sql(
        "SELECT g, h, sum(v) AS s FROM v_gba GROUP BY ALL ORDER BY ALL"
    ).collect()
    assert [tuple(r) for r in got] == [("a", "x", 3), ("b", "y", 3)]


def test_lateral_column_alias_reference(spark):
    """Lateral column aliases: a select item referencing an alias
    defined earlier in the SAME select list (no subquery nesting) —
    pinned because derivation chains (the silver layer's style) read
    much better with it."""
    df = spark.createDataFrame([(10.0,)], "price double")
    df.createOrReplaceTempView("v_lca")
    row = spark.sql(
        """SELECT price, price * 0.9 AS discounted,
                  discounted * 2 AS doubled
           FROM v_lca"""
    ).collect()[0]
    assert row.discounted == 9.0 and row.doubled == 18.0


def test_pandas_api_on_spark_compiles_to_jvm_plan(spark):
    """pandas API on Spark (pyspark.pandas): the pandas-shaped frontend
    must compile to the same JVM relational plan — groupby/sum runs as
    hash aggregation with NO Python eval node, and values match the
    SQL answer. (The migration path for pandas-bound pipeline code;
    the engine treats it as another way to declare a plan, not as UDF
    execution.)"""
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        import pyspark.pandas as ps

        pdf = ps.DataFrame({"g": ["a", "a", "b"], "v": [1, 2, 3]})
        out = pdf.groupby("g", as_index=False)["v"].sum()
        sdf = out.to_spark()
    plan = sdf._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan
    for node in ("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas"):
        assert node not in plan
    got = {(r["g"], r["v"]) for r in sdf.collect()}
    assert got == {("a", 3), ("b", 3)}


@pytest.mark.slow
def test_dup_ngram_spans_soak_runtime_and_coverage(spark):
    """Scale soak for exact-substring coverage: 10k hash-derived docs
    where doc i shares its first 10 words with doc i-1 iff i%5==0 (a
    planted chain of cross-doc spans), the rest unique. Pins the
    coverage floor on planted docs, zero false coverage on unique docs,
    and a runtime budget that catches the operator degenerating into
    repeated gram-building passes (the round-5 regression class: 20.8s
    -> 1.4s at sf0.1 after the persisted single-pass rewrite)."""
    import time

    from pyspark.sql import functions as F

    from etl_global_mobility_spark.operators.dedup import (
        duplicated_ngram_spans,
    )

    n, words = 10_000, 40
    # shared prefix for pairs (i, i+1) when (i+1)%5==0: draw the prefix
    # from group id = i//5 so exactly docs 5k-1,5k share prefixes
    grp = (F.col("id") / 5).cast("long")
    is_tail = ((F.col("id") + 1) % 5 == 0) | (F.col("id") % 5 == 0)
    # docs 4,5 | 9,10 | ... share: use pair key = (id+1) div 5 for id%5 in {4,0}\{0 at id 0}
    pair_key = ((F.col("id") + 1) / 5).cast("long")
    prefix_src = F.when(is_tail & (F.col("id") != 0), pair_key).otherwise(
        F.col("id") + 1_000_000
    )
    prefix = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.lit(10)),
            lambda j: F.concat(
                F.lit("p"), (F.pmod(F.hash(prefix_src, j), F.lit(5000))).cast("string")
            ),
        ),
    )
    body = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.lit(words - 10)),
            lambda j: F.concat(
                F.lit("u"),
                F.col("id").cast("string"),
                F.lit("x"),
                (F.pmod(F.hash(F.col("id"), j), F.lit(5000))).cast("string"),
            ),
        ),
    )
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(prefix, F.lit(" "), body).alias("text"),
    )
    t0 = time.time()
    rows = duplicated_ngram_spans(docs, k=3).collect()
    elapsed = time.time() - t0
    by_id = {r.doc_id: r for r in rows}
    assert len(by_id) == n
    # pairs are (5k-1, 5k); the final id n-1 = 9999 has pair 10000,
    # which is past the corpus — its prefix is unique, not planted
    planted = [
        i
        for i in range(1, n)
        if (i % 5 == 0) or ((i + 1) % 5 == 0 and i + 1 < n)
    ]
    # every planted doc shares a 10-token prefix with its pair: all 8
    # prefix 3-grams duplicated, coverage >= 10 tokens
    bad = [i for i in planted if by_id[i].covered_tokens < 10]
    assert not bad, f"planted prefix not detected on {bad[:5]}"
    clean = [i for i in range(1, n) if i not in set(planted)]
    dirty = [i for i in clean if by_id[i].covered_tokens != 0]
    assert not dirty, f"false coverage on unique docs {dirty[:5]}"
    assert elapsed < 120, f"dup-ngram soak took {elapsed:.0f}s"


def test_ann_artifacts_roundtrip_preserves_results(spark, tmp_path):
    """Quantizer artifact persistence: save trained IVF centroids + PQ
    codebook to parquet + manifest, load them back, and the loaded
    artifacts must be EXACTLY the trained ones (float-identical), so
    IVF results through the loaded quantizer match the pre-save run."""
    from pyspark.sql import functions as F

    from etl_global_mobility_spark.operators.similarity import (
        ivf_topk,
        load_ann_artifacts,
        save_ann_artifacts,
        train_ivf_centroids,
        train_pq_codebook,
    )

    n, dim = 400, 8
    vec = F.array(
        *[
            (F.hash(F.col("vec_id"), F.lit(j)) % 1000).cast("double") / 500.0
            for j in range(dim)
        ]
    )
    corpus = spark.range(n).select(F.col("id").alias("vec_id"), vec.alias("embedding"))
    cents = train_ivf_centroids(corpus, n_cells=8, n_iters=2)
    book = train_pq_codebook(corpus, dim=dim, m=2, k=4, n_iters=1)

    path = str(tmp_path / "ann")
    save_ann_artifacts(spark, path, centroids=cents, codebook=book)
    cents2, book2 = load_ann_artifacts(spark, path)
    assert cents2 == cents  # float-identical round-trip
    assert book2 == book

    queries = corpus.filter(F.col("vec_id") < 3)
    before = {
        (r.q_id, r.rank, r.c_id)
        for r in ivf_topk(corpus, queries, n_cells=8, nprobe=3, k=4,
                          centroids=cents).collect()
    }
    after = {
        (r.q_id, r.rank, r.c_id)
        for r in ivf_topk(corpus, queries, n_cells=8, nprobe=3, k=4,
                          centroids=cents2).collect()
    }
    assert before == after and len(before) == 12


def test_kmeans_artifact_roundtrip_is_bit_identical(spark, tmp_path):
    """Train-once flow for the fixed-point k-means: train, persist the
    integer centroids, load them back, and assignment from the loaded
    artifact must be BIT-IDENTICAL to the inline-trained run — integer
    centroids round-trip losslessly, unlike the float IVF quantizer
    (identical up to nothing at all, not just up to ulps)."""
    from pyspark.sql import functions as F

    from etl_global_mobility_spark.operators.similarity import (
        kmeans_fixed_point,
        load_kmeans_centroids,
        save_kmeans_centroids,
        train_kmeans_centroids,
    )

    n, dim = 300, 8
    vec = F.array(
        *[
            (F.hash(F.col("vec_id"), F.lit(j)) % 1000).cast("double") / 500.0
            for j in range(dim)
        ]
    )
    corpus = spark.range(n).select(
        F.col("id").alias("vec_id"), vec.alias("embedding")
    )
    cents = train_kmeans_centroids(corpus, k=3, iters=2)
    path = str(tmp_path / "kmeans")
    save_kmeans_centroids(spark, path, cents, scale=1 << 20, iters=2)
    cents2, scale2 = load_kmeans_centroids(spark, path)
    assert cents2 == cents and scale2 == 1 << 20

    inline = sorted(
        (r.vec_id, r.cluster_id, r.dist_sq)
        for r in kmeans_fixed_point(corpus, k=3, iters=2).collect()
    )
    from_artifact = sorted(
        (r.vec_id, r.cluster_id, r.dist_sq)
        for r in kmeans_fixed_point(corpus, centroids=cents2).collect()
    )
    assert inline == from_artifact and len(inline) == n

    # manifest shape validation: a truncated artifact must be refused
    import json
    import os

    with open(os.path.join(path, "_kmeans_manifest.json")) as f:
        meta = json.load(f)
    meta["kmeans"]["k"] = 5
    with open(os.path.join(path, "_kmeans_manifest.json"), "w") as f:
        json.dump(meta, f)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="shape mismatch"):
        load_kmeans_centroids(spark, path)


def test_bpe_training_is_partition_invariant_and_artifacts_roundtrip(
    spark, tmp_path
):
    """Distributed determinism: the SAME merge list on any partition
    layout (the tie-break contract is what makes that true), and the
    saved/loaded artifact applies identically."""
    from etl_global_mobility_spark.operators.bpe import (
        bpe_token_count,
        load_bpe_merges,
        save_bpe_merges,
        train_bpe_merges,
    )

    texts = [
        "low lower lowest low low",
        "new newer newest new newer",
        "low new lower newer",
        "widest wide wider wide",
    ] * 3
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    m1 = train_bpe_merges(df, n_merges=6, min_freq=2)
    m2 = train_bpe_merges(df.repartition(7), n_merges=6, min_freq=2)
    assert m1 == m2 and len(m1) == 6

    path = str(tmp_path / "bpe")
    save_bpe_merges(spark, m1, path)
    loaded = load_bpe_merges(spark, path)
    assert loaded == m1
    a = {r.doc_id: r.bpe_tokens for r in bpe_token_count(df, m1).collect()}
    b = {r.doc_id: r.bpe_tokens for r in bpe_token_count(df, loaded).collect()}
    assert a == b


# ----------------------------------------------------- tfidf / novelty ----
def test_tfidf_topterms_ranks_doc_specific_terms(spark):
    from etl_global_mobility_spark.operators.text import tfidf_top_terms

    df = spark.createDataFrame(
        [
            (1, "the the the zebra zebra quark"),
            (2, "the the muon muon muon zebra"),
            (3, "the lepton"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(df, top_k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # 'the' appears in every doc (df=3) so any doc-specific term
    # (df=1) with tf>=1 outranks it unless tf compensates: doc 1 has
    # tf(the)=3/df 3 = 1.0 vs tf(zebra)=2/df 2 = 1.0 vs quark 1/1 = 1.0
    # -> tie broken lexicographically: quark, the. Doc 2: muon 3/1=3.0
    # tops; zebra 1/2=0.5 vs the 2/3=0.66 -> second is 'the'.
    d2 = by_doc[2]
    assert [r.term for r in sorted(d2, key=lambda r: r.rank)] == ["muon", "the"]
    assert all(r.n_docs == 3 for r in out)
    d1 = sorted(by_doc[1], key=lambda r: r.rank)
    assert [r.term for r in d1] == ["quark", "the"]
    # rank never exceeds top_k and scores are non-increasing per doc
    for rows in by_doc.values():
        rows = sorted(rows, key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        assert all(a.score >= b.score for a, b in zip(rows, rows[1:]))


def test_bigram_novelty_short_docs_and_rare_ratio(spark):
    from etl_global_mobility_spark.operators.text import bigram_novelty

    df = spark.createDataFrame(
        [
            (1, "alpha beta alpha beta"),   # bigrams: ab, ba, ab
            (2, "alpha beta gamma"),        # ab, bg
            (3, "solo"),                    # no bigrams
            (4, ""),                        # no tokens
            (5, None),                      # NULL text
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in bigram_novelty(df, rare_max_count=2).collect()}
    assert set(out) == {1, 2, 3, 4, 5}
    # corpus counts: 'alpha beta' x3 (not rare at <=2), 'beta alpha' x1,
    # 'beta gamma' x1 (rare)
    assert out[1].n_bigrams == 3 and out[1].n_rare == 1
    assert out[2].n_bigrams == 2 and out[2].n_rare == 1
    assert out[2].novelty == 0.5
    for d in (3, 4, 5):
        assert out[d].n_bigrams == 0 and out[d].novelty == 0.0


def test_tfidf_and_novelty_are_partition_invariant(spark):
    """Both corpus-level scores must not depend on physical layout:
    the aggregations are keyed on (doc, term) / bigram, so any
    repartitioning of the input must produce the identical result."""
    from etl_global_mobility_spark.operators.text import (
        bigram_novelty,
        tfidf_top_terms,
    )

    rows = [
        (i, f"alpha beta w{i % 7} gamma w{i % 3} alpha beta") for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    a = {(r.doc_id, r.rank): (r.term, r.tf, r.df, r.n_docs, r.score)
         for r in tfidf_top_terms(df, top_k=2).collect()}
    b = {(r.doc_id, r.rank): (r.term, r.tf, r.df, r.n_docs, r.score)
         for r in tfidf_top_terms(df.repartition(13), top_k=2).collect()}
    assert a == b and len(a) == 80

    na = {r.doc_id: (r.n_bigrams, r.n_rare, r.novelty)
          for r in bigram_novelty(df).collect()}
    nb = {r.doc_id: (r.n_bigrams, r.n_rare, r.novelty)
          for r in bigram_novelty(df.repartition(13)).collect()}
    assert na == nb and len(na) == 40
    assert all(0.0 <= v[2] <= 1.0 for v in na.values())


def test_winnowing_guarantee_shared_run_shares_fingerprint(spark):
    """The winnowing guarantee (Schleimer et al. SIGMOD'03 §2): two
    documents sharing a token run of length >= w+k-1 (= 8 for k=5,w=4)
    must share at least one selected fingerprint hash; the xor/min/max
    report alone can't show that, so this test recomputes the selected
    SETS via the same operator run on single-window documents."""
    from etl_global_mobility_spark.operators.text import (
        winnowing_fingerprints,
    )

    shared = "alpha bravo charlie delta echo foxtrot golf hotel"  # 8 toks
    rows = [
        (1, f"one two three {shared} nine ten"),
        (2, f"{shared} zulu yankee xray whiskey victor uniform"),
        (3, "completely different words with no overlap at all here"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    # per-doc fingerprint SETS: run the operator on every w-window of
    # the shared run alone is overkill — instead mark docs by their
    # xor/min/max and verify overlap via the exploded variant below
    from pyspark.sql import functions as F
    from etl_global_mobility_spark.operators.dedup import _md5_band_hash
    from etl_global_mobility_spark.operators.text import tokenize, _bind

    k, w = 5, 4

    def fps_array(text_col):
        def grams_of(ts):
            n = F.size(ts)
            return F.when(
                n >= k,
                F.transform(
                    F.sequence(F.lit(1), n - (k - 1)),
                    lambda i: F.concat_ws(" ", F.slice(ts, i, k)),
                ),
            ).otherwise(F.array().cast("array<string>"))

        return _bind(
            tokenize(F.col(text_col)),
            lambda ts: _bind(
                F.transform(grams_of(ts), lambda g: _md5_band_hash(g, 0)),
                lambda hs: F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(1), F.size(hs) - (w - 1)),
                        lambda j: F.array_min(F.slice(hs, j, w)),
                    )
                ),
            ),
        )

    sets = {
        r["doc_id"]: set(r["fps"])
        for r in df.select("doc_id", fps_array("text").alias("fps")).collect()
    }
    assert sets[1] & sets[2], "shared 8-token run must share a fingerprint"
    assert not (sets[1] & sets[3])
    assert not (sets[2] & sets[3])

    # and the registered report agrees with the raw sets on counts
    rep = {
        r["doc_id"]: r["n_fingerprints"]
        for r in winnowing_fingerprints(df).collect()
    }
    assert rep == {d: len(s) for d, s in sets.items()}


def test_winnowing_density_and_boundaries(spark):
    """Density ~2/(w+1) on long text; short-document boundary rules:
    < k tokens -> zero grams and fingerprints; k..k+w-2 tokens (< w
    grams) -> exactly one fingerprint (the global minimum)."""
    from etl_global_mobility_spark.operators.text import (
        winnowing_fingerprints,
    )

    long_text = " ".join(f"tok{i * 7919 % 997}" for i in range(400))
    rows = [
        (1, long_text),
        (2, "a b c"),            # 3 toks < k=5 -> no grams
        (3, "a b c d e f"),      # 6 toks -> 2 grams < w=4 -> 1 fp
        (4, None),               # null text -> no grams
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in winnowing_fingerprints(df).collect()}
    assert out[2]["n_grams"] == 0 and out[2]["n_fingerprints"] == 0
    assert out[2]["fp_min"] is None and out[2]["fp_density"] is None
    assert out[3]["n_grams"] == 2 and out[3]["n_fingerprints"] == 1
    assert out[4]["n_grams"] == 0 and out[4]["n_fingerprints"] == 0
    d = out[1]["fp_density"]
    assert 0.25 <= d <= 0.55, f"density {d} far from 2/(w+1)=0.4"


def test_winnowing_and_length_buckets_plan_map_only(spark):
    """Both operators must stay shuffle-free on the corpus side:
    winnowing is a pure projection (+ the inline generate); the bucket
    report's only exchange is the bounded-key aggregation. The
    winnowing shape is pinned with ``min_parallelism=None`` — the
    documented at-scale state where the small-input compute fan-out
    guard never fires (parallelism.ensure_compute_parallelism)."""
    from etl_global_mobility_spark.corpus.base import load_table
    from etl_global_mobility_spark.corpus.llm import (
        q_length_bucket_batching,
    )
    from etl_global_mobility_spark.operators.text import (
        winnowing_fingerprints,
    )

    SF = "/root/testdata/sf0.001"
    w_df = winnowing_fingerprints(
        load_table(spark, SF, "documents"), k=5, w=4, min_parallelism=None
    )
    plan_w = w_df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan_w
    assert "BatchEvalPython" not in plan_w and "ArrowEvalPython" not in plan_w
    plan_b = q_length_bucket_batching(spark, SF)._jdf.queryExecution().executedPlan().toString()
    n_shuffles = plan_b.count("Exchange") - plan_b.count("BroadcastExchange")
    assert n_shuffles <= 2  # partial agg + final agg exchange only


def test_shingle_pipelines_scale_linearly_on_long_documents(spark):
    """Regression pin for the let-binding fix: a bare array expression
    referenced inside an F.transform lambda is re-evaluated per
    element, turning shingling into O(n_tokens²) row work. On a
    5 000-token document the quadratic form needs minutes; the
    let-bound form runs in seconds. Covers _word_shingles (MinHash/
    Jaccard), _word_shingles_all (repetition), winnowing, and the
    chunker's carried token array."""
    import time

    from etl_global_mobility_spark.operators.dedup import _word_shingles
    from etl_global_mobility_spark.operators.packing import chunk_documents
    from etl_global_mobility_spark.operators.signals import (
        repetition_signals,
    )
    from etl_global_mobility_spark.operators.text import (
        winnowing_fingerprints,
    )

    long_text = " ".join(f"w{i * 6007 % 4999}" for i in range(5000))
    df = spark.createDataFrame(
        [(i, long_text) for i in range(8)], ["doc_id", "text"]
    )
    t0 = time.time()
    assert df.select(F.size(_word_shingles("text", 3)).alias("n")).collect()[0]["n"] == 4998
    winnowing_fingerprints(df).collect()
    repetition_signals(df).collect()
    assert chunk_documents(df).count() > 0
    elapsed = time.time() - t0
    assert elapsed < 60, f"shingle pipelines took {elapsed:.0f}s on 5k-token docs"


@pytest.mark.slow
def test_winnowing_neardup_soak_structural_recall(spark):
    """Scale soak for MOSS-style winnowed near-dup: 10k hash-derived
    documents with 100 planted copies sharing the 45-word PREFIX of
    their source (>> w+k-1 = 8 tokens), so by the winnowing guarantee
    recall must be 1.0 — structural, not probabilistic (the contrast
    with the MinHash soak's 0.6 floor). Also asserts zero pairs among
    unrelated base docs and a runtime budget that trips if the df-cap
    ever stops bounding the inverted-index join."""
    import time

    from pyspark.sql import functions as F

    from etl_global_mobility_spark.operators.dedup import (
        winnowing_neardup_pairs,
    )

    n, words = 10_000, 50

    def word(idc, j, vocab=4000):
        return F.concat(
            F.lit("w"), (F.pmod(F.hash(idc, j), F.lit(vocab))).cast("string")
        )

    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(words)),
                lambda j: word(F.col("id"), j),
            ),
        ).alias("text"),
    )
    src = (F.col("id") * 97) % n
    dups = spark.range(100).select(
        (F.lit(n) + F.col("id")).alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(words - 5)),
                lambda j: word(src, j),
            ),
            F.transform(
                F.sequence(F.lit(1), F.lit(5)),
                lambda j: word(F.col("id") + n, j, 997),
            ),
        ).alias("text"),
    )
    corpus = base.unionByName(dups)
    t0 = time.time()
    pairs = winnowing_neardup_pairs(
        corpus, k=5, w=4, min_shared=2, df_max=100
    ).collect()
    elapsed = time.time() - t0
    planted = {((i * 97) % n, n + i) for i in range(100)}
    got = {(r.id_a, r.id_b) for r in pairs}
    # the 45 shared prefix tokens give 41 shared grams / 38 shared
    # windows — far above min_shared=2: the guarantee makes this exact
    missing = planted - got
    assert not missing, f"winnowing guarantee violated: {sorted(missing)[:5]}"
    extras = got - planted
    assert not extras, f"false-positive pairs: {sorted(extras)[:5]}"
    assert elapsed < 120, f"winnowing soak took {elapsed:.0f}s"


def test_token_budget_sample_prefix_rule_and_partition_invariance(spark):
    """Per-shard totals never exceed the shard budget; the kept set is
    exactly each shard's hash-ordered prefix (a kept row's cum equals
    the sum of kept tokens at positions <= its own); and the cut is a
    pure function of (id, seed) — invariant under repartitioning."""
    from pyspark.sql import functions as F

    from etl_global_mobility_spark.operators.splits import (
        token_budget_sample,
    )

    docs = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), (F.pmod(F.col("id"), 37) + 1).cast("int")),
                lambda j: F.concat(F.lit("t"), j.cast("string")),
            ),
        ).alias("text"),
    )
    out = token_budget_sample(docs, token_budget=2000, n_shards=4, seed=11)
    rows = out.collect()
    per_shard = 2000 // 4
    by_shard: dict = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    assert set(by_shard) <= {0, 1, 2, 3} and by_shard
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r["pos"])
        run = 0
        # positions are a contiguous prefix 1..n and cum matches
        for i, r in enumerate(rs, start=1):
            assert r["pos"] == i, (shard, i, r)
            run += r["n_tokens"]
            assert r["cum_tokens"] == run
        assert run <= per_shard
    # partition invariance: same kept set under a different layout
    out2 = token_budget_sample(
        docs.repartition(13), token_budget=2000, n_shards=4, seed=11
    )
    assert sorted(map(tuple, rows)) == sorted(map(tuple, out2.collect()))


def test_winnowing_matches_python_reference_on_random_docs(spark):
    """Property check: the Spark winnowing chain (k-grams → md5 60-bit
    hashes → window minima → distinct) equals an independent pure-
    Python implementation of Schleimer et al.'s algorithm on random
    token sequences, including the short-document boundary rules.
    Catches any drift in gram slicing, hash derivation, window
    framing, or the let-binding rewrite."""
    import hashlib
    import random

    from etl_global_mobility_spark.operators.text import (
        winnowing_fingerprints,
    )

    k, w = 5, 4

    def py_winnow(text: str) -> set[int]:
        toks = [t for t in text.lower().strip().split() if t]
        if len(toks) < k:
            return set()
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
        hs = [
            int(hashlib.md5(f"0:{g}".encode()).hexdigest()[:15], 16)
            for g in grams
        ]
        if len(hs) < w:
            return {min(hs)}
        return {min(hs[j : j + w]) for j in range(len(hs) - w + 1)}

    rng = random.Random(20260814)
    rows = []
    for i in range(40):
        n = rng.choice([0, 1, 3, 4, 5, 6, 7, 8, 12, 40, 200])
        rows.append(
            (i, " ".join(f"v{rng.randrange(50)}" for _ in range(n)))
        )
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_fingerprints"], r["fp_min"], r["fp_max"], r["fp_xor"])
        for r in winnowing_fingerprints(df, k=k, w=w).collect()
    }
    for i, text in rows:
        ref = py_winnow(text)
        xor = 0
        for h in ref:
            xor ^= h
        want = (
            len(ref),
            min(ref) if ref else None,
            max(ref) if ref else None,
            xor,
        )
        assert got[i] == want, (i, got[i], want)


# ---------------------------------------------------------------------------
# round-6 additions: CDC chunking, unigram rarity, SFT chat format
# ---------------------------------------------------------------------------


def test_cdc_chunks_partition_tokens_exactly(spark):
    """Chunks tile the token array: contiguous, non-empty, covering."""
    from etl_global_mobility_spark.operators.text import cdc_chunks, tokenize
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog " * 20),
            (2, "short doc"),
            (3, "x"),
            (4, ""),
        ],
        "doc_id int, text string",
    )
    rows = cdc_chunks(df, k=3, mod=4).orderBy("doc_id", "chunk_idx").collect()
    n_toks = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", F.size(tokenize("text")).alias("n")
        ).collect()
    }
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 4 not in by_doc  # empty doc yields no chunks
    for doc_id, chunks in by_doc.items():
        pos = 0
        for i, c in enumerate(chunks):
            assert c["chunk_idx"] == i
            assert c["chunk_start"] == pos
            assert c["n_tokens"] >= 1
            pos += c["n_tokens"]
        assert pos == n_toks[doc_id]
    assert by_doc[3][0]["n_tokens"] == 1  # shorter than k => one chunk


def test_cdc_chunks_insertion_stability(spark):
    """The CDC property: inserting a passage mid-document preserves
    the chunk hashes of every chunk not adjacent to the edit (a
    fixed-width shingle scheme would shift them all)."""
    from etl_global_mobility_spark.operators.text import cdc_chunks

    base_tokens = [f"tok{i}" for i in range(400)]
    original = " ".join(base_tokens)
    edited = " ".join(base_tokens[:200] + ["INSERTED", "PASSAGE"] + base_tokens[200:])
    df = spark.createDataFrame(
        [(1, original), (2, edited)], "doc_id int, text string"
    )
    rows = cdc_chunks(df, k=3, mod=8).collect()
    h1 = {r["chunk_hash"] for r in rows if r["doc_id"] == 1}
    h2 = {r["chunk_hash"] for r in rows if r["doc_id"] == 2}
    shared = h1 & h2
    # every chunk except the (at most two) straddling the edit point
    # survives verbatim
    assert len(shared) >= len(h1) - 2
    assert len(shared) >= 1


def test_unigram_rarity_hand_computed(spark):
    """mean rarity = mean over tokens of N/count(term), hapax count."""
    from etl_global_mobility_spark.operators.text import unigram_rarity

    # corpus: a a a b  /  b c   => N=6; counts: a=3, b=2, c=1
    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "b c")], "doc_id int, text string"
    )
    out = {r["doc_id"]: r for r in unigram_rarity(df).collect()}
    r1 = out[1]
    assert r1["n_tokens"] == 4
    # (6/3 + 6/3 + 6/3 + 6/2) / 4 = (2+2+2+3)/4 = 2.25
    assert abs(r1["mean_rarity"] - 2.25) < 1e-9
    assert r1["max_rarity"] == 3.0
    assert r1["n_hapax"] == 0
    r2 = out[2]
    assert r2["n_tokens"] == 2
    # (6/2 + 6/1) / 2 = 4.5 ; hapax: c
    assert abs(r2["mean_rarity"] - 4.5) < 1e-9
    assert r2["max_rarity"] == 6.0
    assert r2["n_hapax"] == 1
    assert abs(r2["hapax_frac"] - 0.5) < 1e-9


def test_sft_chat_format_token_spans(spark):
    """prompt+completion spans sum to the rendered total (the \\n
    boundary guarantees no token merges), and the rendered string
    carries the ChatML scaffolding around the document text."""
    from etl_global_mobility_spark.operators.splits import sft_chat_format
    from etl_global_mobility_spark.operators.text import token_count
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(7, "Some document body here.", "en", "src0")],
        "doc_id int, text string, lang string, source string",
    )
    out = sft_chat_format(df)
    row = out.collect()[0]
    assert row["rendered"].startswith("<|im_start|>system\n")
    assert "<|im_start|>assistant\nSome document body here.<|im_end|>" in row[
        "rendered"
    ]
    assert row["total_tokens"] == row["prompt_tokens"] + row["completion_tokens"]
    recount = (
        out.select(token_count(F.col("rendered")).alias("n")).collect()[0]["n"]
    )
    assert recount == row["total_tokens"]
    assert 0.0 < row["loss_fraction"] <= 1.0


def test_unigram_rarity_partition_invariant_and_bounds(spark):
    """The micro-unit integer sum makes the mean order-independent by
    construction: any physical layout must produce the identical
    result. Also pins the analytic bounds — rarity N/cnt lies in
    [1, N], so mean_rarity does too; each doc's unique{i} token is a
    corpus hapax, forcing max_rarity = N exactly and n_hapax = 1."""
    from etl_global_mobility_spark.operators.text import unigram_rarity

    rows = [
        (i, f"alpha beta w{i % 7} gamma w{i % 3} unique{i}") for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = {r.doc_id: tuple(r)[1:] for r in unigram_rarity(df).collect()}
    b = {
        r.doc_id: tuple(r)[1:]
        for r in unigram_rarity(df.repartition(17)).collect()
    }
    assert a == b and len(a) == 60
    n_total = 6 * 60
    for n_tokens, mean_r, max_r, n_hapax, hapax_frac in a.values():
        assert n_tokens == 6
        assert 1.0 <= mean_r <= n_total
        assert max_r == n_total  # every doc holds its unique{i} hapax
        assert n_hapax == 1 and abs(hapax_frac - 1 / 6) < 1e-12


@pytest.mark.slow
def test_cdc_chunks_soak_boundary_density_and_stability(spark):
    """Scale soak for content-defined chunking: 10k hash-derived
    ~60-token documents. Pins (a) the tiling invariant corpus-wide
    (chunk token counts sum exactly to the corpus token count),
    (b) the expected-chunk-length contract of the boundary rule
    (mean chunk length within 3x of `mod` either way — the cut
    probability is 1/mod per gram), and (c) a runtime budget: the
    pipeline is one map-side projection + posexplode, so wall time
    must stay far from quadratic."""
    import time

    from pyspark.sql import functions as F

    from etl_global_mobility_spark.operators.text import cdc_chunks, tokenize

    n, words, mod = 10_000, 60, 16
    idc = F.col("doc_id")
    parts = [
        F.concat(F.lit("w"), F.pmod(F.hash(idc, F.lit(j)), F.lit(5000)).cast("string"))
        for j in range(words)
    ]
    df = spark.range(n).withColumnRenamed("id", "doc_id").select(
        "doc_id", F.concat_ws(" ", *parts).alias("text")
    )
    total_tokens = df.select(
        F.sum(F.size(tokenize("text")))
    ).collect()[0][0]

    t0 = time.monotonic()
    agg = (
        cdc_chunks(df, k=3, mod=mod)
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_tokens").alias("sum_tokens"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .collect()[0]
    )
    elapsed = time.monotonic() - t0
    assert agg["sum_tokens"] == total_tokens
    assert agg["n_docs"] == n
    mean_len = agg["sum_tokens"] / agg["n_chunks"]
    assert mod / 3 <= mean_len <= mod * 3, mean_len
    assert elapsed < 60, f"CDC soak took {elapsed:.1f}s"


def test_cdc_chunks_matches_python_reference_on_random_docs(spark):
    """Property check: the Spark CDC chain (k-gram md5 hashes → cut
    positions where hash ≡ 0 mod m → boundary pairs → chunk slices →
    chunk md5) equals an independent pure-Python implementation on
    random token sequences, including the short-document and
    empty-document boundary rules. Catches drift in gram slicing,
    hash derivation, the cut rule, boundary arithmetic, or the
    let-binding rewrite."""
    import hashlib
    import random

    from etl_global_mobility_spark.operators.text import cdc_chunks

    k, mod = 3, 8

    def py_cdc(text: str) -> list[tuple[int, int, int, str]]:
        toks = [t for t in text.lower().strip().split() if t]
        n = len(toks)
        if n >= k:
            grams = [" ".join(toks[i : i + k]) for i in range(n - k + 1)]
            hs = [
                int(hashlib.md5(f"0:{g}".encode()).hexdigest()[:15], 16)
                for g in grams
            ]
            cuts = [j + 1 for j, h in enumerate(hs) if h % mod == 0]
        else:
            cuts = []
        bounds = [0] + [j + k - 1 for j in cuts] + [n]
        out = []
        for s, e in zip(bounds, bounds[1:]):
            if e > s:
                body = " ".join(toks[s:e])
                out.append(
                    (
                        len(out),
                        s,
                        e - s,
                        hashlib.md5(body.encode()).hexdigest(),
                    )
                )
        return out

    rng = random.Random(20260815)
    rows = []
    for i in range(40):
        n = rng.choice([0, 1, 2, 3, 4, 5, 8, 16, 60, 250])
        rows.append((i, " ".join(f"v{rng.randrange(40)}" for _ in range(n))))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got: dict[int, list] = {}
    for r in cdc_chunks(df, k=k, mod=mod).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["chunk_start"], r["n_tokens"], r["chunk_hash"])
        )
    for i, text in rows:
        want = py_cdc(text)
        have = sorted(got.get(i, []))
        assert have == want, (i, have, want)


def test_kmeans_fixed_point_planted_clusters_and_invariance(spark):
    """Two well-separated planted clusters: after 2 Lloyd iterations
    every vector must sit with its planted group regardless of seed
    quality (both seeds start in cluster A; the member-mean update
    must pull one centroid across). Assignment and integer distances
    are layout-invariant by construction (integer sums + map-only
    assignment)."""
    from etl_global_mobility_spark.operators.similarity import (
        kmeans_fixed_point,
    )

    rows = []
    for i in range(8):  # cluster A near (0.1, 0.1, ...)
        rows.append((i, [0.1 + 0.001 * i] * 8))
    for i in range(8, 16):  # cluster B near (0.9, 0.9, ...)
        rows.append((i, [0.9 - 0.001 * i] * 8))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r["vec_id"]: (r["cluster_id"], r["dist_sq"])
        for r in kmeans_fixed_point(df, k=2, iters=2).collect()
    }
    a = {out[i][0] for i in range(8)}
    b = {out[i][0] for i in range(8, 16)}
    assert len(a) == 1 and len(b) == 1 and a != b
    assert all(d >= 0 for _, d in out.values())
    out2 = {
        r["vec_id"]: (r["cluster_id"], r["dist_sq"])
        for r in kmeans_fixed_point(
            df.repartition(7), k=2, iters=2
        ).collect()
    }
    assert out == out2


def test_span_corruption_reconstructs_original(spark):
    """Substituting each target span back into its input sentinel must
    reproduce the original token stream exactly, for random docs —
    the round-trip property that defines span corruption."""
    import re

    rng = random.Random(17)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    rows = [
        (i, " ".join(rng.choice(words) for _ in range(rng.randint(1, 40))))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from etl_global_mobility_spark.operators.packing import span_corruption

    out = {r["doc_id"]: r for r in span_corruption(df, 30, seed=3).collect()}
    assert set(out) == {i for i, _ in rows}
    sent = re.compile(r"<extra_id_(\d+)>")
    for doc_id, text in rows:
        r = out[doc_id]
        # parse the target into span_idx -> tokens
        parts = sent.split(r["target_text"])
        assert parts[0] == ""  # target starts with a sentinel
        spans: dict[int, str] = {}
        it = iter(parts[1:])
        for idx, body in zip(it, it):
            spans[int(idx)] = body.strip()
        closing = max(spans)
        assert spans.pop(closing) == ""  # final sentinel closes, empty
        assert closing == r["n_spans"]
        rebuilt = sent.sub(
            lambda m: spans[int(m.group(1))], r["input_text"]
        )
        original = " ".join(text.lower().split())
        assert " ".join(rebuilt.split()) == original, doc_id
        assert r["n_masked"] == sum(len(s.split()) for s in spans.values())
    # partition layout must not change anything
    out2 = {
        r["doc_id"]: (r["input_text"], r["target_text"])
        for r in span_corruption(df.repartition(13), 30, seed=3).collect()
    }
    assert out2 == {
        k: (v["input_text"], v["target_text"]) for k, v in out.items()
    }


def test_weighted_sample_intervals_and_invariance(spark):
    """Each draw must land inside its winner's cumulative-weight
    interval, draw ids are exhaustive, and the result is invariant to
    partition layout and proportional-ish to weight in aggregate."""
    from etl_global_mobility_spark.operators.splits import (
        weighted_sample_with_replacement,
    )

    rows = [(i, 1 + (i % 10) * 99) for i in range(200)]  # spread 1..892
    df = spark.createDataFrame(rows, "doc_id long, weight long")
    k = 400
    out = weighted_sample_with_replacement(df, k=k, seed=5).collect()
    assert sorted(r["draw_id"] for r in out) == list(range(k))
    total = sum(w for _, w in rows)
    for r in out:
        assert 0 <= r["t"] < total
    # heavy ids (weight 892) must be drawn far more often than weight-1
    by_w: dict[int, int] = {}
    wmap = dict(rows)
    for r in out:
        by_w[wmap[r["doc_id"]]] = by_w.get(wmap[r["doc_id"]], 0) + 1
    assert by_w.get(892, 0) > 10 * by_w.get(1, 0)
    out2 = weighted_sample_with_replacement(
        df.repartition(17), k=k, seed=5
    ).collect()
    assert sorted((r["draw_id"], r["doc_id"]) for r in out) == sorted(
        (r["draw_id"], r["doc_id"]) for r in out2
    )
    with pytest.raises(ValueError):
        weighted_sample_with_replacement(df, k=0)


def test_group_advantage_standardizes(spark):
    """Within every group the advantages must have ~zero mean and
    ~unit population std (up to micro-unit quantization); constant
    groups emit exactly 0.0."""
    import math

    from etl_global_mobility_spark.operators.splits import group_advantage

    rng = random.Random(5)
    rows = [
        (i, i % 5, rng.uniform(-2.0, 2.0) if i % 5 != 4 else 1.25)
        for i in range(250)
    ]
    df = spark.createDataFrame(rows, "doc_id long, grp int, reward double")
    out = group_advantage(df, ["grp"], reward_col="reward").collect()
    assert len(out) == 250
    by_grp: dict[int, list[float]] = {}
    for r in out:
        by_grp.setdefault(r["grp"], []).append(r["advantage"])
    for g, advs in by_grp.items():
        if g == 4:
            assert all(a == 0.0 for a in advs)  # constant-reward group
            continue
        n = len(advs)
        mean = sum(advs) / n
        var = sum((a - mean) ** 2 for a in advs) / n
        assert abs(mean) < 1e-9, (g, mean)
        assert abs(math.sqrt(var) - 1.0) < 1e-6, (g, var)
    out2 = group_advantage(
        df.repartition(11), ["grp"], reward_col="reward"
    ).collect()
    assert sorted((r["doc_id"], r["advantage"]) for r in out) == sorted(
        (r["doc_id"], r["advantage"]) for r in out2
    )


def test_dsir_resample_favors_target_like_docs(spark):
    """Importance resampling must keep target-distributed documents at
    a far higher rate than general ones, deterministically."""
    from etl_global_mobility_spark.operators.signals import (
        dsir_importance_resample,
    )

    rng = random.Random(2)
    tgt_words = ["science", "theorem", "proof", "lemma"]
    gen_words = ["cat", "dog", "run", "jump", "blue"]
    rows = []
    for i in range(200):
        pool = tgt_words if i % 4 == 0 else gen_words
        mixed = [
            rng.choice(pool if rng.random() < 0.8 else gen_words + tgt_words)
            for _ in range(20)
        ]
        rows.append((i, " ".join(mixed), "tgt" if i % 4 == 0 else "gen"))
    df = spark.createDataFrame(rows, "doc_id long, text string, domain string")
    kept = dsir_importance_resample(
        df, F.col("domain") == "tgt", n_buckets=64
    ).collect()
    tgt_kept = sum(1 for r in kept if r["doc_id"] % 4 == 0)
    gen_kept = len(kept) - tgt_kept
    assert tgt_kept / 50 > 2 * (gen_kept / 150)
    # deterministic + partition-invariant
    kept2 = dsir_importance_resample(
        df.repartition(9), F.col("domain") == "tgt", n_buckets=64
    ).collect()
    assert sorted(r["doc_id"] for r in kept) == sorted(
        r["doc_id"] for r in kept2
    )


def test_rejection_sample_top2_semantics(spark):
    """Chosen = (score DESC, id ASC) argmax, runner-up = second by the
    same order, margin = their gap; singleton groups keep NULLs."""
    from etl_global_mobility_spark.operators.splits import rejection_sample

    rows = [(i, i % 5, float((i * 7) % 13)) for i in range(25)]
    rows.append((100, 9, 3.0))
    g = spark.createDataFrame(rows, "doc_id long, grp int, reward double")
    out = {r["grp"]: r for r in rejection_sample(g, ["grp"], score_col="reward").collect()}
    assert out[9]["runner_up_id"] is None and out[9]["margin"] is None
    assert out[9]["n_candidates"] == 1 and out[9]["chosen_id"] == 100
    for gk in range(5):
        vals = [(float((i * 7) % 13), -i) for i in range(25) if i % 5 == gk]
        best = max(vals)
        second = max(v for v in vals if v != best)
        r = out[gk]
        assert r["chosen_id"] == -best[1] and r["runner_up_id"] == -second[1]
        assert abs(r["margin"] - (best[0] - second[0])) < 1e-12
        assert r["n_candidates"] == 5


@pytest.mark.slow
def test_weighted_sample_soak_proportionality_at_volume(spark):
    """Scale soak for inverse-CDF weighted sampling: 100k rows /
    10k draws (250x the oracle volume). Asserts the empirical draw
    distribution tracks the weight distribution (chi-square-ish bound
    per weight class), exhaustive unique draw ids, and a runtime
    budget that fails if the draws join ever degenerates from the
    bounded broadcast to per-draw corpus scans."""
    import time

    from etl_global_mobility_spark.operators.splits import (
        weighted_sample_with_replacement,
    )

    n, k = 100_000, 10_000
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        (1 + (F.col("id") % 10) * 99).alias("weight"),  # 1..892 classes
    )
    t0 = time.time()
    out = weighted_sample_with_replacement(df, k=k, seed=9).collect()
    elapsed = time.time() - t0
    assert len(out) == k
    assert len({r["draw_id"] for r in out}) == k
    # expected share of weight class w: n/10 rows of weight w each →
    # class mass ∝ w; compare empirical vs expected within 20%
    total_mass = sum(1 + c * 99 for c in range(10)) * (n // 10)
    by_class: dict[int, int] = {}
    for r in out:
        by_class[r["weight"]] = by_class.get(r["weight"], 0) + 1
    for c in range(10):
        w = 1 + c * 99
        expect = k * (w * (n // 10)) / total_mass
        got = by_class.get(w, 0)
        if expect >= 100:  # only classes with enough mass to be stable
            assert abs(got - expect) / expect < 0.2, (w, got, expect)
    assert elapsed < 90, f"weighted-sample soak took {elapsed:.0f}s"


@pytest.mark.slow
def test_span_corruption_soak_runtime_and_mass(spark):
    """Scale soak for span corruption: 20k docs x 200 tokens (~40x the
    oracle volume). Asserts the global masked fraction lands near
    noise_pct, every doc comes back exactly once, and a runtime budget
    that fails if the per-doc windows ever collapse to a single
    partition."""
    import time

    from etl_global_mobility_spark.operators.packing import span_corruption

    n, toks = 20_000, 200
    words = F.array(*[F.lit(f"w{i}") for i in range(50)])
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(toks)),
                lambda i: F.element_at(
                    words,
                    (
                        (F.xxhash64(F.col("id"), i) % 50 + 50) % 50 + 1
                    ).cast("int"),
                ),
            ),
        ).alias("text"),
    )
    t0 = time.time()
    agg = (
        span_corruption(df, noise_pct=15, seed=2)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_masked").alias("masked"),
            F.sum("n_spans").alias("spans"),
        )
        .collect()[0]
    )
    elapsed = time.time() - t0
    assert agg["n_docs"] == n
    frac = agg["masked"] / (n * toks)
    assert 0.13 < frac < 0.17, frac  # hash mask tracks noise_pct
    assert agg["spans"] < agg["masked"]  # consecutive masks do merge
    assert elapsed < 90, f"span-corruption soak took {elapsed:.0f}s"


def test_fim_transform_reconstructs_and_respects_rate(spark):
    """PSM re-rendering: prefix+middle+suffix tokens must equal the
    original stream for every transformed doc; raw docs pass through;
    sub-3-token docs are never transformed."""
    from etl_global_mobility_spark.operators.packing import fim_transform

    rows = [
        (i, " ".join(f"t{j}" for j in range(3 + i % 10))) for i in range(40)
    ] + [(100, "a b"), (101, "solo")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    orig = dict(rows)
    out = fim_transform(docs, fim_pct=60, seed=1).collect()
    assert {r["doc_id"] for r in out} == set(orig)
    n_psm = 0
    for r in out:
        toks = orig[r["doc_id"]].lower().split()
        assert r["n_prefix"] + r["n_middle"] + r["n_suffix"] == len(toks)
        if r["mode"] == "psm":
            n_psm += 1
            body = r["out_text"]
            assert body.startswith("<fim_prefix> ")
            p = body.split("<fim_prefix> ")[1].split(" <fim_suffix>")[0]
            s = body.split("<fim_suffix> ")[1].split(" <fim_middle>")[0]
            m = body.split("<fim_middle>")[1].strip()
            assert p.split() + m.split() + s.split() == toks, r["doc_id"]
        else:
            assert r["out_text"] == " ".join(toks)
    assert 10 < n_psm < 40  # ~60% of the 40 eligible docs
    assert all(
        r["mode"] == "raw" for r in out if r["doc_id"] in (100, 101)
    )


def test_length_bucket_overflow_gets_explicit_null_bucket(spark):
    """ADVICE r6: documents longer than the largest cap must land in
    an explicit overflow bucket (bucket_cap NULL, padded to their own
    token sum, efficiency exactly 1.0) — not be squeezed under the
    2048 cap where padded_tokens under-reports and efficiency > 1."""
    from etl_global_mobility_spark.operators.text import (
        LENGTH_BUCKET_CAPS,
        length_bucket_batching,
    )

    big = " ".join(f"w{i}" for i in range(LENGTH_BUCKET_CAPS[-1] + 100))
    big2 = " ".join(f"v{i}" for i in range(LENGTH_BUCKET_CAPS[-1] + 1))
    rows = [(1, "tiny doc"), (2, big), (3, big2)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["bucket_cap"]: r for r in length_bucket_batching(df).collect()}
    ov = out[None]
    assert ov["n_docs"] == 2
    assert ov["sum_tokens"] == (2148 + 2049)
    assert ov["padded_tokens"] == ov["sum_tokens"]
    assert ov["efficiency"] == 1.0
    # every finite bucket keeps the smallest-cap-≥-tokens invariant
    for cap, r in out.items():
        if cap is not None:
            assert r["max_tokens"] <= cap
            assert r["efficiency"] <= 1.0


def test_winnowing_overlap_denominator_is_full_fingerprint_set(spark):
    """ADVICE r6: overlap = shared / min(|A|,|B|) must measure |A|,|B|
    on the FULL fingerprint sets, not the df-capped ones — a
    boilerplate-heavy pair must not score an inflated overlap just
    because the cap stripped most of its fingerprints."""
    import random as _random

    from pyspark.sql import functions as F

    from etl_global_mobility_spark.operators.dedup import (
        winnowing_neardup_pairs,
    )
    from etl_global_mobility_spark.operators.text import winnowing_fp_array

    rng = _random.Random(7)
    boiler = " ".join(rng.choice("abcdefgh") + str(i) for i in range(40))
    passage = " ".join("shared" + str(i) for i in range(30))
    rows = []
    # docs 0..5 all carry the boilerplate → its fingerprints have
    # df = 6 > df_max = 3 and get capped out of the index
    for i in range(6):
        uniq = " ".join(f"u{i}x{j}" for j in range(30))
        extra = passage if i < 2 else ""
        rows.append((i, f"{boiler} {uniq} {extra}"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    full_sizes = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", F.size(winnowing_fp_array("text")).alias("n")
        ).collect()
    }
    pairs = {
        (r["id_a"], r["id_b"]): r
        for r in winnowing_neardup_pairs(
            docs, min_shared=2, df_max=3
        ).collect()
    }
    assert (0, 1) in pairs, "genuine shared passage must survive the cap"
    r = pairs[(0, 1)]
    expected = r["n_shared"] / min(full_sizes[0], full_sizes[1])
    assert abs(r["overlap"] - expected) < 1e-12
    # capped numerator over full denominator can never exceed 1
    assert all(p["overlap"] <= 1.0 for p in pairs.values())


def test_dsir_threshold_survives_bigint_overflow(spark):
    """ADVICE r6: (score·scale) wraps BIGINT for scores past ~9.2e12
    at scale=1e6; the DECIMAL(38,0)-widened threshold must match
    Python big-int math exactly where the old expression flipped
    negative."""
    from etl_global_mobility_spark.operators.signals import (
        _dsir_threshold_expr,
    )

    scale = 1_000_000
    mx = 10_000_000_000_000  # 1e13 — a 10M-token doc at micro=1e6
    cases = [mx, mx // 2, 9_300_000_000_000, 1]
    df = spark.createDataFrame(
        [(s, mx) for s in cases], "score bigint, _mx bigint"
    )
    got = {
        r["score"]: r["thr"]
        for r in df.select(
            "score", _dsir_threshold_expr(scale).alias("thr")
        ).collect()
    }
    for s in cases:
        assert got[s] == (s * scale) // mx, s  # Python ints never wrap
    assert got[mx] == scale  # top-scored doc: always kept


@pytest.mark.slow
def test_kmeans_large_k_literal_path_matches_unrolled(spark):
    """VERDICT r6: the unrolled per-centroid assignment expression is
    O(k·dim) generated code; the large-k literal path (centroids as
    one array Literal + indexed transform) must produce IDENTICAL
    assignments and distances — exact integer math, ties to lowest
    cid — so selection by k is purely a codegen-size decision."""
    import random as _random

    from etl_global_mobility_spark.operators.similarity import (
        kmeans_fixed_point,
    )

    rng = _random.Random(11)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(120)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    unrolled = kmeans_fixed_point(df, k=6, iters=2, large_k_threshold=10**9)
    literal = kmeans_fixed_point(df, k=6, iters=2, large_k_threshold=1)
    a = sorted(map(tuple, unrolled.collect()))
    b = sorted(map(tuple, literal.collect()))
    assert a == b
    # and the literal path actually handles k past the unrolled comfort
    # zone (smoke: one iteration at k=80 — would be ~80 subtrees unrolled)
    big = kmeans_fixed_point(df, k=80, iters=1, large_k_threshold=64)
    assert big.count() == 120
    assert big.select("cluster_id").distinct().count() <= 80


def test_ivf_trainer_literal_path_bit_identical(spark):
    """Same pin for the float trainer: dot() keeps sequential summation
    order in both paths, so trained centroids must match bit-for-bit,
    not approximately."""
    import random as _random

    from etl_global_mobility_spark.operators.similarity import (
        train_ivf_centroids,
    )

    rng = _random.Random(12)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(6)]) for i in range(90)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    unrolled = train_ivf_centroids(
        df, n_cells=5, n_iters=2, large_k_threshold=10**9
    )
    literal = train_ivf_centroids(df, n_cells=5, n_iters=2, large_k_threshold=1)
    assert unrolled == literal  # exact float equality, not approx


def test_int8_quantize_error_bound_and_plan(spark):
    """SQ8 guarantee: reconstruction error of affine int8 quantization
    is at most s/2 per element (round-to-nearest); constant vectors are
    exact; the encode pass is map-only (zero exchanges)."""
    import random as _random

    from etl_global_mobility_spark.operators.similarity import (
        int8_quantize_report,
    )

    rng = _random.Random(3)
    rows = [(i, [rng.uniform(-5, 5) for _ in range(16)]) for i in range(50)]
    rows.append((99, [2.5] * 16))  # constant vector
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in int8_quantize_report(df).collect()}
    for vid, r in out.items():
        assert r["max_abs_err"] <= r["qscale"] / 2 + 1e-12, vid
        assert r["mse"] <= (r["qscale"] / 2) ** 2 + 1e-12, vid
    assert out[99]["qscale"] == 0.0
    assert out[99]["max_abs_err"] == 0.0 and out[99]["mse"] == 0.0
    plan = int8_quantize_report(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_event_sequence_examples_semantics(spark):
    """Context = the previous context_len tokens in (ts, id) order;
    events with fewer predecessors emit nothing; same-timestamp ties
    break by id so sequences are engine- and run-stable."""
    from datetime import datetime

    from etl_global_mobility_spark.operators.temporal import (
        event_sequence_examples,
    )

    t = datetime(2024, 1, 1)
    rows = [
        # user 1: a,b,c,d in order; two events share ts (ids 2,3)
        (1, t.replace(minute=1), 1, "a"),
        (2, t.replace(minute=2), 1, "b"),
        (3, t.replace(minute=2), 1, "c"),
        (4, t.replace(minute=3), 1, "d"),
        # user 2: too short for context_len=3
        (5, t.replace(minute=1), 2, "x"),
        (6, t.replace(minute=2), 2, "y"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = event_sequence_examples(df, context_len=3).collect()
    assert len(out) == 1
    r = out[0]
    assert r["user_id"] == 1 and r["event_id"] == 4
    assert r["context"] == ["a", "b", "c"] and r["target"] == "d"
    import pytest as _pytest

    with _pytest.raises(ValueError, match="context_len"):
        event_sequence_examples(df, context_len=0)


def test_keyword_tag_token_exact_no_substring_flags(spark):
    """The Scunthorpe property: matching is token-exact, never
    substring — 'bigger' must not hit 'big'; counts are occurrences,
    distinct, and fraction."""
    from etl_global_mobility_spark.operators.text import keyword_tag_report

    rows = [
        (1, "big data big wins"),       # 2 hits, 1 distinct kw
        (2, "bigger is not big-ger"),   # 0 hits (substring / hyphen)
        (3, "slow and big"),            # 2 hits, 2 distinct
        (4, ""),                        # empty doc
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in keyword_tag_report(df, ["big", "slow"]).collect()}
    assert (out[1]["n_hits"], out[1]["n_distinct_kw"]) == (2, 1)
    assert out[1]["flagged"] is True
    assert out[2]["n_hits"] == 0 and out[2]["flagged"] is False
    assert (out[3]["n_hits"], out[3]["n_distinct_kw"]) == (2, 2)
    assert out[4]["n_hits"] == 0 and out[4]["hit_frac"] == 0.0
    assert abs(out[1]["hit_frac"] - 0.5) < 1e-12
    import pytest as _pytest

    with _pytest.raises(ValueError, match="empty keyword list"):
        keyword_tag_report(df, [])
    plan = keyword_tag_report(df, ["big"])._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # zero-shuffle map pass


def test_pmi_collocations_ordering_matches_python_reference(spark):
    """PMI integer ordering vs a pure-python big-int reference on a
    corpus with planted collocations: 'spark sql' always adjacent
    (high PMI), 'the the' frequent but independent (low PMI)."""
    import random as _random
    from collections import Counter

    from etl_global_mobility_spark.operators.text import pmi_collocations

    rng = _random.Random(17)
    docs = []
    for i in range(300):
        words = []
        for _ in range(20):
            r = rng.random()
            if r < 0.2:
                words += ["spark", "sql"]  # planted collocation
            else:
                words.append(rng.choice(["the", "a", "data", "big"]))
        docs.append((i, " ".join(words)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = pmi_collocations(df, min_count=5, top_k=10).collect()
    # python reference
    uni, bi = Counter(), Counter()
    for _, text in docs:
        ts = text.split()
        uni.update(ts)
        bi.update(zip(ts, ts[1:]))
    n = sum(uni.values())
    ref = sorted(
        (
            ((c * n * 1_000_000) // (uni[x] * uni[y]), x, y)
            for (x, y), c in bi.items()
            if c >= 5
        ),
        key=lambda t: (-t[0], t[1], t[2]),
    )[:10]
    assert [(r["x"], r["y"], r["pmi_micro"]) for r in got] == [
        (x, y, s) for s, x, y in ref
    ]
    assert got[0]["x"] == "spark" and got[0]["y"] == "sql"


def test_compression_signal_reference_parity_and_semantics(spark):
    """The ratio must equal python zlib exactly (same level), flag
    repetitive text and not prose, be partition-invariant, and leave
    empty/NULL docs unflagged with a NULL ratio."""
    import zlib

    from etl_global_mobility_spark.operators.signals import (
        compression_ratio_signal,
    )

    rows = [
        (1, "ab " * 500),
        (2, "the quick brown fox jumps over the lazy dog tonight"),
        (3, None),
        (4, ""),
        (5, "x" * 1000),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in compression_ratio_signal(df).collect()}
    for i, t in rows:
        raw = (t or "").encode("utf-8")
        assert out[i]["n_bytes"] == len(raw)
        assert out[i]["n_compressed"] == len(zlib.compress(raw, 6)), i
    assert out[1]["flagged_repetitive"] is True
    assert out[5]["flagged_repetitive"] is True
    assert out[2]["flagged_repetitive"] is False
    assert out[3]["compression_ratio"] is None
    assert out[4]["compression_ratio"] is None
    assert out[3]["flagged_repetitive"] is False
    # partition-invariant (deterministic zlib, map-only)
    again = {
        r["doc_id"]: r
        for r in compression_ratio_signal(df.repartition(5)).collect()
    }
    assert {k: tuple(v) for k, v in out.items()} == {
        k: tuple(v) for k, v in again.items()
    }


def test_cluster_balanced_sample_semantics(spark):
    """Exact-integer balancing invariants: the SMALLEST cluster keeps
    every row (h % n < n is vacuously true), larger clusters land near
    the min-cluster mass, cluster_n/min_n ride along correctly, and
    the decision is partition-layout-invariant."""
    from pyspark.sql import functions as F

    from etl_global_mobility_spark.operators.splits import (
        cluster_balanced_sample,
    )

    # cluster 0: 40 rows, cluster 1: 400 rows, cluster 2: 4000 rows
    rows = (
        [(i, 0) for i in range(40)]
        + [(100 + i, 1) for i in range(400)]
        + [(1000 + i, 2) for i in range(4000)]
    )
    df = spark.createDataFrame(rows, "doc_id long, cluster_id int")
    out = cluster_balanced_sample(df, id_col="doc_id", seed=9)
    counts = {
        r["cluster_id"]: r["n"]
        for r in out.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts[0] == 40  # min cluster keeps EVERYTHING
    # larger clusters land near min_n = 40 (hash-binomial spread)
    assert 20 <= counts[1] <= 60, counts
    assert 20 <= counts[2] <= 60, counts
    # min_n/cluster_n attached and correct
    row = out.filter(F.col("cluster_id") == 2).first()
    assert row["cluster_n"] == 4000 and row["min_n"] == 40
    # deterministic under partition layout
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(
        r["doc_id"]
        for r in cluster_balanced_sample(
            df.repartition(13), id_col="doc_id", seed=9
        ).collect()
    )
    assert a == b


def _label_propagation_reference(edges, n_iters=3):
    """Pure-Python mirror of operators/graph.py::label_propagation
    (synchronous majority vote, ties to the smallest label)."""
    from collections import Counter, defaultdict

    und = defaultdict(set)
    for s, d in edges:
        und[s].add(d)
        und[d].add(s)
    labels = {n: n for n in und}
    for _ in range(n_iters):
        new = {}
        for n, nbrs in und.items():
            counts = Counter(labels[m] for m in nbrs)
            best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
            new[n] = best[0]
        labels = new
    return labels


def test_label_propagation_matches_python_reference(spark):
    """Two triangles joined by one bridge edge: components would merge
    everything into one cluster; majority propagation must keep the
    two dense triangles as separate communities. Exact row-for-row
    match against the pure-Python synchronous reference, and
    shuffle-partition invariance (determinism under layout)."""
    from etl_global_mobility_spark.operators.dedup import dedup_components
    from etl_global_mobility_spark.operators.graph import label_propagation

    edges = [
        (1, 2), (2, 3), (1, 3),        # triangle A
        (10, 11), (11, 12), (10, 12),  # triangle B
        (3, 10),                       # bridge
    ]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.label for r in label_propagation(e, n_iters=3).collect()}
    assert got == _label_propagation_reference(edges, 3)
    # density splitting: the triangles keep distinct labels even
    # though the graph is one connected component
    assert len({got[1], got[10]}) == 2
    comp = {
        r.id: r.component
        for r in dedup_components(e, id_a="src", id_b="dst").collect()
    }
    assert len(set(comp.values())) == 1  # components: all merged

    # layout invariance: different shuffle parallelism, same labels
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        got3 = {
            r.node: r.label
            for r in label_propagation(e, n_iters=3).collect()
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert got3 == got


def test_label_propagation_tie_breaks_to_smallest_label(spark):
    """A node with equal-frequency neighbor labels adopts the SMALLEST
    (the determinism rule): star center 5 with leaves 1..4 sees four
    distinct labels, count 1 each -> takes label 1 in round one."""
    from etl_global_mobility_spark.operators.graph import label_propagation

    e = spark.createDataFrame(
        [(5, 1), (5, 2), (5, 3), (5, 4)], "src long, dst long"
    )
    got = {r.node: r.label for r in label_propagation(e, n_iters=1).collect()}
    assert got[5] == 1
    assert got[1] == 5 and got[4] == 5  # leaves all vote for the center
    assert len(got) == 5

    # n_iters=0 is the identity labeling
    got0 = {r.node: r.label for r in label_propagation(e, n_iters=0).collect()}
    assert got0 == {n: n for n in (1, 2, 3, 4, 5)}


def test_ivf_incremental_artifact_path_equals_inline_quantizer(spark):
    """q_ivf_incremental's save→load→probe loop must be bit-identical
    to handing ivf_topk the same corpus inline (the artifact is pure
    persistence, never a semantic fork), and the artifact must exist
    on disk with its manifest after the run."""
    import os

    from etl_global_mobility_spark.corpus.llm import q_ivf_incremental
    from etl_global_mobility_spark.corpus.relational import _scratch_dir
    from etl_global_mobility_spark.operators.similarity import ivf_topk

    sf = "/root/testdata/sf0.001"
    e = spark.read.parquet(f"{sf}/embeddings.parquet")
    existing = e.filter(F.col("vec_id") % 10 != 0)
    shard = e.filter(F.col("vec_id") % 10 == 0)
    inline = sorted(
        map(tuple, ivf_topk(existing, shard, n_cells=16, nprobe=2, k=5).collect())
    )
    via_artifact = sorted(map(tuple, q_ivf_incremental(spark, sf).collect()))
    assert via_artifact == inline
    path = _scratch_dir("ivf_artifact", sf)
    assert os.path.exists(os.path.join(path, "_ann_manifest.json"))


def test_ivf_incremental_empty_snapshot_returns_contract_schema(spark, tmp_path):
    """An empty existing snapshot (no vectors to quantize) must yield
    an EMPTY frame with the contract schema, not a save/shape error."""
    import os

    from etl_global_mobility_spark.corpus.llm import q_ivf_incremental

    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    spark.createDataFrame(
        [], "vec_id long, embedding array<double>, lang string"
    ).write.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    out = q_ivf_incremental(spark, sf_dir)
    assert out.count() == 0
    assert out.columns == ["q_id", "rank", "c_id", "score"]


def test_maximal_shared_substrings_exact_lengths(spark):
    """The anchor-chaining construction must reproduce Lee et al.'s
    maximal-span semantics exactly: a planted shared passage of L
    tokens reports max_len_tokens == L (never the anchor size, never
    a span-union coverage figure), sub-min_len sharing reports
    nothing, and a passage present twice in one document is two
    alignments (two spans)."""
    from etl_global_mobility_spark.operators.dedup import (
        maximal_shared_substrings,
    )

    passage = " ".join(f"p{i}" for i in range(25))  # 25 shared tokens
    short = " ".join(f"s{i}" for i in range(4))  # below min_len=5 anchors
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta {passage} gamma"),
            (2, f"{passage} delta epsilon"),
            (3, f"{short} zeta"),
            (4, f"eta {short}"),
            # doc 5 contains the passage TWICE -> two alignments vs doc 1
            (5, f"{passage} theta {passage}"),
            (6, "unrelated text entirely different words here"),
        ],
        "doc_id long, text string",
    )
    rows = {
        (r.doc_a, r.doc_b): r
        for r in maximal_shared_substrings(docs, min_len=5).collect()
    }
    assert rows[(1, 2)].max_len_tokens == 25
    assert rows[(1, 2)].n_spans == 1
    assert rows[(1, 2)].sum_span_tokens == 25
    # two alignments of the same 25-token passage
    assert rows[(1, 5)].n_spans == 2
    assert rows[(1, 5)].max_len_tokens == 25
    assert rows[(1, 5)].sum_span_tokens == 50
    # sub-min_len sharing (4 < 5 tokens) must not appear at all
    assert (3, 4) not in rows
    assert all(k[0] < k[1] for k in rows)
    # doc 6 shares nothing
    assert not any(6 in k for k in rows)


def test_maximal_shared_substrings_run_boundaries(spark):
    """Two disjoint shared runs separated by differing tokens must
    stay two spans with their own exact lengths — the island fold must
    close at every gap, including a gap of exactly one position."""
    from etl_global_mobility_spark.operators.dedup import (
        maximal_shared_substrings,
    )

    a_run = " ".join(f"a{i}" for i in range(8))  # 8 tokens
    b_run = " ".join(f"b{i}" for i in range(6))  # 6 tokens
    docs = spark.createDataFrame(
        [
            (1, f"{a_run} xxx {b_run}"),
            (2, f"{a_run} yyy {b_run}"),
        ],
        "doc_id long, text string",
    )
    rows = maximal_shared_substrings(docs, min_len=5).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_spans, r.max_len_tokens, r.sum_span_tokens) == (2, 8, 14)
    # degenerate inputs: short/empty docs vanish, never error
    empties = spark.createDataFrame(
        [(1, ""), (2, "one two"), (3, None)], "doc_id long, text string"
    )
    assert maximal_shared_substrings(empties, min_len=5).count() == 0
    with pytest.raises(ValueError):
        maximal_shared_substrings(docs, min_len=1)


def test_dup_substring_spans_finds_planted_passage_fixed_k_cannot_size(spark):
    """The corpus query's planted 200-token passage must surface as
    max_len_tokens == 200+ for planted-pair rows — the quantity the
    fixed-k operator (llm_dup_ngram_spans) structurally lacks: its
    per-doc output has no span-length column at all, only coverage."""
    from etl_global_mobility_spark.corpus.llm import q_dup_substring_spans

    sf = "/root/testdata/sf0.001"
    out = q_dup_substring_spans(spark, sf)
    planted = out.filter(
        (F.col("doc_a") % 20 == 3)
        & (F.col("doc_b") % 20 == 3)
        & (F.floor(F.col("doc_a") / 100) == F.floor(F.col("doc_b") / 100))
    )
    rows = planted.collect()
    assert rows, "no planted pairs surfaced"
    assert all(r.max_len_tokens >= 200 for r in rows)
    # and the natural corpus stays below the planted length
    natural_max = (
        out.filter(~((F.col("doc_a") % 20 == 3) & (F.col("doc_b") % 20 == 3)))
        .agg(F.max("max_len_tokens"))
        .collect()[0][0]
    )
    assert natural_max is None or natural_max < 200


def test_ivf_assign_cells_matches_inline_and_preassigned_roundtrip(spark):
    """ivf_assign_cells must be byte-identical to the assignment
    ivf_topk builds inline (same centroids), and ivf_topk fed the
    parquet-roundtripped, CELL-PARTITIONED index via `preassigned`
    must return exactly the inline results — the streaming-ingest
    contract."""
    import tempfile

    from etl_global_mobility_spark.operators.similarity import (
        guarded_sq_norm,
        ivf_assign_cells,
        ivf_topk,
    )

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    existing = e.filter(F.col("vec_id") % 10 != 0)
    shard = e.filter(F.col("vec_id") % 10 == 0)
    cents = [
        [float(x) for x in r[1]]
        for r in existing.select("vec_id", "embedding")
        .filter(guarded_sq_norm(F.col("embedding")).isNotNull())
        .orderBy("vec_id")
        .limit(16)
        .collect()
    ]
    inline = sorted(
        map(
            tuple,
            ivf_topk(
                existing, shard, n_cells=16, nprobe=2, k=5, centroids=cents
            ).collect(),
        )
    )
    with tempfile.TemporaryDirectory() as td:
        ivf_assign_cells(existing, n_cells=16, centroids=cents).write.mode(
            "overwrite"
        ).partitionBy("cell").parquet(td)
        index = spark.read.parquet(td)
        via_index = sorted(
            map(
                tuple,
                ivf_topk(
                    existing,
                    shard,
                    n_cells=16,
                    nprobe=2,
                    k=5,
                    centroids=cents,
                    preassigned=index,
                ).collect(),
            )
        )
    assert via_index == inline


def test_stream_ivf_ingest_equals_batch_twin(spark):
    """stream ≡ batch: the availableNow micro-batched ingest must
    return exactly the batch twin's rows (per-query top-k is batch-
    local against the static index, so any file split yields the same
    union)."""
    from etl_global_mobility_spark.corpus.llm import q_ivf_incremental
    from etl_global_mobility_spark.corpus.streaming import q_stream_ivf_ingest

    sf = "/root/testdata/sf0.001"
    batch = sorted(map(tuple, q_ivf_incremental(spark, sf).collect()))
    streamed = sorted(map(tuple, q_stream_ivf_ingest(spark, sf).collect()))
    assert streamed == batch
    assert len(batch) > 0


def test_stream_ivf_ingest_all_degenerate_shard_returns_empty_contract(
    spark, tmp_path
):
    """Every shard vector degenerate (zero-norm/NaN): each micro-batch
    commits zero partitions but still CREATES the sink dir, so the
    final read must use the explicit contract schema instead of
    inference — the batch twin's empty-contract behavior, streamed."""
    import os

    from etl_global_mobility_spark.corpus.streaming import q_stream_ivf_ingest

    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    dim = 8
    rows = [
        (i, [float((i + d) % 5 + 1) for d in range(dim)], "en")
        for i in range(1, 40)
        if i % 10 != 0  # valid EXISTING vectors only
    ]
    rows += [(i, [0.0] * dim, "en") for i in (10, 20, 30)]  # degenerate shard
    rows += [(40, [float("nan")] * dim, "en")]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, lang string"
    ).write.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    out = q_stream_ivf_ingest(spark, sf_dir)
    assert out.columns == ["q_id", "rank", "c_id", "score"]
    assert out.count() == 0


def test_maximal_shared_substrings_anchor_occ_cap(spark):
    """max_anchor_occ is the worst-case guard: mass boilerplate whose
    anchors exceed the cap is suppressed wholesale BEFORE the
    self-join (a single repetitive doc otherwise fans out ~occ^2 join
    rows), while rare shared passages under the cap are untouched."""
    from etl_global_mobility_spark.operators.dedup import (
        maximal_shared_substrings,
    )

    boiler = " ".join("same" for _ in range(120))  # 1 token repeated
    rare = " ".join(f"r{i}" for i in range(30))
    docs = spark.createDataFrame(
        [
            (1, boiler),
            (2, boiler),
            (3, f"{rare} tailone"),
            (4, f"headtwo {rare}"),
        ],
        "doc_id long, text string",
    )
    capped = {
        (r.doc_a, r.doc_b): r
        for r in maximal_shared_substrings(
            docs, min_len=5, max_anchor_occ=16
        ).collect()
    }
    # the repeated-token boilerplate pair is suppressed (each anchor
    # occurs 232x > 16), the rare pair survives exactly
    assert (1, 2) not in capped
    assert capped[(3, 4)].max_len_tokens == 30
    # uncapped still finds the boilerplate pair (quadratic but correct)
    uncapped = {
        (r.doc_a, r.doc_b)
        for r in maximal_shared_substrings(docs, min_len=5).collect()
    }
    assert (1, 2) in uncapped and (3, 4) in uncapped
    with pytest.raises(ValueError):
        maximal_shared_substrings(docs, min_len=5, max_anchor_occ=1)
