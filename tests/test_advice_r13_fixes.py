"""Pins for the three ADVICE-r13 fixes:

1. corpus/streaming.py q_stream_ivf_ingest: an EMPTY new-vector shard
   (non-empty snapshot, no vec_id % 10 == 0 rows) plans zero
   micro-batches, so the sink dir is never created — the final read
   must return the empty contract frame, not throw PATH_NOT_FOUND
   (mirroring the batch twin's empty case);
2. operators/similarity.py ivf_topk: ``preassigned`` without
   ``centroids`` is an error — the quantizer that built a persisted
   index cannot be recovered from `corpus`, and silently re-deriving
   seed centroids could probe the WRONG cells;
3. scripts/plan_perf_diff.py: a corrupt/unreadable
   PLAN_SHAPES_BASELINE.json yields the structured refusal payload,
   not a raw JSONDecodeError traceback.
"""

from __future__ import annotations

import importlib.util
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_embeddings(spark, out_dir: str, vec_ids: list[int]) -> None:
    """A tiny embeddings.parquet in the driver table layout (vec_id
    long, embedding array<float>, label int)."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    )
    rows = [
        (int(v), [float(v % 7 + 1), float(v % 3 + 1), 1.0], int(v % 4))
        for v in vec_ids
    ]
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(out_dir, "embeddings.parquet"))


@pytest.mark.slow
def test_stream_ivf_ingest_empty_shard_returns_contract_frame(
    spark, tmp_path
):
    """No vec_id % 10 == 0 rows → zero micro-batches → sink never
    created; the query must still return the empty contract frame."""
    from etl_global_mobility_spark.corpus.streaming import q_stream_ivf_ingest

    sf_dir = str(tmp_path)
    _write_embeddings(spark, sf_dir, [1, 2, 3, 4, 5, 6, 7, 8, 9, 11, 13])

    out = q_stream_ivf_ingest(spark, sf_dir)
    assert [f.name for f in out.schema.fields] == [
        "q_id",
        "rank",
        "c_id",
        "score",
    ]
    assert out.count() == 0


@pytest.mark.slow
def test_stream_ivf_ingest_nonempty_shard_still_works(spark, tmp_path):
    """Control for the guard: a shard WITH vec_id % 10 == 0 rows takes
    the normal foreachBatch path and produces per-query top-k rows."""
    from etl_global_mobility_spark.corpus.streaming import q_stream_ivf_ingest

    sf_dir = str(tmp_path)
    _write_embeddings(spark, sf_dir, list(range(1, 41)))

    out = q_stream_ivf_ingest(spark, sf_dir).toPandas()
    assert len(out) > 0
    assert set(out["q_id"]) <= {v for v in range(1, 41) if v % 10 == 0}
    assert (out["rank"] >= 1).all()


@pytest.mark.slow
def test_ivf_topk_preassigned_requires_centroids(spark, tmp_path):
    """preassigned without centroids must raise, never silently
    re-derive a quantizer that may disagree with the persisted index."""
    from etl_global_mobility_spark.operators.similarity import (
        deterministic_seed_centroids,
        ivf_assign_cells,
        ivf_topk,
    )

    sf_dir = str(tmp_path)
    _write_embeddings(spark, sf_dir, list(range(1, 21)))
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    corpus = emb.filter("vec_id % 5 != 0")
    queries = emb.filter("vec_id % 5 = 0")

    cents = deterministic_seed_centroids(corpus, n_cells=4)
    index = ivf_assign_cells(corpus, n_cells=4, centroids=cents)

    with pytest.raises(ValueError, match="preassigned"):
        ivf_topk(corpus, queries, n_cells=4, nprobe=2, k=3, preassigned=index)

    # the supported spelling (index + its own quantizer) still works
    # and equals the inline-assignment answer
    via_index = ivf_topk(
        corpus, queries, n_cells=4, nprobe=2, k=3,
        centroids=cents, preassigned=index,
    ).toPandas().sort_values(["q_id", "rank"]).reset_index(drop=True)
    inline = ivf_topk(
        corpus, queries, n_cells=4, nprobe=2, k=3, centroids=cents,
    ).toPandas().sort_values(["q_id", "rank"]).reset_index(drop=True)
    assert via_index.equals(inline)
    assert len(via_index) > 0


def _load_plan_perf_diff():
    spec = importlib.util.spec_from_file_location(
        "plan_perf_diff_r13_mod",
        os.path.join(REPO, "scripts", "plan_perf_diff.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_filtered_rebaseline_unreadable_baseline_refusal(
    tmp_path, monkeypatch
):
    """A corrupt baseline file produces the structured refusal payload
    (error + hint), not a raw JSONDecodeError."""
    mod = _load_plan_perf_diff()
    baseline = tmp_path / "PLAN_SHAPES_BASELINE.json"
    monkeypatch.setattr(mod, "BASELINE_PATH", str(baseline))

    baseline.write_text("{not valid json")
    refusal = mod._filtered_rebaseline_sf_conflict("/root/testdata/sf0.001")
    assert refusal is not None
    assert "unreadable baseline" in refusal["error"]
    assert refusal["requested_sf_dir"] == "/root/testdata/sf0.001"
    assert "--rebaseline" in refusal["hint"]

    # an unreadable file (a directory) is an OSError, same payload class
    baseline.unlink()
    baseline.mkdir()
    refusal = mod._filtered_rebaseline_sf_conflict("/root/testdata/sf0.001")
    assert refusal is not None
    assert "unreadable baseline" in refusal["error"]
