"""Data-layout operators (operators/layout.py): Morton-key correctness,
clustering effectiveness (file min/max tightness in every dimension),
and small-file compaction (fewer files, identical data, crash-safe
swap ordering shared with the replaceWhere sink)."""

from __future__ import annotations

import math
import os

from pyspark.sql import functions as F

from etl_global_mobility_spark.operators.layout import (
    compact_partitions,
    zorder_key,
    zorder_key_sql,
    zorder_repartition,
)


def _morton_ref(vals: list[int], bits: int) -> int:
    """Independent python reference: bit b of value i → position b*n+i."""
    n = len(vals)
    z = 0
    for i, v in enumerate(vals):
        v &= (1 << bits) - 1
        for b in range(bits):
            z |= ((v >> b) & 1) << (b * n + i)
    return z


def test_zorder_key_matches_reference_and_sql(spark):
    rows = [(x, y) for x in range(0, 64, 7) for y in range(0, 64, 11)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.select("x", "y", zorder_key(["x", "y"], bits=6).alias("z")).collect()
    }
    for (x, y), z in got.items():
        assert z == _morton_ref([x, y], 6), (x, y, z)

    # the SQL rendering computes the identical key (oracle parity)
    import duckdb

    sql = zorder_key_sql(["x", "y"], bits=6)
    for (x, y), z in got.items():
        [(zs,)] = duckdb.sql(f"SELECT {sql} FROM (SELECT {x} x, {y} y)").fetchall()
        assert zs == z


def test_zorder_clusters_both_dimensions(spark, tmp_path):
    """Z-ordered files must have tight min/max ranges in BOTH columns;
    a plain sort on x leaves y's per-file range near-full."""
    import random

    rng = random.Random(4)
    rows = [(rng.randrange(1 << 10), rng.randrange(1 << 10)) for _ in range(20_000)]
    df = spark.createDataFrame(rows, "x long, y long")

    z_path = str(tmp_path / "z")
    s_path = str(tmp_path / "s")
    zorder_repartition(df, ["x", "y"], n_partitions=16, bits=10).write.parquet(z_path)
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(s_path)

    def mean_y_span(path):
        spans = (
            spark.read.parquet(path)
            .withColumn("f", F.input_file_name())
            .groupBy("f")
            .agg((F.max("y") - F.min("y")).alias("span"))
            .collect()
        )
        return sum(r.span for r in spans) / len(spans)

    zy, sy = mean_y_span(z_path), mean_y_span(s_path)
    # plain x-sort leaves y unclustered (span ≈ full 1024); z-order
    # must cut the mean per-file y-span at least in half
    assert zy < 0.5 * sy, (zy, sy)
    # and the data survives intact
    assert spark.read.parquet(z_path).count() == 20_000


def test_compaction_reduces_files_keeps_data(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, f"d={i % 2}", float(i)) for i in range(1000)], "id long, _ignore string, v double"
    ).drop("_ignore").withColumn("day", (F.col("id") % 2).cast("string"))
    # 25 small files per partition
    df.repartition(50).write.partitionBy("day").parquet(path)

    def files_in(d):
        return [
            f
            for f in os.listdir(os.path.join(path, d))
            if f.endswith(".parquet")
        ]

    before0 = len(files_in("day=0"))
    assert before0 > 1
    stats = compact_partitions(spark, path, target_bytes=1 << 30, partition_col="day")
    assert stats["day=0"][0] == before0 and stats["day=0"][1] == 1
    assert len(files_in("day=0")) == 1
    got = spark.read.parquet(path)
    assert got.count() == 1000
    assert got.agg(F.sum("v")).collect()[0][0] == sum(float(i) for i in range(1000))
    # second run is a no-op (already compact)
    assert compact_partitions(spark, path, target_bytes=1 << 30, partition_col="day") == {}

def test_export_training_shards_manifest_matches_data(spark, tmp_path):
    """Shard export effect contract: every shard holds at most
    rows_per_shard rows, the manifest's per-shard rows/tokens sum to the
    dataset's totals, the manifest file sits next to the shards, and a
    re-export (overwrite) stays consistent."""
    import glob
    import json
    import os

    from pyspark.sql import functions as F

    from etl_global_mobility_spark.operators.layout import (
        export_training_shards,
    )

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7 + 1).alias("n_tokens")
    )
    out = str(tmp_path / "shards")
    manifest = export_training_shards(
        df, out, rows_per_shard=300, token_col="n_tokens"
    )
    assert manifest["n_rows"] == 1000
    assert manifest["total_tokens"] == sum(i % 7 + 1 for i in range(1000))
    assert manifest["n_shards"] == len(manifest["shards"]) >= 4
    assert all(e["rows"] <= 300 for e in manifest["shards"].values())
    on_disk = json.load(open(os.path.join(out, "_manifest.json")))
    assert on_disk == json.loads(json.dumps(manifest))  # tuple-free compare
    files = {
        os.path.basename(p)
        for p in glob.glob(os.path.join(out, "part-*.parquet"))
    }
    assert set(manifest["shards"]) == files
    # data survives the shard layout
    assert spark.read.parquet(out).count() == 1000
    # idempotent overwrite
    m2 = export_training_shards(df, out, rows_per_shard=300, token_col="n_tokens")
    assert m2["n_rows"] == 1000 and m2["total_tokens"] == manifest["total_tokens"]


def test_e2e_curation_to_training_shards(spark, tmp_path, sf_smoke):
    """Full pipeline closure — what a user actually runs end-to-end:
    score (quality_classifier) → keep → exact dedup → temperature-mix
    rebalance → export as manifest'd training shards. Asserts the
    volume contracts at each stage (monotone shrinking), that every
    surviving doc is a classifier-keeper and a dedup representative,
    and that the shard manifest's token total equals the kept corpus's.
    """
    import json
    import os

    from pyspark.sql import functions as F

    from etl_global_mobility_spark.operators.dedup import exact_dedup
    from etl_global_mobility_spark.operators.layout import (
        export_training_shards,
    )
    from etl_global_mobility_spark.operators.quality_rules import (
        quality_classifier,
    )
    from etl_global_mobility_spark.operators.splits import temperature_mix

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    n_raw = docs.count()

    kept = quality_classifier(docs).filter(F.col("clf_keep"))
    n_kept = kept.count()
    assert 0 < n_kept < n_raw

    deduped = exact_dedup(kept).drop("content_hash", "n_copies")
    n_dedup = deduped.count()
    assert 0 < n_dedup <= n_kept

    mixed = temperature_mix(deduped, temperature=0.5)
    n_mixed = mixed.count()
    assert 0 < n_mixed <= n_dedup

    out = str(tmp_path / "shards")
    manifest = export_training_shards(
        mixed.select("doc_id", "source", "text", "n_tokens"),
        out,
        rows_per_shard=100,
        token_col="n_tokens",
    )
    assert manifest["n_rows"] == n_mixed
    want_tokens = mixed.agg(F.sum("n_tokens")).collect()[0][0]
    assert manifest["total_tokens"] == want_tokens
    on_disk = json.load(open(os.path.join(out, "_manifest.json")))
    assert on_disk["n_rows"] == n_mixed
    # the shards are the dataset: reading them back equals the mix
    back = spark.read.parquet(out)
    assert back.count() == n_mixed
    assert {r.doc_id for r in back.select("doc_id").collect()} == {
        r.doc_id for r in mixed.select("doc_id").collect()
    }
