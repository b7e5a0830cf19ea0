"""TWO-ENGINE parity under hostile vectors: the adversarial sweeps
prove Spark survives degenerate embeddings; this suite proves the
DuckDB ORACLES agree with Spark on the SAME hostile input — the gap
the round-12 review found: DuckDB sorts/compares NaN ABOVE all values,
so an unguarded mirror lets a degenerate row WIN rankings and PASS
>= thresholds that Spark's guarded plans never emit. Every
vector-similarity mirror must filter with llm._EMB_OK (the
guarded_sq_norm mirror); this test plants zero-norm, NaN-component,
and overflow vectors in both the existing and shard id-spaces and
hash-level-compares both engines.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

QUERIES = [
    "llm_cosine_topk",
    "llm_lsh_ann",
    "llm_ivf_ann",
    "llm_ivf_incremental",
    "llm_embedding_neardup",
    "llm_semantic_dedup",
]


@pytest.fixture(scope="module")
def hostile_sf(spark, tmp_path_factory):
    """A tiny embeddings table with clean rows plus planted degenerate
    vectors in BOTH the query head (vec_id < 8), the shard namespace
    (% 10 == 0), and the existing namespace."""
    sf = str(tmp_path_factory.mktemp("hostile_sf"))
    dim = 64  # the corpus contract: lsh planes are 64-dim literals
    rows = []
    for i in range(60):
        rows.append(
            (i, [float((i * 7 + d) % 11 + 1) for d in range(dim)], "en")
        )
    rows.append((3, [0.0] * dim, "en"))           # zero norm in query head
    rows.append((61, [0.0] * dim, "en"))          # zero norm, existing
    rows.append((70, [float("nan")] + [1.0] * (dim - 1), "en"))  # NaN, shard
    rows.append((63, [1e300] * dim, "en"))        # overflow, existing
    rows.append((80, None, "en"))                 # NULL embedding, shard
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, lang string"
    ).write.parquet(os.path.join(sf, "embeddings.parquet"))
    return sf


@pytest.mark.parametrize("name", QUERIES)
def test_vector_oracles_match_spark_on_degenerate_input(
    spark, hostile_sf, name
):
    import duckdb

    from etl_global_mobility_spark.corpus import all_queries

    spec = all_queries()[name]
    sdf = spec.fn(spark, hostile_sf).toPandas()

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{hostile_sf}/embeddings.parquet/*.parquet')"
    )
    odf = con.execute(spec.oracle).df()

    cols = sorted(sdf.columns)
    assert cols == sorted(odf.columns), (name, cols, sorted(odf.columns))
    s = sdf[cols].sort_values(cols).reset_index(drop=True)
    o = odf[cols].sort_values(cols).reset_index(drop=True)
    assert len(s) == len(o), (
        f"{name}: Spark {len(s)} rows vs oracle {len(o)} — a degenerate "
        "vector diverged the engines (unguarded NaN in the mirror?)"
    )
    for c in cols:
        sv, ov = s[c].to_numpy(), o[c].to_numpy()
        if np.issubdtype(sv.dtype, np.floating):
            assert np.array_equal(sv, ov, equal_nan=True), f"{name}.{c}"
        else:
            assert (sv == ov).all(), f"{name}.{c}"
