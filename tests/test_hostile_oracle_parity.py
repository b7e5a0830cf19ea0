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
    # r13: the streaming twin must survive the same degenerate shard
    # (its oracle is the batch twin's verbatim; the planted NaN/zero/
    # overflow vectors hit the quantizer, the cell index, AND the
    # micro-batched probe side)
    "stream_ivf_ingest",
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


# ----------------------------------------------------------- text family

TEXT_QUERIES = [
    "llm_normalize_text",
    "llm_fingerprint",
    "llm_text_stats",
    "llm_language_id",
    "llm_quality_score",
    "llm_feature_hash",
    # r13: the variable-length substring mirror tokenizes + slices
    # gram strings in both engines — NULL/empty/whitespace-only docs
    # and the 10k-char single token must vanish identically, never
    # diverge the anchor sets
    "llm_dup_substring_spans",
]


@pytest.fixture(scope="module")
def hostile_docs_sf(spark, tmp_path_factory):
    """A documents table of regex/Unicode edge cases: NULL and empty
    text, control characters, exotic Unicode whitespace, emoji + CJK +
    RTL scripts, combining marks, a 10k-char single token, digits/
    punctuation-only rows — the inputs where Java regex (Spark) and
    RE2-style regex (DuckDB) are most likely to diverge."""
    sf = str(tmp_path_factory.mktemp("hostile_docs"))
    texts = [
        None,
        "",
        "   ",
        "plain english text with several common stopwords in it",
        "the and is of to in that it was for on are with as his they",
        "tab\there\nnewline\rcarriage\x0bvtab\x0cformfeed",
        "control\x00null\x01soh\x1funit",
        "exotic      whitespace nbsp",
        "emoji \U0001F600\U0001F680 and flags \U0001F1EA\U0001F1E8 inline",
        "中文文本混合 mixed with english words",
        "مرحبا rtl arabic שלום hebrew",
        "combining áéí marks",
        "x" * 10_000,
        "1234567890 9876543210 000",
        "!!! ??? ... ;;; ::: ,,,",
        "MiXeD CaSe TeXt WiTh OdDs",
        "repeated repeated repeated repeated repeated",
        "quotes \"double\" 'single' `back` “curly”",
        "url http://example.com/path?q=1&r=2 inline",
        "unicode math ∑∏√∞ symbols",
    ]
    rows = [
        (i, t, ["en", "es", "und"][i % 3], ["web", "book"][i % 2],
         len(t) if t is not None else None)
        for i, t in enumerate(texts)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(os.path.join(sf, "documents.parquet"))
    return sf


@pytest.mark.parametrize("name", TEXT_QUERIES)
def test_text_oracles_match_spark_on_hostile_unicode(
    spark, hostile_docs_sf, name
):
    import duckdb
    import pandas as pd

    from etl_global_mobility_spark.corpus import all_queries

    spec = all_queries()[name]
    sdf = spec.fn(spark, hostile_docs_sf).toPandas()

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{hostile_docs_sf}/documents.parquet/*.parquet')"
    )
    odf = con.execute(spec.oracle).df()

    cols = sorted(sdf.columns)
    assert cols == sorted(odf.columns), (name, cols, sorted(odf.columns))
    s = sdf[cols].sort_values(cols).reset_index(drop=True)
    o = odf[cols].sort_values(cols).reset_index(drop=True)
    assert len(s) == len(o), (
        f"{name}: Spark {len(s)} rows vs oracle {len(o)}"
    )
    for c in cols:
        sv, ov = s[c].to_numpy(), o[c].to_numpy()
        if np.issubdtype(sv.dtype, np.floating):
            assert np.array_equal(sv, ov, equal_nan=True), f"{name}.{c}"
        else:
            mism = [
                (i, a, b)
                for i, (a, b) in enumerate(zip(sv.tolist(), ov.tolist()))
                if (a != b and not (pd.isna(a) and pd.isna(b)))
            ]
            assert not mism, f"{name}.{c}: {mism[:3]}"
