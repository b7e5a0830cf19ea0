"""Adversarial-embeddings sweep: EVERY corpus query against an
`embeddings` table rebuilt from hostile vectors — NaN and ±Inf
components, all-zero and near-zero vectors, denormal (1e-30) and huge
(1e30) magnitudes, a NULL embedding, exact duplicate vectors, and two
DIMENSION-MISMATCHED rows (32 and 128 dims in a 64-dim corpus).

At 100 TB every one of these arrives eventually: a failed upstream
encoder emits NaN, a truncated write drops half a vector, a model
change doubles the dimension mid-corpus. The failure mode this sweep
hunts is the similarity/clustering operator that assumes IEEE-clean,
fixed-dimension input — a dot product that silently poisons a top-k
ranking with NaN, a fixed-point quantizer that turns Inf into a wrong
int instead of an error, an index bucketer that crashes on a short
array.

Policy mirrors the other two sweeps (tests/test_empty_input_sweep.py,
tests/test_adversarial_text_sweep.py): every query must either return
(hostile content is still content) or raise an allowlisted clear
ValueError. The documents and relational tables keep their sf0.001
content; vec_ids stay inside the original id range so
document<->embedding joins remain populated, labels cycle the original
0..9 domain.
"""

from __future__ import annotations

import math
import os

import pytest

DIM = 64


def _unit(i: int) -> list[float]:
    """A clean deterministic vector to embed hostile rows among."""
    return [math.sin(i * 31 + j) for j in range(DIM)]


def _adversarial_vectors() -> list[tuple[int, list[float] | None, int]]:
    rows: list[tuple[int, list[float] | None, int]] = []
    # -- clean baseline population (ids 0..39; ≥32 finite rows so the
    # PQ k=32 data-derived codebook trains rather than short-circuits)
    for i in range(40):
        rows.append((i, _unit(i), i % 10))
    # -- planted exact duplicate pair (40 == 41) --
    rows.append((40, _unit(7), 4))
    rows.append((41, _unit(7), 5))
    # -- NaN: one component / all components --
    v = _unit(42); v[3] = float("nan")
    rows.append((42, v, 6))
    rows.append((43, [float("nan")] * DIM, 7))
    # -- Inf in both directions --
    v = _unit(44); v[0] = float("inf")
    rows.append((44, v, 8))
    v = _unit(45); v[-1] = float("-inf")
    rows.append((45, v, 9))
    # -- all-zero (zero norm) and near-zero / denormal magnitude --
    rows.append((46, [0.0] * DIM, 0))
    rows.append((47, [1e-30] * DIM, 1))
    # -- huge magnitude (overflows float32 squared-norm partials) --
    rows.append((48, [1e30] * DIM, 2))
    # -- NULL embedding --
    rows.append((49, None, 3))
    # -- dimension mismatches: short and long --
    rows.append((50, [1.0] * (DIM // 2), 4))
    rows.append((51, [0.5] * (DIM * 2), 5))
    # -- negative-heavy and constant vectors --
    rows.append((52, [-1.0] * DIM, 6))
    rows.append((53, [42.0] * DIM, 7))
    return rows


#: Queries ALLOWED to raise on this corpus — ValueError fragments.
CLEAR_RAISE: dict[str, str] = {}


@pytest.fixture(scope="module")
def adversarial_emb_sf(spark, tmp_path_factory):
    src = "/root/testdata/sf0.001"
    dst = str(tmp_path_factory.mktemp("sf_adversarial_emb"))
    from etl_global_mobility_spark.corpus.base import TABLES

    for t in TABLES:
        if t == "embeddings":
            continue
        spark.read.parquet(f"{src}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(os.path.join(dst, f"{t}.parquet"))
    spark.createDataFrame(
        _adversarial_vectors(),
        "vec_id long, embedding array<float>, label int",
    ).write.mode("overwrite").parquet(os.path.join(dst, "embeddings.parquet"))
    return dst


@pytest.mark.slow
def test_every_query_survives_adversarial_embeddings(spark, adversarial_emb_sf):
    from etl_global_mobility_spark.corpus import all_queries
    from etl_global_mobility_spark.session import release_session_state

    bad: list[str] = []
    for i, (name, spec) in enumerate(all_queries().items()):
        try:
            spec.fn(spark, adversarial_emb_sf).count()
            if name in CLEAR_RAISE:
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
    assert not bad, "adversarial-embeddings failures:\n" + "\n".join(bad)


@pytest.mark.slow
def test_exact_topk_never_ranks_nan_similarity(spark, adversarial_emb_sf):
    """Semantics spot check: a NaN-similarity candidate must never
    occupy a top-k slot (NaN would win any comparison ordering that
    sorts descending with NaN-last disabled)."""
    from etl_global_mobility_spark.operators.similarity import cosine_topk_exact

    e = spark.read.parquet(
        os.path.join(adversarial_emb_sf, "embeddings.parquet")
    )
    queries = e.filter("vec_id < 3")
    out = cosine_topk_exact(
        e, queries, k=5, id_col="vec_id", vec_col="embedding"
    ).toPandas()
    assert len(out) > 0
    assert not out["score"].isna().any(), "NaN similarity ranked into top-k"
