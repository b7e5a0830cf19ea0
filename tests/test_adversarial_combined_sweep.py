"""Combined kitchen-sink sweep: EVERY corpus query against a test
directory where ALL hostile tables coexist — the adversarial
documents, embeddings, events, AND lineitem/orders from the four
single-axis sweeps, in one sf dir.

The single-axis sweeps prove each table's hostile content is survivable
in isolation; this one hunts INTERACTIONS: a document↔embedding join
where BOTH sides carry degenerate rows (alignment gate, semantic
dedup), a curation pipeline whose quality scores, embeddings, and
split assignment are all hostile at once (e2e compositions), an
events↔orders enrichment where both have NULL keys. Composition
queries are exactly where two individually-handled edge cases meet.

Same policy as every sweep: return or raise an allowlisted clear
ValueError. The builders are imported from the single-axis sweeps so
the hostile content can never drift apart.
"""

from __future__ import annotations

import os

import pytest

from tests.test_adversarial_embeddings_sweep import _adversarial_vectors
from tests.test_adversarial_events_sweep import _adversarial_events
from tests.test_adversarial_relational_sweep import (
    _hostile_lineitem,
    _hostile_orders,
)
from tests.test_adversarial_text_sweep import ADVERSARIAL_TEXTS

#: Queries ALLOWED to raise on the combined corpus — fragments.
CLEAR_RAISE: dict[str, str] = {}


@pytest.fixture(scope="module")
def adversarial_all_sf(spark, tmp_path_factory):
    src = "/root/testdata/sf0.001"
    dst = str(tmp_path_factory.mktemp("sf_adversarial_all"))
    from etl_global_mobility_spark.corpus.base import TABLES

    for t in TABLES:
        if t in ("documents", "embeddings", "events", "lineitem", "orders"):
            continue
        spark.read.parquet(f"{src}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(os.path.join(dst, f"{t}.parquet"))

    doc_rows = [
        (i, text, ["en", "zh", "ar", "he", "ja"][i % 5], f"src{i % 20}", len(text))
        for i, text in enumerate(ADVERSARIAL_TEXTS)
    ]
    spark.createDataFrame(
        doc_rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(os.path.join(dst, "documents.parquet"))

    spark.createDataFrame(
        _adversarial_vectors(),
        "vec_id long, embedding array<float>, label int",
    ).write.mode("overwrite").parquet(os.path.join(dst, "embeddings.parquet"))

    spark.createDataFrame(
        _adversarial_events(),
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(os.path.join(dst, "events.parquet"))

    li = spark.read.parquet(f"{src}/lineitem.parquet")
    li.unionByName(
        spark.createDataFrame(_hostile_lineitem(), li.schema)
    ).write.mode("overwrite").parquet(os.path.join(dst, "lineitem.parquet"))
    od = spark.read.parquet(f"{src}/orders.parquet")
    od.unionByName(
        spark.createDataFrame(_hostile_orders(), od.schema)
    ).write.mode("overwrite").parquet(os.path.join(dst, "orders.parquet"))
    return dst


@pytest.mark.slow
def test_every_query_survives_all_hostile_tables_at_once(spark, adversarial_all_sf):
    from etl_global_mobility_spark.corpus import all_queries
    from etl_global_mobility_spark.session import release_session_state

    bad: list[str] = []
    for i, (name, spec) in enumerate(all_queries().items()):
        try:
            spec.fn(spark, adversarial_all_sf).count()
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
    assert not bad, "combined-sweep failures:\n" + "\n".join(bad)
