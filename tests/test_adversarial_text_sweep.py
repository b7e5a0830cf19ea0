"""Adversarial-text sweep: EVERY corpus query against a `documents`
table rebuilt from hostile real-world content — multi-script unicode
(CJK without spaces, RTL Arabic/Hebrew, combining diacritics, emoji +
zero-width joiners), control characters including NUL, a 50k-char
single token, whitespace-only and punctuation-only rows, pathological
repetition, and planted exact/near duplicates.

At 100 TB every one of these shapes occurs daily in a crawled corpus;
the failure mode this sweep hunts is the text operator that only works
on well-behaved ASCII prose — a tokenizer regex that returns zero
tokens and feeds a 0/0, a shingler that emits nothing for spaceless
CJK and drops the doc from a LEFT side it should survive on, a
quality scorer whose ratios assume at least one word.

Policy mirrors tests/test_empty_input_sweep.py: every query must
either return (any row count — the content is hostile, not absent) or
raise an allowlisted ValueError. Planted-duplicate semantics get spot
checks on the dedup family.

The other nine tables keep their sf0.001 content; `doc_id`s stay
inside the embeddings table's id range so document<->embedding joins
remain populated, and `source` values cycle the original src0..src19
so config-vs-data guards (llm_epoch_plan) stay satisfied.
"""

from __future__ import annotations

import os

import pytest

# fmt: off
ADVERSARIAL_TEXTS = [
    # -- planted exact duplicates (3 copies) --
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy dog",
    # -- planted near duplicates --
    "the quick brown fox jumps over the lazy cat",
    "a quick brown fox jumps over the lazy dog today",
    # -- spaceless CJK (whitespace tokenizers see ONE token) --
    "鉄道の歴史は産業革命とともに始まり世界中の都市を結んだ",
    "机器学习模型在大规模语料库上训练需要去重和质量过滤",
    # -- RTL scripts --
    "النص العربي يكتب من اليمين إلى اليسار ويحتاج معالجة خاصة",
    "טקסט בעברית נכתב מימין לשמאל עם ניקוד אופציונלי",
    # -- emoji, ZWJ sequences, skin-tone modifiers --
    "launch day 🚀🚀🚀 the team 👩🏽‍💻👨🏿‍💻 shipped it 🎉",
    "👍" * 200,
    # -- combining diacritics (NFC/NFD sensitivity) --
    "el niño come piña en el café",
    # -- zero-width characters inside words --
    "zero​width‌space‍splits﻿nothing",
    # -- control characters incl. NUL, vertical tab, bell --
    "before\x00after\x07and\x0bvertical\ttab\nnewline\rcarriage",
    # -- a 50k-char single token (no whitespace at all) --
    "x" * 50_000,
    # -- pathological repetition (one word, 2k times) --
    "spam " * 2_000,
    # -- whitespace-only / punctuation-only / numeric-only --
    "   \t\n  \r\n   ",
    "!!! ??? ... ;;; ::: --- +++ === %%% $$$ @@@",
    "3.14159 2.71828 1.41421 0 -273.15 6.022e23",
    # -- single character, and the empty-ish minimum --
    "a",
    ".",
    # -- html-ish boilerplate with urls (strip/url paths) --
    "<html><body>Click <a href='https://example.com/a?b=1&c=2'>here</a>"
    " or visit http://example.org/path/ now</body></html>",
    "Visit https://EXAMPLE.com/A?b=1 and https://example.com/a?b=1",
    # -- mixed scripts in one document --
    "English 中文 العربية עברית русский 日本語 한국어 all in one line",
    # -- quotes, escapes, and sql-ish content (oracle-string safety) --
    "it's a \"quoted\" string with \\ backslash and 'nested' quotes",
    "Robert'); DROP TABLE documents;-- (a classic)",
]
# fmt: on

#: Queries ALLOWED to raise on this corpus — none expected: the
#: content is hostile but present, embeddings/config tables unchanged.
CLEAR_RAISE: dict[str, str] = {}


@pytest.fixture(scope="module")
def adversarial_sf(spark, tmp_path_factory):
    src = "/root/testdata/sf0.001"
    dst = str(tmp_path_factory.mktemp("sf_adversarial"))
    from etl_global_mobility_spark.corpus.base import TABLES

    for t in TABLES:
        if t == "documents":
            continue
        spark.read.parquet(f"{src}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(os.path.join(dst, f"{t}.parquet"))
    rows = [
        (i, text, ["en", "zh", "ar", "he", "ja"][i % 5], f"src{i % 20}", len(text))
        for i, text in enumerate(ADVERSARIAL_TEXTS)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(os.path.join(dst, "documents.parquet"))
    return dst


@pytest.mark.slow
def test_every_query_survives_adversarial_text(spark, adversarial_sf):
    from etl_global_mobility_spark.corpus import all_queries
    from etl_global_mobility_spark.session import release_session_state

    bad: list[str] = []
    for i, (name, spec) in enumerate(all_queries().items()):
        try:
            spec.fn(spark, adversarial_sf).count()
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
    assert not bad, "adversarial-text failures:\n" + "\n".join(bad)


@pytest.mark.slow
def test_planted_duplicates_found(spark, adversarial_sf):
    """Semantics spot check: the dedup family must still FIND the
    planted duplicates amid the hostile rows, not merely survive."""
    from etl_global_mobility_spark.operators.dedup import (
        exact_dedup,
        minhash_near_duplicates,
    )

    d = spark.read.parquet(os.path.join(adversarial_sf, "documents.parquet"))
    groups = exact_dedup(d).filter("n_copies >= 3").count()
    assert groups >= 1, "the 3 planted exact copies must share one hash group"

    pairs = minhash_near_duplicates(d, jaccard_threshold=0.5)
    found = {
        frozenset((r["id_a"], r["id_b"])) for r in pairs.collect()
    }
    assert frozenset((0, 1)) in found or frozenset((0, 2)) in found, (
        "exact copies are trivially near-dups; the banded index must "
        f"surface them, got {found}"
    )
