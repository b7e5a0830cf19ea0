"""Property-based tests (hypothesis) for the round-7 curation
operators — adversarial inputs beyond the fixed-seed unit tests.

Mathematical anchors being exercised:

* k-anonymity: for ANY table and ANY k ≥ 2, the suppressed release
  re-audits with zero at-risk classes, every released row's class
  kept ALL its members (suppression is class-all-or-nothing, never a
  partial trim), and audit row shares sum to exactly 1;
* event sequences: for ANY event log, the emitted examples equal a
  pure-python reconstruction from the (ts, id)-sorted per-entity
  streams — counts, contexts, and targets;
* keyword tagging: hits + misses partition the token stream — n_hits
  equals the python count for any documents and any keyword list.
"""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["en", "es", "fr"]),
            st.sampled_from(["a", "b", "c", "d"]),
        ),
        min_size=1,
        max_size=60,
    ),
    st.integers(min_value=2, max_value=6),
)
@pytest.mark.slow
def test_k_suppress_always_releases_k_anonymous_tables(spark, rows, k):
    from collections import Counter

    from etl_global_mobility_spark.operators.privacy import (
        k_anonymity_report,
        k_anonymity_suppress,
    )

    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(rows)],
        "id long, lang string, region string",
    )
    released = k_anonymity_suppress(df, ["lang", "region"], k=k)
    got = released.collect()
    # python reference: class-all-or-nothing
    classes = Counter(rows)
    want_ids = {
        i for i, key in enumerate(rows) if classes[key] >= k
    }
    assert {r["id"] for r in got} == want_ids
    if got:
        re_audit = k_anonymity_report(released, ["lang", "region"], k=k)
        audit_rows = re_audit.collect()
        assert all(not r["at_risk"] for r in audit_rows)
        assert abs(sum(r["row_share"] for r in audit_rows) - 1.0) < 1e-12


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),      # user
            st.integers(min_value=0, max_value=5),      # ts bucket
            st.sampled_from(["u", "v", "w", "x"]),      # event type
        ),
        min_size=1,
        max_size=50,
    ),
    st.integers(min_value=1, max_value=4),
)
def test_event_sequences_match_python_reconstruction(spark, rows, ctx_len):
    from datetime import datetime, timedelta

    from etl_global_mobility_spark.operators.temporal import (
        event_sequence_examples,
    )

    base = datetime(2024, 1, 1)
    data = [
        (i, base + timedelta(minutes=tsb), u, et)
        for i, (u, tsb, et) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = sorted(
        (r["user_id"], r["event_id"], tuple(r["context"]), r["target"])
        for r in event_sequence_examples(df, context_len=ctx_len).collect()
    )
    # python reference: per user, sort by (ts, id), slide the window
    want = []
    by_user: dict[int, list[tuple]] = {}
    for eid, ts, u, et in data:
        by_user.setdefault(u, []).append((ts, eid, et))
    for u, evs in by_user.items():
        evs.sort()
        for p in range(ctx_len, len(evs)):
            ctx = tuple(evs[q][2] for q in range(p - ctx_len, p))
            want.append((u, evs[p][1], ctx, evs[p][2]))
    assert got == sorted(want)


@settings(**_SETTINGS)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["big", "slow", "data", "the", "x1"]),
            min_size=0,
            max_size=25,
        ),
        min_size=1,
        max_size=30,
    ),
    st.sets(
        st.sampled_from(["big", "slow", "absent"]), min_size=1, max_size=3
    ),
)
def test_keyword_tag_counts_match_python(spark, docs, kws):
    from etl_global_mobility_spark.operators.text import keyword_tag_report

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in keyword_tag_report(df, sorted(kws)).collect()
    }
    for i, toks in enumerate(docs):
        hits = sum(1 for t in toks if t in kws)
        distinct = len({t for t in toks if t in kws})
        assert got[i]["n_hits"] == hits, (i, toks)
        assert got[i]["n_distinct_kw"] == distinct
        assert got[i]["n_tokens"] == len(toks)
        assert got[i]["flagged"] == (hits >= 1)
