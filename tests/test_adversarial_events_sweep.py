"""Adversarial-events sweep: EVERY corpus query against an `events`
table rebuilt from hostile telemetry — NULL timestamps/user_ids/types,
unknown and unicode event types, epoch-zero and far-future timestamps,
out-of-order arrival, duplicated event_ids, NaN/±Inf/negative values,
and malformed / deeply-nested / oversized JSON props.

At 100 TB this is Tuesday: a client with a broken clock, a schema-less
props field someone hand-edited, an upstream replay that duplicates a
shard. The failure mode this sweep hunts is the temporal operator that
assumes clean telemetry — a sessionizer that NPEs on a NULL timestamp,
a funnel that divides by a zero step count, an OHLC downsample whose
window arithmetic overflows on year-2250 timestamps, a JSON path that
throws instead of NULLing on garbage.

Policy mirrors the other three sweeps: every query must either return
or raise an allowlisted clear ValueError. All other tables keep their
sf0.001 content; user_ids stay inside the original id range so
event<->customer joins remain populated, and enough clean telemetry
rides along that windows/sessions still form.
"""

from __future__ import annotations

import datetime as dt
import os

import pytest

BASE = dt.datetime(2024, 1, 1, 0, 0, 0)


def _adversarial_events():
    rows = []
    eid = 0

    def add(ts, user, etype, value, props):
        nonlocal eid
        rows.append((eid, ts, user, etype, value, props))
        eid += 1

    # -- clean telemetry: 8 users x view->click->purchase sessions,
    # spaced so tumbling/sliding/session windows all form --
    for u in range(8):
        for k, etype in enumerate(["view", "click", "purchase"]):
            for rep in range(3):
                add(
                    BASE + dt.timedelta(minutes=u * 7 + k * 2 + rep * 40),
                    u,
                    etype,
                    10.0 + u + k,
                    f'{{"k": {u * 10 + k}}}',
                )
    # -- NULL fields, one at a time --
    add(None, 1, "view", 5.0, '{"k": 1}')
    add(BASE + dt.timedelta(hours=1), None, "view", 5.0, '{"k": 2}')
    add(BASE + dt.timedelta(hours=1), 2, None, 5.0, '{"k": 3}')
    add(BASE + dt.timedelta(hours=1), 3, "view", None, '{"k": 4}')
    add(BASE + dt.timedelta(hours=1), 4, "view", 5.0, None)
    # -- unknown / empty / unicode event types --
    add(BASE + dt.timedelta(hours=2), 5, "téléchargement🚀", 1.0, "{}")
    add(BASE + dt.timedelta(hours=2), 6, "", 1.0, "{}")
    add(BASE + dt.timedelta(hours=2), 7, "UNKNOWN_TYPE", 1.0, "{}")
    # -- hostile timestamps: epoch zero, far past, far future,
    # sub-second jitter, exact duplicates --
    add(dt.datetime(1970, 1, 1), 0, "view", 1.0, "{}")
    add(dt.datetime(1901, 7, 4, 12, 0, 1), 1, "click", 1.0, "{}")
    add(dt.datetime(2250, 12, 31, 23, 59, 59), 2, "purchase", 1.0, "{}")
    add(BASE + dt.timedelta(microseconds=1), 3, "view", 1.0, "{}")
    add(BASE + dt.timedelta(microseconds=1), 3, "view", 1.0, "{}")
    # -- hostile values: NaN, +/-Inf, negative, huge --
    add(BASE + dt.timedelta(hours=3), 4, "purchase", float("nan"), "{}")
    add(BASE + dt.timedelta(hours=3), 5, "purchase", float("inf"), "{}")
    add(BASE + dt.timedelta(hours=3), 6, "purchase", float("-inf"), "{}")
    add(BASE + dt.timedelta(hours=3), 7, "purchase", -1e18, "{}")
    # -- hostile props JSON --
    add(BASE + dt.timedelta(hours=4), 0, "view", 1.0, "not json at all")
    add(BASE + dt.timedelta(hours=4), 1, "view", 1.0, '{"k": "strnum"}')
    add(BASE + dt.timedelta(hours=4), 2, "view", 1.0, '{"nested": ' * 50 + "1" + "}" * 50)
    add(BASE + dt.timedelta(hours=4), 3, "view", 1.0, '{"k": ' + "9" * 400 + "}")
    add(BASE + dt.timedelta(hours=4), 4, "view", 1.0, '{"big": "' + "x" * 100_000 + '"}')
    return rows


#: Queries ALLOWED to raise on this telemetry — ValueError fragments.
CLEAR_RAISE: dict[str, str] = {}


@pytest.fixture(scope="module")
def adversarial_ev_sf(spark, tmp_path_factory):
    src = "/root/testdata/sf0.001"
    dst = str(tmp_path_factory.mktemp("sf_adversarial_ev"))
    from etl_global_mobility_spark.corpus.base import TABLES

    for t in TABLES:
        if t == "events":
            continue
        spark.read.parquet(f"{src}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(os.path.join(dst, f"{t}.parquet"))
    spark.createDataFrame(
        _adversarial_events(),
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(os.path.join(dst, "events.parquet"))
    return dst


@pytest.mark.slow
def test_every_query_survives_adversarial_events(spark, adversarial_ev_sf):
    from etl_global_mobility_spark.corpus import all_queries
    from etl_global_mobility_spark.session import release_session_state

    bad: list[str] = []
    for i, (name, spec) in enumerate(all_queries().items()):
        try:
            spec.fn(spark, adversarial_ev_sf).count()
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
    assert not bad, "adversarial-events failures:\n" + "\n".join(bad)
