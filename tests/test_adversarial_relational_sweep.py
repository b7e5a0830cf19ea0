"""Adversarial-relational sweep: EVERY corpus query against lineitem
and orders tables carrying hostile rows ON TOP of the clean sf0.001
content — NULL join keys and dates, negative/NaN/±Inf quantities and
prices, magnitudes near the DECIMAL(38) exact-aggregation ceiling,
epoch-zero and year-2250 ship dates, empty and unicode flag strings,
and duplicated (orderkey, linenumber) rows.

At 100 TB the fact tables are never clean: a failed upstream join
writes NULL keys, a currency bug writes 1e300 prices, a timezone bug
writes 2250 dates. The failure mode this sweep hunts is the relational
operator that assumes referential integrity or bounded magnitudes —
an ANSI decimal overflow inside an exact-sum rewrite, a window frame
that chokes on NULL ordering keys, a join that silently drops or
duplicates under NULL-key skew.

Policy mirrors the other four sweeps: every query must either return
or raise an allowlisted clear ValueError. Appending (rather than
replacing) keeps every query's clean-data code path exercised in the
same run.
"""

from __future__ import annotations

import datetime as dt
import os

import pytest

#: Queries ALLOWED to raise on this content — ValueError fragments.
CLEAR_RAISE: dict[str, str] = {}

_EPOCH = dt.datetime(1970, 1, 1)
_FUTURE = dt.datetime(2250, 12, 31, 23, 59, 59)
_MID = dt.datetime(1995, 6, 15)


def _hostile_lineitem():
    # (orderkey, partkey, suppkey, linenumber, qty, price, disc, tax,
    #  returnflag, linestatus, shipdate)
    f = float
    return [
        # NULL join keys / dates
        (None, 1, 1, 1, 10.0, 100.0, 0.1, 0.02, "N", "O", _MID),
        (900001, None, None, 1, 10.0, 100.0, 0.1, 0.02, "N", "O", _MID),
        (900002, 1, 1, 1, 10.0, 100.0, 0.1, 0.02, "N", "O", None),
        # NaN / Inf / negative / huge numerics
        (900003, 1, 1, 1, f("nan"), 100.0, 0.1, 0.02, "N", "O", _MID),
        (900004, 1, 1, 1, 10.0, f("inf"), 0.1, 0.02, "N", "O", _MID),
        (900005, 1, 1, 1, 10.0, f("-inf"), 0.1, 0.02, "N", "O", _MID),
        (900006, 1, 1, 1, -5.0, -100.0, 0.1, 0.02, "R", "F", _MID),
        (900007, 1, 1, 1, 10.0, 1e300, 0.1, 0.02, "N", "O", _MID),
        (900008, 1, 1, 1, 1e15, 1e15, 0.99, 0.99, "N", "O", _MID),
        # NULL numerics and flags
        (900009, 1, 1, 1, None, None, None, None, None, None, _MID),
        # empty / unicode flags
        (900010, 1, 1, 1, 10.0, 100.0, 0.1, 0.02, "", "", _MID),
        (900011, 1, 1, 1, 10.0, 100.0, 0.1, 0.02, "↯", "Ω", _MID),
        # hostile dates
        (900012, 1, 1, 1, 10.0, 100.0, 0.1, 0.02, "N", "O", _EPOCH),
        (900013, 1, 1, 1, 10.0, 100.0, 0.1, 0.02, "N", "O", _FUTURE),
        # duplicated (orderkey, linenumber) pair
        (900014, 1, 1, 1, 10.0, 100.0, 0.1, 0.02, "N", "O", _MID),
        (900014, 1, 1, 1, 10.0, 100.0, 0.1, 0.02, "N", "O", _MID),
    ]


def _hostile_orders():
    f = float
    return [
        (900001, None, "O", 100.0, _MID, "1-URGENT"),
        (900002, 1, None, 100.0, _MID, "1-URGENT"),
        (900003, 1, "O", f("nan"), _MID, "1-URGENT"),
        (900004, 1, "O", f("inf"), None, "1-URGENT"),
        (900005, 1, "O", -1e300, _EPOCH, ""),
        (900006, 1, "☂", 1e300, _FUTURE, "9-超特急"),
        (None, 1, "O", 100.0, _MID, "1-URGENT"),
    ]


@pytest.fixture(scope="module")
def adversarial_rel_sf(spark, tmp_path_factory):
    src = "/root/testdata/sf0.001"
    dst = str(tmp_path_factory.mktemp("sf_adversarial_rel"))
    from etl_global_mobility_spark.corpus.base import TABLES

    for t in TABLES:
        if t in ("lineitem", "orders"):
            continue
        spark.read.parquet(f"{src}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(os.path.join(dst, f"{t}.parquet"))
    li = spark.read.parquet(f"{src}/lineitem.parquet")
    li_hostile = spark.createDataFrame(_hostile_lineitem(), li.schema)
    li.unionByName(li_hostile).write.mode("overwrite").parquet(
        os.path.join(dst, "lineitem.parquet")
    )
    od = spark.read.parquet(f"{src}/orders.parquet")
    od_hostile = spark.createDataFrame(_hostile_orders(), od.schema)
    od.unionByName(od_hostile).write.mode("overwrite").parquet(
        os.path.join(dst, "orders.parquet")
    )
    return dst


@pytest.mark.slow
def test_every_query_survives_adversarial_relational(spark, adversarial_rel_sf):
    from etl_global_mobility_spark.corpus import all_queries
    from etl_global_mobility_spark.session import release_session_state

    bad: list[str] = []
    for i, (name, spec) in enumerate(all_queries().items()):
        try:
            spec.fn(spark, adversarial_rel_sf).count()
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
    assert not bad, "adversarial-relational failures:\n" + "\n".join(bad)
