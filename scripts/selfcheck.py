"""Strict local mirror of the driver's correctness gate.

Runs every corpus QuerySpec on Spark AND its DuckDB oracle over the same
parquet tables, then compares row count, column names, and an
order-insensitive stringified value multiset (stricter than a hash:
shows the first differing rows).

Both result sets are fetched as **pandas DataFrames** (Spark
``toPandas()``, DuckDB ``.df()``) and canonicalized with
``sort_values`` over the name-sorted columns — the same shape as the
driver's canonicalizer — so driver-only artifacts show up locally:

* DuckDB HUGEINT (uncast integer ``sum()``) lands as float64 →
  ``"123.0"`` vs Spark's int64 ``"123"`` (CORRECTNESS_r02
  ``rel_window_range_frame``);
* array-typed cells make ``sort_values`` raise ``unhashable type:
  'list'`` exactly like the driver (r02 ``parity_catalog_table_scan``).

(The previous fetchall()-based compare saw Python ints/lists and was
structurally blind to both failure modes.)

Usage: python scripts/selfcheck.py [sf_dir] [name_filter ...]
Env:   SPARK_GRAFT_SELFCHECK_THREADS (default 8) — independent queries
       run concurrently from a driver thread pool (guide §2.6: Spark's
       scheduler happily runs several jobs at once; the 261 queries
       were SERIAL only because this script called them sequentially,
       leaving most cores idle between tiny sf0.001 stages — measured
       312 s → 67 s at 8 threads with identical per-query verdicts).
       Each worker uses its own DuckDB cursor over one shared catalog;
       per-query comparison is unchanged and order-independent.
"""

from __future__ import annotations

import datetime as _dt
import decimal
import math
import os
import sys
import threading
import time

import duckdb

sys.path.insert(0, ".")

from etl_global_mobility_spark.corpus import all_queries
from etl_global_mobility_spark.corpus.base import TABLES


def canon_cell(v) -> str:
    """One pandas cell → canonical string (mirrors driver semantics)."""
    import pandas as pd

    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        # The driver's sort_values raises on these; keep the same
        # contract violation visible rather than silently stringifying.
        raise TypeError(f"unhashable array-typed cell: {v!r}")
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<null>"
    try:
        if pd.isna(v):
            return "<null>"
    except (TypeError, ValueError):
        pass
    if isinstance(v, pd.Timestamp):
        return v.isoformat(sep=" ")
    if isinstance(v, _dt.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, _dt.date):
        # DuckDB DATE arrives as midnight datetime64; Spark DateType as
        # datetime.date — normalize to the timestamp rendering.
        return v.isoformat() + " 00:00:00"
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, bool) or type(v).__name__ == "bool_":
        return "true" if v else "false"
    return str(v)


def canon_pdf(pdf) -> list[tuple[str, ...]]:
    """pandas frame → sorted list of canonical row tuples.

    Columns are name-sorted, rows sorted by all columns — raises on
    list-typed cells, like the driver's canonicalizer.
    """
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    if len(pdf):
        pdf = pdf.sort_values(cols, kind="mergesort").reset_index(drop=True)
    rows = [
        tuple(canon_cell(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    ]
    rows.sort()  # canon strings, not raw values → total order even with nulls
    return rows


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    filters = sys.argv[2:]

    from pyspark.sql import SparkSession

    # 8 task slots, overridable: measured on this box (same window,
    # back-to-back) 16 slots + the 8-thread pool was WORSE than 8
    # slots (124 s vs 85 s, sys-time 7 m vs 3 m — scheduler thrash
    # from oversubscribed tiny stages), so the default stays 8.
    cores = os.environ.get("SPARK_GRAFT_SELFCHECK_CPUS", "8")
    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName("selfcheck")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    specs = all_queries()
    if filters:
        specs = {k: v for k, v in specs.items() if any(f in k for f in filters)}

    def check_one(name, spec, cur) -> tuple[str, str]:
        """Run one query on Spark + its oracle on a DuckDB cursor;
        return (verdict, report text). Pure function of the query —
        safe to run concurrently with other queries (pinned by
        tests/test_concurrency.py's distinct-queries property)."""
        t0 = time.time()
        try:
            df = spec.fn(spark, sf_dir)
            spdf = df.toPandas()
        except Exception as e:  # noqa: BLE001
            return "fail", f"FAIL  {name}: spark error: {e}"
        if spec.oracle is None:
            return (
                "noracle",
                f"ROWS  {name}: {len(spdf)} rows (no oracle) [{time.time()-t0:.1f}s]",
            )
        try:
            opdf = cur.execute(spec.oracle).df()
        except Exception as e:  # noqa: BLE001
            return "fail", f"FAIL  {name}: oracle error: {e}"
        if sorted(spdf.columns) != sorted(opdf.columns):
            return (
                "fail",
                f"FAIL  {name}: columns {sorted(spdf.columns)} "
                f"vs oracle {sorted(opdf.columns)}",
            )
        if len(spdf) != len(opdf):
            return "fail", f"FAIL  {name}: rowcount {len(spdf)} vs oracle {len(opdf)}"
        try:
            a = canon_pdf(spdf)
            b = canon_pdf(opdf)
        except Exception as e:  # noqa: BLE001
            return "fail", f"FAIL  {name}: canonicalizer error (driver would ERR): {e}"
        if a != b:
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
            lines = [f"FAIL  {name}: value mismatch; first diffs (spark vs oracle):"]
            for x, y in diffs:
                lines.append(f"        {x}\n     vs {y}")
            return "fail", "\n".join(lines)
        return "pass", f"PASS  {name}: {len(spdf)} rows [{time.time()-t0:.1f}s]"

    # Driver thread pool over independent queries (guide §2.6). Each
    # worker gets its own DuckDB cursor (the documented multi-thread
    # pattern: cursors share the connection's catalog — the views
    # above — but execute independently). Results print as they
    # complete under a lock; the summary counts are order-free.
    n_threads = max(1, int(os.environ.get("SPARK_GRAFT_SELFCHECK_THREADS", "8")))
    counts = {"pass": 0, "fail": 0, "noracle": 0}
    out_lock = threading.Lock()
    items = list(specs.items())
    idx_lock = threading.Lock()
    next_idx = [0]

    def worker():
        cur = con.cursor()
        while True:
            with idx_lock:
                i = next_idx[0]
                if i >= len(items):
                    return
                next_idx[0] = i + 1
            name, spec = items[i]
            try:
                verdict, report = check_one(name, spec, cur)
            except Exception as e:  # noqa: BLE001 - never lose a query
                verdict, report = "fail", f"FAIL  {name}: harness error: {e}"
            with out_lock:
                counts[verdict] += 1
                print(report, flush=True)

    if n_threads == 1 or len(items) <= 1:
        worker()
    else:
        threads = [
            threading.Thread(target=worker, daemon=True)
            for _ in range(min(n_threads, len(items)))
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    n_pass, n_fail, n_noracle = counts["pass"], counts["fail"], counts["noracle"]
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
