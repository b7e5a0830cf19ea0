"""Temporal operators Spark lacks as built-ins: as-of join.

The as-of join (pandas ``merge_asof``, kdb ``aj``, DuckDB ``ASOF JOIN``)
matches each left row to the single most recent right row at-or-before
its timestamp, per key. Spark has no native operator; the scalable
formulation used here is the union+window merge: tag both sides, union,
and carry the latest right-row payload forward with
``last(..., ignorenulls=True)`` over a (key, time)-ordered window.

Scale: ONE shuffle of left∪right on the join key and one sort per
partition — the same cost as a sort-merge join, with no row explosion
(the naive range-join + row_number formulation explodes to every
(left, earlier-right) pair before pruning; this never materializes
pairs). Skewed keys salt the same way any keyed shuffle does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_cols: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Backward-inclusive as-of join.

    Every ``left`` row keeps all its columns plus ``right_cols`` from
    the most recent ``right`` row with the same ``on`` key and
    ``right_time <= left_time`` (NULLs when no such row). Right rows
    sharing the maximal time tie-break to the largest ``tiebreak``
    value (required for a deterministic result when times collide).

    The right payload travels as ONE struct so all carried columns come
    from the same matched row even if some are individually NULL.
    """
    payload = F.struct(*[F.col(c) for c in right_cols])
    order_tb = [F.col("__tb")] if tiebreak else []

    r = right.select(
        F.col(on).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        *(
            [F.col(tiebreak).cast("long").alias("__tb")]
            if tiebreak
            else [F.lit(0).cast("long").alias("__tb")]
        ),
        payload.alias("__payload"),
        *[F.lit(None).cast(f.dataType).alias(f"__l_{f.name}") for f in left.schema.fields],
    )
    l = left.select(
        F.col(on).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast("long").alias("__tb"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        *[F.col(f.name).alias(f"__l_{f.name}") for f in left.schema.fields],
    )
    # at equal time, right rows sort before left rows → inclusive match;
    # among equal-time right rows the largest tiebreak lands nearest the
    # left row and wins last()
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t"), F.col("__side"), *order_tb)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = r.unionByName(l).withColumn(
        "__match", F.last("__payload", ignorenulls=True).over(w)
    )
    return u.filter(F.col("__side") == 1).select(
        *[F.col(f"__l_{f.name}").alias(f.name) for f in left.schema.fields],
        *[F.col("__match").getField(c).alias(f"asof_{c}") for c in right_cols],
    )


def resample_ffill(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    step: str = "1 hour",
) -> DataFrame:
    """Resample an irregular event series onto a fixed time grid with
    forward fill: per key, one row per ``step`` between the key's first
    and last observed period, carrying the latest observation at or
    before each grid instant (NULL before the first observation).

    Same union+window shape as :func:`asof_join` — no per-pair
    explosion: the grid rows (bounded: span/step per key) union with
    the observations, ONE per-key sort orders them, and
    ``last(value, ignorenulls)`` propagates forward. Ties at the same
    instant resolve observation-before-grid, then by ``id_col`` so the
    fill is deterministic under any partitioning.
    """
    grid = (
        events.groupBy(key_col)
        .agg(
            F.date_trunc("hour", F.min(ts_col)).alias("_lo"),
            F.date_trunc("hour", F.max(ts_col)).alias("_hi"),
        )
        .select(
            key_col,
            F.explode(
                F.sequence("_lo", "_hi", F.expr(f"interval {step}"))
            ).alias(ts_col),
        )
    )
    obs = events.select(
        key_col,
        ts_col,
        F.col(value_col).alias("_v"),
        F.lit(0).alias("_flag"),
        F.col(id_col).alias("_id"),
    )
    g = grid.select(
        key_col,
        ts_col,
        F.lit(None).cast("double").alias("_v"),
        F.lit(1).alias("_flag"),
        F.lit(None).cast("long").alias("_id"),
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, "_flag", "_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = obs.unionByName(g).withColumn(
        "_fv", F.last("_v", ignorenulls=True).over(w)
    )
    return filled.filter(F.col("_flag") == 1).select(
        key_col,
        F.col(ts_col).alias("grid_ts"),
        F.col("_fv").alias("value_ffill"),
    )


def sessionize(
    events: DataFrame,
    gap: str = "5 minutes",
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Batch sessionization (gaps-and-islands): a new session starts at
    the first event of a key and whenever the gap since the previous
    event is >= ``gap`` (matching Structured Streaming's exclusive
    ``session_window`` end — see streaming/ops.py for the stream twin).

    One per-key sort, two stacked window passes (lag → running sum of
    session starts) over the SAME shuffle partitioning — Catalyst plans
    a single Exchange. Returns the input plus ``session_id`` (0-based
    per key, dense in event-time order).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col)
    gap_expr = F.expr(f"interval {gap}")
    new_sess = F.when(
        F.lag(ts_col).over(w).isNull()
        | (F.col(ts_col) >= F.lag(ts_col).over(w) + gap_expr),
        1,
    ).otherwise(0)
    return events.withColumn(
        "session_id",
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - 1,
    )


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    bucket_width: int,
    start_col: str = "start",
    end_col: str = "end",
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """All pairs of OVERLAPPING intervals between two sets — the
    interval×interval join shape (distinct from point-in-interval,
    rel_range_join_buckets): closed intervals, overlap iff
    ``a.start <= b.end AND b.start <= a.end`` (touching endpoints
    count), optionally scoped to equal ``partition_cols``.

    Scale shape: a naive formulation is a cross join with a range
    predicate — quadratic, and Spark can't hash-partition a pure
    inequality. Instead both sides explode into the fixed-width
    buckets their interval spans, and candidates meet ONLY inside a
    shared bucket (pairs ∝ local interval density). Each qualifying
    pair would match once per shared bucket, so the join keeps a pair
    only in the bucket containing the OVERLAP START
    (``floor(greatest(starts)/width)``) — exactly-once by arithmetic,
    no distinct/dedup shuffle afterward. ``bucket_width`` trades
    explode factor (long intervals → many buckets) against bucket
    collision density; size it near the typical interval length.

    Returns ``partition_cols + (a_* interval, b_* interval,
    overlap_amount)`` with integer start/end assumed (unix micros,
    epoch days... — exact arithmetic end-to-end).
    """
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive: {bucket_width}")
    keys = list(partition_cols or [])

    def bucketed(df: DataFrame, prefix: str) -> DataFrame:
        s, e = F.col(start_col), F.col(end_col)
        out = df.select(
            *keys,
            *[F.col(c).alias(f"{prefix}_{c}") for c in df.columns if c not in keys],
            F.explode(
                F.sequence(
                    F.floor(s / bucket_width), F.floor(e / bucket_width)
                )
            ).alias("_bucket"),
        )
        return out

    aa = bucketed(a, "a")
    bb = bucketed(b, "b")
    a_s, a_e = F.col(f"a_{start_col}"), F.col(f"a_{end_col}")
    b_s, b_e = F.col(f"b_{start_col}"), F.col(f"b_{end_col}")
    overlap_start = F.greatest(a_s, b_s)
    cond = (
        (a_s <= b_e)
        & (b_s <= a_e)
        # exactly-once: only the bucket holding the overlap start emits
        & (F.floor(overlap_start / bucket_width) == F.col("_bucket"))
    )
    joined = aa.join(bb, [*keys, "_bucket"]).filter(cond)
    return joined.drop("_bucket").withColumn(
        "overlap_amount", F.least(a_e, b_e) - F.greatest(a_s, b_s)
    )


def event_order_key(ts_col: str = "ts", id_col: str = "event_id") -> F.Column:
    """Unique, lexicographic-equals-numeric ordering key for
    arg-extrema over events: zero-padded (epoch_micros, event_id),
    both padded to 19 digits (the full non-negative BIGINT range, so
    no id or epoch can ever truncate).

    Domain contract (asserted by the shared oracle fragment using the
    same widths): both epoch_micros and the id are NON-NEGATIVE —
    zero-padding does not order negative numbers correctly, so
    pre-1970 timestamps or negative ids are outside the contract.
    The single definition here is shared by the batch and streaming
    OHLC operators; the SQL mirror lives in
    corpus.relational.OHLC_KEY_SQL — change both together.
    """
    return F.concat(
        F.lpad(F.unix_micros(F.col(ts_col)).cast("string"), 19, "0"),
        F.lpad(F.col(id_col).cast("string"), 19, "0"),
    )


def ohlc_aggregates(value_col: str = "value", key: F.Column | None = None):
    """The six OHLC aggregate columns (open/high/low/close/count/exact
    sum) over ``value_col`` ordered by ``key`` — shared by the batch
    (`rel_ohlc_downsample`) and streaming (`stream_ohlc_bars`) twins so
    the stream≡batch invariant rests on ONE definition."""
    k = key if key is not None else event_order_key()
    v = F.col(value_col)
    return [
        F.min_by(v, k).alias("open_v"),
        F.max(value_col).alias("high_v"),
        F.min(value_col).alias("low_v"),
        F.max_by(v, k).alias("close_v"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(v.cast("decimal(18,6)")).cast("double").alias("sum_value"),
    ]


def event_sequence_examples(
    df: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    token_col: str = "event_type",
    context_len: int = 3,
) -> DataFrame:
    """Next-event prediction examples from an event log — the
    behavioral-sequence training-data prep (SASRec-style recommenders,
    session models): for every event with at least ``context_len``
    predecessors in its entity's timeline, emit (context = the previous
    ``context_len`` tokens in order, target = this event's token).

    Ordering is total and deterministic: (ts, id) — two events in the
    same microsecond cannot swap between runs or engines.

    Scale shape: ONE shuffle on the entity key, then ``context_len``
    lag() reads over the sorted run — per-row state is ``context_len``
    values, NOT the entity's whole history (the collect_list-then-
    explode formulation holds a power user's entire timeline in one
    task's memory; lag holds a constant window regardless of how hot
    the entity is)."""
    if context_len < 1:
        raise ValueError(f"context_len must be >= 1: {context_len}")
    w = Window.partitionBy(entity_col).orderBy(ts_col, id_col)
    ctx = [
        F.lag(F.col(token_col), context_len - i).over(w)
        for i in range(context_len)
    ]
    presence = F.lag(F.col(id_col), context_len).over(w)
    return (
        df.select(
            F.col(entity_col),
            F.col(id_col),
            F.array(*ctx).alias("context"),
            F.col(token_col).alias("target"),
            presence.alias("_has_full_ctx"),
        )
        .filter(F.col("_has_full_ctx").isNotNull())
        .drop("_has_full_ctx")
    )
