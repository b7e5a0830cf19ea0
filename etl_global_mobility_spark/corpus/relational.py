"""§2B standard relational surface (SURVEY.md:197-215).

The reference implements none of these (its only dataflow verbs are
read/select/filter/drop/write — NB:469-686), so this module IS the
engine's query capability layer: joins (all types + broadcast), exact
and grouped aggregation (incl. rollup/cube/grouping sets), window
functions, sort/limit top-k, set operations, the scalar function
library (string/date/math/JSON over ``events.props``).

Determinism: aggregates over DOUBLE inputs are computed in DECIMAL
(exact, order-independent) and cast to DOUBLE only at the end; top-k
orderings always carry a unique-key tiebreak.

Scale notes (100 TB design): dimension joins (region/nation/part-by-key)
use explicit ``F.broadcast`` so no shuffle of the fact side's join keys;
fact-fact joins rely on sort-merge + AQE skew handling; top-k is
orderBy+limit which Spark plans as TakeOrderedAndProject (no global
sort materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_global_mobility_spark.corpus.base import QuerySpec, load_table
from etl_global_mobility_spark.operators.layout import (
    zorder_key_sql as _zorder_key_sql,
)

# revenue in exact decimal: price*(1-disc) has ≤4 decimals; sum is exact
_REV = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"


def _rev_col() -> F.Column:
    return F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )


# ------------------------------------------------------------- joins ----
def q_join_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: lineitem ⋈ orders ⋈ customer ⋈ broadcast(nation),
    revenue per nation. Dim side broadcast; fact joins shuffle on keys."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(_rev_col()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_join_left_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer: every customer, their order count + decimal-exact
    total spend (NULL-safe: customers without orders count 0)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")), F.lit(0)
            )
            .cast("double")
            .alias("total_spend"),
        )
    )


def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi: customers having at least one URGENT order."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti: customers with no orders at all."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_mktsegment"
    )


def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer: per-nation customer count vs supplier count (nations
    may have only one side)."""
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return c.join(s, c.c_nationkey == s.s_nationkey, "full").select(
        F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


def q_join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer: orders right-joined to lineitem keeps every lineitem
    (all match — checks the join type wiring, not nulls)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    return o.join(li, o.o_orderkey == li.l_orderkey, "right").select(
        "l_orderkey",
        "l_linenumber",
        F.col("o_orderstatus").alias("status"),
    )


def q_join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast dim chain: supplier ⋈ B(nation) ⋈ B(region) — counts per
    region name. Both dims ship with the tasks; zero fact-side shuffle
    until the final small aggregation."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )


def q_join_nonequi_self(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi condition on top of an equi key: line pairs within an
    order where the first line shipped strictly before the second."""
    a = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k"),
        F.col("l_linenumber").alias("ln_a"),
        F.col("l_shipdate").alias("ship_a"),
    )
    b = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k2"),
        F.col("l_linenumber").alias("ln_b"),
        F.col("l_shipdate").alias("ship_b"),
    )
    return (
        a.join(b, (a.k == b.k2) & (a.ship_a < b.ship_b))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


# ------------------------------------------------------- aggregation ----
def q_agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped: per (returnflag, linestatus) sums/avgs/counts,
    decimal-exact then cast double."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(_rev_col()).cast("double").alias("sum_disc_price"),
            (F.sum(qty).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact count-distinct per group (expands to two-phase agg)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (returnflag, linestatus): subtotals + grand total."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE (orderstatus, orderpriority): all grouping combinations."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("sum_price"),
        F.count(F.lit(1)).alias("n"),
    )


def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via Spark SQL (by-segment, by-nation, total)."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    return spark.sql(
        """
        SELECT c_mktsegment, c_nationkey,
               CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal,
               count(*) AS n
        FROM v_customer
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
        """
    )


# ------------------------------------------------------------ window ----
def q_window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number over (custkey / totalprice desc, orderkey) → top 3
    orders per customer. Tie-broken by unique orderkey."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "rk", "o_orderkey", "o_totalprice")
    )


def q_window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank + dense_rank over part size within brand (ties exist)."""
    p = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.col("p_size"), F.col("p_partkey"))
    wt = Window.partitionBy("p_brand").orderBy(F.col("p_size"))
    return p.select(
        "p_partkey",
        "p_brand",
        "p_size",
        F.row_number().over(w).alias("rn"),
        F.rank().over(wt).alias("rnk"),
        F.dense_rank().over(wt).alias("drnk"),
    )


def q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead of order dates per customer (analytic functions)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_orderdate").over(w).alias("prev_date"),
        F.lead("o_orderdate").over(w).alias("next_date"),
    )


def q_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Framed aggregate: running decimal-exact spend per customer,
    rows UNBOUNDED PRECEDING → CURRENT ROW."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("running_spend"),
    )


def q_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: ntile / percent_rank / cume_dist
    (+ first/last over a frame), tie-free via unique orderkey."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.first("o_orderkey").over(wf).alias("cheapest_key"),
        F.last("o_orderkey").over(wf).alias("priciest_key"),
    )


def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++). Sketches are
    engine-specific, so no SQL oracle — the property test bounds the
    relative error against the exact count instead."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )


def q_hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches (Apache DataSketches via
    ``hll_sketch_agg``): per-nation customer sketches, re-aggregated
    into a global estimate by UNIONING THE SKETCHES — the scale-native
    pattern (sketch once per partition/day, merge cheaply for any
    rollup, never rescan). Engine-specific binaries → rows-only; the
    property test bounds every estimate against exact counts."""
    c = load_table(spark, sf_dir, "customer")
    per = c.groupBy("c_nationkey").agg(
        F.hll_sketch_agg("c_custkey").alias("sk"),
        F.count_distinct("c_custkey").alias("exact_custs"),
    )
    per_nation = per.select(
        F.col("c_nationkey").cast("bigint").alias("grp"),
        F.hll_sketch_estimate("sk").alias("est_custs"),
        "exact_custs",
    )
    union_row = per.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_custs"),
        F.sum("exact_custs").alias("exact_custs"),
    ).select(F.lit(-1).cast("bigint").alias("grp"), "est_custs", "exact_custs")
    return per_nation.unionByName(union_row)


def q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view refresh: a per-customer sum/count
    aggregate table built from 6/7 of orders is folded together with
    the remaining 1/7 as a raw delta batch — WITHOUT rescanning the
    base rows. The oracle is the full re-aggregation over all orders,
    so any drift in the merge arithmetic breaks the hash. Sums ride in
    DECIMAL (exact, order-independent) and only the final value casts
    to DOUBLE."""
    from etl_global_mobility_spark.operators.merge import incremental_agg_update

    o = load_table(spark, sf_dir, "orders")
    tp = F.col("o_totalprice").cast("decimal(18,2)")
    base = (
        o.filter(F.col("o_orderkey") % 7 != 0)
        .groupBy("o_custkey")
        .agg(F.sum(tp).alias("sum_total"), F.count(F.lit(1)).alias("n_orders"))
    )
    delta = o.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_custkey", tp.alias("sum_total")
    )
    upd = incremental_agg_update(
        base, delta, keys=["o_custkey"], sums=["sum_total"], counts=["n_orders"]
    )
    return upd.select(
        "o_custkey",
        F.col("sum_total").cast("double").alias("sum_total"),
        "n_orders",
    )


def q_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly gap-fill + forward fill of each user's event-value series
    (users 0-7): one row per hour between the user's first and last
    hour, carrying the latest observation at or before the instant."""
    from etl_global_mobility_spark.operators.temporal import resample_ffill

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 8)
    return resample_ffill(ev)


def q_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch gaps-and-islands sessionization (5-minute gap) summarized
    per session — the batch twin of stream_session_windows (same
    >=-gap boundary as Spark's exclusive session_window end)."""
    from etl_global_mobility_spark.operators.temporal import sessionize

    ev = load_table(spark, sf_dir, "events")
    return (
        sessionize(ev, gap="5 minutes")
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("sess_start"),
            F.max("ts").alias("sess_end"),
        )
    )


def q_agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna sketch) beside the exact
    interpolated percentile: mergeable across partitions, bounded rank
    error (accuracy=1000 → ±0.1% rank). Sketch values are
    engine-specific → rows-only; the property test bounds the rank
    error against the exact distribution. GK's intermediate state is
    NOT user-mergeable (no sketch-once/merge-any-rollup flow) — for
    that, operators/sketch.py provides a deterministic t-digest-style
    digest with invariant-tested mergeability (tests/test_sketch.py,
    the quantile twin of rel_hll_sketch_union)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr(
            "approx_percentile(l_extendedprice, array(0.5D, 0.9D), 1000)"
        ).alias("approx_p"),
        F.expr("percentile(l_extendedprice, array(0.5D, 0.9D))").alias("exact_p"),
    ).select(
        "l_returnflag",
        F.element_at("approx_p", 1).alias("ap50"),
        F.element_at("approx_p", 2).alias("ap90"),
        F.element_at("exact_p", 1).alias("p50"),
        F.element_at("exact_p", 2).alias("p90"),
    )


def q_tdigest_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable t-digest quantile flow (operators/sketch.py — the
    user-mergeable complement to GK approx_percentile): build one
    digest per (l_returnflag, l_linestatus), FLAT-merge them into one
    digest per l_returnflag, and expand p50/p90/p99 estimates — the
    sketch-once / re-roll-any-rollup pattern that at 100 TB digests
    each (source, day) partition at ingest and answers every later
    report from O(delta)-byte rows. Deterministic end-to-end: the
    digest is a pure function of each group's value multiset and the
    merge is single-level (partition-layout- and order-invariant —
    tests/test_sketch.py), so even this rows-only query has stable
    values; it stays rows-only because no SQL engine reproduces the
    centroid structure. Hypothesis suite: weight conservation,
    merge==rollup rank bound, layout invariance."""
    from etl_global_mobility_spark.operators.sketch import (
        tdigest_build,
        tdigest_merge,
        tdigest_quantiles_df,
    )

    li = load_table(spark, sf_dir, "lineitem")
    per = tdigest_build(
        li, "l_extendedprice", ["l_returnflag", "l_linestatus"], delta=100
    )
    merged = tdigest_merge(
        per, group_cols=["l_returnflag"], delta=100
    )
    return tdigest_quantiles_df(merged, [0.5, 0.9, 0.99]).orderBy(
        "l_returnflag"
    )


def q_plan_cost_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan-shape regression report (operators/planaudit.py): the
    shuffle/broadcast/scan/Python-node counts and optimizer estimates
    of six representative corpus plans, one row each — the per-round
    plan audit (tests/test_plans.py) as a runnable engine feature. A
    release pipeline persists this report and DIFFS it: a broadcast
    turning into a shuffle join or a Python node leaking into a
    relational plan shows up here before it costs hours at 100 TB.
    Driver-side metadata only — no audited query executes."""
    from etl_global_mobility_spark.corpus import llm, udfs
    from etl_global_mobility_spark.operators.planaudit import (
        plan_shape_report,
    )

    audited = {
        "tpch_q3": q_tpch_q3_shipping_priority(spark, sf_dir),
        "revenue_by_nation": q_join_revenue_by_nation(spark, sf_dir),
        "salted_skew": q_join_salted_skew(spark, sf_dir),
        "topk_global": q_topk_global(spark, sf_dir),
        "exact_dedup": llm.q_exact_dedup(spark, sf_dir),
        "pandas_grouped_map": udfs.q_pandas_grouped_map(spark, sf_dir),
    }
    return plan_shape_report(spark, audited)


# ----------------------------------------------------- sort / set ops ----
def q_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 by (totalprice desc, orderkey) — plans as
    TakeOrderedAndProject, no full sort materialization."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT over customer key sets, tagged."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    with_urgent = (
        o.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    both = building.intersect(with_urgent).withColumn("tag", F.lit("both"))
    only_b = building.exceptAll(with_urgent).withColumn("tag", F.lit("building_only"))
    return both.unionByName(only_b)


def q_dropduplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """distinct() over a projection (set-op dedup)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


# ------------------------------------------------ scalar function lib ----
def q_scalar_string_date_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/date/math built-ins over part+orders-ish columns."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper(F.col("p_brand")).alias("brand_upper"),
        F.substring(F.col("p_name"), 1, 5).alias("name_pfx"),
        F.length(F.col("p_name")).alias("name_len"),
        F.concat_ws("::", F.col("p_brand"), F.col("p_type")).alias("brand_type"),
        (F.col("p_size") % 7).alias("size_mod"),
        F.abs(F.col("p_size") - 25).alias("size_dist"),
        F.sqrt(F.col("p_size").cast("double")).alias("size_sqrt"),
        F.floor(F.col("p_retailprice")).cast("long").alias("price_floor"),
        F.ceil(F.col("p_retailprice")).cast("long").alias("price_ceil"),
        F.regexp_extract(F.col("p_name"), r"^(\w+)", 1).alias("first_name_word"),
        F.coalesce(F.nullif(F.col("p_brand"), F.lit("Brand#13")), F.lit("OTHER")).alias(
            "brand_or_other"
        ),
        F.when(F.col("p_retailprice").cast("decimal(18,2)") > 1500, "premium")
        .otherwise("standard")
        .alias("tier"),
    )


def q_scalar_strings_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string-function block: the manipulation set the first
    scalar query doesn't touch — split_part, strpos, translate, repeat,
    lpad/rpad, reverse, levenshtein (vs a fixed probe), left/right
    slices — all with direct DuckDB counterparts (engine-portable)."""
    p = load_table(spark, sf_dir, "part")
    name = F.col("p_name")
    return p.select(
        "p_partkey",
        F.split_part(name, F.lit(" "), F.lit(2)).alias("second_word"),
        F.instr(name, "a").alias("first_a_pos"),
        F.translate(name, "aeiou", "AEIOU").alias("vowels_up"),
        F.repeat(F.col("p_brand"), 2).alias("brand_twice"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.rpad(F.col("p_brand"), 12, ".").alias("brand_rpad"),
        F.reverse(name).alias("name_rev"),
        F.levenshtein(F.col("p_brand"), F.lit("Brand#33")).alias("brand_dist"),
        F.left(name, F.lit(3)).alias("name_l3"),
        F.right(name, F.lit(3)).alias("name_r3"),
    )


def q_scalar_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date functions: trunc, extract, datediff from a fixed anchor."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", F.col("o_orderdate")).alias("order_month"),
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.datediff(F.lit("1998-12-31").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_eoy"
        ),
    )


def q_json_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction over events.props + per-type decimal-exact sums."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
    )


def q_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array functions over split part types (scalar outputs only)."""
    p = load_table(spark, sf_dir, "part")
    words = F.split(F.col("p_type"), " ")
    return p.select(
        "p_partkey",
        F.size(words).alias("n_words"),
        F.array_contains(words, "BRUSHED").alias("has_brushed"),
        F.concat_ws("-", F.array_sort(words)).alias("sorted_words"),
        F.element_at(words, 1).alias("first_word"),
    )


# -------------------------------------------- pivot / reshape / stats ----
def q_pivot_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: quantity sums by returnflag × linestatus, statuses as
    columns. Values are given explicitly — at scale this skips the
    extra distinct-value collection job pivot otherwise runs."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double"))
    )


def q_unpivot_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): wide part attributes → long (attr, val) rows."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").cast("double").alias("retailprice"),
    ).unpivot("p_partkey", ["size", "retailprice"], "attr", "val")


def q_agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (mean/variance/stddev/correlation) built
    from decimal-exact power sums, so partial-aggregation order can't
    perturb the result — the scale-correct one-pass formulation (raw
    stddev/corr over doubles is order-dependent across engines)."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("decimal(18,2)")
    d = F.col("l_discount").cast("decimal(4,2)")
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).alias("sq"),
        F.sum(q * q).alias("sq2"),
        F.sum(d).alias("sd"),
        F.sum(d * d).alias("sd2"),
        F.sum(q * d).alias("sqd"),
    )
    n = F.col("n")
    sq = F.col("sq").cast("double")
    sq2 = F.col("sq2").cast("double")
    sd = F.col("sd").cast("double")
    sd2 = F.col("sd2").cast("double")
    sqd = F.col("sqd").cast("double")
    # sample-variance guards: a single-row group divides by n-1 = 0 and
    # a constant column makes the corr denominator exactly 0 — both are
    # ANSI DIVIDE_BY_ZERO crashes unguarded; NULL matches SQL
    # var_samp/corr semantics (and DuckDB's x/0 → NULL)
    var_q = F.when(n > 1, (sq2 - sq * sq / n) / (n - F.lit(1)))
    var_d = F.when(n > 1, (sd2 - sd * sd / n) / (n - F.lit(1)))
    cov = F.when(n > 1, (sqd - sq * sd / n) / (n - F.lit(1)))
    return agg.select(
        "l_returnflag",
        n.alias("n"),
        (sq / n).alias("mean_qty"),
        var_q.alias("var_qty"),
        F.sqrt(var_q).alias("std_qty"),
        F.when(
            (var_q > 0) & (var_d > 0),
            cov / (F.sqrt(var_q) * F.sqrt(var_d)),
        ).alias("corr_qty_disc"),
    )


# --------------------------------------------------------- subqueries ----
def q_subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS: orders containing a max-quantity (≥49) line."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem")
    return spark.sql(
        """
        SELECT o_orderkey, o_orderdate FROM v_orders o
        WHERE EXISTS (SELECT 1 FROM v_lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)
        """
    )


def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery: parts within 50 of the max retail
    price (exact decimal compare)."""
    load_table(spark, sf_dir, "part").createOrReplaceTempView("v_part")
    return spark.sql(
        """
        SELECT p_partkey, p_retailprice FROM v_part
        WHERE CAST(p_retailprice AS DECIMAL(18,2)) >
              (SELECT max(CAST(p_retailprice AS DECIMAL(18,2))) - 50 FROM v_part)
        """
    )


def q_median_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete median (percentile_disc 0.5) per customer via window
    composition — rank vs count, no interpolation, so it is exact and
    engine-agnostic (interpolating percentile differs across engines)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    wc = Window.partitionBy("o_custkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .withColumn("cnt", F.count(F.lit(1)).over(wc))
        .filter(F.col("rn") == ((F.col("cnt") + 1) / 2).cast("long"))
        .select("o_custkey", F.col("o_totalprice").alias("median_price"))
    )


def q_join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigation pattern: fact side salted (deterministic
    data-derived salt), dim side exploded ×SALT so each hot key spreads
    over SALT reducers. Result is identical to the unsalted join — the
    oracle is the plain join — only the shuffle layout changes."""
    SALT = 8
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "salt", (F.col("l_linenumber") % SALT).cast("int")
    )
    o = load_table(spark, sf_dir, "orders").withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(SALT)]))
    )
    return (
        li.join(o, (li.l_orderkey == o.o_orderkey) & (li.salt == o.salt))
        .groupBy("o_orderpriority")
        .agg(
            F.sum(_rev_col()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located fact-fact join: lineitem and orders written
    once pre-hashed into the same 8 buckets on the join key, then joined
    with NO Exchange on either side (the write pays the shuffle once;
    tests/test_plans.py asserts the shuffle-free join plan). At 100 TB
    this is the difference between shuffling both fact tables per query
    and never shuffling them again. The oracle joins the original
    tables — bucketing must not change a single row."""
    from etl_global_mobility_spark.sinks.bucketing import (
        read_bucketed,
        write_bucketed,
    )

    li_tbl = _scratch_table(spark, "lineitem_bkt", sf_dir)
    o_tbl = _scratch_table(spark, "orders_bkt", sf_dir)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    write_bucketed(li, li_tbl, "l_orderkey", 8)
    write_bucketed(o, o_tbl, "o_orderkey", 8)
    lib = read_bucketed(spark, li_tbl)
    ob = read_bucketed(spark, o_tbl)
    return (
        lib.join(ob, lib.l_orderkey == ob.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
        )
    )


def q_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) clustering key over (p_size, p_partkey mod 1024)
    — the multi-dimensional data-skipping layout key
    (operators/layout.py). Pure codegen bit arithmetic; the oracle
    recomputes the identical interleave in SQL."""
    from etl_global_mobility_spark.operators.layout import zorder_key

    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        "p_size",
        zorder_key(
            [F.col("p_size").cast("long"), (F.col("p_partkey") % 1024).cast("long")],
            bits=10,
        ).alias("zkey"),
    )


def q_collect_sorted_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation: per-nation sorted customer-key list (bounded
    groups; sort_array makes the aggregation order-insensitive)."""
    c = load_table(spark, sf_dir, "customer")
    # array_join at the boundary: the driver's pandas canonicalizer
    # cannot hash list-typed cells (the collect/sort logic is unchanged).
    return c.groupBy("c_nationkey").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list("c_custkey")),
                lambda k: k.cast("string"),
            ),
            ",",
        ).alias("cust_keys"),
        F.count(F.lit(1)).alias("n"),
    )


#: SQL mirror of operators.temporal.event_order_key — 19-digit pads
#: cover the full non-negative BIGINT range (no truncation at any id
#: or epoch magnitude); change together with the Spark definition.
OHLC_KEY_SQL = (
    "lpad(CAST(epoch_us(ts) AS VARCHAR), 19, '0')"
    " || lpad(CAST(event_id AS VARCHAR), 19, '0')"
)

#: SQL mirror of operators.temporal.ohlc_aggregates — shared by the
#: batch and streaming OHLC oracle strings.
OHLC_AGGS_SQL = f"""arg_min(value, {OHLC_KEY_SQL}) AS open_v,
               max(value) AS high_v,
               min(value) AS low_v,
               arg_max(value, {OHLC_KEY_SQL}) AS close_v,
               count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value"""


def q_ohlc_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series OHLC downsampling (the metrics/market-data rollup):
    per (day, event_type) bar — opening value, high, low, closing
    value, count, exact sum. Open/close are ARG-extrema (`min_by` /
    `max_by` — value AT the earliest/latest event), not plain extrema.

    Determinism: two events can share a timestamp, so the ordering key
    is operators.temporal.event_order_key — a fixed-width zero-padded
    string of (epoch_micros, event_id), lexicographic == numeric over
    the full non-negative BIGINT range, unique by event_id; the
    oracle's arg_min/arg_max accepts the same VARCHAR key (DuckDB has
    no composite-key arg-extrema). Single hash aggregation with
    map-side partial combine — one shuffle at any scale."""
    from etl_global_mobility_spark.operators.temporal import ohlc_aggregates

    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"),
        "event_type",
    ).agg(*ohlc_aggregates())


def q_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style rollup: event counts/sums at hour AND day
    granularity in one pass via GROUPING SETS (the continuous-aggregate
    pattern — at scale this is one shuffle, not one job per granularity)."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("v_events")
    return spark.sql(
        """
        SELECT date_trunc('day', ts)  AS day,
               date_trunc('hour', ts) AS hour,
               event_type,
               count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        FROM v_events
        GROUP BY GROUPING SETS (
          (date_trunc('day', ts), date_trunc('hour', ts), event_type),
          (date_trunc('day', ts), event_type),
          (date_trunc('day', ts))
        )
        """
    )


def q_decayed_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed activity feature per user: a fixed-
    depth lag chain ``sum_{k=0..7} value[i-k] * 0.5^k`` over the
    per-user event sequence — the standard recency-weighted engagement
    signal for training-data curation.

    Portability/scale notes: the decay 0.5 makes every weight an exact
    binary fraction, and the 8-term sum is written as one explicit
    left-to-right expression, so IEEE doubles match any engine that
    mirrors the tree (a running-window EWMA would depend on the
    engine's incremental-sum order). The lag window is one shuffle on
    user_id; the chain itself is codegen arithmetic, depth bounded."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    decayed = F.coalesce(F.col("value"), F.lit(0.0))
    for k in range(1, 8):
        decayed = decayed + F.coalesce(F.lag("value", k).over(w), F.lit(0.0)) * F.lit(
            0.5**k
        )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        decayed.alias("decayed_activity"),
    )


def q_equidepth_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quantile) binning: ntile(8) per event_type over a
    totally-ordered value axis, then per-bin count/min/max — the
    complement of the fixed-width histogram (rel_histogram_prices) for
    skewed distributions. ntile's integer bucket arithmetic is exact
    and engine-portable; the (value, event_id) tie-break makes the
    assignment deterministic."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return (
        e.withColumn("bin", F.ntile(8).over(w))
        .groupBy("event_type", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
    )


def q_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT type (Spark 4.x): ``parse_json`` once
    into the binary variant encoding, then typed ``variant_get`` paths
    — at scale this beats per-access ``get_json_object`` re-parsing
    (one parse, many cheap typed reads) and is the open-table-format
    answer to schema-drifting JSON columns. ``schema_of_variant``
    introspects the stored shape."""
    e = load_table(spark, sf_dir, "events")
    v = e.withColumn("v", F.parse_json("props"))
    return (
        v.select(
            "event_type",
            F.expr("variant_get(v, '$.k', 'int')").alias("k"),
            F.expr("schema_of_variant(v)").alias("vschema"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.max("vschema").alias("variant_schema"),
        )
    )


def q_join_hinted_shuffle_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit join-strategy control: SHUFFLE_HASH hint forces a
    shuffled hash join where the planner would default to sort-merge —
    the right call when one side is modest (hash table fits) but too
    big to broadcast: it skips BOTH sort passes. The hint changes the
    physical plan only (asserted in test_plans.py); results are
    identical, which is what the oracle checks."""
    c = load_table(spark, sf_dir, "customer").hint("shuffle_hash")
    o = load_table(spark, sf_dir, "orders")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )
    )


def q_window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Navigation window functions over the full partition frame:
    first/last/nth order price per customer (ROWS UNBOUNDED PRECEDING
    AND UNBOUNDED FOLLOWING — last_value under the default frame would
    just echo the current row). Deterministic total order via the
    (date, key) tie-break."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first_value("o_totalprice").over(w).alias("first_price"),
        F.last_value("o_totalprice").over(w).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    )


def q_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy self-match (record linkage): supplier names within
    edit distance 1, candidate pairs generated per block — never
    all-pairs. The block key is the name minus its last two chars, so
    block size stays bounded (≤100 members) no matter how many
    suppliers exist — the property that makes the shape scale; real
    entity resolution would block on phonetic codes or name-token
    minhashes, but the plan is the same: block → within-block
    self-join → exact levenshtein filter. Both engines implement
    classic Levenshtein, so the integer distances are oracle-exact."""
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        "s_name",
        F.expr("substring(s_name, 1, length(s_name) - 2)").alias("blk"),
    )
    a, b = s.alias("a"), s.alias("b")
    return (
        a.join(b, "blk")
        .filter(F.col("a.s_suppkey") < F.col("b.s_suppkey"))
        .withColumn(
            "dist", F.levenshtein(F.col("a.s_name"), F.col("b.s_name"))
        )
        .filter(F.col("dist") <= 1)
        .select(
            F.col("a.s_suppkey").alias("suppkey_a"),
            F.col("b.s_suppkey").alias("suppkey_b"),
            F.col("a.s_name").alias("name_a"),
            F.col("b.s_name").alias("name_b"),
            "dist",
        )
    )


def q_recursive_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4.x `WITH RECURSIVE`): per-key halving
    chain to the root — the iterative-traversal shape (org charts,
    BOM explosions, graph reachability) expressed declaratively so
    the engine handles per-step distribution. Bounded: 256 anchor
    keys × ≤9 halvings. Complements the hash-min-propagation loop in
    operators/dedup.py:dedup_components, which handles the unbounded
    variant with explicit convergence control."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    return spark.sql(
        """
        WITH RECURSIVE chain AS (
          SELECT c_custkey AS start_key, c_custkey AS cur, 0 AS depth
          FROM v_customer WHERE c_custkey <= 256
          UNION ALL
          SELECT start_key, cur DIV 2 AS cur, depth + 1 AS depth
          FROM chain WHERE cur > 0
        )
        SELECT start_key, max(depth) AS depth_to_root,
               count(*) AS chain_len, sum(cur) AS key_path_sum
        FROM chain GROUP BY start_key
        """
    )


def q_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery (Spark 3.4+ lateral join): per
    customer, the top-3 orders by price — the "for each row, run a
    parameterized subquery" shape. Catalyst decorrelates it into a
    ranked window join (no per-row re-execution), so the same text
    that reads as a loop runs as one distributed plan; semantically
    identical to the window-function top-k (rel_window_topk_per_group)
    but exercises the decorrelation path."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("v_lat_customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_lat_orders")
    return spark.sql(
        """
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        FROM v_lat_customer c,
        LATERAL (
          SELECT o_orderkey, o_totalprice FROM v_lat_orders
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey
          LIMIT 3
        ) o
        WHERE c.c_custkey < 200
        """
    )


def q_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """listagg WITHIN GROUP (Spark 4.0, SPARK-42746): ordered string
    aggregation — deterministic because the order clause is total."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("v_la_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag,
               listagg(DISTINCT l_linestatus, ',')
                 WITHIN GROUP (ORDER BY l_linestatus) AS statuses,
               count(*) AS n
        FROM v_la_lineitem GROUP BY l_returnflag
        """
    )


def q_null_aware_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN over a subquery — the NULL-AWARE anti-join, semantically
    distinct from NOT EXISTS / left_anti (rel_join_anti): a single
    NULL in the subquery legally empties the result, so the engine
    must track both match and NULL presence. Spark plans a null-aware
    BroadcastHashJoin; DuckDB runs the identical text."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "v_naaj_customer"
    )
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_naaj_orders")
    return spark.sql(
        """
        SELECT c_custkey, c_mktsegment
        FROM v_naaj_customer
        WHERE c_custkey NOT IN (
          SELECT o_custkey FROM v_naaj_orders WHERE o_totalprice > 400000
        )
        """
    )


def q_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dataset-card statistics — the standard corpus report
    (docs, exact-dup rate, token volume, language count, mean length)
    in ONE scan + one hash aggregation; every metric integer-exact or
    a single terminal division."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.size(
        F.filter(
            F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
            lambda t: F.length(t) > 0,
        )
    )
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.count(F.lit(1)) - F.countDistinct(F.sha2(F.col("text"), 256))).alias(
                "n_exact_dups"
            ),
            F.sum(toks).alias("n_tokens"),
            F.countDistinct("lang").alias("n_langs"),
            (
                F.sum(F.length("text")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("mean_chars"),
        )
    )


def q_range_join_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi range join: events against 5-day interval buckets.
    The bucket side is tiny and broadcast, so the fact side streams
    through a nested-loop probe with no shuffle."""
    e = load_table(spark, sf_dir, "events")
    buckets = spark.range(6).select(
        F.col("id").cast("int").alias("bucket_id"),
        (F.lit("2024-01-01").cast("timestamp") + F.make_interval(days=F.col("id") * 5)).alias("b_start"),
        (F.lit("2024-01-01").cast("timestamp") + F.make_interval(days=(F.col("id") + 1) * 5)).alias("b_end"),
    )
    return (
        e.join(
            F.broadcast(buckets),
            (e.ts >= buckets.b_start) & (e.ts < buckets.b_end),
        )
        .groupBy("bucket_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based, vs the ROWS frame elsewhere): for each
    part, how many parts of the same brand are within ±5 of its size,
    and their count-weighted size sum — exact integer outputs."""
    p = load_table(spark, sf_dir, "part")
    w = (
        Window.partitionBy("p_brand")
        .orderBy(F.col("p_size").cast("long"))
        .rangeBetween(-5, 5)
    )
    return p.select(
        "p_partkey",
        "p_brand",
        "p_size",
        F.count(F.lit(1)).over(w).alias("n_near"),
        F.sum(F.col("p_size").cast("long")).over(w).alias("near_size_sum"),
    )


def q_hof_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions: transform / filter / aggregate /
    zip_with / sequence — all JVM-side lambdas, no Python. (Spark does
    no CSE inside HOFs, so the lens array is materialized once as a
    column instead of recomputed per consumer.)"""
    p = load_table(spark, sf_dir, "part")
    words = F.split(F.col("p_type"), " ")
    base = p.select("p_partkey", "p_size", words.alias("words")).withColumn(
        "word_lens", F.transform(F.col("words"), lambda w: F.length(w).cast("long"))
    )
    # Each HOF result is computed as a real array, then serialized with
    # array_join at the query boundary (the driver's pandas canonicalizer
    # cannot hash list cells) — the lambdas stay JVM-side either way.
    str_join = lambda col: F.array_join(  # noqa: E731
        F.transform(col, lambda x: x.cast("string")), ","
    )
    return base.select(
        "p_partkey",
        str_join(F.col("word_lens")).alias("word_lens"),
        str_join(F.filter(F.col("words"), lambda w: F.length(w) > 5)).alias(
            "long_words"
        ),
        F.aggregate(
            F.col("word_lens"), F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("total_len"),
        str_join(
            F.zip_with(
                F.col("words"),
                F.col("word_lens"),
                lambda w, l: F.concat_ws(":", w, l.cast("string")),
            )
        ).alias("tagged"),
        str_join(
            F.sequence(
                F.lit(1).cast("long"), ((F.col("p_size") % 5) + 1).cast("long")
            )
        ).alias("seq"),
    )


def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch MERGE (operators/merge.py): a deterministic changeset —
    updates (keys % 10 == 0: +10.00 price, status 'U') plus inserts
    (fresh keys offset by 10M) — upserted into ``orders``; result
    audited as per-status counts and decimal-exact price sums. The
    'U'/'N' groups isolate updated/inserted rows in the output."""
    from etl_global_mobility_spark.operators.merge import upsert

    o = load_table(spark, sf_dir, "orders")
    updates = o.filter(F.col("o_orderkey") % 10 == 0).withColumns(
        {
            "o_totalprice": F.col("o_totalprice") + F.lit(10.0),
            "o_orderstatus": F.lit("U"),
        }
    )
    inserts = o.filter(F.col("o_orderkey") % 97 == 0).withColumns(
        {
            "o_orderkey": F.col("o_orderkey") + F.lit(10_000_000),
            "o_totalprice": (
                F.lit(100.0) + (F.col("o_orderkey") % 50).cast("double")
            ),
            "o_orderstatus": F.lit("N"),
        }
    )
    merged = upsert(o, updates.unionByName(inserts), keys=["o_orderkey"])
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_total"),
    )


def _roundtrip_dir(name: str) -> str:
    """Root for per-run scratch (source round-trip fixtures, streaming
    landing/checkpoint/sink dirs). Placement is an I/O decision, not a
    semantic one — every layout here is written and read back WITHIN
    one query invocation (fresh checkpoint per run; never reused
    across runs), so the fastest local storage is the right home:

    * ``$SPARK_GRAFT_SCRATCH_DIR`` when set (a real deployment points
      this at fast local SSD / per-node scratch; durable shared
      storage is only required for checkpoints that must SURVIVE the
      process, which these per-run dirs never do);
    * else ``/dev/shm`` (tmpfs) when present;
    * else the repo-local ``.tmp`` (the pre-round-15 location).

    Measured honestly (round 15, interleaved worktree A/B at sf0.1
    local[32], heavy streams + wholetext): NEUTRAL on this host — the
    page cache already absorbs the scratch I/O, and the streaming
    per-batch ``durationMs`` breakdown shows the floor is ``addBatch``
    execution (~1.1 s/batch of real banding/probe compute) with only
    ~0.2 s/batch of walCommit/commitOffsets, which are serialization-
    bound, not fsync-bound. The tmpfs default is kept anyway because
    it is never worse, takes scratch churn off the repo volume, and
    the env knob is what a real deployment needs (point per-run
    scratch at fast local storage; these dirs never outlive the
    process, so durable shared storage buys nothing).
    """
    import os

    env = os.environ.get("SPARK_GRAFT_SCRATCH_DIR")
    if env:
        root = env
    elif os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
        root = "/dev/shm/spark_graft_scratch"
    else:
        root = os.path.join(
            os.path.dirname(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            ),
            ".tmp",
        )
    os.makedirs(root, exist_ok=True)
    return os.path.join(root, name)


def _pid_alive(pid: int) -> bool:
    import os

    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    return True


def _scratch_dir(name: str, sf_dir: str) -> str:
    """Per-(query, sf, PROCESS) scratch directory for the source
    round-trip queries — the write→read fixture path.

    Unlike the train-once artifacts (kmeans_* — fingerprinted, SHARED
    across processes on purpose, atomic-rename-published), a source
    round-trip's directory is scratch INPUT the same query writes then
    reads within one invocation. A fixed name made that a
    cross-process race: two driver processes on DIFFERENT sf dirs
    (e.g. the full sf0.01 gate beside the test suite's sf0.001 gate)
    interleave ``mode("overwrite")`` and the reader lists a superset —
    measured round 11 as rel_source_text_wholetext returning 530 rows
    (500 sf0.01 + 30 sf0.001 partition dirs) against a 500-row oracle.
    Keying by sf digest separates data scales; keying by pid separates
    concurrent processes on the SAME scale (identical content, but an
    overwrite's delete+write still races a concurrent listing).

    Dead-pid siblings are pruned best-effort on the way in, so .tmp
    holds at most one layout per (query, sf) per LIVE process — a
    dead process cannot be mid-write, which is what makes the prune
    race-free where pruning live siblings would not be.
    """
    import hashlib
    import os
    import re
    import shutil

    digest = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    root = _roundtrip_dir("")
    try:
        for entry in os.listdir(root):
            m = re.fullmatch(re.escape(name) + r"-[0-9a-f]{8}-p(\d+)", entry)
            if m and not _pid_alive(int(m.group(1))):
                shutil.rmtree(os.path.join(root, entry), ignore_errors=True)
    except OSError:
        pass
    return _roundtrip_dir(f"{name}-{digest}-p{os.getpid()}")


def _scratch_table(spark: SparkSession, base: str, sf_dir: str) -> str:
    """Per-(query, sf, process) CATALOG TABLE name under corpus_cat —
    the :func:`_scratch_dir` contract for tables. A fixed name let two
    driver processes interleave DROP TABLE / location-delete /
    saveAsTable on the same managed table (write_bucketed's cleanup
    removed the other process's mid-write directory — measured round
    11 as a saveAsTable Py4JJavaError in the empty-input sweep racing
    the full test suite). Dead-pid variants are dropped on the way in,
    keeping the warehouse at one table per (query, sf) per LIVE
    process."""
    import hashlib
    import os
    import re

    digest = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    spark.sql("CREATE DATABASE IF NOT EXISTS corpus_cat")
    try:
        for t in spark.catalog.listTables("corpus_cat"):
            m = re.fullmatch(
                re.escape(base) + r"_[0-9a-f]{8}_p(\d+)", t.name
            )
            if m and not _pid_alive(int(m.group(1))):
                spark.sql(f"DROP TABLE IF EXISTS corpus_cat.{t.name}")
    except Exception:
        pass  # pruning is best-effort; a live run never depends on it
    return f"corpus_cat.{base}_{digest}_p{os.getpid()}"


def q_source_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines source with explicit schema: supplier round-tripped
    through the JSON writer then read back schema'd (no inference pass
    — schema inference is a full extra scan, never acceptable at
    scale). Doubles survive textually (shortest-repr round-trip); the
    oracle reads the original parquet, so any serialization defect
    breaks the hash."""
    from pyspark.sql import types as T

    out = _scratch_dir("json_supplier", sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    s.coalesce(1).write.mode("overwrite").json(out)
    schema = T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    )
    df = spark.read.schema(schema).json(out)
    return df.select(
        "s_suppkey",
        "s_name",
        "s_nationkey",
        "s_acctbal",
        F.length("s_name").alias("name_len"),
    )


def q_source_text_wholetext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-document-per-file text ingestion (``wholetext``): documents
    written as a doc_id-partitioned text layout (each document lands
    wholly in one file under its partition dir — Spark-native write,
    no driver loop), read back with ``wholetext=true`` so each FILE
    becomes one row, the doc_id recovered from partition discovery.
    This is the crawl-dump reality of training-data ingestion: a
    directory of documents, one file each, no record delimiter
    contract. The text writer appends one trailing newline per row;
    the reader strips exactly that (the corpus has no trailing
    newlines of its own — a serialization defect breaks the md5).
    Content identity is proven by length + md5 prefix against the
    original parquet."""
    out = _scratch_dir("wholetext_documents", sf_dir)
    # Deterministic 500-doc cap: the round-trip cost is the FILE
    # LAYOUT itself (one dir per document), so an uncapped run scales
    # linearly in file-count with SF (66s at sf0.1's 5k docs) while
    # proving nothing the first 500 don't. The filter pushes to the
    # parquet scan; the oracle applies the same cap.
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 500)
        .select("doc_id", "text")
    )
    # Hash-partition by doc_id before the partitioned write: the capped
    # corpus arrives as ONE scan task (594 KB parquet), which then
    # creates all 500 partition directories serially — measured 7.9 s
    # for the write alone at sf0.1 vs 1.6 s spread over the cores.
    # Each doc_id lands in exactly one task, so the layout contract
    # (one file per document dir) is unchanged.
    from etl_global_mobility_spark.operators.parallelism import (
        ensure_grouped_compute_parallelism,
    )

    ensure_grouped_compute_parallelism(d, ["doc_id"]).write.mode(
        "overwrite"
    ).partitionBy("doc_id").text(out)
    raw = spark.read.option("wholetext", "true").text(out)
    if "doc_id" not in raw.columns:
        # empty corpus: the write produced no partition directories,
        # so discovery found no doc_id column — empty-in -> empty-out
        # with the contract schema (round-10 empty-input sweep)
        return d.limit(0).select(
            "doc_id",
            F.length("text").alias("n_chars_rt"),
            F.substring(F.md5("text"), 1, 16).alias("content_md5"),
        )
    back = (
        raw
        .select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            # \z, not $: Java's non-MULTILINE $ also matches just
            # BEFORE a final line terminator, so '\n$' would eat two
            # newlines from a document ending in '\n'. \z anchors to
            # the absolute end — exactly the one writer-appended byte.
            F.regexp_replace(F.col("value"), r"\n\z", "").alias("_text"),
        )
    )
    return back.select(
        "doc_id",
        F.length("_text").alias("n_chars_rt"),
        F.substring(F.md5("_text"), 1, 16).alias("content_md5"),
    )


def q_source_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source: supplier round-tripped through the ORC writer/reader
    (columnar binary — types survive natively, unlike the JSON text
    path), then a filtered projection the reader should push down."""
    out = _scratch_dir("orc_supplier", sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    s.coalesce(1).write.mode("overwrite").orc(out)
    df = spark.read.orc(out)
    return df.filter(F.col("s_acctbal") > 0).select(
        "s_suppkey", "s_nationkey", "s_acctbal"
    )


def q_source_avro(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro source: supplier round-tripped through the Avro
    writer/reader (sources/formats.py — row-format binary with
    embedded writer schema; int/long/double/string survive natively
    under Avro's own type system), then a filtered projection. Avro is
    the remaining standard batch format of the source sweep
    (CSV/JSON/ORC/XML/parquet/binaryFile/text already covered); the
    oracle recomputes from the original parquet table, so any
    serialization defect breaks the hash. Scale note: Avro is a ROW
    format — no row-group filter pushdown — so the engine's 100 TB
    recipe keeps it at the ingest edge and converts to parquet at the
    bronze hop (the filter here runs post-scan, as it would there)."""
    from etl_global_mobility_spark.sources.formats import read_avro, write_avro

    out = _scratch_dir("avro_supplier", sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    write_avro(s.coalesce(1), out)
    df = read_avro(spark, out)
    return df.filter(F.col("s_acctbal") > 0).select(
        "s_suppkey", "s_nationkey", "s_acctbal"
    )


def q_source_parquet_zstd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet ZSTD codec round-trip: at 100 TB the codec choice is a
    first-order cost knob (zstd ≈ gzip-class ratios at snappy-class
    decode speed, and it is the modern lakehouse default). Writes the
    part table with explicit ``compression=zstd``, asserts the files
    really are zstd-encoded (suffix check — a silent fallback to snappy
    would pass a pure round-trip), reads back and projects with a
    pushable filter. The oracle recomputes from the original table, so
    any codec-path corruption breaks the hash."""
    import glob
    import os

    out = _scratch_dir("parquet_zstd_part", sf_dir)
    p = load_table(spark, sf_dir, "part")
    p.coalesce(1).write.mode("overwrite").option("compression", "zstd").parquet(out)
    files = glob.glob(os.path.join(out, "part-*.parquet"))
    assert files and all(".zstd." in os.path.basename(f) for f in files), files
    df = spark.read.parquet(out)
    return df.filter(F.col("p_size") >= 25).select(
        "p_partkey", "p_brand", "p_size", "p_retailprice"
    )


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the part→supplier shipment graph, 3 synchronous
    iterations of integer micro-unit arithmetic — the engine's
    bounded-iteration pattern for iterative algorithms (see
    operators/graph.py). The quantity filter + mod-200 fold keep the
    graph SPARSE and irregular: an unfiltered mod-k fold yields the
    complete graph at this data size, whose PageRank is the uniform
    fixed point — a degenerate oracle that can't distinguish a broken
    iteration from a correct one."""
    from etl_global_mobility_spark.operators.graph import pagerank

    li = load_table(spark, sf_dir, "lineitem")
    edges = li.filter(F.col("l_quantity") < 5).select(
        (F.col("l_partkey") % 200).alias("src"),
        (F.col("l_suppkey") % 200).alias("dst"),
    )
    return pagerank(edges, n_iters=3)


def q_pagerank_convergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-iteration residual curve for rel_pagerank (operators/
    graph.py pagerank_convergence): per round, the exact-integer L1
    norm of the score change and its per-node average — the stopping
    rule behind the fixed-3-iteration contract, as a bounded n_iters-
    row diagnostic (the labelprop analog is llm_labelprop_convergence).
    Same graph, same BIGINT floor-division arithmetic, plus one
    node-keyed join + sum per round; the oracle unrolls the iterations
    and diffs consecutive score frames."""
    from etl_global_mobility_spark.operators.graph import (
        pagerank_convergence,
    )

    li = load_table(spark, sf_dir, "lineitem")
    edges = li.filter(F.col("l_quantity") < 5).select(
        (F.col("l_partkey") % 200).alias("src"),
        (F.col("l_suppkey") % 200).alias("dst"),
    )
    return pagerank_convergence(edges, n_iters=3)


def _pagerank_ctes(
    n_iters: int = 3, mod: int = 200, damping: int = 85, unit: int = 1_000_000
) -> list[str]:
    """The shared CTE chain mirroring operators/graph.py::pagerank —
    edges/nodes/deg/it0..itN; `//` (floor division) matches Spark's
    DIV on the all-positive BIGINT scores, so every engine computes
    the identical integers. Assembled by both the score oracle
    (_pagerank_sql) and the residual-curve oracle
    (_pagerank_convergence_sql)."""
    teleport = unit - unit * damping // 100
    ctes = [
        f"""edges AS (
          SELECT DISTINCT l_partkey % {mod} AS src, l_suppkey % {mod} AS dst
          FROM lineitem WHERE l_quantity < 5
        ), nodes AS (
          SELECT src AS node FROM edges UNION SELECT dst FROM edges
        ), deg AS (
          SELECT src, count(*) AS outdeg FROM edges GROUP BY src
        ), it0 AS (
          SELECT node, CAST({unit} AS BIGINT) AS score FROM nodes
        )"""
    ]
    for i in range(1, n_iters + 1):
        ctes.append(
            f"""it{i} AS (
          SELECT n.node,
                 CAST({teleport} + COALESCE(c.contrib, 0) AS BIGINT) AS score
          FROM nodes n LEFT JOIN (
            SELECT e.dst AS node,
                   SUM(((p.score * {damping}) // 100) // d.outdeg) AS contrib
            FROM edges e
            JOIN it{i - 1} p ON p.node = e.src
            JOIN deg d ON d.src = e.src
            GROUP BY e.dst
          ) c ON c.node = n.node
        )"""
        )
    return ctes


def _pagerank_sql(
    n_iters: int = 3, mod: int = 200, damping: int = 85, unit: int = 1_000_000
) -> str:
    """DuckDB mirror of operators/graph.py::pagerank."""
    ctes = _pagerank_ctes(n_iters, mod, damping, unit)
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT node, score FROM it{n_iters}"
    )


def _pagerank_convergence_sql(
    n_iters: int = 3, mod: int = 200, damping: int = 85, unit: int = 1_000_000
) -> str:
    """DuckDB mirror of operators/graph.py::pagerank_convergence: the
    same unrolled iteration CTEs, with consecutive score frames diffed
    into the per-round L1 residual (exact integers on both engines)."""
    ctes = _pagerank_ctes(n_iters, mod, damping, unit)
    ctes.append("nn AS (SELECT count(*) AS n_nodes FROM nodes)")
    diffs = "\nUNION ALL\n".join(
        f"""SELECT {i} AS round,
                   SUM(ABS(b.score - a.score)) AS l1_delta
            FROM it{i} b JOIN it{i - 1} a ON a.node = b.node"""
        for i in range(1, n_iters + 1)
    )
    ctes.append(f"diffs AS ({diffs})")
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
        SELECT CAST(round AS INT) AS round,
               CAST(COALESCE(l1_delta, 0) AS BIGINT) AS l1_delta,
               n_nodes,
               CASE WHEN n_nodes = 0 THEN 0.0
                    ELSE CAST(COALESCE(l1_delta, 0) AS DOUBLE)
                         / (n_nodes * {unit})
               END AS avg_move
        FROM diffs CROSS JOIN nn"""
    )


def q_source_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML source — BUILT INTO Spark 4 (the formerly separate
    spark-xml package; SPARK-44265): supplier round-tripped through the
    XML writer/reader with an explicit schema (inference would be a
    second full scan). Exercises entity escaping on the text path and
    numeric parse-back; the oracle reads the original parquet, so any
    escaping or type defect breaks the hash."""
    from pyspark.sql import types as T

    out = _scratch_dir("xml_supplier", sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    (
        s.coalesce(1)
        .write.mode("overwrite")
        .format("xml")
        .option("rowTag", "supplier")
        .save(out)
    )
    schema = T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    )
    df = (
        spark.read.format("xml")
        .option("rowTag", "supplier")
        .schema(schema)
        .load(out)
    )
    return df.select(
        "s_suppkey",
        "s_name",
        "s_nationkey",
        "s_acctbal",
        F.length("s_name").alias("name_len"),
    )


def q_source_binaryfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``binaryFile`` source: the multimodal ingestion path. Documents
    are materialized as one raw ``.bin`` file each (UTF-8 bytes of the
    text — a stand-in for image/audio payloads), then read back with
    ``spark.read.format("binaryFile")`` and verified content-exact via
    sha2 against the oracle's ``sha256(encode(text))``.

    The fixture write is a bounded driver-side loop (first 100 docs by
    doc_id — test scaffolding, not the operator); the *read* is the
    real distributed path: Spark lists and scans the files in
    parallel, and at scale the same plan runs against an object store
    bucket of media blobs.
    """
    import os

    out = _scratch_dir("binary_docs", sf_dir)
    os.makedirs(out, exist_ok=True)
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 100)
        .select("doc_id", "text")
        .collect()  # bounded: exactly 100 rows, fixture setup only
    )
    for row in docs:
        with open(os.path.join(out, f"doc_{row['doc_id']:06d}.bin"), "wb") as f:
            f.write(row["text"].encode("utf-8"))
    if docs:
        df = spark.read.format("binaryFile").load(f"{out}/*.bin")
    else:
        # empty corpus writes no files and a no-match glob is
        # PATH_NOT_FOUND, not an empty scan — empty-in -> empty-out
        # through the SAME projection below so the contract schema is
        # identical by construction. (Surfaced by the round-11 scratch
        # isolation: the old FIXED fixture dir kept stale files from
        # earlier runs, which silently masked this case.)
        df = spark.createDataFrame([], "path string, content binary")
    return df.select(
        F.regexp_extract(F.col("path"), r"doc_(\d+)\.bin", 1)
        .cast("long")
        .alias("doc_id"),
        F.length(F.col("content")).alias("n_bytes"),
        F.sha2(F.col("content"), 256).alias("sha"),
    )


def q_histogram_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of ``l_extendedprice``: bucket index from
    closed-form FP arithmetic (map-side), one hash aggregation on the
    bounded bucket key — the canonical distributed histogram. No
    ``width_bucket`` dependency (DuckDB lacks it); the explicit
    ``floor((x - lo) / w)`` form is engine-portable and clamps into
    [0, n_buckets-1]."""
    li = load_table(spark, sf_dir, "lineitem")
    lo, width, n_buckets = 0.0, 10000.0, 12
    bucket = F.least(
        F.greatest(
            F.floor((F.col("l_extendedprice") - F.lit(lo)) / F.lit(width)),
            F.lit(0),
        ),
        F.lit(n_buckets - 1),
    ).cast("long")
    return (
        li.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
        )
    )


def q_scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 2 dimension maintenance (operators/merge.py:
    scd2_apply): a versioned customer dimension (including pre-closed
    history rows) receives a changeset containing segment changes,
    identical no-op rows, and brand-new keys — superseded versions are
    closed at the effective timestamp, new open versions inserted,
    history untouched, no-ops version-free."""
    from etl_global_mobility_spark.operators.merge import scd2_apply

    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    t18 = F.lit("2018-01-01").cast("timestamp")
    t20 = F.lit("2020-01-01").cast("timestamp")
    null_ts = F.lit(None).cast("timestamp")
    hist = base.filter(F.col("c_custkey") < 10).select(
        "c_custkey",
        "c_name",
        F.lit("OLD").alias("c_mktsegment"),
        t18.alias("valid_from"),
        t20.alias("valid_to"),
    )
    open_rows = base.select(
        "c_custkey",
        "c_name",
        "c_mktsegment",
        t20.alias("valid_from"),
        null_ts.alias("valid_to"),
    )
    current = hist.unionByName(open_rows)
    changes = (
        base.filter(F.col("c_custkey") % 10 == 0)
        .select("c_custkey", "c_name", F.lit("CHANGED").alias("c_mktsegment"))
        .unionByName(
            base.filter(F.col("c_custkey") <= 5).select(
                "c_custkey", "c_name", "c_mktsegment"
            )
        )
        .unionByName(
            base.filter(F.col("c_custkey") < 5).select(
                (F.col("c_custkey") + 100000).alias("c_custkey"),
                "c_name",
                F.lit("NEW").alias("c_mktsegment"),
            )
        )
    )
    return scd2_apply(
        current,
        changes,
        key="c_custkey",
        tracked=["c_name", "c_mktsegment"],
        effective_ts="2024-06-01",
    )


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC generation (operators/merge.py:snapshot_diff): diff two
    customer snapshots — segment changes, dropped keys, added keys —
    into the op-tagged changeset. Unchanged rows (the bulk) emit
    nothing: the output is proportional to churn, not table size."""
    from etl_global_mobility_spark.operators.merge import snapshot_diff

    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    old = base
    new = (
        base.filter(F.col("c_custkey") % 97 != 0)  # deletes
        .withColumn(
            "c_mktsegment",
            F.when(F.col("c_custkey") % 10 == 0, F.lit("CHANGED")).otherwise(
                F.col("c_mktsegment")
            ),
        )  # updates
        .unionByName(
            base.filter(F.col("c_custkey") < 5).select(
                (F.col("c_custkey") + 100000).alias("c_custkey"),
                "c_name",
                F.lit("NEW").alias("c_mktsegment"),
            )
        )  # inserts
    )
    return snapshot_diff(old, new, keys=["c_custkey"])


def q_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension lookup — the READ side of SCD2: each
    order joins the customer-dimension version valid at its order
    date (valid_from <= t < valid_to, open end = +inf). The versioned
    dim is bounded (versions per key are few), so the range join
    broadcasts it and the fact table streams map-only; per-fact
    uniqueness is structural (version intervals are disjoint per
    key). Counts segment assignments as-of order time."""
    from etl_global_mobility_spark.operators.merge import scd2_apply

    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    t95 = F.lit("1995-01-01").cast("timestamp")
    dim = scd2_apply(
        base.select(
            "c_custkey",
            "c_name",
            "c_mktsegment",
            t95.alias("valid_from"),
            F.lit(None).cast("timestamp").alias("valid_to"),
        ),
        base.filter(F.col("c_custkey") % 10 == 0).select(
            "c_custkey", "c_name", F.lit("CHANGED").alias("c_mktsegment")
        ),
        key="c_custkey",
        tracked=["c_name", "c_mktsegment"],
        effective_ts="1999-07-01",
    )
    o = load_table(spark, sf_dir, "orders")
    matched = o.join(
        F.broadcast(dim),
        (F.col("o_custkey") == F.col("c_custkey"))
        & (F.col("o_orderdate") >= F.col("valid_from"))
        & (
            F.col("valid_to").isNull()
            | (F.col("o_orderdate") < F.col("valid_to"))
        ),
    )
    return matched.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


def q_expectations_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative table-contract validation
    (operators/expectations.py): non-null, accepted-values, range,
    key-uniqueness, and referential-integrity expectations over
    ``orders`` folded into one scan + one anti-join, reported as
    (rule, n_violations, ok)."""
    from etl_global_mobility_spark.operators.expectations import (
        validation_report,
    )

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return validation_report(
        o,
        row_rules={
            "not_null_custkey": F.col("o_custkey").isNotNull(),
            "positive_price": F.col("o_totalprice") > 0,
            "known_status": F.col("o_orderstatus").isin("O", "F", "P"),
            "date_in_range": F.col("o_orderdate")
            >= F.lit("1990-01-01").cast("timestamp"),
        },
        unique_key="o_orderkey",
        fk=(c, "o_custkey", "c_custkey"),
    )


def q_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running distinct-user count per event type — ``COUNT(DISTINCT)
    OVER`` does not exist in either engine, so it is emulated with the
    standard composition: a first-occurrence flag (row_number over
    (type, user) == 1) running-summed over the time order. Two windows
    but ONE logical dedup pass; both windows shuffle on event_type, so
    the plan reuses the exchange."""
    e = load_table(spark, sf_dir, "events")
    first_seen = (
        F.row_number().over(
            Window.partitionBy("event_type", "user_id").orderBy("ts", "event_id")
        )
        == 1
    ).cast("long")
    running = Window.partitionBy("event_type").orderBy("ts", "event_id")
    return e.withColumn("first_seen", first_seen).select(
        "event_id",
        "event_type",
        "ts",
        F.sum("first_seen").over(running).alias("distinct_users_so_far"),
    )


def q_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total (ratio-to-report): each nation's revenue share
    of the grand total — the one-window composition (partition-less
    sum over the 25-row aggregate, not over the fact table). Sums run
    in DECIMAL (exact, order-independent); only the final share is a
    double division."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    per_nation = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(rev).alias("revenue_dec"))
    )
    total = Window.partitionBy()
    return per_nation.select(
        "n_name",
        F.col("revenue_dec").cast("double").alias("revenue"),
        (
            F.col("revenue_dec").cast("double")
            / F.sum("revenue_dec").over(total).cast("double")
        ).alias("share"),
    )


def q_mask_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-governance masking: ``mask()`` shape-preserving redaction
    (uppercase→X, lowercase→x, digits→n) over customer names+phones —
    the column-level redaction a governed export applies. The oracle
    reproduces it with an ordered regexp_replace chain (upper, lower,
    digit — later passes cannot touch earlier substitutions)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.expr("mask(c_name)").alias("name_masked"),
        F.expr("mask(c_mktsegment)").alias("segment_masked"),
    )


def q_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (``<=>`` / IS NOT DISTINCT FROM): NULL
    keys MATCH each other instead of dropping out — the semantics a
    changeset diff needs (two NULL business keys are the "same" row).
    Both sides derive a nullable key; pair counts per key value, with
    the NULL-key bucket proving null≡null matched."""
    e = load_table(spark, sf_dir, "events").select(
        F.nullif(F.col("user_id") % 7, F.lit(3)).alias("k")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.nullif(F.col("s_suppkey") % 7, F.lit(3)).alias("k")
    )
    joined = e.alias("l").join(
        s.alias("r"), F.col("l.k").eqNullSafe(F.col("r.k"))
    )
    return joined.groupBy(F.col("l.k").alias("k")).agg(
        F.count(F.lit(1)).alias("n_pairs")
    )


def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph analytics without a graph library: triangle counting as
    two self-joins over a canonically-ordered edge list (a < b < c, so
    each triangle is produced exactly once and the join never explores
    both directions). The edge list is derived deterministically from
    supplier keys (i → (i*7) mod N), the standard expander-style test
    graph. Complements the hash-min connected components in
    operators/dedup.py — counting is join-shaped, not iterative."""
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey")
    n = 100  # fixed modulus keeps the graph (and oracle) SF-stable
    e = s.select(
        F.col("s_suppkey").alias("u"),
        ((F.col("s_suppkey") * 7) % n).alias("v"),
    ).filter(F.col("u") != F.col("v"))
    edges = (
        e.select(
            F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b")
        )
        .distinct()
    )
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    e3 = edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.b") == F.col("e2.a"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
        )
        .select(
            F.col("e1.a").alias("x"),
            F.col("e1.b").alias("y"),
            F.col("e2.b").alias("z"),
        )
    )
    return tri.agg(F.count(F.lit(1)).alias("n_triangles"))


def q_robust_scaling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group robust scaling: IQR winsorization (values clamped into
    [p25, p75]) AND min-max normalization in one pass — the two
    standard ML-prep scaling transforms, merged from the r3 variants
    rel_winsorize_iqr + rel_minmax_normalize (one driver row now
    evidences both).

    The 0.25/0.75 quantile fractions keep the (n-1)·p interpolation
    rank arithmetic FP-exact across engines (0.05/0.95 would not be
    binary fractions). Scale shape: ONE aggregation computes all four
    per-group stats (p25/p75/min/max — cheaper than the window form,
    which shuffles the fact rows), and the bounded per-group frame
    broadcasts back onto the facts: the 100 TB side never shuffles.
    min/max are exact selections and the single IEEE division is
    portable (unlike stddev z-scores, whose accumulation order differs
    across engines)."""
    e = load_table(spark, sf_dir, "events")
    q = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.25D)").alias("p25"),
        F.expr("percentile(value, 0.75D)").alias("p75"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )
    lo, hi = F.col("vmin"), F.col("vmax")
    # constant-group guard: Spark x/0.0 is NULL while DuckDB is ±inf —
    # pin the degenerate case to 0.5 in both engines.
    norm = F.when(hi == lo, F.lit(0.5)).otherwise(
        (F.col("value") - lo) / (hi - lo)
    )
    return (
        e.join(F.broadcast(q), "event_type")
        .select(
            "event_id",
            "event_type",
            "value",
            F.least(F.greatest(F.col("value"), F.col("p25")), F.col("p75")).alias(
                "value_clipped"
            ),
            norm.alias("value_norm"),
        )
    )


def q_moving_window_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded sliding frame (ROWS 6 PRECEDING): 7-event moving totals
    per user over integer value-millis — moving sums over INTEGERS are
    associativity-proof, unlike a double moving average whose
    incremental add/subtract order is engine-internal. The avg is then
    ONE division of two exact integers."""
    e = load_table(spark, sf_dir, "events")
    millis = F.floor(F.col("value") * 1000 + F.lit(0.5)).cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(millis).over(w).alias("mov_sum_millis"),
        F.count(F.lit(1)).over(w).alias("mov_n"),
    ).withColumn(
        "mov_avg",
        F.col("mov_sum_millis").cast("double") / F.col("mov_n").cast("double"),
    )


def q_error_safe_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI error-safe functions: ``try_cast`` (bad parses → NULL, no
    job failure) and ``try_divide`` (÷0 → NULL) — the ingestion-robust
    arithmetic a pipeline uses under ANSI mode instead of letting one
    dirty cell kill a 100 TB job. The p_type cast exercises the
    failure path (non-numeric strings), the comment digits the
    success path."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.expr("try_cast(p_type AS INT)").alias("type_as_int"),
        F.expr(
            "try_cast(regexp_extract(p_name, '([0-9]+)', 1) AS INT)"
        ).alias("name_digits"),
        F.try_divide(
            F.col("p_retailprice"), F.col("p_size") - F.col("p_size")
        ).alias("div_zero"),
        F.try_divide(F.col("p_retailprice"), F.col("p_size").cast("double")).alias(
            "price_per_size"
        ),
    )


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity week, counted
    in each subsequent activity week as a week offset — the standard
    retention triangle. Two hash aggregations (first-week per user;
    distinct user-week activity) and a broadcastable cohort join;
    offsets via integer epoch arithmetic (no interval types, which
    render differently across engines)."""
    e = load_table(spark, sf_dir, "events")
    week = F.date_trunc("week", F.col("ts"))
    cohort = (
        e.select("user_id", week.alias("w"))
        .groupBy("user_id")
        .agg(F.min("w").alias("cohort_week"))
    )
    activity = e.select("user_id", week.alias("w")).distinct()
    offset = (
        (
            F.unix_timestamp("w") - F.unix_timestamp("cohort_week")
        )
        / F.lit(604800)
    ).cast("int")
    return (
        activity.join(cohort, "user_id")
        .withColumn("week_offset", offset)
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def q_funnel_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view → click → purchase): per user, the
    earliest event of each stage that occurs AFTER the previous
    stage's earliest qualifying event — the product-analytics
    sequence-match pattern. Expressed as chained conditional
    aggregations (three min-filters over one pass), NOT a 3-way
    self-join: one shuffle on user_id, no pair explosion, and each
    stage's predicate references the previous stage's aggregate via a
    self-joined per-user frame that stays bounded (one row per user)."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    first_view = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    clicks = e.filter(F.col("event_type") == "click").join(
        first_view, "user_id"
    )
    first_click = (
        clicks.filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"), F.min("t_view").alias("t_view"))
    )
    buys = e.filter(F.col("event_type") == "purchase").join(
        first_click, "user_id"
    )
    funnel = (
        buys.filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(
            F.min("t_view").alias("t_view"),
            F.min("t_click").alias("t_click"),
            F.min("ts").alias("t_purchase"),
        )
    )
    return funnel.select(
        "user_id",
        "t_view",
        "t_click",
        "t_purchase",
        (
            F.col("t_purchase").cast("long") - F.col("t_view").cast("long")
        ).alias("funnel_seconds"),
    )


def q_tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority) adapted to the driver schema: the
    canonical 3-way selective join — segment-filtered customers ⋈
    date-filtered orders ⋈ ship-date-filtered lineitems, decimal-exact
    revenue per order, global top-10. Both date predicates push to the
    parquet scans; the bounded top-k is TakeOrderedAndProject. The
    classic benchmark shape for 'filters before joins, aggregate after'."""
    cutoff = "1998-06-01"
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(cutoff).cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(cutoff).cast("timestamp")
    )
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


def q_tpch_q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer distribution) adapted to the driver schema:
    LEFT join customers to a filtered orders side (urgent orders
    excluded, standing in for Q13's comment NOT LIKE), count orders per
    customer — customers with none legitimately count 0 — then
    histogram the counts. The canonical two-level aggregation over an
    outer join: the first groupBy keys on the customer (corpus-sized
    shuffle), the second on the bounded count value."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


def q_tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume) adapted to the driver schema:
    the canonical six-table star join — region-filtered nations,
    customers and suppliers co-located in the same nation
    (c_nationkey = s_nationkey via the two fact joins), a one-year
    order window, decimal-exact revenue per nation. region→nation is
    an explicit broadcast (always tiny); customer and supplier are
    left UNHINTED on purpose — AQE broadcasts them at small scale,
    and at 100 TB (where customer is GB-sized) they correctly fall
    back to shuffle joins on their keys. The date filter pushes to
    the orders scan."""
    year_lo, year_hi = "1996-01-01", "1997-01-01"
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(year_lo).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(year_hi).cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey)
            & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic — the pre-flight report that tells you
    whether a key needs salting/AQE BEFORE a 100 TB shuffle hits one
    hot partition: per-key row counts for the orders⋈customer key,
    top-20 heaviest keys with their share of the table and their
    skew factor (count ÷ mean count, as one exact integer-ratio
    division). One uniform-key aggregation + a 1-row bounded
    broadcast; cost ∝ table, output ∝ 20."""
    o = load_table(spark, sf_dir, "orders")
    cnt = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    tot = cnt.agg(
        F.sum("n").alias("_total"), F.count(F.lit(1)).alias("_n_keys")
    )
    return (
        cnt.join(F.broadcast(tot))
        .select(
            "o_custkey",
            "n",
            (F.col("n").cast("double") / F.col("_total").cast("double")).alias(
                "share"
            ),
            (
                (F.col("n") * F.col("_n_keys")).cast("double")
                / F.col("_total").cast("double")
            ).alias("skew_factor"),
        )
        .orderBy(F.col("n").desc(), F.col("o_custkey"))
        .limit(20)
    )


def q_tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting) adapted to the driver
    schema: revenue lost to returns per customer over one quarter —
    returned lineitems ⋈ quarter-filtered orders ⋈ customer ⋈ nation,
    decimal-exact revenue, global top-20 customers. The selective
    return-flag and date filters push to the fact scans; nation
    broadcasts; the top-20 is TakeOrderedAndProject."""
    q_lo, q_hi = "1996-01-01", "1996-04-01"
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(q_lo).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(q_hi).cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


def q_tpch_q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping-mode priority counts) adapted to the
    driver schema: among LATE shipments (shipped > 90 days after the
    order date — standing in for Q12's receipt-vs-commit lag), count
    high-priority vs other orders per linestatus. The canonical
    join + CASE-conditional aggregation: one fact join, map-side
    partial counts, bounded group key."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    late = li.join(o, li.l_orderkey == o.o_orderkey).filter(
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    # coalesce: isin() is NULL for a NULL priority, and F.sum skips
    # NULLs — which would drop such rows from BOTH counts while the
    # oracle's CASE ... ELSE 1 END counts them as low. Coalescing to 0
    # mirrors the SQL exactly (NULL priority → low_line_count).
    high = F.coalesce(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("int"),
        F.lit(0),
    )
    return (
        late.groupBy("l_linestatus")
        .agg(
            F.sum(high).cast("bigint").alias("high_line_count"),
            F.sum(F.lit(1) - high).cast("bigint").alias("low_line_count"),
        )
    )


def q_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval×interval overlap join (operators/temporal.py): per-
    (user, day) activity intervals from events, all overlapping pairs
    across DIFFERENT users within a day. Bucketized candidates with
    the overlap-start exactly-once rule — never a cross join; integer
    microsecond arithmetic end-to-end."""
    from etl_global_mobility_spark.operators.temporal import (
        interval_overlap_join,
    )

    ev = load_table(spark, sf_dir, "events")
    iv = (
        ev.select(
            "user_id",
            F.to_date("ts").alias("day"),
            F.unix_micros("ts").alias("us"),
        )
        .groupBy("user_id", "day")
        .agg(F.min("us").alias("start"), F.max("us").alias("end"))
    )
    # bucket_width = 1 day: the operator's own guidance is "size it
    # near the typical interval length", and these intervals are
    # (user, day) activity spans — by construction inside ONE UTC day,
    # typically covering most of it. A day-wide bucket makes every
    # interval explode to EXACTLY one bucket (its own day), so the
    # join fans out once per same-day user pair instead of once per
    # shared 6-hour slot (measured at sf0.1: explode 91 k → 40 k rows,
    # join fan-out 71.5 M → 53.6 M rows, interleaved worktree A/B
    # minima {4.02, 3.59} → {3.49, 3.11} s; guide §3.3 — explode
    # multiplies the shuffle). Results are identical for ANY width by
    # the overlap-start exactly-once rule; the sf0.01 oracle pins it.
    pairs = interval_overlap_join(
        iv, iv, bucket_width=24 * 3600 * 1_000_000, partition_cols=["day"]
    ).filter(F.col("a_user_id") < F.col("b_user_id"))
    return pairs.select(
        "day",
        "a_user_id",
        "a_start",
        "a_end",
        "b_user_id",
        "b_start",
        "b_end",
        "overlap_amount",
    )


_INTERVAL_OVERLAP_SQL = """
WITH iv AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         min(epoch_ns(ts) // 1000) AS ivs,
         max(epoch_ns(ts) // 1000) AS ive
  FROM events GROUP BY 1, 2
)
SELECT a.day, a.user_id AS a_user_id, a.ivs AS a_start, a.ive AS a_end,
       b.user_id AS b_user_id, b.ivs AS b_start, b.ive AS b_end,
       least(a.ive, b.ive) - greatest(a.ivs, b.ivs) AS overlap_amount
FROM iv a JOIN iv b
  ON a.day = b.day AND a.user_id < b.user_id
 AND a.ivs <= b.ive AND b.ivs <= a.ive
"""


def q_spatial_grid_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-bucketed spatial nearest neighbor over deterministic
    customer coordinates (operators/spatial.py): the space-binning
    join discipline — candidates ∝ local density, never all-pairs.
    Coordinates are k/8 degree lattice points (exact binaries), so the
    squared-degree distances are bit-identical cross-engine."""
    from etl_global_mobility_spark.operators.spatial import (
        grid_nearest_neighbor,
    )

    c = load_table(spark, sf_dir, "customer")
    pts = c.select(
        F.col("c_custkey").alias("id"),
        ((F.col("c_custkey") * 37 % 1440) / 8.0 - 90.0).alias("lat"),
        ((F.col("c_custkey") * 73 % 2880) / 8.0 - 180.0).alias("lon"),
    )
    return grid_nearest_neighbor(pts, cell_deg=5.0)


_SPATIAL_NEAREST_SQL = """
WITH pts AS (
  SELECT c_custkey AS id,
         (c_custkey * 37 % 1440) / 8.0 - 90.0 AS lat,
         (c_custkey * 73 % 2880) / 8.0 - 180.0 AS lon
  FROM customer
), g AS (
  SELECT *, CAST(floor((lat + 90.0) / 5.0) AS INT) AS gx,
         CAST(floor((lon + 180.0) / 5.0) AS INT) AS gy
  FROM pts
), probe AS (
  SELECT id, lat, lon, gx + dx.o AS cx, gy + dy.o AS cy
  FROM g, (VALUES (-1), (0), (1)) dx(o), (VALUES (-1), (0), (1)) dy(o)
), cand AS (
  SELECT p.id, b.id AS nb,
         (p.lat - b.lat) * (p.lat - b.lat)
         + (p.lon - b.lon) * (p.lon - b.lon) AS d2
  FROM probe p JOIN g b ON b.gx = p.cx AND b.gy = p.cy AND b.id <> p.id
), best AS (
  SELECT id, nb, d2,
         row_number() OVER (PARTITION BY id ORDER BY d2, nb) AS rk
  FROM cand
)
SELECT id, nb AS nearest_id, d2 FROM best WHERE rk = 1
"""


def q_tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers) adapted to the driver schema:
    orders whose total lineitem quantity exceeds a threshold, joined
    back to customer and lineitem for the top-20 report. The canonical
    "aggregate → HAVING → rejoin the fact" shape: the heavy groupBy
    runs once, its (small) surviving key set drives the rejoin, and the
    bounded top-k plans as TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.col("sum_qty").cast("double").alias("sum_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


def q_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on read: two parquet batches with different
    schemas (the second adds ``s_acctbal``) merged by
    ``mergeSchema=true`` — the long-lived-table reality at 100 TB,
    where columns are added over months and old files are never
    rewritten. Rows from the narrow batch surface the new column as
    NULL; the oracle recomputes that shape from the original table.
    (mergeSchema is a footer-only union of schemas — it reads file
    metadata, not data, so evolution costs nothing at scan time.)"""
    import os

    out = _scratch_dir("schema_evo", sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    old = s.filter(F.col("s_suppkey") < 50).select("s_suppkey", "s_name")
    new = s.filter(F.col("s_suppkey") >= 50).select(
        "s_suppkey", "s_name", "s_acctbal"
    )
    old.coalesce(1).write.mode("overwrite").parquet(os.path.join(out, "b=1"))
    new.coalesce(1).write.mode("overwrite").parquet(os.path.join(out, "b=2"))
    df = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(out, "b=1"), os.path.join(out, "b=2")
    )
    return df.select(
        "s_suppkey",
        "s_name",
        "s_acctbal",
        F.col("s_acctbal").isNull().alias("from_old_schema"),
    )


def q_csv_corrupt_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-input handling (PERMISSIVE mode): a CSV with injected
    bad rows — wrong arity, unparseable int — read with a
    ``_corrupt_record`` column instead of failing the job. The good
    rows and the reject count are both asserted against the clean
    source table: ingestion at scale quarantines bad lines, it never
    dies on them (the CSV twin of the reference's quarantine split,
    NB:655-667)."""
    import os

    from pyspark.sql import types as T

    out = _scratch_dir("csv_corrupt", sf_dir)
    os.makedirs(out, exist_ok=True)
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    ).orderBy("n_nationkey")
    path = os.path.join(out, "data.csv")
    with open(path, "w") as f:
        f.write("n_nationkey,n_name\n")
        for row in n.collect():  # bounded: 25 rows at any SF
            f.write(f"{row['n_nationkey']},{row['n_name']}\n")
        f.write("not_an_int,BADLAND\n")  # type failure
        f.write("7\n")  # arity failure
    schema = T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    df = (
        spark.read.schema(schema)
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )
    df = df.cache()  # corrupt-record column requires materialized parse
    return df.agg(
        F.count(F.when(F.col("_corrupt_record").isNull(), 1)).alias("n_good"),
        F.count(F.col("_corrupt_record")).alias("n_corrupt"),
        F.sum(
            F.when(
                F.col("_corrupt_record").isNull(), F.col("n_nationkey")
            )
        ).alias("key_sum"),
    )


def q_source_python_ds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python Data Source (Spark 4.x API): the deterministic
    synthetic-events generator from sources/pysource.py, aggregated
    per bucket. Every cell is closed-form arithmetic in the global row
    id and values are dyadic rationals (k/8), so double sums are exact
    under ANY addition order — which is what lets a custom *Python*
    source still be oracle-checked bit-for-bit."""
    from etl_global_mobility_spark.sources.pysource import register

    register(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("n_rows", 10_000)
        .option("n_partitions", 8)
        .load()
    )
    return df.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum("value").alias("sum_value"),
        F.max("event_id").alias("max_id"),
    )


def q_percentiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (p25/p50/p75) of extendedprice
    per returnflag — Spark's `percentile` and DuckDB's `quantile_cont`
    share the (n-1)·p linear-interpolation definition, and the binary
    fractions 0.25/0.5/0.75 keep the rank arithmetic FP-exact, so raw
    doubles hash-match (verified at sf0.01)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr(
                "percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D))"
            ).alias("p"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select(
            "l_returnflag",
            F.element_at("p", 1).alias("p25"),
            F.element_at("p", 2).alias("p50"),
            F.element_at("p", 3).alias("p75"),
            "n_items",
        )
    )


def q_tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): the pure scan-aggregate —
    no join at all. Every predicate (ship-year, discount band,
    quantity cap) is scan-pushable and the whole query is one
    map-side partial sum + a 1-row final agg; at 100 TB this is the
    query whose cost is ENTIRELY the parquet scan, which is why its
    plan is pinned to show PushedFilters and no shuffle beyond the
    final 1-row exchange. Revenue = extendedprice * discount summed
    as exact decimal, cast to double once."""
    li = load_table(spark, sf_dir, "lineitem")
    gain = F.col("l_extendedprice").cast("decimal(18,2)") * F.col(
        "l_discount"
    ).cast("decimal(4,2)")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= F.lit(0.02))
            & (F.col("l_discount") <= F.lit(0.06))
            & (F.col("l_quantity") < F.lit(24.0))
        ).agg(F.sum(gain).cast("double").alias("revenue"))
    )


def q_tpch_q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): one-month lineitem slice joined to
    part, conditional decimal sum ratio. The month filter pushes to
    the fact scan; part is left unhinted (AQE broadcasts it at test
    scale; at 100 TB part scales with SF and correctly shuffles).
    Both sums stay decimal-exact; the single double division is
    explicitly parenthesized identically in both engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = _rev_col()
    agg = li.join(p, li.l_partkey == p.p_partkey).agg(
        F.sum(F.when(F.col("p_type") == "PROMO", rev)).alias("_promo"),
        F.sum(rev).alias("_total"),
    )
    return agg.select(
        (
            F.lit(100.0)
            * (
                F.coalesce(F.col("_promo").cast("double"), F.lit(0.0))
                / F.col("_total").cast("double")
            )
        ).alias("promo_revenue_pct")
    )


def q_tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue, adapted to the driver part
    schema: brand + size + quantity bands stand in for the
    brand/container/quantity triplets): the canonical DISJUNCTIVE
    join predicate. Catalyst extracts the common `l_partkey =
    p_partkey` conjunct as the equi-join key and evaluates the OR
    blocks as a post-join filter — without that extraction this
    would degenerate to a cartesian product, which the plan gate
    forbids; the plan pin asserts the join stays an equi-join."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    blocks = (
        (F.col("p_brand") == "Brand#13")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1.0, 20.0)
    ) | (
        (F.col("p_brand") == "Brand#22")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(5.0, 30.0)
    ) | (
        (F.col("p_brand") == "Brand#25")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(10.0, 40.0)
    )
    return li.join(p, (li.l_partkey == p.p_partkey) & blocks).agg(
        F.sum(_rev_col()).cast("double").alias("revenue")
    )


def q_tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order-priority checking) adapted to the driver schema
    (no commit/receipt dates): an order counts when SOME lineitem
    shipped more than 60 days after the order date — the canonical
    EXISTS, executed as a LEFT SEMI join whose condition spans both
    sides. Cost: one semi-join shuffle on orderkey (each order
    emitted at most once, no post-join dedup), then a 5-group agg."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def q_tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): revenue shipped between two fixed
    nations in either direction, by supplier nation / customer
    nation / ship-year. The two nation copies are explicit
    broadcasts (25 rows, fixed forever); the either-direction pair
    filter lands AFTER both nation joins so Catalyst evaluates it on
    broadcast-joined rows — no fact-fact blowup. Ship-year via
    F.year ≡ CAST(year() AS INT)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("_n1_key"),
        F.col("n_name").alias("supp_nation"),
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("_n2_key"),
        F.col("n_name").alias("cust_nation"),
    )
    pair = (
        (F.col("supp_nation") == "NATION_3")
        & (F.col("cust_nation") == "NATION_7")
    ) | (
        (F.col("supp_nation") == "NATION_7")
        & (F.col("cust_nation") == "NATION_3")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("_n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("_n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.sum(_rev_col()).cast("double").alias("revenue"))
    )


def q_tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): NATION_3's share of ECONOMY-
    part revenue sold into AMERICA, per order year. region→nation
    and the supplier nation are broadcast; the conditional numerator
    and the total stay decimal-exact and the single share division
    is parenthesized identically in both engines. NULL numerator
    (a year with no NATION_3 sales) coalesces to 0 share."""
    r = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "AMERICA"
    )
    n_cust = load_table(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("_nc_key"))
    n_supp = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("_ns_key"),
        F.col("n_name").alias("supp_nation"),
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    rev = _rev_col()
    agg = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n_cust), c.c_nationkey == F.col("_nc_key"))
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n_supp), s.s_nationkey == F.col("_ns_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", rev)).alias(
                "_nat"
            ),
            F.sum(rev).alias("_total"),
        )
    )
    return agg.select(
        "o_year",
        (
            F.coalesce(F.col("_nat").cast("double"), F.lit(0.0))
            / F.col("_total").cast("double")
        ).alias("mkt_share"),
    )


def q_tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit) adapted to the driver schema:
    there is no partsupp table, so p_retailprice stands in for
    ps_supplycost (documented adaptation — the join tree and the
    amount arithmetic keep Q9's shape). Profit per supplier nation
    per order year over parts whose name contains 'widget'. Both
    the revenue and cost terms are decimal-exact, so the per-group
    sums hash-match under any partitioning; the part-name filter
    prunes the fact join early."""
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains("widget")
    )
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    amount = _rev_col() - F.col("p_retailprice").cast(
        "decimal(18,2)"
    ) * F.col("l_quantity").cast("decimal(18,2)")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
    )


def q_tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier) adapted to the driver schema:
    no partsupp table, so the (part, supplier) supply cost is
    derived as min(l_extendedprice) over lineitem — pure value
    comparisons, no float arithmetic, so the correlated minimum is
    engine-exact. For SMALL parts of size ≥ 10, keep only the
    EUROPE suppliers achieving the per-part minimum cost — the
    correlated scalar subquery expressed as a per-part min + join
    back (the scalable rewrite; the oracle states it as the
    textbook correlated subquery). Top-100 by account balance."""
    pair_cost = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("l_extendedprice").alias("supply_cost"))
    )
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "SMALL") & (F.col("p_size") >= 10)
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n = load_table(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    s = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n.select("n_nationkey", "n_name")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    eligible = (
        pair_cost.join(p, pair_cost.l_partkey == p.p_partkey)
        .join(s, pair_cost.l_suppkey == s.s_suppkey)
        .select("p_partkey", "s_suppkey", "s_name", "s_acctbal",
                "n_name", "supply_cost")
    )
    min_cost = eligible.groupBy(F.col("p_partkey").alias("_mk")).agg(
        F.min("supply_cost").alias("_min_cost")
    )
    return (
        eligible.join(
            min_cost,
            (eligible.p_partkey == F.col("_mk"))
            & (eligible.supply_cost == F.col("_min_cost")),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "supply_cost")
        .orderBy(
            F.col("s_acctbal").desc(),
            F.col("s_name"),
            F.col("p_partkey"),
        )
        .limit(100)
    )


def q_tpch_q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue, threshold adapted to
    0.5·avg so the driver data keeps rows at sf0.001): revenue from
    Brand#13 lineitems whose quantity is below half the part's
    average quantity, divided by 7 for the yearly figure. The
    correlated avg subquery is rewritten as brand-filter → per-part
    avg on the FILTERED subset → join back, so the aggregation input
    is brand-sized, not corpus-sized. l_quantity is integral, so the
    double avg is order-independent (exact integer sums ≤ 2^53)."""
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#13"
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    li2 = li.join(p, li.l_partkey == p.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    stats = li2.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.avg("l_quantity").alias("_avg_qty")
    )
    return (
        li2.join(stats, li2.l_partkey == F.col("_pk"))
        .filter(F.col("l_quantity") < F.lit(0.5) * F.col("_avg_qty"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast(
                    "double"
                )
                / F.lit(7.0)
            ).alias("avg_yearly")
        )
    )


def q_tpch_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship) adapted to the driver
    schema: (part, supplier) pairs come from distinct lineitem
    observations (no partsupp), the 'complaints' NOT IN exclusion
    becomes suppliers with negative account balance. Distinct
    supplier counts per (brand, type, size) for a 4-value size set,
    excluding Brand#13 and PROMO parts. Shape: dedup'd fact pairs →
    anti join (the NOT IN; keys non-null by construction) →
    count-distinct aggregation."""
    pairs = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 14, 23, 45)
    )
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select(F.col("s_suppkey").alias("_bad_key"))
    return (
        pairs.join(p, pairs.l_partkey == p.p_partkey)
        .join(
            F.broadcast(bad),
            pairs.l_suppkey == F.col("_bad_key"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q_tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting) adapted to the
    driver schema: 'late' is shipping >90 days after the order date
    (no receipt/commit dates). A NATION_19 supplier (a nation that
    holds rows at every test SF) waits on a finished order when its
    line was late, the order involved ≥2 distinct suppliers, and NO
    OTHER supplier was late. The classic
    EXISTS + NOT-EXISTS lineitem self-joins are rewritten as ONE
    per-order aggregation (distinct suppliers, distinct late
    suppliers) joined back to the late candidates — one shuffle on
    orderkey instead of two extra fact self-joins; the oracle states
    the textbook nested form. Top-20 by wait count."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    lo = (
        load_table(spark, sf_dir, "lineitem")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
            ).alias("late"),
        )
    )
    per_order = lo.groupBy(F.col("l_orderkey").alias("_ok")).agg(
        F.countDistinct("l_suppkey").alias("_n_supp"),
        F.countDistinct(
            F.when(F.col("late"), F.col("l_suppkey"))
        ).alias("_n_late"),
    )
    cand = lo.filter(F.col("late")).select("l_orderkey", "l_suppkey").distinct()
    s = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(
            load_table(spark, sf_dir, "nation").filter(
                F.col("n_name") == "NATION_19"
            ).select("n_nationkey")
        ),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name")
    return (
        cand.join(
            per_order,
            (cand.l_orderkey == F.col("_ok"))
            & (F.col("_n_supp") >= 2)
            & (F.col("_n_late") == 1),
        )
        .join(s, cand.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(20)
    )


def q_tpch_q22_global_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity) adapted to the driver
    schema: the phone country code becomes c_nationkey mod 5 (same
    shape: a derived code, a membership filter), 'positive-balance
    average' is a 1-row scalar subquery broadcast to every row, and
    'customers with no orders' becomes customers with no RECENT
    orders (≥ 1999; every synthetic customer has some order, so the
    unfiltered anti join would be vacuously empty) via LEFT ANTI
    join against the date-filtered orders. The balance
    aggregate is summed as decimal and divided once, so the
    threshold — and therefore the row set — is engine-exact."""
    c = load_table(spark, sf_dir, "customer").withColumn(
        "cntrycode", (F.col("c_nationkey") % 5).cast("int")
    ).filter(F.col("cntrycode").isin(1, 2, 3))
    pos = load_table(spark, sf_dir, "customer").filter(
        F.col("c_acctbal") > 0.0
    )
    avg_bal = pos.agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("_avg_bal")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        .select(F.col("o_custkey").alias("_o_custkey"))
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(o, F.col("c_custkey") == F.col("_o_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("totacctbal"),
        )
    )


def q_tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): quarterly revenue per supplier, keep
    the supplier(s) achieving the MAXIMUM — the agg-then-scalar-max-
    then-equality-join shape (the reference formulates it as a view +
    scalar subquery; the rewrite is a 1-row broadcast equi-join on the
    revenue value, which is exact because both sides carry the same
    decimal-sum-cast-double). Ties all surface, per the spec."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(_rev_col()).cast("double").alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("_max_rev"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("_max_rev"))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


def q_tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock) adapted to the driver schema (no
    partsupp): a part is 'important' for NATION_3 when its lineitem
    value through that nation's suppliers exceeds 0.2% of the nation's
    total (threshold sized so rows survive at every test SF) — the agg-HAVING-against-global-scalar shape. The 1-row
    total broadcasts onto the bounded per-part frame (a justified
    BroadcastNestedLoopJoin); value sums stay decimal-exact and the
    threshold is ONE double multiply, so the row set is engine-exact."""
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_3"
    ).select("n_nationkey")
    s = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    li = load_table(spark, sf_dir, "lineitem")
    per_part = (
        li.join(s, li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("_pv")
        )
    )
    tot = per_part.agg(F.sum("_pv").alias("_tot"))
    return (
        per_part.join(F.broadcast(tot))
        .filter(
            F.col("_pv").cast("double")
            > F.lit(0.002) * F.col("_tot").cast("double")
        )
        .select(
            "l_partkey", F.col("_pv").cast("double").alias("part_value")
        )
    )


def q_tpch_q20_small_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion) adapted to the driver
    schema: suppliers who shipped more than 50 units of some SMALL
    part in 1996 — the chained-IN-subqueries shape (parts IN name
    filter → (part, supplier) quantity agg → suppliers IN heavy
    shippers), executed as filter → agg → distinct → LEFT SEMI join.
    Integral quantity sums are exact in double, so the >50 cut is
    engine-exact; nation names attach via broadcast."""
    sp = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "SMALL"
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    heavy = (
        li.join(sp, li.l_partkey == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("_q"))
        .filter(F.col("_q") > 50.0)
        .select("l_suppkey")
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        s.join(heavy, s.s_suppkey == heavy.l_suppkey, "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    )


def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via Median Absolute Deviation: per
    event type, score = |x − median| / MAD, flag > 3.5 (the classic
    Iglewicz–Hoaglin cut uses 0.6745·score; the raw ratio keeps the
    arithmetic to two exact interpolated medians + one subtraction +
    one division, every step engine-portable — see
    rel_percentiles_exact for why percentile/quantile_cont match).
    The two per-group medians and the join back are all keyed on the
    bounded event_type, so nothing here is corpus-shuffled more than
    once; a zero MAD (constant group) yields NULL scores rather than
    Infinity."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    med = ev.groupBy(F.col("event_type").alias("_et1")).agg(
        F.expr("percentile(value, 0.5D)").alias("_med")
    )
    dev = ev.join(
        F.broadcast(med), F.col("event_type") == F.col("_et1")
    ).withColumn("_dev", F.abs(F.col("value") - F.col("_med")))
    mad = dev.groupBy(F.col("event_type").alias("_et2")).agg(
        F.expr("percentile(_dev, 0.5D)").alias("_mad")
    )
    score = F.when(
        F.col("_mad") > 0.0, F.col("_dev") / F.col("_mad")
    )
    return (
        dev.join(F.broadcast(mad), F.col("event_type") == F.col("_et2"))
        .select(
            "event_id",
            "event_type",
            "value",
            score.alias("mad_z"),
            (score > 3.5).alias("is_outlier"),
        )
    )



def q_agg_conditional_modern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modern conditional aggregates in one grouped pass (Spark 3.5+/4
    surface): count_if, bool_and/bool_or, and a FILTER-clause-shaped
    conditional sum — the idiomatic replacements for
    sum(CASE WHEN ... THEN 1 ELSE 0 END) bookkeeping. All reduce to
    the same partial/final hash aggregation (map-side combined), so
    the modern spellings cost nothing over the CASE forms."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_quantity") > 25).alias("n_big_qty"),
        F.bool_and(F.col("l_quantity") > 0).alias("all_positive"),
        F.bool_or(F.col("l_discount") > F.lit(0.09)).alias("any_deep_discount"),
        F.sum(
            F.when(
                F.col("l_linestatus") == "F",
                F.col("l_quantity").cast("decimal(18,2)"),
            )
        ).cast("double").alias("sum_qty_finished"),
        F.count(F.lit(1)).alias("n_rows"),
    )


SPECS = [
    QuerySpec(
        "rel_percentiles_exact",
        q_percentiles_exact,
        """SELECT l_returnflag,
               quantile_cont(l_extendedprice, 0.25) AS p25,
               quantile_cont(l_extendedprice, 0.5) AS p50,
               quantile_cont(l_extendedprice, 0.75) AS p75,
               count(*) AS n_items
           FROM lineitem GROUP BY l_returnflag""",
        doc="exact interpolated percentiles per group (percentile / quantile_cont)",
    ),
    QuerySpec(
        "rel_source_json",
        q_source_json,
        """SELECT s_suppkey, s_name, s_nationkey, s_acctbal,
               CAST(length(s_name) AS INT) AS name_len
           FROM supplier""",
        doc="JSON-lines source round-trip, explicit schema (no inference)",
    ),
    QuerySpec(
        "rel_source_orc",
        q_source_orc,
        """SELECT s_suppkey, s_nationkey, s_acctbal
           FROM supplier WHERE s_acctbal > 0""",
        doc="ORC source round-trip with pushed-down filter",
    ),
    QuerySpec(
        "rel_source_avro",
        q_source_avro,
        """SELECT s_suppkey, s_nationkey, s_acctbal
           FROM supplier WHERE s_acctbal > 0""",
        doc="Avro source round-trip (embedded-connector resolution, "
        "sources/formats.py) with post-scan filter",
    ),
    QuerySpec(
        "rel_source_parquet_zstd",
        q_source_parquet_zstd,
        """SELECT p_partkey, p_brand, p_size, p_retailprice
           FROM part WHERE p_size >= 25""",
        doc="parquet ZSTD codec round-trip (files asserted zstd-encoded) "
        "with pushed-down filter",
    ),
    QuerySpec(
        "rel_source_text_wholetext",
        q_source_text_wholetext,
        """SELECT doc_id,
               CAST(length(text) AS INT) AS n_chars_rt,
               substr(md5(text), 1, 16) AS content_md5
           FROM documents WHERE doc_id < 500""",
        doc="one-document-per-file wholetext ingestion round-trip "
        "(partitioned text layout, file -> row, content md5-proven; "
        "deterministic 500-doc cap - cost is the file layout itself)",
    ),
    QuerySpec(
        "rel_source_xml",
        q_source_xml,
        """SELECT s_suppkey, s_name, s_nationkey, s_acctbal,
               CAST(length(s_name) AS INT) AS name_len
           FROM supplier""",
        doc="XML source round-trip (built-in since Spark 4), explicit schema",
    ),
    QuerySpec(
        "rel_pagerank",
        q_pagerank,
        _pagerank_sql(),
        doc="PageRank, 3 bounded iterations, integer fixed-point (order-independent)",
    ),
    QuerySpec(
        "rel_pagerank_convergence",
        q_pagerank_convergence,
        _pagerank_convergence_sql(),
        doc="power-iteration residual curve: per-round exact-integer "
        "L1 score delta + per-node average — the stopping-rule dial "
        "behind the fixed-iteration PageRank contract",
    ),
    QuerySpec(
        "rel_lateral_topk",
        q_lateral_topk,
        """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
           FROM customer c,
           LATERAL (
             SELECT o_orderkey, o_totalprice FROM orders
             WHERE o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey
             LIMIT 3
           ) o
           WHERE c.c_custkey < 200""",
        doc="LATERAL correlated top-k subquery (decorrelated by Catalyst)",
    ),
    QuerySpec(
        "rel_listagg",
        q_listagg,
        """SELECT l_returnflag,
               string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus)
                 AS statuses,
               count(*) AS n
           FROM lineitem GROUP BY l_returnflag""",
        doc="listagg WITHIN GROUP ordered string aggregation (Spark 4)",
    ),
    QuerySpec(
        "rel_null_aware_anti_join",
        q_null_aware_anti_join,
        """SELECT c_custkey, c_mktsegment
           FROM customer
           WHERE c_custkey NOT IN (
             SELECT o_custkey FROM orders WHERE o_totalprice > 400000
           )""",
        doc="NOT IN null-aware anti-join (distinct from NOT EXISTS semantics)",
    ),
    QuerySpec(
        "rel_dataset_card",
        q_dataset_card,
        """SELECT source,
               count(*) AS n_docs,
               count(*) - count(DISTINCT sha256(text)) AS n_exact_dups,
               CAST(sum(len(list_filter(string_split_regex(lower(trim(text)),
                    '\\s+'), x -> len(x) > 0))) AS BIGINT) AS n_tokens,
               count(DISTINCT lang) AS n_langs,
               CAST(sum(length(text)) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                 AS mean_chars
           FROM documents GROUP BY source""",
        doc="per-source dataset-card statistics in one scan + one aggregation",
    ),
    QuerySpec(
        "rel_scd2_dimension",
        q_scd2_dimension,
        """WITH base AS (
             SELECT c_custkey, c_name, c_mktsegment FROM customer
           ), hist AS (
             SELECT c_custkey, c_name, 'OLD' AS c_mktsegment,
                    TIMESTAMP '2018-01-01' AS valid_from,
                    TIMESTAMP '2020-01-01' AS valid_to
             FROM base WHERE c_custkey < 10
           ), open_rows AS (
             SELECT c_custkey, c_name, c_mktsegment,
                    TIMESTAMP '2020-01-01' AS valid_from,
                    CAST(NULL AS TIMESTAMP) AS valid_to
             FROM base
           ), changes AS (
             SELECT c_custkey, c_name, 'CHANGED' AS c_mktsegment
             FROM base WHERE c_custkey % 10 = 0
             UNION ALL
             SELECT c_custkey, c_name, c_mktsegment
             FROM base WHERE c_custkey <= 5
             UNION ALL
             SELECT c_custkey + 100000, c_name, 'NEW'
             FROM base WHERE c_custkey < 5
           ), j AS (
             SELECT o.c_custkey, o.c_name, o.c_mktsegment,
                    o.valid_from, o.valid_to,
                    ch.c_custkey AS _k, ch.c_name AS _cn,
                    ch.c_mktsegment AS _cs
             FROM open_rows o FULL OUTER JOIN changes ch
               ON o.c_custkey = ch.c_custkey
           ), differs AS (
             SELECT *,
                    NOT (c_name IS NOT DISTINCT FROM _cn
                         AND c_mktsegment IS NOT DISTINCT FROM _cs) AS d
             FROM j
           )
           SELECT c_custkey, c_name, c_mktsegment, valid_from, valid_to
           FROM hist
           UNION ALL
           SELECT c_custkey, c_name, c_mktsegment, valid_from, valid_to
           FROM differs WHERE c_custkey IS NOT NULL AND _k IS NULL
           UNION ALL
           SELECT c_custkey, c_name, c_mktsegment, valid_from, valid_to
           FROM differs
           WHERE c_custkey IS NOT NULL AND _k IS NOT NULL AND NOT d
           UNION ALL
           SELECT c_custkey, c_name, c_mktsegment, valid_from,
                  TIMESTAMP '2024-06-01'
           FROM differs WHERE c_custkey IS NOT NULL AND _k IS NOT NULL AND d
           UNION ALL
           SELECT _k, _cn, _cs, TIMESTAMP '2024-06-01',
                  CAST(NULL AS TIMESTAMP)
           FROM differs
           WHERE (_k IS NOT NULL AND c_custkey IS NOT NULL AND d)
              OR c_custkey IS NULL""",
        doc="SCD Type 2 dimension merge (close superseded versions, "
        "insert new, history untouched)",
    ),
    QuerySpec(
        "rel_snapshot_diff",
        q_snapshot_diff,
        """WITH base AS (
             SELECT c_custkey, c_name, c_mktsegment FROM customer
           ), new AS (
             SELECT c_custkey, c_name,
                    CASE WHEN c_custkey % 10 = 0 THEN 'CHANGED'
                         ELSE c_mktsegment END AS c_mktsegment
             FROM base WHERE c_custkey % 97 != 0
             UNION ALL
             SELECT c_custkey + 100000, c_name, 'NEW'
             FROM base WHERE c_custkey < 5
           )
           SELECT 'insert' AS op, n.c_custkey, n.c_name, n.c_mktsegment
           FROM new n LEFT JOIN base o USING (c_custkey)
           WHERE o.c_custkey IS NULL
           UNION ALL
           SELECT 'update', n.c_custkey, n.c_name, n.c_mktsegment
           FROM new n JOIN base o USING (c_custkey)
           WHERE NOT (n.c_name IS NOT DISTINCT FROM o.c_name
                      AND n.c_mktsegment IS NOT DISTINCT FROM o.c_mktsegment)
           UNION ALL
           SELECT 'delete', o.c_custkey, o.c_name, o.c_mktsegment
           FROM base o LEFT JOIN new n USING (c_custkey)
           WHERE n.c_custkey IS NULL""",
        doc="CDC generation: snapshot diff into op-tagged changeset "
        "(output proportional to churn)",
    ),
    QuerySpec(
        "rel_scd2_point_in_time",
        q_scd2_point_in_time,
        """WITH base AS (
             SELECT c_custkey, c_name, c_mktsegment FROM customer
           ), dim AS (
             -- unchanged keys: one open version from 1995
             SELECT c_custkey, c_mktsegment,
                    TIMESTAMP '1995-01-01' AS valid_from,
                    CAST(NULL AS TIMESTAMP) AS valid_to
             FROM base WHERE c_custkey % 10 != 0
             UNION ALL
             -- changed keys: closed original + open CHANGED version
             SELECT c_custkey, c_mktsegment,
                    TIMESTAMP '1995-01-01', TIMESTAMP '1999-07-01'
             FROM base WHERE c_custkey % 10 = 0
             UNION ALL
             SELECT c_custkey, 'CHANGED',
                    TIMESTAMP '1999-07-01', CAST(NULL AS TIMESTAMP)
             FROM base WHERE c_custkey % 10 = 0
           )
           SELECT d.c_mktsegment, count(*) AS n_orders
           FROM orders o JOIN dim d
             ON o.o_custkey = d.c_custkey
            AND o.o_orderdate >= d.valid_from
            AND (d.valid_to IS NULL OR o.o_orderdate < d.valid_to)
           GROUP BY d.c_mktsegment""",
        doc="point-in-time SCD2 lookup (version valid at fact time; "
        "broadcast versioned dim, map-only fact stream)",
    ),
    QuerySpec(
        "rel_expectations_report",
        q_expectations_report,
        """WITH agg AS (
             SELECT
               sum(CASE WHEN coalesce(o_custkey IS NOT NULL, FALSE)
                        THEN 0 ELSE 1 END) AS v1,
               sum(CASE WHEN coalesce(o_totalprice > 0, FALSE)
                        THEN 0 ELSE 1 END) AS v2,
               sum(CASE WHEN coalesce(o_orderstatus IN ('O','F','P'), FALSE)
                        THEN 0 ELSE 1 END) AS v3,
               sum(CASE WHEN coalesce(o_orderdate >= TIMESTAMP '1990-01-01',
                                      FALSE) THEN 0 ELSE 1 END) AS v4,
               count(o_orderkey) - count(DISTINCT o_orderkey) AS v5
             FROM orders
           ), fk AS (
             SELECT count(*) AS v6 FROM orders o
             WHERE o_custkey IS NOT NULL
               AND NOT EXISTS (SELECT 1 FROM customer c
                               WHERE c.c_custkey = o.o_custkey)
           )
           SELECT rule, CAST(n_violations AS BIGINT) AS n_violations,
                  n_violations = 0 AS ok
           FROM (
             SELECT 'not_null_custkey' AS rule, v1 AS n_violations FROM agg
             UNION ALL SELECT 'positive_price', v2 FROM agg
             UNION ALL SELECT 'known_status', v3 FROM agg
             UNION ALL SELECT 'date_in_range', v4 FROM agg
             UNION ALL SELECT 'unique_o_orderkey', v5 FROM agg
             UNION ALL SELECT 'fk_o_custkey', v6 FROM fk
           )""",
        doc="declarative expectations report (one-scan contract check + "
        "FK anti-join)",
    ),
    QuerySpec(
        "rel_running_distinct",
        q_running_distinct,
        """WITH flagged AS (
             SELECT event_id, event_type, ts,
                    CAST(row_number() OVER (PARTITION BY event_type, user_id
                                            ORDER BY ts, event_id) = 1
                         AS BIGINT) AS first_seen
             FROM events)
           SELECT event_id, event_type, ts,
                  CAST(sum(first_seen) OVER (PARTITION BY event_type
                                             ORDER BY ts, event_id)
                       AS BIGINT) AS distinct_users_so_far
           FROM flagged""",
        doc="running distinct count (first-occurrence flag + running sum "
        "— COUNT(DISTINCT) OVER exists in no engine)",
    ),
    QuerySpec(
        "rel_ratio_to_report",
        q_ratio_to_report,
        f"""WITH per AS (
             SELECT n_name, sum({_REV}) AS revenue_dec
             FROM lineitem
             JOIN orders   ON l_orderkey = o_orderkey
             JOIN customer ON o_custkey = c_custkey
             JOIN nation   ON c_nationkey = n_nationkey
             GROUP BY n_name)
           SELECT n_name,
                  CAST(revenue_dec AS DOUBLE) AS revenue,
                  CAST(revenue_dec AS DOUBLE)
                    / CAST(sum(revenue_dec) OVER () AS DOUBLE) AS share
           FROM per""",
        doc="percent-of-total / ratio-to-report (decimal-exact totals)",
    ),
    QuerySpec(
        "rel_mask_redaction",
        q_mask_redaction,
        """SELECT c_custkey,
               regexp_replace(regexp_replace(regexp_replace(
                 c_name, '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'),
                 '[0-9]', 'n', 'g') AS name_masked,
               regexp_replace(regexp_replace(regexp_replace(
                 c_mktsegment, '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'),
                 '[0-9]', 'n', 'g') AS segment_masked
           FROM customer""",
        doc="mask() shape-preserving redaction (governed-export path)",
    ),
    QuerySpec(
        "rel_null_safe_join",
        q_null_safe_join,
        """WITH l AS (SELECT nullif(user_id % 7, 3) AS k FROM events),
                r AS (SELECT nullif(s_suppkey % 7, 3) AS k FROM supplier)
           SELECT l.k, count(*) AS n_pairs
           FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
           GROUP BY l.k""",
        doc="null-safe equality join (<=> / IS NOT DISTINCT FROM)",
    ),
    QuerySpec(
        "rel_triangle_count",
        q_triangle_count,
        """WITH raw AS (
             SELECT s_suppkey AS u, (s_suppkey * 7) % 100 AS v
             FROM supplier WHERE s_suppkey != (s_suppkey * 7) % 100
           ), edges AS (
             SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b FROM raw
           )
           SELECT count(*) AS n_triangles
           FROM edges e1
           JOIN edges e2 ON e1.b = e2.a
           JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b""",
        doc="triangle counting via canonical-order edge self-joins",
    ),
    QuerySpec(
        "rel_robust_scaling",
        q_robust_scaling,
        """WITH q AS (
             SELECT event_type,
                    quantile_cont(value, 0.25) AS p25,
                    quantile_cont(value, 0.75) AS p75,
                    min(value) AS vmin, max(value) AS vmax
             FROM events GROUP BY event_type)
           SELECT event_id, e.event_type, value,
                  least(greatest(value, p25), p75) AS value_clipped,
                  CASE WHEN vmax = vmin THEN CAST(0.5 AS DOUBLE)
                       ELSE (value - vmin) / (vmax - vmin)
                  END AS value_norm
           FROM events e JOIN q USING (event_type)""",
        doc="per-group robust scaling: IQR winsorization + min-max "
        "normalization in one stats pass (merges the r3 "
        "rel_winsorize_iqr + rel_minmax_normalize variants)",
    ),
    QuerySpec(
        "rel_moving_window_sum",
        q_moving_window_sum,
        """SELECT event_id, user_id, ts,
               CAST(sum(CAST(floor(value * 1000 + 0.5) AS BIGINT)) OVER w
                    AS BIGINT) AS mov_sum_millis,
               count(*) OVER w AS mov_n,
               CAST(sum(CAST(floor(value * 1000 + 0.5) AS BIGINT)) OVER w
                    AS DOUBLE) / CAST(count(*) OVER w AS DOUBLE) AS mov_avg
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)""",
        doc="bounded sliding frame: integer-exact 7-row moving totals",
    ),
    QuerySpec(
        "rel_error_safe_functions",
        q_error_safe_functions,
        """SELECT p_partkey,
               TRY_CAST(p_type AS INT) AS type_as_int,
               TRY_CAST(regexp_extract(p_name, '([0-9]+)', 1) AS INT)
                 AS name_digits,
               p_retailprice / nullif(CAST(p_size - p_size AS DOUBLE), 0.0)
                 AS div_zero,
               p_retailprice / nullif(CAST(p_size AS DOUBLE), 0.0)
                 AS price_per_size
           FROM part""",
        doc="error-safe functions (try_cast / try_divide): dirty cells "
        "yield NULL, never job failure",
    ),
    QuerySpec(
        "rel_cohort_retention",
        q_cohort_retention,
        """WITH wk AS (
             SELECT user_id, date_trunc('week', ts) AS w FROM events
           ), cohort AS (
             SELECT user_id, min(w) AS cohort_week FROM wk GROUP BY user_id
           ), activity AS (
             SELECT DISTINCT user_id, w FROM wk
           )
           SELECT c.cohort_week,
                  CAST((epoch_ns(a.w) // 1000000000
                        - epoch_ns(c.cohort_week) // 1000000000)
                       // 604800 AS INT) AS week_offset,
                  count(*) AS n_users
           FROM activity a JOIN cohort c USING (user_id)
           GROUP BY c.cohort_week, week_offset""",
        doc="cohort retention triangle (first-week cohorts × week offset)",
    ),
    QuerySpec(
        "rel_funnel_analysis",
        q_funnel_analysis,
        """WITH v AS (
             SELECT user_id, min(ts) AS t_view FROM events
             WHERE event_type = 'view' GROUP BY user_id
           ), c AS (
             SELECT e.user_id, min(e.ts) AS t_click, min(v.t_view) AS t_view
             FROM events e JOIN v USING (user_id)
             WHERE e.event_type = 'click' AND e.ts > v.t_view
             GROUP BY e.user_id
           ), p AS (
             SELECT e.user_id, min(c.t_view) AS t_view,
                    min(c.t_click) AS t_click, min(e.ts) AS t_purchase
             FROM events e JOIN c USING (user_id)
             WHERE e.event_type = 'purchase' AND e.ts > c.t_click
             GROUP BY e.user_id
           )
           SELECT user_id, t_view, t_click, t_purchase,
                  epoch_ns(t_purchase) // 1000000000
                    - epoch_ns(t_view) // 1000000000 AS funnel_seconds
           FROM p""",
        doc="ordered funnel analysis (view→click→purchase sequence match)",
    ),
    QuerySpec(
        "rel_tpch_q3_shipping_priority",
        q_tpch_q3_shipping_priority,
        f"""SELECT l_orderkey, o_orderdate, o_orderpriority,
               CAST(sum({_REV}) AS DOUBLE) AS revenue
           FROM lineitem
           JOIN orders   ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           WHERE c_mktsegment = 'BUILDING'
             AND o_orderdate < TIMESTAMP '1998-06-01'
             AND l_shipdate > TIMESTAMP '1998-06-01'
           GROUP BY l_orderkey, o_orderdate, o_orderpriority
           ORDER BY revenue DESC, l_orderkey LIMIT 10""",
        doc="TPC-H Q3 shape: selective 3-way join + top-10 by revenue",
    ),
    QuerySpec(
        "rel_tpch_q5_local_supplier",
        q_tpch_q5_local_supplier,
        f"""SELECT n_name, CAST(sum({_REV}) AS DOUBLE) AS revenue
           FROM lineitem
           JOIN orders   ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN supplier ON l_suppkey = s_suppkey
                        AND c_nationkey = s_nationkey
           JOIN nation   ON s_nationkey = n_nationkey
           JOIN region   ON n_regionkey = r_regionkey
           WHERE r_name = 'ASIA'
             AND o_orderdate >= TIMESTAMP '1996-01-01'
             AND o_orderdate <  TIMESTAMP '1997-01-01'
           GROUP BY n_name""",
        doc="TPC-H Q5 shape: six-table star join, co-located "
        "customer/supplier nation, revenue per nation",
    ),
    QuerySpec(
        "rel_skew_report",
        q_skew_report,
        """WITH cnt AS (
             SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey
           ), tot AS (
             SELECT sum(n) AS total, count(*) AS n_keys FROM cnt
           )
           SELECT o_custkey, CAST(n AS BIGINT) AS n,
                  CAST(n AS DOUBLE) / CAST(total AS DOUBLE) AS share,
                  CAST(n * n_keys AS DOUBLE) / CAST(total AS DOUBLE)
                    AS skew_factor
           FROM cnt, tot
           ORDER BY n DESC, o_custkey LIMIT 20""",
        doc="join-key skew diagnostic: per-key counts, share, skew "
        "factor (count / mean), top-20 heaviest keys",
    ),
    QuerySpec(
        "rel_tpch_q10_returned_items",
        q_tpch_q10_returned_items,
        f"""SELECT c_custkey, c_name, n_name, c_acctbal,
               CAST(sum({_REV}) AS DOUBLE) AS revenue
           FROM lineitem
           JOIN orders   ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation   ON c_nationkey = n_nationkey
           WHERE l_returnflag = 'R'
             AND o_orderdate >= TIMESTAMP '1996-01-01'
             AND o_orderdate <  TIMESTAMP '1996-04-01'
           GROUP BY c_custkey, c_name, n_name, c_acctbal
           ORDER BY revenue DESC, c_custkey LIMIT 20""",
        doc="TPC-H Q10 shape: returned-item revenue per customer, "
        "quarter window, top-20",
    ),
    QuerySpec(
        "rel_tpch_q12_late_shipments",
        q_tpch_q12_late_shipments,
        """SELECT l_linestatus,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
           GROUP BY l_linestatus""",
        doc="TPC-H Q12 shape: late-shipment priority counts "
        "(join + CASE-conditional aggregation)",
    ),
    QuerySpec(
        "rel_interval_overlap_join",
        q_interval_overlap,
        _INTERVAL_OVERLAP_SQL,
        doc="interval x interval overlap join (bucketized candidates, "
        "overlap-start exactly-once rule, integer micros)",
    ),
    QuerySpec(
        "rel_spatial_grid_nearest",
        q_spatial_grid_nearest,
        _SPATIAL_NEAREST_SQL,
        doc="grid-bucketed spatial nearest neighbor (space-binned join, "
        "squared-degree distance, 3x3-neighborhood contract)",
    ),
    QuerySpec(
        "rel_tpch_q18_large_orders",
        q_tpch_q18_large_orders,
        """WITH big AS (
             SELECT l_orderkey,
                    sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
             FROM lineitem GROUP BY l_orderkey
             HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 150
           )
           SELECT c_name, c_custkey, o_orderkey, o_orderdate,
                  CAST(o_totalprice AS DOUBLE) AS o_totalprice,
                  CAST(sum_qty AS DOUBLE) AS sum_qty
           FROM big
           JOIN orders   ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""",
        doc="TPC-H Q18 shape: aggregate -> HAVING -> rejoin fact, top-20",
    ),
    QuerySpec(
        "rel_tpch_q13_custdist",
        q_tpch_q13_custdist,
        """WITH per_cust AS (
             SELECT c_custkey, count(o_orderkey) AS c_count
             FROM customer LEFT JOIN orders
               ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
             GROUP BY c_custkey
           )
           SELECT c_count, count(*) AS custdist
           FROM per_cust GROUP BY c_count""",
        doc="TPC-H Q13 shape: outer-join two-level aggregation (order-count histogram)",
    ),
    QuerySpec(
        "rel_schema_evolution",
        q_schema_evolution,
        """SELECT s_suppkey, s_name,
               CASE WHEN s_suppkey >= 50 THEN s_acctbal END AS s_acctbal,
               s_suppkey < 50 AS from_old_schema
           FROM supplier""",
        doc="schema evolution via mergeSchema (old files surface new cols as NULL)",
    ),
    QuerySpec(
        "rel_csv_corrupt_records",
        q_csv_corrupt_records,
        """SELECT count(*) AS n_good,
               CAST(2 AS BIGINT) AS n_corrupt,
               CAST(sum(n_nationkey) AS BIGINT) AS key_sum
           FROM nation""",
        doc="PERMISSIVE malformed-record quarantine (_corrupt_record)",
    ),
    QuerySpec(
        "rel_source_python_ds",
        q_source_python_ds,
        """SELECT CAST(i % 8 AS INT) AS bucket,
               count(*) AS n_events,
               count(DISTINCT i % 97) AS n_users,
               sum(CAST((i * 31) % 1000 AS DOUBLE) / 8.0) AS sum_value,
               CAST(max(i) AS BIGINT) AS max_id
           FROM range(10000) t(i) GROUP BY 1""",
        doc="custom Python Data Source (Spark 4.x API), closed-form rows",
    ),
    QuerySpec(
        "rel_source_binaryfile",
        q_source_binaryfile,
        """SELECT doc_id,
               octet_length(encode(text)) AS n_bytes,
               sha256(text) AS sha
           FROM documents WHERE doc_id < 100""",
        doc="binaryFile source (multimodal ingestion), sha256 content-exact",
    ),
    QuerySpec(
        "rel_recursive_chain",
        q_recursive_chain,
        """WITH RECURSIVE chain AS (
             SELECT c_custkey AS start_key, c_custkey AS cur, 0 AS depth
             FROM customer WHERE c_custkey <= 256
             UNION ALL
             SELECT start_key, cur // 2 AS cur, depth + 1 AS depth
             FROM chain WHERE cur > 0
           )
           SELECT start_key, max(depth) AS depth_to_root,
                  count(*) AS chain_len,
                  CAST(sum(cur) AS BIGINT) AS key_path_sum
           FROM chain GROUP BY start_key""",
        doc="recursive CTE traversal (WITH RECURSIVE, Spark 4.x)",
    ),
    QuerySpec(
        "rel_variant_json",
        q_variant_json,
        """SELECT event_type, count(*) AS n,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT)
                 AS sum_k,
               'OBJECT<k: BIGINT>' AS variant_schema
           FROM events GROUP BY event_type""",
        doc="VARIANT semi-structured type (parse once, typed variant_get reads)",
    ),
    QuerySpec(
        "rel_join_hinted_shuffle_hash",
        q_join_hinted_shuffle_hash,
        """SELECT c_mktsegment, count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY c_mktsegment""",
        doc="join-strategy hint (SHUFFLE_HASH): plan changes, results don't",
    ),
    QuerySpec(
        "rel_window_first_last",
        q_window_first_last,
        """SELECT o_custkey, o_orderkey,
               first_value(o_totalprice) OVER w AS first_price,
               last_value(o_totalprice) OVER w AS last_price,
               nth_value(o_totalprice, 2) OVER w AS second_price
           FROM orders
           WINDOW w AS (PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND UNBOUNDED FOLLOWING)""",
        doc="navigation window functions (first/last/nth_value, full frame)",
    ),
    QuerySpec(
        "rel_fuzzy_match",
        q_fuzzy_match,
        """WITH s AS (SELECT s_suppkey, s_name,
                         substr(s_name, 1, length(s_name) - 2) AS blk
                      FROM supplier)
           SELECT a.s_suppkey AS suppkey_a, b.s_suppkey AS suppkey_b,
                  a.s_name AS name_a, b.s_name AS name_b,
                  CAST(levenshtein(a.s_name, b.s_name) AS INT) AS dist
           FROM s a JOIN s b ON a.blk = b.blk AND a.s_suppkey < b.s_suppkey
           WHERE levenshtein(a.s_name, b.s_name) <= 1""",
        doc="blocked fuzzy self-match (record linkage), exact edit distance",
    ),
    QuerySpec(
        "rel_decayed_activity",
        q_decayed_activity,
        """SELECT event_id, user_id, ts, value,
               coalesce(value, CAST(0.0 AS DOUBLE))
               + coalesce(lag(value, 1) OVER w, CAST(0.0 AS DOUBLE)) * CAST(0.5 AS DOUBLE)
               + coalesce(lag(value, 2) OVER w, CAST(0.0 AS DOUBLE)) * CAST(0.25 AS DOUBLE)
               + coalesce(lag(value, 3) OVER w, CAST(0.0 AS DOUBLE)) * CAST(0.125 AS DOUBLE)
               + coalesce(lag(value, 4) OVER w, CAST(0.0 AS DOUBLE)) * CAST(0.0625 AS DOUBLE)
               + coalesce(lag(value, 5) OVER w, CAST(0.0 AS DOUBLE)) * CAST(0.03125 AS DOUBLE)
               + coalesce(lag(value, 6) OVER w, CAST(0.0 AS DOUBLE)) * CAST(0.015625 AS DOUBLE)
               + coalesce(lag(value, 7) OVER w, CAST(0.0 AS DOUBLE)) * CAST(0.0078125 AS DOUBLE)
                 AS decayed_activity
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",
        doc="exponential time-decay feature (exact binary weights, "
        "fixed-order lag chain — portable IEEE arithmetic)",
    ),
    QuerySpec(
        "rel_equidepth_bins",
        q_equidepth_bins,
        """WITH binned AS (
             SELECT event_type, value,
                    ntile(8) OVER (PARTITION BY event_type
                                   ORDER BY value, event_id) AS bin
             FROM events)
           SELECT event_type, CAST(bin AS INT) AS bin,
                  count(*) AS n_events,
                  min(value) AS lo, max(value) AS hi
           FROM binned GROUP BY event_type, bin""",
        doc="equi-depth (quantile) binning via ntile, deterministic tie-break",
    ),
    QuerySpec(
        "rel_histogram_prices",
        q_histogram_prices,
        """SELECT CAST(least(greatest(
                    floor((l_extendedprice - 0.0) / 10000.0), 0), 11) AS BIGINT)
                  AS bucket,
               count(*) AS n_items,
               min(l_extendedprice) AS min_price,
               max(l_extendedprice) AS max_price
           FROM lineitem GROUP BY 1""",
        doc="fixed-width distributed histogram (map-side bucketing)",
    ),
    QuerySpec(
        "rel_join_revenue_by_nation",
        q_join_revenue_by_nation,
        f"""SELECT n_name,
               CAST(sum({_REV}) AS DOUBLE) AS revenue,
               count(*) AS n_items
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation   ON c_nationkey = n_nationkey
            GROUP BY n_name""",
        doc="inner joins + broadcast dim + decimal-exact revenue",
    ),
    QuerySpec(
        "rel_join_left_orders",
        q_join_left_orders,
        """SELECT c_custkey,
               count(o_orderkey) AS n_orders,
               CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE)
                 AS total_spend
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey""",
        doc="left outer join",
    ),
    QuerySpec(
        "rel_join_semi",
        q_join_semi,
        """SELECT c_custkey, c_name FROM customer
            WHERE c_custkey IN (SELECT o_custkey FROM orders
                                WHERE o_orderpriority = '1-URGENT')""",
        doc="left semi join",
    ),
    QuerySpec(
        "rel_join_anti",
        q_join_anti,
        """SELECT c_custkey, c_mktsegment FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)""",
        doc="left anti join",
    ),
    QuerySpec(
        "rel_join_full_outer",
        q_join_full_outer,
        """WITH c AS (SELECT c_nationkey, count(*) AS n_cust FROM customer GROUP BY 1),
                s AS (SELECT s_nationkey, count(*) AS n_supp FROM supplier GROUP BY 1)
            SELECT coalesce(c_nationkey, s_nationkey) AS nationkey,
                   coalesce(n_cust, 0) AS n_cust,
                   coalesce(n_supp, 0) AS n_supp
            FROM c FULL OUTER JOIN s ON c_nationkey = s_nationkey""",
        doc="full outer join",
    ),
    QuerySpec(
        "rel_join_right",
        q_join_right,
        """SELECT l_orderkey, l_linenumber, o_orderstatus AS status
            FROM (SELECT * FROM orders WHERE o_orderstatus = 'F') o
            RIGHT JOIN lineitem ON o_orderkey = l_orderkey""",
        doc="right outer join",
    ),
    QuerySpec(
        "rel_join_broadcast_dims",
        q_join_broadcast_dims,
        """SELECT r_name, count(*) AS n_suppliers
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name""",
        doc="broadcast dim chain",
    ),
    QuerySpec(
        "rel_join_nonequi_self",
        q_join_nonequi_self,
        """SELECT a.l_orderkey AS k, count(*) AS n_pairs
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey AND a.l_shipdate < b.l_shipdate
            GROUP BY 1""",
        doc="equi + non-equi self join",
    ),
    QuerySpec(
        "rel_agg_pricing_summary",
        q_agg_pricing_summary,
        f"""SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(sum({_REV}) AS DOUBLE) AS sum_disc_price,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
               count(*) AS count_order
            FROM lineitem WHERE l_shipdate <= '1998-09-02'
            GROUP BY l_returnflag, l_linestatus""",
        doc="TPC-H Q1-shaped grouped aggregation",
    ),
    QuerySpec(
        "rel_agg_count_distinct",
        q_agg_count_distinct,
        """SELECT l_returnflag,
               count(DISTINCT l_suppkey) AS n_supp,
               count(DISTINCT l_partkey) AS n_part,
               count(*) AS n_rows
            FROM lineitem GROUP BY l_returnflag""",
        doc="exact count-distinct",
    ),
    QuerySpec(
        "rel_agg_rollup",
        q_agg_rollup,
        """SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               count(*) AS n
            FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
        doc="rollup subtotals",
    ),
    QuerySpec(
        "rel_agg_cube",
        q_agg_cube,
        """SELECT o_orderstatus, o_orderpriority,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
               count(*) AS n
            FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""",
        doc="cube",
    ),
    QuerySpec(
        "rel_agg_grouping_sets",
        q_agg_grouping_sets,
        """SELECT c_mktsegment, c_nationkey,
               CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal,
               count(*) AS n
            FROM customer
            GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())""",
        doc="grouping sets",
    ),
    QuerySpec(
        "rel_window_topk_per_group",
        q_window_topk_per_group,
        """SELECT o_custkey, rk, o_orderkey, o_totalprice FROM (
              SELECT o_custkey, o_orderkey, o_totalprice,
                     row_number() OVER (PARTITION BY o_custkey
                                        ORDER BY o_totalprice DESC, o_orderkey) AS rk
              FROM orders) WHERE rk <= 3""",
        doc="per-group top-k via row_number",
    ),
    QuerySpec(
        "rel_window_rank_dense",
        q_window_rank_dense,
        """SELECT p_partkey, p_brand, p_size,
               row_number() OVER (PARTITION BY p_brand ORDER BY p_size, p_partkey) AS rn,
               rank()       OVER (PARTITION BY p_brand ORDER BY p_size) AS rnk,
               dense_rank() OVER (PARTITION BY p_brand ORDER BY p_size) AS drnk
            FROM part""",
        doc="ranking window functions",
    ),
    QuerySpec(
        "rel_window_lag_lead",
        q_window_lag_lead,
        """SELECT o_custkey, o_orderkey,
               lag(o_orderdate)  OVER w AS prev_date,
               lead(o_orderdate) OVER w AS next_date
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""",
        doc="lag/lead analytics",
    ),
    QuerySpec(
        "rel_window_running_sum",
        q_window_running_sum,
        """SELECT o_custkey, o_orderkey,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                 AS running_spend
            FROM orders""",
        doc="framed running aggregate",
    ),
    QuerySpec(
        "rel_window_distribution",
        q_window_distribution,
        """SELECT o_orderkey, o_orderpriority,
               ntile(4)       OVER w AS quartile,
               percent_rank() OVER w AS pct_rank,
               cume_dist()    OVER w AS cume,
               first(o_orderkey) OVER wf AS cheapest_key,
               last(o_orderkey)  OVER wf AS priciest_key
            FROM orders
            WINDOW w AS (PARTITION BY o_orderpriority
                         ORDER BY o_totalprice, o_orderkey),
                   wf AS (PARTITION BY o_orderpriority
                          ORDER BY o_totalprice, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""",
        doc="ntile/percent_rank/cume_dist/first/last windows",
    ),
    QuerySpec(
        "rel_agg_approx_distinct",
        q_agg_approx_distinct,
        None,  # HLL sketch values are engine-specific; see property test
        doc="approx_count_distinct (HLL++), rows-only + error-bound test",
    ),
    QuerySpec(
        "rel_hll_sketch_union",
        q_hll_sketch_union,
        None,  # DataSketches binaries are engine-specific; property test
        doc="mergeable HLL sketches: per-group + sketch-union rollup, rows-only",
    ),
    QuerySpec(
        "rel_agg_approx_percentile",
        q_agg_approx_percentile,
        None,  # GK-sketch output is engine-specific; rank-error property test
        doc="approx_percentile (GK sketch) vs exact, rows-only + error bound",
    ),
    QuerySpec(
        "rel_tdigest_quantiles",
        q_tdigest_quantiles,
        None,  # centroid digests are engine-specific; Hypothesis suite
        doc="mergeable t-digest: build per-group, flat-merge rollup, "
        "p50/p90/p99 report — rows-only + invariant property suite",
    ),
    QuerySpec(
        "rel_plan_cost_report",
        q_plan_cost_report,
        None,  # Catalyst plan shapes are engine-specific by nature
        doc="EXPLAIN-driven plan-shape regression report over six "
        "representative plans (shuffles/broadcasts/scans/python "
        "nodes/estimates) — rows-only + plan-shape unit test",
    ),
    QuerySpec(
        "rel_sessionize_batch",
        q_sessionize_batch,
        """WITH marked AS (
             SELECT user_id, ts,
                    CASE WHEN lag(ts) OVER w IS NULL
                           OR ts - lag(ts) OVER w >= INTERVAL 5 MINUTE
                         THEN 1 ELSE 0 END AS new_sess
             FROM events
             WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
           numbered AS (
             SELECT user_id, ts,
                    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts) - 1
                      AS session_id
             FROM marked)
           SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
                  count(*) AS n_events,
                  CAST(min(ts) AS TIMESTAMP) AS sess_start,
                  CAST(max(ts) AS TIMESTAMP) AS sess_end
           FROM numbered GROUP BY user_id, session_id""",
        doc="batch gaps-and-islands sessionization (single exchange, stacked windows)",
    ),
    QuerySpec(
        "rel_resample_ffill",
        q_resample_ffill,
        """WITH obs AS (
             SELECT user_id, ts, value, event_id FROM events
             WHERE user_id < 8),
           bounds AS (
             SELECT user_id, date_trunc('hour', min(ts)) AS lo,
                    date_trunc('hour', max(ts)) AS hi
             FROM obs GROUP BY user_id),
           grid AS (
             SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR))
                      AS ts
             FROM bounds),
           unioned AS (
             SELECT user_id, ts, value AS v, 0 AS flag, event_id FROM obs
             UNION ALL
             SELECT user_id, ts, NULL, 1, NULL FROM grid),
           filled AS (
             SELECT user_id, ts, flag,
                    last_value(v IGNORE NULLS) OVER (
                      PARTITION BY user_id ORDER BY ts, flag, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS value_ffill
             FROM unioned)
           SELECT user_id, CAST(ts AS TIMESTAMP) AS grid_ts, value_ffill
           FROM filled WHERE flag = 1""",
        doc="hourly resample + forward fill (union+window, no per-pair explosion)",
    ),
    QuerySpec(
        "rel_incremental_agg",
        q_incremental_agg,
        """SELECT o_custkey,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS sum_total,
               count(*) AS n_orders
           FROM orders GROUP BY o_custkey""",
        doc="incremental aggregate maintenance: delta fold == full recompute",
    ),
    QuerySpec(
        "rel_topk_global",
        q_topk_global,
        """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
        doc="global top-k",
    ),
    QuerySpec(
        "rel_set_ops",
        q_set_ops,
        """WITH building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
                urgent AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders
                           WHERE o_orderpriority = '1-URGENT')
            SELECT c_custkey, 'both' AS tag FROM building INTERSECT ALL
              SELECT c_custkey, 'both' FROM urgent WHERE c_custkey IN (SELECT c_custkey FROM building)
            UNION ALL
            SELECT c_custkey, 'building_only' AS tag
            FROM (SELECT c_custkey FROM building EXCEPT ALL SELECT c_custkey FROM urgent)""",
        doc="intersect / except / union",
    ),
    QuerySpec(
        "rel_dropduplicates",
        q_dropduplicates,
        "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
        doc="distinct projection",
    ),
    QuerySpec(
        "rel_pivot_linestatus",
        q_pivot_linestatus,
        """SELECT l_returnflag,
               CAST(sum(CASE WHEN l_linestatus = 'F'
                             THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "F",
               CAST(sum(CASE WHEN l_linestatus = 'O'
                             THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "O"
            FROM lineitem GROUP BY l_returnflag""",
        doc="pivot (explicit values, no distinct-collection job)",
    ),
    QuerySpec(
        "rel_unpivot_part",
        q_unpivot_part,
        """SELECT p_partkey, 'size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
            UNION ALL
            SELECT p_partkey, 'retailprice' AS attr, CAST(p_retailprice AS DOUBLE) AS val
            FROM part""",
        doc="unpivot/melt wide attributes to long rows",
    ),
    QuerySpec(
        "rel_agg_stats_moments",
        q_agg_stats_moments,
        """WITH sums AS (
              SELECT l_returnflag, count(*) AS n,
                 CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sq,
                 CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                          * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sq2,
                 CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS sd,
                 CAST(sum(CAST(l_discount AS DECIMAL(4,2))
                          * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS sd2,
                 CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                          * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS sqd
              FROM lineitem GROUP BY l_returnflag)
            SELECT l_returnflag, n,
               sq / n AS mean_qty,
               (sq2 - sq * sq / n) / (n - 1) AS var_qty,
               sqrt((sq2 - sq * sq / n) / (n - 1)) AS std_qty,
               ((sqd - sq * sd / n) / (n - 1))
                 / (sqrt((sq2 - sq * sq / n) / (n - 1))
                    * sqrt((sd2 - sd * sd / n) / (n - 1))) AS corr_qty_disc
            FROM sums""",
        doc="mean/variance/stddev/corr from decimal-exact power sums",
    ),
    QuerySpec(
        "rel_subquery_exists",
        q_subquery_exists,
        """SELECT o_orderkey, o_orderdate FROM orders o
            WHERE EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)""",
        doc="correlated EXISTS subquery",
    ),
    QuerySpec(
        "rel_subquery_scalar",
        q_subquery_scalar,
        """SELECT p_partkey, p_retailprice FROM part
            WHERE CAST(p_retailprice AS DECIMAL(18,2)) >
                  (SELECT max(CAST(p_retailprice AS DECIMAL(18,2))) - 50 FROM part)""",
        doc="uncorrelated scalar subquery",
    ),
    QuerySpec(
        "rel_median_disc",
        q_median_disc,
        """SELECT o_custkey, o_totalprice AS median_price FROM (
              SELECT o_custkey, o_totalprice,
                     row_number() OVER (PARTITION BY o_custkey
                                        ORDER BY o_totalprice, o_orderkey) AS rn,
                     count(*) OVER (PARTITION BY o_custkey) AS n
              FROM orders) WHERE rn = (n + 1) // 2""",
        doc="discrete median via window composition",
    ),
    QuerySpec(
        "rel_join_salted_skew",
        q_join_salted_skew,
        f"""SELECT o_orderpriority,
               CAST(sum({_REV}) AS DOUBLE) AS revenue,
               count(*) AS n_items
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderpriority""",
        doc="salted skew join (oracle = unsalted equivalent)",
    ),
    QuerySpec(
        "rel_zorder_key",
        q_zorder_key,
        f"""SELECT p_partkey, p_size,
               {_zorder_key_sql(['p_size', '(p_partkey % 1024)'], bits=10)} AS zkey
            FROM part""",
        doc="Morton/Z-order clustering key (multi-dim data skipping)",
    ),
    QuerySpec(
        "rel_bucketed_join",
        q_bucketed_join,
        """SELECT o_orderpriority, count(*) AS n_items,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderpriority""",
        doc="bucketed co-located join (write-once shuffle, join shuffle-free)",
    ),
    QuerySpec(
        "rel_collect_sorted_lists",
        q_collect_sorted_lists,
        """SELECT c_nationkey,
               array_to_string(list(c_custkey ORDER BY c_custkey), ',') AS cust_keys,
               count(*) AS n
            FROM customer GROUP BY c_nationkey""",
        doc="sorted array aggregation (collect_list + sort_array)",
    ),
    QuerySpec(
        "rel_ohlc_downsample",
        q_ohlc_downsample,
        f"""SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               event_type,
               {OHLC_AGGS_SQL}
            FROM events GROUP BY 1, 2""",
        doc="OHLC time-series downsampling: arg-extrema (min_by/max_by) "
        "open/close on a unique padded (epoch, id) key, one shuffle",
    ),
    QuerySpec(
        "rel_time_rollup",
        q_time_rollup,
        """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP)  AS day,
               CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
               event_type,
               count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
            FROM events
            GROUP BY GROUPING SETS (
              (date_trunc('day', ts), date_trunc('hour', ts), event_type),
              (date_trunc('day', ts), event_type),
              (date_trunc('day', ts))
            )""",
        doc="hypertable rollup: multi-granularity time aggregation in one pass",
    ),
    QuerySpec(
        "rel_range_join_buckets",
        q_range_join_buckets,
        """WITH buckets AS (
              SELECT CAST(i AS INT) AS bucket_id,
                     TIMESTAMP '2024-01-01' + i * INTERVAL 5 DAY AS b_start,
                     TIMESTAMP '2024-01-01' + (i + 1) * INTERVAL 5 DAY AS b_end
              FROM unnest(range(0, 6)) AS t(i)
           )
           SELECT bucket_id, event_type, count(*) AS n
           FROM events JOIN buckets
             ON ts >= b_start AND ts < b_end
           GROUP BY bucket_id, event_type""",
        doc="non-equi range join onto broadcast interval buckets",
    ),
    QuerySpec(
        "rel_window_range_frame",
        q_window_range_frame,
        """SELECT p_partkey, p_brand, p_size,
               count(*) OVER w AS n_near,
               CAST(sum(CAST(p_size AS BIGINT)) OVER w AS BIGINT) AS near_size_sum
            FROM part
            WINDOW w AS (PARTITION BY p_brand ORDER BY CAST(p_size AS BIGINT)
                         RANGE BETWEEN 5 PRECEDING AND 5 FOLLOWING)""",
        doc="value-based RANGE window frame",
    ),
    QuerySpec(
        "rel_hof_arrays",
        q_hof_arrays,
        """WITH base AS (
              SELECT p_partkey, p_size, string_split(p_type, ' ') AS words FROM part
           ), w2 AS (
              SELECT p_partkey, p_size, words,
                     list_transform(words, w -> CAST(len(w) AS BIGINT)) AS word_lens
              FROM base
           )
           SELECT p_partkey,
              array_to_string(word_lens, ',') AS word_lens,
              coalesce(array_to_string(list_filter(words, w -> len(w) > 5), ','), '')
                AS long_words,
              CAST(list_aggregate(word_lens, 'sum') AS BIGINT) AS total_len,
              array_to_string(
                list_transform(range(1, len(words) + 1),
                               i -> words[i] || ':' || CAST(word_lens[i] AS VARCHAR)),
                ',') AS tagged,
              array_to_string(range(1, (p_size % 5 + 1) + 1), ',') AS seq
           FROM w2""",
        doc="higher-order array functions (transform/filter/aggregate/zip_with/sequence)",
    ),
    QuerySpec(
        "rel_scalar_strings_extended",
        q_scalar_strings_extended,
        """SELECT p_partkey,
               split_part(p_name, ' ', 2) AS second_word,
               CAST(strpos(p_name, 'a') AS INT) AS first_a_pos,
               translate(p_name, 'aeiou', 'AEIOU') AS vowels_up,
               repeat(p_brand, 2) AS brand_twice,
               lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
               rpad(p_brand, 12, '.') AS brand_rpad,
               reverse(p_name) AS name_rev,
               CAST(levenshtein(p_brand, 'Brand#33') AS INT) AS brand_dist,
               left(p_name, 3) AS name_l3,
               right(p_name, 3) AS name_r3
           FROM part""",
        doc="extended string manipulation set (split_part/strpos/translate/"
        "repeat/pad/reverse/levenshtein/left/right)",
    ),
    QuerySpec(
        "rel_scalar_string_date_math",
        q_scalar_string_date_math,
        """SELECT p_partkey,
               upper(p_brand) AS brand_upper,
               substring(p_name, 1, 5) AS name_pfx,
               length(p_name) AS name_len,
               concat_ws('::', p_brand, p_type) AS brand_type,
               p_size % 7 AS size_mod,
               abs(p_size - 25) AS size_dist,
               sqrt(CAST(p_size AS DOUBLE)) AS size_sqrt,
               CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
               CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
               regexp_extract(p_name, '^(\\w+)', 1) AS first_name_word,
               coalesce(nullif(p_brand, 'Brand#13'), 'OTHER') AS brand_or_other,
               CASE WHEN CAST(p_retailprice AS DECIMAL(18,2)) > 1500
                    THEN 'premium' ELSE 'standard' END AS tier
            FROM part""",
        doc="string/math scalar functions",
    ),
    QuerySpec(
        "rel_scalar_dates",
        q_scalar_dates,
        """SELECT o_orderkey,
               CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
               CAST(year(o_orderdate) AS INT) AS yr,
               CAST(month(o_orderdate) AS INT) AS mo,
               CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS INT)
                 AS days_to_eoy
            FROM orders""",
        doc="date scalar functions",
    ),
    QuerySpec(
        "rel_json_events",
        q_json_events,
        """SELECT event_type,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT)
                 AS sum_k,
               count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
            FROM events GROUP BY event_type""",
        doc="JSON extraction over events.props",
    ),
    QuerySpec(
        "rel_array_ops",
        q_array_ops,
        """SELECT p_partkey,
               len(string_split(p_type, ' ')) AS n_words,
               list_contains(string_split(p_type, ' '), 'BRUSHED') AS has_brushed,
               array_to_string(list_sort(string_split(p_type, ' ')), '-') AS sorted_words,
               string_split(p_type, ' ')[1] AS first_word
            FROM part""",
        doc="array functions (scalar outputs)",
    ),
    QuerySpec(
        "rel_merge_upsert",
        q_merge_upsert,
        """WITH source AS (
             SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
                    o_totalprice + 10.0 AS o_totalprice,
                    o_orderdate, o_orderpriority
             FROM orders WHERE o_orderkey % 10 = 0
             UNION ALL
             SELECT o_orderkey + 10000000, o_custkey, 'N',
                    100.0 + CAST(o_orderkey % 50 AS DOUBLE),
                    o_orderdate, o_orderpriority
             FROM orders WHERE o_orderkey % 97 = 0
           ), merged AS (
             SELECT * FROM source
             UNION ALL
             SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                    o_orderdate, o_orderpriority
             FROM orders
             WHERE o_orderkey NOT IN (SELECT o_orderkey FROM source)
           )
           SELECT o_orderstatus, count(*) AS n_orders,
                  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                    AS sum_total
           FROM merged GROUP BY o_orderstatus""",
        doc="batch MERGE/upsert (anti-join + union), per-status audit",
    ),
    QuerySpec(
        "rel_tpch_q6_forecast_revenue",
        q_tpch_q6_forecast_revenue,
        """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                           * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)
                  AS revenue
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             AND l_shipdate <  TIMESTAMP '1997-01-01'
             AND l_discount >= CAST(0.02 AS DOUBLE)
             AND l_discount <= CAST(0.06 AS DOUBLE)
             AND l_quantity < 24.0""",
        doc="TPC-H Q6 shape: pure scan-aggregate, every predicate "
        "pushed to the parquet scan, no join",
    ),
    QuerySpec(
        "rel_tpch_q14_promo_effect",
        q_tpch_q14_promo_effect,
        f"""WITH agg AS (
             SELECT sum(CASE WHEN p_type = 'PROMO' THEN {_REV} END)
                      AS _promo,
                    sum({_REV}) AS _total
             FROM lineitem JOIN part ON l_partkey = p_partkey
             WHERE l_shipdate >= TIMESTAMP '1996-01-01'
               AND l_shipdate <  TIMESTAMP '1996-02-01')
           SELECT 100.0 * (coalesce(CAST(_promo AS DOUBLE), 0.0)
                           / CAST(_total AS DOUBLE))
                  AS promo_revenue_pct
           FROM agg""",
        doc="TPC-H Q14 shape: one-month fact slice x part, conditional "
        "decimal sum ratio",
    ),
    QuerySpec(
        "rel_tpch_q19_disjunctive",
        q_tpch_q19_disjunctive_revenue,
        f"""SELECT CAST(sum({_REV}) AS DOUBLE) AS revenue
           FROM lineitem JOIN part ON l_partkey = p_partkey
           WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15
                  AND l_quantity BETWEEN 1.0 AND 20.0)
              OR (p_brand = 'Brand#22' AND p_size BETWEEN 10 AND 30
                  AND l_quantity BETWEEN 5.0 AND 30.0)
              OR (p_brand = 'Brand#25' AND p_size BETWEEN 20 AND 50
                  AND l_quantity BETWEEN 10.0 AND 40.0)""",
        doc="TPC-H Q19 shape: disjunctive join predicate — Catalyst "
        "extracts the common equi-key, OR blocks post-filter",
    ),
    QuerySpec(
        "rel_tpch_q4_order_priority",
        q_tpch_q4_order_priority,
        """SELECT o_orderpriority, count(*) AS order_count
           FROM orders
           WHERE o_orderdate >= TIMESTAMP '1996-07-01'
             AND o_orderdate <  TIMESTAMP '1996-10-01'
             AND EXISTS (SELECT 1 FROM lineitem
                         WHERE l_orderkey = o_orderkey
                           AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
           GROUP BY o_orderpriority""",
        doc="TPC-H Q4 shape (late-ship adaptation): EXISTS as left-semi "
        "join with a cross-side condition, priority counts",
    ),
    QuerySpec(
        "rel_tpch_q7_volume_shipping",
        q_tpch_q7_volume_shipping,
        f"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INT) AS l_year,
               CAST(sum({_REV}) AS DOUBLE) AS revenue
           FROM lineitem
           JOIN orders   ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation n1 ON s_nationkey = n1.n_nationkey
           JOIN nation n2 ON c_nationkey = n2.n_nationkey
           WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             AND l_shipdate <  TIMESTAMP '1998-01-01'
             AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
               OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
           GROUP BY 1, 2, 3""",
        doc="TPC-H Q7 shape: bidirectional two-nation volume, "
        "broadcast nation pair filter, per ship-year",
    ),
    QuerySpec(
        "rel_tpch_q8_market_share",
        q_tpch_q8_market_share,
        f"""WITH agg AS (
             SELECT CAST(year(o_orderdate) AS INT) AS o_year,
                    sum(CASE WHEN ns.n_name = 'NATION_3'
                             THEN {_REV} END) AS _nat,
                    sum({_REV}) AS _total
             FROM lineitem
             JOIN part ON l_partkey = p_partkey
             JOIN orders ON l_orderkey = o_orderkey
             JOIN customer ON o_custkey = c_custkey
             JOIN nation nc ON c_nationkey = nc.n_nationkey
             JOIN region ON nc.n_regionkey = r_regionkey
             JOIN supplier ON l_suppkey = s_suppkey
             JOIN nation ns ON s_nationkey = ns.n_nationkey
             WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
               AND o_orderdate >= TIMESTAMP '1996-01-01'
               AND o_orderdate <  TIMESTAMP '1998-01-01'
             GROUP BY 1)
           SELECT o_year,
                  coalesce(CAST(_nat AS DOUBLE), 0.0)
                    / CAST(_total AS DOUBLE) AS mkt_share
           FROM agg""",
        doc="TPC-H Q8 shape: 8-table star, national share of regional "
        "revenue per order year",
    ),
    QuerySpec(
        "rel_tpch_q9_product_profit",
        q_tpch_q9_product_profit,
        f"""SELECT n_name AS nation,
               CAST(year(o_orderdate) AS INT) AS o_year,
               CAST(sum({_REV}
                        - CAST(p_retailprice AS DECIMAL(18,2))
                          * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                 AS sum_profit
           FROM lineitem
           JOIN part ON l_partkey = p_partkey
           JOIN orders ON l_orderkey = o_orderkey
           JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation ON s_nationkey = n_nationkey
           WHERE p_name LIKE '%widget%'
           GROUP BY 1, 2""",
        doc="TPC-H Q9 shape (p_retailprice stands in for the absent "
        "partsupp supply cost): profit per supplier nation per year",
    ),
    QuerySpec(
        "rel_tpch_q2_min_cost",
        q_tpch_q2_min_cost_supplier,
        """WITH ps AS (
             SELECT l_partkey, l_suppkey,
                    min(l_extendedprice) AS supply_cost
             FROM lineitem GROUP BY 1, 2
           ), elig AS (
             SELECT p_partkey, s.s_suppkey, s_name, s_acctbal, n_name,
                    supply_cost
             FROM ps
             JOIN part ON l_partkey = p_partkey
             JOIN supplier s ON l_suppkey = s.s_suppkey
             JOIN nation ON s_nationkey = n_nationkey
             JOIN region ON n_regionkey = r_regionkey
             WHERE p_type = 'SMALL' AND p_size >= 10
               AND r_name = 'EUROPE'
           )
           SELECT s_acctbal, s_name, n_name, p_partkey, supply_cost
           FROM elig e
           WHERE supply_cost = (SELECT min(supply_cost) FROM elig e2
                                WHERE e2.p_partkey = e.p_partkey)
           ORDER BY s_acctbal DESC, s_name, p_partkey
           LIMIT 100""",
        doc="TPC-H Q2 shape (lineitem min price stands in for the "
        "absent partsupp cost): correlated per-part minimum, "
        "region-restricted suppliers, top-100",
    ),
    QuerySpec(
        "rel_tpch_q17_small_quantity",
        q_tpch_q17_small_quantity,
        """WITH li2 AS (
             SELECT l_partkey, l_quantity, l_extendedprice
             FROM lineitem JOIN part ON l_partkey = p_partkey
             WHERE p_brand = 'Brand#13'
           ), st AS (
             SELECT l_partkey AS _pk, avg(l_quantity) AS _avg_qty
             FROM li2 GROUP BY 1
           )
           SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                       AS DOUBLE) / 7.0 AS avg_yearly
           FROM li2 JOIN st ON l_partkey = _pk
           WHERE l_quantity < 0.5 * _avg_qty""",
        doc="TPC-H Q17 shape (0.5-avg threshold adaptation): correlated "
        "per-part average rewritten brand-filter-first",
    ),
    QuerySpec(
        "rel_tpch_q16_supplier_cnt",
        q_tpch_q16_supplier_cnt,
        """WITH pairs AS (
             SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
           )
           SELECT p_brand, p_type, p_size,
                  count(DISTINCT l_suppkey) AS supplier_cnt
           FROM pairs JOIN part ON l_partkey = p_partkey
           WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'
             AND p_size IN (1, 14, 23, 45)
             AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                   WHERE s_acctbal < 0)
           GROUP BY 1, 2, 3""",
        doc="TPC-H Q16 shape (lineitem pairs stand in for partsupp; "
        "negative balance stands in for complaints): NOT IN "
        "exclusion + distinct supplier counts",
    ),
    QuerySpec(
        "rel_tpch_q21_waiting_suppliers",
        q_tpch_q21_waiting_suppliers,
        """WITH lo AS (
             SELECT l_orderkey, l_suppkey,
                    l_shipdate > o_orderdate + INTERVAL 90 DAY AS late
             FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             WHERE o_orderstatus = 'F'
           )
           SELECT s_name, count(*) AS numwait
           FROM (SELECT DISTINCT l_orderkey, l_suppkey
                 FROM lo WHERE late) l1
           JOIN supplier ON l1.l_suppkey = s_suppkey
           JOIN nation ON s_nationkey = n_nationkey
           WHERE n_name = 'NATION_19'
             AND EXISTS (SELECT 1 FROM lo l2
                         WHERE l2.l_orderkey = l1.l_orderkey
                           AND l2.l_suppkey <> l1.l_suppkey)
             AND NOT EXISTS (SELECT 1 FROM lo l3
                             WHERE l3.l_orderkey = l1.l_orderkey
                               AND l3.l_suppkey <> l1.l_suppkey
                               AND l3.late)
           GROUP BY s_name
           ORDER BY numwait DESC, s_name
           LIMIT 20""",
        doc="TPC-H Q21 shape (ship-lag adaptation): EXISTS + NOT-EXISTS "
        "self-joins rewritten as one per-order aggregation",
    ),
    QuerySpec(
        "rel_tpch_q22_global_sales",
        q_tpch_q22_global_sales,
        """WITH avg_bal AS (
             SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                      / CAST(count(*) AS DOUBLE) AS _avg_bal
             FROM customer WHERE c_acctbal > 0.0
           )
           SELECT CAST(c_nationkey % 5 AS INT) AS cntrycode,
                  count(*) AS numcust,
                  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                    AS totacctbal
           FROM customer, avg_bal
           WHERE c_nationkey % 5 IN (1, 2, 3)
             AND c_acctbal > _avg_bal
             AND c_custkey NOT IN (SELECT o_custkey FROM orders
                                   WHERE o_orderdate >=
                                         TIMESTAMP '1999-01-01')
           GROUP BY 1""",
        doc="TPC-H Q22 shape (nationkey mod stands in for the absent "
        "phone country code): scalar-subquery threshold + anti join "
        "to orders, per-code balance totals",
    ),
    QuerySpec(
        "rel_mad_outliers",
        q_mad_outliers,
        """WITH med AS (
             SELECT event_type AS _et1,
                    quantile_cont(value, 0.5) AS _med
             FROM events GROUP BY 1
           ), dev AS (
             SELECT event_id, event_type, value,
                    abs(value - _med) AS _dev
             FROM events JOIN med ON event_type = _et1
           ), mad AS (
             SELECT event_type AS _et2,
                    quantile_cont(_dev, 0.5) AS _mad
             FROM dev GROUP BY 1
           )
           SELECT event_id, event_type, value,
                  CASE WHEN _mad > 0.0 THEN _dev / _mad END AS mad_z,
                  CASE WHEN _mad > 0.0 THEN (_dev / _mad) > 3.5
                  END AS is_outlier
           FROM dev JOIN mad ON event_type = _et2""",
        doc="robust per-group outlier detection: |x - median| / MAD "
        "score + 3.5 cut (exact interpolated medians, bounded keys)",
    ),
    QuerySpec(
        "rel_tpch_q15_top_supplier",
        q_tpch_q15_top_supplier,
        f"""WITH rev AS (
             SELECT l_suppkey,
                    CAST(sum({_REV}) AS DOUBLE) AS total_revenue
             FROM lineitem
             WHERE l_shipdate >= TIMESTAMP '1996-01-01'
               AND l_shipdate <  TIMESTAMP '1996-04-01'
             GROUP BY l_suppkey
           )
           SELECT s_suppkey, s_name, total_revenue
           FROM rev JOIN supplier ON l_suppkey = s_suppkey
           WHERE total_revenue = (SELECT max(total_revenue) FROM rev)""",
        doc="TPC-H Q15 shape: quarterly supplier revenue, keep the "
        "maximum (scalar-max equality join; ties all surface)",
    ),
    QuerySpec(
        "rel_tpch_q11_important_parts",
        q_tpch_q11_important_parts,
        """WITH v AS (
             SELECT l_partkey,
                    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS _pv
             FROM lineitem
             JOIN supplier ON l_suppkey = s_suppkey
             JOIN nation ON s_nationkey = n_nationkey
             WHERE n_name = 'NATION_3'
             GROUP BY l_partkey
           ), t AS (SELECT sum(_pv) AS _tot FROM v)
           SELECT l_partkey, CAST(_pv AS DOUBLE) AS part_value
           FROM v, t
           WHERE CAST(_pv AS DOUBLE) > 0.002 * CAST(_tot AS DOUBLE)""",
        doc="TPC-H Q11 shape (lineitem value stands in for the absent "
        "partsupp stock): per-part value share over a global scalar "
        "threshold",
    ),
    QuerySpec(
        "rel_tpch_q20_small_part_suppliers",
        q_tpch_q20_small_part_suppliers,
        """WITH heavy AS (
             SELECT DISTINCT l_suppkey FROM (
               SELECT l_partkey, l_suppkey, sum(l_quantity) AS q
               FROM lineitem JOIN part ON l_partkey = p_partkey
               WHERE p_type = 'SMALL'
                 AND l_shipdate >= TIMESTAMP '1996-01-01'
                 AND l_shipdate <  TIMESTAMP '1997-01-01'
               GROUP BY 1, 2)
             WHERE q > 50.0
           )
           SELECT s_suppkey, s_name, n_name
           FROM supplier
           JOIN nation ON s_nationkey = n_nationkey
           WHERE s_suppkey IN (SELECT l_suppkey FROM heavy)""",
        doc="TPC-H Q20 shape (ship volume stands in for the absent "
        "partsupp availqty): chained IN subqueries as "
        "filter -> agg -> semi join",
    ),
    QuerySpec(
        "rel_agg_conditional_modern",
        q_agg_conditional_modern,
        """
        SELECT l_returnflag,
               CAST(count_if(l_quantity > 25) AS BIGINT) AS n_big_qty,
               bool_and(l_quantity > 0) AS all_positive,
               bool_or(l_discount > 0.09) AS any_deep_discount,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))
                    FILTER (WHERE l_linestatus = 'F') AS DOUBLE)
                 AS sum_qty_finished,
               count(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag""",
        doc="modern conditional aggregates (count_if / bool_and / "
        "bool_or / FILTER-clause sum) in one map-side-combined pass",
    ),
]
