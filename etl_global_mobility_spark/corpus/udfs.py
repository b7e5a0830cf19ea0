"""§2B UDF/UDAF surface: Arrow-vectorized pandas UDFs (SURVEY.md:215).

Three shapes, each oracle-checked:
  * scalar ``@pandas_udf`` — vectorized per-row compute (Arrow batches,
    no per-row Python overhead);
  * grouped-aggregate ``@pandas_udf`` — a UDAF over each group;
  * grouped-map ``applyInPandas`` — whole-group transform.

Determinism: only order-independent pandas ops (max/min, elementwise
arithmetic) — a pandas ``sum``/``mean`` would depend on row order
within the partition and break cross-engine comparison.

These are deliberately NOT in the engine's relational hot path (plan
audits assert no EvalPython there); they demonstrate the supported
escape hatch for logic the built-ins can't express.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from etl_global_mobility_spark.corpus.base import QuerySpec, load_table
from etl_global_mobility_spark.operators.parallelism import (
    ensure_grouped_compute_parallelism,
)


# UDFs are built lazily inside each query: the @pandas_udf decorator
# parses its DDL return type against the ACTIVE SparkContext, so
# module-level decoration would make `import corpus` require a running
# session (breaking the driver contract's sessionless queries() call).


def _discounted_price():
    @pandas_udf("double")
    def udf(price: pd.Series, discount: pd.Series) -> pd.Series:
        """Vectorized scalar: price*(1-discount) — two IEEE ops per
        row, bit-identical to any engine's double arithmetic."""
        return price * (1.0 - discount)

    return udf


def _range_udaf():
    @pandas_udf("double")
    def udf(v: pd.Series) -> float:
        """Grouped-agg pandas UDAF: max-min spread (order-independent)."""
        return float(v.max() - v.min())

    return udf


def _count_udaf():
    @pandas_udf("long")
    def udf(v: pd.Series) -> int:
        """Grouped-agg pandas count (Spark disallows mixing pandas and
        built-in aggregates in one agg)."""
        return int(len(v))

    return udf


def q_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        _discounted_price()(F.col("l_extendedprice"), F.col("l_discount")).alias(
            "disc_price"
        ),
    )


def q_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = ensure_grouped_compute_parallelism(
        load_table(spark, sf_dir, "orders"), ["o_custkey"]
    )
    return o.groupBy("o_custkey").agg(
        _range_udaf()(F.col("o_totalprice")).alias("price_spread"),
        _count_udaf()(F.col("o_orderkey")).alias("n_orders"),
    )


def q_pandas_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas: per-customer min-anchored price delta (whole-group
    transform; single-op subtraction per row → deterministic)."""
    # pandas cost scales with GROUP COUNT, not bytes: pre-partition by
    # the key so AQE's bytes-based coalescing can't serialize ~15k
    # per-group Python calls onto 2 tasks (14 s -> ~2 s at sf0.1)
    o = ensure_grouped_compute_parallelism(
        load_table(spark, sf_dir, "orders").select(
            "o_custkey", "o_orderkey", "o_totalprice"
        ),
        ["o_custkey"],
    )

    schema = T.StructType(
        [
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("delta_from_min", T.DoubleType()),
        ]
    )

    def anchor(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_custkey": pdf["o_custkey"],
                "o_orderkey": pdf["o_orderkey"],
                "delta_from_min": pdf["o_totalprice"] - pdf["o_totalprice"].min(),
            }
        )

    return o.groupBy("o_custkey").applyInPandas(anchor, schema)


def q_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow: zero-copy Arrow RecordBatch iterator — the leanest
    Python batch hook (no pandas conversion). Computes per-row name
    byte-lengths; integer ops, deterministic."""
    import pyarrow as pa

    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")

    def batches(it):
        for rb in it:
            yield pa.RecordBatch.from_arrays(
                [
                    rb.column(0),
                    pa.compute.binary_length(rb.column(1)).cast(pa.int64()),
                ],
                names=["p_partkey", "name_bytes"],
            )

    return p.mapInArrow(batches, "p_partkey long, name_bytes long")


def q_apply_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInArrow (Spark 4): grouped zero-copy Arrow-table transform
    — the no-pandas sibling of applyInPandas for columnar per-group
    logic. Integer-exact per-customer order stats (cents via the
    single-IEEE-op floor(x*100+0.5) recipe)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    o = ensure_grouped_compute_parallelism(
        load_table(spark, sf_dir, "orders").select(
            "o_custkey", "o_totalprice"
        ),
        ["o_custkey"],
    )

    def per_group(tbl: pa.Table) -> pa.Table:
        prices = pc.cast(tbl.column("o_totalprice"), pa.float64())
        # cents-grid contract (round-10 adversarial-relational sweep):
        # NULL/NaN/Inf and magnitudes past 2^62/100 have no exact x100
        # integer projection (the Arrow cast raises on truncation) —
        # excluded from the sum; the order still counts in n_orders
        on_grid = pc.and_kleene(
            pc.is_finite(prices),
            pc.less(pc.abs(prices), (1 << 62) / 100),
        )
        cents = pc.cast(
            pc.floor(
                pc.add(
                    pc.multiply(pc.filter(prices, pc.fill_null(on_grid, False)), 100.0),
                    0.5,
                )
            ),
            pa.int64(),
        )
        # explicit schema: a NULL-key group (legal GROUP BY semantics)
        # would otherwise make pa.table infer a null-typed key column
        # and fail the result-schema check (round-10 sweep)
        return pa.table(
            {
                "o_custkey": [tbl.column("o_custkey")[0].as_py()],
                "n_orders": [tbl.num_rows],
                "total_cents": [pc.sum(cents).as_py() or 0],
            },
            schema=pa.schema(
                [
                    ("o_custkey", pa.int64()),
                    ("n_orders", pa.int64()),
                    ("total_cents", pa.int64()),
                ]
            ),
        )

    return o.groupBy("o_custkey").applyInArrow(
        per_group, "o_custkey long, n_orders long, total_cents long"
    )


def q_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function) in a LATERAL join: one part row →
    one row per type-word. Row-at-a-time Python — the supported escape
    hatch for 1→N logic SQL can't express, NOT a hot-path tool (the
    vectorized 1→N shape is mapInPandas, see operators/multimodal.py)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word_idx int, word string")
    class SplitWords:
        def eval(self, text: str):
            for i, w in enumerate((text or "").split(" ")):
                yield i, w

    load_table(spark, sf_dir, "part").createOrReplaceTempView("v_part_udtf")
    spark.udtf.register("split_words", SplitWords)
    return spark.sql(
        """
        SELECT p_partkey, t.word_idx, t.word
        FROM v_part_udtf, LATERAL split_words(p_type) t
        """
    )


def q_udtf_table_arg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF over a TABLE argument with PARTITION BY (Spark 4):
    the engine shuffles the input by the partition key and streams each
    partition through one UDTF instance (``eval`` per row, ``terminate``
    at partition end) — the table-function analogue of a grouped-map,
    here computing each event_type's top-2 users by integer value-millis
    total. State is bounded per partition (a user→total dict); integer
    sums are order-independent and ties break by user id, so the result
    is engine-exact.

    The table argument is PRE-AGGREGATED per (event_type, user_id) in
    the JVM before it reaches Python (guide §2.3 "aggregate before you
    shuffle", §4.1 on eval-per-row cost): `eval` is invoked once per
    GROUP, not once per raw event — 7.5k calls instead of 100k at
    sf0.1 (measured 2.5 s → 1.2 s) and rows-shipped ∝ keys, not
    events, at any scale. Exactness is preserved stage by stage: the
    JVM guard keeps exactly the rows the Python guard kept (abs(v) <
    2^62/1000 is false for NULL/NaN/±Inf and the overflow band),
    FLOOR(v*1000 + 0.5) on the same IEEE double matches math.floor,
    and the partial sums ride DECIMAL(38,0) so no intermediate ever
    wraps; the UDTF still folds them into arbitrary-precision Python
    ints, so the terminate-side ranking and the NULL-id tie-break are
    byte-identical to the per-event formulation."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="event_type string, user_id long, total_millis long, rk int")
    class TopUsers:
        def __init__(self):
            self._totals: dict = {}
            self._etype = None

        def eval(self, row):
            self._etype = row["event_type"]
            u = row["user_id"]
            # DECIMAL(38,0) partial total — exact; int() keeps the
            # dict arithmetic arbitrary-precision as before
            self._totals[u] = self._totals.get(u, 0) + int(row["millis"])

        def terminate(self):
            # total-order-safe tie-break: a NULL user_id (key None)
            # tying on total with an integer user would hit None<int
            # and TypeError out of the worker — legal telemetry must
            # rank, not crash (NULL sorts after real ids on a tie)
            ranked = sorted(
                self._totals.items(),
                key=lambda kv: (-kv[1], kv[0] is None, kv[0] or 0),
            )
            for i, (u, t) in enumerate(ranked[:2]):
                yield self._etype, u, t, i + 1

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "user_id", "value"
    )
    # telemetry outside the millis grid carries no spendable amount:
    # NULL/NaN/Inf, and magnitudes whose x1000 projection overflows
    # the declared BIGINT — the single predicate abs(v) < 2^62/1000 is
    # false for every one of those (Spark sorts NaN above any double,
    # NULL propagates) and true exactly where the old Python-side
    # guard kept the row (round-10 adversarial-events sweep).
    agg = (
        ev.filter(F.abs(F.col("value")) < F.lit((1 << 62) / 1000))
        .groupBy("event_type", "user_id")
        .agg(
            F.sum(
                F.floor(F.col("value") * 1000 + 0.5).cast("decimal(38,0)")
            ).alias("millis")
        )
    )
    agg.createOrReplaceTempView("v_events_udtf")
    spark.udtf.register("top_users", TopUsers)
    return spark.sql(
        "SELECT * FROM top_users(TABLE(v_events_udtf) PARTITION BY event_type)"
    )


def q_cogroup_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cogroup(...).applyInPandas: the two-frame grouped hook — each
    user's view events and purchase events arrive as SEPARATE pandas
    frames in one call (vs a pre-join, which would materialize the
    pair product; vs two applyInPandas passes, which would shuffle
    twice). Integer outputs only (counts + value millis), so the
    result is engine-exact.

    Both sides re-alias their columns (fresh attribute ids) even
    though the names don't change: when the two cogroup children carry
    the SAME attribute ids — both filtered off one scan — Spark 4.1's
    column pruning under a downstream ``count()`` strips the right
    child's non-key columns while the pandas UDF still reads them by
    name (KeyError: 'value' from inside the worker; collect/write
    actions are unaffected, which is how it hides). Distinct ids per
    side make the pruner see two independent subtrees; the Project is
    codegen-free and the single events scan still feeds both sides."""
    from etl_global_mobility_spark.corpus.base import load_table as _lt

    ev = _lt(spark, sf_dir, "events")
    views = ensure_grouped_compute_parallelism(
        ev.filter(F.col("event_type") == "view").select(
            F.col("user_id").alias("user_id"), F.col("value").alias("value")
        ),
        ["user_id"],
    )
    buys = ensure_grouped_compute_parallelism(
        ev.filter(F.col("event_type") == "purchase").select(
            F.col("user_id").alias("user_id"), F.col("value").alias("value")
        ),
        ["user_id"],
    )

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_views", T.LongType()),
            T.StructField("n_buys", T.LongType()),
            T.StructField("view_value_millis", T.LongType()),
            T.StructField("buy_value_millis", T.LongType()),
        ]
    )

    def profile(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        import math

        def millis(s):
            # Telemetry outside the millis grid carries no spendable
            # amount — NULL/NaN/Inf, and magnitudes past 2^62/1000
            # (whose x1000 projection overflows the declared BIGINT at
            # the Arrow boundary) are excluded from the integer sum;
            # the event still counts in n_views/n_buys (round-10
            # adversarial-events sweep).
            return int(
                sum(
                    math.floor(v * 1000 + 0.5)
                    for v in s
                    if v is not None
                    and math.isfinite(v)
                    and abs(v) < (1 << 62) / 1000
                )
            )

        return pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_views": [len(left)],
                "n_buys": [len(right)],
                "view_value_millis": [millis(left["value"])],
                "buy_value_millis": [millis(right["value"])],
            }
        )

    return (
        views.groupBy("user_id")
        .cogroup(buys.groupBy("user_id"))
        .applyInPandas(profile, schema)
    )


def q_sql_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scalar UDF (Spark 4 ``CREATE FUNCTION ... RETURN expr``):
    a price-band classifier declared ONCE in SQL and reused in both
    the projection and the GROUP BY. Unlike every Python UDF variant,
    a SQL UDF is inlined into the expression tree at analysis time —
    the executed plan is pure Catalyst/codegen with NO eval-python
    node (pinned in test_plans), so it scales exactly like the
    hand-inlined CASE while staying a named, reusable abstraction."""
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION price_band(p DOUBLE)
        RETURNS STRING
        RETURN CASE WHEN p < 905.0 THEN 'low'
                    WHEN p < 915.0 THEN 'mid'
                    ELSE 'high' END
        """
    )
    load_table(spark, sf_dir, "part").createOrReplaceTempView(
        "v_part_sqlfn"
    )
    return spark.sql(
        """
        SELECT price_band(p_retailprice) AS band,
               count(*) AS n_parts,
               CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS sum_price
        FROM v_part_sqlfn
        GROUP BY price_band(p_retailprice)
        """
    )


SPECS = [
    QuerySpec(
        "udf_sql_function",
        q_sql_function,
        """SELECT CASE WHEN p_retailprice < 905.0 THEN 'low'
                       WHEN p_retailprice < 915.0 THEN 'mid'
                       ELSE 'high' END AS band,
               count(*) AS n_parts,
               CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS sum_price
           FROM part GROUP BY 1""",
        doc="SQL scalar UDF (CREATE FUNCTION ... RETURN): analysis-"
        "time inlining, pure codegen plan (no Python eval node)",
    ),
    QuerySpec(
        "udf_cogroup_profile",
        q_cogroup_profile,
        """WITH v AS (
             SELECT user_id, count(*) AS n_views,
                    CAST(sum(CAST(floor(value * 1000 + 0.5) AS BIGINT)) AS BIGINT)
                      AS view_value_millis
             FROM events WHERE event_type = 'view' GROUP BY user_id
           ), b AS (
             SELECT user_id, count(*) AS n_buys,
                    CAST(sum(CAST(floor(value * 1000 + 0.5) AS BIGINT)) AS BIGINT)
                      AS buy_value_millis
             FROM events WHERE event_type = 'purchase' GROUP BY user_id
           )
           SELECT coalesce(v.user_id, b.user_id) AS user_id,
                  coalesce(n_views, 0) AS n_views,
                  coalesce(n_buys, 0) AS n_buys,
                  coalesce(view_value_millis, 0) AS view_value_millis,
                  coalesce(buy_value_millis, 0) AS buy_value_millis
           FROM v FULL OUTER JOIN b ON v.user_id = b.user_id""",
        doc="cogrouped applyInPandas (two-frame grouped transform)",
    ),
    QuerySpec(
        "udf_apply_in_arrow",
        q_apply_in_arrow,
        """SELECT o_custkey, count(*) AS n_orders,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
                 AS total_cents
           FROM orders GROUP BY o_custkey""",
        doc="applyInArrow grouped zero-copy Arrow transform (Spark 4)",
    ),
    QuerySpec(
        "udf_map_in_arrow",
        q_map_in_arrow,
        "SELECT p_partkey, CAST(octet_length(encode(p_name)) AS BIGINT) AS name_bytes "
        "FROM part",
        doc="mapInArrow zero-copy Arrow batch transform",
    ),
    QuerySpec(
        "udf_python_udtf",
        q_python_udtf,
        """WITH w AS (SELECT p_partkey, string_split(p_type, ' ') AS words FROM part),
                e AS (SELECT p_partkey, words,
                             unnest(range(1, len(words) + 1)) AS i FROM w)
           SELECT p_partkey, CAST(i - 1 AS INT) AS word_idx, words[i] AS word
           FROM e""",
        doc="Python UDTF via LATERAL join (1-to-N table function)",
    ),
    QuerySpec(
        "udf_udtf_table_arg",
        q_udtf_table_arg,
        """WITH totals AS (
             SELECT event_type, user_id,
                    CAST(sum(CAST(floor(value * 1000 + 0.5) AS BIGINT)) AS BIGINT)
                      AS total_millis
             FROM events GROUP BY event_type, user_id
           ), ranked AS (
             SELECT event_type, user_id, total_millis,
                    CAST(row_number() OVER (
                      PARTITION BY event_type
                      ORDER BY total_millis DESC, user_id) AS INT) AS rk
             FROM totals
           )
           SELECT event_type, user_id, total_millis, rk
           FROM ranked WHERE rk <= 2""",
        doc="Python UDTF over TABLE(...) PARTITION BY (Spark 4 "
        "partition-streamed table function with terminate())",
    ),
    QuerySpec(
        "udf_pandas_scalar",
        q_pandas_scalar,
        "SELECT l_orderkey, l_linenumber, "
        "l_extendedprice * (1.0 - l_discount) AS disc_price FROM lineitem",
        doc="Arrow-vectorized scalar pandas UDF",
    ),
    QuerySpec(
        "udf_pandas_grouped_agg",
        q_pandas_grouped_agg,
        """SELECT o_custkey,
               CAST(max(o_totalprice) - min(o_totalprice) AS DOUBLE) AS price_spread,
               count(*) AS n_orders
            FROM orders GROUP BY o_custkey""",
        doc="grouped-aggregate pandas UDAF",
    ),
    QuerySpec(
        "udf_pandas_grouped_map",
        q_pandas_grouped_map,
        """SELECT o_custkey, o_orderkey,
               o_totalprice - min(o_totalprice) OVER (PARTITION BY o_custkey)
                 AS delta_from_min
            FROM orders""",
        doc="grouped-map applyInPandas transform",
    ),
]
