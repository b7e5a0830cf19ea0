"""Benchmark harness: headline corpus queries at sf0.1.

Runs each headline query to full materialization (noop sink — executes
the whole plan, no driver-side row transfer) and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "rel_join_revenue_by_nation",
    "rel_join_left_orders",
    "rel_join_nonequi_self",
    "rel_agg_pricing_summary",
    "rel_agg_count_distinct",
    "rel_window_topk_per_group",
    "rel_window_running_sum",
    "rel_topk_global",
    "rel_json_events",
    "rel_pivot_linestatus",
    "rel_agg_stats_moments",
    "rel_median_disc",
    "rel_join_salted_skew",
    "parity_quality_reasons",
    "parity_split_quarantine",
    "llm_exact_dedup",
    "llm_simhash",
    "llm_minhash_neardup",
    "llm_cosine_topk",
    "llm_lsh_ann",
    "llm_ivf_ann",
    "llm_embedding_neardup",
    "llm_asof_join",
    "llm_frame_sample",
    "stream_tumbling_counts",
    "stream_stateful_profile",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from etl_global_mobility_spark.corpus import all_queries
    from etl_global_mobility_spark.corpus.base import TABLES, load_table

    # Warmup: touch every table once, then run one tiny join+agg+window
    # over the smallest dims, so the first timed query doesn't absorb
    # JVM/codegen/file-listing warmup (scans alone leave the join/agg
    # codegen paths cold — measured ~1.8s on the first timed join).
    for t in TABLES:
        load_table(spark, sf_dir, t).write.format("noop").mode("overwrite").save()
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("rk", F.row_number().over(Window.orderBy(F.col("n").desc(), "r_name")))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    specs = all_queries()
    times: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        spec = specs[name]
        t0 = time.time()
        df = spec.fn(spark, sf_dir)
        if df.isStreaming:  # pragma: no cover - none currently
            df.count()
        else:
            df.write.format("noop").mode("overwrite").save()
        dt = round(time.time() - t0, 3)
        times[name] = dt
        total += dt

    print(
        json.dumps(
            {
                "metric": "headline_corpus_total_runtime",
                "value": round(total, 3),
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
