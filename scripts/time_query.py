"""Time individual corpus queries in isolation (guide §1.4).

Same session confs as bench.py, same noop-sink materialization, same
warmup, min-of-N per query — but only for the names given, so a single
query's cost can be measured without the 261-query suite around it.

Usage: python scripts/time_query.py [-n RUNS] [--explain] name [name ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
       SPARK_GRAFT_CPUS (default 32).

--explain additionally prints each query's .explain("formatted") once
(untimed) so plan capture and timing share one session setup.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    n_runs = 3
    explain = False
    if "-n" in args:
        i = args.index("-n")
        n_runs = int(args[i + 1])
        del args[i : i + 2]
    if "--explain" in args:
        explain = True
        args.remove("--explain")
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("time_query")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from bench import _warm_python_workers  # noqa: E402
    from etl_global_mobility_spark.corpus import all_queries
    from etl_global_mobility_spark.corpus.base import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).write.format("noop").mode("overwrite").save()
    _warm_python_workers(spark, int(cpus))

    specs = all_queries()
    for name in names:
        spec = specs[name]
        if explain:
            print(f"==== PLAN {name} ====")
            spec.fn(spark, sf_dir).explain("formatted")
        runs = []
        for _ in range(n_runs):
            spark.sparkContext.setJobDescription(f"time_query:{name}")
            t0 = time.time()
            df = spec.fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        print(f"{name}: min={min(runs)} runs={runs}")
    spark.stop()


if __name__ == "__main__":
    main()
