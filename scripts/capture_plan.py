"""Capture .explain('formatted') for named corpus queries to files.

Usage: python scripts/capture_plan.py [--executed] OUTDIR SUFFIX name [name ...]
Writes OUTDIR/<name>_<SUFFIX>.txt. Uses the bench session confs at
sf0.1 so the captured initial plan matches what the bench executes.

--executed additionally RUNS each query to the noop sink and writes
OUTDIR/<name>_<SUFFIX>_executed.txt with the post-execution plan — the
one AQE has finalized (ReusedExchange, AQEShuffleRead, runtime join
strategy switches live only there; round-14's dsir ReusedExchange
claim was unverifiable from the static dumps alone).
"""
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

args = sys.argv[1:]
executed = "--executed" in args
if executed:
    args.remove("--executed")
outdir, suffix, *names = args
os.makedirs(outdir, exist_ok=True)
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .appName("capture_plan")
    .config("spark.sql.shuffle.partitions", cpus)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from etl_global_mobility_spark.corpus import all_queries

specs = all_queries()
for name in names:
    df = specs[name].fn(spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
        f.write(buf.getvalue())
    if executed:
        # materialize THIS df's own queryExecution (a write wraps it
        # in a new one, so the noop sink would not finalize df's
        # executedPlan). JVM-side toRdd().count() runs the same
        # execution without collecting rows to the driver — a
        # collect() here would pull multi-million-row outputs local.
        df._jdf.queryExecution().toRdd().count()
        plan = df._jdf.queryExecution().executedPlan().toString()
        with open(
            os.path.join(outdir, f"{name}_{suffix}_executed.txt"), "w"
        ) as f:
            f.write(plan)
    print("wrote", name)
spark.stop()
