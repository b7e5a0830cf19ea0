"""Regression pins for the round-11 ADVICE items: unpersist must hit
the frame that was actually persisted (not a coalesce-rebound plan),
the kmeans artifact publish must REPAIR an invalid on-disk artifact,
round_open must not sweep unrelated staged changes into the artifact
commit, and streaming scratch bases must prune dead-pid siblings."""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _sql_cache_empty(spark) -> bool:
    """True iff the SQL CacheManager holds no cached plans.

    RDD-level counts would false-positive on localCheckpoint blocks
    (owned by session hygiene, not the operator); the r11 leak is a
    CacheManager entry whose unpersist() missed because the plan had
    been rebound under a Coalesce node."""
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


def _small_edges(spark):
    # < 100k edges → the coalesce(1) fast path that caused the leak
    return spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "src long, dst long"
    )


def test_label_propagation_releases_cache_on_coalesce_path(spark):
    from etl_global_mobility_spark.operators.graph import label_propagation

    spark.catalog.clearCache()
    label_propagation(_small_edges(spark), n_iters=1).collect()
    assert _sql_cache_empty(spark), (
        "label_propagation leaked a cached plan: unpersist() ran on "
        "the coalesce-rebound plan, which the cache manager does not "
        "sameResult-match"
    )


def test_label_propagation_convergence_releases_cache(spark):
    from etl_global_mobility_spark.operators.graph import (
        label_propagation_convergence,
    )

    spark.catalog.clearCache()
    label_propagation_convergence(_small_edges(spark), n_iters=1).collect()
    assert _sql_cache_empty(spark)


def test_dedup_components_releases_cache_on_coalesce_path(spark):
    from etl_global_mobility_spark.operators.dedup import dedup_components

    spark.catalog.clearCache()
    out = dedup_components(
        _small_edges(spark).select(
            F.col("src").alias("id_a"), F.col("dst").alias("id_b")
        ),
        id_a="id_a",
        id_b="id_b",
    )
    out.collect()
    # the RESULT frame is persisted by design (caller-owned); free it
    # and require everything else to be gone
    out.unpersist()
    assert _sql_cache_empty(spark), (
        "dedup_components leaked its persisted edge frame after the "
        "coalesce(1) rebind"
    )


@pytest.mark.slow
def test_kmeans_publish_repairs_invalid_on_disk_artifact(spark, sf_smoke):
    """An on-disk artifact that cannot be loaded (partial write,
    corrupt parquet) must be REPLACED by the retrain publish — the old
    handler discarded the fresh copy on ENOTEMPTY, so the corrupt dir
    survived forever and every process retrained per-run."""
    import etl_global_mobility_spark.corpus.llm as llm
    from etl_global_mobility_spark.corpus.relational import _roundtrip_dir
    from etl_global_mobility_spark.operators.similarity import (
        load_kmeans_centroids,
    )

    import hashlib

    k, iters, scale = 4, 2, 1 << 20
    # drop the in-process memo so the artifact path is exercised
    llm._KMEANS_ARTIFACT_MEM.clear()
    cents = llm._kmeans_artifact_centroids(spark, sf_smoke, k=k, iters=iters)
    # recompute the artifact dir exactly as _kmeans_artifact_centroids
    st = os.stat(os.path.join(os.path.abspath(sf_smoke), "embeddings.parquet"))
    fingerprint = f"{st.st_mtime_ns}-{st.st_size}"
    key = (os.path.abspath(sf_smoke), k, iters, scale, fingerprint)
    digest = hashlib.md5(f"{key}|{fingerprint}".encode()).hexdigest()[:16]
    target = _roundtrip_dir(f"kmeans_{digest}")
    assert os.path.isdir(target), "no kmeans artifact published"
    # corrupt it: non-empty directory that cannot be loaded
    shutil.rmtree(target)
    os.makedirs(target)
    with open(os.path.join(target, "garbage.txt"), "w") as f:
        f.write("not parquet")
    llm._KMEANS_ARTIFACT_MEM.clear()
    cents2 = llm._kmeans_artifact_centroids(spark, sf_smoke, k=k, iters=iters)
    assert cents2 == cents
    # the REPAIR is the point: the corrupt dir must now be loadable
    loaded, _scale = load_kmeans_centroids(spark, target)
    assert loaded == cents, (
        "retrain publish left the corrupt artifact on disk — "
        "os.rename(tmp, path) ENOTEMPTY was swallowed without repair"
    )


def test_round_open_does_not_sweep_prestaged_changes(tmp_path):
    """A file the user staged before round_open runs must stay staged
    and must NOT enter the artifact commit."""
    repo = tmp_path / "repo"
    repo.mkdir()
    env = {**os.environ, "GIT_AUTHOR_NAME": "t", "GIT_AUTHOR_EMAIL": "t@t",
           "GIT_COMMITTER_NAME": "t", "GIT_COMMITTER_EMAIL": "t@t"}

    def git(*args):
        return subprocess.run(
            ["git", *args], cwd=repo, check=True, env=env,
            capture_output=True, text=True,
        ).stdout

    git("init", "-q")
    (repo / "code.py").write_text("x = 1\n")
    git("add", "code.py")
    git("commit", "-qm", "init")
    # user's in-flight work, staged but uncommitted
    (repo / "code.py").write_text("x = 2\n")
    git("add", "code.py")
    # a driver artifact lands
    (repo / "CORRECTNESS_r99.json").write_text("{}")

    # run round_open against the scratch repo
    script = os.path.join(REPO, "scripts", "round_open.py")
    src = open(script).read().replace(
        'REPO = ', f'REPO = {str(repo)!r}\n_REPO_unused = ', 1
    )
    patched = tmp_path / "round_open_patched.py"
    patched.write_text(src)
    proc = subprocess.run(
        [sys.executable, str(patched)], cwd=repo, env=env,
        capture_output=True, text=True,
    )
    assert proc.returncode == 0, proc.stderr
    committed = git("show", "--name-only", "--format=", "HEAD").split()
    assert committed == ["CORRECTNESS_r99.json"], (
        f"artifact commit swept extra paths: {committed}"
    )
    staged = git("diff", "--cached", "--name-only").split()
    assert staged == ["code.py"], "user's staged change was consumed"


def test_streaming_scratch_bases_prune_dead_pid_siblings(spark, sf_smoke):
    """The medallion/neardup stream bases go through _scratch_dir, so
    a layout left by a dead process is reclaimed on the next run."""
    from etl_global_mobility_spark.corpus.relational import (
        _roundtrip_dir,
        _scratch_dir,
    )

    root = _roundtrip_dir("")
    os.makedirs(root, exist_ok=True)
    import hashlib

    digest = hashlib.md5(os.path.abspath(sf_smoke).encode()).hexdigest()[:8]
    # a pid that cannot be alive (kernel pid_max is < 2**22 + 1)
    stale = os.path.join(root, f"medallion_stream-{digest}-p4194305")
    os.makedirs(stale, exist_ok=True)
    with open(os.path.join(stale, "marker"), "w") as f:
        f.write("stale")
    got = _scratch_dir("medallion_stream", sf_smoke)
    assert got.endswith(f"-p{os.getpid()}")
    assert not os.path.exists(stale), (
        "dead-pid medallion_stream layout was not pruned"
    )


@pytest.mark.slow
def test_two_processes_repair_corrupt_kmeans_artifact_concurrently(spark, sf_smoke):
    """The repair path under the topology it must survive: the shared
    kmeans artifact is corrupted on disk, then TWO driver processes
    race to retrain-and-republish. Whoever loses any rename race must
    treat a now-loadable path as a lost race (bit-identical
    centroids); the end state must be a loadable, correct artifact —
    never the silent forever-corrupt state the old ENOTEMPTY handler
    left behind."""
    import hashlib
    import subprocess
    import sys

    import etl_global_mobility_spark.corpus.llm as llm
    from etl_global_mobility_spark.corpus.relational import _roundtrip_dir
    from etl_global_mobility_spark.operators.similarity import (
        load_kmeans_centroids,
    )

    k, iters, scale = 4, 2, 1 << 20
    # train once in-process to know the expected centroids + path
    llm._KMEANS_ARTIFACT_MEM.clear()
    expected = llm._kmeans_artifact_centroids(spark, sf_smoke, k=k, iters=iters)
    st = os.stat(os.path.join(os.path.abspath(sf_smoke), "embeddings.parquet"))
    fingerprint = f"{st.st_mtime_ns}-{st.st_size}"
    key = (os.path.abspath(sf_smoke), k, iters, scale, fingerprint)
    digest = hashlib.md5(f"{key}|{fingerprint}".encode()).hexdigest()[:16]
    target = _roundtrip_dir(f"kmeans_{digest}")

    shutil.rmtree(target)
    os.makedirs(target)
    with open(os.path.join(target, "garbage.txt"), "w") as f:
        f.write("not parquet")

    SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false").getOrCreate())
from etl_global_mobility_spark.corpus.llm import _kmeans_artifact_centroids
cents = _kmeans_artifact_centroids(spark, {sf!r}, k={k}, iters={iters})
import hashlib
print("CENTS_HASH", hashlib.md5(repr(cents).encode()).hexdigest(), flush=True)
spark.stop()
"""
    procs = [
        subprocess.Popen(
            [sys.executable, "-c",
             SCRIPT.format(repo=REPO, sf=sf_smoke, k=k, iters=iters)],
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
        )
        for _ in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    assert all(p.returncode == 0 for p in procs), outs
    # both processes computed/loaded the same (bit-exact) centroids
    hashes = {
        line.split()[-1]
        for out in outs
        for line in out.splitlines()
        if line.startswith("CENTS_HASH")
    }
    assert len(hashes) == 1, outs
    # and the on-disk artifact was REPAIRED, not left corrupt
    loaded, _scale = load_kmeans_centroids(spark, target)
    assert loaded == expected
