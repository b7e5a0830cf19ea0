"""_scratch_dir — per-(query, sf, process) scratch isolation for the
source round-trip fixtures (round 11: a fixed path let two concurrent
driver gates interleave, rel_source_text_wholetext returned 530 rows
— 500 sf0.01 + 30 sf0.001 partition dirs — against a 500-row oracle)."""

from __future__ import annotations

import os
import subprocess

import pytest


def _patched(monkeypatch, tmp_path):
    from etl_global_mobility_spark.corpus import relational as R

    real = R._roundtrip_dir

    def fake(name):
        return str(tmp_path / name) if name else str(tmp_path)

    monkeypatch.setattr(R, "_roundtrip_dir", fake)
    return R


def test_scratch_dir_keys_by_sf_and_pid(tmp_path, monkeypatch):
    R = _patched(monkeypatch, tmp_path)
    a = R._scratch_dir("wholetext_documents", "/data/sf0.01")
    b = R._scratch_dir("wholetext_documents", "/data/sf0.001")
    c = R._scratch_dir("wholetext_documents", "/data/sf0.01")
    assert a != b, "different sf dirs must not share a scratch path"
    assert a == c, "same (query, sf, process) must be stable"
    assert f"-p{os.getpid()}" in a
    assert a.startswith(str(tmp_path))


def test_scratch_dir_prunes_dead_pid_siblings_only(tmp_path, monkeypatch):
    R = _patched(monkeypatch, tmp_path)
    live = R._scratch_dir("csv_nation", "/data/sf0.01")
    os.makedirs(live)
    (tmp_path / "unrelated_dir").mkdir()

    # a genuinely dead pid: a subprocess that has already exited
    p = subprocess.Popen(["true"])
    p.wait()
    digest = os.path.basename(live).split("-")[1]
    dead = tmp_path / f"csv_nation-{digest}-p{p.pid}"
    dead.mkdir()

    again = R._scratch_dir("csv_nation", "/data/sf0.01")
    assert again == live
    assert os.path.isdir(live), "the live process's dir must survive"
    assert not dead.exists(), "dead-pid sibling must be pruned"
    assert (tmp_path / "unrelated_dir").exists(), "prune is name-scoped"


def test_wholetext_roundtrip_uses_isolated_scratch(spark):
    """The measured round-11 failure path: the query's read-back count
    must equal its own capped write even when a stale foreign layout
    sits at the OLD fixed path."""
    from etl_global_mobility_spark.corpus.relational import (
        _roundtrip_dir,
        q_source_text_wholetext,
    )

    legacy = _roundtrip_dir("wholetext_documents")
    os.makedirs(os.path.join(legacy, "doc_id=999999"), exist_ok=True)
    with open(os.path.join(legacy, "doc_id=999999", "part-0.txt"), "w") as f:
        f.write("foreign leftover\n")
    try:
        got = q_source_text_wholetext(spark, "/root/testdata/sf0.001")
        ids = {r.doc_id for r in got.collect()}
        assert 999999 not in ids
        assert len(ids) == got.count()
    finally:
        import shutil

        shutil.rmtree(legacy, ignore_errors=True)


@pytest.mark.slow
def test_two_processes_roundtrip_concurrently_without_interleaving(tmp_path):
    """The round-11 failure, as a live two-process regression: two
    driver processes run the wholetext round-trip SIMULTANEOUSLY at
    different scale factors. With the old fixed fixture path one
    reader listed the other's partition dirs (530 rows vs a 500-row
    oracle); with per-(sf, pid) scratch both must read back exactly
    their own capped write."""
    import duckdb
    import subprocess
    import sys

    SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false").getOrCreate())
from etl_global_mobility_spark.corpus.relational import q_source_text_wholetext
for _ in range(3):  # widen the overlap window
    n = q_source_text_wholetext(spark, {sf!r}).count()
    print("COUNT", {sf!r}, n, flush=True)
spark.stop()
"""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sfs = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", SCRIPT.format(repo=repo, sf=sf)],
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
        )
        for sf in sfs
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    assert all(p.returncode == 0 for p in procs), outs

    expected = {
        sf: duckdb.sql(
            f"SELECT count(*) FROM read_parquet('{sf}/documents.parquet') "
            "WHERE doc_id < 500"
        ).fetchone()[0]
        for sf in sfs
    }
    for sf, out in zip(sfs, outs):
        counts = [
            int(line.split()[-1])
            for line in out.splitlines()
            if line.startswith("COUNT")
        ]
        assert counts == [expected[sf]] * 3, (
            f"{sf}: read-back {counts} != own write {expected[sf]} — "
            "cross-process scratch interleaving"
        )
