"""Pins for the three ADVICE-r12 fixes:

1. bench._baseline_calibration tolerates non-numeric JSON types
   (covered in tests/test_bench_gate.py::test_baseline_calibration_reader);
2. scripts/plan_perf_diff.py refuses a FILTERED --rebaseline whose
   sf_dir differs from the existing baseline's (silent provenance
   corruption — plan shapes differ by sf via AQE/broadcast decisions);
3. corpus/llm.py artifact repair quarantines the invalid dir via one
   atomic os.rename instead of rmtree — a concurrent process's freshly
   repaired artifact can no longer be deleted in the TOCTOU window
   between the failed load and the old delete.
"""

from __future__ import annotations

import pytest

import importlib.util
import json
import os
import shutil

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_plan_perf_diff():
    spec = importlib.util.spec_from_file_location(
        "plan_perf_diff_r12_mod",
        os.path.join(REPO, "scripts", "plan_perf_diff.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_filtered_rebaseline_refuses_sf_mismatch(tmp_path, monkeypatch):
    """A filtered merge at a different sf must be refused (payload
    names both sides), BEFORE any Spark session is paid for; the same
    sf — or a missing baseline — merges as before."""
    mod = _load_plan_perf_diff()
    baseline = tmp_path / "PLAN_SHAPES_BASELINE.json"
    monkeypatch.setattr(mod, "BASELINE_PATH", str(baseline))

    # no baseline yet: nothing to contradict
    assert mod._filtered_rebaseline_sf_conflict("/root/testdata/sf0.01") is None

    baseline.write_text(
        json.dumps({"sf_dir": "/root/testdata/sf0.001", "shapes": []})
    )
    # same sf (even spelled differently): merge allowed
    assert mod._filtered_rebaseline_sf_conflict("/root/testdata/sf0.001") is None
    assert (
        mod._filtered_rebaseline_sf_conflict("/root/testdata/../testdata/sf0.001")
        is None
    )
    # different sf: refused with a payload naming both sides
    refusal = mod._filtered_rebaseline_sf_conflict("/root/testdata/sf0.01")
    assert refusal is not None
    assert refusal["baseline_sf_dir"] == "/root/testdata/sf0.001"
    assert refusal["requested_sf_dir"] == "/root/testdata/sf0.01"

    # legacy baseline without sf_dir: ALSO refused — merging would
    # stamp the current run's sf over every legacy pin, fabricating
    # provenance (r13 review finding); one full rebaseline stamps it
    baseline.write_text(json.dumps({"shapes": []}))
    refusal = mod._filtered_rebaseline_sf_conflict("/root/testdata/sf0.01")
    assert refusal is not None and refusal["baseline_sf_dir"] is None


@pytest.mark.slow
def test_kmeans_repair_never_deletes_concurrent_valid_artifact(
    spark, sf_smoke, monkeypatch
):
    """The ADVICE-r12 TOCTOU: this process fails to load `path`
    (invalid), but BETWEEN that failed load and the old rmtree a
    concurrent process repairs `path` with a valid artifact. The
    repair must claim the invalid dir via one atomic rename — when
    that claim LOSES (the concurrent repair already moved/replaced
    it), the other process's artifact must survive untouched, never
    be rmtree'd."""
    import hashlib

    import etl_global_mobility_spark.corpus.llm as llm
    from etl_global_mobility_spark.corpus.relational import _roundtrip_dir
    from etl_global_mobility_spark.operators.similarity import (
        load_kmeans_centroids,
        save_kmeans_centroids,
    )

    k, iters, scale = 4, 2, 1 << 20
    llm._KMEANS_ARTIFACT_MEM.clear()
    expected = llm._kmeans_artifact_centroids(spark, sf_smoke, k=k, iters=iters)
    st = os.stat(os.path.join(os.path.abspath(sf_smoke), "embeddings.parquet"))
    fingerprint = f"{st.st_mtime_ns}-{st.st_size}"
    key = (os.path.abspath(sf_smoke), k, iters, scale, fingerprint)
    digest = hashlib.md5(f"{key}|{fingerprint}".encode()).hexdigest()[:16]
    target = _roundtrip_dir(f"kmeans_{digest}")
    assert os.path.isdir(target)

    # Simulate the race: the load in THIS process fails (as if it read
    # a partial artifact), but by the time the repair acts, `path`
    # already holds the concurrent process's VALID artifact — so the
    # exclusive-claim rename and the publish rename both lose.
    from etl_global_mobility_spark.operators import similarity as sim

    load_calls = {"n": 0}
    real_load = sim.load_kmeans_centroids

    def failing_first_load(spark_, path_):
        load_calls["n"] += 1
        raise ValueError("simulated partial-read of a mid-repair artifact")

    monkeypatch.setattr(sim, "load_kmeans_centroids", failing_first_load)

    real_rename = os.rename
    renames: list[tuple[str, str]] = []

    def losing_rename(src, dst):
        renames.append((src, dst))
        if ".quarantine-" in dst or ".tmp-" in src:
            # both the claim and the publish lose to the concurrent
            # repairer
            raise OSError("simulated lost race")
        return real_rename(src, dst)

    monkeypatch.setattr(os, "rename", losing_rename)

    rmtreed: list[str] = []
    real_rmtree = shutil.rmtree

    def spying_rmtree(path_, *a, **kw):
        rmtreed.append(str(path_))
        return real_rmtree(path_, *a, **kw)

    # llm imports shutil at function scope, so patching the module
    # attribute covers its call sites
    monkeypatch.setattr(shutil, "rmtree", spying_rmtree)

    llm._KMEANS_ARTIFACT_MEM.clear()
    cents = llm._kmeans_artifact_centroids(spark, sf_smoke, k=k, iters=iters)
    assert cents == expected  # served from the retrained in-memory copy

    # THE fix: the concurrent process's artifact at `target` was never
    # rmtree'd — only our own tmp staging dir was cleaned up
    assert all(not p.rstrip("/").endswith(f"kmeans_{digest}") for p in rmtreed), (
        f"repair rmtree'd the live artifact path: {rmtreed}"
    )
    assert any(".tmp-" in p for p in rmtreed), "tmp staging dir not cleaned"
    # the exclusive claim was attempted via rename, not rmtree
    assert any(".quarantine-" in dst for _src, dst in renames)
    # and the on-disk artifact is still the valid one
    monkeypatch.setattr(sim, "load_kmeans_centroids", real_load)
    loaded, _sc = real_load(spark, target)
    assert loaded == expected


@pytest.mark.slow
def test_kmeans_repair_quarantine_leaves_no_leftovers(spark, sf_smoke):
    """The winning-claim path: an invalid on-disk artifact is moved
    aside atomically, the fresh artifact is published, and the
    quarantine dir is removed — no .quarantine-* or .tmp-* siblings
    survive the repair."""
    import hashlib

    import etl_global_mobility_spark.corpus.llm as llm
    from etl_global_mobility_spark.corpus.relational import _roundtrip_dir
    from etl_global_mobility_spark.operators.similarity import (
        load_kmeans_centroids,
    )

    k, iters, scale = 4, 2, 1 << 20
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

    llm._KMEANS_ARTIFACT_MEM.clear()
    cents = llm._kmeans_artifact_centroids(spark, sf_smoke, k=k, iters=iters)
    assert cents == expected
    loaded, _sc = load_kmeans_centroids(spark, target)
    assert loaded == expected
    siblings = os.listdir(os.path.dirname(target))
    assert all(".quarantine-" not in e and ".tmp-" not in e for e in siblings), (
        f"repair left staging/quarantine leftovers: {siblings}"
    )
