"""Driver-contract gate, locally enforced: every corpus query must
hash-match its DuckDB oracle at sf0.001 (the driver runs the same
comparison at sf0.01 → CORRECTNESS_r{N}.json).

Runs scripts/selfcheck.py in a subprocess: it builds its own
SparkSession, which must not displace the session-scoped fixture.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_every_corpus_query_matches_oracle():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "selfcheck.py"),
         "/root/testdata/sf0.001"],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=900,
    )
    tail = "\n".join(proc.stdout.splitlines()[-25:])
    assert proc.returncode == 0, f"selfcheck failed:\n{tail}\n{proc.stderr[-2000:]}"
    assert ", 0 fail" in proc.stdout


def test_contract_surface_is_complete():
    """entry/queries/oracle_sql exist and agree with the corpus."""
    sys.path.insert(0, REPO)
    import __spark_entry__ as e
    from etl_global_mobility_spark.corpus import all_queries

    specs = all_queries()
    qs = e.queries()
    osql = e.oracle_sql()
    assert set(qs) == set(specs)
    assert set(osql) == {k for k, s in specs.items() if s.oracle is not None}
    assert len(qs) >= 50


def test_driver_window_invariants():
    """The driver checks the FIRST 50 registered queries; the window
    ROTATES per round so every oracle-backed query earns a green driver
    row in some round (ordering policy in corpus/__init__.py). Pin:

    * the window is exactly 50 names and registration starts with it;
    * every oracle-backed query is either in this round's window or
      already holds a green row from a past round
      (DRIVER_GREEN_PAST_ROUNDS) — i.e. no query is stranded without
      driver evidence;
    * everything in the window carries a DuckDB oracle (no rows-only
      checks spending a window slot — the approximate sketches are the
      only queries exempt from window coverage, by design).
    """
    sys.path.insert(0, REPO)
    from etl_global_mobility_spark.corpus import (
        DRIVER_GREEN_PAST_ROUNDS,
        DRIVER_WINDOW,
        SCHEDULED_NEXT_WINDOW,
        all_queries,
    )

    specs = all_queries()
    names = list(specs)
    assert len(DRIVER_WINDOW) == 50
    assert tuple(names[:50]) == tuple(DRIVER_WINDOW)

    oracle_backed = {n for n, s in specs.items() if s.oracle is not None}
    stranded = (
        oracle_backed
        - set(DRIVER_WINDOW)
        - DRIVER_GREEN_PAST_ROUNDS
        - SCHEDULED_NEXT_WINDOW
    )
    assert not stranded, (
        f"oracle-backed queries with no driver evidence in any round: "
        f"{sorted(stranded)}"
    )
    # the schedule is for genuinely NEW queries only — anything with
    # evidence (or a window slot) must not hide behind it
    assert not (
        SCHEDULED_NEXT_WINDOW & (set(DRIVER_WINDOW) | DRIVER_GREEN_PAST_ROUNDS)
    )
    assert all(specs[n].oracle is not None for n in SCHEDULED_NEXT_WINDOW)

    no_oracle = [n for n in DRIVER_WINDOW if specs[n].oracle is None]
    assert not no_oracle, f"rows-only queries inside the window: {no_oracle}"


def test_driver_evidence_max_staleness():
    """Rotation must keep driver evidence FRESH, not just existent:
    every oracle-backed query (except this round's additions, which sit
    in SCHEDULED_NEXT_WINDOW) must have a green driver row recorded
    within the last MAX_STALENESS rounds, counting a slot in the
    current DRIVER_WINDOW as evidence for the upcoming round.

    The bound SCALES WITH THE CORPUS: a 50-slot window refreshing N
    oracle-backed queries revisits each one every ceil(N/50) rounds
    under round-robin scheduling, so the tightest sustainable bound is
    exactly that refresh period (round 5's fixed "3" was tight for the
    then-176 queries; round 6 grew the surface to 210+, where 3 would
    be arithmetically unsatisfiable — the bound must grow with N or
    the window must). If a query's last green row ages past the bound,
    this test fails until a window re-checks it.
    """
    import glob
    import json
    import math
    import re

    sys.path.insert(0, REPO)
    from etl_global_mobility_spark.corpus import (
        DRIVER_WINDOW,
        SCHEDULED_NEXT_WINDOW,
        all_queries,
    )

    n_oracle = sum(
        1 for s in all_queries().values() if s.oracle is not None
    )
    MAX_STALENESS = max(3, math.ceil(n_oracle / len(DRIVER_WINDOW)))

    def green(v):
        return (
            bool(v.get("rows_match"))
            and v.get("schema_match") in (True, None)
            and v.get("hash_match") in (True, None)
            and not v.get("err")
        )

    latest: dict[str, int] = {}
    rounds = []
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rn = int(m.group(1))
        rounds.append(rn)
        with open(path) as f:
            rows = json.load(f)
        for name, v in rows.items():
            if green(v):
                latest[name] = max(latest.get(name, 0), rn)
    assert rounds, "no CORRECTNESS_r*.json files found"
    current_round = max(rounds) + 1  # the round this window targets
    for name in DRIVER_WINDOW:
        latest[name] = current_round

    specs = all_queries()
    oracle_backed = {n for n, s in specs.items() if s.oracle is not None}
    stale = {
        n: latest.get(n)
        for n in oracle_backed - SCHEDULED_NEXT_WINDOW
        if current_round - latest.get(n, -10**6) > MAX_STALENESS
    }
    assert not stale, (
        f"driver evidence older than {MAX_STALENESS} rounds "
        f"(current={current_round}): {stale} — rotate these into "
        f"DRIVER_WINDOW"
    )
