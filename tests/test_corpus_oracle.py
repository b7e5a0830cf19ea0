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
    stale, MAX_STALENESS, current_round = _compute_stale_evidence()
    assert not stale, (
        f"driver evidence older than {MAX_STALENESS} rounds "
        f"(current={current_round}): {stale} — rotate these into "
        f"DRIVER_WINDOW"
    )


def _compute_stale_evidence(extra_round=None, return_latest=False):
    """Shared staleness arithmetic for the invariant tests.

    Returns ``(stale, MAX_STALENESS, current_round)`` where ``stale``
    maps each over-deadline oracle-backed query to its newest green
    round. A query named in ``RESERVED_NEXT_WINDOW`` is tolerated for
    EXACTLY ONE round past the bound: when the driver drops round N's
    CORRECTNESS file, current_round becomes N+1 but the round-N window
    was frozen before the file existed — rotation is only possible as
    round N+1's first commit, so the reserve keeps the closed round-N
    HEAD green. One round is all it buys: if round N+1's rotation
    skips a reserved row, the next CORRECTNESS drop pushes it past
    bound+1 and the alarm trips (test_reserved_rows_trip_if_skipped).

    ``extra_round`` simulates a future CORRECTNESS drop: a pair
    ``(round_no, green_names)`` treated as one more driver file.
    ``return_latest=True`` additionally returns the newest-green-round
    map computed from the on-disk files (pre-simulation), so callers
    can anchor simulations on a row's own evidence age.
    """
    import glob
    import json
    import math
    import re

    sys.path.insert(0, REPO)
    from etl_global_mobility_spark.corpus import (
        DRIVER_WINDOW,
        RESERVED_NEXT_WINDOW,
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
    on_disk_latest = dict(latest)
    if extra_round is not None:
        rn, names = extra_round
        rounds.append(rn)
        for name in names:
            latest[name] = max(latest.get(name, 0), rn)
    current_round = max(rounds) + 1  # the round this window targets
    if extra_round is None:
        # the on-disk window targets the real current round; a
        # simulated future drop must NOT credit it forward
        for name in DRIVER_WINDOW:
            latest[name] = current_round

    specs = all_queries()
    oracle_backed = {n for n, s in specs.items() if s.oracle is not None}
    stale = {}
    for n in oracle_backed - SCHEDULED_NEXT_WINDOW:
        age = current_round - latest.get(n, -10**6)
        bound = MAX_STALENESS + (1 if n in RESERVED_NEXT_WINDOW else 0)
        if age > bound:
            stale[n] = latest.get(n)
    if return_latest:
        return stale, MAX_STALENESS, current_round, on_disk_latest
    return stale, MAX_STALENESS, current_round


def test_reserved_rows_trip_if_skipped():
    """RESERVED_NEXT_WINDOW is a one-round grace, not an exemption.
    A reserved row with newest green round L and staleness bound B
    sits at exactly B+1 once the driver drop for round L+B lands —
    tolerated, by design (the grace covering the closed round's HEAD
    and the round-open gap before rotation). If the rotation then
    SKIPS it, the drop for round L+B+1 pushes it to B+2 and the alarm
    must name it.

    Anchor each simulation on the row's OWN evidence age (L+B /
    L+B+1), NOT on max(CORRECTNESS files)+k: the artifact-count
    anchor goes stale the moment the driver's file for the current
    round lands on disk (the round-10 and round-11 failure class —
    each drop shifted the simulated grace round forward while the
    row's real deadline stayed put)."""
    sys.path.insert(0, REPO)
    from etl_global_mobility_spark.corpus import (
        DRIVER_WINDOW,
        RESERVED_NEXT_WINDOW,
    )

    if not RESERVED_NEXT_WINDOW:
        return  # nothing reserved this round; nothing to prove
    assert not set(RESERVED_NEXT_WINDOW) & set(DRIVER_WINDOW), (
        "reserved rows are by definition NOT in the current window"
    )
    _, bound, _, latest = _compute_stale_evidence(return_latest=True)
    for name in RESERVED_NEXT_WINDOW:
        assert name in latest, (
            f"reserved row {name} has no green driver row at all — "
            f"the reserve mechanism only defers a STALENESS deadline"
        )
        # grace round: the row at bound+1 must be tolerated (a drop
        # that greens only the current window, which excludes it)...
        grace_drop = (latest[name] + bound, list(DRIVER_WINDOW))
        stale, _, _ = _compute_stale_evidence(extra_round=grace_drop)
        assert name not in stale, (
            f"reserved row {name} tripped DURING its grace round — "
            f"the closed round's HEAD would be red"
        )
        # ...but one more drop without rotation must trip it
        skip_drop = (latest[name] + bound + 1, list(DRIVER_WINDOW))
        stale, _, _ = _compute_stale_evidence(extra_round=skip_drop)
        assert name in stale, (
            f"reserved row {name} would NOT trip the staleness alarm "
            f"after a skipped rotation — the grace period is too wide"
        )
