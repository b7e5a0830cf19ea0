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
