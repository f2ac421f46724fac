"""Every registered query must match its DuckDB oracle (the driver's
correctness gate, replicated locally at sf0.001 for speed — the driver runs
the same comparison at sf0.01)."""

import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)


@pytest.mark.slowtier  # ~9 min full-registry replay; `pytest -m slowtier`
def test_all_queries_match_oracle(spark, sf_dir):
    from check_oracle import run_checks

    results = run_checks(sf_dir=sf_dir, spark=spark, verbose=False)
    failures = [
        f"{name}: {status} {detail}"
        for name, status, _, detail in results
        if status not in ("OK", "ROWS_ONLY")
    ]
    assert not failures, "\n".join(failures)
    n_ok = sum(1 for r in results if r[1] == "OK")
    assert n_ok >= 50  # guard against silently shrinking oracle coverage


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"outcome", "cnt", "avg_quality", "total_tokens"} <= set(df.columns)
    kept = [r for r in rows if r.outcome.startswith("kept:")]
    assert kept, "flagship pipeline kept no documents"
