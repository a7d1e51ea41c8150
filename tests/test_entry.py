"""Driver-contract smoke tests for __spark_entry__.py."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["wordid", "token", "total_count"]
    # wordid 0 is the most frequent token; totals positive
    assert rows[0]["wordid"] == 0
    assert all(r["total_count"] > 0 for r in rows)


def test_contract_shapes(spark):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 40
    assert set(oracles) <= set(qs)
    # most queries must be oracle-checkable (strong gate)
    assert len(oracles) >= len(qs) - 5
