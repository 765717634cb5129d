"""Smoke tests for the driver contract module."""

from __future__ import annotations

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "__spark_entry__",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__spark_entry__.py"),
)
_entry_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_entry_mod)


def test_entry_returns_rows(spark):
    df = _entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_queries_and_oracles_consistent():
    q = _entry_mod.queries()
    o = _entry_mod.oracle_sql()
    assert len(q) >= 50
    # every oracle key must have a query
    assert set(o).issubset(set(q))


def test_all_queries_run_on_smoke_sf(spark):
    q = _entry_mod.queries()
    for name, fn in q.items():
        df = fn(spark, "/root/testdata/sf0.001")
        assert df.columns, name
