"""Pipeline smoke tests mirroring the driver's t1 gate."""

from __future__ import annotations

import __spark_entry__ as E
from tests.conftest import SF0001


def test_entry_flagship(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "total_trips" in df.columns and "total_revenue" in df.columns


def test_every_query_runs_on_sf0001(spark):
    for name, fn in E.queries().items():
        df = fn(spark, SF0001)
        assert df.count() >= 0, name


def test_oracle_keys_subset_of_queries():
    qs, osql = E.queries(), E.oracle_sql()
    assert set(osql) <= set(qs)
