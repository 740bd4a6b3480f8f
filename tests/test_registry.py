"""Driver-contract surface checks (fast; full compare is tools/selfcheck)."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_registry_shape():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 35
    assert set(oracles) <= set(qs)
    # every oracle is non-trivial SQL
    assert all("SELECT" in sql.upper() for sql in oracles.values())


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert df.columns == [
        "o_orderkey",
        "o_orderdate",
        "o_orderstatus",
        "total_price",
        "total_k",
        "partkeys",
        "n_items",
    ]
