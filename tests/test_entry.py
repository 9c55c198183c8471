"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB over the same sf0.01 parquet, then compares row count, schema
(column names) and order-insensitive values — the same contract the
driver records in CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    return v


def _rows(colnames, rows):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


ALL = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", ALL)
def test_gate_query(spark, duck, name):
    q = entry_mod.queries()[name]
    oracles = entry_mod.oracle_sql()
    sdf = q(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]
    if name not in oracles:
        pytest.skip(f"{name}: rows-only check (no SQL oracle)")
    res = duck.execute(oracles[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    assert sorted(spark_cols) == sorted(duck_cols), \
        f"schema mismatch: {spark_cols} vs {duck_cols}"
    assert len(spark_rows) == len(duck_rows), \
        f"row count: spark={len(spark_rows)} duck={len(duck_rows)}"
    got = _rows(spark_cols, spark_rows)
    exp = _rows(duck_cols, duck_rows)
    assert got == exp, f"value mismatch\nspark: {got[:5]}\nduck:  {exp[:5]}"
    assert len(duck_rows) > 0 or name in NONEMPTY_EXEMPT, \
        f"{name}: oracle returned 0 rows — gate is vacuous"


NONEMPTY_EXEMPT: set[str] = set()


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.schema is not None
