"""Mimics the driver's correctness gate: run every __spark_entry__
queries() entry on Spark at sf0.01 and its oracle_sql() in DuckDB over
the same parquet views; compare row count, column names, and
order-insensitive values."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"create view {t} as select * from read_parquet('{p}')")
    return con


def _norm(rows):
    out = []
    for row in rows:
        vals = []
        for v in row:
            if isinstance(v, float):
                vals.append(round(v, 6))
            else:
                vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda r: tuple(str(x) for x in r))


ORACLE = entrymod.oracle_sql()
QUERIES = entrymod.queries()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and df.columns


def test_every_oracle_key_has_query():
    assert set(ORACLE) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_vs_oracle(name, spark, duck):
    sdf = QUERIES[name](spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    scols = [c.lower() for c in sdf.columns]
    ores = duck.execute(ORACLE[name])
    ocols = [d[0].lower() for d in ores.description]
    orows = ores.fetchall()
    assert scols == ocols, f"{name}: columns {scols} != {ocols}"
    assert len(srows) == len(orows), (
        f"{name}: rowcount {len(srows)} != {len(orows)}")
    sn, on = _norm(srows), _norm(orows)
    mism = [(a, b) for a, b in zip(sn, on) if a != b][:5]
    assert sn == on, f"{name}: value mismatch, first diffs: {mism}"


def test_every_query_has_an_oracle():
    """Round 3 closed the last no-oracle entries (the two ANN top-k
    queries): the driver-contract surface is fully DuckDB-checkable.
    Keep it that way — a new rows-only entry must be a deliberate,
    documented exception, not an accident."""
    assert sorted(set(QUERIES) - set(ORACLE)) == []
