"""Local mirror of the driver's correctness gate: every queries() entry
with an oracle runs on Spark AND DuckDB at sf0.001 and must match on
row count, column names, and order-insensitive values."""

from __future__ import annotations

import datetime
import math
from decimal import Decimal

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return v


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


@pytest.fixture(scope="module")
def contract():
    return entrymod.queries(), entrymod.oracle_sql()


def _spark_rows(df):
    cols = sorted(df.columns)
    return cols, sorted(
        tuple(_norm(r[c]) for c in cols) for r in df.collect()
    )


def _duck_rows(con, sql):
    res = con.execute(sql)
    names = [d[0] for d in res.description]
    rows = res.fetchall()
    order = sorted(range(len(names)), key=lambda i: names[i])
    cols = [names[i] for i in order]
    return cols, sorted(tuple(_norm(row[i]) for i in order) for row in rows)


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql().keys()))
def test_query_matches_oracle(spark, duck, contract, name):
    queries, oracles = contract
    s_cols, s_rows = _spark_rows(queries[name](spark, SF_DIR))
    d_cols, d_rows = _duck_rows(duck, oracles[name])
    assert s_cols == d_cols, f"{name}: columns {s_cols} != {d_cols}"
    assert len(s_rows) == len(d_rows), f"{name}: {len(s_rows)} rows != {len(d_rows)}"
    mism = [(a, b) for a, b in zip(s_rows, d_rows) if a != b]
    assert not mism, f"{name}: first mismatch {mism[0]}"
    assert len(s_rows) > 0, f"{name}: empty result"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


@pytest.mark.parametrize("name", sorted(set(entrymod.queries()) - set(entrymod.oracle_sql())))
def test_rows_only_queries_run(spark, name):
    df = entrymod.queries()[name](spark, SF_DIR)
    assert df.count() > 0
