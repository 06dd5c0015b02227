"""Local mirror of the driver's correctness gate: every queries() entry
with an oracle runs on Spark AND DuckDB at sf0.001 and must match on
row count, column names, dtypes, and EXACT values.

Round-1 lesson: the driver canonicalizes both results as pandas frames
(sorted columns, sorted rows) and hashes the values — so (a) int128
(DuckDB HUGEINT) vs int64 is a hash mismatch even when values are
equal, and (b) array-typed columns make the pandas sort blow up with
`unhashable type: 'list'`. This mirror therefore compares pandas
dtypes and exact values (no rounding) and runs the same sort-based
canonicalization on rows-only queries too.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    """The driver's canonicalization: sorted columns, then row sort over
    all columns (this is where unhashable array cells explode)."""
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            # tz/unit normalize: Spark emits datetime64[us]/[ns],
            # DuckDB datetime64[us]; value equality is what matters
            pdf[c] = pd.to_datetime(pdf[c]).dt.tz_localize(None).astype("datetime64[ns]")
    pdf = pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(drop=True)
    return pdf


def _dtype_tag(dtype) -> str:
    if pd.api.types.is_integer_dtype(dtype):
        return "int"
    if pd.api.types.is_float_dtype(dtype):
        return "float"
    if pd.api.types.is_bool_dtype(dtype):
        return "bool"
    if pd.api.types.is_datetime64_any_dtype(dtype):
        return "ts"
    return str(dtype)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


@pytest.fixture(scope="module")
def contract():
    return entrymod.queries(), entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql().keys()))
def test_query_matches_oracle(spark, duck, contract, name):
    queries, oracles = contract
    s_pdf = _canon(queries[name](spark, SF_DIR).toPandas())
    d_pdf = _canon(duck.execute(oracles[name]).fetchdf())
    assert list(s_pdf.columns) == list(d_pdf.columns), (
        f"{name}: columns {list(s_pdf.columns)} != {list(d_pdf.columns)}"
    )
    assert len(s_pdf) == len(d_pdf), f"{name}: {len(s_pdf)} rows != {len(d_pdf)}"
    assert len(s_pdf) > 0, f"{name}: empty result"
    s_tags = [_dtype_tag(t) for t in s_pdf.dtypes]
    d_tags = [_dtype_tag(t) for t in d_pdf.dtypes]
    assert s_tags == d_tags, (
        f"{name}: dtype mismatch {list(zip(s_pdf.columns, s_tags, d_tags))} "
        "(an `object` on the DuckDB side usually means HUGEINT/DECIMAL — "
        "CAST the oracle SQL)"
    )
    for c in s_pdf.columns:
        a, b = s_pdf[c].to_numpy(), d_pdf[c].to_numpy()
        if pd.api.types.is_float_dtype(s_pdf[c]):
            eq = (a == b) | (np.isnan(a.astype(float)) & np.isnan(b.astype(float)))
            bad = np.flatnonzero(~eq)
        else:
            bad = np.flatnonzero(~(pd.Series(a).eq(pd.Series(b)) | (pd.isna(a) & pd.isna(b))))
        assert bad.size == 0, (
            f"{name}.{c}: {bad.size} exact-value mismatches, first at row "
            f"{bad[0]}: spark={a[bad[0]]!r} oracle={b[bad[0]]!r}"
        )


def test_r05_rotation_window():
    """The driver grades the first 50 queries() entries. Round 5 rotates
    the window to the 34 queries that never earned a CORRECTNESS row in
    rounds 1-4 plus 16 re-checks (see _R05_FIRST) — assert the dict
    order actually leads with them, that every one is oracle-paired
    (full check, not rows-only), and that after this window EVERY
    contract query has a driver row from some round."""
    names = list(entrymod.queries().keys())
    assert names[:50] == list(entrymod._R05_FIRST)
    sqls = entrymod.oracle_sql()
    unpaired = [n for n in names[:50] if n not in sqls]
    assert not unpaired, f"rotation window has rows-only queries: {unpaired}"
    import glob
    import json
    from pathlib import Path

    checked = set(names[:50])
    for f in glob.glob(str(Path(__file__).resolve().parent.parent / "CORRECTNESS_r0*.json")):
        checked |= set(json.load(open(f)))
    never = set(sqls) - checked
    assert not never, f"queries with no driver row even after r05: {never}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


@pytest.mark.parametrize("name", sorted(set(entrymod.queries()) - set(entrymod.oracle_sql())))
def test_rows_only_queries_canonicalize(spark, name):
    """Rows-only queries still pass through the driver's pandas
    canonicalization — run it so unhashable cell types fail HERE."""
    pdf = _canon(entrymod.queries()[name](spark, SF_DIR).toPandas())
    assert len(pdf) > 0
