"""Driver-gate simulation: run EVERY contract query on Spark and its
oracle SQL on DuckDB at the driver's compare scale (sf0.01 by
default) and report rows/columns/dtype-family/value equality per
query — the same canonicalization as tests/test_contract_oracle.py,
at the scale the driver actually grades.

Usage: python tools/parity_sweep.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pd.to_datetime(pdf[c]).dt.tz_localize(None).astype("datetime64[ns]")
    return pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(drop=True)


def _tag(dtype) -> str:
    for name, check in (
        ("int", pd.api.types.is_integer_dtype),
        ("float", pd.api.types.is_float_dtype),
        ("bool", pd.api.types.is_bool_dtype),
        ("ts", pd.api.types.is_datetime64_any_dtype),
    ):
        if check(dtype):
            return name
    return str(dtype)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as entrymod
    from gepris_spark.session import get_spark

    spark = get_spark("parity-sweep", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    bad = []
    for name in sorted(oracles):
        try:
            s = _canon(queries[name](spark, sf_dir).toPandas())
            d = _canon(con.execute(oracles[name]).fetchdf())
            ok = (
                list(s.columns) == list(d.columns)
                and len(s) == len(d)
                and len(s) > 0
                and [_tag(t) for t in s.dtypes] == [_tag(t) for t in d.dtypes]
                and s.astype("object").equals(d.astype("object"))
            )
        except Exception as ex:  # noqa: BLE001 — report, keep sweeping
            ok, s = False, None
            print(f"{name}: ERROR {type(ex).__name__}: {str(ex)[:200]}", flush=True)
        if not ok:
            bad.append(name)
        print(f"{name}: {'OK' if ok else 'MISMATCH'}", flush=True)
        spark.catalog.clearCache()
    print(f"\n{len(oracles) - len(bad)}/{len(oracles)} parity-green at {sf_dir}")
    if bad:
        print("mismatches:", bad)
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
