"""Full oracle-parity sweep at an arbitrary scale factor.

Mirrors the driver's correctness gate (and tests/test_contract_oracle.py,
which pins sf0.001): every ``__spark_entry__.queries()`` entry with an
``oracle_sql()`` string runs on Spark AND DuckDB over the same parquet
tables and is compared after the driver's canonicalization (sorted
columns, mergesort row sort, datetime unit normalization) on row count,
column names, dtype classes, and exact values.

The driver grades at sf0.01 while local tests pin sf0.001 — run this
before shipping to close that gap::

    python tools/oracle_parity.py --sf-dir /root/testdata/sf0.01
    python tools/oracle_parity.py --sf-dir /root/testdata/sf0.01 --only dedup_exact,vocab_topk
"""

from __future__ import annotations

import argparse
import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

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


def compare(name: str, s_pdf: pd.DataFrame, d_pdf: pd.DataFrame) -> list[str]:
    errs: list[str] = []
    s_pdf, d_pdf = _canon(s_pdf), _canon(d_pdf)
    if list(s_pdf.columns) != list(d_pdf.columns):
        return [f"columns {list(s_pdf.columns)} != {list(d_pdf.columns)}"]
    if len(s_pdf) != len(d_pdf):
        return [f"rows {len(s_pdf)} != {len(d_pdf)}"]
    if len(s_pdf) == 0:
        return ["empty result"]
    s_tags = [_dtype_tag(t) for t in s_pdf.dtypes]
    d_tags = [_dtype_tag(t) for t in d_pdf.dtypes]
    if s_tags != d_tags:
        return [f"dtypes {s_tags} != {d_tags}"]
    for c in s_pdf.columns:
        s, d = s_pdf[c], d_pdf[c]
        if pd.api.types.is_float_dtype(s.dtype):
            ok = np.allclose(
                s.to_numpy(dtype=float), d.to_numpy(dtype=float),
                rtol=0, atol=0, equal_nan=True,
            )
        else:
            ok = s.equals(d)
        if not ok:
            neq = (s != d) & ~(s.isna() & d.isna())
            idx = np.flatnonzero(neq.to_numpy())[:3]
            sample = [(int(i), s.iloc[i], d.iloc[i]) for i in idx]
            errs.append(f"col {c}: values differ, first diffs {sample}")
    return errs


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--only", default="", help="comma-separated query names")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from gepris_spark import cacheutil
    from gepris_spark.session import get_spark

    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    names = sorted(oracles.keys())
    if args.only:
        keep = set(args.only.split(","))
        names = [n for n in names if n in keep]

    duck = duckdb.connect()
    for t in TABLES:
        duck.execute(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'")

    spark = get_spark(
        "oracle-parity", master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )

    failed: list[str] = []
    for i, name in enumerate(names, 1):
        t0 = time.time()
        try:
            s_pdf = queries[name](spark, args.sf_dir).toPandas()
            d_pdf = duck.execute(oracles[name]).fetchdf()
            errs = compare(name, s_pdf, d_pdf)
        except Exception:
            errs = [traceback.format_exc(limit=3)]
        finally:
            cacheutil.release_caches()
            spark.catalog.clearCache()
        dt = time.time() - t0
        status = "OK " if not errs else "FAIL"
        print(f"[{i:3}/{len(names)}] {status} {name} ({dt:.1f}s)", flush=True)
        for e in errs:
            print(f"        {e}", flush=True)
        if errs:
            failed.append(name)

    spark.stop()
    print(f"\n{len(names) - len(failed)}/{len(names)} parity OK at {args.sf_dir}")
    if failed:
        print("FAILED:", ", ".join(failed))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
