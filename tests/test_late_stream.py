"""Late-data watermark stream (streaming/latestream.py): semantic
invariants beyond the DuckDB parity in tests/test_contract_oracle.py.

The load-bearing test is the per-row RECONSTRUCTION: Spark's effective
late filter is empirical (the watermark reaching the filter lags one
batch behind the one the progress log displays), so this suite
re-derives every row's accept/drop decision in plain pandas under the
documented rule (drop iff window_end <= max(event time over batches
<= k-2) - delay) and demands the sink's per-window counts match
exactly. If a Spark upgrade changes the lag, THIS test is the one
that fails with a readable diff — fix the oracle SQL and the module
docstring together."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest

from gepris_spark.streaming import latestream as LS

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_DIR}/events.parquet")[
        ["event_id", "ts", "user_id", "value"]
    ]


def _expected_counts(events: pd.DataFrame) -> pd.Series:
    """Plain-pandas replay of the documented accept/drop rule."""
    pdf = events.sort_values(["ts", "event_id"], kind="mergesort").reset_index(drop=True)
    n = len(pdf)
    slot = pd.Series(range(n), dtype="int64") * LS._N_FILES // max(n, 1)
    late = pdf["event_id"].map(LS._is_late)
    pdf = pdf.assign(
        f=slot.where(~late, (slot + LS._LATE_SHIFT).clip(upper=LS._N_FILES - 1))
    )
    pdf["we"] = pdf["ts"].dt.floor("h") + pd.Timedelta(hours=1)
    fmax = pdf.groupby("f")["ts"].max()
    keep = pd.Series(True, index=pdf.index)
    for k in sorted(pdf["f"].unique()):
        prior = fmax[fmax.index <= k - 2]
        if len(prior):
            wm = prior.max() - pd.Timedelta(minutes=30)
            sel = pdf["f"] == k
            keep.loc[sel] = pdf.loc[sel, "we"] > wm
    return pdf[keep].groupby(pdf["ts"].dt.floor("h")).size()


def test_stream_counts_equal_reconstructed_rule(spark, events):
    got = (
        LS.run_late_stream(spark, events, query_name="late_recon")
        .toPandas()
        .set_index("window_start")["n_events"]
        .sort_index()
    )
    exp = _expected_counts(events).sort_index()
    assert list(got.index) == list(exp.index)
    assert list(got.values) == list(exp.values)


def test_late_rows_actually_drop(spark, events):
    """The corpus must exercise the semantics: some rows drop (output
    total < input) and some survive as accepted-late (windows spanning
    batches with partial counts exist)."""
    out = LS.run_late_stream(spark, events, query_name="late_drops").toPandas()
    assert out["n_events"].sum() < len(events)
    full = events.groupby(events["ts"].dt.floor("h")).size()
    merged = out.set_index("window_start")["n_events"].to_frame("acc").join(
        full.to_frame("tot")
    )
    partial = merged[(merged["acc"] < merged["tot"]) & (merged["acc"] > 0)]
    assert len(partial) > 0, "no window with BOTH accepted and dropped rows"


def test_rerun_replaces_memory_sink(spark, events):
    a = LS.run_late_stream(spark, events, query_name="late_rerun").toPandas()
    b = LS.run_late_stream(spark, events, query_name="late_rerun").toPandas()
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )


def test_single_file_arrival_drops_nothing(spark, events):
    """With one arrival file nothing is late relative to anything:
    the stream must equal the plain batch windowed count."""
    out = LS.run_late_stream(
        spark, events, query_name="late_single", n_files=1
    ).toPandas()
    full = events.groupby(events["ts"].dt.floor("h")).size()
    assert out["n_events"].sum() == len(events)
    assert len(out) == len(full)


def test_graded_result_invariant_to_filter_lag(spark, events):
    """Round-4 verdict ask #6: the CONTRACT query's graded output must
    be identical whether Spark's late filter consults the k-1 or k-2
    watermark. The oracle carves lag-ambiguous windows out (`amb`
    CTE); replaying it under BOTH lag assumptions must give literally
    identical frames, the carve-out must be non-trivial (windows DO
    flip on this corpus), and the Spark-side ambiguous-window set must
    equal the oracle's."""
    import duckdb

    from gepris_spark.plans.trainprep import _sql_events_late_data

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_DIR}/events.parquet')"
    )
    lag2 = con.execute(_sql_events_late_data(2)).df()
    lag1 = con.execute(_sql_events_late_data(1)).df()
    pd.testing.assert_frame_equal(lag2, lag1)

    carved = con.execute(
        _sql_events_late_data(2).replace(
            "WHERE ws NOT IN (SELECT ws FROM amb)", "WHERE ws IN (SELECT ws FROM amb)"
        )
    ).df()
    assert len(carved) > 0, "no lag-ambiguous window on this corpus — test is vacuous"

    amb_sql = _sql_events_late_data(2).split("acc AS (")[0].rstrip().rstrip(",")
    oracle_amb = sorted(
        con.execute(amb_sql + "\nSELECT ws FROM amb ORDER BY ws").df()["ws"]
    )
    import tempfile

    from gepris_spark.streaming.latestream import (
        lag_ambiguous_windows,
        write_late_arrival_files,
    )

    src = write_late_arrival_files(events, tempfile.mkdtemp(prefix="amb_feed_"))
    spark_amb = sorted(
        r["window_start"]
        for r in lag_ambiguous_windows(spark, src).collect()
    )
    assert spark_amb == oracle_amb


def test_ambiguous_windows_stable_across_evaluations(spark, events):
    """Regression for the round-5 bug the full sweep caught: a first
    cut recomputed the rank-based file assignment and its plan,
    evaluated after the cacheutil scope released the global-rank
    persist, resampled range boundaries against stale offsets —
    parallelism-dependent window sets. The helper now reads the batch
    id back from the materialized arrival files; repeated evaluations
    and re-written feeds must agree exactly."""
    import tempfile

    from gepris_spark.streaming.latestream import (
        lag_ambiguous_windows,
        write_late_arrival_files,
    )

    src1 = write_late_arrival_files(events, tempfile.mkdtemp(prefix="amb_s1_"))
    src2 = write_late_arrival_files(events, tempfile.mkdtemp(prefix="amb_s2_"))
    a = sorted(r["window_start"] for r in lag_ambiguous_windows(spark, src1).collect())
    b = sorted(r["window_start"] for r in lag_ambiguous_windows(spark, src1).collect())
    c = sorted(r["window_start"] for r in lag_ambiguous_windows(spark, src2).collect())
    assert a == b == c and len(a) > 0
