"""Streaming sessionization (native session_window + watermark) must
equal the batch lag+cumsum contract query — and the semantic boundary
the two formulations disagree on (a gap of exactly 30 minutes) must
not exist in the test corpus."""

from __future__ import annotations

import duckdb
import pandas as pd

from gepris_spark.plans.trainprep import q_events_sessionize
from gepris_spark.streaming.sessionstream import run_sessionize_stream

SF = "/root/testdata/sf0.001"


def _events_pdf(spark):
    return (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("event_id", "ts", "user_id", "value")
        .toPandas()
    )


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.copy()
    for c in ("session_start", "session_end"):
        pdf[c] = pd.to_datetime(pdf[c]).dt.tz_localize(None).astype("datetime64[ns]")
    return pdf.sort_values(["user_id", "session_seq"]).reset_index(drop=True)


def test_no_exact_gap_boundary_collisions():
    """session_window splits on gap >= 30 min, the batch query on
    gap > 30 min; equality relies on no gap being EXACTLY 30 min."""
    con = duckdb.connect()
    for sf in ("0.001", "0.01", "0.1"):
        n = con.execute(
            f"""
            SELECT count(*) FROM (
              SELECT date_diff('microsecond',
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) AS g
              FROM '/root/testdata/sf{sf}/events.parquet') WHERE g = 1800000000
            """
        ).fetchone()[0]
        assert n == 0, f"sf{sf} has {n} exact-30min gaps"


def test_stream_equals_batch(spark):
    batch = _canon(q_events_sessionize(spark, SF).toPandas())
    stream = _canon(run_sessionize_stream(spark, _events_pdf(spark)).toPandas())
    pd.testing.assert_frame_equal(stream, batch)


def test_rerun_replaces_memory_sink(spark):
    """bench runs every contract query twice (cold + warm): restarting
    the stream under the SAME memory-sink name must replace the table,
    never append to it (doubled rows would silently pass rows>0
    checks but fail the oracle)."""
    pdf = _events_pdf(spark)
    a = _canon(run_sessionize_stream(spark, pdf, query_name="sess_rerun").toPandas())
    b = _canon(run_sessionize_stream(spark, pdf, query_name="sess_rerun").toPandas())
    pd.testing.assert_frame_equal(a, b)


def test_stream_invariant_to_arrival_cut(spark):
    """The session set must not depend on how the log is chopped into
    micro-batch files (1 file = everything in one batch; 5 files =
    sessions spanning batch boundaries merge in the state store)."""
    pdf = _events_pdf(spark)
    one = _canon(run_sessionize_stream(spark, pdf, query_name="sess_cut1", n_files=1).toPandas())
    five = _canon(run_sessionize_stream(spark, pdf, query_name="sess_cut5", n_files=5).toPandas())
    pd.testing.assert_frame_equal(one, five)
    batch = _canon(q_events_sessionize(spark, SF).toPandas())
    pd.testing.assert_frame_equal(five, batch)
