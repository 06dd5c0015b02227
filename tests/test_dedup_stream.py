"""Streaming at-least-once dedup: the planted duplicate deliveries
must be invisible in the rollup, would corrupt it if admitted, and
the dedup must work across micro-batch boundaries (state store), not
just within a batch."""

from __future__ import annotations

import duckdb
import pandas as pd

from gepris_spark.plans.trainprep import SQL_EVENTS_DEDUP_STREAM
from gepris_spark.streaming.dedupstream import (
    _DUP_MOD,
    run_dedup_stream,
    write_arrival_files_with_dups,
)

SF = "/root/testdata/sf0.001"


def _events_pdf(spark):
    return (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("event_id", "ts", "user_id", "event_type", "value")
        .toPandas()
    )


def _oracle() -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    return con.execute(SQL_EVENTS_DEDUP_STREAM).fetchdf()


def test_stream_rollup_equals_original_table(spark):
    got = run_dedup_stream(spark, _events_pdf(spark), query_name="dds_base").toPandas()
    want = _oracle()
    pd.testing.assert_frame_equal(
        got.sort_values("event_type").reset_index(drop=True),
        want.sort_values("event_type").reset_index(drop=True),
        check_dtype=False,
    )


def test_duplicates_are_really_planted_and_cross_batch(spark):
    """Without dedup the feed has more rows than the table, and at
    least one duplicate pair straddles two arrival files — so passing
    the oracle requires state-store dedup, not within-batch distinct."""
    import glob
    import tempfile

    import pyarrow.parquet as pq

    pdf = _events_pdf(spark)
    root = tempfile.mkdtemp(prefix="gepris_ddsplant_")
    src = write_arrival_files_with_dups(pdf, root, n_files=3)
    files = sorted(glob.glob(f"{src}/*.parquet"))
    per_file = [pq.read_table(f).to_pandas() for f in files]
    total = sum(len(c) for c in per_file)
    n_dupable = (pdf["event_id"] % _DUP_MOD == 0).sum()
    assert total == len(pdf) + n_dupable and n_dupable > 0
    first_ids = set(per_file[0]["event_id"])
    second_ids = list(per_file[1]["event_id"])
    assert any(i in first_ids for i in second_ids), "no cross-file duplicate"


def test_cut_invariance_and_rerun(spark):
    pdf = _events_pdf(spark)
    a = run_dedup_stream(spark, pdf, query_name="dds_c2", n_files=2).toPandas()
    b = run_dedup_stream(spark, pdf, query_name="dds_c2", n_files=2).toPandas()
    c = run_dedup_stream(spark, pdf, query_name="dds_c5", n_files=5).toPandas()
    pd.testing.assert_frame_equal(a, b)
    pd.testing.assert_frame_equal(a, c)


def test_chained_dedup_sessionize_equals_batch_any_cut(spark):
    """Two stateful operators in one query (dedup -> session_window)
    must reproduce the batch sessionizer for any arrival cut."""
    from gepris_spark.plans.trainprep import q_events_sessionize
    from gepris_spark.streaming.dedupstream import run_sessionize_dedup_stream

    def canon(pdf):
        for c in ("session_start", "session_end"):
            pdf[c] = pd.to_datetime(pdf[c]).dt.tz_localize(None).astype("datetime64[ns]")
        return pdf.sort_values(["user_id", "session_seq"]).reset_index(drop=True)

    batch = canon(q_events_sessionize(spark, SF).toPandas())
    pdf = _events_pdf(spark)
    for n_files in (2, 4):
        got = canon(
            run_sessionize_dedup_stream(
                spark, pdf, query_name=f"dsess_cut{n_files}", n_files=n_files
            ).toPandas()
        )
        pd.testing.assert_frame_equal(got, batch)
