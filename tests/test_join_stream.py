"""Stream-stream interval join must equal the batch binned range join
for ANY arrival-file cut, restart cleanly under the same sink name,
and actually plan as a watermarked StreamingSymmetricHashJoin."""

from __future__ import annotations

import pandas as pd

from gepris_spark.plans.trainprep import q_events_range_join
from gepris_spark.streaming.joinstream import run_range_join_stream

SF = "/root/testdata/sf0.001"


def _events_pdf(spark):
    return (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("event_id", "ts", "user_id", "event_type", "value")
        .toPandas()
    )


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    return pdf.sort_values(["window_id", "user_id"]).reset_index(drop=True)


def test_stream_equals_batch_any_cut(spark):
    batch = _canon(q_events_range_join(spark, SF).toPandas())
    pdf = _events_pdf(spark)
    for n_files in (1, 5):
        stream = _canon(
            run_range_join_stream(
                spark, pdf, query_name=f"rjs_cut{n_files}", n_files=n_files
            ).toPandas()
        )
        pd.testing.assert_frame_equal(stream, batch)


def test_outer_stream_equals_batch_left_join_any_cut(spark, duckdb_events=None):
    """LEFT-OUTER variant: every view appears exactly once-per-group —
    matched groups equal the inner rollup, unmatched views surface as
    0/0/-1 rows via watermark state-expiry emission — for ANY arrival
    cut."""
    import duckdb

    from gepris_spark.plans.trainprep import SQL_EVENTS_RANGE_JOIN_OUTER
    from gepris_spark.streaming.joinstream import run_range_join_outer_stream

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    want = _canon(con.execute(SQL_EVENTS_RANGE_JOIN_OUTER).fetchdf())
    inner = _canon(q_events_range_join(spark, SF).toPandas())
    pdf = _events_pdf(spark)
    for n_files in (1, 4):
        got = _canon(
            run_range_join_outer_stream(
                spark, pdf, query_name=f"rjo_cut{n_files}", n_files=n_files
            ).toPandas()
        )
        assert list(got["window_id"]) == list(want["window_id"])
        assert list(got["n_attributed"]) == list(want["n_attributed"])
        assert list(got["attributed_value_micro"]) == list(want["attributed_value_micro"])
        assert list(got["latest_event_id"]) == list(want["latest_event_id"])
        # unmatched views exist (the semantics the inner join cannot
        # show) and the matched subset equals the inner rollup
        unmatched = got[got["n_attributed"] == 0]
        assert len(unmatched) > 0
        assert (unmatched["latest_event_id"] == -1).all()
        matched = got[got["n_attributed"] > 0].reset_index(drop=True)
        assert len(matched) == len(inner)
        assert list(matched["attributed_value_micro"]) == list(
            inner["attributed_value_micro"]
        )


def test_enrich_static_stream_any_cut_and_broadcast_plan(spark):
    """STREAM-STATIC join: stateless per-micro-batch enrichment must
    equal the plain batch join for any arrival cut, and the streaming
    plan must broadcast the static dimension (BroadcastHashJoin in the
    pre-start plan — not a shuffle of the unbounded side)."""
    import io
    import tempfile
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    from gepris_spark.streaming import joinstream

    dim = (
        spark.read.parquet(f"{SF}/customer.parquet")
        .select(F.col("c_custkey").alias("user_id"), F.col("c_mktsegment").alias("segment"))
    )
    events = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    batch = (
        events.join(F.broadcast(dim), "user_id")
        .groupBy("segment", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct(F.col("user_id")).alias("n_users"),
            F.sum(F.round(F.col("value") * 1_000_000).cast("long")).alias("value_micro"),
        )
        .orderBy("segment", "event_type")
        .toPandas()
    )
    for n_files in (1, 4):
        got = joinstream.run_enrich_static_stream(
            spark, events, dim, query_name=f"ens_cut{n_files}", n_files=n_files
        ).toPandas()
        pd.testing.assert_frame_equal(got, batch)

    root = tempfile.mkdtemp(prefix="gepris_ensplan_")
    src = joinstream.write_arrival_files(_events_pdf(spark), root, n_files=2)
    stream = (
        spark.readStream.schema(joinstream._ARRIVAL_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        joinstream.enriched_static_stream(stream, dim).explain()
    assert "BroadcastHashJoin" in buf.getvalue()


def test_rerun_replaces_memory_sink(spark):
    pdf = _events_pdf(spark)
    a = _canon(run_range_join_stream(spark, pdf, query_name="rjs_rerun").toPandas())
    b = _canon(run_range_join_stream(spark, pdf, query_name="rjs_rerun").toPandas())
    pd.testing.assert_frame_equal(a, b)


def test_plan_is_watermarked_symmetric_hash_join(spark):
    """The streaming plan must be the native stateful join operator
    with watermarks on both sides — not a snapshot join that would
    miss cross-batch matches."""
    import io
    import tempfile
    from contextlib import redirect_stdout

    from gepris_spark.streaming import joinstream

    root = tempfile.mkdtemp(prefix="gepris_jsplan_")
    src = joinstream.write_arrival_files(_events_pdf(spark), root, n_files=2)
    from pyspark.sql import functions as F

    def feed():
        return spark.readStream.schema(joinstream._ARRIVAL_SCHEMA).parquet(src)

    views = (
        feed()
        .where(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("window_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", joinstream._WATERMARK)
    )
    probes = (
        feed()
        .where(F.col("event_type").isin("click", "purchase"))
        .select("event_id", "user_id", F.col("ts").alias("e_ts"), "value")
        .withWatermark("e_ts", joinstream._WATERMARK)
    )
    joined = joinstream.joined_pairs_stream(views, probes)
    buf = io.StringIO()
    with redirect_stdout(buf):
        joined.explain(True)
    plan = buf.getvalue()
    assert "StreamingSymmetricHashJoin" in plan or "streaming-symmetric-hash-join" in plan.lower()
    assert plan.count("EventTimeWatermark") >= 2
