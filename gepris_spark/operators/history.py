"""Append-only item history sink (SURVEY §2.2 K3, §2.7 A5 routing).

Reference: `details_items_history` insert-if-changed
(database.py:100-116) — a new row is appended only when the latest row
for (id, context) differs in (status, item) under null-safe equality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gepris_spark import schemas
from gepris_spark.plans import views
from gepris_spark.store.table import SnapshotStore

TABLE = "history"


class History:
    def __init__(self, spark: SparkSession, store: SnapshotStore):
        self.spark = spark
        self.store = store

    def read(self) -> DataFrame:
        df = self.store.read_appends(self.spark, TABLE, schemas.HISTORY)
        return df.select(*schemas.HISTORY.fieldNames())

    def insert_batch(self, batch: DataFrame, runs: DataFrame, run_id: int) -> int:
        """K3 — append rows of (id, context, item, status) for run_id,
        skipping rows identical (null-safe) to the latest history row.

        Left-anti join against the Q1 latest view with `<=>` on item and
        equality on status (database.py:107-111's NOT EXISTS).
        """
        latest = views.latest_detail_items(self.read(), runs).select(
            "id", "context", F.col("item").alias("_l_item"), F.col("status").alias("_l_status")
        )
        fresh = (
            batch.join(latest, ["id", "context"], "left")
            .where(
                F.col("_l_status").isNull()
                | ~((F.col("status") == F.col("_l_status")) & F.col("item").eqNullSafe(F.col("_l_item")))
            )
            .select(
                F.col("id").cast("long"),
                "context",
                F.lit(run_id).cast("long").alias("created_at"),
                "item",
                "status",
            )
        )
        self.store.append_batch(fresh, TABLE, run_id)
        return run_id


def route_statuses(parsed: DataFrame, max_retries: int = 2) -> dict[str, DataFrame]:
    """A5 — status routing of parse output: success/moved/error rows go
    to history; retry rows re-enter the frontier with attempt+1 until
    the budget is exhausted, then become errors
    (middlewares.py:15-63)."""
    attempts = F.coalesce(F.col("attempt") if "attempt" in parsed.columns else F.lit(0), F.lit(0))
    parsed = parsed.withColumn("_attempt", attempts)
    terminal = parsed.where(
        (F.col("status") != "retry") | (F.col("_attempt") >= max_retries)
    ).withColumn(
        "status", F.when(F.col("status") == "retry", "error").otherwise(F.col("status"))
    )
    retry = parsed.where((F.col("status") == "retry") & (F.col("_attempt") < max_retries)).withColumn(
        "attempt", F.col("_attempt") + 1
    )
    return {"terminal": terminal.drop("_attempt"), "retry": retry.drop("_attempt")}
