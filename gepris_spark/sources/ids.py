"""Id/seed sources (SURVEY §2.1 S1-S6).

The reference resolves `-a ids=...` into an id set
(spiders/details.py:29-51); here each source yields a DataFrame of
(item_id long, context string) so downstream frontier logic is uniform.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_ID_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType(), False),
        T.StructField("context", T.StringType(), False),
    ]
)


def from_inline_list(spark: SparkSession, ids: list[int], context: str) -> DataFrame:
    """S5 — parse an inline id list (details.py:30-32)."""
    return spark.createDataFrame([(int(i), context) for i in dict.fromkeys(ids)], _ID_SCHEMA)


def from_json_file(spark: SparkSession, path: str, context: str) -> DataFrame:
    """S4 — read a `[{"id": ...}, ...]` JSON file (details.py:33-36)."""
    schema = T.StructType([T.StructField("id", T.LongType(), True)])
    return (
        spark.read.schema(schema)
        .option("multiLine", "true")
        .json(path)
        .where(F.col("id").isNotNull())
        .select(F.col("id").alias("item_id"), F.lit(context).alias("context"))
        .dropDuplicates(["item_id"])
    )


def paginate_search(
    spark: SparkSession, total_items: int, items_per_page: int = 1000, context: str = "projekt"
) -> DataFrame:
    """S1 — search pagination: page offsets 0, k, 2k, ... < total
    (search_results.py:28-35). `total_items` comes from the first-page
    probe (`data-result-count`, :69-79) — a driver-side action, mirrored
    here by the caller passing the probed count.
    """
    return (
        spark.range(0, max(total_items, 0), items_per_page)
        .select(
            F.col("id").cast("long").alias("page_index"),
            F.lit(context).alias("context"),
            F.lit(items_per_page).cast("int").alias("items_per_page"),
        )
    )
