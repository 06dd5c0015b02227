"""Driver contract for the spark-graft builder (PySpark target).

`queries()` exposes the engine's operator surface over the driver's
testdata tables:

* SURVEY §2.9 relational operators (gepris_spark/plans/relational.py)
* training-data pipeline operators (gepris_spark/plans/datapipe.py,
  plans/imagepipe.py)
* engine-native operators with no SQL form over the testdata tables
  (crawl replay, entity ETL, multimodal plumbing) — oracled through
  committed truth fixtures instead (plans/contract_truth.py), so every
  query gets the driver's full rows+schema+hash check.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the pricing-summary
    aggregation (SURVEY §2.8 G1 writ large)."""
    from gepris_spark.plans.relational import q_pricing_summary

    return q_pricing_summary(spark, "/root/testdata/sf0.001")


def _oracle_checked() -> dict[str, tuple]:
    from gepris_spark.plans.batchprep import BATCHPREP_QUERIES
    from gepris_spark.plans.contract_extra import CONTRACT_EXTRA_QUERIES
    from gepris_spark.plans.contract_truth import TRUTH_QUERIES
    from gepris_spark.plans.datapipe import DATAPIPE_QUERIES
    from gepris_spark.plans.imagepipe import IMAGEPIPE_QUERIES
    from gepris_spark.plans.relational import RELATIONAL_QUERIES
    from gepris_spark.plans.storagepipe import STORAGEPIPE_QUERIES
    from gepris_spark.plans.trainprep import TRAINPREP_QUERIES
    from gepris_spark.plans.websignals import WEBSIGNALS_QUERIES

    return {
        **RELATIONAL_QUERIES,
        **DATAPIPE_QUERIES,
        **IMAGEPIPE_QUERIES,
        **CONTRACT_EXTRA_QUERIES,
        **TRUTH_QUERIES,
        **TRAINPREP_QUERIES,
        **BATCHPREP_QUERIES,
        **WEBSIGNALS_QUERIES,
        **STORAGEPIPE_QUERIES,
    }


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from gepris_spark.plans.multimodal_contract import MULTIMODAL_QUERIES

    out: dict[str, Callable] = {name: fn for name, (fn, _sql) in _oracle_checked().items()}
    out.update(MULTIMODAL_QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in _oracle_checked().items() if sql is not None}
