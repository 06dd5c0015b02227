from gepris_spark.functions import canonical, textstats  # noqa: F401
