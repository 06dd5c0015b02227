from gepris_spark.sources import corpus, ids  # noqa: F401
