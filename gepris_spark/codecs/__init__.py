from gepris_spark.codecs import image, png, qdct  # noqa: F401
