from gepris_spark.store.table import SnapshotStore, merge_upsert  # noqa: F401
