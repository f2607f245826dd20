from warchaeology_spark.streaming.incremental import incremental_validate  # noqa: F401
