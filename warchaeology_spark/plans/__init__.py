from warchaeology_spark.plans.ranks import global_sequence  # noqa: F401
