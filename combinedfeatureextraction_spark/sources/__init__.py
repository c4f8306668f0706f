from combinedfeatureextraction_spark.sources import catalog, fixtures  # noqa: F401
