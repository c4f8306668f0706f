from combinedfeatureextraction_spark.plans import manifest, pipeline  # noqa: F401
