from combinedfeatureextraction_spark.streaming import sessions  # noqa: F401
