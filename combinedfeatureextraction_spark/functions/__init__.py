from combinedfeatureextraction_spark.functions import arrays, nansafe, text  # noqa: F401
