from combinedfeatureextraction_spark.multimodal import binary  # noqa: F401
