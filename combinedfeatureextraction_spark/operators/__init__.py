from combinedfeatureextraction_spark.operators import (  # noqa: F401
    aggregates,
    asof,
    dedup,
    fill,
    fixpoint,
    joins,
    priority,
    sessionize,
    similarity,
    threshold,
    window_features,
)
