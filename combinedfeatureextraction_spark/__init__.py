"""combinedfeatureextraction_spark — a PySpark-native point-in-time /
windowed feature-engineering engine.

Re-expresses the query/data-processing capabilities of
SarderLab/CombinedFeatureExtraction (a single-node histopathology
morphometrics toolkit, see /root/reference) as idiomatic, cluster-scale
PySpark: DataFrame/Window/applyInPandas operators over tables of
pre-tokenized training sequences ``(doc_id, tokens, n_tok, source, ts)``.

Design rules (SURVEY.md §7):
 - DataFrame + Window + Arrow-vectorized pandas UDFs; zero per-row Python.
 - Explicit StructType everywhere; no inferred schemas.
 - Catalyst does the optimizing — operators are declarative compositions.
 - Skew (Zipf doc_id / source keys) handled by salting + AQE.
 - Resumable runs via snapshot/manifest checkpoints (plans.manifest).
"""

__version__ = "0.1.0"

from combinedfeatureextraction_spark.session import get_spark  # noqa: F401
