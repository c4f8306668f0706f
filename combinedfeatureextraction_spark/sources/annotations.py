"""Girder-JSON annotation source — the reference's ACTUAL input format
(SURVEY.md S4), parsed declaratively.

Reference: ``gc.get('annotation/item/{id}', parameters={'sort':'updated'})``
returns a JSON array of annotation docs
``[{"annotation": {"name": ..., "elements": [{"points": [[x,y,z], ...],
"user": {...}}, ...]}, "updated": ...}, ...]``
(FeatureExtractor.py:95-100); names are stripped and whitelist-filtered
against the six layer NAMES (:97-100, layer_dict.py), elements are
iterated per layer (:119-124), and elements whose points collapse to <3
distinct vertices are skipped (:126-132, the UnidentifiedImageError /
ValueError guard).

Engine form: explicit schema + ``from_json`` + two ``posexplode``s — one
row per (slide, layer, element) with the raw points array. All filters are
plain Catalyst predicates, so layer whitelists prune before any payload
work. A reference user points this at the same JSON files they feed the
reference today.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# the reference's fixed layer whitelist (FeatureExtractor.py:36)
DEFAULT_NAMES = (
    "non_globally_sclerotic_glomeruli",
    "globally_sclerotic_glomeruli",
    "tubules",
    "muscular_vessels",
    "arterioles",
    "interstitium",
)

ELEMENT_TYPE = T.StructType(
    [
        T.StructField("points", T.ArrayType(T.ArrayType(T.DoubleType()))),
        T.StructField("user", T.MapType(T.StringType(), T.StringType())),
    ]
)

ANNOTATION_DOC_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField(
                "annotation",
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField("elements", T.ArrayType(ELEMENT_TYPE)),
                    ]
                ),
            ),
            T.StructField("updated", T.StringType()),
        ]
    )
)


def read_annotation_files(spark: SparkSession, path: str) -> DataFrame:
    """One whole-text JSON file per slide → (slide_id, raw) rows.
    slide_id = file basename without extension (the reference keys runs by
    slide file name)."""
    raw = spark.read.text(path, wholetext=True).withColumn(
        "slide_id",
        F.regexp_extract(F.input_file_name(), r"([^/]+?)(\.[^./]*)?$", 1),
    )
    return raw.select("slide_id", F.col("value").alias("raw"))


def parse_annotations(
    df: DataFrame,
    raw_col: str = "raw",
    slide_col: str = "slide_id",
    names: Sequence[str] | None = DEFAULT_NAMES,
) -> DataFrame:
    """Raw girder-JSON → one row per (slide, layer, element).

    Output: slide_id, layer_name (stripped), updated, layer_idx (order
    within the document — the 'sort: updated' fetch order), element_idx,
    points (array<array<double>>), user (map). ``names=None`` disables the
    whitelist (F1-F3)."""
    docs = df.select(
        F.col(slide_col).alias("slide_id"),
        F.from_json(F.col(raw_col), ANNOTATION_DOC_TYPE).alias("_docs"),
    )
    layers = docs.select(
        "slide_id", F.posexplode("_docs").alias("layer_idx", "_doc")
    ).select(
        "slide_id",
        "layer_idx",
        F.trim(F.col("_doc.annotation.name")).alias("layer_name"),
        F.col("_doc.updated").alias("updated"),
        F.col("_doc.annotation.elements").alias("_elements"),
    )
    if names is not None:
        layers = layers.filter(F.col("layer_name").isin(*list(names)))
    return layers.select(
        "slide_id",
        "layer_idx",
        "layer_name",
        "updated",
        F.posexplode("_elements").alias("element_idx", "_el"),
    ).select(
        "slide_id",
        "layer_idx",
        "layer_name",
        "updated",
        "element_idx",
        F.col("_el.points").alias("points"),
        F.col("_el.user").alias("user"),
    )


XML_SCHEMA = T.StructType(
    [
        T.StructField(
            "Annotation",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("_Id", T.StringType()),
                        T.StructField("_Type", T.StringType()),
                        T.StructField(
                            "Regions",
                            T.StructType(
                                [
                                    T.StructField(
                                        "Region",
                                        T.ArrayType(
                                            T.StructType(
                                                [
                                                    T.StructField("_Id", T.StringType()),
                                                    T.StructField(
                                                        "Vertices",
                                                        T.StructType(
                                                            [
                                                                T.StructField(
                                                                    "Vertex",
                                                                    T.ArrayType(
                                                                        T.StructType(
                                                                            [
                                                                                T.StructField("_X", T.DoubleType()),
                                                                                T.StructField("_Y", T.DoubleType()),
                                                                            ]
                                                                        )
                                                                    ),
                                                                )
                                                            ]
                                                        ),
                                                    ),
                                                ]
                                            )
                                        ),
                                    )
                                ]
                            ),
                        ),
                    ]
                )
            ),
        )
    ]
)


def parse_xml_annotations(
    df: DataFrame,
    raw_col: str = "raw",
    slide_col: str = "slide_id",
) -> DataFrame:
    """Aperio-XML → one row per (slide, annotation layer, region) — the
    reference's second input format
    (extraction_utils/xml_to_mask_minmax.py:51-67 iterates
    Annotation→Regions/Region→Vertices/Vertex; layer key = Annotation@Id
    ∈ '1'..'6', extract_reference_features.py:49-63). Declarative
    ``from_xml`` with an explicit schema; output shape matches
    parse_annotations (points array<array<double>>) so the degenerate
    guard / geometry / rasterizer downstream are shared."""
    docs = df.select(
        F.col(slide_col).alias("slide_id"),
        F.from_xml(F.col(raw_col), XML_SCHEMA).alias("_d"),
    )
    layers = docs.select(
        "slide_id", F.explode("_d.Annotation").alias("_a")
    ).select(
        "slide_id",
        F.col("_a._Id").alias("annotation_id"),
        F.col("_a._Type").alias("annotation_type"),
        F.col("_a.Regions.Region").alias("_regions"),
    )
    return layers.select(
        "slide_id",
        "annotation_id",
        "annotation_type",
        F.posexplode("_regions").alias("region_idx", "_r"),
    ).select(
        "slide_id",
        "annotation_id",
        "annotation_type",
        "region_idx",
        F.col("_r._Id").alias("region_id"),
        F.transform(
            F.col("_r.Vertices.Vertex"),
            lambda v: F.array(v["_X"], v["_Y"]),
        ).alias("points"),
    )


def drop_degenerate_elements(df: DataFrame, points_col: str = "points") -> DataFrame:
    """F6: drop elements with <3 DISTINCT vertices — the reference's
    UnidentifiedImageError/ValueError skip (FeatureExtractor.py:126-132).
    array_distinct runs JVM-side; no payload leaves the scan."""
    return df.filter(F.size(F.array_distinct(F.col(points_col))) >= 3)


def with_element_geometry(df: DataFrame, points_col: str = "points") -> DataFrame:
    """Derived geometry columns (F10/A6/X8): n_points, bbox, shoelace
    area — from the points payload, all column expressions. The xs/ys
    extraction uses `transform` lambdas: ingest-time parsing, not a
    per-row hot loop (CLAUDE.md lambda rule applies to hot paths)."""
    p = F.col(points_col)
    xs = F.transform(p, lambda q: q[0])
    ys = F.transform(p, lambda q: q[1])
    from combinedfeatureextraction_spark.functions.arrays import shoelace_area

    return (
        df.withColumn("n_points", F.size(p))
        .withColumn("x_min", F.array_min(xs))
        .withColumn("x_max", F.array_max(xs))
        .withColumn("y_min", F.array_min(ys))
        .withColumn("y_max", F.array_max(ys))
        .withColumn("area", shoelace_area(xs, ys))
    )
