"""S4 girder-JSON annotation source: parse the reference's actual input
format end-to-end into element rows + geometry + rasterized features."""

from __future__ import annotations

import json

import pytest


@pytest.fixture(scope="module")
def annot_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("annots")
    doc = [
        {
            "annotation": {
                "name": " tubules ",  # reference strips whitespace
                "elements": [
                    {  # 10x5 rectangle at (2,3)
                        "points": [
                            [2, 3, 0], [12, 3, 0], [12, 8, 0], [2, 8, 0]
                        ],
                        "user": {"note": "a"},
                    },
                    {  # degenerate: 2 distinct vertices
                        "points": [[0, 0, 0], [5, 0, 0], [5, 0, 0]],
                        "user": None,
                    },
                ],
            },
            "updated": "2024-01-02T00:00:00Z",
        },
        {
            "annotation": {
                "name": "not_a_layer",
                "elements": [{"points": [[0, 0, 0], [1, 0, 0], [0, 1, 0]],
                              "user": None}],
            },
            "updated": "2024-01-01T00:00:00Z",
        },
        {
            "annotation": {
                "name": "arterioles",
                "elements": [
                    {  # right triangle, legs 8 and 6 -> area 24
                        "points": [[0, 0, 0], [8, 0, 0], [0, 6, 0]],
                        "user": None,
                    }
                ],
            },
            "updated": "2024-01-03T00:00:00Z",
        },
    ]
    p = d / "slide_042.json"
    p.write_text(json.dumps(doc))
    return str(d)


def test_parse_filter_and_geometry(spark, annot_file):
    from combinedfeatureextraction_spark.sources.annotations import (
        drop_degenerate_elements,
        parse_annotations,
        read_annotation_files,
        with_element_geometry,
    )

    raw = read_annotation_files(spark, annot_file)
    els = parse_annotations(raw)
    pdf = els.toPandas()
    # whitelist drops not_a_layer; names stripped
    assert set(pdf["layer_name"]) == {"tubules", "arterioles"}
    assert (pdf["slide_id"] == "slide_042").all()
    assert len(pdf) == 3  # 2 tubule elements + 1 arteriole

    kept = drop_degenerate_elements(els)
    geo = with_element_geometry(kept).toPandas().set_index("layer_name")
    assert len(geo) == 2  # degenerate 2-distinct-point element dropped
    tub = geo.loc["tubules"]
    assert (tub["x_min"], tub["x_max"], tub["y_min"], tub["y_max"]) == (2, 12, 3, 8)
    assert tub["area"] == pytest.approx(50.0)
    assert geo.loc["arterioles", "area"] == pytest.approx(24.0)


def test_parsed_elements_feed_rasterizer(spark, annot_file):
    """S4 → X7 integration: reference-format JSON in, mask features out."""
    import pyspark.sql.functions as F

    from combinedfeatureextraction_spark.multimodal.rasterize import (
        polygon_mask_features,
    )
    from combinedfeatureextraction_spark.sources.annotations import (
        drop_degenerate_elements,
        parse_annotations,
        read_annotation_files,
    )

    els = drop_degenerate_elements(
        parse_annotations(read_annotation_files(spark, annot_file))
    )
    # points arrive [x,y,z]; rasterizer wants [x,y] int pairs
    poly = els.select(
        "layer_name",
        F.transform(
            "points", lambda p: F.array(p[0].cast("int"), p[1].cast("int"))
        ).alias("pts"),
    )
    out = (
        polygon_mask_features(poly, "pts", ["layer_name"])
        .toPandas()
        .set_index("layer_name")
    )
    assert out.loc["tubules", "mask_area"] == 50  # 10x5 rect exact
    # triangle: half the 8x6 bbox, within discretization
    assert abs(out.loc["arterioles", "mask_area"] - 24) <= 7


def test_parse_xml_annotations(spark, tmp_path):
    """Aperio-XML side of S4: same downstream shape as the JSON parser."""
    from combinedfeatureextraction_spark.sources.annotations import (
        drop_degenerate_elements,
        parse_xml_annotations,
        with_element_geometry,
    )

    xml = """<Annotations>
      <Annotation Id="1" Type="4">
        <Regions>
          <Region Id="10">
            <Vertices>
              <Vertex X="2" Y="3"/><Vertex X="12" Y="3"/>
              <Vertex X="12" Y="8"/><Vertex X="2" Y="8"/>
            </Vertices>
          </Region>
          <Region Id="11">
            <Vertices><Vertex X="0" Y="0"/><Vertex X="1" Y="1"/></Vertices>
          </Region>
        </Regions>
      </Annotation>
      <Annotation Id="2" Type="4">
        <Regions>
          <Region Id="20">
            <Vertices>
              <Vertex X="0" Y="0"/><Vertex X="8" Y="0"/><Vertex X="0" Y="6"/>
            </Vertices>
          </Region>
        </Regions>
      </Annotation>
    </Annotations>"""
    df = spark.createDataFrame([("slide_7", xml)], "slide_id string, raw string")
    els = parse_xml_annotations(df)
    pdf = els.orderBy("annotation_id", "region_idx").toPandas()
    assert len(pdf) == 3
    assert pdf["annotation_id"].tolist() == ["1", "1", "2"]
    assert pdf["region_id"].tolist() == ["10", "11", "20"]
    assert [list(p) for p in pdf["points"][0]] == [
        [2.0, 3.0], [12.0, 3.0], [12.0, 8.0], [2.0, 8.0]
    ]

    geo = (
        with_element_geometry(drop_degenerate_elements(els))
        .orderBy("annotation_id")
        .toPandas()
    )
    assert len(geo) == 2  # 2-vertex region dropped
    assert geo["area"].tolist() == [50.0, 24.0]
