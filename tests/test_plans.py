"""Physical-plan shape assertions — the `.explain` discipline: these lock
in the properties that determine 100 TB behavior (single exchange, column
pruning, filter pushdown, broadcast joins) so a regression shows up as a
test failure, not a silent 10× slowdown."""

from __future__ import annotations

import re

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pipeline_single_data_exchange(spark, seqs_df, states_df):
    from combinedfeatureextraction_spark.plans.pipeline import rowlevel_features

    df = rowlevel_features(seqs_df, states_df, carry_payload=False)
    plan = _plan(df)
    data_exchanges = len(re.findall(r"Exchange hashpartitioning", plan))
    broadcasts = len(re.findall(r"BroadcastExchange", plan))
    assert data_exchanges == 1, plan  # ONE shuffle for all window features
    assert broadcasts == 1  # the as-of grid index
    # all window operators share the one sort
    assert len(re.findall(r"\bSort \[", plan)) == 1


def test_narrow_no_token_stats_prunes_payload(spark, tmp_path, seqs_df):
    """carry_payload=False + token_stats=False → parquet scan must NOT
    read the tokens column (ReadSchema pruning)."""
    from combinedfeatureextraction_spark.plans.pipeline import rowlevel_features

    path = str(tmp_path / "seqs")
    seqs_df.write.mode("overwrite").parquet(path)
    seqs = spark.read.parquet(path)
    df = rowlevel_features(seqs, None, carry_payload=False, token_stats=False)
    plan = _plan(df)
    scan = next(line for line in plan.splitlines() if "FileScan parquet" in line)
    assert "tokens" not in scan, scan


def test_filter_pushdown_reaches_scan(spark, tmp_path, seqs_df):
    from combinedfeatureextraction_spark.plans.pipeline import rowlevel_features

    path = str(tmp_path / "seqs2")
    seqs_df.write.mode("overwrite").parquet(path)
    seqs = spark.read.parquet(path).filter(F.col("source") == "web")
    df = rowlevel_features(seqs, None, carry_payload=False)
    plan = _plan(df)
    assert re.search(r"PushedFilters: \[.*(EqualTo|IsNotNull)\(source", plan), plan


def test_dim_join_is_broadcast(spark):
    from combinedfeatureextraction_spark.operators.joins import (
        broadcast_equi_join,
    )

    a = spark.range(1000).withColumnRenamed("id", "k")
    b = spark.range(10).withColumnRenamed("id", "k").withColumn("v", F.lit(1))
    plan = _plan(broadcast_equi_join(a, b, "k"))
    assert "BroadcastHashJoin" in plan


def test_asof_union_single_exchange(spark, seqs_df, states_df):
    from combinedfeatureextraction_spark.operators.asof import asof_join

    df = asof_join(
        seqs_df.select("doc_id", "seq_idx", "ts", "source"),
        states_df,
        ["source"], "ts", "effective_ts", ["state_val"],
    )
    plan = _plan(df)
    # union sorted-merge: exactly one hash exchange (on the key), no join
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert "Join" not in plan


def test_glcm_single_exchange(spark, seqs_df):
    """GLCM: the window's entity hash exchange must satisfy BOTH downstream
    groupBys (pair histogram keys are a superset of the entity key, and
    the final agg keys ARE the entity key) — one exchange end-to-end, both
    aggregates map-side partial."""
    from combinedfeatureextraction_spark.operators.texture import (
        glcm_texture,
        quantize_level,
    )

    df = seqs_df.withColumn("lvl", quantize_level("n_tok", 16))
    plan = _plan(glcm_texture(df, "lvl", ["doc_id"], ["ts"]))
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan
    assert len(re.findall(r"HashAggregate.*partial", plan)) == 2, plan


def test_rasterize_ops_are_pure_maps(spark):
    """The 2-D morphology operators (components / watershed / holes) must
    plan as pure maps: mapInPandas over the scan, ZERO exchanges — masks,
    distance fields and label arrays never ride a shuffle."""
    import pandas as pd

    from combinedfeatureextraction_spark.multimodal.rasterize import (
        polygon_component_features,
        polygon_hole_features,
        polygon_watershed_features,
    )

    df = spark.createDataFrame(
        pd.DataFrame({"pid": [1], "points": [[[0, 0], [8, 0], [8, 6], [0, 6]]]})
    )
    for op in (
        polygon_component_features,
        polygon_watershed_features,
        polygon_hole_features,
    ):
        plan = _plan(op(df, "points", ["pid"]))
        assert "Exchange" not in plan, (op.__name__, plan)
        assert "MapInPandas" in plan, (op.__name__, plan)


def test_asof_broadcast_plan_contract(spark, tmp_path):
    """The binary-search broadcast as-of: the PROBE never shuffles (the
    one hash exchange is the dim-side history rollup inside the
    broadcast subtree), and the documented filter-the-probe-BEFORE-the-
    join pattern keeps parquet pushdown (the non-determinism barrier
    blocks ALL post-join pushdown — that is its cost, see the operator
    docstring)."""
    import pandas as pd

    from combinedfeatureextraction_spark.operators.asof import asof_join

    probe = pd.DataFrame(
        {
            "k": ["a", "b"] * 50,
            "ts": pd.to_datetime(range(100), unit="s"),
            "flag": list(range(100)),
        }
    )
    path = str(tmp_path / "probe")
    spark.createDataFrame(probe).write.mode("overwrite").parquet(path)
    p = spark.read.parquet(path).filter(F.col("flag") > 10)  # BEFORE join
    b = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["a", "b"] * 10,
                "ts": pd.to_datetime(range(0, 200, 10), unit="s"),
                "v": [float(x) for x in range(20)],
            }
        )
    )
    out = asof_join(p, b, ["k"], "ts", "ts", ["v"], strategy="broadcast")
    plan = _plan(out)
    assert "BroadcastExchange" in plan, plan
    # exactly one hash exchange, and it lives in the broadcast (build)
    # subtree — the probe side pipelines scan → search with no shuffle
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.index("BroadcastExchange") < plan.index(
        "Exchange hashpartitioning"
    ), plan
    scan = next(line for line in plan.splitlines() if "FileScan parquet" in line)
    assert "GreaterThan(flag,10)" in scan, scan


def test_sampling_is_shuffle_free_and_packing_single_exchange(spark):
    """r04 ops keep the 100 TB discipline: deterministic sampling is a
    pure codegen'd filter (zero exchanges of any kind); pack_tokens is
    the engine's standard ONE hash exchange + ONE in-partition sort."""
    from combinedfeatureextraction_spark.operators.packing import pack_tokens
    from combinedfeatureextraction_spark.operators.sampling import (
        stratified_sample,
    )

    docs = spark.createDataFrame(
        [(i, ["en", "de"][i % 2], f"s{i % 3}", 10 + i) for i in range(100)],
        "doc_id long, lang string, source string, n_tok long",
    )
    s = stratified_sample(docs, ["doc_id"], "lang", {"en": 0.5}, 0.1, salt=1)
    plan = _plan(s)
    assert "Exchange" not in plan, plan
    # "*(n) Filter" prefix = the filter runs inside whole-stage codegen
    assert re.search(r"\*\(\d+\) Filter", plan), plan
    p = pack_tokens(docs, ["source"], ["doc_id"], "n_tok", 100)
    plan = _plan(p)
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan
    assert len(re.findall(r"\bSort \[", plan)) == 1, plan
    # stratified_take: one exchange on the stratum key, and Spark plants
    # a PARTIAL WindowGroupLimit (map-side top-n) BEFORE the shuffle —
    # only <= n rows per partition per stratum cross the wire, the shape
    # you want at 100 TB. Lock both properties.
    from combinedfeatureextraction_spark.operators.sampling import (
        stratified_take,
    )

    t = stratified_take(docs, ["doc_id"], "lang", 5, salt=3)
    plan = _plan(t)
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan
    assert "WindowGroupLimit" in plan and "Partial" in plan, plan
