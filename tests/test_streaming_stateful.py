"""Custom stateful streaming operator: running per-entity stats via
applyInPandasWithState, driven with availableNow; result must equal the
batch groupBy aggregate (final state after the whole stream)."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F


def test_running_entity_stats_matches_batch(spark, seqs_df, tmp_path):
    from combinedfeatureextraction_spark.streaming.stateful import (
        running_entity_stats,
    )

    src = str(tmp_path / "stateful_src")
    seqs_df.select("doc_id", F.col("n_tok").cast("double").alias("value")).write.mode(
        "overwrite"
    ).parquet(src)

    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    out = running_entity_stats(stream, "doc_id", "value")
    q = (
        out.writeStream.format("memory")
        .queryName("t_running")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), q.status
    # update mode: last row per key is the final state
    got = (
        spark.table("t_running")
        .groupBy("key")
        .agg(
            F.max("running_n").alias("running_n"),
            F.max("running_sum").alias("running_sum"),
            F.min("running_min").alias("running_min"),
            F.max("running_max").alias("running_max"),
        )
        .orderBy("key")
        .toPandas()
    )
    want = (
        spark.read.parquet(src)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("s"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )
        .orderBy("doc_id")
        .toPandas()
    )
    assert (got["key"].values == want["doc_id"].values).all()
    assert (got["running_n"].values == want["n"].values).all()
    assert np.allclose(got["running_sum"].values, want["s"].values)
    assert np.allclose(got["running_min"].values, want["mn"].values)
    assert np.allclose(got["running_max"].values, want["mx"].values)


def test_streaming_rolling_agg_matches_batch(spark, seqs_df, tmp_path):
    from combinedfeatureextraction_spark.streaming.sessions import (
        streaming_rolling_agg,
    )

    src = str(tmp_path / "rolling_src")
    seqs_df.select("doc_id", "ts", "n_tok").write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    agg = streaming_rolling_agg(
        stream, ["doc_id"], "ts", "n_tok",
        window="10 minutes", slide="5 minutes", watermark="0 seconds",
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("t_rolling")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("t_rolling")
    want = (
        spark.read.parquet(src)
        .groupBy(
            "doc_id", F.window(F.col("ts"), "10 minutes", "5 minutes").alias("w")
        )
        .agg(F.count("*").alias("n"))
    )
    assert got.count() == want.count()
    assert got.agg(F.sum("roll_n")).collect()[0][0] == want.agg(
        F.sum("n")
    ).collect()[0][0]
