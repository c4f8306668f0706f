"""Streaming/batch parity: the Structured-Streaming session aggregate run
with availableNow over a static parquet must equal the batch gap
sessionization (streaming boundary semantics: new session when gap >= G)."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F


def test_streaming_sessions_match_batch(spark, seqs_df, tmp_path):
    from combinedfeatureextraction_spark.streaming.sessions import (
        streaming_session_agg,
    )

    src = str(tmp_path / "stream_src")
    seqs_df.select("doc_id", "ts", "n_tok").write.mode("overwrite").parquet(src)

    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    agg = streaming_session_agg(
        stream, ["doc_id"], "ts", "n_tok", gap="1 hour", watermark="0 seconds"
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("t_sessions")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = (
        spark.table("t_sessions")
        .orderBy("doc_id", "session_start")
        .toPandas()
    )

    # batch oracle with >= gap boundary (session_window merges iff gap < G)
    from combinedfeatureextraction_spark.functions.timeutil import epoch_seconds
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("ts")
    gap = epoch_seconds("ts") - F.lag(epoch_seconds("ts")).over(w)
    b = (
        seqs_df.withColumn("g", gap)
        .withColumn(
            "sid",
            F.sum(
                F.when(F.col("g").isNull() | (F.col("g") >= 3600), 1).otherwise(0)
            ).over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("doc_id", "sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.count("*").alias("session_len"),
            F.sum("n_tok").alias("session_sum"),
        )
        .orderBy("doc_id", "session_start")
        .toPandas()
    )
    assert len(got) == len(b)
    assert (got["session_len"].values == b["session_len"].values).all()
    assert np.allclose(
        got["session_sum"].astype(float).values,
        b["session_sum"].astype(float).values,
    )


def test_streaming_deterministic_sample_matches_batch(spark, tmp_path):
    """Deterministic sampling is a stateless codegen filter, so it runs
    UNCHANGED on a stream — and because the keep decision is a pure
    function of row identity, the streaming selection is byte-identical
    to the batch selection (no RNG/state divergence, regardless of
    micro-batch boundaries)."""
    from combinedfeatureextraction_spark.operators.sampling import (
        deterministic_sample,
    )

    src = str(tmp_path / "sample_src")
    spark.range(0, 500).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id")).alias("text"),
    ).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    sampled = deterministic_sample(stream, ["doc_id"], 0.3, salt=9)
    q = (
        sampled.writeStream.format("memory")
        .queryName("t_sample")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        r["doc_id"] for r in spark.table("t_sample").collect()
    )
    batch = sorted(
        r["doc_id"]
        for r in deterministic_sample(
            spark.read.parquet(src), ["doc_id"], 0.3, salt=9
        ).collect()
    )
    assert got == batch and 0 < len(got) < 500
