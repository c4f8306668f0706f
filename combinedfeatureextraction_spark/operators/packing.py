"""Sequence packing — laying documents end-to-end into fixed-capacity
training examples (task brief: large-scale training-data pipeline ops).

Pretraining pipelines concatenate documents in a deterministic order and
chunk the token stream at ``capacity`` boundaries (the "packed" format);
a document whose tokens straddle a boundary spans two bins. That layout
is a pure prefix-sum: a document's global start offset within its pack
group is the running token total before it, and every placement fact
(bin id, offset within the bin, boundary spill) is arithmetic on that
offset — one window cumsum, no iteration, no UDF.

Scale shape: ONE hash exchange on the pack-group key + an in-partition
sort (the engine's standard window shape); each group's packing is
independent, so parallelism = number of groups (shard corpora into pack
groups — e.g. (source, shard) — exactly as real pipelines do; an empty
``group_cols`` is supported for small inputs but serializes the sort).
Every output is closed-form over the cumsum, which is what makes the
DuckDB oracle exact.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_tokens(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[str],
    n_tok_col: str,
    capacity: int,
) -> DataFrame:
    """Assign each row its packed placement within its group.

    Adds:
      ``start_offset``  global token offset of the row's first token
      ``bin_id``        capacity-sized bin holding that first token
      ``bin_offset``    offset within that bin
      ``spans_boundary``row's tokens straddle a bin boundary (its last
                        token lands in a later bin; empty rows never span)
    """
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    group_cols, order_cols = list(group_cols), list(order_cols)
    w = (
        Window.partitionBy(*group_cols) if group_cols else Window.partitionBy()
    ).orderBy(*order_cols)
    n = F.col(n_tok_col).cast("long")
    start = (F.sum(n).over(w) - n).alias("start_offset")
    cap = F.lit(int(capacity))
    out = df.withColumn("start_offset", start)
    s = F.col("start_offset")
    return (
        out.withColumn("bin_id", F.floor(s / cap))
        .withColumn("bin_offset", s % cap)
        .withColumn(
            "spans_boundary",
            (n > 0) & (F.floor((s + n - 1) / cap) > F.col("bin_id")),
        )
    )
