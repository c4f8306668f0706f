"""Iterative fixpoint operators: connected components / label propagation.

Reference analog (SURVEY.md W4): `imreconstruct` — iterative
`dilate; AND mask` until no change, a geodesic flood from marker pixels
(fextract/extraction_utils/extract_ffpe_features.py:6-22). Catalyst cannot
express fixpoints, so this is the one operator family built as a bounded
DataFrame loop: each iteration propagates the minimum label across edges,
``localCheckpoint()`` truncates the lineage (otherwise the plan doubles
every iteration), and the loop stops when no label changed.

Scale notes: each iteration is one shuffle (join on the edge key) over the
CURRENT labels (narrow: id, label). Convergence for graphs of diameter d
takes ⌈log₂ d⌉ iterations with large-star/small-star style min-label
doubling; this implementation is the plain min-propagation variant
(d iterations) with a ``max_iter`` guard — adequate for the short chains
sessional data produces, and the place an LSH/large-star upgrade slots in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """Label propagation: output (id, component) where component is the
    MINIMUM vertex id reachable via undirected edges. Deterministic.

    ``edges`` should be deduplicated; self-loops are harmless.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        # every iteration joins against sym — checkpoint so the upstream
        # edge derivation (often a window over the raw table) runs once
        .localCheckpoint(eager=False)
    )
    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    ).localCheckpoint()
    # convergence via an order-independent checksum of the (id, component)
    # assignment — one tiny agg over the (already checkpointed) labels per
    # iteration instead of a full join-and-compare against the previous
    # iteration. min-label propagation is monotone, so a fixed point is
    # exactly "the assignment didn't change"; xxhash64-sum collision on a
    # CHANGED assignment is ~2⁻⁶⁴ per iteration (and only costs one extra
    # iteration if it ever happened).
    def _checksum(lb: DataFrame) -> int:
        # decimal(38,0) sum: exact and overflow-free under ANSI mode
        row = lb.agg(
            F.sum(F.xxhash64("id", "component").cast("decimal(38,0)"))
        ).collect()[0]
        return 0 if row[0] is None else int(row[0])

    prev_chk = _checksum(labels)
    for _ in range(max_iter):
        # candidate label per vertex: min over neighbors' labels and own
        nbr = (
            sym.join(labels, sym["b"] == labels["id"])
            .select(F.col("a").alias("id"), F.col("component"))
        )
        prop = (
            labels.select("id", "component")
            .union(nbr)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
        )
        # pointer jumping: component ← label(component). Turns O(diameter)
        # convergence into O(log diameter) — a path of length 60 converges
        # in ~8 rounds instead of 60.
        jump = prop.select(
            F.col("id").alias("_cid"), F.col("component").alias("_cc")
        )
        new_labels = (
            prop.join(jump, prop["component"] == jump["_cid"], "left")
            .select(
                "id", F.coalesce("_cc", "component").alias("component")
            )
        ).localCheckpoint()  # truncate lineage each iteration
        labels = new_labels
        chk = _checksum(labels)
        if chk == prev_chk:
            break
        prev_chk = chk
    return labels


def geodesic_reconstruct_1d(
    df: DataFrame,
    keys: list[str],
    ts: str,
    marker: str,
    mask: str,
    out: str = "reconstructed",
) -> DataFrame:
    """1-D geodesic reconstruction (the direct imreconstruct analog):
    marker values flood forward/backward through contiguous mask runs.

    In 1-D the fixpoint collapses to TWO window passes (max of marker over
    the containing mask-run), so no loop is needed — runs are identified
    by gap-sessionizing the mask, then the run-max of the marker floods
    every row of the run. Demonstrates why the reference's iterative
    kernel becomes a closed-form window at this data model.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(ts)
    run_start = F.when(
        F.col(mask)
        & (F.lag(F.col(mask), 1, False).over(w) == F.lit(False)),
        F.lit(1),
    ).otherwise(F.lit(0))
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    runs = df.withColumn("_run", F.sum(run_start).over(cum))
    w_run = Window.partitionBy(*keys, "_run")
    flooded = runs.withColumn(
        out,
        F.when(F.col(mask), F.max(marker).over(w_run)).otherwise(F.lit(None)),
    )
    return flooded.drop("_run")
