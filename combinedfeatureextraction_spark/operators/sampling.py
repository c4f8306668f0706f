"""Deterministic, engine-portable sampling — the reproducibility tier a
training-data pipeline needs (task brief: curation / data-mixing ops).

``df.sample()`` draws from a per-partition RNG: the selected set changes
with partitioning, retries and engine version — useless for a corpus
that must be re-materializable bit-identically (and un-verifiable by an
external oracle). Here the keep/drop decision is a PURE FUNCTION of the
row's identity: u = md5(salt ⊕ id columns) → uniform in [0,1), keep iff
u < fraction. md5 is bit-identical in every engine (the same portability
contract the simhash oracle uses), so the sample is reproducible across
runs, partitionings, Spark versions — and across engines, which is what
makes the DuckDB oracle exact.

Scale shape: a codegen'd per-row hash + filter at the scan — no shuffle,
no RNG state, prunes before anything downstream. Changing ``salt``
redraws the sample; sweeping fractions is monotone (a 10% sample is a
subset of the 20% sample at the same salt — handy for scaling-law
ablations).

Reference analog: the reference subsamples inputs by slicing ordered id
lists (extract_reference_features.py argparse range slicing); this is
the distributed, reproducible generalization.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_U_DENOM = float(1 << 48)  # 12 hex digits = 48 bits, exact in a double


def sample_key(id_cols: Sequence[str], salt: int | str = 0) -> Column:
    """Uniform-[0,1) key: first 12 hex digits of
    md5(salt \\x1f id_col_1 \\x1f ...) as a 48-bit integer / 2^48.
    Deterministic per row identity; exact in double arithmetic."""
    s = F.concat_ws(
        "\x1f", F.lit(str(salt)), *[F.col(c).cast("string") for c in id_cols]
    )
    return F.conv(F.substring(F.md5(s), 1, 12), 16, 10).cast("double") / _U_DENOM


def deterministic_sample(
    df: DataFrame,
    id_cols: Sequence[str],
    fraction: float,
    salt: int | str = 0,
    key_out: str | None = None,
) -> DataFrame:
    """Keep rows with sample_key < ``fraction``. ``key_out`` optionally
    materializes the key column (for audits / stratified reweighting)."""
    u = sample_key(id_cols, salt)
    out = df.filter(u < F.lit(float(fraction)))
    if key_out:
        out = out.withColumn(key_out, u)
    return out


def stratified_sample(
    df: DataFrame,
    id_cols: Sequence[str],
    strata_col: str,
    fractions: Mapping[str, float],
    default_fraction: float = 0.0,
    salt: int | str = 0,
    key_out: str | None = None,
) -> DataFrame:
    """Per-stratum keep fractions (data mixing): stratum s keeps
    fraction[s] of its rows, unlisted strata keep ``default_fraction``.
    The keep decision for a row is independent of its stratum's other
    rows — expected counts are exact fractions, no shuffle, no count
    pass."""
    u = sample_key(id_cols, salt)
    p: Column = F.lit(float(default_fraction))
    for stratum, frac in fractions.items():
        p = F.when(F.col(strata_col) == stratum, F.lit(float(frac))).otherwise(p)
    out = df.filter(u < p)
    if key_out:
        out = out.withColumn(key_out, u)
    return out


def stratified_take(
    df: DataFrame,
    id_cols: Sequence[str],
    strata_col: str,
    n_per_stratum: int,
    salt: int | str = 0,
    key_out: str | None = None,
) -> DataFrame:
    """EXACT per-stratum quotas (vs stratified_sample's binomial
    fractions): keep the ``n_per_stratum`` rows with the smallest md5
    sample keys in each stratum — a deterministic, engine-portable
    "random" quota that is stable across runs/partitionings and, like
    the fraction sampler, monotone in n (the top-100 set contains the
    top-50 set at the same salt). One window shuffle on the stratum key
    (rank over the md5 key); strata are independent, so parallelism =
    number of strata — pre-split giant strata if one stratum dominates.
    """
    from pyspark.sql import Window

    u = sample_key(id_cols, salt)
    out = (
        df.withColumn("_u", u)
        .withColumn(
            "_rk",
            F.row_number().over(
                Window.partitionBy(strata_col).orderBy(
                    F.col("_u").asc(), *id_cols
                )
            ),
        )
        .filter(F.col("_rk") <= int(n_per_stratum))
        .drop("_rk")
    )
    if key_out:
        return out.withColumnRenamed("_u", key_out)
    return out.drop("_u")
