"""Driver-style DuckDB oracle comparison, shared by tests and dev runs.

Mimics the driver: run queries()[name] on Spark and oracle_sql()[name] on
DuckDB over the same parquet dir; compare row count, column names, and
order-insensitive values (column-name-sorted, row-sorted).
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "∅"
        if v == 0.0:
            return "0.0"  # -0.0 == 0.0
        return f"{v:.9g}"
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, (pd.Timestamp,)):
        return v.isoformat()
    if isinstance(v, (np.integer,)):
        return str(int(v))
    if isinstance(v, (np.floating,)):
        return _norm_cell(float(v))
    if isinstance(v, (np.bool_,)):
        return str(bool(v))
    return str(v)


def normalize(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    rows = [
        tuple(_norm_cell(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows)


def compare_one(spark, con, name: str, qfn, sql: str | None, sf_dir: str):
    sdf = qfn(spark, sf_dir)
    spd = sdf.toPandas()
    if sql is None:
        return {"name": name, "mode": "rows_only", "rows": len(spd), "ok": len(spd) >= 0}
    opd = con.execute(sql).fetchdf()
    res = {
        "name": name,
        "mode": "oracle",
        "rows": len(spd),
        "oracle_rows": len(opd),
        "cols": sorted(spd.columns),
        "oracle_cols": sorted(opd.columns),
    }
    if sorted(spd.columns) != sorted(opd.columns):
        res["ok"] = False
        res["why"] = "schema"
        return res
    if len(spd) != len(opd):
        res["ok"] = False
        res["why"] = "rowcount"
        return res
    a, b = normalize(spd), normalize(opd)
    res["ok"] = a == b
    if not res["ok"]:
        res["why"] = "values"
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        res["sample_diff"] = diffs
    return res
