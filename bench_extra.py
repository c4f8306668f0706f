"""Per-query isolation bench (guide §1.4): noop-sink timing + plan capture
for a SUBSET of registry queries, interleaved best-of-N reps.

NOT the driver contract — bench.py stays the frozen measurement harness.
This harness exists so an optimization round can time one query at a time
(no suite-order page-cache effects), capture `.explain("formatted")`
before/after, and iterate quickly.

Usage:
  python bench_extra.py [query ...] [--reps N] [--explain DIR] [--sf DIR]
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py simhash_dedup

Prints one JSON line: {"queries": {name: {"min": s, "all": [...]}}, "sf": ...}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_HOT = [
    "simhash_dedup", "top_ngram", "asof_join_grid", "rep_signals",
    "minhash_dedup", "text_quality", "interval_join", "watershed_split",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", default=None)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--explain", default=None, help="dir for <q>.txt plans")
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                       "/root/testdata/sf0.1")
    )
    args = ap.parse_args()
    names = args.queries or DEFAULT_HOT

    import __spark_entry__ as entrymod
    from combinedfeatureextraction_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="cfe_bench_extra", cpus=cpus,
                      shuffle_partitions=cpus)
    qs = entrymod.queries()
    # warm footer caches / JVM like bench.py does
    spark.read.parquet(f"{args.sf}/events.parquet").count()

    if args.explain:
        os.makedirs(args.explain, exist_ok=True)
        for name in names:
            plan = qs[name](spark, args.sf)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(os.path.join(args.explain, f"{name}.txt"), "w") as f:
                f.write(plan)

    walls: dict[str, list[float]] = {n: [] for n in names}
    for rep in range(args.reps):  # interleaved: noise rarely spans a rep
        for name in names:
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.time()
            qs[name](spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
            walls[name].append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    out = {
        "queries": {
            n: {"min": min(w), "all": w} for n, w in walls.items()
        },
        "sf": args.sf,
        "cpus": cpus,
        "loadavg": round(os.getloadavg()[0], 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
