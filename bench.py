"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE COMPACT JSON line (r03-verdict item 6: the full record grew
past the driver's stdout capture buffer, leaving BENCH_r0{2,3}.json with
"parsed": null — per-query warm times + totals + the headline scaling
efficiencies stay on stdout, everything else goes to
.fixtures/bench_full.json):
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "load_gate": {...},
   "scaling": {...summary}}

Each query is materialized with a noop write (full execution, no driver
collect). Timing is POOLED MINIMA across two measurement windows with a
loadavg gate (r04-verdict item 1): the sandbox host has ±50%
minute-scale co-tenant noise, so per-query wall = min over 3 reps split
across two windows separated by a settle pause, and the JSON line
carries settled co-tenant loadavg samples plus a quiet verdict so the
driver's BENCH row is self-certifying about contention. The flagship
feature-materialization throughput (rows/sec over the events
point-in-time pipeline) is reported alongside, since BASELINE targets
sequences/sec. Run scripts/scaling_run.py for the N-vs-4N-cores
scaling-efficiency evidence (results recorded in BASELINE.md / BENCH).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def materialize(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> None:
    import __spark_entry__ as entrymod
    from combinedfeatureextraction_spark.session import get_spark

    # co-tenant signal BEFORE any of our own load exists (r04-verdict
    # item 1: the suite must be self-certifying about contention — r04's
    # un-gated window showed a uniform ~1.6× inflation on unchanged code
    # that only scaling_run.py's gate could contradict)
    load_pre = round(os.getloadavg()[0], 2)
    spark = get_spark(app_name="cfe_bench", cpus=CPUS, shuffle_partitions=CPUS)

    qs = entrymod.queries()
    headline = [
        # the north-rule core
        "rolling_window", "lag_lead", "sessionize", "session_stats",
        "forward_fill", "dist_to_boundary",
        "asof_join", "asof_join_salted", "asof_join_cogroup",
        "asof_join_grid", "geodesic_flood", "zscore",
        "six_stat_hierarchy", "weighted_mean", "interval_join",
        "percent_rank", "topk",
        "glcm_stats", "component_stats", "watershed_split",
        "deconvolution", "polygon_components", "polygon_watershed", "polygon_holes",
        "media_decode", "media_decode_png", "media_decode_jpeg", "polygon_edt",
        "polygon_ring", "color_stats", "media_decode_flac", "subcompartment",
        "subcompartment_texture", "subcompartment_morph",
        # training-data ops
        "exact_dedup", "minhash_dedup", "simhash_dedup",
        "embedding_topk", "lsh_topk", "text_quality", "fingerprint",
        "salted_agg", "stratified_sample", "pack_tokens",
        "rep_signals", "top_ngram",
    ]
    # warm the JVM/parquet footer caches once with a trivial action
    spark.read.parquet(f"{SF_DIR}/events.parquet").count()

    # Pooled-minima over TWO measurement windows (r04-verdict item 1,
    # ported from scripts/scaling_run.py): window A runs 2 reps per query
    # (rep0 = cold, kept separately), then the process idles long enough
    # for our own 1-min loadavg to decay (e^-2.5 at the default 150 s), a
    # settled co-tenant sample is taken, and window B runs 1 warm rep per
    # query. Per-query wall = min across all reps of both windows; the
    # host's ±50% minute-scale noise (CLAUDE.md) rarely spans both
    # windows, so the pooled minimum is a far better steady-state
    # estimator than best-of-2 in one window. Per-query boundary loadavg
    # is recorded (labeled, not gated — it carries our own load); the
    # quiet verdict gates on the settled samples only.
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n_rows = ev.count()
    settle_s = int(os.environ.get("CFE_BENCH_SETTLE", "150"))

    timings_cold: dict[str, float] = {}
    window_walls: dict[str, list[float]] = {}
    boundary_loads: dict[str, list[float]] = {"A": [], "B": []}

    def run_window(label: str, reps: int) -> None:
        for name in headline + ["flagship_pipeline"]:
            boundary_loads[label].append(round(os.getloadavg()[0], 2))
            for rep in range(reps):
                t0 = time.time()
                if name == "flagship_pipeline":
                    materialize(_flagship(entrymod, spark, SF_DIR))
                else:
                    materialize(qs[name](spark, SF_DIR))
                wall = time.time() - t0
                window_walls.setdefault(name, []).append(wall)
                if label == "A" and rep == 0:
                    timings_cold[name] = round(wall, 3)
        boundary_loads[label].append(round(os.getloadavg()[0], 2))

    run_window("A", reps=2)
    time.sleep(settle_s)
    load_mid_settled = round(os.getloadavg()[0], 2)
    run_window("B", reps=1)

    timings = {
        name: round(min(walls), 3) for name, walls in window_walls.items()
    }
    flagship_sec = timings["flagship_pipeline"]
    # which window supplied each minimum — if contention hit exactly one
    # window, the minima should cluster in the other one
    min_window = {
        name: ("A" if walls.index(min(walls)) < 2 else "B")
        for name, walls in window_walls.items()
    }
    load_gate = {
        "pre_suite": load_pre,
        "mid_settled": load_mid_settled,
        "settle_seconds": settle_s,
        # quiet iff both fully-settled co-tenant samples are small; the
        # same 4.0 threshold (an eighth of the machine) as scaling_run.py
        "quiet": max(load_pre, load_mid_settled) <= 4.0,
        "windows": 2,
        "minima_from_window_B": sum(
            1 for w in min_window.values() if w == "B"
        ),
    }

    total = round(sum(timings.values()), 3)
    # apples-to-apples subtotal vs BENCH_r02: the r02 headline set, minus
    # simhash_dedup whose registry query changed semantics in r03
    # (oracle-able md5 variant + planted twins; see BASELINE.md note)
    _r02_common = [
        q for q in headline
        if q not in ("polygon_components", "polygon_watershed",
                     "polygon_holes", "media_decode", "media_decode_png",
                     "media_decode_jpeg", "polygon_edt", "simhash_dedup",
                     "stratified_sample", "pack_tokens", "rep_signals",
                     "top_ngram", "polygon_ring", "color_stats",
                     "media_decode_flac", "subcompartment",
                     "subcompartment_texture", "subcompartment_morph")
    ]
    common_r02 = round(
        sum(timings[q] for q in _r02_common) + timings["flagship_pipeline"], 3
    )
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    fixtures_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".fixtures"
    )
    os.makedirs(fixtures_dir, exist_ok=True)
    full_path = os.path.join(fixtures_dir, "bench_full.json")
    # compact stdout record — MUST stay under the driver's capture buffer
    out = {
        "metric": "headline_suite_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "common_with_r02_sec": common_r02,
        "sf": float(sf),
        "cpus": CPUS,
        "flagship_rows_per_sec": round(n_rows / flagship_sec, 1),
        "load_gate": load_gate,
        # the gate bounds IN-GUEST contention only: host-level co-tenancy
        # is invisible to this VM's loadavg (r05 measured: quiet-gated
        # windows running a uniform 1.2-1.4x over the r02 record day on
        # untouched queries, in bench AND scaling alike). Compare
        # common_with_r02_sec against 19.45 s with that band in mind;
        # per-query regressions show up as OUTLIERS against the uniform
        # host factor, not as the factor itself.
        "gate_scope": "in-guest loadavg only; host co-tenancy invisible",
        "full_record": "see .fixtures/bench_full.json",
    }
    full = dict(
        out,
        queries_cold=timings_cold,
        timing=(
            "pooled min over two windows (A: 2 reps, B: 1 warm rep after "
            f"{settle_s}s settle) + first-run (queries_cold)"
        ),
        flagship_rows=n_rows,
        boundary_loadavg_1m=boundary_loads,
        min_window=min_window,
    )
    # merge the latest N-vs-4N scaling evidence (scripts/scaling_run.py):
    # headline efficiencies on stdout, full detail in the fixture record
    scaling_file = os.path.join(fixtures_dir, "scaling_result.json")
    if os.path.exists(scaling_file):
        with open(scaling_file) as f:
            sc = json.load(f)
        out["scaling"] = {
            "speedup_8_to_32": sc["speedup_8_to_32"],
            "efficiency_N_to_4N": sc["scaling_efficiency_NtoN4"],
            "core_efficiency_N_to_4N": sc.get("core_scaling_efficiency_NtoN4"),
            "decode_floor_efficiency": sc.get("decode_scaling_efficiency_NtoN4"),
        }
        full["scaling"] = {
            "rows": sc["rows"],
            "local8_rows_per_sec": sc["local8"]["rows_per_sec"],
            "local32_rows_per_sec": sc["local32"]["rows_per_sec"],
            **out["scaling"],
        }
        for k in (
            "core_speedup_8_to_32",
            "expected_full_efficiency_from_decomposition",
            "lsh_topk_speedup_8_to_32",
            "lsh_topk_scaling_efficiency_NtoN4",
            "lsh_big_speedup_8_to_32",
            "lsh_big_scaling_efficiency_NtoN4",
            "text_speedup_8_to_32",
            "text_scaling_efficiency_NtoN4",
            "load_gate",
            "methodology_note",
            "best_window_reference_r02",
        ):
            if k in sc:
                full["scaling"][k] = sc[k]
    with open(full_path, "w") as f:
        json.dump(full, f, indent=1)
    print(json.dumps(out))


def _flagship(entrymod, spark, sf_dir):
    """entry()'s pipeline but parameterized by sf_dir."""
    from pyspark.sql import functions as F

    from combinedfeatureextraction_spark.operators.asof import asof_join
    from combinedfeatureextraction_spark.operators.fill import (
        distance_to_boundary,
        forward_fill,
    )
    from combinedfeatureextraction_spark.operators.sessionize import sessionize
    from combinedfeatureextraction_spark.operators.window_features import (
        with_lag_lead,
        with_rolling_stats,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    df = with_lag_lead(ev, "value", ["user_id"], ["ts", "event_id"], offsets=(1,))
    df = with_rolling_stats(
        df, "value", ["user_id"], ["ts", "event_id"], preceding=4,
        stats=("mean", "std", "min", "max"),
    )
    df = sessionize(df, ["user_id"], "ts", entrymod.GAP)
    df = df.withColumnRenamed("_gap_prev", "gap_prev")
    df = distance_to_boundary(
        df, F.col("event_type") == "error", ["user_id"], "ts", out="dist_err"
    )
    df = df.withColumn(
        "purchase_val",
        F.when(F.col("event_type") == "purchase", F.col("value")),
    )
    df = forward_fill(df, "purchase_val", ["user_id"], "ts", out="purchase_ffill")
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", F.col("value").alias("asof_err_value")
    )
    return asof_join(
        df, errors, keys=["user_id"], probe_ts="ts", build_ts="ts",
        values=["asof_err_value"],
    ).drop("purchase_val")


if __name__ == "__main__":
    main()
