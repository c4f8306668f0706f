"""N-vs-4N scaling-efficiency evidence (BASELINE.json north_rule).

A real two-cluster-size run isn't possible in this sandbox, so we run the
IDENTICAL feature-materialization job over the IDENTICAL input at two
parallelism levels (local[8] and local[32] — N and 4N cores) and report
throughput at both plus efficiency = (thr_4N / thr_N) / 4.

Usage:
  python scripts/scaling_run.py prepare          # one-time fixture build
  python scripts/scaling_run.py run --cpus 8     # one measurement (own JVM)
  python scripts/scaling_run.py all              # prepare + 8 + 32 + report

Each measurement runs in a fresh subprocess (one JVM per parallelism
level). The job is plans.pipeline.rowlevel_features — the flagship
point-in-time feature vector including as-of join and token-payload stats
— materialized with a noop write; throughput is sequences/sec.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

FIXTURE_DIR = REPO / ".fixtures" / "bench_sequences"
STATES_DIR = REPO / ".fixtures" / "bench_states"
VECS_DIR = REPO / ".fixtures" / "bench_vectors"
N_DOCS = int(os.environ.get("CFE_BENCH_DOCS", "250000"))  # ~23M rows
N_VECS = int(os.environ.get("CFE_BENCH_VECS", "8000000"))
VEC_DIM = 64
SEED = 42


def prepare() -> None:
    from combinedfeatureextraction_spark.session import get_spark
    from combinedfeatureextraction_spark.sources import fixtures

    have_seq = (FIXTURE_DIR / "_SUCCESS").exists() and (
        STATES_DIR / "_SUCCESS"
    ).exists()
    have_vecs = (VECS_DIR / "_SUCCESS").exists()
    if have_seq and have_vecs:
        print(f"fixture exists: {FIXTURE_DIR}", file=sys.stderr)
        return
    spark = get_spark(app_name="cfe_prepare", cpus=32, shuffle_partitions=64)
    if not have_seq:
        seqs = fixtures.sequences_spark(spark, N_DOCS, seed=SEED, parallelism=256)
        # 256 files: fine-grained tasks balance stragglers at both core counts
        seqs.repartition(256, "doc_id").sortWithinPartitions(
            "doc_id", "ts"
        ).write.mode("overwrite").parquet(str(FIXTURE_DIR))
        fixtures.states_spark(spark, seed=SEED).write.mode("overwrite").parquet(
            str(STATES_DIR)
        )
    # deterministic embedding corpus for the ANN/LSH scaling probe:
    # element j of vector i = hash-derived uniform in [-1, 1)
    from pyspark.sql import functions as F

    vecs = spark.range(0, N_VECS, 1, 256).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(0, {VEC_DIM - 1}), "
            "j -> CAST(CAST(pmod(xxhash64(id, j), 100000) AS DOUBLE) / 50000.0 "
            "- 1.0 AS FLOAT))"  # float32: the embeddings-table element type
        ).alias("embedding"),
    )
    vecs.write.mode("overwrite").parquet(str(VECS_DIR))
    print(f"wrote {FIXTURE_DIR}", file=sys.stderr)
    spark.stop()


def run(cpus: int) -> dict:
    from pyspark.sql import functions as F  # noqa: F401

    from combinedfeatureextraction_spark.plans.pipeline import rowlevel_features
    from combinedfeatureextraction_spark.session import get_spark

    # co-tenant pressure BEFORE this process starts any work: the 1-min
    # load here is entirely other tenants' — the cleanest quiet/contended
    # label a rep can get (boundary loads below include our own decay).
    load_pre = round(os.getloadavg()[0], 2)
    # pin GC threads to the core budget: in local mode the JVM otherwise
    # GCs with all machine cores, which would let local[8] borrow the other
    # 24 cores and understate true 8-core throughput
    gc_opts = f"-XX:ParallelGCThreads={cpus} -XX:ConcGCThreads={max(1, cpus // 4)}"
    conf = {"spark.driver.extraJavaOptions": gc_opts}
    # shuffle through tmpfs when available: removes single-disk IO noise
    # from the measurement (a real cluster has per-executor disks)
    shm = Path("/dev/shm/cfe_spark_local")
    try:
        shm.mkdir(parents=True, exist_ok=True)
        conf["spark.local.dir"] = str(shm)
    except OSError:
        pass
    spark = get_spark(
        app_name=f"cfe_scaling_{cpus}",
        cpus=cpus,
        shuffle_partitions=2 * cpus,
        extra_conf=conf,
    )
    seqs = spark.read.parquet(str(FIXTURE_DIR))
    states = spark.read.parquet(str(STATES_DIR))
    n_rows = seqs.count()  # exact row count
    # warm the OS page cache (incl. the payload column) + JIT so the
    # measurement is steady-state
    seqs.select(F.max(F.array_max("tokens")), F.max("n_tok")).collect()
    # narrow feature materialization — the 100 TB shape (payload never
    # crosses a shuffle; features keyed (doc_id, seq_idx) for MERGE-back).
    # best-of-3 in-JVM reps: the sandbox host shows ±50% minute-to-minute
    # noise (shared tenancy), and the best rep is the closest estimate of
    # the job's true cost at each core count.
    # All variants are timed INTERLEAVED within each rep (full, core,
    # decode, lsh, then the next rep) with best-of-R per variant: the
    # sandbox host shows ±50% noise drifting over MINUTES, so phase-by-
    # phase timing lets a slow window poison one variant and not another
    # (observed: "core" 19% slower than the strictly-heavier "full").
    from combinedfeatureextraction_spark.operators.similarity import lsh_topk

    vecs = spark.read.parquet(str(VECS_DIR))
    n_vecs = vecs.count()
    queries = vecs.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    def t_full():
        rowlevel_features(seqs, states, carry_payload=False).write.format(
            "noop"
        ).mode("overwrite").save()

    def t_core():
        # windows + sessionize + as-of only (token_stats=False → parquet
        # prunes the payload column): isolates operator scaling from the
        # single-host payload-decode bandwidth floor
        rowlevel_features(
            seqs, states, carry_payload=False, token_stats=False
        ).write.format("noop").mode("overwrite").save()

    def t_decode():
        # payload-decode floor: scan + per-row array_min/max ONLY — how
        # much of the full wall is parquet-decode / memory-bus, and how IT
        # scales. full ≈ decode + core ⇒ expected full efficiency =
        # (decode8+core8)/(decode32+core32)/4 — reported by run_all.
        seqs.select(
            "doc_id", "seq_idx",
            F.array_min("tokens").cast("double").alias("tok_min"),
            F.array_max("tokens").cast("double").alias("tok_max"),
        ).write.format("noop").mode("overwrite").save()

    def t_lsh():
        # ANN/LSH top-k scaling probe (VERDICT r1: must not inverse-scale)
        lsh_topk(
            vecs, queries, "vec_id", "embedding", k=10, bits=10, tables=4
        ).write.format("noop").mode("overwrite").save()

    # large-probe-set shuffle-join path (r04-verdict item 8): 4k probe
    # vectors through broadcast_queries=False — every join AQE-planned
    # shuffle instead of broadcast; parity and plan shape are pytest-
    # pinned at fixture size, this measures how the shuffle tier SCALES.
    # Sized to ~1 min/rep and ORDERED LAST (run_all note): the r05
    # attempt-1 20k-probe version ran 256 s at local[8] and its tmpfs
    # shuffle spill evicted the 6.9 GB payload page cache, poisoning
    # every variant that followed it in the rep (wide-32 153 s vs the
    # 52 s record on unchanged code).
    queries_big = vecs.filter(F.col("vec_id") < 4_000).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    def t_lsh_big():
        lsh_topk(
            vecs, queries_big, "vec_id", "embedding", k=10, bits=14,
            tables=2, broadcast_queries=False,
        ).write.format("noop").mode("overwrite").save()

    def t_wide():
        # enriched-rows: payload rides the window shuffle (bandwidth-bound)
        rowlevel_features(seqs, states, carry_payload=True).write.format(
            "noop"
        ).mode("overwrite").save()

    # text-feature bundle probe (round-2 regression guard: this bundle
    # INVERSE-scaled before the regex-pathology fixes — see BASELINE.md)
    from combinedfeatureextraction_spark.functions import text as X

    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    big_docs = docs
    # 5000 × 256 = 1.28M docs: the r03 probe shape (projection write +
    # fingerprint_agg's explode/agg job) carries ~2 s of fixed two-job
    # overhead, which at 320k docs compressed the 8→32 ratio into the
    # noise — a 4× larger corpus puts compute back in charge
    for _ in range(8):
        big_docs = big_docs.union(big_docs)
    big_docs = (
        big_docs.repartition(256)
        # unique key per replica: fingerprint_agg groups by document key
        .withColumn("uid", F.monotonically_increasing_id())
        .localCheckpoint()
    )
    n_docs = big_docs.count()

    def t_text():
        # production shape (plans.curation): scan-side codegen'd feature
        # projection, then the explode-shaped fingerprint aggregate —
        # no interpreted lambda anywhere in the bundle
        big_docs.select(
            "doc_id",
            X.quality_score("text").alias("q"),
            X.lang_id("text").alias("l"),
            X.token_count("text").alias("t"),
        ).write.format("noop").mode("overwrite").save()
        X.fingerprint_agg(big_docs, "uid", "text").write.format("noop").mode(
            "overwrite"
        ).save()

    variants = {
        "full": t_full, "core": t_core, "decode": t_decode,
        "lsh": t_lsh, "text": t_text,
    }
    if os.environ.get("CFE_SCALE_WIDE", "1") != "0":
        variants["wide"] = t_wide
    # lsh_big LAST: its shuffle spill pressures the tmpfs page cache —
    # anything timed after it in the same rep pays the re-read
    variants["lsh_big"] = t_lsh_big
    only = os.environ.get("CFE_SCALE_ONLY")
    if only:
        variants = {k: v for k, v in variants.items() if k in only.split(",")}
    reps = int(os.environ.get("CFE_SCALE_REPS", "3"))
    walls: dict[str, list[float]] = {k: [] for k in variants}
    # loadavg gate (r03-verdict item 5): record 1-min load at each rep
    # boundary so co-tenant pressure is LABELED per measurement instead of
    # inferred after the fact. A rep that starts with load-1m beyond the
    # spark job's own footprint is contention-suspect; run_all aggregates
    # the gate verdict into the report.
    loads: list[float] = []
    for rep in range(reps):
        loads.append(round(os.getloadavg()[0], 2))
        for name, fn in variants.items():
            if name == "wide" and rep > 0:
                continue  # reference number only — keep total wall bounded
            t0 = time.time()
            fn()
            walls[name].append(time.time() - t0)
    loads.append(round(os.getloadavg()[0], 2))
    def best(name: str) -> float:
        return min(walls[name]) if walls.get(name) else float("nan")

    wall = best("full")
    wall_core = best("core")
    wall_decode = best("decode")
    wall_lsh = best("lsh")
    wall_wide = best("wide")
    out = {
        "cpus": cpus,
        "rows": n_rows,
        "wall_sec": round(wall, 2),
        "wall_sec_reps": [round(w, 2) for w in walls.get("full", [])],
        "rows_per_sec": round(n_rows / wall, 1),
        "core_wall_sec": round(wall_core, 2),
        "core_rows_per_sec": round(n_rows / wall_core, 1),
        "wide_wall_sec": round(wall_wide, 2),
        "wide_rows_per_sec": round(n_rows / wall_wide, 1),
        "decode_wall_sec": round(wall_decode, 2),
        "decode_rows_per_sec": round(n_rows / wall_decode, 1),
        "lsh_wall_sec": round(wall_lsh, 2),
        "lsh_vecs": n_vecs,
        "lsh_vecs_per_sec": round(n_vecs / wall_lsh, 1),
        "lsh_big_wall_sec": round(best("lsh_big"), 2),
        "lsh_big_vecs_per_sec": round(n_vecs / best("lsh_big"), 1),
        "text_wall_sec": round(best("text"), 2),
        "text_docs": n_docs,
        "text_docs_per_sec": round(n_docs / best("text"), 1),
        "loadavg_1m_pre_session": load_pre,
        "loadavg_1m_at_rep_boundaries": loads,
    }
    spark.stop()
    return out


def run_all() -> None:
    load_pre_attempt = round(os.getloadavg()[0], 2)
    prepare_proc = subprocess.run(
        [sys.executable, __file__, "prepare"], cwd=REPO, check=True
    )
    del prepare_proc
    results = {}
    for cpus in (8, 32):
        p = subprocess.run(
            [sys.executable, __file__, "run", "--cpus", str(cpus)],
            cwd=REPO,
            check=True,
            capture_output=True,
            text=True,
        )
        results[cpus] = json.loads(p.stdout.strip().splitlines()[-1])
    # post-attempt load AFTER our own 1-min decay (~150 s, e^-2.5): a
    # co-tenant that ramped up mid-attempt is visible here where the
    # pre-attempt sample missed it (observed in the r04 first attempt:
    # pre 0.82 quiet, local[32] phase contended anyway).
    time.sleep(int(os.environ.get("CFE_SCALE_SETTLE", "150")))
    load_post_attempt = round(os.getloadavg()[0], 2)
    thr8 = results[8]["rows_per_sec"]
    thr32 = results[32]["rows_per_sec"]
    core_sp = results[32]["core_rows_per_sec"] / results[8]["core_rows_per_sec"]
    decode_sp = (
        results[32]["decode_rows_per_sec"] / results[8]["decode_rows_per_sec"]
    )
    lsh_sp = results[32]["lsh_vecs_per_sec"] / results[8]["lsh_vecs_per_sec"]
    # decomposition: if full = decode floor + core work (serial composition
    # of the same stages), the expected full wall at each core count is
    # decode + core; comparing its efficiency to the OBSERVED full
    # efficiency quantifies how much of the gap the decode floor explains.
    exp8 = results[8]["decode_wall_sec"] + results[8]["core_wall_sec"]
    exp32 = results[32]["decode_wall_sec"] + results[32]["core_wall_sec"]
    report = {
        "job": "rowlevel_features (point-in-time feature materialization)",
        "rows": results[8]["rows"],
        "local8": results[8],
        "local32": results[32],
        "speedup_8_to_32": round(thr32 / thr8, 3),
        "scaling_efficiency_NtoN4": round(thr32 / thr8 / 4.0, 3),
        "core_speedup_8_to_32": round(core_sp, 3),
        "core_scaling_efficiency_NtoN4": round(core_sp / 4.0, 3),
        "decode_speedup_8_to_32": round(decode_sp, 3),
        "decode_scaling_efficiency_NtoN4": round(decode_sp / 4.0, 3),
        "expected_full_efficiency_from_decomposition": round(
            exp8 / exp32 / 4.0, 3
        ),
        "lsh_topk_speedup_8_to_32": round(lsh_sp, 3),
        "lsh_topk_scaling_efficiency_NtoN4": round(lsh_sp / 4.0, 3),
        "lsh_big_speedup_8_to_32": round(
            results[32]["lsh_big_vecs_per_sec"]
            / results[8]["lsh_big_vecs_per_sec"],
            3,
        ),
        "lsh_big_scaling_efficiency_NtoN4": round(
            results[32]["lsh_big_vecs_per_sec"]
            / results[8]["lsh_big_vecs_per_sec"]
            / 4.0,
            3,
        ),
        "text_speedup_8_to_32": round(
            results[32]["text_docs_per_sec"] / results[8]["text_docs_per_sec"], 3
        ),
        "text_scaling_efficiency_NtoN4": round(
            results[32]["text_docs_per_sec"]
            / results[8]["text_docs_per_sec"]
            / 4.0,
            3,
        ),
        # loadavg gate (r03-verdict item 5): label this attempt quiet or
        # contended from the 1-min loads that are purely other tenants' —
        # pre-attempt (before any subprocess) and pre-local[8]-session.
        # (local32_pre is recorded but NOT gated: it still carries the
        # decaying tail of our own just-finished local[8] run.) Threshold
        # 4.0 ≈ an eighth of the machine; the r03 co-tenant ran ~12
        # cores, which this gate would have flagged.
        "load_gate": {
            "pre_attempt": load_pre_attempt,
            "post_attempt_settled": load_post_attempt,
            "local8_pre": results[8].get("loadavg_1m_pre_session"),
            "local32_pre": results[32].get("loadavg_1m_pre_session"),
            "local8_boundaries": results[8].get(
                "loadavg_1m_at_rep_boundaries"
            ),
            "local32_boundaries": results[32].get(
                "loadavg_1m_at_rep_boundaries"
            ),
            # explicit None check: `or 99` would coerce a legitimate 0.0
            # loadavg (fully idle machine) to 99 and mislabel the window
            "quiet": max(
                load_pre_attempt,
                (
                    99.0
                    if results[8].get("loadavg_1m_pre_session") is None
                    else results[8]["loadavg_1m_pre_session"]
                ),
                load_post_attempt,
            )
            <= 4.0,
        },
    }
    (REPO / ".fixtures" / "scaling_result.json").write_text(json.dumps(report))
    print(json.dumps(report))


def run_resume(cpus: int = 32, kill_frac: float = 0.5) -> None:
    """Resume-overhead evidence AT BENCH SCALE (23M rows): a clean chunked
    materialization, then an identical run SIGKILLed mid-flight and
    resumed with the same --run-id. Overhead = (killed-phase wall +
    resume wall − clean wall) / clean wall; the manifest layer's claim is
    that a crash loses at most one uncommitted chunk, so overhead stays
    under ~one chunk + one JVM startup."""
    import shutil
    import signal

    subprocess.run([sys.executable, __file__, "prepare"], cwd=REPO, check=True)
    out_root = REPO / ".bench_tmp" / "resume_probe"
    shutil.rmtree(out_root, ignore_errors=True)
    env = {**os.environ, "SPARK_GRAFT_CPUS": str(cpus)}

    def cmd(out: str, run_id: str) -> list[str]:
        return [
            "bash", str(REPO / "scripts" / "submit.sh"),
            str(REPO / "jobs" / "materialize_features.py"),
            "--sequences", str(FIXTURE_DIR), "--states", str(STATES_DIR),
            "--out", out, "--narrow", "--buckets", "32", "--chunk", "8",
            "--run-id", run_id,
        ]

    def committed(out: str, run_id: str) -> int:
        d = Path(out) / "_manifests" / run_id
        return len(list(d.glob("bucket=*.json"))) if d.exists() else 0

    # clean run
    t0 = time.time()
    subprocess.run(cmd(str(out_root / "clean"), "rclean"), cwd=REPO,
                   env=env, check=True, capture_output=True)
    wall_clean = time.time() - t0

    # interrupted run: SIGKILL the whole process group mid-flight
    t0 = time.time()
    p = subprocess.Popen(
        cmd(str(out_root / "killed"), "rkill"), cwd=REPO, env=env,
        start_new_session=True,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    deadline = t0 + kill_frac * wall_clean
    while time.time() < deadline and p.poll() is None:
        time.sleep(0.25)
    if p.poll() is None:
        os.killpg(os.getpgid(p.pid), signal.SIGKILL)
        p.wait()
    wall_killed = time.time() - t0
    done_at_kill = committed(str(out_root / "killed"), "rkill")

    # resume with the same run-id
    t0 = time.time()
    r = subprocess.run(cmd(str(out_root / "killed"), "rkill"), cwd=REPO,
                       env=env, check=True, capture_output=True, text=True)
    wall_resume = time.time() - t0
    resume_stats = json.loads(r.stdout.strip().splitlines()[-1])

    # fixed per-invocation floor: a rerun of the COMPLETED clean run skips
    # all 32 buckets — measures JVM startup + packaging + manifest scan,
    # the part of the overhead that amortizes to ~0 on an hours-long run
    t0 = time.time()
    subprocess.run(cmd(str(out_root / "clean"), "rclean"), cwd=REPO,
                   env=env, check=True, capture_output=True)
    wall_noop = time.time() - t0

    report = {
        "job": "materialize_features --narrow --buckets 32 --chunk 8",
        "rows": 23448399,
        "cpus": cpus,
        "wall_clean_sec": round(wall_clean, 1),
        "wall_killed_phase_sec": round(wall_killed, 1),
        "buckets_committed_at_kill": done_at_kill,
        "wall_resume_sec": round(wall_resume, 1),
        "resume_processed": resume_stats.get("processed"),
        "resume_skipped": resume_stats.get("skipped"),
        "total_interrupted_sec": round(wall_killed + wall_resume, 1),
        "overhead_vs_clean": round(
            (wall_killed + wall_resume - wall_clean) / wall_clean, 3
        ),
        "fixed_invocation_floor_sec": round(wall_noop, 1),
        "overhead_minus_floor": round(
            (wall_killed + wall_resume - wall_clean - wall_noop) / wall_clean,
            3,
        ),
    }
    (REPO / ".fixtures" / "resume_result.json").write_text(json.dumps(report))
    print(json.dumps(report))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["prepare", "run", "all", "resume"])
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--kill-frac", type=float, default=0.5)
    args = ap.parse_args()
    if args.cmd == "prepare":
        prepare()
    elif args.cmd == "run":
        print(json.dumps(run(args.cpus)))
    elif args.cmd == "resume":
        run_resume(args.cpus, args.kill_frac)
    else:
        run_all()


if __name__ == "__main__":
    main()
