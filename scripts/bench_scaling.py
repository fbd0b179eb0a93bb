"""Scaling evidence for the north rule: the same ER job on the same input
at two parallelism levels (local[N] vs local[4N] — the sandbox proxy for
N vs 4N executors), reporting rows/sec at each, the scaling efficiency
(throughput ratio / 4), and an order-insensitive output hash that must be
IDENTICAL across levels (exactly-once, deterministic plan).

Methodology notes (measured on this sandbox):
* Levels are N=4 vs 4N=16, not 8/32: local[32] packs 32 task threads plus
  G1/netty/python-worker threads onto 32 shared vCPUs and collapses into
  system-time thrash — 16 leaves the headroom a real executor would have.
* Each level runs ``REPS`` times and the BEST run counts: the host is a
  shared VM with visible steal time, and noise only ever adds time.
* The corpus must be large enough that parallel compute dominates the
  fixed per-job scheduling latency — the committed evidence uses
  SCALING_N_CLUSTERS=40000 (~140k clips, 20 GB audio).

Usage:
  python scripts/bench_scaling.py            # run both levels, print summary
  python scripts/bench_scaling.py --run 8    # single level (invoked as subprocess)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CLUSTERS = int(os.environ.get("SCALING_N_CLUSTERS", "2000"))
SEED = 42
# SCALING_CORPUS_DIR points at an existing clips corpus (e.g. the
# tmpfs-resident 910k-clip XL corpus shared with the streaming campaign)
# instead of the derived per-N_CLUSTERS path
CORPUS = os.environ.get(
    "SCALING_CORPUS_DIR", f"/tmp/spark_graft_scaling_{N_CLUSTERS}_{SEED}"
)


def ensure_corpus(in_subprocess: bool = False) -> None:
    if os.path.exists(os.path.join(CORPUS, "_SUCCESS")):
        return
    if not in_subprocess:
        # generate in a SUBPROCESS: spark.stop() shuts the context down but
        # the gateway JVM lives until its python parent exits — measured
        # still burning ~3.6 cores during the first pinned level run,
        # contaminating the measurement. A subprocess takes the JVM with it.
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--datagen"], check=True
        )
        return
    from mapping_analysis_spark.datagen.clips import write_clips_parquet
    from mapping_analysis_spark.session import get_spark

    spark = get_spark("scaling-datagen", cpus=os.cpu_count() or 8)
    # fine-grained output files: scan tasks pack evenly at BOTH parallelism
    # levels (32 coarse files made the 32-core scan straggle on its slowest
    # file); scale the file count with the corpus so files stay ~150 MB
    parts = max(128, (N_CLUSTERS * 7 // 2) // 1000)
    write_clips_parquet(spark, CORPUS, N_CLUSTERS, seed=SEED, partitions=parts)
    spark.stop()


def _isolate_shared_disk(cpus: int) -> None:
    """The sandbox proxy maps N executors to local[N] task slots, but every
    slot then shares ONE virtio disk — measured: the raw 20 GB corpus scan
    runs at ~830 MB/s under 4 readers and DEGRADES to ~460 MB/s under 16
    (seek interleaving), so high-core levels pay a penalty that a real
    cluster — whose disk/object-store bandwidth scales with executor count —
    does not have. To keep the proxy faithful to the thing being measured
    (the ENGINE's parallel scaling), each level (a) pre-warms the corpus
    into the page cache (both levels then read memory at identical speed)
    and (b) spills shuffle + materialize scratch to tmpfs. Disable with
    SCALING_SHARED_DISK=1 to measure the raw shared-disk behavior instead."""
    if os.environ.get("SCALING_SHARED_DISK"):
        return
    t0 = time.time()
    for root, _dirs, files in os.walk(CORPUS):
        for fn in files:
            with open(os.path.join(root, fn), "rb") as f:
                while f.read(1 << 24):
                    pass
    print(f"page-cache warm: {time.time() - t0:.1f}s", flush=True)
    scratch = f"/dev/shm/spark_scaling_{cpus}"
    os.makedirs(scratch, exist_ok=True)
    os.environ["SPARK_GRAFT_TMP"] = os.path.join(scratch, "mat")
    os.environ["SPARK_LOCAL_DIRS"] = os.path.join(scratch, "shuffle")


def run_level(cpus: int) -> dict:
    from pyspark.sql import functions as F

    from mapping_analysis_spark.pipeline import PipelineConfig, run_batch
    from mapping_analysis_spark.session import get_spark

    _isolate_shared_disk(cpus)
    # 4× the core count as the initial shuffle partitioning (AQE coalesces
    # small ones): at exactly N partitions the scoring/merge stages idle
    # N−1 cores behind their slowest task during the tail
    spark = get_spark(f"scaling-{cpus}", cpus=cpus, shuffle_partitions=4 * cpus)
    clips = spark.read.parquet(CORPUS).drop("gold_cluster")
    n_clips = clips.count()
    t0 = time.time()
    res = run_batch(clips, PipelineConfig(min_sim=0.7))
    clusters = res["clusters"]
    # order-insensitive output hash: xor of per-row hashes over canonical
    # columns (cluster id + sorted members)
    hashed = clusters.select(
        F.xxhash64(
            F.col("cluster_id"), F.concat_ws(",", F.col("members"))
        ).alias("h")
    )
    agg = hashed.agg(
        F.expr("bit_xor(h)").alias("s"), F.count("h").alias("n")
    ).collect()[0]
    elapsed = time.time() - t0
    spark.stop()
    import shutil

    shutil.rmtree(f"/dev/shm/spark_scaling_{cpus}", ignore_errors=True)
    return {
        "cpus": cpus,
        "n_clips": n_clips,
        "n_clusters": int(agg.n),
        "output_hash": int(agg.s),
        "elapsed_sec": round(elapsed, 2),
        "clips_per_sec": round(n_clips / elapsed, 2),
    }


def _ceiling_probe(procs: int) -> float:
    """Same-moment hardware ceiling: units/sec of a perfectly parallel,
    engine-free numpy FFT pool at ``procs`` processes (see
    bench_hw_ceiling.py). Run immediately before each engine run so the
    engine's measured efficiency can be normalized by what the shared-VM
    host physically allowed AT THAT TIME. Pinned to the same core window
    the engine level will use, so probe and engine see the same hardware."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench_hw_ceiling import _run

    if os.environ.get("SCALING_NO_PIN"):
        return _run(procs)
    prev = os.sched_getaffinity(0)
    os.sched_setaffinity(0, set(range(procs)))
    try:
        return _run(procs)
    finally:
        os.sched_setaffinity(0, prev)


def main() -> None:
    if "--datagen" in sys.argv:
        ensure_corpus(in_subprocess=True)
        return
    if "--run" in sys.argv:
        cpus = int(sys.argv[sys.argv.index("--run") + 1])
        ensure_corpus()
        print("RESULT " + json.dumps(run_level(cpus)))
        return

    ensure_corpus()
    levels = (
        int(os.environ.get("SCALING_N_CORES", "4")),
        int(os.environ.get("SCALING_4N_CORES", "16")),
    )
    reps = int(os.environ.get("SCALING_REPS", "2"))
    results: dict[int, dict] = {}
    ceilings: dict[int, float] = {}
    for rep in range(reps):
        for cpus in levels:
            ceilings[cpus] = max(ceilings.get(cpus, 0.0), _ceiling_probe(cpus))
            print(
                f"[rep {rep}] ceiling probe local[{cpus}]: "
                f"{ceilings[cpus]:.1f} units/s (best so far)",
                flush=True,
            )
            t_start = time.time()
            # Pin the whole process tree (JVM + python workers) to exactly
            # `cpus` host cores and cap BLAS pools to one thread per worker.
            # Without this the proxy is dishonest: at local[4] the 4 task
            # slots spawn 4 python workers whose numpy/OpenBLAS pools plus
            # the JVM's GC/netty threads consume 10+ host cores (measured:
            # the MFCC stage hit 911 clips/s at local[4] vs 996 at
            # local[16] unpinned — the "4-core" level was using most of the
            # machine, so N→4N efficiency read as ~0.25 of its true value).
            # A real N-executor cluster IS capped at N cores; taskset makes
            # the sandbox match it.
            env = dict(
                os.environ,
                OPENBLAS_NUM_THREADS="1",
                OMP_NUM_THREADS="1",
                MKL_NUM_THREADS="1",
            )
            cmd = [sys.executable, os.path.abspath(__file__), "--run", str(cpus)]
            if not os.environ.get("SCALING_NO_PIN"):
                cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
            proc = subprocess.run(
                cmd,
                capture_output=True,
                text=True,
                env=env,
                timeout=int(os.environ.get("SCALING_TIMEOUT", "10800")),
            )
            line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT ")]
            if not line:
                print(proc.stdout[-3000:], file=sys.stderr)
                print(proc.stderr[-3000:], file=sys.stderr)
                raise SystemExit(f"level {cpus} failed")
            r = json.loads(line[-1][len("RESULT "):])
            print(
                f"[rep {rep}] local[{cpus}]: {r['elapsed_sec']}s"
                f" ({r['clips_per_sec']} clips/s, wall {time.time() - t_start:.0f}s)",
                flush=True,
            )
            prev = results.get(cpus)
            if prev is not None and prev["output_hash"] != r["output_hash"]:
                raise SystemExit(f"output hash differs across reps at {cpus}")
            if prev is None or r["elapsed_sec"] < prev["elapsed_sec"]:
                results[cpus] = r

    rn, r4n = results[levels[0]], results[levels[1]]
    identical = rn["output_hash"] == r4n["output_hash"] and (
        rn["n_clusters"] == r4n["n_clusters"]
    )
    efficiency = (r4n["clips_per_sec"] / rn["clips_per_sec"]) / 4.0
    ceiling_eff = ceilings[levels[1]] / ceilings[levels[0]] / 4.0
    summary = {
        "n_clips": rn["n_clips"],
        f"local{levels[0]}": rn,
        f"local{levels[1]}": r4n,
        "reps_per_level": reps,
        "identical_output": identical,
        "speedup_n_to_4n": round(r4n["clips_per_sec"] / rn["clips_per_sec"], 3),
        "scaling_efficiency": round(efficiency, 3),
        "hw_ceiling_units_per_sec": {
            str(c): round(v, 1) for c, v in ceilings.items()
        },
        "hw_ceiling_efficiency": round(ceiling_eff, 3),
        "efficiency_vs_ceiling": round(min(efficiency / ceiling_eff, 1.0), 3)
        if ceiling_eff > 0
        else None,
    }
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
