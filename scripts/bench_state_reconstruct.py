"""State-reconstruction cost vs delta-chain length (compact_every evidence).

The log-structured state store reads ``state = base snapshot ∘ delta
chain``; ``compact_every`` bounds the chain. The 50-batch soak proves
boundedness — this script MEASURES the reconstruct-time curve so the
compaction default is evidence-backed for long horizons:

* drives a deterministic clips corpus through the streaming ER job with
  ``maxFilesPerTrigger=1`` and compaction disabled (``compact_every``
  larger than the batch count), so after batch 0's initial snapshot the
  chain grows one delta per batch;
* then times ``_load_state`` (reconstruction + a count action) at chain
  lengths 1 / 4 / 8 / 16, three reps each, best-of (shared-VM noise only
  adds time).

Each delta applies one broadcast anti-join (tombstones) + one union, so
reconstruct cost should grow ~linearly in chain length with a small
per-delta constant — the measured slope is what justifies the default
``compact_every=8`` (amortized snapshot write vs bounded replay cost).

Usage: python scripts/bench_state_reconstruct.py   # prints one JSON line
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

N_CLUSTERS = int(os.environ.get("STATE_BENCH_CLUSTERS", "2000"))
N_FILES = int(os.environ.get("STATE_BENCH_FILES", "17"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
CHAIN_POINTS = (1, 4, 8, 16)
REPS = 3


def main() -> None:
    from mapping_analysis_spark.datagen.clips import write_clips_parquet
    from mapping_analysis_spark.session import get_spark
    from mapping_analysis_spark.streaming.engine import (
        StreamingERConfig,
        StreamingERJob,
    )

    spark = get_spark("state-reconstruct-bench", cpus=CPUS)
    corpus = f"/tmp/state_bench_corpus_{N_CLUSTERS}_{N_FILES}"
    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        write_clips_parquet(
            spark, corpus, N_CLUSTERS, seed=42, partitions=N_FILES
        )
    work = "/tmp/state_bench_work"
    shutil.rmtree(work, ignore_errors=True)
    cfg = StreamingERConfig(
        source_dir=corpus,
        work_dir=work,
        max_files_per_trigger=1,
        compact_every=10_000,  # never compact after the initial snapshot
    )
    job = StreamingERJob(spark, cfg)
    t0 = time.time()
    job.start(available_now=True).awaitTermination()
    t_stream = time.time() - t0
    entries = job._state_entries()
    kinds = [k for _, k in entries]
    n_deltas = kinds.count("delta")
    # the writer may coalesce to fewer files than requested partitions —
    # adapt the curve to the chain actually produced (≥ 8 required)
    assert kinds[0] == "full" and n_deltas >= 8, (
        f"expected 1 snapshot + ≥8 deltas, got {kinds}"
    )
    points = tuple(c for c in CHAIN_POINTS if c <= n_deltas)
    if points[-1] != n_deltas:
        points = points + (n_deltas,)
    batches = [b for b, _ in entries]

    curve = {}
    rows_at = {}
    for chain in points:
        # reconstruct as of just after the chain-th delta
        before = batches[chain] + 1
        best = float("inf")
        for _ in range(REPS):
            t0 = time.time()
            state = job._load_state(before)
            n = state.count()
            best = min(best, time.time() - t0)
        curve[chain] = round(best, 3)
        rows_at[chain] = n
    slope = (curve[points[-1]] - curve[points[0]]) / (points[-1] - points[0])
    print(
        "STATEBENCH "
        + json.dumps(
            {
                "n_batches": len(entries),
                "n_deltas": n_deltas,
                "stream_wall_sec": round(t_stream, 1),
                "reconstruct_sec_by_chain_len": curve,
                "state_rows_by_chain_len": rows_at,
                "per_delta_slope_sec": round(slope, 4),
                "cpus": CPUS,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
