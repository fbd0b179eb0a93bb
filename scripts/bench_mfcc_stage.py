"""Microbench: the MFCC-fingerprint scan stage alone at one parallelism
level — isolates the pipeline's largest job (prepare + materialize) from
the rest so its N-vs-4N scaling can be measured without the tail.

Usage: SCALING_N_CLUSTERS=10000 python scripts/bench_mfcc_stage.py 16 [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_scaling import CORPUS, ensure_corpus, _isolate_shared_disk  # noqa: E402


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    ensure_corpus()
    _isolate_shared_disk(cpus)

    from mapping_analysis_spark.pipeline import PipelineConfig, prepare
    from mapping_analysis_spark.session import get_spark
    from mapping_analysis_spark.util import materialize

    spark = get_spark(f"mfcc-{cpus}", cpus=cpus, shuffle_partitions=4 * cpus)
    clips = spark.read.parquet(CORPUS).drop("gold_cluster")
    for rep in range(reps):
        t0 = time.time()
        out = materialize(prepare(clips, PipelineConfig()))
        n = out.count()
        dt = time.time() - t0
        print(
            f"[mfcc-stage] local[{cpus}] rep{rep}: {dt:.1f}s "
            f"({n / dt:.0f} clips/s, n={n})",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
