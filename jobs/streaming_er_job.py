"""spark-submit entry point for the streaming ER engine.

Cluster usage (north rule: spark-submit --py-files at N and 4N executors):

    ./scripts/make_pyfiles.sh         # builds dist/mapping_analysis_spark.zip
    spark-submit \
        --master <cluster-master> \
        --num-executors <N> \
        --py-files dist/mapping_analysis_spark.zip \
        jobs/streaming_er_job.py \
        --source /path/to/clips_table --work /path/to/workdir \
        [--min-sim 0.7] [--watermark-sec 600] [--max-files 4] [--no-audio]

The package is pure Python (numpy/pandas/pyarrow only — all standard on
Spark clusters), so the zip is the entire deployment artifact. Locally the
same file runs with ``python jobs/streaming_er_job.py ...`` (it builds its
own local SparkSession when no cluster master is configured).
"""

from __future__ import annotations

import argparse


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--source", required=True, help="clips table directory")
    p.add_argument("--work", required=True, help="state/output/checkpoint root")
    p.add_argument("--min-sim", type=float, default=0.7)
    p.add_argument("--watermark-sec", type=int, default=600)
    p.add_argument("--max-files", type=int, default=4)
    p.add_argument("--no-audio", action="store_true")
    p.add_argument("--continuous", action="store_true",
                   help="keep running (processingTime) instead of availableNow")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("streaming-er").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # size the shuffle to the cluster: 4× the core count as the INITIAL
    # partition number — AQE coalesces small ones, while the finer
    # granularity smooths stragglers on the scoring/merge stages (at
    # exactly N partitions one slow partition idles the rest of the level)
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(max(4 * spark.sparkContext.defaultParallelism, 16)),
    )
    # micro-batch scans are a fraction of the table: with the default 128 MB
    # split a ~5 GB batch is ~40 tasks — 2.4 waves at 16 cores, so the last
    # wave idles most of the level and the scan+fingerprint stage (the
    # per-batch front) caps below 2× scaling 4→16. 48 MB keeps every batch
    # at ≥6 even waves per level without per-task overhead dominating —
    # batch-sized scan-split tuning a real cluster does per-trigger.
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(48 * 1024 * 1024))

    from mapping_analysis_spark.pipeline import PipelineConfig
    from mapping_analysis_spark.streaming.engine import (
        StreamingERConfig,
        StreamingERJob,
    )

    cfg = StreamingERConfig(
        source_dir=args.source,
        work_dir=args.work,
        watermark_delay_sec=args.watermark_sec,
        max_files_per_trigger=args.max_files,
        pipeline=PipelineConfig(
            min_sim=args.min_sim, use_audio=not args.no_audio
        ),
    )
    job = StreamingERJob(spark, cfg)
    q = job.start(available_now=not args.continuous)
    q.awaitTermination()
    state = job.final_state()
    if state is not None:
        print(f"final clusters: {state.count()}")


if __name__ == "__main__":
    main()
