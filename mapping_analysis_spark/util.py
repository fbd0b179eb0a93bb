"""Engine utilities.

``materialize`` — cut lineage by writing a DataFrame to parquet and
reading it back. Used instead of ``localCheckpoint`` inside driver loops:
in the sandbox's Spark build, repeated (local)checkpoints stop truncating
re-execution after ~16 accumulated calls per session (each subsequent
materialization re-runs the whole chain, doubling per iteration), while a
parquet round-trip is a definitive cut at flat cost (~0.5 s for loop-state
sized data). On a cluster, point ``SPARK_GRAFT_TMP`` at shared storage
(HDFS/S3) — the same pattern Flink's iterate achieves with its
intermediate result partitions.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame

_BASE: str | None = None


def _base_dir() -> str:
    global _BASE
    if _BASE is None:
        root = os.environ.get("SPARK_GRAFT_TMP")
        if root:
            os.makedirs(root, exist_ok=True)
            _BASE = tempfile.mkdtemp(prefix="mas_mat_", dir=root)
        else:
            _BASE = tempfile.mkdtemp(prefix="mas_mat_")
        atexit.register(shutil.rmtree, _BASE, ignore_errors=True)
    return _BASE


def materialize(df: DataFrame, path: str | None = None) -> DataFrame:
    """Write ``df`` to parquet and return a DataFrame reading it back —
    a hard lineage cut. ``path`` may be provided to reuse/alternate a
    fixed location (bounded disk in loops); otherwise a fresh temp subdir
    is used."""
    spark = df.sparkSession
    if path is None:
        path = os.path.join(_base_dir(), uuid.uuid4().hex)
    # Small rowgroups (8 MB vs the 128 MB default): parquet splits only at
    # rowgroup boundaries, so a materialized table written as a few
    # AQE-coalesced partitions is otherwise re-read at ~#rowgroups-way
    # parallelism no matter how many cores the cluster has — measured as a
    # data-proportional non-scaling term in the N-vs-4N bench (the 4-core
    # level saturates on 4 read tasks; the 16-core level idles 12 slots).
    df.write.mode("overwrite").option(
        "parquet.block.size", str(8 * 1024 * 1024)
    ).parquet(path)
    return spark.read.parquet(path)


def loop_paths(n: int = 2, tag: str = "loop") -> list[str]:
    """n alternating materialization paths for a driver loop (iteration i
    writes paths[i % n], so disk stays bounded while the previous
    iteration's data remains readable)."""
    base = os.path.join(_base_dir(), f"{tag}_{uuid.uuid4().hex[:8]}")
    return [f"{base}_{i}" for i in range(n)]


def parallel_grouped(df: DataFrame, *keys: str, factor: int = 1) -> DataFrame:
    """Hash-repartition by ``keys`` with an EXPLICIT partition count, for use
    immediately before a grouped-map (``groupBy(keys).applyInPandas``) stage.

    AQE's partition coalescing sizes post-shuffle partitions by BYTES; a
    grouped-map stage's cost is Python CPU per group, which that heuristic
    cannot see. Measured on the streaming micro-batch profile: the
    per-component merge's shuffle (a few MB of narrow state) was coalesced to
    ONE post-shuffle partition, so the whole merge ran as a single ~10 s task
    at every parallelism level — the dominant term of the per-batch serial
    floor. An explicit ``repartition(n, keys)`` plants a REPARTITION_BY_NUM
    shuffle, which AQE is not allowed to coalesce, and its
    ``HashPartitioning(keys, n)`` output satisfies the grouped-map's
    ClusteredDistribution requirement, so the planner inserts no second
    exchange — same shuffle count, restored parallelism.

    ``n`` follows ``spark.sql.shuffle.partitions`` (the jobs set it to
    4× cores, AQE-coalescible elsewhere), floored at the session's default
    parallelism so a test session with few shuffle partitions still fans a
    CPU-bound Python stage across all cores.
    """
    spark = df.sparkSession
    # ``factor`` > 1 is for NARROW, compute-heavy grouped stages with
    # heavy-tailed group costs (the per-component merge: stage event logs
    # showed 8 of 73 tasks carrying half the stage's core-seconds and a
    # 55 s straggler tail at 16 cores — finer hash partitions isolate the
    # heavy groups and halve the tail). Do NOT raise it for data-heavy
    # shuffles: 4× reducers on the token-replicated scorer shuffle
    # measured 2.5× the stage's core-seconds (shuffle fragmentation +
    # per-task fixed cost dominate when each reduce partition is large).
    n = factor * max(
        int(spark.conf.get("spark.sql.shuffle.partitions")),
        spark.sparkContext.defaultParallelism,
    )
    return df.repartition(n, *keys)
