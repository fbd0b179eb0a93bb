"""Greedy agglomerative merge — the reference's clustering core.

Re-creates the delta-iteration merge (model/functions/merge/
MergeExecution.java:139-297 + DeltaIterateMergeMusicStepFunction.java:45-163)
as a per-blocking-key local fixpoint inside ``applyInPandas``:

The reference's distributed delta iteration exists because Flink lacks
cheap driver loops; but every superstep's work is confined to one blocking
key (pairs are created per blocking label and never cross keys —
MergeMusicTripletCreator.java:25-49). Blocks are small (≲ hundreds of
entities), so running the *entire* greedy fixpoint locally per key group is
semantically identical — same greedy order, same tie-breaks — and removes
~#supersteps × 4 shuffles. At 100 TB the reference's design would shuffle
the whole workset once per superstep; this design shuffles the candidate
set exactly once (groupBy blocking_key).

Greedy order per superstep (DeltaIterateMergeMusicStepFunction.java:104-131
+ MaxSimMinIdMusicReducer.java:14-47): pick the max-sim pair, ties broken
by min(small id) then min(big id); merge the two clusters (union members,
OR source masks, keep min id — DualMergeMusicMapper.java:22-129); drop
pairs touching merged clusters whose source sets now overlap or whose
combined source count exceeds the limit (CheckRestrictionsFilterFunction
.java:27-50); recompute sims of surviving neighbor pairs against the merged
cluster; repeat until no pair ≥ threshold remains.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MERGE_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("members", T.ArrayType(T.LongType()), False),
        T.StructField("sources_mask", T.LongType(), False),
        T.StructField("label", T.StringType(), True),
        T.StructField("blocking_key", T.StringType(), True),
    ]
)


def _popcount(x: int) -> int:
    return bin(x).count("1")


def greedy_merge_block(
    pdf: pd.DataFrame,
    threshold: float,
    max_sources: int,
    sim_fn: Callable[[dict, dict], float | None],
) -> pd.DataFrame:
    """Local greedy fixpoint for one blocking key.

    ``pdf`` columns: id, members (list[int]), sources_mask, label, and any
    attribute columns ``sim_fn`` consumes; plus precomputed candidate pairs
    are NOT passed — they are re-derived locally (block is small).

    ``sim_fn(a, b)`` → similarity of two cluster dicts (None = no vote).
    """
    clusters: dict[int, dict] = {}
    for row in pdf.to_dict("records"):
        row["members"] = list(row["members"])
        clusters[row["id"]] = row

    def valid(a: dict, b: dict) -> bool:
        if a["sources_mask"] & b["sources_mask"]:
            return False
        return (
            _popcount(a["sources_mask"]) + _popcount(b["sources_mask"])
            <= max_sources
        )

    # initial candidate pairs (i<j) with restrictions
    ids = sorted(clusters)
    heap: dict[tuple[int, int], float] = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if valid(clusters[a], clusters[b]):
                s = sim_fn(clusters[a], clusters[b])
                if s is not None and s >= threshold:
                    heap[(a, b)] = s

    while heap:
        # max sim, tie → min small id, then min big id
        (a, b), _s = max(heap.items(), key=lambda kv: (kv[1], -kv[0][0], -kv[0][1]))
        ca, cb = clusters[a], clusters[b]
        keep, drop = (a, b) if a < b else (b, a)
        merged = dict(clusters[keep])
        merged["members"] = sorted(ca["members"] + cb["members"])
        merged["sources_mask"] = ca["sources_mask"] | cb["sources_mask"]
        # attribute fusion: prefer the longer sane label
        la, lb = ca.get("label") or "", cb.get("label") or ""
        merged["label"] = la if len(la) >= len(lb) else lb
        clusters[keep] = merged
        del clusters[drop]
        # remove pairs touching either merged id
        heap = {
            pair: s
            for pair, s in heap.items()
            if keep not in pair and drop not in pair
        }
        # re-pair the merged cluster against remaining clusters
        for other in clusters:
            if other == keep:
                continue
            if valid(merged, clusters[other]):
                s = sim_fn(merged, clusters[other])
                if s is not None and s >= threshold:
                    pair = (min(keep, other), max(keep, other))
                    heap[pair] = s

    return pd.DataFrame(
        [
            {
                "id": c["id"],
                "members": c["members"],
                "sources_mask": c["sources_mask"],
                "label": c.get("label"),
                "blocking_key": c.get("blocking_key"),
            }
            for c in clusters.values()
        ],
        columns=["id", "members", "sources_mask", "label", "blocking_key"],
    )


def merge_execution(
    representatives: DataFrame,
    threshold: float,
    max_sources: int,
    sim_fn: Callable[[dict, dict], float | None] | None = None,
    block_col: str = "blocking_key",
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """MergeExecution (MergeExecution.java:139-297): greedy agglomerative
    merge of cluster representatives within each blocking key.

    ``representatives`` needs: id(long), members(array<long>),
    sources_mask(long), label(string), blocking_key(string) [+ extra_cols
    consumed by ``sim_fn``]. Default ``sim_fn`` = cosine over padded
    character trigram sets of the label (the reference's "ct" metric).
    """
    if sim_fn is None:
        from ..functions.local_sim import cosine_trigram_local

        def sim_fn(a, b):  # noqa: F811
            return cosine_trigram_local(a.get("label"), b.get("label"))

    cols = ["id", "members", "sources_mask", "label", block_col] + (extra_cols or [])

    def solve(pdf: pd.DataFrame) -> pd.DataFrame:
        return greedy_merge_block(pdf, threshold, max_sources, sim_fn)

    from ..util import parallel_grouped

    return (
        # factor=4: narrow rows, python-CPU-heavy heavy-tailed groups —
        # finer partitions isolate the big components (see parallel_grouped)
        parallel_grouped(representatives.select(*cols), block_col, factor=4)
        .groupBy(block_col)
        .applyInPandas(solve, schema=MERGE_RESULT_SCHEMA)
    )
