"""Iterative MAX_BOTH clustering — the engine's distributed clustering core.

Re-creates the reference's agglomerative clustering semantics (the delta-
iteration merge, merge/MergeExecution.java:139-297, and the incremental
MAX_BOTH path, clusterstrategies/SourceAdditionClustering.java:62-191) as a
driver loop of fully distributed DataFrame rounds:

  round: candidate pairs between current clusters (blocked, salted,
         source-overlap + max-source restrictions
         — CheckRestrictionsFilterFunction.java:27-50)
       → pair similarity (trigram cosine + optional MFCC cosine, mean-agg)
       → threshold ≥ min_sim
       → MAX_BOTH reciprocal-best selection (MaxBothSelection.java:27-82)
       → merge each matched pair: min id survives, union members, OR source
         masks, keep the longer label, member-weighted mean fingerprint
         (DualMergeMusicMapper.java:22-129)
       → repeat until no pair survives.

A cluster of k duplicates converges in ≤ ⌈log2 k⌉ + slack rounds (each
round halves the cluster count along reciprocal-best chains); k ≤ #sources
(duplicate-free sources), so ~3-4 rounds at 5 sources. Every round is a
constant number of shuffles — no per-key Python fixpoint, so a hot blocking
key never serializes onto one core (contrast: merge.merge_execution runs
the exact greedy order per block for parity testing; this operator is the
scale path).

Difference vs the reference's greedy order: the reference merges ONE best
pair per blocking key per superstep (DeltaIterateMergeMusicStepFunction
.java:104-131); MAX_BOTH merges every reciprocal-best pair concurrently.
Reciprocal-best pairs are exactly the pairs the greedy order would pick
first within their neighborhoods, so results differ only on ties across
overlapping neighborhoods — the reference itself ships MAX_BOTH as its
recommended incremental selection (published F1 0.9336 baseline uses it).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.audio import fingerprint_cosine
from ..functions.similarity import (
    cosine_trigram_from_sets,
    mean_agg_sim,
    trigram_set,
)
from .blocking import salted_block_pairs
from .incremental import max_both_selection


@dataclass
class ClusterRoundConfig:
    min_sim: float = 0.7
    max_sources: int = 5
    max_block_rows: int = 256
    use_audio: bool = True
    max_rounds: int = 8


def _cluster_state(prepared: DataFrame, use_audio: bool) -> DataFrame:
    """Singleton cluster per record: (id, members, sources_mask, label,
    blocking_key, trigram_set[, fingerprint, n_members])."""
    cols = [
        F.col("id"),
        F.array(F.col("id")).alias("members"),
        F.col("source_bit").alias("sources_mask"),
        F.col("transcript_norm").alias("label"),
        F.col("blocking_key"),
        F.col("trigram_set"),
        F.lit(1).alias("n_members"),
    ]
    if use_audio and "fingerprint" in prepared.columns:
        cols.append(F.col("fingerprint"))
    return prepared.select(*cols)


def _round_pairs(clusters: DataFrame, cfg: ClusterRoundConfig) -> DataFrame:
    """Candidate pairs between current clusters with restrictions."""
    payload = ["members", "sources_mask", "label", "trigram_set", "n_members"]
    if cfg.use_audio and "fingerprint" in clusters.columns:
        payload.append("fingerprint")
    restrict = (
        (F.col("l.sources_mask").bitwiseAND(F.col("r.sources_mask")) == 0)
        & (
            F.bit_count(F.col("l.sources_mask")) + F.bit_count(F.col("r.sources_mask"))
            <= cfg.max_sources
        )
    )
    pairs = salted_block_pairs(
        clusters,
        key_col="blocking_key",
        id_col="id",
        max_block_rows=cfg.max_block_rows,
        restrict=restrict,
        payload_cols=payload,
    )
    sims = [
        cosine_trigram_from_sets(
            F.col("src_trigram_set"), F.col("dst_trigram_set")
        ).alias("sim_text")
    ]
    if cfg.use_audio and "src_fingerprint" in pairs.columns:
        sims.append(
            fingerprint_cosine(
                F.col("src_fingerprint"), F.col("dst_fingerprint")
            ).alias("sim_audio")
        )
    sim_cols = [F.col("sim_text")] + (
        [F.col("sim_audio")] if len(sims) > 1 else []
    )
    return (
        pairs.select("*", *sims)
        .withColumn("agg_sim", mean_agg_sim(*sim_cols, scale=6))
        .filter(F.col("agg_sim") >= cfg.min_sim)
    )


def _merge_matches(clusters: DataFrame, matches: DataFrame, cfg: ClusterRoundConfig) -> DataFrame:
    """Apply one round of pair merges to the cluster state.

    ``matches`` carries both sides' payloads (src_* / dst_*) from the pair
    join, so the merge is a pure projection — no join back to state needed
    for the merged rows; untouched rows survive via anti-join.
    """
    touched = matches.select(F.col("src").alias("id")).unionByName(
        matches.select(F.col("dst").alias("id"))
    )
    untouched = clusters.join(touched, "id", "left_anti")
    longer = F.length(F.col("src_label")) >= F.length(F.col("dst_label"))
    fused_label = F.when(longer, F.col("src_label")).otherwise(F.col("dst_label"))
    merged_cols = [
        # canonical pairs have src < dst → min id survives (DualMergeMusicMapper keeps min)
        F.col("src").alias("id"),
        F.sort_array(F.concat(F.col("src_members"), F.col("dst_members"))).alias(
            "members"
        ),
        F.col("src_sources_mask")
        .bitwiseOR(F.col("dst_sources_mask"))
        .alias("sources_mask"),
        fused_label.alias("label"),
        F.col("blocking_key"),
        trigram_set(fused_label).alias("trigram_set"),
        (F.col("src_n_members") + F.col("dst_n_members")).alias("n_members"),
    ]
    if cfg.use_audio and "src_fingerprint" in matches.columns:
        merged_cols.append(
            F.when(
                F.col("src_fingerprint").isNull(), F.col("dst_fingerprint")
            )
            .when(F.col("dst_fingerprint").isNull(), F.col("src_fingerprint"))
            .otherwise(
                F.zip_with(
                    F.col("src_fingerprint"),
                    F.col("dst_fingerprint"),
                    lambda a, b: (
                        (
                            a.cast("double") * F.col("src_n_members")
                            + b.cast("double") * F.col("dst_n_members")
                        )
                        / (F.col("src_n_members") + F.col("dst_n_members"))
                    ).cast("float"),
                )
            )
            .alias("fingerprint")
        )
    merged = matches.select(*merged_cols)
    return untouched.unionByName(merged)


def iterative_max_both_clustering(
    prepared: DataFrame, cfg: ClusterRoundConfig | None = None
) -> DataFrame:
    """Cluster prepared records; returns the final cluster state
    (id, members: array<long>, sources_mask, label, blocking_key,
    n_members[, fingerprint])."""
    cfg = cfg or ClusterRoundConfig()
    clusters = _cluster_state(prepared, cfg.use_audio).localCheckpoint(eager=True)
    # Work-set pruning: any block holding a pair ≥ min_sim always yields at
    # least one reciprocal-best match (the block's global max pair is
    # reciprocal-best by definition), so a block with NO match this round
    # can never match again — its clusters leave the iteration for good.
    # This shrinks the per-round shuffles to the still-active blocks only
    # (the delta-iteration workset semantics of MergeExecution.java:170-181).
    finished: list = []
    for _ in range(cfg.max_rounds):
        matches = max_both_selection(
            _round_pairs(clusters, cfg), sim_col="agg_sim"
        ).localCheckpoint(eager=True)
        if matches.isEmpty():
            break
        # key set is usually small after round 1; AQE broadcasts it when so
        active_keys = matches.select("blocking_key").distinct()
        finished.append(clusters.join(active_keys, "blocking_key", "left_anti"))
        working = clusters.join(active_keys, "blocking_key", "left_semi")
        clusters = _merge_matches(working, matches, cfg).localCheckpoint(eager=True)
    for part in finished:
        clusters = clusters.unionByName(part)
    return clusters
