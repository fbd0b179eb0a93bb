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
    # round-0 LSH candidate union: catches pairs whose prefix blocking keys
    # diverged (typo in the first chars, dropped first token — the recall
    # gap of pure prefix blocking; the reference offers LSH_BLOCKING as an
    # alternative strategy, we run it as a complement)
    use_lsh_round0: bool = True
    lsh_bands: int = 12
    lsh_rows_per_band: int = 3
    lsh_seed: int = 42


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


def _round_pairs(
    clusters: DataFrame,
    cfg: ClusterRoundConfig,
    extra_pair_ids: DataFrame | None = None,
) -> DataFrame:
    """Candidate pairs between current clusters with restrictions.
    ``extra_pair_ids`` (src, dst) — e.g. LSH candidates — are unioned in
    with payloads joined back, then the pair set is deduplicated."""
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
    if extra_pair_ids is not None:
        side = clusters.select(
            "id", "blocking_key", *[F.col(c) for c in payload]
        )
        lp = (
            extra_pair_ids.join(
                side.select(
                    F.col("id").alias("src"),
                    F.col("blocking_key"),
                    *[F.col(c).alias(f"src_{c}") for c in payload],
                ),
                "src",
            )
            .join(
                side.select(
                    F.col("id").alias("dst"),
                    *[F.col(c).alias(f"dst_{c}") for c in payload],
                ),
                "dst",
            )
            .filter(
                (
                    F.col("src_sources_mask").bitwiseAND(F.col("dst_sources_mask"))
                    == 0
                )
                & (
                    F.bit_count(F.col("src_sources_mask"))
                    + F.bit_count(F.col("dst_sources_mask"))
                    <= cfg.max_sources
                )
            )
            .select(*pairs.columns)
        )
        pairs = pairs.unionByName(lp).dropDuplicates(["src", "dst"])
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


def candidate_components(state: DataFrame, cfg: ClusterRoundConfig) -> DataFrame:
    """Decomposition pass (the reference's DefaultPreprocessing →
    ConnectedComponentIdAdder chain, preprocessing/DefaultPreprocessing
    .java:39-60): candidate pairs = blocked pairs ∪ LSH pairs, sim ≥
    threshold, then connected components over them. Returns (id, cc).

    Components become the merge grouping — every record reachable through
    above-threshold candidates is clusterable with its peers even when
    their prefix blocking keys diverged (the recall limit of pure prefix
    blocking)."""
    extra = None
    if cfg.use_lsh_round0:
        from .blocking import lsh_pairs

        extra = lsh_pairs(
            state,
            trigram_col="trigram_set",
            id_col="id",
            bands=cfg.lsh_bands,
            rows_per_band=cfg.lsh_rows_per_band,
            seed=cfg.lsh_seed,
        )
    pairs = _round_pairs(state, cfg, extra_pair_ids=extra)
    from .graph import connected_components

    return connected_components(
        pairs.select("src", "dst"),
        vertices=state.select("id"),
        id_col="id",
        cc_col="cc",
    )


def cluster_rounds(
    state: DataFrame, cfg: ClusterRoundConfig | None = None
) -> DataFrame:
    """Cluster an existing cluster-state DataFrame (id, members,
    sources_mask, label, blocking_key, trigram_set, n_members
    [, fingerprint]).

    Stage 1 (decomposition): candidate components over blocked ∪ LSH
    above-threshold pairs — the grouping within which merging happens.
    Stage 2 (merge): iterative reciprocal-best rounds keyed by component.
    The returned state's ``blocking_key`` is restored to the prefix key of
    the fused label (so downstream/streaming re-keying stays stable)."""
    cfg = cfg or ClusterRoundConfig()
    clusters = state.localCheckpoint(eager=True)
    cc = candidate_components(clusters, cfg)
    clusters = (
        clusters.drop("blocking_key")
        .join(cc, "id")
        .withColumn("blocking_key", F.col("cc").cast("string"))
        .drop("cc")
        .localCheckpoint(eager=True)
    )
    # rounds below re-pair within components only; LSH already consumed
    cfg = ClusterRoundConfig(**{**cfg.__dict__, "use_lsh_round0": False})
    # Work-set pruning: any block holding a pair ≥ min_sim always yields at
    # least one reciprocal-best match (the block's global max pair is
    # reciprocal-best by definition), so a block with NO match this round
    # can never match again — its clusters leave the iteration for good.
    # This shrinks the per-round shuffles to the still-active blocks only
    # (the delta-iteration workset semantics of MergeExecution.java:170-181).
    finished: list = []
    for rnd in range(cfg.max_rounds):
        extra = None
        if rnd == 0 and cfg.use_lsh_round0:
            from .blocking import lsh_pairs

            extra = lsh_pairs(
                clusters,
                trigram_col="trigram_set",
                id_col="id",
                bands=cfg.lsh_bands,
                rows_per_band=cfg.lsh_rows_per_band,
                seed=cfg.lsh_seed,
            )
        matches = max_both_selection(
            _round_pairs(clusters, cfg, extra_pair_ids=extra), sim_col="agg_sim"
        ).localCheckpoint(eager=True)
        if matches.isEmpty():
            break
        # key set is usually small after round 1; AQE broadcasts it when so.
        # A cluster leaves the workset iff its block is inactive AND it was
        # not itself matched (an LSH cross-block match can pull a cluster
        # out of an otherwise-inactive block).
        active_keys = matches.select("blocking_key").distinct()
        matched_ids = (
            matches.select(F.col("src").alias("id"))
            .unionByName(matches.select(F.col("dst").alias("id")))
            .distinct()
        )
        inactive = clusters.join(active_keys, "blocking_key", "left_anti")
        finished.append(inactive.join(matched_ids, "id", "left_anti"))
        working = clusters.join(
            active_keys, "blocking_key", "left_semi"
        ).unionByName(inactive.join(matched_ids, "id", "left_semi"))
        clusters = _merge_matches(working, matches, cfg).localCheckpoint(eager=True)
    for part in finished:
        clusters = clusters.unionByName(part)
    # restore a content-derived blocking key (component ids are run-local)
    from ..functions.text import music_blocking_label

    return clusters.withColumn(
        "blocking_key", music_blocking_label(F.col("label"), 4)
    )


def iterative_max_both_clustering(
    prepared: DataFrame, cfg: ClusterRoundConfig | None = None
) -> DataFrame:
    """Cluster prepared records end-to-end (see ``cluster_rounds``)."""
    cfg = cfg or ClusterRoundConfig()
    return cluster_rounds(_cluster_state(prepared, cfg.use_audio), cfg)
