"""End-to-end batch entity-resolution pipeline over the clips table.

Spark-first re-creation of the reference's MusicbrainzBenchmark lifecycle
(analysis-examples/.../MusicbrainzBenchmark.java:55-166) — one lazily
planned DataFrame program instead of five Flink jobs with JSON handoffs:

  prepare → blocking → candidate pairs (salted self-join) → pair similarity
  (native trigram cosine + MFCC cosine, mean-agg) → threshold → match
  selection (MAX_BOTH reciprocal-best) → connected components → majority
  representatives

The transcript plays the reference's ``artistTitleAlbum`` role; the MFCC
fingerprint adds the graft's audio channel, fused through the same
mean-aggregation semantics (absent channel = no vote,
MeanAggregationFunction.java:26-49).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .functions.audio import fingerprint_cosine, mfcc_fingerprint
from .functions.similarity import (
    cosine_trigram_from_sets,
    mean_agg_sim,
    trigram_set,
)
from .functions.text import music_blocking_label, simplify, stable_hash64
from .operators.blocking import block_pairs, salted_block_pairs
from .operators.graph import connected_components
from .operators.incremental import max_both_selection
from .operators.representatives import create_representatives
from .schema import SOURCE_BITS


@dataclass
class PipelineConfig:
    """Mirrors the reference's IncrementalConfig knobs
    (MusicbrainzBenchmark.java:56-77)."""

    blocking_length: int = 4
    min_sim: float = 0.7            # merge minSim (bench uses 0.8; csimq best 0.55)
    max_sources: int = 5
    use_audio: bool = True
    audio_weight_equal: bool = True  # mean-agg over present channels
    max_block_rows: int = 256        # salting threshold (scale knob)
    source_bits: dict = field(default_factory=lambda: dict(SOURCE_BITS))


def prepare(clips: DataFrame, cfg: PipelineConfig | None = None) -> DataFrame:
    """Derive engine columns: id (stable 64-bit from clip_id), normalized
    transcript, blocking key, trigram set, source bit, MFCC fingerprint.

    All but the fingerprint are native Columns (whole-stage codegen); the
    fingerprint is one Arrow-batched pandas UDF per clip — computed ONCE
    here, before any pair join, so the quadratic pair stage reuses the
    per-record arrays (the reference recomputes string sims per pair,
    row-at-a-time)."""
    cfg = cfg or PipelineConfig()
    out = (
        clips.withColumn("id", stable_hash64(F.col("clip_id")))
        .withColumn("transcript_norm", simplify(F.col("transcript")))
        .withColumn(
            "blocking_key",
            music_blocking_label(F.col("transcript"), cfg.blocking_length),
        )
        .withColumn("trigram_set", trigram_set(F.col("transcript")))
        .withColumn(
            "source_bit",
            F.coalesce(
                *[
                    F.when(F.col("source") == k, F.lit(v))
                    for k, v in cfg.source_bits.items()
                ],
                F.lit(0),
            ).cast("long"),
        )
    )
    if cfg.use_audio and "bytes" in clips.columns:
        out = out.withColumn(
            "fingerprint",
            mfcc_fingerprint(F.col("bytes"), F.col("codec"), F.col("sr_hz")),
        )
    # the raw audio is consumed entirely by the fingerprint UDF — dropping
    # it here keeps the persisted/shuffled record ~KB instead of ~MB (at
    # 10^12 clips the payload must never travel past the scan stage)
    return out.drop("bytes")


def candidate_pairs(prepared: DataFrame, cfg: PipelineConfig | None = None) -> DataFrame:
    """Blocked candidate pairs with the cross-source restriction
    (CheckRestrictionsFilterFunction.java:27-50: no source overlap) and
    skew salting for oversized blocks."""
    cfg = cfg or PipelineConfig()
    payload = ["trigram_set", "source_bit", "clip_id"]
    if "fingerprint" in prepared.columns:
        payload.append("fingerprint")
    restrict = F.col("l.source_bit") != F.col("r.source_bit")
    if cfg.max_block_rows:
        return salted_block_pairs(
            prepared,
            key_col="blocking_key",
            id_col="id",
            max_block_rows=cfg.max_block_rows,
            restrict=restrict,
            payload_cols=payload,
        )
    return block_pairs(
        prepared,
        key_col="blocking_key",
        id_col="id",
        restrict=restrict,
        payload_cols=payload,
    )


def pair_similarity(pairs: DataFrame, cfg: PipelineConfig | None = None) -> DataFrame:
    """Per-pair similarity: transcript trigram cosine + (optional) MFCC
    cosine, fused by mean over present channels, 6dp — all native Columns,
    zero Python in this stage."""
    cfg = cfg or PipelineConfig()
    sim_text = cosine_trigram_from_sets(
        F.col("src_trigram_set"), F.col("dst_trigram_set")
    )
    channels = [sim_text.alias("sim_text")]
    if "src_fingerprint" in pairs.columns and cfg.use_audio:
        channels.append(
            fingerprint_cosine(
                F.col("src_fingerprint"), F.col("dst_fingerprint")
            ).alias("sim_audio")
        )
    out = pairs.select(
        "src",
        "dst",
        "blocking_key",
        F.col("src_clip_id"),
        F.col("dst_clip_id"),
        *channels,
    )
    sims = [F.col("sim_text")]
    if len(channels) > 1:
        sims.append(F.col("sim_audio"))
    return out.withColumn("agg_sim", mean_agg_sim(*sims, scale=6))


def run_batch(
    clips: DataFrame, cfg: PipelineConfig | None = None
) -> dict[str, DataFrame]:
    """Full batch pipeline; returns the intermediate DataFrames too (the
    reference materializes each stage to JSON — we expose them lazily).

    Clustering = connected components over reciprocal-best matches. With
    cross-source-only pairs and max-both selection, components stay small
    and source-consistent — the same guarantee the reference's greedy merge
    provides for its default MAX_BOTH incremental path
    (SourceAdditionClustering.java:62-191)."""
    from pyspark.sql import Observation

    from .operators.clustering import ClusterRoundConfig, iterative_max_both_clustering

    cfg = cfg or PipelineConfig()
    # prepared is consumed by the round loop AND the final member join;
    # persist so the fingerprint UDF runs once per record, not per consumer.
    # df.observe rides the first action over it — per-stage row counters
    # (the reference's accumulators, Constants.java:33-87) at zero extra
    # jobs; read them via result["observations"][name].get after an action.
    obs_in = Observation("pipeline_input")
    in_aggs = [
        F.count(F.lit(1)).alias("rows"),
        # observe() forbids distinct aggregates (CollectMetrics); the HLL
        # sketch is the streaming-safe equivalent
        F.approx_count_distinct("blocking_key").alias("blocking_keys"),
    ]
    if cfg.use_audio and "bytes" in clips.columns:
        in_aggs.append(F.count(F.col("fingerprint")).alias("with_fingerprint"))
    prepared = prepare(clips, cfg).observe(obs_in, *in_aggs).persist()
    state = iterative_max_both_clustering(
        prepared,
        ClusterRoundConfig(
            min_sim=cfg.min_sim,
            max_sources=cfg.max_sources,
            max_block_rows=cfg.max_block_rows,
            use_audio=cfg.use_audio,
        ),
    )
    # map cluster state (member = long id) back to clip rows, then fuse
    membership = state.select(
        F.col("id").alias("cc_id"), F.explode("members").alias("id")
    )
    members = prepared.join(membership, "id", "left").withColumn(
        "cc_id", F.coalesce(F.col("cc_id"), F.col("id"))
    )
    obs_out = Observation("pipeline_output")
    reps = create_representatives(
        members,
        cluster_col="cc_id",
        id_col="clip_id",
        source_col="source",
        text_col="transcript",
        fingerprint_col="fingerprint" if cfg.use_audio else None,
        source_bits=cfg.source_bits,
    ).observe(
        obs_out,
        F.count(F.lit(1)).alias("clusters"),
        F.sum("n_members").alias("members_total"),
        F.max("n_members").alias("max_cluster_size"),
    )
    return {
        "prepared": prepared,
        "state": state,
        "clusters": reps,
        "observations": {"pipeline_input": obs_in, "pipeline_output": obs_out},
    }
