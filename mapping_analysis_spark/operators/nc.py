"""NC-domain (person-record) entity resolution — the composed path.

Behavioral re-creation of the reference's North-Carolina voter pipeline
wiring (model/functions/NcLshCandidateTupleCreator.java:69-120 and the
incremental Hungarian selection HungarianAlgorithmReduceFunction.java:27-181,
driven by integration/IncrementalNcClusteringTest.java): records carry
(name, surname, number/postcode, source); blocking key = prefix(name,k) +
prefix(surname,k) (Utils.getNcBlockingLabel, Utils.java:208-233); candidate
pairs come from standard blocking plus trigram-MinHash LSH over the full
name; pair similarity = cosine trigram of "name surname" fused with the
repaired number equality channel (SinglePropertySimilarity.java:82-119:
s→5 l→1 |→1 z→2 o→0 q→4 g→9 first) through mean aggregation; selection is
the per-block optimal 1:1 Hungarian assignment, oriented existing-state ×
new-arrivals so sides stay disjoint.

Scale shape: the blocked self-join is salted (BLOCK_SPLIT intent), only ids
ride the pair shuffle (payloads joined back per side for scoring), the LSH
complement is seeded and bucket-capped — identical plans at N and 4N.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.similarity import (
    cosine_trigram_from_sets,
    mean_agg_sim,
    number_sim,
    trigram_set,
)
from ..functions.text import nc_blocking_label, stable_hash64
from .blocking import lsh_pairs, salted_block_pairs


def nc_prepare(
    df: DataFrame,
    name_col: str = "name",
    surname_col: str = "surname",
    number_col: str = "number",
    source_col: str = "source",
    id_col: str | None = None,
    blocking_length: int = 4,
    source_bits: dict[str, int] | None = None,
) -> DataFrame:
    """Derive the NC engine columns: stable id, blocking key, full-name
    trigram set, repaired number, source bit. All native Columns."""
    name = F.coalesce(F.lower(F.col(name_col)), F.lit(""))
    surname = F.coalesce(F.lower(F.col(surname_col)), F.lit(""))
    out = df.withColumn(
        "id",
        F.col(id_col).cast("long")
        if id_col
        else stable_hash64(F.concat_ws("|", F.col(source_col), name, surname)),
    )
    full_name = F.trim(F.concat_ws(" ", name, surname))
    if source_bits:
        bit = F.coalesce(
            *[
                F.when(F.col(source_col) == k, F.lit(v))
                for k, v in source_bits.items()
            ],
            F.lit(0),
        ).cast("long")
    else:
        # sources are opaque strings: one deterministic bit per source id
        bit = F.shiftleft(
            F.lit(1).cast("long"),
            F.pmod(F.xxhash64(F.col(source_col)), F.lit(60)).cast("int"),
        )
    return (
        out.withColumn(
            "blocking_key", nc_blocking_label(name, surname, blocking_length)
        )
        .withColumn("full_name", full_name)
        .withColumn("trigram_set", trigram_set(full_name))
        .withColumn(
            "number_repaired",
            F.translate(F.lower(F.col(number_col).cast("string")), "sl|zoqg", "5112049"),
        )
        .withColumn("source_bit", bit)
    )


def nc_candidate_pairs(
    prepared: DataFrame,
    min_sim: float = 0.7,
    use_lsh: bool = True,
    bands: int = 15,
    rows_per_band: int = 2,
    seed: int = 42,
    max_block_rows: int = 256,
    restrict: Column | None = None,
) -> DataFrame:
    """Scored NC candidate pairs ≥ ``min_sim``.

    Candidates = salted standard blocking on the NC key ∪ (optional) LSH
    over full-name trigrams (NcLshCandidateTupleCreator.java:69-120 runs
    LSH as THE candidate source; standard blocking is the recall floor).
    Cross-source restriction is applied inside the join; similarity is
    scored once on the deduplicated id pairs with payloads equi-joined
    back per side (never shuffled through the pair explosion).
    Returns (src, dst, blocking_key, sim_name, sim_number, agg_sim).
    """
    if restrict is None:
        restrict = F.col("l.source_bit") != F.col("r.source_bit")
    pair_ids = salted_block_pairs(
        prepared.select("id", "blocking_key", "source_bit", "_side")
        if "_side" in prepared.columns
        else prepared.select("id", "blocking_key", "source_bit"),
        key_col="blocking_key",
        id_col="id",
        max_block_rows=max_block_rows,
        restrict=restrict,
        payload_cols=["source_bit", "_side"]
        if "_side" in prepared.columns
        else ["source_bit"],
    ).select("src", "dst")
    if use_lsh:
        extra = lsh_pairs(
            prepared,
            trigram_col="trigram_set",
            id_col="id",
            bands=bands,
            rows_per_band=rows_per_band,
            seed=seed,
        )
        pair_ids = pair_ids.unionByName(extra).dropDuplicates(["src", "dst"])
    side = prepared.select(
        "id", "blocking_key", "trigram_set", "number_repaired", "source_bit"
    )
    scored = (
        pair_ids.join(
            side.select(
                F.col("id").alias("src"),
                F.col("blocking_key"),
                F.col("trigram_set").alias("_stg"),
                F.col("number_repaired").alias("_sno"),
                F.col("source_bit").alias("_sbit"),
            ),
            "src",
        )
        .join(
            side.select(
                F.col("id").alias("dst"),
                F.col("trigram_set").alias("_dtg"),
                F.col("number_repaired").alias("_dno"),
                F.col("source_bit").alias("_dbit"),
            ),
            "dst",
        )
        # LSH extras bypassed the in-join restriction — re-check here
        .filter(F.col("_sbit") != F.col("_dbit"))
        .select(
            "src",
            "dst",
            "blocking_key",
            cosine_trigram_from_sets(F.col("_stg"), F.col("_dtg")).alias("sim_name"),
            number_sim(F.col("_sno"), F.col("_dno")).alias("sim_number"),
        )
    )
    return scored.withColumn(
        "agg_sim", mean_agg_sim(F.col("sim_name"), F.col("sim_number"), scale=6)
    ).filter(F.col("agg_sim") >= min_sim)


def nc_hungarian_matches(
    state: DataFrame,
    arrivals: DataFrame,
    min_sim: float = 0.7,
    blocking_length: int = 4,
    use_lsh: bool = True,
    seed: int = 42,
) -> DataFrame:
    """Incremental NC step: optimal per-block assignment of a new source's
    records against the existing state (HungarianAlgorithmReduceFunction
    .java:27-181 via the oriented-sides contract).

    ``state`` / ``arrivals`` are *prepared* NC records (nc_prepare). Pairs
    are oriented (src = state row, dst = arrival row) BEFORE the Hungarian
    solve, so one entity can never occupy both a row and a column of a cost
    matrix — the invariant the reference gets from its (cluster, newVertex)
    triplets. Returns matched (src, dst, agg_sim), each id ≤ once per side.
    """
    from .incremental import hungarian_selection

    tag = lambda df, s: df.withColumn("_side", F.lit(s))  # noqa: E731
    both = tag(state, 0).unionByName(tag(arrivals, 1), allowMissingColumns=True)
    restrict = (F.col("l._side") != F.col("r._side")) & (
        F.col("l.source_bit") != F.col("r.source_bit")
    )
    scored = nc_candidate_pairs(
        both,
        min_sim=min_sim,
        use_lsh=use_lsh,
        seed=seed,
        restrict=restrict,
    )
    # orient by side: block_pairs canonicalizes by id, so join the side tags
    # back and flip pairs whose src landed on the arrival side
    sides = both.select("id", "_side")
    oriented = (
        scored.join(sides.select(F.col("id").alias("src"), F.col("_side").alias("_ss")), "src")
        .join(sides.select(F.col("id").alias("dst"), F.col("_side").alias("_ds")), "dst")
        .filter(F.col("_ss") != F.col("_ds"))
        .select(
            "blocking_key",
            F.when(F.col("_ss") <= F.col("_ds"), F.col("src"))
            .otherwise(F.col("dst"))
            .alias("src"),
            F.when(F.col("_ss") <= F.col("_ds"), F.col("dst"))
            .otherwise(F.col("src"))
            .alias("dst"),
            "agg_sim",
        )
    )
    return hungarian_selection(
        oriented, block_col="blocking_key", sim_col="agg_sim", min_sim=min_sim
    )
