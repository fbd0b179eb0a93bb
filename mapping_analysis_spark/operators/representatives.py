"""Cluster representative creation (majority-vote attribute fusion).

Re-creates decomposition/representative/
MusicMajorityPropertiesGroupReduceFunction.java:23-151 +
RepresentativeCreatorMultiMerge.java:31-47 as pure DataFrame aggregation:

Per cluster group:
* cluster id = min member id (the reference keeps the minimum vertex id)
* ``members``  = sorted member ids, ``sources`` = sorted distinct sources
* every fused attribute = the group's most frequent non-null value, ties
  broken by the longer string then lexicographic (Utils.getFinalValue,
  Utils.java:63-84 picks max count, then longer value)
* numeric attrs (fingerprint) = element-wise mean (new audio channel)

Mode ("majority value") is computed distributively: count per
(cluster, value) then a window rank ordered (count desc, length desc,
value asc) — two shuffles on the cluster key, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def majority_value(
    df: DataFrame, cluster_col: str, value_col: str, out_col: str | None = None
) -> DataFrame:
    """(cluster, majority value) — max count, tie → longer value, then
    lexicographically smaller (deterministic)."""
    out_col = out_col or value_col
    counts = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(cluster_col, value_col)
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    w = Window.partitionBy(cluster_col).orderBy(
        F.desc("_cnt"), F.desc(F.length(value_col)), F.asc(value_col)
    )
    return (
        counts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(cluster_col, F.col(value_col).alias(out_col))
    )


def create_representatives(
    members: DataFrame,
    cluster_col: str = "cc_id",
    id_col: str = "clip_id",
    source_col: str = "source",
    text_col: str = "transcript",
    fingerprint_col: str | None = "fingerprint",
    source_bits: dict[str, int] | None = None,
) -> DataFrame:
    """Fuse member rows into one representative per cluster.

    Output: (cluster_id = min member id, members, sources, sources_mask,
    <text_col> = majority value, fingerprint = element-wise mean,
    n_members). The bit-packed source mask mirrors
    AbstractionUtils.getSourcesInt (AbstractionUtils.java:52-61) so overlap
    checks downstream are single AND ops.
    """
    from ..schema import SOURCE_BITS

    source_bits = source_bits or SOURCE_BITS
    bit_expr = F.coalesce(
        *[
            F.when(F.col(source_col) == k, F.lit(v))
            for k, v in source_bits.items()
        ],
        F.lit(0),
    )
    base = members.withColumn("_bit", bit_expr.cast("long"))
    aggs = [
        F.min(id_col).alias("cluster_id"),
        F.sort_array(F.collect_list(id_col)).alias("members"),
        F.sort_array(F.collect_set(source_col)).alias("sources"),
        # OR of bits == sum of distinct bits; bit_or is exact
        F.expr("bit_or(_bit)").alias("sources_mask"),
        F.count(F.lit(1)).alias("n_members"),
    ]
    has_fp = fingerprint_col is not None and fingerprint_col in members.columns
    if has_fp:
        aggs.append(
            F.collect_list(fingerprint_col).alias("_fps")
        )
    rep = base.groupBy(cluster_col).agg(*aggs)
    if has_fp:
        # element-wise mean over the collected fingerprints (post-agg, so
        # the collect_list is evaluated once)
        summed = F.aggregate(
            F.col("_fps"),
            F.expr("cast(array() as array<double>)"),
            lambda acc, x: F.when(F.size(acc) == 0, x.cast("array<double>")).otherwise(
                F.zip_with(acc, x, lambda a, b: a + b.cast("double"))
            ),
        )
        rep = rep.withColumn(
            "fingerprint",
            F.when(
                F.size("_fps") > 0,
                F.transform(summed, lambda v: (v / F.size("_fps")).cast("float")),
            ),
        ).drop("_fps")
    fused_text = majority_value(base, cluster_col, text_col)
    return rep.join(fused_text, cluster_col, "left")
