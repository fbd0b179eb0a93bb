"""Quality evaluation — pairwise precision / recall / F1 vs a gold mapping.

Re-creates util/QualityUtils.java:247-273 + QualityEdgeCreator:

* test links = all i<j member pairs of each produced cluster
* gold links = all i<j pairs of each gold cluster id
* TP = |test ∩ gold| (join on both ids); P = TP/|test|, R = TP/|gold|,
  F1 = 2PR/(P+R); 4dp as the reference prints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cluster_pairs(
    clusters: DataFrame, members_col: str = "members"
) -> DataFrame:
    """All i<j member pairs per cluster (QualityEdgeCreator) — explode the
    members array twice with an ordering predicate; stays JVM-side."""
    return (
        clusters.select(F.explode(members_col).alias("a"), F.col(members_col))
        .select("a", F.explode(members_col).alias("b"))
        .filter(F.col("a") < F.col("b"))
        .select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .dropDuplicates(["src", "dst"])
    )


def gold_pairs(gold: DataFrame, id_col: str = "clip_id", gold_col: str = "gold_cluster") -> DataFrame:
    """Gold link expansion (QualityUtils.java:125-133): all i<j pairs within
    each gold cluster."""
    l = gold.select(gold_col, F.col(id_col).alias("src")).alias("l")
    r = gold.select(gold_col, F.col(id_col).alias("dst")).alias("r")
    return l.join(
        r,
        (F.col(f"l.{gold_col}") == F.col(f"r.{gold_col}")) & (F.col("src") < F.col("dst")),
    ).select("src", "dst")


def pairwise_quality(test_pairs: DataFrame, gold: DataFrame) -> dict:
    """P/R/F1 (QualityUtils.java:247-273). Returns python floats (4dp, as
    the reference rounds when printing)."""
    n_test = test_pairs.count()
    n_gold = gold.count()
    tp = test_pairs.join(gold, ["src", "dst"], "inner").count()
    precision = tp / n_test if n_test else 0.0
    recall = tp / n_gold if n_gold else 0.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if precision + recall
        else 0.0
    )
    return {
        "tp": tp,
        "n_test": n_test,
        "n_gold": n_gold,
        "precision": round(precision, 4),
        "recall": round(recall, 4),
        "f1": round(f1, 4),
    }
