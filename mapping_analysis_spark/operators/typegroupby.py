"""TypeGroupBy — untyped vertices adopt the component of their best typed
neighbor.

Re-creates decomposition/typegroupby/TypeGroupBy.java:39-121 (+
NeighborTupleCreator.java:19-35): a vertex with no semantic type takes the
``hash_cc`` of its maximum-similarity typed neighbor (ties → minimum
hash_cc); groups of only-untyped vertices fall back to the minimum cc_id.
Expressed as the two-directional neighbor join + one window argmax — the
distributed equivalent of the reference's groupReduceOnNeighbors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

NO_TYPE = "no_type"


def type_group_by(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    type_col: str = "type",
    cc_col: str = "cc_id",
    hash_cc_col: str = "hash_cc",
    sim_col: str = "agg_sim",
) -> DataFrame:
    """Returns vertices with ``hash_cc`` updated for untyped vertices.

    ``vertices``: (id, type, cc_id, hash_cc); untyped ⇔ type is null/empty/
    NO_TYPE. ``edges``: (src, dst, agg_sim).
    """
    untyped = F.col(type_col).isNull() | (F.col(type_col) == "") | (
        F.col(type_col) == NO_TYPE
    )
    nbrs = edges.select(
        F.col("src").alias("_v"), F.col("dst").alias("_n"), F.col(sim_col)
    ).unionByName(
        edges.select(
            F.col("dst").alias("_v"), F.col("src").alias("_n"), F.col(sim_col)
        )
    )
    nbr_info = nbrs.join(
        vertices.select(
            F.col(id_col).alias("_n"),
            F.col(type_col).alias("_n_type"),
            F.col(hash_cc_col).alias("_n_hash_cc"),
        ),
        "_n",
    ).filter(
        F.col("_n_type").isNotNull()
        & (F.col("_n_type") != "")
        & (F.col("_n_type") != NO_TYPE)
    )
    w = Window.partitionBy("_v").orderBy(F.desc(sim_col), F.asc("_n_hash_cc"))
    best = (
        nbr_info.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(F.col("_v").alias(id_col), F.col("_n_hash_cc").alias("_adopted"))
    )
    # untyped groups with no typed neighbor anywhere: min cc_id of the group
    min_cc = Window.partitionBy(cc_col)
    return (
        vertices.join(best, id_col, "left")
        .withColumn("_fallback", F.min(cc_col).over(min_cc))
        .withColumn(
            hash_cc_col,
            F.when(~untyped, F.col(hash_cc_col)).otherwise(
                F.coalesce(F.col("_adopted"), F.col("_fallback"))
            ),
        )
        .drop("_adopted", "_fallback")
    )


def hash_cc_by_type_overlap(
    vertices: DataFrame,
    id_col: str = "id",
    cc_col: str = "cc_id",
    types_col: str = "types",
) -> DataFrame:
    """Split each connected component into type-compatible groups
    (decomposition/typegroupby/HashCcIdOverlappingFunction.java:32-75):
    within a cc, vertices whose type sets overlap (transitively) share a
    ``hash_cc``; the group id is a stable hash of (cc, min member id).

    Components are small (bounded by blocking), so the union-find runs
    locally per component via grouped-map pandas — one shuffle.
    """
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("hash_cc", T.LongType(), False),
        ]
    )

    def solve(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = list(pdf["id"])
        typesets = [
            frozenset(t) if t is not None and len(t) else frozenset()
            for t in pdf[types_col]
        ]
        parent = {i: i for i in range(len(ids))}

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if typesets[i] & typesets[j]:
                    ri, rj = find(i), find(j)
                    if ri != rj:
                        parent[max(ri, rj)] = min(ri, rj)
        groups: dict[int, list[int]] = {}
        for i in range(len(ids)):
            groups.setdefault(find(i), []).append(i)
        out = []
        cc = int(pdf[cc_col].iloc[0])
        for members in groups.values():
            min_id = min(ids[i] for i in members)
            # stable group id from (cc, min member) — Utils.getHash analogue
            import hashlib

            h = int.from_bytes(
                hashlib.md5(f"{cc}:{min_id}".encode()).digest()[:8],
                "big",
                signed=True,
            )
            for i in members:
                out.append({"id": ids[i], "hash_cc": h})
        return pd.DataFrame(out, columns=["id", "hash_cc"])

    from ..util import parallel_grouped

    return (
        parallel_grouped(vertices.select(id_col, cc_col, types_col), cc_col)
        .groupBy(cc_col)
        .applyInPandas(solve, schema=schema)
    )


def data_corruption_remove_edges(edges: DataFrame, every_nth: int = 10) -> DataFrame:
    """Test-fixture corruption: drop every n-th edge deterministically
    (corruption/EdgeRemoveCorruptionFunction.java:15-32 — the reference
    drops by index; we key on a stable hash so the choice is
    partition-independent)."""
    return edges.filter(
        F.pmod(F.xxhash64(F.col("src"), F.col("dst")), every_nth) != 0
    )


def data_corruption_add_edges(
    vertices: DataFrame, every_nth: int = 10, id_col: str = "id"
) -> DataFrame:
    """Fabricate edges between consecutive sampled vertices
    (corruption/EdgeCreateCorruptionFunction.java)."""
    sampled = vertices.filter(
        F.pmod(F.xxhash64(F.col(id_col)), every_nth) == 0
    ).select(F.col(id_col))
    w = Window.orderBy(id_col)
    return (
        sampled.withColumn("_next", F.lead(id_col).over(w))
        .filter(F.col("_next").isNotNull())
        .select(F.col(id_col).alias("src"), F.col("_next").alias("dst"))
    )


def data_corruption_remove_edges_indexed(
    edges: DataFrame, every_nth: int = 10, order_cols: tuple = ("src", "dst")
) -> DataFrame:
    """EXACT reference stream semantics
    (corruption/EdgeRemoveCorruptionFunction.java:15-32): keep
    ``every_nth`` elements, drop the next, reset — i.e. drop stream
    positions ≡ every_nth (mod every_nth+1). The reference resets per
    Flink PARTITION (its committed 8,526 count on the 9,375-edge
    MusicBrainz fixture bakes in the local test partitioning); here the
    stream is ONE deterministic global order, so the count is the closed
    form n − ⌊n/(every_nth+1)⌋ — partition-independent and exactly
    reproducible, at most a few edges off the reference's
    partition-boundary artifact. The hash variant
    (``data_corruption_remove_edges``) keeps the same rate without a
    global sort; use this one for exact-count parity tests only (the
    global row_number is a single-task window)."""
    w = Window.orderBy(*[F.col(c) for c in order_cols])
    return (
        edges.withColumn("_i", F.row_number().over(w) - 1)
        .filter(F.pmod(F.col("_i"), every_nth + 1) != every_nth)
        .drop("_i")
    )


def data_corruption_add_edges_indexed(
    vertices: DataFrame, every_nth: int = 10, id_col: str = "id"
) -> DataFrame:
    """EXACT reference stream semantics
    (corruption/EdgeCreateCorruptionFunction.java:20-35): remember the
    first element of each (every_nth+1)-window, emit (first, last) when
    the window closes — one fabricated edge per full window, count
    ⌊n/(every_nth+1)⌋ over a deterministic global order (the reference's
    1,758 on 19,375 MusicBrainz vertices is the same formula per Flink
    partition)."""
    w = Window.orderBy(id_col)
    cyc = every_nth + 1
    idx = F.row_number().over(w) - 1
    tagged = vertices.select(
        F.col(id_col),
        (idx / cyc).cast("long").alias("_cycle"),
        F.pmod(idx, cyc).alias("_pos"),
    )
    firsts = tagged.filter(F.col("_pos") == 0).select(
        "_cycle", F.col(id_col).alias("src")
    )
    lasts = tagged.filter(F.col("_pos") == every_nth).select(
        "_cycle", F.col(id_col).alias("dst")
    )
    return firsts.join(lasts, "_cycle").select("src", "dst")
