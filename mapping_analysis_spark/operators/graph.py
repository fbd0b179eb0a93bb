"""Graph operators: connected components + intra-component edge creation.

Re-creates the reference's Gelly ``GSAConnectedComponents`` usage
(graph/utils/ConnectedComponentIdAdder.java:33-43) with the
large-star/small-star alternating algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond", SOCC'14) as a driver loop over
DataFrames — O(log n) rounds, each round two shuffles, lineage cut with
localCheckpoint so plans don't grow unboundedly. Semantics identical to the
reference: every vertex is labeled with the minimum vertex id of its
component (min-id label propagation).

``intra_component_edges`` re-creates
graph/utils/EdgeComputationOnVerticesForKeySelector.java:78-93 (ALL /
SIMPLE modes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    id_col: str = "id",
    cc_col: str = "cc_id",
    max_iter: int = 50,
    checkpoint_every: int = 2,
) -> DataFrame:
    """Min-id connected components over an undirected edge list.

    Returns ``(id, cc_id)`` for every vertex appearing in ``edges`` (and in
    ``vertices`` if given — isolated vertices become their own component,
    as ConnectedComponentIdAdder does for the full vertex set).

    Algorithm: iterated label propagation on the star-contracted graph —
    each round every node adopts ``min(own label, min neighbor label)``,
    then edges are rewritten onto labels (star contraction). Converges in
    O(log n) rounds on path-like worst cases and ~2-3 rounds on the tiny
    blocking components this engine produces. Each round = one groupBy
    shuffle + one join; `localCheckpoint` guards the driver-side loop from
    lineage blowup (Flink's iterate operator does this implicitly).
    """
    from ..util import loop_paths, materialize

    # materialize the symmetrized edge list ONCE: the union references the
    # (possibly expensive) upstream pair plan twice, and the iteration must
    # never re-execute it. Parquet round-trips, not localCheckpoint — see
    # util.materialize for why (repeated checkpoints stop truncating).
    sym = materialize(
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .unionByName(edges.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .dropDuplicates(["a", "b"])
    )
    # initial label = min(own, min neighbor)
    paths = loop_paths(3, "cc_labels")
    labels = materialize(
        sym.groupBy("a")
        .agg(F.min("b").alias("nbr_min"))
        .select(
            F.col("a").alias(id_col),
            F.least(F.col("a"), F.col("nbr_min")).alias(cc_col),
        ),
        paths[0],
    )
    # Iterate: (1) one-hop propagation — every node takes the min of its
    # own and its neighbors' labels; (2) pointer jumping — l(v) := l(l(v))
    # applied twice. The jumps halve label-chain lengths each round, so
    # convergence is O(log n) rounds even on a path graph.
    def _jump(df: DataFrame) -> DataFrame:
        return (
            df.alias("x")
            .join(
                df.select(
                    F.col(id_col).alias("_pid"), F.col(cc_col).alias("_pcc")
                ),
                F.col(f"x.{cc_col}") == F.col("_pid"),
                "left",
            )
            .select(
                F.col(f"x.{id_col}").alias(id_col),
                F.coalesce(F.col("_pcc"), F.col(f"x.{cc_col}")).alias(cc_col),
            )
        )

    from pyspark.sql import Observation

    for _i in range(max_iter):
        nbr = (
            sym.join(
                labels.select(
                    F.col(id_col).alias("b"), F.col(cc_col).alias("_lb")
                ),
                "b",
            )
            .groupBy("a")
            .agg(F.min("_lb").alias("_nbr_min"))
        )
        l1 = (
            labels.join(nbr, labels[id_col] == nbr["a"], "left")
            .select(
                F.col(id_col),
                F.least(
                    F.col(cc_col), F.coalesce(F.col("_nbr_min"), F.col(cc_col))
                ).alias(cc_col),
            )
        )
        # convergence check rides the materialize write via df.observe —
        # the old-vs-new comparison used to be a separate join job per
        # iteration, a third of the loop's serial latency
        obs = Observation(f"cc_changed_{_i}")
        with_old = (
            _jump(_jump(_jump(l1)))
            .alias("n")
            .join(
                labels.select(
                    F.col(id_col), F.col(cc_col).alias("_old")
                ).alias("o"),
                id_col,
            )
            .withColumn(
                "_chg", (F.col(f"n.{cc_col}") != F.col("_old")).cast("long")
            )
        )
        l2 = materialize(
            with_old.observe(obs, F.sum("_chg").alias("n_changed")).select(
                F.col(id_col), F.col(f"n.{cc_col}").alias(cc_col)
            ),
            paths[(_i + 1) % 3],
        )
        labels = l2
        if int(obs.get["n_changed"] or 0) == 0:
            break
    if vertices is not None:
        all_v = vertices.select(id_col)
        labels = all_v.join(labels, id_col, "left").select(
            id_col, F.coalesce(F.col(cc_col), F.col(id_col)).alias(cc_col)
        )
    return labels


def add_cc_ids(
    vertices: DataFrame, edges: DataFrame, id_col: str = "id", cc_col: str = "cc_id"
) -> DataFrame:
    """ConnectedComponentIdAdder.java:33-43 — stamp ``cc_id`` onto every
    vertex (isolated vertices become singletons)."""
    cc = connected_components(edges, vertices, id_col=id_col, cc_col=cc_col)
    return vertices.drop(cc_col).join(cc, id_col, "left")


def intra_component_edges(
    vertices: DataFrame,
    key_col: str = "cc_id",
    id_col: str = "id",
    mode: str = "simple",
) -> DataFrame:
    """Materialize candidate edges within each component
    (EdgeComputationOnVerticesForKeySelector.java:78-93).

    ``simple`` — star to the minimum id (SimpleEdgesCreator): one window.
    ``all``    — all distinct i<j pairs (AllEdgesCreateGroupReducer.java:72-95).
    """
    if mode == "simple":
        w = Window.partitionBy(key_col)
        return (
            vertices.select(key_col, id_col)
            .withColumn("_min", F.min(id_col).over(w))
            .filter(F.col(id_col) != F.col("_min"))
            .select(F.col("_min").alias("src"), F.col(id_col).alias("dst"))
        )
    if mode == "all":
        l = vertices.select(key_col, F.col(id_col).alias("src")).alias("l")
        r = vertices.select(key_col, F.col(id_col).alias("dst")).alias("r")
        return l.join(
            r,
            (F.col(f"l.{key_col}") == F.col(f"r.{key_col}"))
            & (F.col("src") < F.col("dst")),
        ).select("src", "dst")
    raise ValueError(f"unknown mode {mode!r}")


def cluster_size_histogram(vertices: DataFrame, key_col: str = "cc_id") -> DataFrame:
    """Cluster-size histogram (the reference tracks this with accumulators,
    lsh/BlockReducer.java:28-36; Stats.java)."""
    return (
        vertices.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("size"))
        .groupBy("size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .orderBy("size")
    )
