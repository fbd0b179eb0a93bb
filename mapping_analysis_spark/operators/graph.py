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

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _local_union_find(
    sym: DataFrame, id_col: str, cc_col: str, parquet_path: str | None = None
) -> DataFrame:
    """Driver-side exact min-id union-find over a (small) symmetric edge
    list — the adaptive fast path of ``connected_components``.

    Analogous to Spark's broadcast-join threshold: when the edge list fits
    comfortably on the driver (it is bounded by the micro-batch / candidate
    set, not the corpus), solving locally replaces O(diameter) driver-loop
    rounds — measured 21 rounds × ~1.3 s on a 145k-edge batch graph —
    with one Arrow collect + a sub-second union-find + one broadcast-sized
    createDataFrame. Labels are identical to the loop's fixpoint (min id
    per component), so the choice of path never changes results.

    ``parquet_path``: when the caller just materialized ``sym`` to local
    parquet, the edge pull reads those files directly via pyarrow instead
    of running a Spark collect job — one fewer action on the per-batch
    serial path (remote/URI paths fall back to the Spark pull)."""
    import pandas as pd

    pdf = None
    if parquet_path is not None and "://" not in parquet_path:
        try:
            import glob as _glob

            import pyarrow.parquet as _pq

            files = _glob.glob(os.path.join(parquet_path, "*.parquet"))
            if files:
                tbl = _pq.ParquetDataset(files).read(columns=["a", "b"])
                pdf = tbl.to_pandas()
                pdf = pdf[pdf["a"] < pdf["b"]]
        except Exception:  # any pyarrow failure (ArrowInvalid is a
            pdf = None     # ValueError) degrades to the Spark pull
    if pdf is None:
        pdf = (
            sym.filter(F.col("a") < F.col("b")).toPandas()
        )  # one direction suffices for connectivity
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(pdf["a"].to_numpy(), pdf["b"].to_numpy()):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    nodes = pd.unique(pd.concat([pdf["a"], pdf["b"]], ignore_index=True))
    out = pd.DataFrame({id_col: nodes, cc_col: [find(int(n)) for n in nodes]})
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField(cc_col, T.LongType(), False),
        ]
    )
    return sym.sparkSession.createDataFrame(out, schema=schema)


def connected_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    id_col: str = "id",
    cc_col: str = "cc_id",
    max_iter: int = 50,
    checkpoint_every: int = 2,
    local_edges_threshold: int | None = None,
) -> DataFrame:
    """Min-id connected components over an undirected edge list.

    Returns ``(id, cc_id)`` for every vertex appearing in ``edges`` (and in
    ``vertices`` if given — isolated vertices become their own component,
    as ConnectedComponentIdAdder does for the full vertex set).

    Algorithm: iterated label propagation on the star-contracted graph —
    each round every node adopts ``min(own label, min neighbor label)``,
    then pointer jumping (l(v) := l(l(v)), three times) compresses label
    chains, so convergence is O(log n) rounds on path-like worst cases and
    round 0 + a confirming round on the shallow blocking components this
    engine produces.

    Driver-latency design (the CC loop used to be the pipeline's serial
    floor — ~80 driver job round-trips over tiny label tables): the whole
    round (propagation + 3 jumps + old-vs-new convergence counter via
    ``df.observe``) is ONE action per iteration; the initial
    min(own, neighbor) labeling is folded into round 0's plan instead of
    being its own materialized step; and AQE is switched off inside the
    loop — per-stage adaptive re-planning buys nothing on fixed-size label
    tables and costs a driver round-trip per exchange (at this scale the
    static planner also auto-broadcasts the small label side from parquet
    stats, which AQE only discovered after extra stage barriers).
    """
    from ..util import loop_paths, materialize

    # materialize the symmetrized edge list ONCE: the union references the
    # (possibly expensive) upstream pair plan twice, and the iteration must
    # never re-execute it. Parquet round-trips, not localCheckpoint — see
    # util.materialize for why (repeated checkpoints stop truncating).
    sym_path = loop_paths(1, "cc_sym")[0]
    sym = materialize(
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .unionByName(edges.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .dropDuplicates(["a", "b"]),
        path=sym_path,
    )
    # adaptive path selection (mirrors the broadcast-join threshold): the
    # count is a parquet-metadata read of the just-materialized sym table,
    # so the decision costs no extra scan. The threshold is in UNDIRECTED
    # edges; env-overridable for clusters with bigger/smaller drivers.
    if local_edges_threshold is None:
        local_edges_threshold = int(
            os.environ.get("SPARK_GRAFT_CC_LOCAL_EDGES", "4000000")
        )
    # Driver-memory envelope for the local path: the toPandas() pull is two
    # int64 columns over the SYMMETRIZED list (2 edges/undirected edge) plus
    # the union-find dict ≈ 32 B + ~16 B per directed row → ~48 B per
    # undirected edge of steady-state driver heap (Arrow transfer peaks at
    # ~2× that). The default 4M-edge threshold is therefore ~200 MB on the
    # driver — tune SPARK_GRAFT_CC_LOCAL_EDGES to driver_mem_bytes/48 when
    # changing it blind, or set it to 0 to force the distributed loop.
    n_sym = None
    if "://" not in sym_path:
        try:
            import glob as _glob

            import pyarrow.parquet as _pq

            _files = _glob.glob(os.path.join(sym_path, "*.parquet"))
            # an empty glob (e.g. a schemeless shared-FS default FS where
            # the materialize path is not on the driver's local disk) must
            # NOT read as n_sym=0 — that would always select the
            # driver-local path and defeat the memory safeguard
            if _files:
                n_sym = sum(
                    _pq.ParquetFile(f).metadata.num_rows for f in _files
                )
        except Exception:
            n_sym = None
    if n_sym is None:
        n_sym = sym.count()
    n_undirected = n_sym // 2
    if local_edges_threshold and n_undirected <= local_edges_threshold:
        if n_undirected > 1_000_000:
            import warnings

            warnings.warn(
                f"connected_components: local union-find over {n_undirected} "
                f"edges pulls ~{n_undirected * 48 // 1_000_000} MB onto the "
                "driver (≈48 B/edge); lower SPARK_GRAFT_CC_LOCAL_EDGES if "
                "the driver is small",
                ResourceWarning,
                stacklevel=2,
            )
        labels = _local_union_find(sym, id_col, cc_col, parquet_path=sym_path)
        if vertices is not None:
            all_v = vertices.select(id_col)
            labels = all_v.join(labels, id_col, "left").select(
                id_col,
                F.coalesce(F.col(cc_col), F.col(id_col)).alias(cc_col),
            )
        return labels
    paths = loop_paths(2, "cc_labels")
    # initial label = min(own, min neighbor) — lazy: folds into round 0
    labels = (
        sym.groupBy("a")
        .agg(F.min("b").alias("nbr_min"))
        .select(
            F.col("a").alias(id_col),
            F.least(F.col("a"), F.col("nbr_min")).alias(cc_col),
        )
    )

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

    import time

    spark = edges.sparkSession
    aqe_was = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    _t_loop = time.time()
    try:
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
            # a fixpoint is reached when a full round leaves every label
            # unchanged. Round 0 compares against the (in-plan) initial
            # labeling, so an already-star-shaped graph still needs only
            # round 0 + one confirming round.
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
            labels = materialize(
                with_old.observe(obs, F.sum("_chg").alias("n_changed")).select(
                    F.col(id_col), F.col(f"n.{cc_col}").alias(cc_col)
                ),
                paths[_i % 2],
            )
            n_changed = int(obs.get["n_changed"] or 0)
            if os.environ.get("SPARK_GRAFT_DEBUG_CC"):
                print(
                    f"[cc] round {_i}: n_changed={n_changed} "
                    f"t={time.time() - _t_loop:.2f}s",
                    flush=True,
                )
                _t_loop = time.time()
            if n_changed == 0:
                break
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_was)
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
