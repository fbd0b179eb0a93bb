"""Similarity search over an embedding column (array<float>).

* ``brute_force_topk``     — exact cosine top-k per query: query set is
  broadcast (small), corpus scanned once, window top-k. The baseline and
  the correctness oracle for the approximate path.
* ``random_hyperplane_buckets`` / ``ann_topk`` — LSH-bucketed ANN: seeded
  random-hyperplane signs bucket the corpus; queries probe their own bucket
  (+ optional multi-probe by flipping bits); exact cosine within the
  bucket. Deterministic under a fixed seed, identical across parallelism
  levels (the hyperplanes are literal constants compiled into the plan).
* ``ivf_assign`` / ``ivf_topk`` — IVF variant: k seeded corpus rows act as
  coarse centroids (broadcast); every vector is assigned to its nearest
  centroid (one scan); queries probe ``n_probe`` nearest centroid cells.

At 100 TB: the corpus-side bucket assignment is a narrow projection (no
shuffle); the search join shuffles only on bucket id, so per-task work is
|bucket|·|queries in bucket| instead of |corpus|·|queries|.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import embedding_cosine


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query over the corpus.

    (query_id, vec_id, cosine, rank). The query side is broadcast —
    corpus×queries is evaluated as a broadcast nested-loop with the cosine
    as a native zip_with expression, then a per-query window keeps k.
    """
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(F.col(id_col), F.col(vec_col).alias("_cv"))
    scored = c.crossJoin(F.broadcast(q)).select(
        query_id_col,
        id_col,
        embedding_cosine(F.col("_qv"), F.col("_cv")).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def random_hyperplane_buckets(
    vec_col: Column, dim: int, n_planes: int = 8, seed: int = 42
) -> Column:
    """Bucket id = sign pattern of ``n_planes`` seeded random hyperplane
    dot products, as an int Column. The planes are literal arrays compiled
    into the plan — zero data movement, deterministic everywhere."""
    planes = _hyperplanes(dim, n_planes, seed)
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        dot = F.aggregate(
            F.zip_with(vec_col, plane, lambda a, b: (a * b).cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot >= 0, F.lit(1 << i)).otherwise(0)
    return bucket


def hyperplane_band_buckets(
    vec_col: Column,
    dim: int,
    tables: int = 4,
    planes_per_table: int = 8,
    seed: int = 42,
) -> Column:
    """Banded hyperplane LSH keys: ``tables`` independent hash tables, each
    a ``planes_per_table``-plane sign bucket (seed offset per table), as an
    array of "t:bucket" string keys. A pair collides if it matches in ANY
    table — recall 1−(1−pᵏ)ᴸ vs pᵏ for a single table (p = 1−θ/π), the
    same OR-banding trade minhash banding makes for Jaccard."""
    keys = []
    for t in range(tables):
        b = random_hyperplane_buckets(vec_col, dim, planes_per_table, seed + t)
        keys.append(F.concat_ws(":", F.lit(str(t)), b.cast("string")))
    return F.array(*keys)


def ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    multi_probe: int = 0,
) -> DataFrame:
    """LSH-bucketed approximate top-k: join corpus and queries on bucket id,
    exact cosine within the bucket, window top-k. ``multi_probe`` > 0 also
    probes buckets at Hamming distance 1 in the first ``multi_probe`` bits
    (recall knob)."""
    bucket = random_hyperplane_buckets(F.col(vec_col), dim, n_planes, seed)
    c = corpus.select(F.col(id_col), F.col(vec_col).alias("_cv"), bucket.alias("_b"))
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qv"), bucket.alias("_b0")
    )
    probes = [F.col("_b0")]
    for i in range(multi_probe):
        probes.append(F.col("_b0").bitwiseXOR(F.lit(1 << i)))
    q = q.withColumn("_b", F.explode(F.array(*probes))).drop("_b0")
    scored = c.join(q, "_b").select(
        query_id_col,
        id_col,
        embedding_cosine(F.col("_qv"), F.col("_cv")).alias("cosine"),
    ).dropDuplicates([query_id_col, id_col])
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_assign(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest centroid (max cosine); centroids
    are literals (broadcast-free). Adds ``_cell``.

    Built as ONE flat sims array + argmax (array_position of array_max,
    first occurrence → lowest cell wins ties, same as a `>`-chain). A
    chained when(sim > best_sim) formulation duplicates every prior sim
    inside each branch — the expression tree grows 2^n_centroids and
    codegen alone took ~17 s for 8 centroids × 64 dims; the flat form
    evaluates each cosine exactly once."""
    sims = F.array(
        *[
            F.coalesce(
                embedding_cosine(
                    F.col(vec_col), F.array(*[F.lit(float(x)) for x in cvec])
                ),
                F.lit(-2.0),
            )
            for cvec in centroids
        ]
    )
    cell = (F.array_position(sims, F.array_max(sims)) - 1).cast("int")
    return df.withColumn("_cell", cell)


def sample_centroids(
    corpus: DataFrame, n: int, vec_col: str = "embedding", id_col: str = "vec_id"
) -> list[list[float]]:
    """Deterministic coarse centroids: the n corpus vectors with the
    smallest xxhash64(id) (a seeded uniform sample without an RNG)."""
    rows = (
        corpus.select(F.col(vec_col), F.xxhash64(F.col(id_col).cast("string")).alias("_h"))
        .orderBy("_h")
        .limit(n)
        .collect()
    )
    return [list(r[0]) for r in rows]


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF search: corpus assigned to cells once; each query probes its
    ``n_probe`` nearest cells; exact cosine within probed cells."""
    c = ivf_assign(
        corpus.select(id_col, F.col(vec_col).alias("_cv")), centroids, "_cv"
    )
    # per-query cell ranking: score query against every centroid literal
    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("_qv"))
    cell_sims = []
    for i, cvec in enumerate(centroids):
        lit_c = F.array(*[F.lit(float(x)) for x in cvec])
        cell_sims.append(
            F.struct(
                embedding_cosine(F.col("_qv"), lit_c).alias("sim"),
                F.lit(i).alias("cell"),
            )
        )
    probe_cells = F.slice(
        F.reverse(F.array_sort(F.array(*cell_sims))), 1, n_probe
    )
    q = q.withColumn("_cell", F.explode(F.transform(probe_cells, lambda s: s.cell)))
    scored = c.join(q, "_cell").select(
        query_id_col,
        id_col,
        embedding_cosine(F.col("_qv"), F.col("_cv")).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
