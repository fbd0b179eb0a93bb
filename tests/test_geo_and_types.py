"""Round-2 surface: type similarity + TypeDictionary, MergeInitialization,
geo end-to-end pipeline, Hungarian side-orientation, banded embedding LSH
recall, ANN recall."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# type similarity (Utils.getTypeSim + TypeDictionary.TYPE_SHADINGS)
# ---------------------------------------------------------------------------


def test_type_sim_channels(spark):
    from mapping_analysis_spark.functions.types import type_sim

    df = spark.createDataFrame(
        [
            (1, ["Settlement"], ["Settlement", "Park"]),        # direct overlap
            (2, ["Settlement"], ["AdministrativeRegion"]),       # shading s→t
            (3, ["Country"], ["AdministrativeRegion"]),          # shading t→s
            (4, ["Mountain"], ["BodyOfWater"]),                  # disjoint
            (5, ["no_type"], ["Settlement"]),                    # untyped: no vote
            (6, ["Settlement"], []),                             # empty: no vote
        ],
        "id int, a array<string>, b array<string>",
    )
    rows = {
        r.id: r.s
        for r in df.select("id", type_sim(F.col("a"), F.col("b")).alias("s")).collect()
    }
    assert rows[1] == 1.0
    assert rows[2] == 1.0  # Settlement → AdministrativeRegion shaded
    assert rows[3] == 1.0  # AdministrativeRegion → Country shaded
    assert rows[4] == 0.0
    assert rows[5] is None
    assert rows[6] is None


def test_primary_type_normalization(spark):
    from mapping_analysis_spark.functions.types import normalize_types

    df = spark.createDataFrame(
        [
            (1, ["http://dbpedia.org/ontology/Town", "http://schema.org/City"]),
            (2, ["lake", "unknown-value"]),
        ],
        "id int, t array<string>",
    )
    rows = {
        r.id: sorted(r.n)
        for r in df.select(
            "id", normalize_types(F.col("t")).alias("n")
        ).collect()
    }
    assert rows[1] == ["Settlement"]  # both URIs collapse + distinct
    assert rows[2] == ["BodyOfWater", "unknown-value"]  # unknown passes through


# ---------------------------------------------------------------------------
# geo pipeline end-to-end + F1
# ---------------------------------------------------------------------------


def _settlement_corpus(spark, n_entities=40, sources=3):
    """Entities with per-source corrupted labels, jittered coords, shared
    types; gold = entity id."""
    rows = []
    rng = np.random.default_rng(7)
    type_pool = ["Settlement", "BodyOfWater", "Mountain", "AdministrativeRegion"]
    for e in range(n_entities):
        name = f"{rng.integers(0, 16**6):06x} town"
        lat = float(rng.uniform(-80, 80))
        lon = float(rng.uniform(-170, 170))
        t = type_pool[e % len(type_pool)]
        for s in range(sources):
            label = {0: name, 1: name[:-1], 2: name + " region"}[s % 3]
            rows.append(
                (
                    e * 10 + s,
                    label,
                    lat + s * 0.0004,
                    lon + s * 0.0004,
                    [t],
                    f"src{s}",
                    e,
                )
            )
    return spark.createDataFrame(
        rows,
        "id long, label string, lat double, lon double,"
        " types array<string>, source string, gold long",
    )


def test_geo_er_f1(spark):
    from mapping_analysis_spark.operators.geo import GeoConfig, run_geo_batch
    from mapping_analysis_spark.operators.quality import (
        cluster_pairs,
        gold_pairs,
        pairwise_quality,
    )

    corpus = _settlement_corpus(spark)
    clusters = run_geo_batch(
        corpus.drop("gold"), GeoConfig(min_sim=0.7, max_sources=8)
    )
    q = pairwise_quality(
        cluster_pairs(clusters),
        gold_pairs(corpus.select("id", "gold"), id_col="id", gold_col="gold"),
    )
    assert q["f1"] >= 0.95, q
    # coordinates fused from the lowest-source-bit (priority) side
    one = clusters.filter(F.col("n_members") == 3).first()
    assert one is not None


def test_geo_block_scores_match_spec(spark):
    """geo_block_pair_scores (grouped-map 3-channel kernel) must produce
    the SAME pair set and agg_sim values as the spec path
    geo_pair_sims(geo_candidate_pairs(...)) — including under salting
    (max_block_rows small enough to split blocks), untyped records, null
    labels and null coordinates."""
    from mapping_analysis_spark.operators.geo import (
        GeoConfig,
        geo_block_pair_scores,
        geo_candidate_pairs,
        geo_pair_sims,
        prepare_geo,
    )

    corpus = _settlement_corpus(spark, n_entities=60, sources=3).drop("gold")
    # inject edge rows: null label, null coords, untyped, no_type
    extra = spark.createDataFrame(
        [
            (9001, None, 10.0, 10.0, ["Settlement"], "src0"),
            (9002, None, 10.0, 10.0001, ["Settlement"], "src1"),
            (9003, "null town", None, None, ["Settlement"], "src0"),
            (9004, "null town", 10.0, 10.0, [], "src1"),
            (9005, "null town", 10.0, 10.0, ["no_type"], "src2"),
            (9006, "null town", 95.0, 10.0, ["BodyOfWater"], "src1"),
        ],
        "id long, label string, lat double, lon double,"
        " types array<string>, source string",
    )
    cfg = GeoConfig(min_sim=0.5, max_sources=8, max_block_rows=8)
    state = prepare_geo(corpus.unionByName(extra), cfg)
    got = {
        (r.src, r.dst): r.agg_sim
        for r in geo_block_pair_scores(state, cfg).collect()
    }
    want = {
        (r.src, r.dst): r.agg_sim
        for r in geo_pair_sims(geo_candidate_pairs(state, cfg), cfg)
        .select("src", "dst", "agg_sim")
        .collect()
    }
    assert set(got) == set(want)
    diffs = {p: (got[p], want[p]) for p in want if got[p] != want[p]}
    assert not diffs, dict(list(diffs.items())[:5])
    assert len(got) > 50


def test_geo_type_restriction_blocks_mismatch(spark):
    """Same label+coords but disjoint types must NOT merge
    (MergeGeoTripletCreator hasTypeOverlap)."""
    from mapping_analysis_spark.operators.geo import GeoConfig, run_geo_batch

    df = spark.createDataFrame(
        [
            (1, "riverdale", 10.0, 10.0, ["Mountain"], "a"),
            (2, "riverdale", 10.0, 10.0, ["BodyOfWater"], "b"),
            (3, "riverdale", 10.0, 10.0, ["Settlement"], "c"),
            (4, "riverdale", 10.0, 10.0, ["AdministrativeRegion"], "d"),
        ],
        "id long, label string, lat double, lon double,"
        " types array<string>, source string",
    )
    out = run_geo_batch(df, GeoConfig(min_sim=0.5, max_sources=8))
    rows = {r.id: sorted(r.members) for r in out.collect()}
    # Settlement↔AdministrativeRegion are shaded (merge); Mountain and
    # BodyOfWater overlap nobody
    assert rows[1] == [1] and rows[2] == [2]
    assert rows[3] == [3, 4]


# ---------------------------------------------------------------------------
# MergeInitialization (merge/MergeInitialization.java:50-113)
# ---------------------------------------------------------------------------


def _rep(spark, rows):
    return spark.createDataFrame(
        rows,
        "id long, members array<long>, sources_mask long, label string,"
        " lat double, lon double, types array<string>, blocking_key string,"
        " n_members int, old_hash_cc long",
    )


def test_merge_initialization_geo_rejoins_split_singletons(spark):
    from mapping_analysis_spark.operators.geo import merge_initialization

    reps = _rep(
        spark,
        [
            # two SimSort-split singletons of old component 100: same place
            (1, [1], 1, "springfield", 40.0, -75.0, ["Settlement"], "spr", 1, 100),
            (2, [2], 2, "springfield", 40.0005, -75.0005, ["Settlement"], "spr", 1, 100),
            # a split singleton of component 200 with no counterpart
            (5, [5], 4, "lonetown", 10.0, 10.0, ["Settlement"], "lon", 1, 200),
            # an ordinary representative (no old_hash_cc)
            (9, [9, 10], 3, "metropolis", 50.0, 8.0, ["Settlement"], "met", 2, None),
        ],
    )
    out = merge_initialization(reps, "geography", min_sim=0.5)
    rows = {r.id: r for r in out.collect()}
    assert sorted(rows) == [1, 5, 9]
    assert sorted(rows[1].members) == [1, 2]
    assert rows[1].sources_mask == 3
    assert rows[5].members == [5]  # no qualifying pair → untouched
    assert rows[9].members == [9, 10]


def test_merge_initialization_music_identity(spark):
    from mapping_analysis_spark.operators.geo import merge_initialization

    reps = _rep(
        spark, [(1, [1], 1, "x", 0.0, 0.0, ["Settlement"], "x", 1, 100)]
    )
    assert merge_initialization(reps, "music").collect() == reps.collect()


# ---------------------------------------------------------------------------
# Hungarian side orientation (ADVICE round 1)
# ---------------------------------------------------------------------------


def test_hungarian_interleaved_sides(spark):
    """State ids (1, 3) interleave with arrival id 2: without side
    re-orientation, entity 2 lands as both a row (pair 2-3) and a column
    (pair 1-2) of one cost matrix and can be assigned twice."""
    from pyspark.sql import functions as F  # noqa: F811
    from mapping_analysis_spark.functions.similarity import trigram_set
    from mapping_analysis_spark.operators.incremental import (
        source_addition_clustering,
    )

    def mk(rows):
        df = spark.createDataFrame(
            rows,
            "id long, members array<long>, sources_mask long, label string,"
            " blocking_key string, n_members int",
        )
        return df.withColumn("trigram_set", trigram_set(F.col("label")))

    state = mk(
        [
            (1, [1], 1, "common prefix words here", "comm", 1),
            (3, [3], 2, "common prefix words there", "comm", 1),
        ]
    )
    arrivals = mk([(2, [2], 4, "common prefix words here", "comm", 1)])
    out = source_addition_clustering(
        state, arrivals, min_sim=0.5, selection="hungarian"
    )
    members = [m for r in out.collect() for m in r.members]
    assert sorted(members) == [1, 2, 3]  # nobody duplicated, nobody lost
    rows = {r.id: sorted(r.members) for r in out.collect()}
    assert rows[1] == [1, 2]  # 2 assigned once, to its best state match
    assert rows[3] == [3]


# ---------------------------------------------------------------------------
# banded hyperplane LSH recall + ANN recall
# ---------------------------------------------------------------------------


def _near_dup_vectors(spark, n=30, dim=32, seed=3):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        v = rng.standard_normal(dim)
        v /= np.linalg.norm(v)
        rows.append((i * 2, [float(x) for x in v]))
        w = v + rng.standard_normal(dim) * 0.05  # cosine ≈ 0.999
        w /= np.linalg.norm(w)
        rows.append((i * 2 + 1, [float(x) for x in w]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_embedding_near_dup_banded_recall(spark):
    from mapping_analysis_spark.operators.dedup import embedding_near_dup_pairs

    df = _near_dup_vectors(spark)
    exact = {
        (r.src, r.dst)
        for r in embedding_near_dup_pairs(
            df, threshold=0.95, exact=True
        ).collect()
    }
    banded = {
        (r.src, r.dst)
        for r in embedding_near_dup_pairs(df, threshold=0.95, dim=32).collect()
    }
    assert banded <= exact  # verify step: no false positives ever
    assert len(exact) >= 25
    recall = len(banded & exact) / len(exact)
    assert recall >= 0.9, (recall, len(exact))


def test_ann_topk_recall_vs_exact(spark):
    from mapping_analysis_spark.operators.similarity_search import (
        ann_topk,
        brute_force_topk,
    )

    df = _near_dup_vectors(spark, n=60)
    queries = df.filter(F.col("vec_id") % 2 == 1).limit(10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = df.filter(F.col("vec_id") % 2 == 0)
    exact = {
        (r.query_id, r.vec_id)
        for r in brute_force_topk(corpus, queries, k=1).collect()
    }
    approx = {
        (r.query_id, r.vec_id)
        for r in ann_topk(
            corpus, queries, dim=32, k=1, multi_probe=2
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    # the true top-1 is the near-identical twin: it collides in the same
    # sign bucket with high probability; seeded, so deterministic
    assert recall >= 0.7, recall


def test_ivf_topk_probe_all_equals_exact(spark):
    """With n_probe = n_cells, IVF degenerates to exact search: every query
    scans every cell, so the top-k (cosine desc, id asc) must equal the
    brute-force baseline bit-for-bit."""
    from mapping_analysis_spark.operators.similarity_search import (
        brute_force_topk,
        ivf_topk,
        sample_centroids,
    )

    df = _near_dup_vectors(spark, n=60)
    queries = df.filter(F.col("vec_id") % 2 == 1).limit(8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = df.filter(F.col("vec_id") % 2 == 0)
    cents = sample_centroids(corpus, 4)
    exact = [
        (r.query_id, r.vec_id, r.rank)
        for r in brute_force_topk(corpus, queries, k=3)
        .orderBy("query_id", "rank")
        .collect()
    ]
    ivf_all = [
        (r.query_id, r.vec_id, r.rank)
        for r in ivf_topk(corpus, queries, cents, k=3, n_probe=4)
        .orderBy("query_id", "rank")
        .collect()
    ]
    assert ivf_all == exact
    # and the pruned path (n_probe=2) keeps decent recall on this corpus
    ivf_pruned = {
        (r.query_id, r.vec_id)
        for r in ivf_topk(corpus, queries, cents, k=3, n_probe=2).collect()
    }
    recall = len(ivf_pruned & {(q, v) for q, v, _ in exact}) / len(exact)
    assert recall >= 0.6, recall
