"""Geographic entity-resolution pipeline (settlement-benchmark domain).

Re-creates (behaviorally) the reference's geo path:

* ``merge_initialization`` — merge/MergeInitialization.java:50-113: after
  SimSort splits low-similarity vertices out of their cluster, singleton
  representatives that remember their origin component (``old_hash_cc``)
  are re-paired within that component, re-scored with the geo similarity
  (label cosine-trigram + geo distance + type), and pairs ≥ 0.5 are
  re-fused into one representative per origin component before the merge
  phase — "rejoin vertices which have been in one cluster previously to
  reduce the complexity for the following merge step". MUSIC/NC domains
  pass through unchanged (createResult, MergeInitialization.java:50-56).
* ``run_geo_batch`` — the geo variant of pipeline.run_batch: blocking via
  the 3-char geo label (Utils.getGeoBlockingLabel), candidate restriction
  adds TYPE overlap (MergeGeoTripletCreator.java:55-115: summedSources ≤ n
  ∧ typeOverlap ∧ ¬srcOverlap), similarity = mean(label ct, geo, type)
  (GeoSimilarityFunction.java:34-90), decomposition + per-component greedy
  merge with geo attribute fusion (DualMergeGeographyMapper.java:41-90:
  min id survives, longer label, coordinates from the higher-priority
  side — one-valid-side first, then lowest source bit, mirroring the
  GeoNames > DBpedia preference chain).

Scale shape matches the music path: salted block pairs, ids+narrow payload
through the shuffle, one applyInPandas pass over size-capped components.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.similarity import (
    cosine_trigram_from_sets,
    geo_sim,
    mean_agg_sim,
    trigram_set,
)
from ..functions.text import geo_blocking_label
from ..functions.types import normalize_types, type_sim
from .blocking import salted_block_pairs


@dataclass
class GeoConfig:
    min_sim: float = 0.5
    max_sources: int = 5
    max_block_rows: int = 256
    max_component_rows: int = 512
    blocking_length: int = 3


GEO_STATE_FIELDS = [
    T.StructField("id", T.LongType(), False),
    T.StructField("members", T.ArrayType(T.LongType()), False),
    T.StructField("sources_mask", T.LongType(), False),
    T.StructField("label", T.StringType(), True),
    T.StructField("lat", T.DoubleType(), True),
    T.StructField("lon", T.DoubleType(), True),
    T.StructField("types", T.ArrayType(T.StringType()), True),
    T.StructField("blocking_key", T.StringType(), True),
    T.StructField("n_members", T.IntegerType(), False),
]


def prepare_geo(points: DataFrame, cfg: GeoConfig | None = None) -> DataFrame:
    """Singleton geo cluster state from raw points
    (id, label, lat, lon, types:array<string>, source:string)."""
    cfg = cfg or GeoConfig()
    distinct_sources = [
        r[0] for r in points.select("source").distinct().orderBy("source").collect()
    ]
    bit = None
    for i, s in enumerate(distinct_sources):
        b = F.when(F.col("source") == s, F.lit(1 << i))
        bit = b if bit is None else bit.when(F.col("source") == s, F.lit(1 << i))
    return points.select(
        F.col("id").cast("long").alias("id"),
        F.array(F.col("id").cast("long")).alias("members"),
        bit.otherwise(F.lit(0)).cast("long").alias("sources_mask"),
        F.col("label"),
        F.col("lat").cast("double"),
        F.col("lon").cast("double"),
        normalize_types(F.col("types")).alias("types"),
        geo_blocking_label(F.col("label"), cfg.blocking_length).alias("blocking_key"),
        F.lit(1).alias("n_members"),
    )


def geo_pair_sims(pairs: DataFrame, cfg: GeoConfig) -> DataFrame:
    """Score carried-payload pairs with the three geo channels
    (GeoSimilarityFunction.java:34-90) and mean-aggregate.

    Uses precomputed per-record trigram sets (``src_trigrams``/
    ``dst_trigrams``) when the pair carries them — recomputing
    ``trigram_set`` per pair is an interpreted higher-order expression
    that Catalyst inlines once per reference (measured 2.3 ms/pair →
    ~20 s for 8.6k pairs at sf0.1); per-record precompute in the
    materialized state makes the per-pair work intersect+size only."""
    has_tg = "src_trigrams" in pairs.columns
    tl = F.col("src_trigrams") if has_tg else trigram_set(F.col("src_label"))
    tr = F.col("dst_trigrams") if has_tg else trigram_set(F.col("dst_label"))
    scored = pairs.select(
        "*",
        cosine_trigram_from_sets(tl, tr).alias("sim_label"),
        geo_sim(
            F.col("src_lat"), F.col("src_lon"), F.col("dst_lat"), F.col("dst_lon")
        ).alias("sim_geo"),
        type_sim(F.col("src_types"), F.col("dst_types")).alias("sim_type"),
    )
    return scored.withColumn(
        "agg_sim",
        mean_agg_sim(
            F.col("sim_label"), F.col("sim_geo"), F.col("sim_type"), scale=6
        ),
    ).filter(F.col("agg_sim") >= cfg.min_sim)


def geo_candidate_pairs(state: DataFrame, cfg: GeoConfig) -> DataFrame:
    """Salted block pairs with the geo restrictions: no source overlap,
    summed source count ≤ max, TYPE overlap on the GENERALIZED comp types
    (MergeGeoTripletCreator.java:74-80 checks hasOverlap over
    AbstractionUtils.getTypesInt, which bit-packs types only after
    Utils.getShadingTypes generalization — so Settlement matches
    AdministrativeRegion here). An untyped side matches anything
    (Utils.hasEmptyType — must not be blocked from matching)."""
    from ..functions.types import shading_generalize

    payload = ["members", "sources_mask", "label", "lat", "lon", "types", "n_members"]
    if "trigrams" in state.columns:
        payload.append("trigrams")
    untyped = lambda side: (  # noqa: E731
        F.col(f"{side}.types").isNull()
        | (F.size(f"{side}.types") == 0)
        | F.array_contains(F.col(f"{side}.types"), "no_type")
    )
    restrict = (
        (F.col("l.sources_mask").bitwiseAND(F.col("r.sources_mask")) == 0)
        & (
            F.bit_count(F.col("l.sources_mask")) + F.bit_count(F.col("r.sources_mask"))
            <= cfg.max_sources
        )
        & (
            F.arrays_overlap(
                shading_generalize(F.col("l.types")),
                shading_generalize(F.col("r.types")),
            )
            | untyped("l")
            | untyped("r")
        )
    )
    return salted_block_pairs(
        state,
        key_col="blocking_key",
        id_col="id",
        max_block_rows=cfg.max_block_rows,
        restrict=restrict,
        payload_cols=payload,
    )


def _merge_geo_block(pdf: pd.DataFrame, min_sim: float, max_sources: int) -> pd.DataFrame:
    """Local greedy fixpoint for one component group — geo twin of
    clustering.merge_components.solve (DeltaIterateGeographicMergeStep
    semantics: max-sim pair first, ties min small id / min big id; fusion
    per DualMergeGeographyMapper)."""
    from ..functions.local_sim import (
        _INSANE,
        cosine_trigram_local,
        geo_sim_local,
        mean_agg_local,
        type_sim_local,
    )

    clusters: dict[int, dict] = {}
    for row in pdf.to_dict("records"):
        row["members"] = list(row["members"])
        row["types"] = frozenset(row["types"]) if row.get("types") is not None else frozenset()
        clusters[row["id"]] = row

    from ..functions.types import SHADING_GENERALIZATION

    def _gen(ts: frozenset) -> frozenset:
        return frozenset(SHADING_GENERALIZATION.get(t, t) for t in ts)

    def valid(a: dict, b: dict) -> bool:
        if a["sources_mask"] & b["sources_mask"]:
            return False
        if (
            bin(a["sources_mask"]).count("1") + bin(b["sources_mask"]).count("1")
            > max_sources
        ):
            return False
        ta, tb = a["types"], b["types"]
        untyped = not ta or not tb or "no_type" in ta or "no_type" in tb
        return untyped or bool(_gen(ta) & _gen(tb))

    def sim(a: dict, b: dict) -> float | None:
        la, lb = a.get("label"), b.get("label")
        sl = (
            None
            if la is None or lb is None or la in _INSANE or lb in _INSANE
            else cosine_trigram_local(la, lb)
        )
        sg = geo_sim_local(a.get("lat"), a.get("lon"), b.get("lat"), b.get("lon"))
        st = type_sim_local(a["types"], b["types"])
        return mean_agg_local(sl, sg, st, scale=6)

    def fuse(keep: int, a: dict, b: dict) -> dict:
        merged = dict(a if a["id"] == keep else b)
        merged["members"] = sorted(a["members"] + b["members"])
        merged["sources_mask"] = a["sources_mask"] | b["sources_mask"]
        la, lb = a.get("label") or "", b.get("label") or ""
        merged["label"] = la if len(la) >= len(lb) else lb
        # coordinates: the one valid side wins; else the side holding the
        # lowest source bit (source-priority chain, DualMergeGeography
        # Mapper.java:68-79)
        va = a.get("lat") is not None and a.get("lon") is not None
        vb = b.get("lat") is not None and b.get("lon") is not None
        if va and not vb:
            src = a
        elif vb and not va:
            src = b
        else:
            src = a if (a["sources_mask"] & -a["sources_mask"]) <= (
                b["sources_mask"] & -b["sources_mask"]
            ) else b
        merged["lat"], merged["lon"] = src.get("lat"), src.get("lon")
        merged["types"] = (a["types"] | b["types"]) - {"no_type"} or frozenset(
            a["types"] | b["types"]
        )
        merged["n_members"] = a["n_members"] + b["n_members"]
        return merged

    heap: dict[tuple[int, int], float] = {}
    ids = sorted(clusters)
    for i, x in enumerate(ids):
        for y in ids[i + 1 :]:
            if valid(clusters[x], clusters[y]):
                s = sim(clusters[x], clusters[y])
                if s is not None and s >= min_sim:
                    heap[(x, y)] = s
    while heap:
        (x, y), _s = max(heap.items(), key=lambda kv: (kv[1], -kv[0][0], -kv[0][1]))
        keep, drop = (x, y) if x < y else (y, x)
        merged = fuse(keep, clusters[x], clusters[y])
        merged["id"] = keep
        clusters[keep] = merged
        del clusters[drop]
        heap = {p: s for p, s in heap.items() if keep not in p and drop not in p}
        for other in clusters:
            if other == keep:
                continue
            if valid(merged, clusters[other]):
                s = sim(merged, clusters[other])
                if s is not None and s >= min_sim:
                    heap[(min(keep, other), max(keep, other))] = s
    cols = [f.name for f in GEO_STATE_FIELDS]
    out = []
    for cl in clusters.values():
        row = {c: cl.get(c) for c in cols}
        row["types"] = sorted(cl["types"])
        out.append(row)
    return pd.DataFrame(out, columns=cols)


def run_geo_batch(points: DataFrame, cfg: GeoConfig | None = None) -> DataFrame:
    """Geo ER end-to-end: prepare → candidate pairs → 3-channel sim →
    connected components (size-capped) → per-component greedy merge.
    Returns the fused cluster representatives."""
    from ..util import materialize
    from .graph import connected_components

    cfg = cfg or GeoConfig()
    state = materialize(
        prepare_geo(points, cfg).withColumn("trigrams", trigram_set(F.col("label")))
    )
    pairs = geo_pair_sims(geo_candidate_pairs(state, cfg), cfg)
    cc = connected_components(
        pairs.select("src", "dst"), vertices=state.select("id"), id_col="id", cc_col="cc"
    )
    sizes = cc.groupBy("cc").agg(F.count(F.lit(1)).alias("_n"))
    grouped = (
        state.join(cc, "id")
        .join(sizes, "cc")
        .withColumn(
            "_grp",
            F.when(
                F.col("_n") <= cfg.max_component_rows, F.col("cc").cast("string")
            ).otherwise(
                F.concat_ws("|", F.col("cc").cast("string"), F.col("blocking_key"))
            ),
        )
        .drop("cc", "_n")
    )
    schema = T.StructType(GEO_STATE_FIELDS)
    cols = [f.name for f in GEO_STATE_FIELDS]

    def solve(pdf: pd.DataFrame) -> pd.DataFrame:
        return _merge_geo_block(pdf, cfg.min_sim, cfg.max_sources)

    merged = grouped.select(*cols, "_grp").groupBy("_grp").applyInPandas(
        solve, schema=schema
    )
    return merged.withColumn(
        "blocking_key", geo_blocking_label(F.col("label"), cfg.blocking_length)
    )


def merge_initialization(
    representatives: DataFrame,
    domain: str = "geography",
    min_sim: float = 0.5,
    max_sources: int = 5,
) -> DataFrame:
    """MergeInitialization (merge/MergeInitialization.java:50-113).

    MUSIC/NC: identity. GEOGRAPHY: representatives carrying a non-null
    ``old_hash_cc`` (SimSort-split singletons) are re-paired within their
    origin component, re-scored with the geo similarity, and components
    holding a pair ≥ ``min_sim`` are re-fused into one representative
    (grouped by old_hash_cc — GeographicMajorityPropertiesGroupReduce);
    every vertex of a qualifying pair leaves the original set
    (RightMinusLeftSideJoinFunction, MergeInitialization.java:104-112).

    ``representatives`` columns: GEO_STATE_FIELDS + ``old_hash_cc``
    (nullable long).
    """
    if domain != "geography":
        return representatives
    split = representatives.filter(F.col("old_hash_cc").isNotNull())
    payload = ["members", "sources_mask", "label", "lat", "lon", "types", "n_members"]
    cols = ["id", "old_hash_cc"] + payload
    l = split.select(*cols).alias("l")
    r = split.select(*cols).alias("r")
    pairs = l.join(
        r,
        (F.col("l.old_hash_cc") == F.col("r.old_hash_cc"))
        & (F.col("l.id") < F.col("r.id")),
    ).select(
        F.col("l.id").alias("src"),
        F.col("r.id").alias("dst"),
        F.col("l.old_hash_cc").alias("old_hash_cc"),
        *[F.col(f"l.{c}").alias(f"src_{c}") for c in payload],
        *[F.col(f"r.{c}").alias(f"dst_{c}") for c in payload],
    )
    scored = geo_pair_sims(pairs, GeoConfig(min_sim=min_sim))
    qualifying = scored.select("src", "dst", "old_hash_cc")
    refused_ids = (
        qualifying.select(F.col("src").alias("id"))
        .unionByName(qualifying.select(F.col("dst").alias("id")))
        .distinct()
    )
    # re-fuse per origin component with the same local greedy fusion
    # (threshold 0 inside the group: membership was already gated by the
    # pair threshold; the reference reduces the whole group to one rep)
    group = representatives.join(refused_ids, "id", "left_semi")
    schema = T.StructType(GEO_STATE_FIELDS)
    cols_out = [f.name for f in GEO_STATE_FIELDS]

    def solve(pdf: pd.DataFrame) -> pd.DataFrame:
        return _merge_geo_block(pdf, 0.0, max_sources)

    new_reps = (
        group.select(*cols_out, "old_hash_cc")
        .groupBy("old_hash_cc")
        .applyInPandas(lambda pdf: solve(pdf.drop(columns=["old_hash_cc"])), schema=schema)
        .withColumn("old_hash_cc", F.lit(None).cast("long"))
    )
    untouched = representatives.join(refused_ids, "id", "left_anti")
    return untouched.unionByName(new_reps)
