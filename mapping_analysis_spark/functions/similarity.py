"""Similarity metrics.

The reference's primary match metric is cosine similarity over padded
character trigrams (simmetrics-core 4.0.1 ``CosineSimilarity`` +
``qGramWithPadding(3)``, built at Utils.java:869-873, selected by
``Constants.COSINE_TRIGRAM`` = "ct"). simmetrics 4.x CosineSimilarity is a
*set* metric: sim = |A ∩ B| / sqrt(|A|·|B|) over the distinct padded
trigram sets. That is expressible entirely with native array Columns —
``array_distinct`` / ``array_intersect`` / ``size`` — so the hot similarity
path runs inside whole-stage codegen with NO Python at all (the reference
computes it row-at-a-time in Java; this is our main single-node perf win).

Per-property similarities re-create ``simcomputation/ops/
SinglePropertySimilarity.java`` and ``SimCompUtils.java``:

* year/length: diff 0 → 1.0, ±1 → 0.5, else 0.0 (SinglePropertySimilarity.java:124-164)
* number: exact-equal → 1 else no vote; NC char repair s→5,l→1,z→2,o→0,q→4,g→9
* language: equal → 1; both known-but-different → 0; unknown → no vote
* geo: haversine (R=6371 km, GeoDistance.java:20-46), sim = 1 − d/150 km,
  0 beyond 150 km, 6dp HALF_UP (Utils.java:443-459)

Mean aggregation over present sims with HALF_UP rounding re-creates
``simcomputation/MeanAggregationFunction.java:26-49``.

Jaro-Winkler (the alternative metric, Constants.JARO_WINKLER) is provided
as an Arrow pandas UDF (no jellyfish in the image; pure-numpy/python port
of the standard algorithm with simmetrics defaults: boost threshold 0.7,
prefix scale 0.1, max prefix 4).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .text import padded_trigrams, simplify

# ---------------------------------------------------------------------------
# Cosine trigram — native Columns (the hot path)
# ---------------------------------------------------------------------------


def trigram_set(col: Column) -> Column:
    """Distinct padded-trigram set of a *simplified* string, as
    array<string>. Precompute once per record before the pair join so the
    per-pair work is only intersect+size."""
    return F.array_distinct(padded_trigrams(simplify(col)))


def cosine_trigram_from_sets(left_set: Column, right_set: Column) -> Column:
    """Set-cosine over precomputed trigram sets, 6dp HALF_UP
    (Utils.getSimilarityAndSimplifyForMetric, Utils.java:477-490)."""
    inter = F.size(F.array_intersect(left_set, right_set))
    denom = F.sqrt(F.size(left_set).cast("double") * F.size(right_set).cast("double"))
    raw = F.when(
        (F.size(left_set) == 0) & (F.size(right_set) == 0), F.lit(1.0)
    ).otherwise(
        F.when(denom == 0, F.lit(0.0)).otherwise(inter.cast("double") / denom)
    )
    return F.round(raw, 6)


def cosine_hashed_sets(left_sorted: Column, right_sorted: Column) -> Column:
    """Set-cosine over pre-SORTED hashed trigram arrays (array<long>),
    Arrow-batched — the pair-scoring hot path.

    Value-identical to ``cosine_trigram_from_sets`` on the same sets: the
    JVM expression allocates a boxed hash set per pair (ArrayIntersect has
    no codegen; measured ~110 µs/pair — 810 s of a 1165 s 16-core batch
    run), while this computes the intersection by vectorized binary search
    over per-record sorted arrays (~2-3 µs/pair) with near-zero allocation,
    which is also what lets the stage scale past the shared-heap GC wall.
    Rounding matches F.round's HALF_UP-on-shortest-repr exactly: the fast
    path uses floor(x·1e6 + 0.5) and rows within 1e-6 of the .5 tie fall
    back to the Decimal(repr(x)) kernel (local_sim.round_half_up), the
    same kernel the local merge re-check uses."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    from .local_sim import round_half_up

    @pandas_udf(T.DoubleType())
    def _cos(ls: pd.Series, rs: pd.Series) -> pd.Series:
        out = np.empty(len(ls), dtype=np.float64)
        mask_null = np.zeros(len(ls), dtype=bool)
        for i, (a, b) in enumerate(zip(ls, rs)):
            if a is None or b is None:
                mask_null[i] = True
                out[i] = 0.0
                continue
            na, nb = len(a), len(b)
            if na == 0 and nb == 0:
                out[i] = 1.0
                continue
            if na == 0 or nb == 0:
                out[i] = 0.0
                continue
            ia = np.asarray(a, dtype=np.int64)
            ib = np.asarray(b, dtype=np.int64)
            if nb < na:
                ia, ib = ib, ia
            idx = np.searchsorted(ia, ib)
            idx[idx == len(ia)] = 0
            inter = int(np.count_nonzero(ia[idx] == ib))
            x = inter / float(np.sqrt(na * nb))
            y = x * 1e6
            frac = y - np.floor(y)
            if abs(frac - 0.5) < 1e-6:
                out[i] = round_half_up(x, 6)
            else:
                out[i] = np.floor(y + 0.5) / 1e6
        res = pd.Series(out)
        res[mask_null] = None
        return res

    return _cos(left_sorted, right_sorted)


def hashed_trigram_tokens(col: Column) -> Column:
    """Sorted array<long> of 64-bit hashes of ``trigram_set(col)`` — the
    block-scorer token prep in ONE Arrow batch pass.

    Set-equivalent to ``array_sort(transform(trigram_set(col),
    xxhash64))`` for every similarity purpose: the scorer only consumes
    set sizes and intersections, which any injective 64-bit hash of the
    ≲47k-trigram vocabulary preserves (collision odds ≈ 6e-11; same risk
    class as xxhash64 itself). The Column chain is NOT used because
    Catalyst has no codegen for transform/sequence lambdas — the
    interpreted simplify → padded_trigrams → array_distinct → transform →
    array_sort subtree measured 24 s for 5k docs where this pass takes
    <1 s. Trigram semantics mirror ``trigram_set`` exactly (simmetrics
    qGramWithPadding(3), Utils.java:869-873), including null → [] (the
    Column chain's when-otherwise yields an empty array for null input)
    and "" → {"###"}. Hashes are cached per distinct trigram (vocabulary
    ≤ ~47k) so the per-row cost is slicing + dict lookups."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.ArrayType(T.LongType()))
    def _tok(texts: pd.Series) -> pd.Series:
        import hashlib

        from .local_sim import simplify_local

        cache: dict[str, int] = {}

        def h(g: str) -> int:
            v = cache.get(g)
            if v is None:
                d = hashlib.blake2b(g.encode("utf-8"), digest_size=8).digest()
                v = int.from_bytes(d, "little", signed=True)
                cache[g] = v
            return v

        out = []
        for t in texts:
            if t is None:
                out.append([])
                continue
            padded = "##" + simplify_local(t) + "##"
            grams = {padded[i : i + 3] for i in range(len(padded) - 2)}
            out.append(sorted(h(g) for g in grams))
        return pd.Series(out)

    return _tok(col)


def cosine_trigram(left: Column, right: Column) -> Column:
    """One-shot cosine trigram of two raw strings (simplify → trigram set →
    set cosine). Null when either side is insane (Utils.java:483-485)."""
    from .text import is_sane

    sim = cosine_trigram_from_sets(trigram_set(left), trigram_set(right))
    return F.when(is_sane(left) & is_sane(right), sim)


# ---------------------------------------------------------------------------
# Per-property sims — native Columns
# ---------------------------------------------------------------------------


def year_length_sim(left: Column, right: Column) -> Column:
    """diff 0→1.0, ±1→0.5, else 0.0; null when either side missing
    (SinglePropertySimilarity.java:124-164)."""
    diff = F.abs(left - right)
    return (
        F.when(left.isNull() | right.isNull(), F.lit(None).cast("double"))
        .when(diff == 0, 1.0)
        .when(diff == 1, 0.5)
        .otherwise(0.0)
    )


def number_sim(left: Column, right: Column, nc_repair: bool = False) -> Column:
    """Exact equality → 1.0, else no vote (null). With ``nc_repair`` the NC
    char fixes s→5 l→1 |→1 z→2 o→0 q→4 g→9 are applied first
    (SinglePropertySimilarity.java:82-119)."""
    if nc_repair:
        left = F.translate(F.lower(left), "sl|zoqg", "5112049")
        right = F.translate(F.lower(right), "sl|zoqg", "5112049")
    return F.when(left.isNull() | right.isNull(), F.lit(None).cast("double")).when(
        left == right, 1.0
    )


def language_sim(left: Column, right: Column) -> Column:
    """equal→1; both known-but-different→0; any unknown → no vote
    (SinglePropertySimilarity.java:216-237)."""
    unknown = ("unknown", "no_or_minor_lang", "multiple")
    known_l = left.isNotNull() & ~left.isin(*unknown)
    known_r = right.isNotNull() & ~right.isin(*unknown)
    return (
        F.when(~(known_l & known_r), F.lit(None).cast("double"))
        .when(left == right, 1.0)
        .otherwise(0.0)
    )


def levenshtein_sim(left: Column, right: Column, max_len: int | None = None) -> Column:
    """Normalized Levenshtein similarity ``1 − dist / max(len_l, len_r)``,
    6dp HALF_UP; null when either side is null; 1.0 for two empty strings.

    The north-star lists Levenshtein alongside Jaccard as a transcript
    channel; the reference itself only wires cosine-trigram/Jaro-Winkler
    (Utils.java:864-873), so this is a Spark-native addition. It runs
    entirely JVM-side (``F.levenshtein`` is codegen'd); ``max_len`` caps
    both inputs because the distance is O(n·m) per pair — at corpus scale
    an unbounded Levenshtein over long documents is the wrong plan, so the
    cap is explicit API, not a hidden default."""
    if max_len is not None:
        left = F.substring(left, 1, max_len)
        right = F.substring(right, 1, max_len)
    longest = F.greatest(F.length(left), F.length(right))
    raw = (
        F.when(left.isNull() | right.isNull(), F.lit(None).cast("double"))
        .when(longest == 0, 1.0)
        .otherwise(1.0 - F.levenshtein(left, right).cast("double") / longest)
    )
    return F.round(raw, 6)


# ---------------------------------------------------------------------------
# Geo — native Columns
# ---------------------------------------------------------------------------

MAXIMAL_GEO_DISTANCE_M = 150000.0  # Constants.java:100


def haversine_m(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Haversine distance in meters, R = 6371 km (GeoDistance.java:20-46)."""
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = F.sin(dlat / 2) * F.sin(dlat / 2) + F.cos(F.radians(lat1)) * F.cos(
        F.radians(lat2)
    ) * F.sin(dlon / 2) * F.sin(dlon / 2)
    c = 2 * F.atan2(F.sqrt(a), F.sqrt(1 - a))
    return F.lit(6371.0) * c * 1000.0


def geo_sim(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """1 − d/150km within range, 0 beyond, null for invalid coords, 6dp
    HALF_UP (Utils.getGeoSimilarity, Utils.java:443-459)."""
    valid = (
        lat1.isNotNull() & lon1.isNotNull() & lat2.isNotNull() & lon2.isNotNull()
        & (F.abs(lat1) <= 90) & (F.abs(lat2) <= 90)
        & (F.abs(lon1) <= 180) & (F.abs(lon2) <= 180)
    )
    d = haversine_m(lat1, lon1, lat2, lon2)
    return F.when(
        valid,
        F.when(d >= MAXIMAL_GEO_DISTANCE_M, 0.0).otherwise(
            F.round(1.0 - d / MAXIMAL_GEO_DISTANCE_M, 6)
        ),
    )


# ---------------------------------------------------------------------------
# Mean aggregation of present sims (MeanAggregationFunction.java:26-49)
# ---------------------------------------------------------------------------


def mean_agg_sim(*sims: Column, scale: int = 10) -> Column:
    """Mean over non-null similarity channels; absent channels are ignored
    (not zero); HALF_UP at ``scale`` dp. Null if no channel voted."""
    arr = F.array(*sims)
    present = F.filter(arr, lambda s: s.isNotNull())
    n = F.size(present)
    total = F.aggregate(present, F.lit(0.0), lambda acc, s: acc + s)
    return F.when(n > 0, F.round(total / n, scale))


def weighted_agg_sim(
    sim_label: Column, sim_type: Column, sim_geo: Column
) -> Column:
    """Legacy weighted aggregation 0.45 label / 0.25 type / 0.3 geo with
    weight renormalization over present channels
    (SimilarityComputation.java:121-145)."""
    weights = [(sim_label, 0.45), (sim_type, 0.25), (sim_geo, 0.3)]
    num = None
    den = None
    for col, w in weights:
        term = F.when(col.isNotNull(), col * w).otherwise(0.0)
        wterm = F.when(col.isNotNull(), F.lit(w)).otherwise(0.0)
        num = term if num is None else num + term
        den = wterm if den is None else den + wterm
    return F.when(den > 0, F.round(num / den, 10))


# ---------------------------------------------------------------------------
# Jaro-Winkler — Arrow pandas UDF (pure python core, vectorized transfer)
# ---------------------------------------------------------------------------


def _jaro(s1: str, s2: str) -> float:
    if s1 == s2:
        return 1.0
    len1, len2 = len(s1), len(s2)
    if len1 == 0 or len2 == 0:
        return 0.0
    match_window = max(len1, len2) // 2 - 1
    if match_window < 0:
        match_window = 0
    flags1 = [False] * len1
    flags2 = [False] * len2
    matches = 0
    for i, c in enumerate(s1):
        lo = max(0, i - match_window)
        hi = min(len2, i + match_window + 1)
        for j in range(lo, hi):
            if not flags2[j] and s2[j] == c:
                flags1[i] = True
                flags2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    transpositions = 0
    j = 0
    for i in range(len1):
        if flags1[i]:
            while not flags2[j]:
                j += 1
            if s1[i] != s2[j]:
                transpositions += 1
            j += 1
    # simmetrics (the reference's metric provider, Utils.java:864-867)
    # counts half-transpositions and INTEGER-divides — Jaro.java's
    # `final int transpositions = halfTranspositions / 2`. DuckDB's
    # jaro_winkler_similarity floors identically, so the oracle is exact.
    t = transpositions // 2
    m = matches
    return (m / len1 + m / len2 + (m - t) / m) / 3


def jaro_winkler_py(
    s1: str | None,
    s2: str | None,
    boost_threshold: float = 0.7,
    prefix_scale: float = 0.1,
    max_prefix: int = 4,
) -> float | None:
    """Standard Jaro-Winkler with simmetrics defaults (Utils.java:864-867)."""
    if s1 is None or s2 is None:
        return None
    jaro = _jaro(s1, s2)
    if jaro < boost_threshold:
        return jaro
    prefix = 0
    for a, b in zip(s1[:max_prefix], s2[:max_prefix]):
        if a == b:
            prefix += 1
        else:
            break
    return jaro + prefix * prefix_scale * (1 - jaro)


def _round6_half_up(x: float) -> float:
    """Tie-guarded HALF_UP at 6dp. Python ``round`` is half-to-EVEN while
    both Spark's ``F.round`` and DuckDB's ``round`` are half-up (half away
    from zero; all sims here are ≥ 0), so a value landing on a 6dp midpoint
    would round differently on the two sides of the oracle compare — and a
    midpoint ON the ≥ 0.5 filter boundary would flip the pair set too. Same
    kernel as the block scorer's ``round_half_up_vec6`` fast path, with the
    Decimal fallback near the .5 tie."""
    import math

    from .local_sim import round_half_up

    y = x * 1e6
    if abs(y - math.floor(y) - 0.5) < 1e-6:
        return round_half_up(x, 6)
    return math.floor(y + 0.5) / 1e6


@F.pandas_udf(T.DoubleType())
def jaro_winkler(left: pd.Series, right: pd.Series) -> pd.Series:
    out = [
        None
        if pd.isna(a) or pd.isna(b)
        else _round6_half_up(jaro_winkler_py(a, b))
        for a, b in zip(left, right)
    ]
    return pd.Series(out, dtype="float64")
