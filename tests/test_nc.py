"""NC-domain composed pipeline tests (NcLshCandidateTupleCreator.java:69-120
wiring: NC blocking label → blocked ∪ LSH candidates → name-trigram +
repaired-number similarity → oriented per-block Hungarian)."""

from pyspark.sql import functions as F

from mapping_analysis_spark.operators.nc import (
    nc_candidate_pairs,
    nc_hungarian_matches,
    nc_prepare,
)

BITS = {"s1": 1, "s2": 2, "s3": 4}


def _recs(spark, rows):
    return spark.createDataFrame(
        rows, "name string, surname string, number string, source string"
    )


def test_nc_prepare_blocking_and_repair(spark):
    df = _recs(
        spark,
        [
            ("John", "Smith", "275o1", "s1"),   # o → 0 (NC char repair)
            ("john", "smith", "27501", "s2"),
            ("A", "Wu", "9", "s1"),
        ],
    )
    out = nc_prepare(df, source_bits=BITS).collect()
    by_name = {r["full_name"]: r for r in out}
    assert by_name["john smith"]["blocking_key"] == "josm"
    assert by_name["a wu"]["blocking_key"] == "a wu"  # space-padded shorts
    repaired = {r["number_repaired"] for r in out}
    assert "27501" in repaired and len([x for x in repaired if x == "27501"]) == 1
    # repair maps the corrupted number onto the clean one
    assert by_name["john smith"]["number_repaired"] in ("27501",)


def test_nc_candidates_number_channel(spark):
    # same name either side; number equality after repair lifts the fused
    # sim ((1.0 + 1.0)/2 = 1.0), a differing number abstains (sim = ct)
    df = _recs(
        spark,
        [
            ("maria", "lopez", "21o45", "s1"),
            ("maria", "lopez", "21045", "s2"),
            ("maria", "lopes", "99999", "s3"),
        ],
    )
    prepared = nc_prepare(df, source_bits=BITS)
    pairs = nc_candidate_pairs(prepared, min_sim=0.5, use_lsh=False)
    rows = {
        (r["sim_number"], round(r["agg_sim"], 6)) for r in pairs.collect()
    }
    # exact-name exact-number pair scores 1.0 with a number vote
    assert (1.0, 1.0) in rows
    # pairs against the 'lopes' record have no number vote (null channel)
    assert any(n is None for n, _ in rows)


def test_nc_lsh_recovers_diverged_prefix(spark):
    # surname typo in the first two chars breaks the blocking key; the LSH
    # complement over full-name trigrams still surfaces the pair
    df = _recs(
        spark,
        [
            ("jonathan", "albertson", "1", "s1"),
            ("jonathan", "zlbertson", "1", "s2"),  # a→z typo, key j0zl ≠ j0al
        ],
    )
    prepared = nc_prepare(df, source_bits=BITS)
    blocked_only = nc_candidate_pairs(prepared, min_sim=0.5, use_lsh=False)
    with_lsh = nc_candidate_pairs(prepared, min_sim=0.5, use_lsh=True)
    assert blocked_only.count() == 0
    assert with_lsh.count() == 1


def test_nc_hungarian_oriented_matching(spark):
    # 2 state rows + 2 arrivals in ONE block; ids interleave across sides
    # (the regression the oriented contract exists for) and the optimal
    # assignment must pick the two high-sim pairs with each id used once
    state = nc_prepare(
        _recs(
            spark,
            [
                ("anna", "berg", "11", "s1"),
                ("annika", "berg", "22", "s1"),
            ],
        ),
        source_bits=BITS,
    )
    arrivals = nc_prepare(
        _recs(
            spark,
            [
                ("anna", "berg", "11", "s2"),
                ("annika", "berg", "22", "s2"),
            ],
        ),
        source_bits=BITS,
    )
    matches = nc_hungarian_matches(state, arrivals, min_sim=0.5).collect()
    assert len(matches) == 2
    srcs = [m["src"] for m in matches]
    dsts = [m["dst"] for m in matches]
    assert len(set(srcs)) == 2 and len(set(dsts)) == 2
    # sides disjoint: every src is a state id, every dst an arrival id
    state_ids = {r["id"] for r in state.select("id").collect()}
    arrival_ids = {r["id"] for r in arrivals.select("id").collect()}
    assert set(srcs) <= state_ids and set(dsts) <= arrival_ids
    # the exact-name pairs won (sim 1.0 on both channels)
    assert all(m["agg_sim"] == 1.0 for m in matches)
