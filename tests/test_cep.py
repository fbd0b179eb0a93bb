"""CEP sequence-pattern operator: batch lead-window matcher, streaming
keyed-state matcher (batch↔streaming equivalence), and the new scalar
channels (levenshtein_sim, phonetic_key)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
    ]
)


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute, 0)


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, _ts(m), u, t) for i, (m, u, t) in enumerate(rows)], EVENT_SCHEMA
    )


def test_sequence_pattern_strict_contiguity(spark):
    from mapping_analysis_spark.operators.cep import sequence_pattern

    rows = [
        # user 1: A B C at minutes 0,1,2 → one match
        (0, 1, "A"), (1, 1, "B"), (2, 1, "C"),
        # user 1: A x B C — broken by x, no match starting at minute 3
        (3, 1, "A"), (4, 1, "x"), (5, 1, "B"), (6, 1, "C"),
        # user 2: A B A B C → matches at the SECOND A-B-C window only
        (0, 2, "A"), (1, 2, "B"), (2, 2, "A"), (3, 2, "B"), (4, 2, "C"),
    ]
    out = sequence_pattern(
        _events(spark, rows), ["A", "B", "C"], within_sec=600
    ).collect()
    got = {(r.user_id, r.e1, r.e2, r.e3) for r in out}
    assert got == {(1, 0, 1, 2), (2, 9, 10, 11)}
    spans = {r.user_id: r.span_us for r in out}
    assert spans[1] == 120 * 1_000_000


def test_sequence_pattern_within_bound(spark):
    from mapping_analysis_spark.operators.cep import sequence_pattern

    rows = [(0, 1, "A"), (1, 1, "B"), (30, 1, "C")]  # span 30 min
    ev = _events(spark, rows)
    assert sequence_pattern(ev, ["A", "B", "C"], within_sec=600).count() == 0
    assert sequence_pattern(ev, ["A", "B", "C"], within_sec=1800).count() == 1
    assert sequence_pattern(ev, ["A", "B", "C"]).count() == 1  # unbounded


def test_sequence_pattern_overlapping_matches(spark):
    from mapping_analysis_spark.operators.cep import sequence_pattern

    # A A A A: pattern (A A) matches at every adjacent window
    rows = [(m, 1, "A") for m in range(4)]
    out = sequence_pattern(_events(spark, rows), ["A", "A"]).collect()
    assert {(r.e1, r.e2) for r in out} == {(0, 1), (1, 2), (2, 3)}


def test_sequence_pattern_stream_matches_batch(spark, tmp_path):
    """Streaming keyed-state matcher emits exactly the batch matcher's
    match set, with no duplicates across micro-batch boundaries."""
    from mapping_analysis_spark.operators.cep import (
        sequence_pattern,
        sequence_pattern_stream,
    )

    rows = [
        (0, 1, "A"), (1, 1, "B"), (2, 1, "C"),          # match
        (3, 1, "A"), (4, 1, "B"), (5, 1, "C"),          # match spanning files
        (0, 2, "A"), (1, 2, "A"), (2, 2, "B"), (3, 2, "C"),  # match (1,2,3)
        (0, 3, "C"), (1, 3, "B"), (2, 3, "A"),          # no match
    ]
    ev = _events(spark, rows).orderBy("ts", "event_id")
    src = str(tmp_path / "src")
    # one file per timestamp minute → many micro-batches, matches span files
    for minute in sorted({m for m, _, _ in rows}):
        ev.filter(F.minute("ts") == minute).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out_dir = str(tmp_path / "out")
    q = (
        sequence_pattern_stream(stream, ["A", "B", "C"], within_sec=600)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", out_dir + "_cp")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)

    got = {
        (r.key, r.e1, r.e2, r.e3)
        for r in spark.read.parquet(out_dir).collect()
    }
    want = {
        (r.user_id, r.e1, r.e2, r.e3)
        for r in sequence_pattern(ev, ["A", "B", "C"], within_sec=600).collect()
    }
    assert got == want and len(want) == 3


def test_levenshtein_sim_values(spark):
    from mapping_analysis_spark.functions.similarity import levenshtein_sim

    df = spark.createDataFrame(
        [("kitten", "sitting"), ("abc", "abc"), ("", ""), ("abc", None)],
        ["a", "b"],
    )
    out = df.select(levenshtein_sim(F.col("a"), F.col("b")).alias("s")).collect()
    # kitten→sitting: dist 3, max len 7 → 1 − 3/7
    assert out[0].s == pytest.approx(round(1 - 3 / 7, 6))
    assert out[1].s == 1.0
    assert out[2].s == 1.0
    assert out[3].s is None


def test_levenshtein_sim_cap(spark):
    from mapping_analysis_spark.functions.similarity import levenshtein_sim

    df = spark.createDataFrame([("ab" * 100, "ab" * 100 + "zz")], ["a", "b"])
    # capped at 8 chars the strings are identical
    assert df.select(levenshtein_sim(F.col("a"), F.col("b"), max_len=8)).first()[0] == 1.0


def test_phonetic_key_vectors(spark):
    from mapping_analysis_spark.functions.text import phonetic_key

    cases = {
        "Robert": "R163",
        "Rupert": "R163",
        "Tymczak": "T522",
        "Pfister": "P236",
        "book": "B200",
        "The": "T000",
        "  42  ": None,  # no letters
    }
    df = spark.createDataFrame([(k,) for k in cases], ["s"])
    got = {r.s: r.k for r in df.select("s", phonetic_key(F.col("s")).alias("k")).collect()}
    assert got == cases
