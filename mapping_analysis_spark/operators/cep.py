"""Sequence-pattern (CEP) detection over keyed event streams.

The north-star frames the engine as a "structured-streaming / CEP engine";
the reference has no pattern operator (its closest shape is the ordered
greedy scan inside sortGroup reducers, e.g. BasicLinkFilterFunction.java),
so this is a Spark-native addition, expressed two ways with identical
semantics:

* **Batch** (`sequence_pattern`): MATCH_RECOGNIZE ``PATTERN (A B C)`` with
  strict contiguity per key — event i matches step 0, events i+1..i+k-1
  (in (time, id) order within the key, any interleaved non-matching event
  breaks the match) match the remaining steps, optionally bounded by a
  time span. Implemented with ``lead()`` windows: ONE exchange on the key,
  no self-joins, whole-stage codegen throughout — at 100 TB this is a
  single shuffle partitioned by key, and Spark's window operator streams
  each key group without materializing it.

* **Streaming** (`sequence_pattern_stream`): the same matcher as keyed
  state in ``applyInPandasWithState`` — the state per key is only the last
  k-1 events (the maximal suffix that could still extend into a match), so
  state size is O(pattern) per key regardless of stream length. A match is
  emitted exactly once: in the micro-batch that delivers its LAST event
  (earlier events may live in the carried buffer).

Overlapping matches are all reported (AFTER MATCH SKIP TO NEXT ROW
semantics): a 5-event run A B A B C reports every window that matches.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _us(col: Column) -> Column:
    """Exact epoch microseconds. The cast covers TIMESTAMP_NTZ inputs
    (parquet without isAdjustedToUTC); the engine pins the session timezone
    to UTC, so the cast is value-preserving."""
    return F.unix_micros(col.cast("timestamp"))


def sequence_pattern(
    events: DataFrame,
    pattern: Sequence[str],
    key_col: str = "user_id",
    time_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    within_sec: int | None = None,
) -> DataFrame:
    """Strictly-contiguous sequence matches of ``pattern`` per key.

    Returns one row per match: (key, e1..ek event ids, start_ts, end_ts,
    span_us). ``within_sec`` bounds end-start (inclusive, compared in exact
    integer microseconds so the batch and oracle paths agree bit-for-bit).
    """
    k = len(pattern)
    if k < 2:
        raise ValueError("pattern needs at least 2 steps")
    w = Window.partitionBy(key_col).orderBy(time_col, id_col)
    df = events.select(key_col, time_col, type_col, id_col)
    cond: Column = F.col(type_col) == pattern[0]
    for i in range(1, k):
        df = df.withColumn(f"_t{i}", F.lead(type_col, i).over(w)).withColumn(
            f"_i{i}", F.lead(id_col, i).over(w)
        )
        cond = cond & (F.col(f"_t{i}") == pattern[i])
    df = df.withColumn("_ts_end", F.lead(time_col, k - 1).over(w))
    span_us = _us(F.col("_ts_end")) - _us(F.col(time_col))
    if within_sec is not None:
        cond = cond & (span_us <= within_sec * 1_000_000)
    return df.filter(cond).select(
        F.col(key_col),
        F.col(id_col).alias("e1"),
        *[F.col(f"_i{i}").alias(f"e{i + 1}") for i in range(1, k)],
        F.col(time_col).alias("start_ts"),
        F.col("_ts_end").alias("end_ts"),
        span_us.alias("span_us"),
    )


def _match_output_schema(k: int, key_type: T.DataType) -> T.StructType:
    return T.StructType(
        [T.StructField("key", key_type, True)]
        + [T.StructField(f"e{i + 1}", T.LongType(), True) for i in range(k)]
        + [
            T.StructField("start_us", T.LongType(), True),
            T.StructField("end_us", T.LongType(), True),
        ]
    )


_STATE_SCHEMA = T.StructType(
    [
        T.StructField("buf_types", T.ArrayType(T.StringType()), True),
        T.StructField("buf_ids", T.ArrayType(T.LongType()), True),
        T.StructField("buf_us", T.ArrayType(T.LongType()), True),
    ]
)


def make_sequence_fn(pattern: Sequence[str], within_sec: int | None):
    """(key, pdfs, state) → matches, for ``applyInPandasWithState``.

    State per key = the trailing k-1 events; each batch scans
    buffer + new events (already in event order — micro-batches deliver
    per-key events append-ordered) and emits matches whose last event is
    new this batch, so replays and buffer overlaps never double-emit.
    """
    pat = list(pattern)
    k = len(pat)
    bound_us = None if within_sec is None else within_sec * 1_000_000

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        types: list[str]
        ids: list[int]
        uss: list[int]
        if state.exists:
            bt, bi, bu = state.get
            types, ids, uss = list(bt), list(bi), list(bu)
        else:
            types, ids, uss = [], [], []
        n_old = len(types)
        chunks = [p for p in pdfs if len(p)]
        rows = (
            pd.concat(chunks, ignore_index=True) if chunks else pd.DataFrame()
        )
        if len(rows):
            rows = rows.sort_values(["ts_us", "event_id"])
            types += [str(t) for t in rows["event_type"]]
            ids += [int(i) for i in rows["event_id"]]
            uss += [int(u) for u in rows["ts_us"]]
        out: list[list[Any]] = []
        for start in range(len(types) - k + 1):
            if start + k - 1 < n_old:
                continue  # fully inside the carried buffer: already emitted
            if types[start : start + k] != pat:
                continue
            span = uss[start + k - 1] - uss[start]
            if bound_us is not None and span > bound_us:
                continue
            out.append(
                [key[0]]
                + ids[start : start + k]
                + [uss[start], uss[start + k - 1]]
            )
        state.update((types[-(k - 1) :], ids[-(k - 1) :], uss[-(k - 1) :]))
        if out:
            cols = (
                ["key"]
                + [f"e{i + 1}" for i in range(k)]
                + ["start_us", "end_us"]
            )
            yield pd.DataFrame(out, columns=cols)

    return fn


def sequence_pattern_stream(
    events: DataFrame,
    pattern: Sequence[str],
    key_col: str = "user_id",
    time_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    within_sec: int | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming CEP: keyed-state strict-contiguity matcher. Output rows
    mirror ``sequence_pattern`` (timestamps as exact epoch-microsecond
    longs). One exchange on the key per micro-batch; state is O(k) per key."""
    key_type = events.schema[key_col].dataType
    prepared = (
        events.withWatermark(time_col, watermark)
        .select(
            F.col(key_col).alias("key"),
            _us(F.col(time_col)).alias("ts_us"),
            F.col(type_col).alias("event_type"),
            F.col(id_col).alias("event_id"),
        )
    )
    return prepared.groupBy("key").applyInPandasWithState(
        make_sequence_fn(pattern, within_sec),
        outputStructType=_match_output_schema(len(pattern), key_type),
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
