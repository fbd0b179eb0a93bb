"""Fixed StructType schemas for the engine.

The reference keeps a schema-less per-vertex ``Map<String,Object>``
(analysis-core .../model/ObjectMap.java:25-31) whose keys appear/disappear
per stage; its hot merge path narrows to flat tuples
(model/MergeTuple.java:21-38). We take the tuple-style approach everywhere:
every property is a typed column, sets are ArrayType, and the bit-packed
source-set int (util/AbstractionUtils.java:36-61) is an IntegerType column
manipulated with native bitwise expressions.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Primary input (BASELINE.json input_hint): audio clip + transcript pairs.
# ---------------------------------------------------------------------------
CLIPS_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("sr_hz", T.IntegerType(), True),
        T.StructField("dur_ms", T.IntegerType(), True),
        T.StructField("codec", T.StringType(), True),
        T.StructField("transcript", T.StringType(), True),
        T.StructField("source", T.StringType(), False),
        T.StructField("event_time", T.TimestampType(), True),
    ]
)

# gold_cluster lives in a side table used only by the eval harness.
GOLD_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("gold_cluster", T.LongType(), False),
    ]
)

# ---------------------------------------------------------------------------
# Graph model: two DataFrames (the reference's Gelly Graph<Long,ObjectMap,…>
# becomes vertices + edges; never one object).
# ---------------------------------------------------------------------------
VERTICES_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("label", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("cc_id", T.LongType(), True),
        T.StructField("hash_cc", T.LongType(), True),
    ]
)

EDGES_SCHEMA = T.StructType(
    [
        T.StructField("src", T.LongType(), False),
        T.StructField("dst", T.LongType(), False),
        T.StructField("agg_sim", T.DoubleType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Cluster representatives (the reference's representative vertex with
# ``clusteredVertices`` — Constants.java:247 — and majority-fused attrs).
# ---------------------------------------------------------------------------
CLUSTERS_SCHEMA = T.StructType(
    [
        T.StructField("cluster_id", T.StringType(), False),
        T.StructField("members", T.ArrayType(T.StringType()), False),
        T.StructField("sources", T.ArrayType(T.StringType()), False),
        T.StructField("sources_mask", T.IntegerType(), False),
        T.StructField("transcript", T.StringType(), True),
        T.StructField("blocking_key", T.StringType(), True),
        T.StructField("fingerprint", T.ArrayType(T.FloatType()), True),
    ]
)

MATCH_PAIRS_SCHEMA = T.StructType(
    [
        T.StructField("src_clip_id", T.StringType(), False),
        T.StructField("dst_clip_id", T.StringType(), False),
        T.StructField("sim", T.DoubleType(), True),
    ]
)

# Known source ids → bit positions for the bit-packed source mask
# (mirrors Constants.java:340-374 where each named source gets a bit).
SOURCE_BITS = {str(i): 1 << (i - 1) for i in range(1, 17)}
