"""Line-JSON graph source/sink — the reference's persistence format.

Re-creates io/impl/json/JSONDataSource.java:99-133 + JSONDataSink.java:55-78
+ the JSONToEntity whitelist (JSONToEntity.java:21-35): vertices are lines
``{"id": <long>, "data": {...}}``, edges are ``{"source": <long>,
"target": <long>, "data": {...}}``. Array-typed data keys:
typeIntern, compType, dataSources, clusteredVertices, type; long-typed:
hashCc, ccId. Spark expression: ``from_json`` with an explicit StructType —
schema-on-read instead of the reference's per-key parsing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

VERTEX_DATA_SCHEMA = T.StructType(
    [
        T.StructField("label", T.StringType(), True),
        T.StructField("dataSource", T.StringType(), True),
        T.StructField("dataSources", T.ArrayType(T.StringType()), True),
        T.StructField("ccId", T.LongType(), True),
        T.StructField("hashCc", T.LongType(), True),
        T.StructField("clusteredVertices", T.ArrayType(T.LongType()), True),
        T.StructField("type", T.ArrayType(T.StringType()), True),
        T.StructField("typeIntern", T.ArrayType(T.StringType()), True),
        T.StructField("compType", T.ArrayType(T.StringType()), True),
        T.StructField("artist", T.StringType(), True),
        T.StructField("album", T.StringType(), True),
        T.StructField("year", T.IntegerType(), True),
        T.StructField("length", T.IntegerType(), True),
        T.StructField("language", T.StringType(), True),
        T.StructField("number", T.StringType(), True),
        T.StructField("lat", T.DoubleType(), True),
        T.StructField("lon", T.DoubleType(), True),
        T.StructField("blockingLabel", T.StringType(), True),
        T.StructField("artistTitleAlbum", T.StringType(), True),
    ]
)

VERTEX_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("data", VERTEX_DATA_SCHEMA, True),
    ]
)

EDGE_DATA_SCHEMA = T.StructType(
    [T.StructField("aggSimValue", T.DoubleType(), True)]
)

EDGE_SCHEMA = T.StructType(
    [
        T.StructField("source", T.LongType(), False),
        T.StructField("target", T.LongType(), False),
        T.StructField("data", EDGE_DATA_SCHEMA, True),
    ]
)


def read_vertices(spark: SparkSession, path: str) -> DataFrame:
    """Flattened vertex DataFrame from line-JSON (one column per data key,
    matching the engine's fixed-schema stance)."""
    raw = spark.read.schema(VERTEX_SCHEMA).json(path)
    return raw.select("id", "data.*")


def read_edges(spark: SparkSession, path: str) -> DataFrame:
    raw = spark.read.schema(EDGE_SCHEMA).json(path)
    return raw.select(
        F.col("source").alias("src"),
        F.col("target").alias("dst"),
        F.col("data.aggSimValue").alias("agg_sim"),
    )


def write_vertices(df: DataFrame, path: str, data_cols: list[str] | None = None) -> None:
    """Vertex DataFrame → line-JSON ``{"id", "data": {...}}`` (overwrite,
    as JSONDataSink.writeVertices does)."""
    data_cols = data_cols or [c for c in df.columns if c != "id"]
    df.select(
        "id", F.struct(*[F.col(c) for c in data_cols]).alias("data")
    ).write.mode("overwrite").json(path)


def write_edges(df: DataFrame, path: str) -> None:
    df.select(
        F.col("src").alias("source"),
        F.col("dst").alias("target"),
        F.struct(F.col("agg_sim").alias("aggSimValue")).alias("data"),
    ).write.mode("overwrite").json(path)
