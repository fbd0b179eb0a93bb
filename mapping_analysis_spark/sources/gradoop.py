"""Gradoop-style EPGM JSON input.

Re-creates Utils.getGradoopGraph + Utils.getInputGraph (util/Utils.java:
131-167): a graph directory holds line-JSON ``graphHeads.json``,
``vertices.json``, ``edges.json`` in the EPGM layout —

  vertex: {"id": "<12-byte hex>", "data": {...properties...},
           "meta": {"label": "...", "graphs": ["<hex>", ...]}}
  edge:   {"id": "<hex>", "source": "<hex>", "target": "<hex>",
           "data": {...}, "meta": {...}}

The reference converts Gradoop→Gelly by mapping vertices through
GradoopToObjectMapVertexMapper (long id taken from the vertex's ``data.id``
property) and re-keying edges with two joins on the EPGM hex ids
(Utils.java:148-166). Here: vertices keep a derived ``id`` long (the
``data.id`` property when present, else a stable 64-bit hash of the EPGM
hex id) and edges are re-keyed by two equi-joins — the same shape, two
shuffles, no driver work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import stable_hash64


def read_gradoop_graph(
    spark: SparkSession, graph_path: str
) -> tuple[DataFrame, DataFrame]:
    """(vertices, edges): vertices carry (id, epgm_id, label, data struct
    fields flattened as ``data``), edges carry (src, dst) re-keyed to the
    vertex long ids."""
    if not graph_path.endswith("/"):
        graph_path = graph_path + "/"
    raw_v = spark.read.json(graph_path + "vertices.json")
    raw_e = spark.read.json(graph_path + "edges.json")

    data_id = (
        F.col("data.id").cast("long")
        if "data" in raw_v.columns
        and "id" in [f.name for f in raw_v.schema["data"].dataType.fields]
        else F.lit(None).cast("long")
    )
    vertices = raw_v.select(
        F.coalesce(data_id, stable_hash64(F.col("id"))).alias("id"),
        F.col("id").alias("epgm_id"),
        F.col("meta.label").alias("label")
        if "meta" in raw_v.columns
        else F.lit(None).cast("string").alias("label"),
        F.col("data").alias("data") if "data" in raw_v.columns else F.lit(None).alias("data"),
    )
    key = vertices.select("epgm_id", F.col("id").alias("_vid"))
    edges = (
        raw_e.select(F.col("source").alias("_s"), F.col("target").alias("_t"))
        .join(key.withColumnRenamed("epgm_id", "_s"), "_s")
        .withColumnRenamed("_vid", "src")
        .join(key.withColumnRenamed("epgm_id", "_t"), "_t")
        .withColumnRenamed("_vid", "dst")
        .select("src", "dst")
    )
    return vertices, edges
