"""mapping_analysis_spark — a PySpark-native streaming entity-resolution engine.

Re-creates the capabilities of linengier/mapping-analysis (Flink 1.5 batch
entity matching + clustering, University of Leipzig DBS) as an idiomatic
PySpark engine:

* batch core: pure DataFrame operators (blocking, similarity, link filter,
  connected components, SimSort, greedy merge, representatives)
* streaming wrap: Structured Streaming micro-batches with watermarks,
  keyed cluster state, exactly-once sink commits, checkpoint resume
* audio channel: WAV/PCM decode + MFCC fingerprint cosine in Arrow
  pandas UDFs (no per-row Python anywhere)

The data model is a fixed StructType from day one (the reference's dynamic
``ObjectMap`` property map — analysis-core .../model/ObjectMap.java:25-31 —
becomes typed columns; its bit-packed source sets — util/AbstractionUtils.java:36-61
— become an int column with bitwise Column ops).
"""

__version__ = "0.1.0"
