"""Structured Streaming surface — the graft's axis A.

The reference has no streaming runtime; its incremental clustering
(clusterstrategies/*, IncrementalMusicBenchmark.java:83-190) processes
batch-at-a-time additions against a JSON-materialized state. Each of those
steps maps to exactly one micro-batch here; the JSON handoff becomes the
engine's versioned state store / Spark state store."""
