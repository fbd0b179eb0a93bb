"""Batch operator layer — pure-DataFrame re-creations of the reference's
Flink operators (SURVEY.md §2). Each module cites the reference file it
re-creates behaviorally; no code is ported."""
