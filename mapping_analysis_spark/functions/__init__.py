"""Scalar function library: native Column expressions where possible,
Arrow-vectorized pandas UDFs for the rest (never per-row Python UDFs)."""
