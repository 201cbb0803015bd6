"""Vectorized numpy geometry kernels (used inside Arrow pandas UDFs)."""

from osm_spark.geo import kernels  # noqa: F401
