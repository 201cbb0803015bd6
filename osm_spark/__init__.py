"""osm_spark — a PySpark-native spatial-join + tiling analytics engine.

Re-expresses the capabilities of the reference engine (vouillon/osm, an
OCaml/C columnar out-of-core dataflow system — see SURVEY.md) as an
idiomatic Spark DataFrame library:

- ``osm_spark.geo``       vectorized numpy geometry kernels (PIP, tiles,
                          Hilbert/z-order, Douglas-Peucker, haversine)
- ``osm_spark.operators`` DataFrame-level operators (spatial join, tile
                          assignment, kNN, multipolygon assembly, routing
                          contraction, dedup, similarity, text analysis)
- ``osm_spark.fixtures``  deterministic synthetic data (pages + OSM layers)
- ``osm_spark.session``   SparkSession builder with scale-oriented defaults

Design: declarative DataFrame plans (Catalyst does pushdown/pruning/join
selection), Arrow-batched pandas UDFs for geometry (never per-row Python),
explicit cell partitioning + salting for skew, AQE on.
"""

__version__ = "0.1.0"
