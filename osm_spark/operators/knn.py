"""kNN nearest-feature join.

Spark-first re-expression of the reference's best-first R-tree kNN
(/root/reference/database/rtree.ml:209-258): candidate generation via
cell neighborhoods + exact re-check, instead of a priority queue.

Metric: squared planar fixed-point distance
``d2 = (lat-flat)^2 + (lon-flon)^2`` (int64, exact — so results are
reproducible bit-for-bit across engines).  A haversine re-rank UDF can
be layered on top when a metric in meters is needed.

Exactness guarantee: features are registered in every cell within
Chebyshev radius R of their own cell.  A query point whose best
candidate lies strictly closer than ``R * cell_min`` (the smallest cell
dimension in fixed-point units) cannot be beaten by any unregistered
feature (those are ≥ R cells away).  Points that fail that bound — or
found no candidate at all — fall back to a broadcast brute-force pass.
At production scale the fallback fraction is tuned to ~0 by picking
``cell_zoom``/``radius`` from the feature density histogram.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from osm_spark.geo import kernels as K
from osm_spark.operators.spatial_join import with_cell


def _dist2():
    return (F.col("lat") - F.col("flat")) * (F.col("lat") - F.col("flat")) + (
        F.col("lon") - F.col("flon")
    ) * (F.col("lon") - F.col("flon"))


def _rank_topk(cand: DataFrame, key: str, k: int) -> DataFrame:
    w = Window.partitionBy(key).orderBy("dist2", "feature_id")
    return (
        cand.withColumn("dist2", _dist2())
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def cell_min_extent(cell_zoom: int, lat_min_fp: int, lat_max_fp: int) -> int:
    """Smallest cell dimension (fp units) over the latitude range."""
    rows, bounds = K.tile_y_boundaries(cell_zoom, lat_min_fp, lat_max_fp)
    h = min(hi - lo for hi, lo in zip(bounds, bounds[1:]))
    w = K.LON_WORLD // (1 << cell_zoom)
    return min(h, w)


def knn_join(
    points: DataFrame,
    features: DataFrame,
    k: int = 1,
    cell_zoom: int = 8,
    radius: int = 2,
    key: str = "page_id",
    exact: bool = True,
) -> DataFrame:
    """k nearest features (feature_id, flat, flon) for each point.

    Returns (key, feature_id, dist2, rank).  ``exact=True`` adds the
    brute-force fallback pass for points the cell bound cannot certify.
    """
    pts = with_cell(points.select(key, "lat", "lon"), cell_zoom)
    feats = with_cell(features.select("feature_id", "lat", "lon"), cell_zoom).select(
        "feature_id", F.col("lat").alias("flat"), F.col("lon").alias("flon"), "cx", "cy"
    )
    off = F.sequence(F.lit(-radius), F.lit(radius))
    feats_reg = (
        feats.withColumn("dx", F.explode(off))
        .withColumn("dy", F.explode(off))
        .select(
            "feature_id", "flat", "flon",
            (F.col("cx") + F.col("dx")).alias("cx"),
            (F.col("cy") + F.col("dy")).alias("cy"),
        )
    )
    cand = pts.join(F.broadcast(feats_reg), ["cx", "cy"], "inner")
    ranked = _rank_topk(cand.select(key, "lat", "lon", "feature_id", "flat", "flon"), key, k)

    if not exact:
        return ranked.select(key, "feature_id", "dist2", "rank")

    # certification bound (see module docstring)
    stats = points.agg(F.min("lat"), F.max("lat")).collect()[0]
    bound = radius * cell_min_extent(cell_zoom, int(stats[0]), int(stats[1]))
    bound2 = bound * bound

    kth = ranked.groupBy(key).agg(
        F.max("dist2").alias("kth_d2"), F.count("*").alias("n_cand")
    )
    certified_keys = kth.filter((F.col("n_cand") >= k) & (F.col("kth_d2") < bound2)).select(key)
    certified = ranked.join(F.broadcast(certified_keys), key, "left_semi")

    uncertified_pts = pts.join(F.broadcast(certified_keys), key, "left_anti")
    brute = _rank_topk(
        uncertified_pts.select(key, "lat", "lon").crossJoin(
            F.broadcast(feats.select("feature_id", "flat", "flon"))
        ),
        key,
        k,
    )
    return certified.select(key, "feature_id", "dist2", "rank").unionByName(
        brute.select(key, "feature_id", "dist2", "rank")
    )


def brute_force_knn(points: DataFrame, features: DataFrame, k: int = 1,
                    key: str = "page_id") -> DataFrame:
    """Baseline: broadcast cross-join + window top-k (oracle path)."""
    feats = features.select(
        "feature_id", F.col("lat").alias("flat"), F.col("lon").alias("flon")
    )
    cand = points.select(key, "lat", "lon").crossJoin(F.broadcast(feats))
    return _rank_topk(cand, key, k).select(key, "feature_id", "dist2", "rank")


def nearest_feature_m(knn_out: DataFrame, points: DataFrame, features: DataFrame,
                      key: str = "page_id") -> DataFrame:
    """Attach haversine meters to kNN output (vectorized pandas UDF)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def hav_m(lat1: pd.Series, lon1: pd.Series, lat2: pd.Series, lon2: pd.Series) -> pd.Series:
        return pd.Series(
            K.distance_m(
                lat1.to_numpy(np.int64), lon1.to_numpy(np.int64),
                lat2.to_numpy(np.int64), lon2.to_numpy(np.int64),
            )
        )

    feats = features.select("feature_id", F.col("lat").alias("flat"), F.col("lon").alias("flon"))
    j = (
        knn_out.join(points.select(key, "lat", "lon"), key)
        .join(F.broadcast(feats), "feature_id")
    )
    return j.withColumn("dist_m", hav_m("lat", "lon", "flat", "flon")).select(
        key, "feature_id", "dist2", "rank", "dist_m"
    )
