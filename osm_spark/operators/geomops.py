"""Column-level geometry operators over the polygon-layer schema.

Thin Arrow-batched wrappers around osm_spark.geo.kernels, registered as
driver-checkable queries (SURVEY.md §2.2 G1/G8/G12).  All arithmetic is
either exact int64 or single-rounding IEEE ops shared bit-for-bit with
the DuckDB oracle SQL.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_spark.geo import kernels as K


def haversine_col(lat1, lon1, lat2, lon2):
    """Haversine distance column (fixed-point in, int64 mm out) —
    reference-exact (osm/geometry.ml:29-36), vectorized pandas UDF."""

    @F.pandas_udf("long")
    def hav(a: pd.Series, b: pd.Series, c: pd.Series, d: pd.Series) -> pd.Series:
        return pd.Series(K.distance(a.to_numpy(), b.to_numpy(),
                                    c.to_numpy(), d.to_numpy()))

    return hav(lat1, lon1, lat2, lon2)


def feature_areas(polys: DataFrame) -> DataFrame:
    """(feature_id, area): signed integer shoelace summed over rings,
    holes (CW) negative — surfaces.ml:655-657 semantics with the
    reference's (a+1)/2 truncating division (geometry.ml:211-226)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fids, areas = [], []
            for fid, rings in zip(pdf["feature_id"], pdf["rings"]):
                a = sum(
                    K.polygon_area(np.asarray(r["lon"], np.int64),
                                   np.asarray(r["lat"], np.int64))
                    for r in rings
                )
                fids.append(fid)
                areas.append(int(a))
            yield pd.DataFrame({"feature_id": fids, "area": areas})

    return polys.select("feature_id", "rings").mapInPandas(
        fn, "feature_id long, area long")


def feature_dp_counts(polys: DataFrame, ratio: int) -> DataFrame:
    """(feature_id, n_in, n_kept): Douglas-Peucker vertex retention per
    feature at epsilon=ratio (douglas_peucker.ml:73-127 int semantics),
    summed over rings."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"feature_id": [], "n_in": [], "n_kept": []}
            for fid, rings in zip(pdf["feature_id"], pdf["rings"]):
                n_in = n_kept = 0
                for r in rings:
                    la = np.asarray(r["lat"], np.int64)
                    lo = np.asarray(r["lon"], np.int64)
                    n_in += len(la)
                    n_kept += int(K.douglas_peucker_int(ratio, lo, la).sum())
                out["feature_id"].append(fid)
                out["n_in"].append(n_in)
                out["n_kept"].append(n_kept)
            yield pd.DataFrame(out)

    return polys.select("feature_id", "rings").mapInPandas(
        fn, "feature_id long, n_in long, n_kept long")
