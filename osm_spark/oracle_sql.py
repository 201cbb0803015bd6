"""Shared SQL fragments for the DuckDB oracle queries.

Every fragment is generated from the same Python constants the Spark
operators use (osm_spark.fixtures / geo.kernels), in exact int64
arithmetic, so value hashes match bit-for-bit across engines.
"""

from __future__ import annotations

import numpy as np

from osm_spark import fixtures as FX
from osm_spark.geo import kernels as K

# documents geocode CTE — mirrors operators.geocode.geocode_id_cols
PTS_CTE = (
    "pts AS (SELECT doc_id, "
    f"{FX.LAT0} + (doc_id * {FX.GEO_A}) % {FX.SPAN} AS lat, "
    f"{FX.LON0} + (doc_id * {FX.GEO_B}) % {FX.SPAN} AS lon FROM documents)"
)


def city_edges_values() -> str:
    """Polygon edges of the 5 city polygons as a VALUES literal:
    (feature_id, role, x1, y1, x2, y2) with x=lon, y=lat."""
    rows = []
    for p in FX.city_polygons():
        for r in p["rings"]:
            for i in range(len(r["lat"]) - 1):
                rows.append(
                    f"({p['feature_id']},{r['role']},{r['lon'][i]},{r['lat'][i]},"
                    f"{r['lon'][i + 1]},{r['lat'][i + 1]})"
                )
    return ",".join(rows)


def pip_hits_sql() -> str:
    """CTE chain computing (doc_id, feature_id) PIP hits against the city
    polygons with the reference crossing-number conventions
    (osm/geometry.ml:157-174): toggle when (y1>=y)!=(y2>=y) and (d>=0)!=(y1>=y)."""
    return f"""
{PTS_CTE},
edges(feature_id, role, x1, y1, x2, y2) AS (VALUES {city_edges_values()}),
cross_counts AS (
  SELECT p.doc_id, e.feature_id, e.role, count(*) AS c
  FROM pts p JOIN edges e
    ON ((e.y1 >= p.lat) <> (e.y2 >= p.lat))
   AND ((((e.x2 - e.x1) * (p.lat - e.y1) - (p.lon - e.x1) * (e.y2 - e.y1)) >= 0) <> (e.y1 >= p.lat))
  GROUP BY 1, 2, 3
),
hits AS (
  SELECT doc_id, feature_id FROM cross_counts
  GROUP BY doc_id, feature_id
  HAVING max(CASE WHEN role = 0 THEN c % 2 ELSE 0 END) = 1
     AND max(CASE WHEN role = 1 THEN c % 2 ELSE 0 END) = 0
)"""


def tile_rows_values(zooms=(8, 12)) -> str:
    """(z, y, lat_hi, lat_lo) VALUES literal of tile-row boundaries
    covering the fixture world box (integer-exact, from the same
    kernels.tile_y_boundaries the Spark side broadcasts)."""
    rows = []
    for z in zooms:
        rs, bs = K.tile_y_boundaries(z, FX.LAT0, FX.LAT0 + FX.SPAN)
        for y, hi, lo in zip(rs, bs, bs[1:]):
            rows.append(f"({z},{y},{hi},{lo})")
    return ",".join(rows)


def tile_x_sql(zooms=(8, 12)) -> str:
    branches = " ".join(
        f"WHEN r.z = {z} THEN ((p.lon + {K.LON_OFFSET}) * {1 << z}) // {K.LON_WORLD}"
        for z in zooms
    )
    return f"CASE {branches} END"


def knn_features(n: int = 32, offset: int = 7777):
    ids = np.arange(n, dtype=np.int64)
    lat, lon = FX.geocode_ints(ids + offset)
    return list(zip(ids.tolist(), lat.tolist(), lon.tolist()))


def knn_features_values(n: int = 32) -> str:
    return ",".join(f"({f},{la},{lo})" for f, la, lo in knn_features(n))


# --- z-order bit-dilation steps (mirrors kernels.dilate) ---------------
_DILATE = [
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]


def zorder_ctes_duckdb() -> str:
    """CTE chain dilating u,v (15-bit cell coords) then interleaving."""
    steps = [
        f"uv AS (SELECT doc_id, (lat - {FX.LAT0}) // 2048 AS u, "
        f"(lon - {FX.LON0}) // 2048 AS v FROM pts)"
    ]
    prev = "uv"
    for n, (s, m) in enumerate(_DILATE):
        steps.append(
            f"d{n} AS (SELECT doc_id, ((u | (u << {s})) & {m}) AS u, "
            f"((v | (v << {s})) & {m}) AS v FROM {prev})"
        )
        prev = f"d{n}"
    return ",\n".join(steps), prev


MINHASH_TOKS_CTE = (
    "toks AS (SELECT DISTINCT doc_id, tok FROM "
    "(SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) "
    "WHERE tok <> '')"
)

TOKEN_HASH_DUCKDB = "(('0x' || substr(md5(tok), 1, 8))::BIGINT)"
