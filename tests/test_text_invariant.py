"""North-rule per-row invariant: extracted ``text`` (and the ``html``
payload) per url stays byte-identical through the engine — geocode,
shuffle, spatial join, checkpoint write/read included."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from osm_spark import fixtures as FX
from osm_spark.metrics import Pipeline
from osm_spark.operators.geocode import geocode_pages
from osm_spark.operators.spatial_join import spatial_join


def _digests(df):
    rows = df.select("url", "text", "html").collect()
    return {
        r.url: (hashlib.sha256(r.text.encode()).hexdigest(),
                hashlib.sha256(bytes(r.html)).hexdigest())
        for r in rows
    }


def test_text_and_html_byte_identity_through_pipeline(spark, tmp_path):
    pages = FX.pages_df(spark, 500)
    want = _digests(pages)

    pl = Pipeline(spark, str(tmp_path / "pl"), "invariant")
    geo = pl.stage("geocode", lambda: geocode_pages(pages))
    polys = spark.createDataFrame(
        [(p["feature_id"], p["category"], p["layer"],
          [(r["role"], r["lat"], r["lon"]) for r in p["rings"]])
         for p in FX.city_polygons()],
        FX.POLYGON_SCHEMA,
    )

    def tag():
        m = spatial_join(geo, polys, how="left")
        return geo.join(m, "page_id", "left").repartition(7, "feature_id")

    tagged = pl.stage("tag", tag, inputs=["geocode"])
    got = _digests(tagged)
    assert got == want  # byte-identical text+html per url, post-checkpoint

    # lineage recorded for both stages with partition row detail
    recs = [r for r in pl.lineage() if not r.get("resumed")]
    assert {r["stage"] for r in recs} == {"geocode", "tag"}
