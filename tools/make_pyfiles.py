"""Package osm_spark for spark-submit --py-files.

Builds dist/osm_spark.zip (the package only — no tests/tools) so jobs
run on a real cluster as:

    python tools/make_pyfiles.py
    spark-submit --py-files dist/osm_spark.zip bench.py
    spark-submit --py-files dist/osm_spark.zip tools/scaling.py  # driver box

The modules import only pyspark/pandas/numpy (cluster-standard), so the
zip is self-contained.
"""

from __future__ import annotations

import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main() -> str:
    dist = REPO / "dist"
    dist.mkdir(exist_ok=True)
    out = dist / "osm_spark.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted((REPO / "osm_spark").rglob("*.py")):
            z.write(p, p.relative_to(REPO))
    print(out)
    return str(out)


if __name__ == "__main__":
    main()
