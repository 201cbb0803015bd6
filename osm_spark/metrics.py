"""Per-stage lineage + metrics and resumable checkpointed pipelines.

The reference tracks progress with per-stage wall-clock timers and
byte/row counters (SURVEY.md §2.6 S5: parser.ml:457-465, join.ml:20,127,
sorting.ml:246-261) and makes every preprocessing stage restartable by
materializing its output column directory.  The Spark-first equivalent:

- ``partition_stats(df)`` — per-partition row counts in one distributed
  aggregation (``spark_partition_id()``), the skew diagnostic the north
  rule asks to track per stage;
- ``Pipeline`` — named stages checkpointed to ``<base>/<stage>`` parquet
  (Iceberg table when a catalog is configured — see ``osm_spark.io``);
  a re-run reuses any stage whose checkpoint is complete, so every
  stage is resumable; each stage appends one JSON line to
  ``lineage.jsonl`` with its input stages (the lineage DAG edge list),
  row count, partition histogram, bytes written, and wall time.

At 100 TB the only extra cost per stage is one count-style aggregation
over data Spark already materializes for the checkpoint.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def partition_stats(df: DataFrame) -> list[dict]:
    """[{partition, rows}] for the DataFrame's current partitioning."""
    rows = (
        df.groupBy(F.spark_partition_id().alias("partition"))
        .agg(F.count("*").alias("rows"))
        .collect()
    )
    return [{"partition": r.partition, "rows": r.rows} for r in rows]


def _dir_bytes(p: Path) -> int:
    return sum(f.stat().st_size for f in p.rglob("*") if f.is_file())


class Pipeline:
    """Resumable checkpointed stage runner with lineage logging."""

    def __init__(self, spark: SparkSession, base_dir: str, name: str = "pipeline"):
        self.spark = spark
        self.base = Path(base_dir)
        self.name = name
        self.base.mkdir(parents=True, exist_ok=True)
        self._log_path = self.base / "lineage.jsonl"

    def _log(self, rec: dict):
        rec = {"pipeline": self.name, "ts": round(time.time(), 3), **rec}
        with open(self._log_path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    def lineage(self) -> list[dict]:
        if not self._log_path.exists():
            return []
        return [json.loads(x) for x in
                self._log_path.read_text().splitlines() if x]

    def stage(self, name: str, fn, inputs: list[str] | tuple[str, ...] = (),
              partition_by: list[str] | None = None) -> DataFrame:
        """Run (or resume) one stage.

        ``fn() -> DataFrame`` is only invoked when the stage's checkpoint
        is missing or incomplete; otherwise the checkpoint is read back —
        which also cuts lineage for iterative callers.  ``inputs`` names
        upstream stages (the lineage DAG edges).
        """
        out = self.base / name
        if (out / "_SUCCESS").exists():
            self._log({"stage": name, "inputs": list(inputs), "resumed": True,
                       "bytes": _dir_bytes(out)})
            return self.spark.read.parquet(str(out))
        t0 = time.time()
        df = fn()
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(str(out))
        back = self.spark.read.parquet(str(out))
        pstats = partition_stats(back)
        n_rows = sum(p["rows"] for p in pstats)
        rows_max = max((p["rows"] for p in pstats), default=0)
        n_parts = max(len(pstats), 1)
        self._log({
            "stage": name, "inputs": list(inputs), "resumed": False,
            "rows": n_rows, "partitions": n_parts,
            "rows_max_partition": rows_max,
            "skew": round(rows_max * n_parts / n_rows, 3) if n_rows else 0.0,
            "bytes": _dir_bytes(out),
            "wall_s": round(time.time() - t0, 3),
            "partition_rows": pstats,
        })
        return back
