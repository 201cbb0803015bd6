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
  stage is resumable; each stage writes one JSON record under
  ``lineage/`` with its input stages (the lineage DAG edge list),
  row count, partition histogram, bytes written, and wall time.

All filesystem access goes through the JVM Hadoop FileSystem bound to
``base_dir``'s scheme, so checkpoints/resume/byte accounting work the
same on local paths and on ``s3a://``/``hdfs://`` URIs (the lineage log
is one immutable file per record — object stores have no append).

At 100 TB the only extra cost per stage is one count-style aggregation
over data Spark already materializes for the checkpoint.
"""

from __future__ import annotations

import json
import re
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def partition_stats(df: DataFrame) -> list[dict]:
    """[{partition, rows}] for the DataFrame's current partitioning.
    Empty partitions emit no aggregation row — pair with
    ``df.rdd.getNumPartitions()`` for the true partition count."""
    rows = (
        df.groupBy(F.spark_partition_id().alias("partition"))
        .agg(F.count("*").alias("rows"))
        .collect()
    )
    return [{"partition": r.partition, "rows": r.rows} for r in rows]


class _FS:
    """Thin wrapper over the JVM Hadoop FileSystem for ``base``'s
    scheme — one code path for file:/, s3a:/, hdfs:/ checkpoints."""

    def __init__(self, spark: SparkSession, base: str):
        jvm = spark._jvm
        self._Path = jvm.org.apache.hadoop.fs.Path
        self._io = jvm.org.apache.commons.io.IOUtils
        self._base = self._Path(base)
        self._fs = self._base.getFileSystem(
            spark._jsc.hadoopConfiguration())

    def child(self, *parts: str):
        p = self._base
        for x in parts:
            p = self._Path(p, x)
        return p

    def exists(self, *parts: str) -> bool:
        return bool(self._fs.exists(self.child(*parts)))

    def mkdirs(self) -> None:
        self._fs.mkdirs(self._base)

    def dir_bytes(self, *parts: str) -> int:
        try:
            return int(self._fs.getContentSummary(
                self.child(*parts)).getLength())
        except Exception:
            return 0

    def read_text(self, *parts: str) -> str:
        # commons-io drains the stream JVM-side: py4j does not copy
        # Java-mutated byte[] buffers back into a Python bytearray
        st = self._fs.open(self.child(*parts))
        try:
            return self._io.toString(st, "UTF-8")
        finally:
            st.close()

    def write_text(self, text: str, *parts: str) -> None:
        st = self._fs.create(self.child(*parts), True)
        try:
            st.write(bytearray(text.encode("utf-8")))
        finally:
            st.close()

    def list_names(self, *parts: str) -> list[str]:
        p = self.child(*parts)
        if not self._fs.exists(p):
            return []
        return sorted(str(s.getPath().getName())
                      for s in self._fs.listStatus(p))


class Pipeline:
    """Resumable checkpointed stage runner with lineage logging."""

    def __init__(self, spark: SparkSession, base_dir: str, name: str = "pipeline"):
        self.spark = spark
        self.base_dir = base_dir.rstrip("/")
        self.name = name
        self._fs = _FS(spark, self.base_dir)
        self._fs.mkdirs()
        self._log_name = "lineage.jsonl"   # legacy single-file log (read-only)
        self._log_dir = "lineage"
        self._log_seq = 0

    def _log(self, rec: dict):
        """One immutable file per record under ``lineage/`` — O(1) per
        append and atomic at record granularity on any FileSystem
        (object stores have no append; the old whole-file rewrite was
        O(n²) over stages and two pipelines sharing ``base_dir`` could
        lose each other's records on a racing rewrite).  File names are
        ``<ns-timestamp>-<seq>-<stage>.json`` so a lexicographic listing
        is append order."""
        rec = {"pipeline": self.name, "ts": round(time.time(), 3), **rec}
        self._log_seq += 1
        safe = re.sub(r"[^A-Za-z0-9_.-]", "_", str(rec.get("stage", "")))[:64]
        fname = f"{time.time_ns():020d}-{self._log_seq:04d}-{safe}.json"
        self._fs.write_text(json.dumps(rec), self._log_dir, fname)

    def lineage(self) -> list[dict]:
        """All lineage records in append order (legacy ``lineage.jsonl``
        first, then the per-record ``lineage/`` files)."""
        recs: list[dict] = []
        if self._fs.exists(self._log_name):
            recs += [json.loads(x) for x in
                     self._fs.read_text(self._log_name).splitlines() if x]
        for name in self._fs.list_names(self._log_dir):
            if name.endswith(".json"):
                recs.append(json.loads(
                    self._fs.read_text(self._log_dir, name)))
        return recs

    def stage(self, name: str, fn, inputs: list[str] | tuple[str, ...] = (),
              partition_by: list[str] | None = None) -> DataFrame:
        """Run (or resume) one stage.

        ``fn() -> DataFrame`` is only invoked when the stage's checkpoint
        is missing or incomplete; otherwise the checkpoint is read back —
        which also cuts lineage for iterative callers.  ``inputs`` names
        upstream stages (the lineage DAG edges).
        """
        out = f"{self.base_dir}/{name}"
        if self._fs.exists(name, "_SUCCESS"):
            self._log({"stage": name, "inputs": list(inputs), "resumed": True,
                       "bytes": self._fs.dir_bytes(name)})
            schema = None
            if self._fs.exists(name, "_schema.json"):
                from pyspark.sql.types import StructType
                schema = StructType.fromJson(
                    json.loads(self._fs.read_text(name, "_schema.json")))
            return self._read_back(out, schema)
        t0 = time.time()
        df = fn()
        schema = df.schema
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(out)
        if partition_by:
            # pin the producer's schema for resumed reads too — first
            # run and resume must return identical column types/order
            self._fs.write_text(json.dumps(schema.jsonValue()),
                                name, "_schema.json")
        back = self._read_back(out, schema if partition_by else None)
        pstats = partition_stats(back)
        n_rows = sum(p["rows"] for p in pstats)
        rows_max = max((p["rows"] for p in pstats), default=0)
        # true partition count (empty partitions emit no stats row —
        # all-keys-in-one-partition skew must not read as balanced)
        n_parts = max(back.rdd.getNumPartitions(), 1)
        self._log({
            "stage": name, "inputs": list(inputs), "resumed": False,
            "rows": n_rows, "partitions": n_parts,
            "rows_max_partition": rows_max,
            "skew": round(rows_max * n_parts / n_rows, 3) if n_rows else 0.0,
            "bytes": self._fs.dir_bytes(name),
            "wall_s": round(time.time() - t0, 3),
            "partition_rows": pstats,
        })
        return back

    def _read_back(self, out: str, schema) -> DataFrame:
        """Read a checkpoint back; with ``schema`` (partitioned writes)
        the producer's column types and order are pinned, overriding
        partition-column type inference (a string '20250101' day column
        must not come back as a bigint at the end of the schema)."""
        r = self.spark.read
        if schema is not None:
            r = r.schema(schema)
        return r.parquet(out)
