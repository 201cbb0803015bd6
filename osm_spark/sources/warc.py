"""WARC source (ISO 28500 / Common-Crawl layout): record index +
parallel Arrow-batched decode.

The same two-pass shape as the PBF source (sources/pbf.py — the
reference's streaming-parser re-expression, parser.ml:67-84):

1. ``warc_index`` — ONE cheap metadata pass yields
   (offset, size, compressed) per record.  For a plain ``.warc`` the
   pass reads only each record's header block and seeks past the body
   by ``Content-Length``.  For a ``.warc.gz`` in the Common-Crawl
   layout (one gzip MEMBER per record, concatenated) the pass walks
   member boundaries with a streaming inflater; production deployments
   read the offsets from the accompanying cdx/index files instead —
   the decode contract (offset, size) is identical either way.
2. ``decode_records`` — mapInPandas over the index: every executor
   range-reads ITS records (a ranged GET on object stores), gunzips
   members where needed, and parses WARC headers + the embedded HTTP
   response into typed columns.  Parallelism == record count.

Output schema mirrors BASELINE.json's input hint: (url, warc_ts,
html binary, record_type, http_status) — ``text``/``lang`` are derived
downstream (``operators.textops.extract_text_col``, ``langid_col``).
"""

from __future__ import annotations

import os
import zlib
from collections.abc import Iterator

import numpy as np  # noqa: F401  (kept with the sources' numpy convention)
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CRLF2 = b"\r\n\r\n"

# warc_ts is NTZ: WARC-Date is an explicit UTC instant; storing the
# UTC wall time tz-free keeps every downstream epoch computation
# session-timezone-independent (same convention as the events table)
WARC_SCHEMA = ("url string, warc_ts timestamp_ntz, html binary, "
               "record_type string, http_status int")


def _parse_headers(block: bytes) -> dict[str, str]:
    out: dict[str, str] = {}
    for line in block.split(b"\r\n")[1:]:        # first line: WARC/1.0
        if b":" in line:
            k, v = line.split(b":", 1)
            out[k.strip().decode("ascii").lower()] = v.strip().decode(
                "utf-8", "replace")
    return out


def iter_warc_index(path: str):
    """Yield (offset, size, compressed) per WARC record — metadata-only
    pass (header block + Content-Length seek for plain files; streaming
    member-boundary walk for .warc.gz)."""
    cdx = path + ".cdx"
    if os.path.exists(cdx):
        # production path: offsets from the accompanying cdx side file
        # (what Common Crawl publishes) — no inflation at all
        compressed = path.endswith(".gz")
        entries = []
        with open(cdx) as f:
            for line in f:
                parts = line.split()
                if len(parts) >= 2:
                    entries.append((int(parts[0]), int(parts[1]), compressed))
        if entries or os.path.getsize(path) == 0:
            yield from entries
            return
        # an empty side file next to a non-empty warc is a partial
        # write (landing dirs write the warc first): distrust it and
        # fall through to the walking index rather than silently
        # dropping every record
    if path.endswith(".gz"):
        # no side file: one streaming inflate over the file to find
        # member boundaries — chunk-fed from INCREMENTAL file reads
        # (O(chunk) memory and O(N) work; never the whole file, never
        # the whole tail); output bytes are discarded
        with open(path, "rb") as f:
            pos = 0              # file offset of the current member
            carry = b""          # tail of the last read beyond member end
            chunk_sz = 1 << 18
            while True:
                d = zlib.decompressobj(wbits=31)
                consumed = 0     # bytes attributed to this member
                fed = carry
                carry = b""
                while True:
                    if not fed:
                        fed = f.read(chunk_sz)
                        if not fed:
                            if consumed == 0:
                                return       # clean EOF at a boundary
                            raise ValueError("truncated gzip member")
                    d.decompress(fed)
                    consumed += len(fed)
                    fed = b""
                    if d.eof:
                        carry = d.unused_data
                        consumed -= len(carry)
                        break
                yield pos, consumed, True
                pos += consumed
    with open(path, "rb") as f:
        off = 0
        while True:
            f.seek(off)
            head = f.read(4096)
            if not head.strip():
                return
            hend = head.find(CRLF2)
            while hend < 0:
                more = f.read(4096)
                if not more:
                    return
                head += more
                hend = head.find(CRLF2)
            hdrs = _parse_headers(head[:hend])
            clen = int(hdrs["content-length"])
            size = hend + 4 + clen + 4          # headers + body + \r\n\r\n
            yield off, size, False
            off += size


def warc_index(spark: SparkSession, path: str) -> DataFrame:
    """Record index as a DataFrame.  With a cdx side file the index is
    read DISTRIBUTED (Spark csv scan — the driver never materializes
    it); the walked fallback ships via one Arrow batch."""
    cdx = path + ".cdx"
    if os.path.exists(cdx) and (os.path.getsize(cdx) > 0
                                or os.path.getsize(path) == 0):
        return (spark.read
                .csv(cdx, sep=" ", schema="offset long, size long")
                # tokens beyond the first two are dropped by the csv
                # reader (matching iter_warc_index's >= 2 rule); a
                # short or non-numeric line nulls a field — drop it
                # rather than crash the decoder on a NULL offset
                .where(F.col("offset").isNotNull()
                       & F.col("size").isNotNull())
                .withColumn("compressed",
                            F.lit(path.endswith(".gz"))))
    rows = pd.DataFrame(iter_warc_index(path),
                        columns=["offset", "size", "compressed"])
    return spark.createDataFrame(
        rows, "offset long, size long, compressed boolean")


def decode_record(raw: bytes) -> tuple:
    """One WARC record -> (url, warc_ts_iso, html, record_type, status).
    The HTTP response head is stripped; ``html`` is the response body
    bytes exactly as stored."""
    hend = raw.find(CRLF2)
    hdrs = _parse_headers(raw[:hend])
    body = raw[hend + 4:hend + 4 + int(hdrs["content-length"])]
    rtype = hdrs.get("warc-type", "")
    url = hdrs.get("warc-target-uri")
    ts = hdrs.get("warc-date")
    status = None
    html = None
    if rtype == "response" and body.startswith(b"HTTP/"):
        bhend = body.find(CRLF2)
        status_line = body[:body.find(b"\r\n")]
        try:
            status = int(status_line.split()[1])
        except (IndexError, ValueError):
            status = None
        html = body[bhend + 4:]
    return url, ts, html, rtype, status


_SPAN_BYTES = 8 << 20        # coalesced read span (one ranged GET)


def decode_records(spark: SparkSession, path: str,
                   index: DataFrame | None = None) -> DataFrame:
    """Parallel decode: mapInPandas over the record index; each worker
    range-reads and parses its own records.

    Partitioning is RANGE on offset, so every task owns a contiguous
    byte region, and each pandas batch's records are read as a few
    coalesced ~8 MB span reads instead of one seek+read per record —
    on an object store that is the difference between 10k GETs and a
    handful of ranged GETs per task."""
    if index is None:
        index = warc_index(spark, path)
    idx = index.repartitionByRange(
        max(spark.sparkContext.defaultParallelism, 2), "offset")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _decode_pdf(path, pdf)

    return idx.mapInPandas(fn, WARC_SCHEMA)


def _decode_pdf(path: str, pdf: pd.DataFrame) -> pd.DataFrame:
    """Decode one index batch (offset, size, compressed) of ``path``
    into typed WARC_SCHEMA columns via span-coalesced range reads."""
    pdf = pdf.sort_values("offset")
    offs = pdf["offset"].to_numpy()
    ends = offs + pdf["size"].to_numpy()
    urls, tss, htmls, types, stats = [], [], [], [], []
    comp = pdf["compressed"].to_numpy()
    with open(path, "rb") as f:
        # greedy span grouping: cut where the next record would push
        # the span past _SPAN_BYTES (records are adjacent, so spans
        # are dense).  Each span is parsed as soon as it is read, so
        # raw-byte residency stays at ONE span, not the whole batch.
        s = 0
        for i in range(1, len(offs) + 1):
            if i == len(offs) or ends[i - 1] - offs[s] > _SPAN_BYTES:
                f.seek(int(offs[s]))
                buf = memoryview(f.read(int(ends[i - 1] - offs[s])))
                base = int(offs[s])
                for j in range(s, i):
                    raw = bytes(buf[int(offs[j]) - base:
                                    int(ends[j]) - base])
                    if comp[j]:
                        raw = zlib.decompress(raw, wbits=31)
                    url, ts, html, rtype, status = decode_record(raw)
                    urls.append(url)
                    tss.append(pd.Timestamp(ts) if ts else pd.NaT)
                    htmls.append(html)
                    types.append(rtype)
                    stats.append(status)
                s = i
    ts = pd.Series(tss, dtype="datetime64[ns, UTC]") \
        .dt.tz_convert("UTC").dt.tz_localize(None)
    return pd.DataFrame({
        "url": urls,
        "warc_ts": ts,
        "html": htmls,
        "record_type": types,
        "http_status": pd.array(stats, dtype="Int32"),
    })


def stream_warc_pages(spark: SparkSession, landing_dir: str) -> DataFrame:
    """Structured-Streaming WARC ingestion: ``.warc(.gz)`` files land
    in ``landing_dir`` together with ``.cdx`` side files; the stream
    tails the cdx files with Spark's file source (exactly-once file
    tracking for free) and decodes each batch's members with the same
    span-read kernel as the batch reader.  Returns the streaming pages
    DataFrame (url, warc_ts, html) — compose with watermarks /
    extract_text_col / writeStream downstream.

    Landing contract: write the warc FIRST, then the cdx, and create
    the cdx atomically (write to a temp name + rename).  Spark's file
    source snapshots a file once at first sight — a cdx that appears
    empty and is filled in place would pin that file's index at zero
    rows forever (the batch reader, by contrast, re-walks on an empty
    side file; see iter_warc_index)."""
    from urllib.parse import unquote, urlparse

    idx = (spark.readStream
           .schema("offset long, size long")
           .option("sep", " ")
           .csv(os.path.join(landing_dir, "*.cdx"))
           .withColumn("src", F.input_file_name()))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            for src, grp in pdf.groupby("src"):
                path = unquote(urlparse(str(src)).path)
                if path.endswith(".cdx"):
                    path = path[:-len(".cdx")]
                grp = grp.assign(compressed=path.endswith(".gz"))
                yield _decode_pdf(
                    path, grp[["offset", "size", "compressed"]])

    recs = idx.mapInPandas(fn, WARC_SCHEMA)
    return recs.filter("record_type = 'response' AND http_status = 200") \
        .select("url", "warc_ts", "html")


def read_warc_pages(spark: SparkSession, path: str) -> DataFrame:
    """WARC file -> Common-Crawl-style pages: 200-OK response records
    only, (url, warc_ts, html)."""
    recs = decode_records(spark, path)
    return recs.filter("record_type = 'response' AND http_status = 200") \
        .select("url", "warc_ts", "html")


def read_warc_pages_full(spark: SparkSession, path: str) -> DataFrame:
    """Pages in exactly the engine's canonical input shape
    (BASELINE.json input_hint): (url, warc_ts, html, text, lang) —
    text via the JVM extractor (byte-identity invariant), lang via the
    marker-word language id.  All derivation is whole-stage-codegen
    column expressions over the decode output; no extra pass."""
    from pyspark.sql import functions as F

    from osm_spark.operators import textops as TX

    p = read_warc_pages(spark, path)
    text = TX.extract_text_col(F.col("html"))
    return p.select("url", "warc_ts", "html", text.alias("text"),
                    TX.langid_col(text).alias("lang"))
