"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, with Arrow-batched decode / feature-extract / sample stages.

The Spark-side plumbing (schema, batching, partitioning, UDF
signatures) is real and tested; the actual codec work is either a pure
byte-level computation (histogram features, stride sampling — no
external libs needed, deterministic) or gated behind an import-try
(PIL/librosa are not in this container) that raises
``NotImplementedError`` with the real call shape in place.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("doc_id long, media binary, media_type string, "
                "width int, height int, duration_ms int")

N_HIST_BINS = 16


def attach_fake_media(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Derive a deterministic opaque media payload + metadata per doc
    (sha-expanded bytes of the text) — the fixture for multimodal tests;
    on real data this column comes straight from the lake."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            medias, mts, ws, hs, ds = [], [], [], [], []
            for did, txt in zip(pdf["doc_id"], pdf[text_col]):
                dig = hashlib.sha256(str(txt).encode()).digest()
                size = 512 + dig[0] * 7
                medias.append((dig * (size // 32 + 1))[:size])
                mt = ["image/png", "audio/wav", "video/mp4"][did % 3]
                mts.append(mt)
                ws.append(16 + dig[1] % 64 if mt == "image/png" else 0)
                hs.append(16 + dig[2] % 64 if mt == "image/png" else 0)
                ds.append(1000 + dig[3] * 100 if mt != "image/png" else 0)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"], "media": medias, "media_type": mts,
                "width": pd.array(ws, dtype="int32"),
                "height": pd.array(hs, dtype="int32"),
                "duration_ms": pd.array(ds, dtype="int32"),
            })

    return docs.select("doc_id", text_col).mapInPandas(fn, MEDIA_SCHEMA)


def byte_histogram_features(media_df: DataFrame,
                            bins: int = N_HIST_BINS) -> DataFrame:
    """(doc_id, features array<long>): byte-value histogram of the
    payload — a real, deterministic feature extractor (the shape every
    decode-based extractor plugs into)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for blob in pdf["media"]:
                arr = np.frombuffer(bytes(blob), dtype=np.uint8)
                hist = np.bincount(arr >> int(np.log2(256 // bins)),
                                   minlength=bins)
                feats.append(hist.astype(np.int64).tolist())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    return media_df.select("doc_id", "media").mapInPandas(
        fn, "doc_id long, features array<long>")


def sample_frames(media_df: DataFrame, n_frames: int = 4,
                  frame_bytes: int = 64) -> DataFrame:
    """(doc_id, frame_idx, frame binary): deterministic stride sampling
    of the payload — the batching/explode shape of real video frame
    sampling (ffmpeg-backed at production; byte strides here)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for did, blob in zip(pdf["doc_id"], pdf["media"]):
                b = bytes(blob)
                stride = max((len(b) - frame_bytes) // max(n_frames - 1, 1), 1)
                for k in range(n_frames):
                    off = min(k * stride, max(len(b) - frame_bytes, 0))
                    ids.append(did)
                    idxs.append(k)
                    frames.append(b[off:off + frame_bytes])
            yield pd.DataFrame({
                "doc_id": ids,
                "frame_idx": pd.array(idxs, dtype="int32"),
                "frame": frames,
            })

    return media_df.select("doc_id", "media").mapInPandas(
        fn, "doc_id long, frame_idx int, frame binary")


def decode_and_resize(media_df: DataFrame, width: int, height: int,
                      fake: bool = False) -> DataFrame:
    """Image decode + resize.  The real decode requires PIL (not in
    this container) and raises NotImplementedError without it; pass
    ``fake=True`` for a clearly-marked deterministic fake decoder
    (sha256-expanded grayscale "pixels" of the right size) so the Spark
    plumbing — mapInPandas over binary, batch shape, output schema —
    runs and is tested end-to-end."""
    try:
        from PIL import Image  # noqa: F401
        have_pil = True
    except ImportError:
        have_pil = False

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        for pdf in batches:
            out = []
            for blob in pdf["media"]:
                if fake:
                    # DETERMINISTIC FAKE (not a real decode): expand the
                    # payload hash to width*height grayscale bytes
                    seed = hashlib.sha256(bytes(blob)).digest()
                    n = width * height
                    out.append((seed * (n // 32 + 1))[:n])
                elif not have_pil:
                    raise NotImplementedError(
                        "image decode requires PIL (not available in this "
                        "environment); use fake=True to exercise the "
                        "plumbing, or byte_histogram_features for real "
                        "byte-level features")
                else:
                    img = Image.open(io.BytesIO(bytes(blob))).convert(
                        "L").resize((width, height))
                    out.append(img.tobytes())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "pixels": out})

    return media_df.select("doc_id", "media").mapInPandas(
        fn, "doc_id long, pixels binary")
