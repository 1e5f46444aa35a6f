"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real (schema, partition-aware batch processing,
Arrow batch shapes); the codec calls are STUBBED because no image/audio
library ships in this container. ``decode="fake"`` substitutes a
deterministic, content-derived feature vector so the distributed pipeline
is testable end-to-end; ``decode="real"`` raises NotImplementedError at the
exact call site where PIL/ffmpeg would plug in.

Schema convention:

  media(media_id long, kind string in {image,audio,video},
        data binary, meta map<string,string>)

Every operator is ``mapInPandas`` — per-partition Arrow batches, no per-row
Python round trips.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = "media_id long, kind string, data binary, meta map<string,string>"

FEATURE_SCHEMA = "media_id long, kind string, n_bytes int, feature array<float>"


def _fake_feature(data: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a decoder: byte-histogram folded to dim
    via modulo binning (well-defined for ANY dim — the old truncate+reshape
    silently produced all-zero vectors for dim > 256)."""
    arr = np.frombuffer(data, dtype=np.uint8)
    hist = np.bincount(arr, minlength=256).astype("float64")
    folded = np.bincount(
        np.arange(256) % dim, weights=hist, minlength=dim
    )[:dim].astype("float32")
    norm = np.linalg.norm(folded)
    return folded / norm if norm > 0 else folded


def extract_features(
    media: DataFrame, dim: int = 16, decode: str = "fake"
) -> DataFrame:
    """Decode + feature-extract per media row (Arrow-batched).

    decode="real" marks where an actual codec (PIL.Image.open /
    soundfile.read / pyav) would be invoked — NOT IMPLEMENTED in this
    container, by design."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                raise NotImplementedError(
                    "real media decode requires PIL/soundfile/pyav, not present; "
                    "use decode='fake' for the deterministic test path"
                )
            feats = [
                _fake_feature(bytes(b) if b is not None else b"", dim).tolist()
                for b in pdf["data"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["data"].apply(lambda b: len(b) if b is not None else 0),
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = "media_id long, kind string, data binary, meta map<string,string>"


def resize_images(media: DataFrame, width: int, height: int, decode: str = "fake") -> DataFrame:
    """Image resize stub: fake path passes bytes through and records the
    target size in meta (plumbing + schema real; pixel work stubbed)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                raise NotImplementedError("real resize requires PIL; use decode='fake'")
            metas = []
            for m in pdf["meta"]:
                m = dict(m) if m is not None else {}
                m["resized_to"] = f"{width}x{height}"
                metas.append(m)
            out = pdf.copy()
            out["meta"] = metas
            yield out

    return media.filter(F.col("kind") == "image").mapInPandas(run, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = "media_id long, frame_idx int, data binary"


def sample_frames(media: DataFrame, every_n_bytes: int = 1024, decode: str = "fake") -> DataFrame:
    """Video frame sampling stub: the fake path slices the byte stream at
    fixed strides (one row per 'frame'), exercising the real explode-shaped
    output the ffmpeg path would produce."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                raise NotImplementedError("real frame sampling requires pyav/ffmpeg")
            ids, idxs, datas = [], [], []
            for mid, b in zip(pdf["media_id"], pdf["data"]):
                b = bytes(b) if b is not None else b""
                for i in range(0, max(len(b), 1), every_n_bytes):
                    ids.append(mid)
                    idxs.append(i // every_n_bytes)
                    datas.append(b[i : i + every_n_bytes])
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "data": datas})

    return media.filter(F.col("kind") == "video").mapInPandas(run, schema=FRAME_SCHEMA)


def generate_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table for tests (binary payload =
    hash-derived bytes; kind round-robins image/audio/video)."""
    kinds = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"),
    )
    payload = F.encode(
        F.concat_ws(
            "",
            F.transform(
                F.sequence(F.lit(0), F.lit(63)),
                lambda i: F.chr(F.pmod(F.xxhash64(F.col("id"), i, F.lit(seed)), F.lit(94)) + 33),
            ),
        ),
        "UTF-8",
    )
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        kinds.alias("kind"),
        payload.alias("data"),
        F.create_map(F.lit("source"), F.lit("synthetic")).alias("meta"),
    )
