"""Multimodal columns — image/audio/video as opaque binary + typed metadata.

The engine treats media payloads exactly like the reference treats opaque
cell values: never interpreted in the relational layer, analyzed only by
explicit operators. Schema convention:

    media(media_id long, kind string,          -- 'image' | 'audio' | 'video'
          payload binary, meta struct<...>)    -- typed per-kind metadata

Decode/feature steps run as Arrow-batched ``mapInPandas`` — one Python
process per task, whole files never on the driver, batch size bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` so executor memory holds
`batch × payload` not `partition × payload`.

The actual codec work (PIL/librosa/ffmpeg) is NOT available in this
environment, so the decode core is stubbed two ways (task brief: "stub the
decode step… make the Spark-side plumbing real and tested"):

* ``decode='fake'`` (default) — a deterministic pure-bytes featureizer
  (sha256-seeded stats over the payload) standing in for real decode; the
  schema, partitioning, UDF signature, and batch shape are production-real.
* ``decode='real'`` — raises ``NotImplementedError`` at the decode call
  site, marking exactly where PIL/soundfile plug in on a real cluster.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha256 string, "
    "width int, height int, duration_ms long"
)

FEATURE_DIM = 16
FEATURE_SCHEMA = f"media_id long, kind string, feature array<double>"


def _fake_decode(payload: bytes, kind: str) -> dict:
    """Deterministic stand-in for a real media decode: pseudo dimensions /
    duration derived from the content hash (stable under repartitioning)."""
    h = hashlib.sha256(payload).digest()
    return {
        "width": 64 + h[0] if kind == "image" else None,
        "height": 64 + h[1] if kind == "image" else None,
        "duration_ms": int.from_bytes(h[2:4], "big") if kind in ("audio", "video") else None,
    }


def _real_decode(payload: bytes, kind: str) -> dict:
    raise NotImplementedError(
        "real media decode requires PIL/soundfile/ffmpeg — not present in "
        "this environment; plug the codec in here on a real cluster"
    )


def extract_media_meta(df: DataFrame, decode: str = "fake") -> DataFrame:
    """media(payload binary) → per-item metadata via Arrow-batched
    mapInPandas. Pure narrow map: no shuffle, parallelism = input partitions."""
    decoder = _fake_decode if decode == "fake" else _real_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                d = decoder(b, kind)
                out.append(
                    {
                        "media_id": mid,
                        "kind": kind,
                        "n_bytes": len(b),
                        "sha256": hashlib.sha256(b).hexdigest(),
                        **d,
                    }
                )
            yield pd.DataFrame(out)

    return df.select("media_id", "kind", "payload").mapInPandas(run, MEDIA_META_SCHEMA)


def extract_media_features(df: DataFrame, dim: int = FEATURE_DIM, decode: str = "fake") -> DataFrame:
    """media → fixed-dim feature vector (the embed step of an image/audio
    pipeline). The fake path featurizes raw bytes (normalized byte-bucket
    histogram — deterministic, content-addressed); the real path is the
    NotImplementedError decode site."""
    if decode != "fake":
        _real_decode(b"", "image")  # raises

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                b = np.frombuffer(bytes(payload or b""), dtype=np.uint8)
                if b.size == 0:
                    feats.append([0.0] * dim)
                    continue
                hist = np.bincount(b // (256 // dim), minlength=dim)[:dim]
                feats.append((hist / hist.sum()).tolist())
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "kind": pdf["kind"], "feature": feats}
            )

    return df.select("media_id", "kind", "payload").mapInPandas(run, FEATURE_SCHEMA)


def sample_frames(df: DataFrame, every_n_bytes: int = 256, max_frames: int = 8) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emits (media_id,
    frame_idx, frame binary) rows — the fake path slices the payload at
    fixed strides (a real decoder would emit keyframes). One-to-many
    mapInPandas: output rows ≠ input rows, which is the shape a real
    frame sampler needs."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                for i in range(min(max_frames, max(1, len(b) // every_n_bytes))):
                    rows.append(
                        {
                            "media_id": mid,
                            "frame_idx": i,
                            "frame": b[i * every_n_bytes : (i + 1) * every_n_bytes],
                        }
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame"])

    return df.select("media_id", "payload").mapInPandas(
        run, "media_id long, frame_idx int, frame binary"
    )


def synth_media_df(spark, n: int, partitions: int = 8) -> DataFrame:
    """Deterministic synthetic media table (payload = seeded bytes) for
    tests/bench — same distributed-generation pattern as synth.pages_df."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ("image", "audio", "video")
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                seed = hashlib.sha256(f"media:{i}".encode()).digest()
                payload = (seed * (32 + i % 64))[: 512 + (i % 1024)]
                rows.append(
                    {"media_id": i, "kind": kinds[i % 3], "payload": payload}
                )
            yield pd.DataFrame(rows)

    return spark.range(0, n, 1, partitions).mapInPandas(
        gen, "media_id long, kind string, payload binary"
    )
