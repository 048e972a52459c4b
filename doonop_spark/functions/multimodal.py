"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, processed by Arrow-batched ``mapInPandas`` operators.

The Spark-side plumbing — schemas, batch iteration, partition sizing,
output contracts — is real and tested; the *codecs* are not: this runtime
ships no image/audio libraries, so the decode step is pluggable and the
default decoder is a clearly-marked deterministic fake (or
``NotImplementedError`` in strict mode). Swap ``decoder=`` for a real
Pillow/torchaudio-backed callable on a cluster that has them.

Why mapInPandas: media blobs are large, so per-row Python is ruinous and
per-partition batch iteration lets a decoder amortize model/codec init
exactly like the reference's engine ring amortizes WebDriver sessions
(``src/engine_ring.rs:32-54``).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "MEDIA_SCHEMA",
    "fake_decode",
    "strict_decode",
    "decode_media",
    "extract_features",
    "sample_frames",
]

# typed metadata contract for an opaque media column
MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)


def strict_decode(payload: bytes, mime: str) -> np.ndarray:
    """The real-decoder slot. No media codecs ship in this runtime."""
    raise NotImplementedError(
        "media decoding requires an image/audio codec library (e.g. Pillow,"
        " torchaudio) that is not installed in this environment; pass a"
        " decoder= callable backed by one, or use fake_decode for plumbing"
        " tests"
    )


def fake_decode(payload: bytes, mime: str) -> np.ndarray:
    """DETERMINISTIC FAKE decoder (plumbing stand-in, NOT a codec): expands
    the payload digest into a fixed 8x8 float32 'frame' so downstream
    shapes/statistics are stable and assertable."""
    digest = hashlib.sha256(payload or b"").digest()
    arr = np.frombuffer((digest * 2)[:64], dtype=np.uint8).astype(np.float32)
    return arr.reshape(8, 8) / 255.0


def decode_media(
    df: DataFrame,
    decoder: Callable[[bytes, str], np.ndarray] = fake_decode,
    batch_hint: int = 64,
) -> DataFrame:
    """binary payload → decoded frame stats (mapInPandas). Output keeps the
    id plus the decoded shape and summary stats — the pattern a real
    feature extractor follows; errors are rows, not exceptions."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-partition init happens HERE (codec/model load amortized)
        for pdf in batches:
            out = []
            for mid, payload, mime in zip(pdf["media_id"], pdf["payload"], pdf["mime"]):
                try:
                    frame = decoder(bytes(payload) if payload is not None else b"", mime)
                    out.append(
                        (
                            int(mid),
                            list(frame.shape),
                            float(frame.mean()),
                            float(frame.std()),
                            None,
                        )
                    )
                except NotImplementedError as e:
                    out.append((int(mid), None, None, None, str(e)[:80]))
            yield pd.DataFrame(
                out, columns=["media_id", "shape", "mean", "std", "error"]
            )

    return df.select("media_id", "payload", "mime").mapInPandas(
        run,
        schema="media_id long, shape array<int>, mean double, std double, error string",
    )


def extract_features(
    df: DataFrame,
    dim: int = 16,
    decoder: Callable[[bytes, str], np.ndarray] = fake_decode,
) -> DataFrame:
    """media → embedding-shaped feature vector (array<float>), usable by
    operators/similarity.py. Deterministic under the fake decoder."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, vecs = [], []
            for mid, payload, mime in zip(pdf["media_id"], pdf["payload"], pdf["mime"]):
                frame = decoder(bytes(payload) if payload is not None else b"", mime)
                flat = frame.ravel()
                reps = int(np.ceil(dim / flat.size))
                vecs.append(np.tile(flat, reps)[:dim].astype(np.float32).tolist())
                ids.append(int(mid))
            yield pd.DataFrame({"media_id": ids, "features": vecs})

    return df.select("media_id", "payload", "mime").mapInPandas(
        run, schema="media_id long, features array<float>"
    )


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plan: expands each media row into frame
    timestamps (JVM-side sequence/explode — the actual frame *decode* is
    the pluggable decoder applied per sampled offset). Demonstrates the
    explode-then-decode shape that keeps frame fan-out in Catalyst."""
    return (
        df.filter(F.col("kind") == "video")
        # zero-length media yields NO frames (sequence(0, 0) would emit a
        # phantom frame at t=0 for duration_ms=0)
        .filter(F.col("duration_ms") >= 1)
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )
