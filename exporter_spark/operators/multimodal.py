"""Multimodal column plumbing — SURVEY.md §2.5.

Images/audio/video travel as opaque ``binary`` payload columns with a
typed metadata struct alongside; all Spark-side mechanics (schema,
Arrow batch shape, mapInPandas partitioning) are real and tested. The
actual media decode is STUBBED — the runtime container has no
image/audio libraries — behind ``decoder=`` hooks; the default
deterministic fake derives features from the payload bytes so
pipelines are testable end-to-end. Swap in a real decoder
(PIL/torchaudio/...) via the ``decoder`` argument in production.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image/audio/video
        T.StructField("format", T.StringType()),  # png/wav/mp4/...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


def media_schema(id_type: T.DataType = T.LongType()) -> T.StructType:
    """Canonical multimodal table layout: id, payload, metadata."""
    return T.StructType(
        [
            T.StructField("media_id", id_type),
            T.StructField("payload", T.BinaryType()),
            T.StructField("meta", MEDIA_META),
        ]
    )


def _fake_features(payload: bytes, n: int) -> np.ndarray:
    """Deterministic stand-in for a real decode→embed step: n floats
    in [0,1) seeded from the payload digest."""
    h = hashlib.sha256(payload or b"").digest()
    out = np.empty(n, dtype=np.float32)
    for i in range(n):
        chunk = hashlib.sha256(h + i.to_bytes(4, "big")).digest()[:8]
        out[i] = int.from_bytes(chunk, "big") / 2**64
    return out


def stub_decoder(n_features: int = 8) -> Callable[[bytes], np.ndarray]:
    """Default decoder: raises for empty payloads (a real decoder
    would), else deterministic fake features. Self-contained closure —
    pickles by value, so executors don't need this package installed."""
    import hashlib as _hashlib

    import numpy as _np

    def decode(payload: bytes) -> np.ndarray:
        if payload is None or len(payload) == 0:
            raise NotImplementedError(
                "media decode is stubbed in this environment; payload empty"
            )
        h = _hashlib.sha256(payload or b"").digest()
        out = _np.empty(n_features, dtype=_np.float32)
        for i in range(n_features):
            chunk = _hashlib.sha256(h + i.to_bytes(4, "big")).digest()[:8]
            out[i] = int.from_bytes(chunk, "big") / 2**64
        return out

    return decode


def hex_chain_decoder(n_features: int = 8) -> Callable[[bytes], np.ndarray]:
    """Oracle-expressible decoder variant. ``stub_decoder`` chains
    sha256 over raw digest *bytes*, which DuckDB cannot replicate (its
    ``sha256`` only accepts VARCHAR); this one chains over the *hex*
    digest string so the exact same floats are computable in ANSI SQL:

        feature_i = uint64(sha256(hex(sha256(payload)) || str(i))[:16]) / 2**64

    each narrowed to float32. Use it when a query needs a value-level
    correctness gate on the multimodal path; the Spark-side plumbing
    (Arrow batches, mapInPandas, schema) is identical to the default.
    Self-contained closure — pickles by value."""
    import hashlib as _hashlib

    import numpy as _np

    def decode(payload: bytes) -> _np.ndarray:
        hh = _hashlib.sha256(payload or b"").hexdigest()
        out = _np.empty(n_features, dtype=_np.float32)
        for i in range(n_features):
            hx = _hashlib.sha256((hh + str(i)).encode()).hexdigest()[:16]
            out[i] = int(hx, 16) / 2**64
        return out

    return decode


def extract_features(
    df: DataFrame,
    *,
    payload_col: str = "payload",
    id_col: str = "media_id",
    n_features: int = 8,
    decoder: Callable[[bytes], np.ndarray] | None = None,
) -> DataFrame:
    """payload → array<float> features via Arrow-batched mapInPandas.

    The decode runs once per row inside a vectorized batch; partition
    boundaries (and therefore parallelism) are inherited from the
    source, so a repartition on ``id_col`` upstream controls task
    sizing for heavy decodes.
    """
    decode = decoder or stub_decoder(n_features)
    schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("features", T.ArrayType(T.FloatType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode(bytes(p)) .tolist() if p is not None else None
                for p in pdf[payload_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.select(id_col, payload_col).mapInPandas(run, schema)


def resize_media(
    df: DataFrame,
    width: int,
    height: int,
    *,
    payload_col: str = "payload",
    meta_col: str = "meta",
    resizer: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Resize plumbing: payload → resized payload + updated metadata,
    via Arrow-batched mapInPandas (full-row pass-through, so it
    composes anywhere in a pipeline). The actual pixel resample is
    STUBBED like decode — the default fake emits a deterministic
    digest-seeded payload of width·height/64 bytes so sizes scale
    plausibly; swap in a real resizer (PIL ``Image.resize`` → bytes)
    via ``resizer=`` in production. Self-contained closure — pickles
    by value."""
    if resizer is None:
        import hashlib as _hashlib

        def resizer(payload: bytes, w: int, h: int) -> bytes:
            if payload is None or len(payload) == 0:
                raise NotImplementedError(
                    "media resize is stubbed in this environment; payload empty"
                )
            n = max(1, (w * h) // 64)
            seed = _hashlib.sha256(payload + f"{w}x{h}".encode()).digest()
            return (seed * (n // len(seed) + 1))[:n]

    out_schema = df.schema

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[payload_col] = [
                resizer(bytes(p), width, height) if p is not None else None
                for p in pdf[payload_col]
            ]
            pdf[meta_col] = [
                None if m is None else {**m, "width": width, "height": height}
                for m in pdf[meta_col]
            ]
            yield pdf

    return df.mapInPandas(run, out_schema)


def sample_frames(
    df: DataFrame,
    *,
    every_ms: int = 1000,
    payload_col: str = "payload",
    id_col: str = "media_id",
    meta_col: str = "meta",
) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled timestamp
    (frame payload decode stubbed — returns the source payload digest
    per frame). Demonstrates the explode-based fan-out shape a real
    video pipeline uses."""
    frames = df.select(
        id_col,
        F.col(f"{meta_col}.duration_ms").alias("__dur__"),
        F.sha2(F.col(payload_col), 256).alias("__digest__"),
    ).filter(F.col("__dur__").isNotNull())
    return frames.select(
        id_col,
        F.posexplode(
            F.expr(f"sequence(0L, greatest(__dur__ - 1, 0L), {every_ms})")
        ).alias("frame_idx", "ts_ms"),
        F.col("__digest__").alias("frame_ref"),
    )
