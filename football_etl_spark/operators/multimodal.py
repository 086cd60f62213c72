"""Multimodal column plumbing — image/audio/video as opaque binary.

The Spark-side contract is real and tested: binary payload columns
with typed metadata structs, Arrow-batched ``mapInPandas`` operators
with explicit output schemas, and partitioning that keeps large blobs
from skewing tasks. The actual media decoding is STUBBED — the
image/audio libraries are not in this container — behind
``_decode_payload``, which produces a deterministic fake so the
pipeline is end-to-end testable. Swap that one function for a real
decoder (PIL / torchaudio / pyav) in production.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("checksum", T.StringType()),
                ]
            ),
            True,
        ),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def attach_binary_payload(df: DataFrame, id_col: str, source_col: str, mime: str = "application/octet-stream") -> DataFrame:
    """Wrap an existing column as a binary payload + metadata struct —
    the ingest adapter that turns any bytes-like column into the
    multimodal contract. Metadata derives JVM-side (no UDF)."""
    payload = F.encode(F.col(source_col).cast("string"), "UTF-8")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.length(payload).cast("long").alias("n_bytes"),
            F.md5(F.col(source_col).cast("string")).alias("checksum"),
        ).alias("meta"),
    )


def _decode_payload(payload: bytes) -> tuple[int, int, int, list[float]]:
    """STUB decoder. Real implementation would decode image/audio/video
    bytes (PIL/pyav); this deterministic fake derives shape + features
    from the payload digest so tests exercise the full plumbing.
    Raises on None payloads like a real decoder would on corrupt input.
    """
    if payload is None:
        raise NotImplementedError("corrupt/absent payload — real decoder required")
    digest = hashlib.md5(payload).digest()
    width = 16 + digest[0] % 240
    height = 16 + digest[1] % 240
    n_frames = 1 + digest[2] % 8
    features = [b / 255.0 for b in digest[:8]]
    return width, height, n_frames, features


def decode_media(df: DataFrame, batch_size_hint: int = 256, decoder=None) -> DataFrame:
    """Decode / feature-extract via Arrow-batched mapInPandas.

    Scale notes: blobs stay inside executor batches (never on the
    driver); `spark.sql.execution.arrow.maxRecordsPerBatch` bounds
    batch memory for large payloads. Corrupt rows surface as nulls,
    not task failures.

    ``decoder`` overrides the built-in stub (same signature as
    ``_decode_payload``); it must be cloudpickle-serializable. The
    default path keeps the worker closure fully self-contained — no
    reference to this package — so it runs on executors that don't
    have the package on their PYTHONPATH (the driver-contract case:
    plain SparkSession, arbitrary cwd)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        import pandas as _pd

        def default_decode(payload):
            if payload is None:
                raise NotImplementedError("corrupt/absent payload — real decoder required")
            digest = _hl.md5(payload).digest()
            return (
                16 + digest[0] % 240,
                16 + digest[1] % 240,
                1 + digest[2] % 8,
                [b / 255.0 for b in digest[:8]],
            )

        decode = decoder if decoder is not None else default_decode
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "n_frames": [], "features": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                out["media_id"].append(mid)
                try:
                    w, h, nf, feats = decode(payload)
                except NotImplementedError:
                    w = h = nf = None
                    feats = None
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(nf)
                out["features"].append(feats)
            yield _pd.DataFrame(out)

    return df.select("media_id", "payload").mapInPandas(op, DECODED_SCHEMA)


def sample_frames(decoded: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame sampling over decoded video metadata — pure column ops:
    frame indices materialize as an array, exploded to one row per
    sampled frame (bounded by n_frames, no blob duplication)."""
    return (
        decoded.filter(F.col("n_frames").isNotNull())
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
            ).alias("frame_idx"),
        )
    )


def resize_features(decoded: DataFrame, out_dim: int = 4) -> DataFrame:
    """'Resize' stand-in: truncate/renormalize the feature vector with
    array expressions (slice + transform) — the real resize happens in
    the decoder; this demonstrates post-decode vector surgery JVM-side."""
    feats = F.slice(F.col("features"), 1, out_dim)
    return decoded.filter(F.col("features").isNotNull()).select(
        "media_id",
        F.transform(feats, lambda x: x.cast("float")).alias("features_resized"),
    )
