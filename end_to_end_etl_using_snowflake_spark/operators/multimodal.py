"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched Pandas UDFs via
``mapInPandas``.

The decode step is STUBBED — image/audio libraries are not available in
this environment (``NotImplementedError`` on the real path; a
deterministic fake for tests). What IS real and tested:

- the schema convention (payload: binary, meta: typed columns),
- the ``mapInPandas`` batch plumbing (Arrow transfer, per-batch
  vectorized processing, schema declaration),
- the partitioning posture: payloads are large -> repartition by a
  size-balanced key before the UDF so one task doesn't get all the
  4K videos; keep payload columns OUT of shuffles that don't need
  them (project early, join metadata back by id later).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DECODED_META_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("digest", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def to_binary_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Pack a source column as the opaque binary payload convention:
    (id, payload binary, media_type). Real pipelines read payloads from
    object-store files; the testdata stand-in encodes text as UTF-8."""
    return df.select(
        F.col(id_col).alias("id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("media_type"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for an image/video decoder: derives fake
    (width, height, n_frames) from the byte length. Replace with e.g.
    PIL/ffmpeg in a real deployment."""
    n = len(payload)
    return (n % 64 + 1, n % 48 + 1, n % 16 + 1)


def decode_metadata(df: DataFrame, real_decoder: bool = False) -> DataFrame:
    """mapInPandas decode: payload -> typed metadata.

    Arrow-batched: each pandas batch is processed vectorized; the
    payload column is dropped on output so downstream stages shuffle
    only metadata. ``real_decoder=True`` raises NotImplementedError
    (no media libs in this environment) — the plumbing is identical.
    """

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if real_decoder:
                raise NotImplementedError(
                    "media decode requires PIL/ffmpeg; not available in this env"
                )
            payloads = pdf["payload"]
            dims = [_fake_decode(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "digest": payloads.map(lambda p: hashlib.md5(p).hexdigest()),
                    "width": pd.Series([d[0] for d in dims], dtype="int32"),
                    "height": pd.Series([d[1] for d in dims], dtype="int32"),
                    "n_frames": pd.Series([d[2] for d in dims], dtype="int32"),
                }
            )

    return df.mapInPandas(process, schema=DECODED_META_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 4) -> DataFrame:
    """Frame-sampling plumbing: explode decoded frame indices 0..n_frames
    and keep every ``every_n``-th — the shape of a video->frames stage
    (the decode itself being stubbed)."""
    return (
        df.select("id", "n_frames")
        .withColumn("frame_idx", F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)))
        .filter(F.col("frame_idx") % every_n == 0)
    )


FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def extract_features(df: DataFrame, dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction: payload -> float vector.

    The embedding model is STUBBED with a deterministic byte-histogram
    projection — ``features[i] = count(b == i mod 256 bucket)/n_bytes``
    folded to ``dim`` buckets — so tests and oracles are exact; a real
    deployment swaps the batch body for an ONNX/torch call (the Arrow
    batch in, vector-per-row out contract is identical, which is what
    this operator pins down).
    """

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                n = max(len(p), 1)
                buckets = [0] * dim
                for b in p:
                    buckets[b % dim] += 1
                feats.append([c / n for c in buckets])
            yield pd.DataFrame({"id": pdf["id"], "features": feats})

    return df.mapInPandas(process, schema=FEATURES_SCHEMA)


RESIZED_META_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("scale", T.DoubleType()),
    ]
)


def resize_plan(df: DataFrame, max_w: int = 32, max_h: int = 24) -> DataFrame:
    """Resize stage, metadata path: compute the aspect-preserving output
    geometry (fit inside max_w x max_h, never upscale) JVM-side from the
    decoded dims. The pixel-pushing resize itself is the stubbed decode
    path (real deployments do it inside the same mapInPandas pass that
    decoded the payload); the geometry contract downstream stages depend
    on is real and oracle-checked.
    """
    scale = F.least(
        F.lit(1.0),
        F.lit(float(max_w)) / F.col("width").cast("double"),
        F.lit(float(max_h)) / F.col("height").cast("double"),
    )
    return df.select(
        "id",
        "width",
        "height",
        F.greatest(F.lit(1), F.floor(F.col("width") * scale).cast("int")).alias("out_width"),
        F.greatest(F.lit(1), F.floor(F.col("height") * scale).cast("int")).alias("out_height"),
        scale.alias("scale"),
    )
