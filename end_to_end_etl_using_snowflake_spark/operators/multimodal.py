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
