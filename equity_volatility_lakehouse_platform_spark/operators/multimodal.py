"""Multimodal column plumbing (north-star: image/audio/video as opaque
binary columns with typed metadata).

The Spark-side machinery is real and tested — binary payload columns,
metadata extraction, Arrow-batched ``mapInPandas`` decode with an explicit
output schema and batch-preserving iteration. The *codec* itself is a
clearly-marked deterministic stub (no image/audio libraries in this
container): it derives fake width/height/features from the payload bytes
so tests are reproducible. Swapping in a real decoder changes only
``_decode_payload``.

Scale: decode is a map-only stage (no shuffle); Arrow batches amortize
the Python boundary; binary columns stay opaque to the optimizer so
metadata lives in sibling typed columns for pruning/filtering.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_intensity", T.DoubleType()),
        T.StructField("decoder", T.StringType()),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Model an opaque media column: utf-8 payload bytes + typed metadata
    (format tag, byte length, content digest) for pruning without decode."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        "doc_id",
        payload.alias("payload"),
        F.lit("fake/raw-v1").alias("media_format"),
        F.octet_length(payload).cast("long").alias("payload_bytes"),
        F.sha2(payload, 256).alias("payload_sha256"),
    )


def _decode_payload(payload: bytes) -> tuple[int, int, float]:
    """STUB codec — deterministic fake decode (no media libs available).

    A real implementation would e.g. ``PIL.Image.open(io.BytesIO(payload))``;
    here width/height/mean come from the byte content so results are stable.
    """
    n = len(payload)
    width = 16 + n % 64
    height = 16 + (n // 64) % 64
    mean_intensity = (sum(payload[:256]) / max(min(n, 256), 1)) / 255.0
    return width, height, mean_intensity


def decode_media(df: DataFrame) -> DataFrame:
    """Arrow-batched decode: mapInPandas over (doc_id, payload) with a typed
    output schema — the exact plumbing a real image/audio decoder plugs into."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_decode_payload(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload_bytes": pdf["payload"].map(len).astype("int64"),
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "mean_intensity": [d[2] for d in decoded],
                    "decoder": "stub-v1",
                }
            )

    return df.select("doc_id", "payload").mapInPandas(decode, schema=DECODED_SCHEMA)
