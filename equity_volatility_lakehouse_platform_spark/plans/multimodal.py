"""Multimodal binary-column queries (north-star operators)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from equity_volatility_lakehouse_platform_spark.operators.multimodal import (
    attach_binary_payload,
    decode_media,
)
from equity_volatility_lakehouse_platform_spark.plans.registry import register
from equity_volatility_lakehouse_platform_spark.sources.readers import load_table


@register(
    "mm01_binary_metadata",
    oracle="""
    SELECT doc_id,
           'fake/raw-v1'                              AS media_format,
           CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes,
           sha256(text)                               AS payload_sha256
    FROM documents
    """,
)
def mm01_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Opaque binary payload + typed sidecar metadata: the schema contract
    # that lets Catalyst prune/filter without touching the bytes.
    docs = load_table(spark, sf_dir, "documents")
    return attach_binary_payload(docs).drop("payload")


@register(
    "mm02_decode_stub",
    # The stub codec is deterministic byte arithmetic, so it IS
    # SQL-expressible: DuckDB recomputes width/height from the payload
    # length and mean_intensity as the exact first-256-byte sum (the
    # corpus is ASCII, so per-char codepoints equal utf-8 bytes; both
    # engines then run the identical int-division-free double ops).
    # This oracles the whole mapInPandas plumbing — batch iteration,
    # schema, byte lengths — not just "it ran". A real-codec payload
    # (PIL path) would be rows-only again; text payloads always stub.
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes,
           CAST(16 + octet_length(encode(text)) % 64 AS INTEGER) AS width,
           CAST(16 + (octet_length(encode(text)) // 64) % 64 AS INTEGER) AS height,
           (CAST(COALESCE(list_sum(list_transform(
                    generate_series(1, least(octet_length(encode(text)), 256)),
                    i -> ascii(text[i]))), 0) AS DOUBLE)
            / greatest(least(octet_length(encode(text)), 256), 1)) / 255.0
             AS mean_intensity,
           'stub-v1' AS decoder
    FROM documents
    """,
)
def mm02_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Arrow-batched mapInPandas decode over the binary column; deterministic
    # fake codec (see operators/multimodal.py) — plumbing is real and the
    # output is unit-tested against a pure-Python reimplementation.
    docs = load_table(spark, sf_dir, "documents")
    return decode_media(attach_binary_payload(docs))


@register(
    "mm03_resize_stub",
    oracle="""
    SELECT doc_id,
           CAST(16 + octet_length(encode(text)) % 64 AS INT)        AS in_width,
           CAST(16 + (octet_length(encode(text)) // 64) % 64 AS INT) AS in_height,
           CAST(32 AS INT) AS out_width,
           CAST(32 AS INT) AS out_height,
           (ROUND(32.0 / (16 + octet_length(encode(text)) % 64), 6) + 0.0)  AS scale_x,
           (ROUND(32.0 / (16 + (octet_length(encode(text)) // 64) % 64), 6) + 0.0) AS scale_y
    FROM documents
    """,
)
def mm03_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    # mapInPandas resize plumbing; the stub codec's dims are deterministic
    # byte arithmetic, so the oracle can independently recompute them from
    # octet_length — the Python path is genuinely exercised and checked.
    from equity_volatility_lakehouse_platform_spark.operators.multimodal import resize_media

    docs = load_table(spark, sf_dir, "documents")
    return resize_media(attach_binary_payload(docs))


@register(
    "mm04_frame_sample",
    oracle="""
    SELECT doc_id,
           CAST(f.k AS BIGINT)       AS frame_idx,
           CAST(f.k * 256 AS BIGINT) AS frame_offset
    FROM documents,
         LATERAL unnest(range(0, 1 + octet_length(encode(text)) // 256, 4)) AS f(k)
    """,
)
def mm04_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 1->N frame fan-out inside Arrow batches (keyframe-extractor shape);
    # stub frame grid is byte arithmetic, recomputed by the oracle.
    from equity_volatility_lakehouse_platform_spark.operators.multimodal import sample_frames

    docs = load_table(spark, sf_dir, "documents")
    return sample_frames(attach_binary_payload(docs))
