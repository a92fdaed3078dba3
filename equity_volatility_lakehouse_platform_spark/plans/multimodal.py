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


@register("mm02_decode_stub")  # rows-only: decode itself is a stubbed codec
def mm02_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Arrow-batched mapInPandas decode over the binary column; deterministic
    # fake codec (see operators/multimodal.py) — plumbing is real and the
    # output is unit-tested against a pure-Python reimplementation.
    docs = load_table(spark, sf_dir, "documents")
    return decode_media(attach_binary_payload(docs))
