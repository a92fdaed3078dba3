"""Multimodal column plumbing (north-star: image/audio/video as opaque
binary columns with typed metadata).

The Spark-side machinery is real and tested — binary payload columns,
metadata extraction, Arrow-batched ``mapInPandas`` decode with an explicit
output schema and batch-preserving iteration. The *codec* probes for PIL
at import and uses it when present (real width/height/mean for decodable
image payloads); otherwise — and for payloads PIL can't parse — it falls
back to a clearly-marked deterministic stub that derives fake
width/height/features from the payload bytes so tests are reproducible.
This container ships no media libraries, so the stub path is the one the
driver exercises; environments with Pillow get the real decode with no
code change.

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


try:  # import-probe: real codec when the environment provides it
    from PIL import Image as _PILImage  # type: ignore

    _HAVE_PIL = True
except ImportError:  # this container: no media libs — stub path active
    _PILImage = None
    _HAVE_PIL = False


def _decode_payload(payload: bytes) -> tuple[int, int, float, str]:
    """Codec: PIL when available AND the payload parses as an image;
    deterministic stub otherwise. Returns (width, height, mean, decoder).

    The stub derives fake width/height/mean from the byte content so
    results are stable and testable without media libraries. The PIL
    branch is the real decode (grayscale mean over the actual pixels) —
    tests/test_domain.py covers it when Pillow is installed, with a
    deterministic synthetic PNG oracle.
    """
    if _HAVE_PIL:
        import io

        try:
            with _PILImage.open(io.BytesIO(payload)) as img:
                gray = img.convert("L")
                width, height = gray.size
                hist = gray.histogram()
                total = sum(i * c for i, c in enumerate(hist))
                npx = max(width * height, 1)
                return width, height, (total / npx) / 255.0, "pil"
        except Exception:  # noqa: BLE001 — not an image: fall through to stub
            pass
    n = len(payload)
    width = 16 + n % 64
    height = 16 + (n // 64) % 64
    mean_intensity = (sum(payload[:256]) / max(min(n, 256), 1)) / 255.0
    return width, height, mean_intensity, "stub-v1"


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
                    "decoder": [d[3] for d in decoded],
                }
            )

    return df.select("doc_id", "payload").mapInPandas(decode, schema=DECODED_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("in_width", T.IntegerType()),
        T.StructField("in_height", T.IntegerType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("scale_x", T.DoubleType()),
        T.StructField("scale_y", T.DoubleType()),
    ]
)

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_offset", T.LongType()),
    ]
)

_FRAME_BYTES = 256  # stub: one "frame" per 256 payload bytes


def resize_media(df: DataFrame, out_w: int = 32, out_h: int = 32) -> DataFrame:
    """Arrow-batched resize: mapInPandas over the binary column with a typed
    output schema. The resample itself is the stub codec (real impl:
    PIL.Image.resize); the dims/scale arithmetic and the batch plumbing
    are the real contract."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [_decode_payload(p)[:2] for p in pdf["payload"]]
            in_w = [d[0] for d in dims]
            in_h = [d[1] for d in dims]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "in_width": in_w,
                    "in_height": in_h,
                    "out_width": out_w,
                    "out_height": out_h,
                    "scale_x": [round(out_w / w, 6) for w in in_w],
                    "scale_y": [round(out_h / h, 6) for h in in_h],
                }
            )

    return df.select("doc_id", "payload").mapInPandas(resize, schema=RESIZED_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 4) -> DataFrame:
    """Frame sampling for video-like payloads: each input row fans out to
    one row per sampled frame (1->N inside the Arrow batch — the shape a
    real keyframe extractor needs). Stub: a frame every _FRAME_BYTES
    bytes, sampled every ``every_n`` frames."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs = [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = 1 + len(payload) // _FRAME_BYTES
                for k in range(0, n_frames, every_n):
                    ids.append(int(doc_id))
                    idxs.append(k)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_offset": pd.Series(
                        [i * _FRAME_BYTES for i in idxs], dtype="int64"
                    ),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(sample, schema=FRAMES_SCHEMA)


PCM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("peak", T.LongType()),
        T.StructField("sum_sq", T.LongType()),
    ]
)


def pcm_stats(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Waveform statistics over an opaque audio payload, interpreted as
    16-bit little-endian PCM (the universal raw-audio interchange grain):
    sample count, peak amplitude, and the EXACT integer sum of squares
    (RMS is derived outside in one double op, keeping this stage
    drift-free). Arrow-batched ``mapInPandas`` with numpy ``frombuffer``
    — zero-copy per batch, no shuffle, the same plumbing a real
    torchaudio/ffmpeg decode stage would ride.
    """
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                b = bytes(payload)
                n = len(b) // 2
                a = np.frombuffer(b[: n * 2], dtype="<i2").astype(np.int64)
                rows.append(
                    (
                        int(doc_id),
                        n,
                        int(np.abs(a).max()) if n else 0,
                        int((a * a).sum()) if n else 0,
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_samples", "peak", "sum_sq"]
            )

    return df.select("doc_id", payload_col).mapInPandas(batches, PCM_SCHEMA)
