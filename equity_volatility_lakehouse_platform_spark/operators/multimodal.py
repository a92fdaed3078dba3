"""Multimodal column plumbing (north-star: image/audio/video as opaque
binary columns with typed metadata).

The Spark-side machinery is real and tested — binary payload columns,
metadata extraction, Arrow-batched ``mapInPandas`` decode with an explicit
output schema and batch-preserving iteration. The image codec is a REAL
pure-stdlib baseline-PNG implementation (zlib inflate + full five-filter
scanline reconstruction — ``decode_png``), used by mm02/mm03 on genuine
PNG payloads; PIL is probed at import and taken as a fast path when
present (it inflates the same stream to the same integers). The
deterministic byte-arithmetic stub remains ONLY as the fallback for
opaque non-image payloads (mm04's frame grid, text payloads), clearly
tagged in the ``decoder`` column.

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
except ImportError:  # this container: no media libs — stdlib PNG path active
    _PILImage = None
    _HAVE_PIL = False


# --------------------------------------------------------------------------
# Real PNG codec, pure stdlib (round-6: retires the mm02/mm03 stub).
# Encode writes genuine zlib-compressed IDAT with real CRCs; decode parses
# chunks, inflates, and reconstructs ALL five PNG filter types — a full
# baseline-PNG (8-bit gray/RGB, non-interlaced) decoder with no PIL.
# --------------------------------------------------------------------------

_PNG_SIG = bytes([137, 80, 78, 71, 13, 10, 26, 10])


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    import struct
    import zlib as _zlib

    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", _zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png_rgb(width: int, height: int, pix) -> bytes:
    """Genuine 8-bit RGB PNG: signature + IHDR + zlib IDAT + IEND, real
    CRCs. ``pix(idx, channel) -> 0..255`` with idx = y*width + x."""
    import struct
    import zlib as _zlib

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = bytearray()
    for y in range(height):
        raw.append(0)  # filter type 0 (None) per scanline
        for x in range(width):
            idx = y * width + x
            raw += bytes(pix(idx, c) for c in range(3))
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", _zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> tuple[int, int, bytes, int]:
    """Pure-stdlib baseline-PNG decode -> (width, height, pixels, nchannels).

    Parses the chunk stream, concatenates IDAT, zlib-inflates, and
    reconstructs every scanline filter (None/Sub/Up/Average/Paeth per the
    PNG spec §9). Supports 8-bit greyscale (color type 0) and truecolor
    (type 2), non-interlaced — the baseline every real sniffing/feature
    pipeline needs first. Raises ValueError on anything else."""
    import struct
    import zlib as _zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    width = height = depth = ctype = None
    interlace = 0
    idat = bytearray()
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            width, height, depth, ctype = struct.unpack(">IIBB", data[:10])
            interlace = data[12]
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
    if width is None or depth != 8 or ctype not in (0, 2) or interlace:
        raise ValueError("unsupported PNG variant")
    nch = 1 if ctype == 0 else 3
    raw = _zlib.decompress(bytes(idat))
    stride = width * nch
    if len(raw) != height * (stride + 1):
        raise ValueError("truncated PNG data")
    out = bytearray(height * stride)
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        o = y * stride
        po = o - stride
        for i, v in enumerate(line):
            a = out[o + i - nch] if i >= nch else 0  # left
            b = out[po + i] if y > 0 else 0  # up
            c = out[po + i - nch] if (y > 0 and i >= nch) else 0  # up-left
            if f == 0:
                r = v
            elif f == 1:
                r = v + a
            elif f == 2:
                r = v + b
            elif f == 3:
                r = v + (a + b) // 2
            elif f == 4:  # Paeth predictor
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                r = v + (a if pa <= pb and pa <= pc else b if pb <= pc else c)
            else:
                raise ValueError(f"bad filter {f}")
            out[o + i] = r & 0xFF
    return width, height, bytes(out), nch


def _decode_payload(payload: bytes) -> tuple[int, int, float, str]:
    """Codec ladder: PIL when available, else the pure-stdlib PNG decoder
    for genuine PNG payloads, else the deterministic stub for opaque
    non-image bytes. Returns (width, height, mean, decoder).

    The stub (non-image payloads only) derives fake width/height/mean
    from the byte content so plumbing tests stay reproducible without
    media libraries; PNG payloads ALWAYS decode real pixels."""
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
        except Exception:  # noqa: BLE001 — not an image: try stdlib/stub
            pass
    try:
        width, height, pixels, _nch = decode_png(payload)
        mean = sum(pixels) / max(len(pixels), 1) / 255.0
        return width, height, mean, "png-stdlib"
    except Exception:  # noqa: BLE001 — not a PNG / corrupt stream: stub
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


# --------------------------------------------------------------------------
# Round-6 real-codec pipeline: deterministic RGB PNGs per row (so a SQL
# oracle can recompute pixel statistics from the generative rule), decoded
# back through the real codec — the stub no longer touches mm02/mm03.
# --------------------------------------------------------------------------

def _dims_for(doc_id: int) -> tuple[int, int]:
    """Deterministic image dims: 8..16 x 8..16 (<=256 px per image)."""
    return 8 + doc_id % 9, 8 + (doc_id // 9) % 9


def _pix_rule(doc_id: int):
    """value(idx, channel) = (doc_id*7 + idx*13 + channel*31) mod 256 —
    pure integer arithmetic a SQL oracle reproduces exactly."""

    def pix(idx: int, c: int) -> int:
        return (doc_id * 7 + idx * 13 + c * 31) % 256

    return pix


def synth_png_payloads(df: DataFrame) -> DataFrame:
    """Attach a GENUINE PNG payload per row (real zlib IDAT, real CRCs),
    pixels generated by the deterministic rule. Arrow-batched map stage —
    the shape under which real media bytes would arrive from a lake."""

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = _dims_for(d)
                payloads.append(encode_png_rgb(w, h, _pix_rule(d)))
            yield pd.DataFrame({"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads})

    return df.select("doc_id").mapInPandas(synth, schema=schema)


CHANNEL_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
        T.StructField("ext_r", T.LongType()),
        T.StructField("ext_g", T.LongType()),
        T.StructField("ext_b", T.LongType()),
    ]
)


def _rgb_pixels(payload: bytes) -> tuple[int, int, bytes]:
    """Decode to RGB bytes: PIL fast path when installed (identical
    integers — PIL decodes the same zlib stream), stdlib otherwise."""
    if _HAVE_PIL:
        import io

        try:
            with _PILImage.open(io.BytesIO(payload)) as img:
                rgb = img.convert("RGB")
                w, h = rgb.size
                return w, h, rgb.tobytes()
        except Exception:  # noqa: BLE001 — fall through to stdlib
            pass
    w, h, pixels, nch = decode_png(payload)
    if nch == 1:
        pixels = bytes(b for v in pixels for b in (v, v, v))
    return w, h, pixels


def decode_media_stats(df: DataFrame) -> DataFrame:
    """REAL per-channel pixel statistics from the decoded image: mean and
    extent (max - min) per RGB channel. Integer sums are exact, so the
    one double division per channel is cross-engine reproducible."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, px = _rgb_pixels(bytes(payload))
                npx = max(w * h, 1)
                chans = [px[c::3] for c in range(3)]
                rows.append(
                    (
                        int(doc_id), w, h,
                        *(sum(ch) / npx for ch in chans),
                        *(int(max(ch) - min(ch)) if ch else 0 for ch in chans),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height",
                    "mean_r", "mean_g", "mean_b",
                    "ext_r", "ext_g", "ext_b",
                ],
            )

    return df.select("doc_id", "payload").mapInPandas(stats, CHANNEL_STATS_SCHEMA)


RESIZE_REAL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("in_width", T.IntegerType()),
        T.StructField("in_height", T.IntegerType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
    ]
)


def resize_media_real(df: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """REAL nearest-neighbor resample over decoded pixels: output pixel
    (x, y) samples source (x*in_w // out_w, y*in_h // out_h) — the floor
    mapping, chosen over PIL's center-offset so a SQL oracle can index
    the same source pixels exactly. Emits the resized image's per-channel
    means (integer-exact sums / fixed out_w*out_h)."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, px = _rgb_pixels(bytes(payload))
                sums = [0, 0, 0]
                for y in range(out_h):
                    sy = y * h // out_h
                    for x in range(out_w):
                        sx = x * w // out_w
                        base = (sy * w + sx) * 3
                        for c in range(3):
                            sums[c] += px[base + c]
                npx = out_w * out_h
                rows.append(
                    (int(doc_id), w, h, out_w, out_h, *(s / npx for s in sums))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "in_width", "in_height",
                    "out_width", "out_height",
                    "mean_r", "mean_g", "mean_b",
                ],
            )

    return df.select("doc_id", "payload").mapInPandas(resize, RESIZE_REAL_SCHEMA)


# --------------------------------------------------------------- round 12 --
# Perceptual image near-dup primitives (d22): a pair-planting pixel rule
# and a dHash kernel over REAL decoded PNGs. The rule is pure integer
# arithmetic (Knuth multiplicative constants mod the Mersenne prime,
# then mod 256) so a SQL oracle recomputes every hash bit exactly; even
# and odd doc_ids sharing a base (doc_id // 2) are PLANTED near-dups —
# the odd sibling perturbs ~1/53 of pixels by +128, flipping a handful
# of dHash bits while unrelated images differ in ~half of them.

def _pair_dims(doc_id: int) -> tuple[int, int]:
    """Sibling images (2k, 2k+1) must share dimensions, so dims derive
    from the base, not the doc_id."""
    base = doc_id // 2
    return 8 + base % 9, 8 + (base // 9) % 9


def _gray_pair_rule(doc_id: int):
    """value(idx, channel) for the pair-planted grayscale family
    (R=G=B — one decode path for every PNG in the repo).

    Pixel (y, x) is byte x of md5(f"{base}:{y}") — one digest per image
    ROW (w <= 16 == digest width), decimal-string keyed so DuckDB's
    md5() recomputes it exactly (the _SIG_SQL token-hash device). md5
    matters here: dHash is brightness-invariant by construction, so any
    arithmetic (affine/LCG/quadratic) rule leaves constant-offset
    structure between bases and unrelated images collide — measured
    twice before settling on the hash."""
    base = doc_id // 2
    odd = doc_id % 2 == 1
    w, _h = _pair_dims(doc_id)
    import hashlib

    row_hex: dict[int, str] = {}

    def pix(idx: int, c: int) -> int:  # noqa: ARG001 — channels equal
        y, x = idx // w, idx % w
        hx = row_hex.get(y)
        if hx is None:
            hx = hashlib.md5(f"{base}:{y}".encode()).hexdigest()
            row_hex[y] = hx
        v = int(hx[2 * x : 2 * x + 2], 16)
        if odd and (idx * 2654435761 % 2147483647) % 53 == 0:
            v = (v + 128) % 256
        return v

    return pix


def synth_png_pair_payloads(df: DataFrame) -> DataFrame:
    """Genuine PNG payloads under the pair-planting rule (same Arrow map
    shape as synth_png_payloads)."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = _pair_dims(d)
                payloads.append(encode_png_rgb(w, h, _gray_pair_rule(d)))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    return df.select("doc_id").mapInPandas(synth, schema=schema)


DHASH_BANDS_SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType())]
    + [T.StructField(f"k{m}", T.LongType()) for m in range(4)]
)


def dhash_bands_frame(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """64-bit dHash of each decoded image as FOUR 16-bit band keys.

    Classic difference hash: the image is floor-resampled to a 9x8
    grayscale grid (the mm03 mapping, R channel — the pair family is
    R=G=B) and bit j (j = y*8 + x) is 1 iff grid[y][x+1] > grid[y][x].
    Emitting the hash as four 16-bit bands instead of one int64 keeps
    every value small and sign-free in BOTH engines (no 2^63 edge) and
    IS the Hamming-LSH blocking unit: near-dup images (few flipped
    bits) collide on at least one unchanged band, so the d03-shaped
    band equi-join proposes candidates linear in collisions, never
    O(n^2). Map-only Arrow kernel — bytes never shuffle."""

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "k0": [], "k1": [], "k2": [], "k3": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                w, h, px = _rgb_pixels(bytes(payload))
                g = [
                    px[((y * h // 8) * w + (x * w // 9)) * 3]
                    for y in range(8)
                    for x in range(9)
                ]
                out["doc_id"].append(int(doc_id))
                for m in range(4):
                    k = 0
                    for t in range(16):
                        j = m * 16 + t
                        y, x = j // 8, j % 8
                        if g[y * 9 + x + 1] > g[y * 9 + x]:
                            k |= 1 << t
                    out[f"k{m}"].append(k)
            yield pd.DataFrame(
                {c: pd.array(v, dtype="int64") for c, v in out.items()}
            )

    return df.select("doc_id", payload_col).mapInPandas(
        kern, DHASH_BANDS_SCHEMA
    )


def _audio_pair_samples(doc_id: int) -> list:
    """Centered 8-bit-amplitude samples for the pair-planted AUDIO
    family: siblings (2k, 2k+1) share a base waveform; the odd sibling
    perturbs ~1/211 of samples (same multiplicative-hash site rule as
    the image family, sparser because an energy fingerprint integrates
    16 samples per window). Sample i is byte i%16 of
    md5(f"{base}:{i//16}") minus 128 — one digest per 16-sample block,
    decimal-string keyed so DuckDB's md5() recomputes it exactly. md5
    for the same reason as _gray_pair_rule: a delta-sign fingerprint is
    offset-invariant, so any arithmetic rule leaves cross-base
    structure and unrelated waveforms collide."""
    base = doc_id // 2
    odd = doc_id % 2 == 1
    import hashlib

    out = []
    for b in range(65):
        dg = hashlib.md5(f"{base}:{b}".encode()).digest()
        for t in range(16):
            i = b * 16 + t
            v = dg[t]
            if odd and (i * 2654435761 % 2147483647) % 211 == 0:
                v = (v + 128) % 256
            out.append(v - 128)
    return out


def encode_wav_pcm16(samples) -> bytes:
    """A genuine single-chunk-walkable WAV container: RIFF header,
    canonical fmt chunk (PCM, mono, 8 kHz, 16-bit), data chunk of
    little-endian int16 samples."""
    import struct

    import numpy as np

    data = np.asarray(samples, dtype="<i2").tobytes()
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
    )
    return hdr + data


def synth_wav_pair_payloads(df: DataFrame) -> DataFrame:
    """Genuine WAV payloads under the audio pair-planting rule (same
    Arrow map shape as synth_png_pair_payloads)."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                encode_wav_pcm16(_audio_pair_samples(int(d)))
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    return df.select("doc_id").mapInPandas(synth, schema=schema)


def audio_fp_bands_frame(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """64-bit audio energy fingerprint as FOUR 16-bit band keys.

    The WAV container is genuinely PARSED (RIFF/WAVE magic checked,
    chunks walked to the data chunk — an extra metadata chunk would be
    skipped correctly), samples decoded as int16 LE, then: 65 windows
    of 16 samples, integer energy = sum of squares per window (exact in
    int64), bit j = energy[j+1] > energy[j]. Delta-sign energy bits are
    the classic audio-fingerprint primitive (Haitsma-Kalker shape,
    collapsed to one band because the synthetic corpus is white):
    robust to sparse sample perturbation because each bit integrates 32
    samples and only a SIGN change of the window delta flips it. Four
    16-bit keys = the Hamming-LSH blocking unit (see dhash_bands_frame).
    Integer outputs make cross-engine bit-exactness structural."""

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {"doc_id": [], "k0": [], "k1": [], "k2": [], "k3": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                b = bytes(payload)
                if b[0:4] != b"RIFF" or b[8:12] != b"WAVE":
                    raise ValueError("not a WAV")
                off, samples = 12, None
                while off + 8 <= len(b):
                    cid = b[off : off + 4]
                    ln = int.from_bytes(b[off + 4 : off + 8], "little")
                    if cid == b"data":
                        samples = np.frombuffer(
                            b, dtype="<i2", count=ln // 2, offset=off + 8
                        )
                        break
                    off += 8 + ln + (ln % 2)
                if samples is None:
                    raise ValueError("WAV has no data chunk")
                e = (
                    samples.astype(np.int64) ** 2
                ).reshape(-1, 16).sum(axis=1)
                bits = e[1:] > e[:-1]
                out["doc_id"].append(int(doc_id))
                for m in range(4):
                    k = 0
                    for t in range(16):
                        if bits[m * 16 + t]:
                            k |= 1 << t
                    out[f"k{m}"].append(k)
            yield pd.DataFrame(
                {c: pd.array(v, dtype="int64") for c, v in out.items()}
            )

    return df.select("doc_id", payload_col).mapInPandas(
        kern, DHASH_BANDS_SCHEMA
    )


# ---------------------------------------------------------------------------
# Pair-planted VIDEO family (round 13 — the last modality leg of the
# perceptual dedup story, next to d22's images and d23's audio).
# A clip is VIDEO_N_FRAMES genuine PNG frames (the d22 image family
# keyed additionally by frame index) inside a real ISO-BMFF-shaped
# container: ftyp + a variable-length free box + mdat holding
# length-prefixed frames, so any fixed-offset shortcut fails and the
# engine pays a real top-level box walk (the mm12 discipline).
# Siblings (2k, 2k+1) share a base clip; the odd sibling perturbs
# ~1/53 of pixels in EVERY frame (a re-encode/watermark stand-in),
# site-keyed by (frame, idx) so different frames perturb different
# pixels.
# ---------------------------------------------------------------------------

VIDEO_N_FRAMES = 6
VIDEO_EVERY_N = 2  # mm04's sampling contract: keep frames f % every_n == 0
VIDEO_N_SAMPLED = len(range(0, VIDEO_N_FRAMES, VIDEO_EVERY_N))  # = 3


def _video_pair_rule(doc_id: int, frame: int):
    """value(idx, channel) for frame ``frame`` of the pair-planted
    video family. Pixel (y, x) is byte x of md5(f"{base}:{frame}:{y}")
    — the _gray_pair_rule device with the frame index in the digest
    key, decimal-string keyed so DuckDB's md5() recomputes it exactly.
    The odd sibling's perturbation site hash folds the frame in
    ((frame * 10007 + idx) * 2654435761 % 2147483647) % 53 == 0 so the
    ~1/53 perturbed pixels differ per frame."""
    base = doc_id // 2
    odd = doc_id % 2 == 1
    w, _h = _pair_dims(doc_id)
    import hashlib

    row_hex: dict[int, str] = {}

    def pix(idx: int, c: int) -> int:  # noqa: ARG001 — channels equal
        y, x = idx // w, idx % w
        hx = row_hex.get(y)
        if hx is None:
            hx = hashlib.md5(f"{base}:{frame}:{y}".encode()).hexdigest()
            row_hex[y] = hx
        v = int(hx[2 * x : 2 * x + 2], 16)
        if odd and ((frame * 10007 + idx) * 2654435761 % 2147483647) % 53 == 0:
            v = (v + 128) % 256
        return v

    return pix


def _bmff_box(tag: bytes, data: bytes) -> bytes:
    return (8 + len(data)).to_bytes(4, "big") + tag + data


def encode_video_clip(doc_id: int) -> bytes:
    """Genuine container bytes for one clip: ftyp + free(doc_id % 7
    filler bytes — variable, forces a real walk) + mdat of
    VIDEO_N_FRAMES [4-byte BE length][PNG] records. Frames share the
    clip's (w, h) — real clips have constant frame geometry."""
    w, h = _pair_dims(doc_id)
    frames = []
    for f in range(VIDEO_N_FRAMES):
        png = encode_png_rgb(w, h, _video_pair_rule(doc_id, f))
        frames.append(len(png).to_bytes(4, "big") + png)
    ftyp = _bmff_box(b"ftyp", b"isom\x00\x00\x02\x00isom")
    free = _bmff_box(b"free", b"\x00" * (doc_id % 7))
    mdat = _bmff_box(b"mdat", b"".join(frames))
    return ftyp + free + mdat


def synth_video_pair_payloads(df: DataFrame) -> DataFrame:
    """Genuine clip payloads under the pair-planting rule (same Arrow
    map shape as synth_png_pair_payloads)."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [encode_video_clip(int(d)) for d in pdf["doc_id"]]
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    return df.select("doc_id").mapInPandas(synth, schema=schema)


VIDEO_BANDS_SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType())]
    + [
        T.StructField(f"k{m}", T.LongType())
        for m in range(4 * VIDEO_N_SAMPLED)
    ]
)


def video_fp_bands_frame(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Frame-sampled 192-bit clip fingerprint as TWELVE 16-bit band
    keys: walk the container's top-level boxes to mdat (real byte
    walk — the free box's variable length makes offsets data-
    dependent), split the length-prefixed frames, keep every
    VIDEO_EVERY_N-th frame (mm04's sampling rule), dHash each sampled
    frame exactly as dhash_bands_frame does (floor-resample to 9x8,
    bit j = grid[y][x+1] > grid[y][x]), and concatenate the sampled
    frames' four 16-bit words in frame order. Twelve keys = the
    Hamming-LSH blocking unit over the CLIP fingerprint: a near-dup
    clip (sparse per-frame perturbation) keeps most words unchanged
    and collides; unrelated clips differ in ~96/192 bits and do not.
    Map-only Arrow kernel — payload bytes never shuffle."""

    n_words = 4 * VIDEO_N_SAMPLED
    cols = ["doc_id"] + [f"k{m}" for m in range(n_words)]

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {c: [] for c in cols}
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                buf = bytes(payload)
                pos, mdat = 0, None
                while pos + 8 <= len(buf):
                    size = int.from_bytes(buf[pos : pos + 4], "big")
                    if buf[pos + 4 : pos + 8] == b"mdat":
                        mdat = buf[pos + 8 : pos + size]
                        break
                    # Payloads are arbitrary column bytes, not only
                    # engine-synthesized clips: a zero/short box size
                    # would stall or rewind the walk, so fail loud
                    # (ValueError, not assert — survives python -O).
                    if size < 8:
                        raise ValueError(
                            f"malformed box at {pos}: size {size} < 8"
                        )
                    pos += size
                if mdat is None:
                    raise ValueError("clip has no mdat box")
                frames, p = [], 0
                while p + 4 <= len(mdat):
                    ln = int.from_bytes(mdat[p : p + 4], "big")
                    frames.append(mdat[p + 4 : p + 4 + ln])
                    p += 4 + ln
                words = []
                for fi in range(0, len(frames), VIDEO_EVERY_N):
                    w, h, px = _rgb_pixels(frames[fi])
                    g = [
                        px[((y * h // 8) * w + (x * w // 9)) * 3]
                        for y in range(8)
                        for x in range(9)
                    ]
                    for m in range(4):
                        k = 0
                        for t in range(16):
                            j = m * 16 + t
                            y, x = j // 8, j % 8
                            if g[y * 9 + x + 1] > g[y * 9 + x]:
                                k |= 1 << t
                        words.append(k)
                out["doc_id"].append(int(doc_id))
                for m in range(n_words):
                    out[f"k{m}"].append(words[m])
            yield pd.DataFrame(
                {c: pd.array(v, dtype="int64") for c, v in out.items()}
            )

    return df.select("doc_id", payload_col).mapInPandas(
        kern, VIDEO_BANDS_SCHEMA
    )
