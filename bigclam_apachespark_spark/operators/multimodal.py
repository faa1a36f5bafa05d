"""Multimodal column plumbing (north-star extension): image/audio/
video as opaque ``binary`` columns with typed metadata, processed by
Arrow-batched ``mapInPandas`` stages.

Decoders for the UNCOMPRESSED/stdlib-decodable formats are REAL (pure
numpy/stdlib, no external libs): WAV RIFF PCM parsing, PPM (P6), and
PNG via zlib inflate with all five row filters — each surfacing
malformed payloads as a row-level ``decode_error`` instead of failing
the job. Only LOSSY codecs (JPEG/MP3/H.264 …) remain stubbed behind a
clearly-marked ``NotImplementedError`` (the codec libraries are not in
this container); swapping that stub for PIL/librosa changes ONE
function body, not the pipeline. Everything Spark-side — schemas,
Arrow batch iteration, partitioning, feature extraction — is real and
tested end-to-end.

Scale notes: binary payloads ride in Arrow record batches; keep
``spark.sql.execution.arrow.maxRecordsPerBatch`` sized so
batch_bytes ≈ payload × records stays ≲ 64 MB. mapInPandas streams
batches — no executor ever holds a partition's payloads at once.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)


def synthetic_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for plumbing tests: payload =
    seeded pseudo-random bytes, metadata consistent with ``kind``."""
    import hashlib

    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (4 + i % 7)
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                32 if kind in ("image", "video") else None,
                24 if kind in ("image", "video") else None,
                16000 if kind == "audio" else None,
                12 if kind == "video" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_payload(kind: str, payload: bytes) -> bytes:
    """STUB for LOSSY codecs only (JPEG/MP3/H.264 — need PIL /
    librosa / pyav, absent from this container). The formats the
    environment can parse natively ARE genuinely decoded:
    ``wav_stats`` (RIFF/WAV via stdlib wave), ``ppm_features``
    (binary PPM via numpy), and ``png_features`` (baseline PNG via
    stdlib zlib + a full five-filter un-filter pass), each with
    analytic-ground-truth oracle rows; ``fake_features`` remains the
    deterministic stand-in for plumbing tests of the lossy-codec
    path."""
    raise NotImplementedError(
        "lossy-codec decode requires image/audio libraries not present in "
        "this environment; wav_stats/ppm_features/png_features decode WAV, "
        "PPM and PNG for real, fake_features covers plumbing tests for the "
        "rest"
    )


def fake_features(dim: int = 8):
    """Deterministic stand-in feature extractor: dim float moments of
    the raw bytes. Same mapInPandas signature/batching as a real
    decoder — swap ``_feat`` for a decode+embed call in production."""

    def _feat(payload: bytes) -> list[float]:
        b = bytes(payload)
        n = max(len(b), 1)
        return [
            float(sum(b[j::dim]) % 10_000) / 10_000.0 for j in range(dim)
        ] if b else [0.0] * dim

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "feature": pdf["payload"].map(_feat),
                }
            )

    return extract


def media_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads —
    ``mapInPandas`` so Python sees columnar batches, never row-at-a-
    time. Output schema is fixed (FEATURE_SCHEMA) so downstream
    relational ops (joins with embeddings, ANN) compose."""
    return media.mapInPandas(fake_features(dim), FEATURE_SCHEMA)


def patch_grid_plan(media: DataFrame, patch: int = 8) -> DataFrame:
    """ViT-style patch tiling *plan*: one row per (patch_row,
    patch_col) tile of each image/video frame grid — the fan-out that
    turns pixels into sequence tokens for vision training. Spark-side
    double explode over typed metadata (the decoder would attach the
    pixel tile); partial tiles at the right/bottom edges are included
    (ceil division), matching standard padding behavior."""
    n_rows = F.ceil(F.col("height") / F.lit(patch)).cast("int")
    n_cols = F.ceil(F.col("width") / F.lit(patch)).cast("int")
    return (
        media.where(F.col("kind").isin("image", "video"))
        # guard zero/negative dims: sequence(0, -1) DESCENDS in Spark
        # ([0, -1]), which would emit bogus negative patch indices
        .where((F.col("width") > 0) & (F.col("height") > 0))
        .select(
            "media_id",
            "kind",
            F.explode(F.sequence(F.lit(0), n_rows - 1)).alias("patch_row"),
            n_cols.alias("_nc"),
        )
        .select(
            "media_id",
            "kind",
            "patch_row",
            F.explode(F.sequence(F.lit(0), F.col("_nc") - 1)).alias("patch_col"),
        )
    )


def audio_chunk_plan(media: DataFrame, chunk_samples: int = 32) -> DataFrame:
    """Audio chunking *plan*: one row per fixed-length sample window
    of each audio payload (16-bit PCM assumed: n_samples = n_bytes/2)
    → ``(media_id, chunk_idx, start_sample, n_samples)``. The last
    chunk may be short — its true length is carried so a decoder can
    pad or drop it. Same shape as speech-training chunkers."""
    n_samples = (F.length("payload") / F.lit(2)).cast("long")
    n_chunks = F.ceil(n_samples / F.lit(chunk_samples)).cast("int")
    start = F.col("chunk_idx").cast("long") * chunk_samples
    return (
        media.where(F.col("kind") == "audio")
        # guard empty payloads: sequence(0, -1) DESCENDS in Spark, so
        # a zero-sample clip would emit chunk_idx 0 and -1 rows
        .where(n_samples > 0)
        .select(
            "media_id",
            n_samples.alias("_ns"),
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
        )
        .select(
            "media_id",
            "chunk_idx",
            start.alias("start_sample"),
            F.least(F.lit(chunk_samples).cast("long"), F.col("_ns") - start).alias(
                "n_samples"
            ),
        )
    )


def frame_sample_plan(media: DataFrame, every_n: int = 4) -> DataFrame:
    """Video frame-sampling *plan*: one row per sampled frame index
    (real decoders would attach the frame payload). Spark-side
    explode over the typed metadata — demonstrates the fan-out shape
    (row per frame) without the decoder."""
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))).alias(
                "frame_idx"
            ),
        )
    )


def caption_join(media: DataFrame, docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Cross-modal pairing: media rows joined to their caption
    documents (media_id = doc_id) → ``(media_id, kind, n_bytes,
    caption_tokens)`` — the image–text pair assembly step of a
    multimodal training pipeline.

    The one rule that matters at 100 TB: the BINARY PAYLOAD never
    crosses the join — it is projected down to its byte length
    before the shuffle (carrying blobs through an exchange multiplies
    shuffle volume by the payload size; pair on metadata, then
    re-join payloads only for the rows that survive downstream
    filters)."""
    from bigclam_apachespark_spark.functions.hashing import tokens

    m = media.select(
        "media_id", "kind", F.length("payload").cast("int").alias("n_bytes")
    )
    d = docs.select(
        F.col("doc_id").alias("media_id"),
        F.size(tokens(text_col)).alias("caption_tokens"),
    )
    return m.join(d, "media_id")


WAV_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("duration_s", T.DoubleType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("peak", T.DoubleType(), True),
        T.StructField("decode_error", T.StringType(), True),
    ]
)


def _wav_stats(media_id: int, payload: bytes) -> dict:
    """REAL RIFF/WAV decode via the stdlib ``wave`` module + numpy —
    no external codec libraries needed. Returns per-clip header
    fields and PCM amplitude stats (rms/peak normalized to [0, 1]);
    malformed payloads report ``decode_error`` instead of failing the
    batch (at 100 TB some payloads are always corrupt — a decoder
    that throws poisons the whole task)."""
    import io
    import wave

    import numpy as np

    out = {
        "media_id": media_id, "n_channels": None, "sample_rate": None,
        "n_frames": None, "duration_s": None, "rms": None, "peak": None,
        "decode_error": None,
    }
    try:
        with wave.open(io.BytesIO(bytes(payload))) as w:
            nch, sw, rate, nfr = (
                w.getnchannels(), w.getsampwidth(), w.getframerate(), w.getnframes(),
            )
            raw = w.readframes(nfr)
        dtype = {1: np.uint8, 2: np.int16, 4: np.int32}.get(sw)
        if dtype is None:
            raise ValueError(f"unsupported sample width {sw}")
        x = np.frombuffer(raw, dtype=dtype).astype(np.float64)
        if sw == 1:
            x = (x - 128.0) / 128.0
        else:
            x = x / float(2 ** (8 * sw - 1))
        out.update(
            n_channels=int(nch), sample_rate=int(rate), n_frames=int(nfr),
            duration_s=round(nfr / rate, 6) if rate else None,
            rms=round(float(np.sqrt(np.mean(x * x))), 6) if x.size else 0.0,
            peak=round(float(np.max(np.abs(x))), 6) if x.size else 0.0,
        )
    except Exception as ex:  # corrupt payload → row-level error, not task death
        out["decode_error"] = f"{type(ex).__name__}: {ex}"[:200]
    return out


def wav_stats(media: DataFrame) -> DataFrame:
    """REAL audio decode over binary payloads (RIFF/WAV, stdlib-only)
    → per-clip header + amplitude stats via Arrow-batched
    ``mapInPandas``. This replaces the decode stub for the one format
    the container can genuinely parse; other codecs stay behind
    ``_decode_payload``'s NotImplementedError. Same scale shape as
    ``media_features``: the payload column streams through Python in
    Arrow batches, is reduced to a fixed-width stats row immediately,
    and never crosses a join or shuffle."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                [
                    _wav_stats(mid, pl)
                    for mid, pl in zip(pdf["media_id"], pdf["payload"])
                ]
            )

    return media.where(F.col("kind") == "audio").select(
        "media_id", "payload"
    ).mapInPandas(extract, WAV_STATS_SCHEMA)


PPM_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_r", T.DoubleType(), True),
        T.StructField("mean_g", T.DoubleType(), True),
        T.StructField("mean_b", T.DoubleType(), True),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
        T.StructField("decode_error", T.StringType(), True),
    ]
)


def _ppm_decode(payload: bytes):
    """Minimal binary-PPM (P6, maxval 255) parser → (h, w, 3) uint8
    numpy array. Pure numpy — no codec libraries."""
    import numpy as np

    b = bytes(payload)
    if not b.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    # header = magic, width, height, maxval as whitespace-separated
    # ASCII tokens (comments unsupported — synthetic corpus format),
    # then ONE whitespace byte, then raw RGB.
    fields, i, tok = [], 2, b""
    while len(fields) < 3 and i < len(b):
        c = b[i : i + 1]
        if c.isspace():
            if tok:
                fields.append(int(tok))
                tok = b""
        else:
            tok += c
        i += 1
    if len(fields) < 3:
        raise ValueError("truncated PPM header")
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    px = np.frombuffer(b, dtype=np.uint8, count=w * h * 3, offset=i)
    if px.size != w * h * 3:
        raise ValueError("truncated PPM pixel data")
    return px.reshape(h, w, 3)


def _ppm_stats(media_id: int, payload: bytes, pool: int) -> dict:
    import numpy as np

    out = {
        "media_id": media_id, "width": None, "height": None,
        "mean_r": None, "mean_g": None, "mean_b": None,
        "feature": None, "decode_error": None,
    }
    try:
        img = _ppm_decode(payload).astype(np.float64) / 255.0
        h, w, _ = img.shape
        gray = img.mean(axis=2)
        # pool x pool average-pooled thumbnail (edges truncated to the
        # multiple — a real vision pipeline resizes; the pooled grid is
        # the deterministic stand-in with the same output shape)
        gh, gw = max(h // pool, 1), max(w // pool, 1)
        g = gray[: gh * pool, : gw * pool].reshape(gh, pool, gw, pool).mean(axis=(1, 3)) \
            if h >= pool and w >= pool else np.array([[gray.mean()]])
        out.update(
            width=int(w), height=int(h),
            mean_r=round(float(img[:, :, 0].mean()), 6),
            mean_g=round(float(img[:, :, 1].mean()), 6),
            mean_b=round(float(img[:, :, 2].mean()), 6),
            feature=[round(float(v), 6) for v in g.ravel()],
        )
    except Exception as ex:
        out["decode_error"] = f"{type(ex).__name__}: {ex}"[:200]
    return out


def ppm_features(media: DataFrame, pool: int = 4) -> DataFrame:
    """REAL image decode over binary payloads (binary PPM/P6,
    numpy-only) → per-image dimensions, channel means, and a pooled
    grayscale thumbnail feature, Arrow-batched via ``mapInPandas``.
    With ``wav_stats`` this replaces the decode stub for both formats
    the container can parse natively; compressed codecs (JPEG/PNG/
    H.264) stay behind ``_decode_payload``. Corrupt payloads report
    ``decode_error`` row-level."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                [
                    _ppm_stats(mid, pl, pool)
                    for mid, pl in zip(pdf["media_id"], pdf["payload"])
                ]
            )

    return media.where(F.col("kind") == "image").select(
        "media_id", "payload"
    ).mapInPandas(extract, PPM_STATS_SCHEMA)

def _png_decode(payload: bytes):
    """Baseline PNG decoder — stdlib ``zlib`` + numpy, no codec
    libraries: signature check, IHDR/IDAT chunk walk, inflate, then
    per-scanline un-filtering of all five PNG filter types (None/
    Sub/Up/Average/Paeth). Supports bit depth 8, color types 0
    (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA), no interlace →
    (h, w, channels) uint8. The per-pixel un-filter loop is the
    honest sequential dependency of PNG filtering (libpng does the
    same walk in SIMD); it runs inside the Arrow-batched
    ``mapInPandas`` worker, never on the driver."""
    import struct
    import zlib

    import numpy as np

    b = bytes(payload)
    if not b.startswith(b"\x89PNG\r\n\x1a\n"):
        raise ValueError("not a PNG")
    i, ihdr, idat = 8, None, bytearray()
    while i + 8 <= len(b):
        (ln,) = struct.unpack(">I", b[i : i + 4])
        ctype = b[i + 4 : i + 8]
        data = b[i + 8 : i + 8 + ln]
        if len(data) != ln:
            raise ValueError("truncated chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        i += 12 + ln  # length + type + data + crc
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"unsupported bit depth {depth}")
    if comp != 0 or filt != 0:
        raise ValueError("unsupported compression/filter method")
    if interlace != 0:
        raise ValueError("interlaced PNG unsupported")
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color)
    if channels is None:
        raise ValueError(f"unsupported color type {color}")
    raw = zlib.decompress(bytes(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT length mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    bpp = channels
    pos = 0
    for y in range(h):
        f = raw[pos]
        pos += 1
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos).astype(
            np.int32
        )
        pos += stride
        if f == 0:
            pass
        elif f == 2:  # Up — vectorized (no intra-row dependency)
            line = (line + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub/Average/Paeth — sequential in x
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                up = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + up) // 2
                else:
                    p = a + up - c
                    pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
                line[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown filter type {f}")
        out[y] = line.astype(np.uint8)
        prev = line
    return out.reshape(h, w, channels)


def _png_stats(media_id: int, payload: bytes, pool: int) -> dict:
    """Same output contract as ``_ppm_stats`` (PPM_STATS_SCHEMA):
    dimensions, per-channel means (gray images replicate the gray
    mean; alpha is excluded from color stats), pooled grayscale
    thumbnail, row-level ``decode_error``."""
    import numpy as np

    out = {
        "media_id": media_id, "width": None, "height": None,
        "mean_r": None, "mean_g": None, "mean_b": None,
        "feature": None, "decode_error": None,
    }
    try:
        img = _png_decode(payload).astype(np.float64) / 255.0
        h, w, c = img.shape
        color = img[:, :, : 3 if c >= 3 else 1]  # drop alpha
        gray = color.mean(axis=2)
        gh, gw = max(h // pool, 1), max(w // pool, 1)
        g = (
            gray[: gh * pool, : gw * pool]
            .reshape(gh, pool, gw, pool)
            .mean(axis=(1, 3))
            if h >= pool and w >= pool
            else np.array([[gray.mean()]])
        )
        means = [float(color[:, :, min(j, color.shape[2] - 1)].mean()) for j in range(3)]
        out.update(
            width=int(w), height=int(h),
            mean_r=round(means[0], 6),
            mean_g=round(means[1], 6),
            mean_b=round(means[2], 6),
            feature=[round(float(v), 6) for v in g.ravel()],
        )
    except Exception as ex:
        out["decode_error"] = f"{type(ex).__name__}: {ex}"[:200]
    return out


def png_features(media: DataFrame, pool: int = 4) -> DataFrame:
    """REAL image decode over binary payloads (baseline PNG via
    stdlib zlib — see ``_png_decode``) → per-image dimensions,
    channel means, and a pooled grayscale thumbnail feature,
    Arrow-batched via ``mapInPandas``. With ``wav_stats`` and
    ``ppm_features`` this moves 'image' decode from stub to real for
    the most common LOSSLESS format; lossy codecs (JPEG/MP3/H.264)
    stay behind ``_decode_payload``. Corrupt payloads report
    ``decode_error`` row-level — one bad image never fails a
    100-TB batch."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                [
                    _png_stats(mid, pl, pool)
                    for mid, pl in zip(pdf["media_id"], pdf["payload"])
                ]
            )

    return media.where(F.col("kind") == "image").select(
        "media_id", "payload"
    ).mapInPandas(extract, PPM_STATS_SCHEMA)


def _png_encode(img, filters=None) -> bytes:
    """Minimal PNG writer for the synthetic fixture: ``img`` is a
    (h, w, c) uint8 array (c ∈ {1, 2, 3, 4} → color type 0/4/2/6),
    ``filters`` an optional per-row filter-type list so every decode
    path (None/Sub/Up/Average/Paeth) gets exercised by real encoded
    bytes. One IDAT, zlib level 6, correct CRCs — a genuine baseline
    PNG any external viewer opens."""
    import struct
    import zlib

    import numpy as np

    h, w, c = img.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    bpp = c
    stride = w * c
    flat = img.reshape(h, stride).astype(np.int32)
    lines = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f = 0 if filters is None else filters[y % len(filters)]
        cur = flat[y]
        enc = np.empty(stride, dtype=np.int32)
        for x in range(stride):
            a = cur[x - bpp] if x >= bpp else 0
            up = prev[x]
            cc = prev[x - bpp] if x >= bpp else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = up
            elif f == 3:
                pred = (a + up) // 2
            else:
                p = a + up - cc
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else cc)
            enc[x] = (cur[x] - pred) & 0xFF
        lines.append(f)
        lines += enc.astype(np.uint8).tobytes()
        prev = cur

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    idat = zlib.compress(bytes(lines), 6)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def synthetic_png_media(spark: SparkSession, n: int = 48) -> DataFrame:
    """Deterministic baseline-PNG fixture with a CLOSED-FORM oracle
    for the REAL decoder (``png_features``): image ``i`` is 8x8 with
    columns ``x < s = i % 9`` black and the rest white — the same
    split pattern as ``synthetic_ppm_media``, so with pool=4 the
    channel means are exact eighths and the pooled cells exact
    quarters. Three extra decode paths are exercised per image:
    color type cycles RGB / grayscale / RGBA (alpha 255) with
    ``i % 3``, and the row filter types cycle through all five PNG
    filters, so Sub/Up/Average/Paeth un-filtering is oracle-checked,
    not just filter-None."""
    import numpy as np

    rows = []
    for i in range(n):
        s = i % 9
        row = np.array([0] * s + [255] * (8 - s), dtype=np.uint8)
        gray = np.tile(row, (8, 1))
        c = [3, 1, 4][i % 3]
        if c == 1:
            img = gray[:, :, None]
        elif c == 3:
            img = np.repeat(gray[:, :, None], 3, axis=2)
        else:
            img = np.concatenate(
                [np.repeat(gray[:, :, None], 3, axis=2),
                 np.full((8, 8, 1), 255, dtype=np.uint8)],
                axis=2,
            )
        payload = _png_encode(img, filters=[(i + y) % 5 for y in range(8)])
        rows.append((i, "image", bytearray(payload)))
    return spark.createDataFrame(
        rows, "media_id long, kind string, payload binary"
    )


def synthetic_wav_media(spark: SparkSession, n: int = 48, rate: int = 8000) -> DataFrame:
    """Deterministic RIFF/WAV fixture with a CLOSED-FORM oracle for
    the REAL decoder (``wav_stats``): clip ``i`` is PCM16 mono at
    ``rate`` Hz, ``n_frames = 64 + 16*i`` frames, every sample the
    constant ``512 * (i % 9)``. All expected stats terminate within
    6 decimals, so ``round(x, 6)`` is exact on both engines:

    - ``duration_s = n_frames / 8000``  (1/8000 = 0.000125)
    - ``rms = peak = (i % 9) / 64``     (512/2^15 = 1/64)

    The payloads are genuine RIFF containers written by the stdlib
    ``wave`` module — the oracle cross-checks header parsing AND PCM
    normalization, not just plumbing."""
    import io
    import struct
    import wave

    rows = []
    for i in range(n):
        n_frames = 64 + 16 * i
        sample = struct.pack("<h", 512 * (i % 9))
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(sample * n_frames)
        rows.append((i, "audio", bytearray(buf.getvalue())))
    return spark.createDataFrame(
        rows, "media_id long, kind string, payload binary"
    )


def synthetic_ppm_media(spark: SparkSession, n: int = 48) -> DataFrame:
    """Deterministic binary-PPM (P6) fixture with a CLOSED-FORM
    oracle for the REAL decoder (``ppm_features``): image ``i`` is
    8x8 RGB with columns ``x < i % 9`` black and the rest white, so
    with ``s = i % 9``:

    - ``mean_r = mean_g = mean_b = (8 - s) / 8``  (exact eighths)
    - pool=4 → 2x2 pooled grayscale grid
      ``[(4 - min(s,4))/4, (4 - max(s-4,0))/4]`` per row (exact
      quarters) — the pooling arithmetic itself is oracle-checked.
    """
    rows = []
    for i in range(n):
        s = i % 9
        header = b"P6\n8 8\n255\n"
        row = bytes([0, 0, 0] * s + [255, 255, 255] * (8 - s))
        rows.append((i, "image", bytearray(header + row * 8)))
    return spark.createDataFrame(
        rows, "media_id long, kind string, payload binary"
    )


PHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), True),
        T.StructField("phash", T.LongType(), True),
        T.StructField("decode_error", T.StringType(), True),
    ]
)


def _ahash64(payload: bytes) -> int:
    """64-bit average hash of a decoded image: grayscale → 8×8
    block-mean thumbnail → bit (y·8 + x) set iff the cell is
    STRICTLY above the thumbnail mean (aHash, the standard
    perceptual baseline). Returned as signed two's-complement int64
    so it round-trips a LongType column."""
    import numpy as np

    img = _ppm_decode(payload).astype(np.float64)
    gray = img.mean(axis=2)
    h, w = gray.shape
    if h < 8 or w < 8:
        raise ValueError(f"image {h}x{w} too small for an 8x8 thumbnail")
    bh, bw = h // 8, w // 8
    thumb = (
        gray[: bh * 8, : bw * 8].reshape(8, bh, 8, bw).mean(axis=(1, 3))
    )
    bits = thumb > thumb.mean()
    val = 0
    for y in range(8):
        for x in range(8):
            if bits[y, x]:
                val |= 1 << (y * 8 + x)
    if val >= 1 << 63:
        val -= 1 << 64
    return val


def phash64(media: DataFrame) -> DataFrame:
    """Perceptual (average) hash per image → ``(media_id, phash,
    decode_error)``: REAL decode (binary PPM) + 8×8 aHash, Arrow-
    batched via ``mapInPandas`` — one narrow pass, no shuffle; the
    64-bit fingerprint is the fixed-width state every downstream
    dedup step carries instead of pixels."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, pl in zip(pdf["media_id"], pdf["payload"]):
                try:
                    rows.append(
                        {"media_id": mid, "phash": _ahash64(bytes(pl)),
                         "decode_error": None}
                    )
                except Exception as ex:
                    rows.append(
                        {"media_id": mid, "phash": None,
                         "decode_error": f"{type(ex).__name__}: {ex}"[:200]}
                    )
            yield pd.DataFrame(rows)

    return media.where(F.col("kind") == "image").select(
        "media_id", "payload"
    ).mapInPandas(extract, PHASH_SCHEMA)


def phash_near_dup(
    media: DataFrame, bands: int = 4, max_hamming: int = 3
) -> DataFrame:
    """Perceptual-hash image near-dup pairs → ``(a, b, hamming)``,
    a < b: hashes split into ``bands`` 16-bit bands; a pair is a
    CANDIDATE iff some band matches exactly (one equi-join on
    (band, key) — never images²), then verified by exact Hamming
    distance ≤ ``max_hamming``. Pigeonhole guarantee: with 4 bands
    any pair within Hamming 3 shares at least one intact band, so
    recall is 1.0 up to the threshold (beyond it, band blocking is
    a recall<1 heuristic — same contract as the SimHash text path).

    All-integer end to end: band keys are arithmetic-shift+mask
    (identical on signed int64 in Spark and DuckDB — the mask kills
    the sign-extension difference), Hamming is bit_count(xor).
    Scale shape: |bands|·n band rows, hot keys bounded by the band
    join's group sizes; decode runs once per image, pairs carry two
    longs."""
    hashed = phash64(media).where(F.col("decode_error").isNull()).select(
        "media_id", "phash"
    )
    bexpr = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    (
                        F.shiftright(F.col("phash"), 16 * b)
                        .bitwiseAND(F.lit(65535))
                    ).alias("key"),
                )
                for b in range(bands)
            ]
        )
    ).alias("bk")
    bk = hashed.select("media_id", "phash", bexpr).select(
        "media_id", "phash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    left = bk.select(
        F.col("media_id").alias("a"), F.col("phash").alias("ha"), "band", "key"
    )
    right = bk.select(
        F.col("media_id").alias("b"), F.col("phash").alias("hb"), "band", "key"
    )
    cand = (
        left.join(right, ["band", "key"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b", "ha", "hb")
        .distinct()
    )
    ham = F.expr("bit_count(ha ^ hb)").cast("int")
    return (
        cand.withColumn("hamming", ham)
        .where(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )


def _ahash_of_gray(gray) -> int:
    """aHash core over an already-decoded grayscale array (float64):
    8×8 block-mean thumbnail, bit (y·8+x) set iff STRICTLY above the
    thumbnail mean; signed two's-complement int64."""
    h, w = gray.shape
    if h < 8 or w < 8:
        raise ValueError(f"image {h}x{w} too small for an 8x8 thumbnail")
    bh, bw = h // 8, w // 8
    thumb = gray[: bh * 8, : bw * 8].reshape(8, bh, 8, bw).mean(axis=(1, 3))
    bits = thumb > thumb.mean()
    val = 0
    for y in range(8):
        for x in range(8):
            if bits[y, x]:
                val |= 1 << (y * 8 + x)
    return val - (1 << 64) if val >= 1 << 63 else val


VIDEO_MAGIC = b"VID0"


def synthetic_video_media(spark: SparkSession, n: int = 24, n_frames: int = 16) -> DataFrame:
    """Deterministic synthetic-container video fixture with a
    CLOSED-FORM oracle: the container is ``b"VID0"`` + one count
    byte + raw 8×8 RGB frames (192 bytes each) — an explicitly
    synthetic stand-in, since real video codecs need libraries this
    container lacks (same boundary as ``_decode_payload``); the
    Spark-side plumbing (binary parse, frame sampling, per-frame
    hashing, pair join) is the real deliverable. Frame ``f`` of
    video ``i`` is the split-column pattern with ``s = (i + f) % 9``
    — a deterministic "pan", so which sampled frames collide across
    videos is pure modular arithmetic the oracle restates."""
    rows = []
    for i in range(n):
        frames = b""
        for f in range(n_frames):
            s = (i + f) % 9
            row = bytes([0, 0, 0] * s + [255, 255, 255] * (8 - s))
            frames += row * 8
        rows.append(
            (i, "video", bytearray(VIDEO_MAGIC + bytes([n_frames]) + frames))
        )
    return spark.createDataFrame(
        rows, "media_id long, kind string, payload binary"
    )


def video_frame_hashes(media: DataFrame, every_n: int = 4) -> DataFrame:
    """Sampled per-frame perceptual hashes → ``(media_id, frame_idx,
    phash)``: parse the container, keep every ``every_n``-th frame
    (the keyframe-sampling pattern — hashing every frame of real
    video is waste; near-dup detection needs a sparse signature),
    aHash each kept frame. Arrow-batched ``mapInPandas``; one narrow
    pass, output rows are (long, int, long) — the corpus never
    carries pixels past this operator."""
    import numpy as np

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), True),
            T.StructField("frame_idx", T.IntegerType(), True),
            T.StructField("phash", T.LongType(), True),
        ]
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, pl in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(pl)
                if not b.startswith(VIDEO_MAGIC) or len(b) < 5:
                    continue  # not this container — skip, like kind filters
                nf = b[4]
                for f in range(0, nf, every_n):
                    off = 5 + f * 192
                    if len(b) < off + 192:
                        break  # truncated container: keep parsed frames
                    px = np.frombuffer(b, dtype=np.uint8, count=192, offset=off)
                    gray = px.reshape(8, 8, 3).astype(np.float64).mean(axis=2)
                    out.append(
                        {"media_id": mid, "frame_idx": f,
                         "phash": _ahash_of_gray(gray)}
                    )
            yield pd.DataFrame(out, columns=["media_id", "frame_idx", "phash"])

    return media.where(F.col("kind") == "video").select(
        "media_id", "payload"
    ).mapInPandas(extract, schema)


def video_near_dup(
    media: DataFrame, every_n: int = 4, min_matching: int = 2
) -> DataFrame:
    """Video near-dup pairs → ``(a, b, n_matching)``, a < b: two
    videos pair when their SAMPLED frame-hash SETS share at least
    ``min_matching`` distinct values (signature intersection — the
    standard first-stage video dedup; temporal alignment is not
    required, matching the common re-encode/re-cut case, and the
    set semantics keep a within-video repeated frame from inflating
    the overlap). The join is on the 64-bit hash value — sparse
    signatures, never frames² — and the count is an exact
    integer."""
    fh = video_frame_hashes(media, every_n)
    left = fh.select(F.col("media_id").alias("a"), "phash").distinct()
    right = fh.select(F.col("media_id").alias("b"), "phash").distinct()
    return (
        left.join(right, "phash")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_matching"))
        .where(F.col("n_matching") >= min_matching)
    )


WAV_SPECTRAL_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), True),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("dominant_bin", T.IntegerType(), True),
        T.StructField("dominant_hz", T.DoubleType(), True),
        T.StructField("decode_error", T.StringType(), True),
    ]
)


def synthetic_sine_media(
    spark: SparkSession, n: int = 48, rate: int = 8000, n_samples: int = 256
) -> DataFrame:
    """Deterministic sine-tone RIFF/WAV fixture with a CLOSED-FORM
    SPECTRAL oracle for the REAL FFT path (``wav_spectral``): clip
    ``i`` is one full analysis window of exactly ``k_i = 3 + i % 13``
    INTEGER cycles of a PCM16 sine (amplitude 8192). An integer
    number of cycles over the window means the DFT concentrates ALL
    tone energy in bin k_i (no spectral leakage); int16 quantization
    adds ~-90 dB broadband noise, so the magnitude argmax over bins
    1..N/2 is k_i with enormous margin — an exact-integer oracle for
    a floating-point FFT. ``dominant_hz = k_i · rate / n_samples`` =
    k_i · 31.25, exact in binary, so round(·, 6) is lossless."""
    import io
    import math
    import struct
    import wave

    rows = []
    for i in range(n):
        k = 3 + i % 13
        pcm = b"".join(
            struct.pack(
                "<h",
                int(round(8192 * math.sin(2 * math.pi * k * t / n_samples))),
            )
            for t in range(n_samples)
        )
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(pcm)
        rows.append((i, "audio", bytearray(buf.getvalue())))
    return spark.createDataFrame(
        rows, "media_id long, kind string, payload binary"
    )


def _wav_spectral(media_id: int, payload: bytes) -> dict:
    """REAL spectral analysis: RIFF decode (stdlib wave) → numpy
    rfft → dominant non-DC bin + its frequency. Malformed payloads
    report ``decode_error`` row-level, never failing the batch."""
    import io
    import wave

    import numpy as np

    out = {
        "media_id": media_id, "n_frames": None, "sample_rate": None,
        "dominant_bin": None, "dominant_hz": None, "decode_error": None,
    }
    try:
        with wave.open(io.BytesIO(bytes(payload))) as w:
            nch, sw, rate, nfr = (
                w.getnchannels(), w.getsampwidth(), w.getframerate(), w.getnframes(),
            )
            raw = w.readframes(nfr)
        if sw != 2 or nch != 1:
            raise ValueError(f"spectral path expects mono PCM16, got ch={nch} sw={sw}")
        x = np.frombuffer(raw, dtype=np.int16).astype(np.float64) / 32768.0
        if x.size < 4:
            raise ValueError("window too short for spectral analysis")
        mag = np.abs(np.fft.rfft(x))
        k = int(np.argmax(mag[1:]) + 1)  # exclude DC
        out.update(
            n_frames=int(nfr), sample_rate=int(rate),
            dominant_bin=k,
            dominant_hz=round(k * rate / x.size, 6),
        )
    except Exception as ex:
        out["decode_error"] = f"{type(ex).__name__}: {ex}"[:200]
    return out


def wav_spectral(media: DataFrame) -> DataFrame:
    """REAL FFT feature extraction over audio payloads → per-clip
    dominant frequency via Arrow-batched ``mapInPandas`` — the
    signal-processing stage of a multimodal ingest (language-ID from
    pitch contours, music/speech routing, silence detection all
    start here). Same scale shape as ``wav_stats``: payloads stream
    through Python in Arrow batches and reduce to a fixed-width
    feature row immediately; nothing binary ever crosses a join or
    shuffle."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                [
                    _wav_spectral(mid, pl)
                    for mid, pl in zip(pdf["media_id"], pdf["payload"])
                ]
            )

    return media.where(F.col("kind") == "audio").select(
        "media_id", "payload"
    ).mapInPandas(extract, WAV_SPECTRAL_SCHEMA)


VIDEO_SHOT_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("shot_frame", T.IntegerType(), True),
        T.StructField("delta", T.LongType(), True),
    ]
)


def video_shot_detection(media: DataFrame) -> DataFrame:
    """Shot-boundary detection → ``(media_id, n_frames, shot_frame,
    delta)``: the frame maximizing the successive-frame luma-sum
    change (earliest frame on ties) — the standard cut detector's
    first stage, run on EXACT integer luma sums (Σ over pixels of
    r+g+b, never a float mean) so the argmax is engine-exact. The
    fixture's closed form: the pan pattern wraps 8 → 0 at frame
    f* = 9 − i%9 (or 9 when i%9 = 0), an 8-column flip whose delta
    16320·3 dwarfs the 1-column pan steps — and that wrap is
    precisely the pathology aHash-based detection MISSES (all-black
    and all-white frames both hash to 0: bit = pixel > mean fails on
    constant frames), which is why this operator ranks raw luma
    change instead of hash distance.

    Scale shape: one Arrow ``mapInPandas`` pass, frames reduced to a
    per-video integer argmax inside the batch — no pixel ever
    leaves Python, output is 4 scalars per video."""
    import numpy as np

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, pl in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(pl)
                if not b.startswith(VIDEO_MAGIC) or len(b) < 5:
                    continue
                nf = b[4]
                sums = []
                for f in range(nf):
                    off = 5 + f * 192
                    if len(b) < off + 192:
                        break
                    px = np.frombuffer(b, dtype=np.uint8, count=192, offset=off)
                    sums.append(int(px.astype(np.int64).sum()))
                if len(sums) < 2:
                    continue
                deltas = [abs(sums[f] - sums[f - 1]) for f in range(1, len(sums))]
                best = max(range(len(deltas)), key=lambda j: (deltas[j], -j))
                out.append(
                    {
                        "media_id": mid,
                        "n_frames": len(sums),
                        "shot_frame": best + 1,
                        "delta": deltas[best],
                    }
                )
            yield pd.DataFrame(
                out, columns=["media_id", "n_frames", "shot_frame", "delta"]
            )

    return media.where(F.col("kind") == "video").select(
        "media_id", "payload"
    ).mapInPandas(extract, VIDEO_SHOT_SCHEMA)
