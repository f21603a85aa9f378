"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata
struct; decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages. Two codecs are decoded FOR REAL with the stdlib —
WAV PCM via ``wave`` and binary PGM/PPM via a pure-Python parser — chosen
by magic-byte sniffing; every other payload falls back to a deterministic
byte-statistics fake (no PIL/libav in this container — see
``DecodeNotAvailable``) so the Spark-side contract — schema, batch shape,
partition behavior — stays exercised end-to-end. Swapping in PIL/torchaudio
later only adds branches to ``_decode_payload``.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class DecodeNotAvailable(NotImplementedError):
    """Real codecs (PIL / libav) are not installed in this environment."""


MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),  # image|audio|video
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("n_channels", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("payload_hash", T.LongType(), True),
        # double, not float: the features feed value-exact comparisons
        # against SQL oracles; float32 would round them en route
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)


def _decode_wav(payload: bytes) -> list[float]:
    """Real 16-bit PCM WAV decode via stdlib ``wave``. Features:
    [n_channels, sample_rate, n_samples, duration_ms, mean, rms, min, max].
    Integer sums are taken EXACTLY before any float op, so an oracle that
    recomputes the sample stream symbolically reproduces every feature
    bit-for-bit."""
    import io
    import math
    import struct
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        nch = w.getnchannels()
        sw = w.getsampwidth()
        sr = w.getframerate()
        raw = w.readframes(w.getnframes())
    if sw != 2:
        raise DecodeNotAvailable(f"only 16-bit PCM WAV supported, got width {sw}")
    samples = struct.unpack("<%dh" % (len(raw) // 2), raw)
    n = len(samples)
    if n == 0:
        return [float(nch), float(sr), 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    s = sum(samples)
    ss = sum(v * v for v in samples)
    return [
        float(nch),
        float(sr),
        float(n),
        1000.0 * n / (sr * nch),
        s / n,
        math.sqrt(ss / n),
        float(min(samples)),
        float(max(samples)),
    ]


def _parse_pnm(payload: bytes) -> tuple[bytes, int, int, int, int]:
    """Parse a binary PGM (P5) / PPM (P6) header: returns
    ``(magic, width, height, maxval, raster_offset)``."""
    idx = 0
    tokens: list[bytes] = []
    n_data = len(payload)
    while len(tokens) < 4:
        while idx < n_data and payload[idx : idx + 1].isspace():
            idx += 1
        if idx >= n_data:
            raise DecodeNotAvailable("truncated PNM header")
        if payload[idx : idx + 1] == b"#":
            while idx < n_data and payload[idx] != 0x0A:
                idx += 1
            continue
        start = idx
        while idx < n_data and not payload[idx : idx + 1].isspace():
            idx += 1
        tokens.append(payload[start:idx])
    idx += 1  # exactly one whitespace byte after maxval, then raster
    magic, w, h, maxval = tokens[0], int(tokens[1]), int(tokens[2]), int(tokens[3])
    if maxval > 255:
        raise DecodeNotAvailable("2-byte-per-sample PNM not supported")
    return magic, w, h, maxval, idx


def _decode_pnm(payload: bytes) -> list[float]:
    """Pure-Python binary PGM (P5) / PPM (P6) decode. Features:
    [width, height, n_channels, maxval, mean, min, max, n_values]."""
    magic, w, h, maxval, idx = _parse_pnm(payload)
    nch = 3 if magic == b"P6" else 1
    px = payload[idx : idx + w * h * nch]
    n = len(px)
    if n == 0:
        return [float(w), float(h), float(nch), float(maxval), 0.0, 0.0, 0.0, 0.0]
    return [
        float(w),
        float(h),
        float(nch),
        float(maxval),
        sum(px) / n,
        float(min(px)),
        float(max(px)),
        float(n),
    ]


def _decode_payload(payload: bytes, media_type: str) -> list[float]:
    """Decode a payload into 8 float features. REAL decode for the two
    stdlib-decodable codecs (sniffed by magic bytes — WAV PCM, binary
    PGM/PPM); deterministic byte-statistics fake for everything else, so
    the pipeline shape (binary in -> fixed-length feature out) stays
    exercised even for codecs this container can't decode."""
    if payload is None:
        return [0.0] * 8
    n = len(payload)
    if n == 0:
        return [0.0] * 8
    try:
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            return _decode_wav(payload)
        if payload[:2] in (b"P5", b"P6"):
            return _decode_pnm(payload)
    except Exception:
        # a matching magic with an undecodable body (unsupported sample
        # width, truncated header, corrupt raster) must NOT abort the
        # whole Spark job — fall through to the deterministic byte-stat
        # fake, same as any codec this container can't decode
        pass
    head = payload[: min(n, 64)]
    return [
        float(n),
        float(sum(head) % 997),
        float(head[0]),
        float(head[-1]),
        float(max(head)),
        float(min(head)),
        float(len(set(head))),
        float(n % 251),
    ]


def synth_wav_payload(doc_id: int, n_samples: int, sample_rate: int = 8000) -> bytes:
    """Deterministic mono 16-bit PCM WAV fixture: sample i is
    ``(doc_id*7 + i*13) % 256 - 128``. The closed-form sample stream is
    what lets a SQL oracle recompute the decoded features exactly."""
    import io
    import struct
    import wave

    samples = [(doc_id * 7 + i * 13) % 256 - 128 for i in range(n_samples)]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(struct.pack("<%dh" % n_samples, *samples))
    return buf.getvalue()


def synth_pgm_payload(doc_id: int, width: int = 16, height: int = 8) -> bytes:
    """Deterministic binary PGM fixture: pixel i is ``(doc_id*3 + i*5) % 256``."""
    px = bytes((doc_id * 3 + i * 5) % 256 for i in range(width * height))
    return b"P5\n%d %d\n255\n" % (width, height) + px


def extract_features(df: DataFrame) -> DataFrame:
    """Binary payload -> fixed-length feature vector via Arrow-batched
    ``mapInPandas`` (the production shape for real decoders: one Python
    worker per partition, whole Arrow batches in/out)."""

    import zlib

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(lambda p: len(p) if p is not None else 0),
                    "payload_hash": pdf["payload"].map(
                        lambda p: zlib.crc32(bytes(p)) if p is not None else 0
                    ),
                    "feature": [
                        _decode_payload(bytes(p) if p is not None else None, t)
                        for p, t in zip(pdf["payload"], pdf["media_type"])
                    ],
                }
            )

    return df.mapInPandas(_batches, FEATURE_SCHEMA)


def payload_stats(df: DataFrame) -> DataFrame:
    """Pure-JVM metadata pass over binary payloads (no decode): byte size,
    crc32, and metadata fields — the cheap pre-filter before decoding."""
    return df.select(
        "media_id",
        F.length(F.col("payload")).alias("n_bytes"),
        F.crc32(F.col("payload")).alias("payload_crc"),
        F.col("media_type"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled timestamp
    (the decode of each frame is the stubbed stage). Demonstrates the
    explode-by-sequence pattern that keeps sampling declarative.
    ``explode_outer``: a video whose duration is unknown (null metadata,
    common before probing) yields ONE marker row with a null
    frame_ts_ms — dropping it silently would hide the asset from the
    decode stage with no diagnostic."""
    # the sequence must be NULL (not empty, not [0]) for a null duration:
    # greatest() SKIPS nulls, so greatest(NULL-1, 0) = 0 would silently
    # emit frame_ts_ms=0 — indistinguishable from a real first frame
    seq = F.when(F.col("meta.duration_ms").isNull(), F.lit(None)).otherwise(
        F.sequence(
            F.lit(0),
            F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
            F.lit(every_ms),
        )
    )
    return df.filter(F.col("media_type") == "video").select(
        "media_id", F.explode_outer(seq).alias("frame_ts_ms")
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("resized", T.BooleanType(), False),
    ]
)


def _resize_pnm(payload: bytes, tw: int, th: int) -> bytes:
    """Nearest-neighbor resize of a binary PGM/PPM payload: output pixel
    (x, y) samples source pixel (x*w//tw, y*h//th). Vectorized as a numpy
    index-map gather — two integer index vectors + one fancy-index per
    image instead of tw*th Python-loop iterations (the arithmetic is the
    identical floor-division map, so output bytes are unchanged; pinned
    by a symbolic pixel oracle in the multimodal_resize driver entry and
    a golden-bytes test). Emits a canonical single-newline header."""
    import numpy as np

    magic, w, h, maxval, idx = _parse_pnm(payload)
    nch = 3 if magic == b"P6" else 1
    need = w * h * nch
    px = payload[idx : idx + need]
    if len(px) < need:
        raise DecodeNotAvailable("truncated PNM raster")
    arr = np.frombuffer(px, dtype=np.uint8).reshape(h, w, nch)
    sy = (np.arange(th, dtype=np.int64) * h) // th
    sx = (np.arange(tw, dtype=np.int64) * w) // tw
    out = arr[sy][:, sx]
    return b"%s\n%d %d\n%d\n" % (magic, tw, th, maxval) + out.tobytes()


def resize_images(df: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize image payloads to ``(target_w, target_h)`` via Arrow-batched
    ``mapInPandas`` — the production shape for a real resize stage (whole
    Arrow batches into one Python worker per partition, binary out).
    REAL nearest-neighbor resize for the stdlib-decodable PNM codecs
    (magic-sniffed); any other codec passes its payload through unchanged
    with ``resized = false`` (swapping in PIL later only adds a branch).
    Compose AFTER a ``payload_stats``/metadata pre-filter so only rows
    that need pixels ever reach Python."""
    if target_w <= 0 or target_h <= 0:
        raise ValueError(f"target size must be positive, got {target_w}x{target_h}")

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ws, hs, payloads, ok = [], [], [], []
            for p in pdf["payload"]:
                b = bytes(p) if p is not None else None
                resized_payload = None
                if b is not None and b[:2] in (b"P5", b"P6"):
                    try:
                        resized_payload = _resize_pnm(b, target_w, target_h)
                    except Exception:
                        # malformed PNM (truncated raster, 16-bit maxval,
                        # junk dims): pass through un-resized rather than
                        # failing the job — same contract as unknown codecs
                        resized_payload = None
                if resized_payload is not None:
                    payloads.append(resized_payload)
                    ws.append(target_w)
                    hs.append(target_h)
                    ok.append(True)
                else:
                    payloads.append(b)
                    ws.append(None)
                    hs.append(None)
                    ok.append(False)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "payload": payloads,
                    "resized": ok,
                }
            )

    return df.mapInPandas(_batches, RESIZE_SCHEMA)
