"""Streaming window operators (batch parity + a real streaming run) and
multimodal binary-column plumbing."""

import pytest
from pyspark.sql import functions as F

from intake_esm_spark.functions import multimodal as mm
from intake_esm_spark.sources.tables import ns_ts_to_timestamp
from intake_esm_spark.streaming import windows as W

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    from intake_esm_spark.sources.tables import load_table

    return load_table(spark, SF_DIR, "events")


def test_load_table_normalizes_nested_ntz(spark, tmp_path):
    """A TIMESTAMP_NTZ nested inside a struct (typed media metadata) and a
    dotted top-level column name must both come out as session-TZ
    TIMESTAMP — the deep rewrite, not just top-level fields."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from intake_esm_spark.sources.tables import load_table

    ts = pa.array([1_700_000_000_000_000], type=pa.timestamp("us"))  # naive us
    tbl = pa.table(
        {
            "media_id": pa.array([1], type=pa.int64()),
            "meta": pa.StructArray.from_arrays(
                [ts, pa.array([3], type=pa.int32())], names=["captured_at", "n"]
            ),
            "a.dotted": ts,
        }
    )
    pq.write_table(tbl, str(tmp_path / "media.parquet"))
    df = load_table(spark, str(tmp_path), "media")
    assert df.schema["meta"].dataType["captured_at"].dataType.simpleString() == "timestamp"
    assert df.schema["a.dotted"].dataType.simpleString() == "timestamp"
    row = df.collect()[0]
    assert row["meta"]["captured_at"] == row["a.dotted"]
    assert row["meta"]["n"] == 3


def test_tumbling_counts_batch(events):
    out = W.tumbling_counts(events, "1 hour")
    total = out.agg(F.sum("n_events")).collect()[0][0]
    assert total == events.count()
    # window boundaries align to the hour
    row = out.first()
    assert row["window_start"].minute == 0 and row["window_start"].second == 0


def test_sliding_counts_batch(events):
    tumb = W.tumbling_counts(events, "1 hour").count()
    slid = W.sliding_counts(events, "1 hour", "30 minutes").count()
    assert slid > tumb  # overlapping windows produce more groups


def test_session_windows_batch(events):
    out = W.session_windows(events, gap="30 minutes")
    row = out.first()
    assert row["session_end"] > row["session_start"]
    # no user loses events
    total = out.agg(F.sum("n_events")).collect()[0][0]
    assert total == events.count()


def test_streaming_end_to_end(spark, events, tmp_path):
    """Run the SAME tumbling aggregation as a Structured Streaming query
    over the parquet source with a memory sink, and check it matches the
    batch result."""
    import shutil

    src_dir = tmp_path / "stream_src"
    src_dir.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", src_dir / "events.parquet")
    raw = spark.read.parquet(f"{SF_DIR}/events.parquet")  # nanosAsLong already set
    stream = (
        spark.readStream.schema(raw.schema)
        .format("parquet")
        .load(str(src_dir))
    )
    stream = ns_ts_to_timestamp(stream, "ts")
    agg = W.tumbling_counts(stream, "1 hour", watermark="2 hours")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("tumbling_test")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql(
            "SELECT sum(n_events) FROM tumbling_test"
        ).collect()[0][0]
    finally:
        q.stop()
    assert got == events.count()


def test_watermark_drops_late_data(spark, tmp_path):
    """Append-mode windowed agg with a watermark: a second micro-batch
    carrying events far older than the advanced watermark must not resurrect
    closed windows."""
    import datetime as dt

    import pandas as pd

    src = tmp_path / "late_src"
    src.mkdir()
    base = dt.datetime(2024, 1, 1, 0, 0, 0)

    def write_batch(name, offsets_minutes):
        pdf = pd.DataFrame(
            {
                "ts": [base + dt.timedelta(minutes=m) for m in offsets_minutes],
                "event_type": ["x"] * len(offsets_minutes),
                "value": [1.0] * len(offsets_minutes),
            }
        )
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")  # µs, not pandas ns
        pdf.to_parquet(src / name)

    write_batch("b1.parquet", [0, 5, 120])  # watermark advances to ~118min
    schema = "ts timestamp, event_type string, value double"
    stream = spark.readStream.schema(schema).format("parquet").load(str(src))
    agg = W.tumbling_counts(stream, "10 minutes", watermark="2 minutes")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_test")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        write_batch("b2.parquet", [1])  # 119 min late: behind the watermark
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT window_start, sum(n_events) n FROM late_test GROUP BY 1"
        ).collect()
    finally:
        q.stop()
    counts = {r["window_start"].isoformat(): r["n"] for r in rows}
    # the 00:00 window closed with 2 events; the late event must NOT appear
    assert counts.get("2024-01-01T00:00:00") == 2


def test_dedup_within_watermark_batch(events):
    out = W.dedup_within_watermark(events, ["user_id", "event_type"])
    assert out.count() == events.select("user_id", "event_type").distinct().count()


@pytest.fixture()
def media(spark):
    rows = [
        (1, bytearray(b"\x89PNG fake image bytes"), "image", (64, 48, 3, None, None)),
        (2, bytearray(b"RIFF fake audio bytes longer payload"), "audio", (None, None, 1, 16000, 2000)),
        (3, bytearray(b"\x00\x00ftyp fake video"), "video", (320, 240, 3, None, 3500)),
        (4, None, "image", (None, None, None, None, None)),
    ]
    return spark.createDataFrame(rows, mm.MEDIA_SCHEMA)


def test_payload_stats(media):
    out = {r["media_id"]: r for r in mm.payload_stats(media).collect()}
    assert out[1]["n_bytes"] == 21 and out[1]["width"] == 64
    assert out[4]["n_bytes"] is None


def test_extract_features_shape_and_determinism(media):
    rows1 = {r["media_id"]: r for r in mm.extract_features(media).collect()}
    rows2 = {r["media_id"]: r for r in mm.extract_features(media).collect()}
    assert len(rows1) == 4
    for mid, r in rows1.items():
        assert len(r["feature"]) == 8
        assert r["feature"] == rows2[mid]["feature"]
    assert rows1[4]["n_bytes"] == 0


def test_frame_sample_plan(media):
    out = mm.frame_sample_plan(media, every_ms=1000).collect()
    # video of 3500ms sampled at 1000ms -> ts 0,1000,2000,3000
    assert sorted(r["frame_ts_ms"] for r in out) == [0, 1000, 2000, 3000]


def test_decode_wav_roundtrip():
    """synth_wav_payload -> real stdlib wave decode -> features match the
    closed-form sample stream."""
    n = 100
    feats = mm._decode_payload(mm.synth_wav_payload(17, n), "audio")
    samples = [(17 * 7 + i * 13) % 256 - 128 for i in range(n)]
    import math

    assert feats[0] == 1.0 and feats[1] == 8000.0 and feats[2] == float(n)
    assert feats[3] == 1000.0 * n / 8000
    assert feats[4] == sum(samples) / n
    assert feats[5] == math.sqrt(sum(v * v for v in samples) / n)
    assert feats[6] == float(min(samples)) and feats[7] == float(max(samples))


def test_decode_pgm_and_ppm():
    feats = mm._decode_payload(mm.synth_pgm_payload(5), "image")
    px = [(5 * 3 + i * 5) % 256 for i in range(128)]
    assert feats[:4] == [16.0, 8.0, 1.0, 255.0]
    assert feats[4] == sum(px) / 128
    assert feats[5] == float(min(px)) and feats[6] == float(max(px)) and feats[7] == 128.0
    # P6 with a header comment: 2x2 RGB
    raw = bytes(range(12))
    ppm = b"P6\n# a comment\n2 2\n255\n" + raw
    f6 = mm._decode_payload(ppm, "image")
    assert f6[:4] == [2.0, 2.0, 3.0, 255.0]
    assert f6[7] == 12.0 and f6[5] == 0.0 and f6[6] == 11.0


def test_decode_fallback_for_unknown_codec():
    """Non-WAV RIFF and arbitrary bytes still take the deterministic
    byte-stat path (schema contract holds for undecodable codecs)."""
    feats = mm._decode_payload(b"RIFF fake audio bytes longer payload", "audio")
    assert len(feats) == 8 and feats[0] == 36.0


def test_extract_features_real_codecs(spark):
    rows = [
        (1, bytearray(mm.synth_wav_payload(1, 64)), "audio", (None, None, 1, 8000, None)),
        (2, bytearray(mm.synth_pgm_payload(2)), "image", (16, 8, 1, None, None)),
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in mm.extract_features(df).collect()}
    assert out[1]["feature"] == mm._decode_payload(mm.synth_wav_payload(1, 64), "audio")
    assert out[2]["feature"] == mm._decode_payload(mm.synth_pgm_payload(2), "image")
    assert out[1]["n_bytes"] == 44 + 2 * 64
    assert out[2]["n_bytes"] == len(mm.synth_pgm_payload(2))


def test_frame_sample_plan_null_duration_marker(spark):
    """A null-duration video must yield ONE null-ts marker row, NOT a
    frame_ts_ms=0 row (greatest() skips nulls, so the sequence must be
    nulled explicitly before explode_outer)."""
    rows = [
        (1, None, "video", (None, None, None, None, None)),
        (2, None, "video", (None, None, None, None, 1500)),
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = {(r["media_id"], r["frame_ts_ms"]) for r in mm.frame_sample_plan(df).collect()}
    assert out == {(1, None), (2, 0), (2, 1000)}


def test_sliding_watermark_drops_late_data(spark, tmp_path):
    """Sliding windows' late-data path: a late event overlaps TWO already
    closed windows; the watermark must drop it from both. (Tumbling and
    session windows have this pinned above/in their oracles; sliding's
    drop path was previously untested.)"""
    import datetime as dt

    import pandas as pd

    src = tmp_path / "late_src_sliding"
    src.mkdir()
    base = dt.datetime(2024, 1, 1, 0, 0, 0)

    def write_batch(name, offsets_minutes):
        pdf = pd.DataFrame(
            {
                "ts": [base + dt.timedelta(minutes=m) for m in offsets_minutes],
                "event_type": ["x"] * len(offsets_minutes),
                "value": [1.0] * len(offsets_minutes),
            }
        )
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        pdf.to_parquet(src / name)

    write_batch("b1.parquet", [0, 5, 120])  # watermark advances to ~118min
    schema = "ts timestamp, event_type string, value double"
    stream = spark.readStream.schema(schema).format("parquet").load(str(src))
    agg = W.sliding_counts(stream, "10 minutes", "5 minutes", watermark="2 minutes")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("sliding_late_test")
        .option("checkpointLocation", str(tmp_path / "ckpt_sliding"))
        .start()
    )
    try:
        q.processAllAvailable()
        write_batch("b2.parquet", [1])  # 119 min late: behind the watermark
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT window_start, sum(n_events) n FROM sliding_late_test GROUP BY 1"
        ).collect()
    finally:
        q.stop()
    counts = {r["window_start"].isoformat(): r["n"] for r in rows}
    # the late minute-1 event would land in BOTH the 23:55 and 00:00
    # windows; each must keep its on-time-only count
    assert counts.get("2023-12-31T23:55:00") == 1
    assert counts.get("2024-01-01T00:00:00") == 2


def test_resize_images_pnm_and_passthrough(spark):
    """Nearest-neighbor PNM resize through the Arrow mapInPandas stage:
    pixels match the python index oracle, non-PNM payloads pass through
    unchanged with resized=false, and re-decoding the resized payload
    yields the new dimensions."""
    pgm = mm.synth_pgm_payload(7, 16, 8)
    rows = [
        (1, bytearray(pgm), "image", (16, 8, 1, None, None)),
        (2, bytearray(b"\x89PNG-not-a-pnm"), "image", (None, None, None, None, None)),
        (3, None, "image", (None, None, None, None, None)),
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in mm.resize_images(df, 8, 4).collect()}

    assert out[1]["resized"] and (out[1]["width"], out[1]["height"]) == (8, 4)
    resized = bytes(out[1]["payload"])
    feats = mm._decode_pnm(resized)
    assert feats[0] == 8.0 and feats[1] == 4.0
    # pixel-level oracle: nearest-neighbor index mapping
    src = bytes((7 * 3 + i * 5) % 256 for i in range(16 * 8))
    expected = bytes(
        src[(y * 8 // 4) * 16 + (x * 16 // 8)] for y in range(4) for x in range(8)
    )
    assert resized.split(b"255\n", 1)[1] == expected

    assert not out[2]["resized"] and bytes(out[2]["payload"]) == b"\x89PNG-not-a-pnm"
    assert out[2]["width"] is None
    assert not out[3]["resized"] and out[3]["payload"] is None


def test_resize_images_rejects_bad_target(spark):
    df = spark.createDataFrame([], mm.MEDIA_SCHEMA)
    with pytest.raises(ValueError):
        mm.resize_images(df, 0, 4)


def test_decode_malformed_magic_falls_back_not_raises():
    """Payloads that MATCH a decode magic but can't be decoded (8-bit WAV,
    corrupt RIFF body, junk PNM header) must fall back to the byte-stat
    fake instead of raising — one bad payload must never abort a job."""
    import io
    import struct
    import wave as _wave

    buf = io.BytesIO()
    with _wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)  # 8-bit: unsupported by _decode_wav
        w.setframerate(8000)
        w.writeframes(bytes(range(64)))
    eight_bit_wav = buf.getvalue()

    for payload in (
        eight_bit_wav,
        b"RIFF\x00\x00\x00\x00WAVEgarbage",
        b"P5\nnot numbers\n255\n\x00\x01",
    ):
        feats = mm._decode_payload(payload, "audio")
        assert len(feats) == 8 and all(isinstance(v, float) for v in feats)


def test_resize_malformed_pnm_passes_through(spark):
    truncated = b"P5\n16 8\n255\n" + bytes(10)  # raster cut short
    df = spark.createDataFrame(
        [(1, bytearray(truncated), "image", (16, 8, 1, None, None))], mm.MEDIA_SCHEMA
    )
    out = mm.resize_images(df, 8, 4).collect()[0]
    assert not out["resized"]
    assert bytes(out["payload"]) == truncated


def test_resize_pnm_gather_matches_reference_loop():
    """The numpy index-map gather in _resize_pnm is byte-identical to the
    per-pixel floor-division loop it replaced (upscale + downscale, P5 and
    P6, non-divisible dims)."""
    import numpy as np

    def loop_resize(payload, tw, th):
        magic, w, h, maxval, idx = mm._parse_pnm(payload)
        nch = 3 if magic == b"P6" else 1
        px = payload[idx : idx + w * h * nch]
        out = bytearray()
        for y in range(th):
            sy = y * h // th
            row = sy * w * nch
            for x in range(tw):
                sx = x * w // tw
                p = row + sx * nch
                out += px[p : p + nch]
        return b"%s\n%d %d\n%d\n" % (magic, tw, th, maxval) + bytes(out)

    rng = np.random.RandomState(7)
    for magic, nch in ((b"P5", 1), (b"P6", 3)):
        for (w, h), (tw, th) in [((13, 7), (5, 9)), ((6, 6), (17, 3)), ((1, 1), (4, 4))]:
            raster = rng.randint(0, 256, size=w * h * nch, dtype=np.uint8).tobytes()
            payload = b"%s\n%d %d\n255\n" % (magic, w, h) + raster
            assert mm._resize_pnm(payload, tw, th) == loop_resize(payload, tw, th)


def test_session_stats_summary(spark):
    """Hand-checkable session summary: user 1 has two sessions (3 events
    + 1 event), user 2 one single-event session."""
    import datetime as dt

    from intake_esm_spark.streaming.windows import session_stats

    def t(m):
        return dt.datetime(2024, 3, 1, 10, m)

    rows = [
        (1, t(0), 1.0), (1, t(10), 1.0), (1, t(20), 1.0),  # session A: span 20m
        (1, dt.datetime(2024, 3, 1, 15, 0), 1.0),          # session B: bounce
        (2, t(5), 1.0),                                     # session C: bounce
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = session_stats(df, gap="30 minutes", gap_minutes=30.0).collect()[0]
    assert out["n_sessions"] == 3
    assert out["n_users"] == 2
    assert out["avg_events_per_session"] == pytest.approx(5 / 3, abs=1e-6)
    # spans: 20, 0, 0 minutes -> mean 20/3
    assert out["avg_span_minutes"] == pytest.approx(20 / 3, abs=1e-6)
    assert out["bounce_rate"] == pytest.approx(2 / 3, abs=1e-6)


def test_stream_stream_touch_pairs_matches_batch(spark, tmp_path):
    """The stream-stream interval self-join twin: two time-ordered
    micro-batches of purchases+clicks; the watermarked streaming join
    must emit exactly the batch join's (conversion, touch) pair set,
    including a cross-batch pair (click in batch 1, purchase in
    batch 2)."""
    import datetime as dt
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from intake_esm_spark.streaming.windows import touch_pairs

    def t(day, h=0):
        return dt.datetime(2024, 3, day, h)

    schema = "user_id long, event_type string, ts timestamp, event_id long, value double"
    rows = [
        (1, "click", t(1, 9), 10, None),
        (1, "purchase", t(1, 10), 11, 5.0),   # pairs with 10
        (1, "click", t(1, 23), 12, None),
        (1, "purchase", t(2, 10), 13, 7.0),   # cross-batch: pairs with 12 only (10, 11 outside 24h? 10 is at day1 9:00, purchase day2 10:00 -> 25h, outside)
        (2, "purchase", t(1, 12), 14, 3.0),   # no clicks -> unattributed
        (None, "click", t(1, 9), 15, None),
    ]
    df = spark.createDataFrame(rows, schema)
    batch_pairs = {
        (r["conversion_id"], r["touch_event_id"])
        for r in touch_pairs(df).collect()
    }
    assert batch_pairs == {(11, 10), (13, 12)}

    flat = tmp_path / "flat"
    flat.mkdir()
    df.filter(F.col("ts") < t(2)).repartition(1).write.parquet(str(tmp_path / "a"))
    df.filter(F.col("ts") >= t(2)).repartition(1).write.parquet(str(tmp_path / "b"))
    for i, (part, name) in enumerate(
        [(tmp_path / "a", "0early"), (tmp_path / "b", "1late")]
    ):
        for f in glob.glob(str(part / "*.parquet")):
            dest = flat / f"{name}.parquet"
            shutil.copy(f, dest)
            os.utime(dest, (1_700_000_000 + i, 1_700_000_000 + i))
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(str(flat))
    )
    out = touch_pairs(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("touch_pairs_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        emitted = spark.sql(
            "SELECT conversion_id, touch_event_id FROM touch_pairs_stream"
        ).collect()
    finally:
        q.stop()
    streamed = {(r["conversion_id"], r["touch_event_id"]) for r in emitted}
    assert streamed == batch_pairs
