"""Custom stateful streaming operator + near-dup pipeline exactness."""

import shutil

import pytest
from pyspark.sql import functions as F

from intake_esm_spark.operators import dedup
from intake_esm_spark.sources.tables import load_table, ns_ts_to_timestamp
from intake_esm_spark.streaming.stateful import running_user_totals

SF_DIR = "/root/testdata/sf0.001"


def test_running_totals_streaming_matches_batch(spark, tmp_path):
    events = load_table(spark, SF_DIR, "events")
    batch = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in running_user_totals(events).collect()
    }

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", src_dir / "events.parquet")
    raw = spark.read.parquet(f"{SF_DIR}/events.parquet")
    stream = (
        spark.readStream.schema(raw.schema)
        .format("parquet")
        .load(str(src_dir))
    )
    stream = ns_ts_to_timestamp(stream, "ts")
    out = running_user_totals(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("running_totals")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT user_id, max(n_events) n, max(total_value) t "
            "FROM running_totals GROUP BY user_id"
        ).collect()
    finally:
        q.stop()
    streamed = {r["user_id"]: (r["n"], r["t"]) for r in rows}
    assert set(streamed) == set(batch)
    for uid, (n, t) in batch.items():
        assert streamed[uid][0] == n
        assert abs(streamed[uid][1] - t) < 1e-6


def test_stream_dedup_exact_matches_batch(spark, tmp_path):
    """Documents streamed through stream_dedup_exact must surface exactly
    the fingerprints that batch incremental dedup keeps: history dups
    dropped by the stream-static anti join, in-stream repeats collapsed
    to one survivor."""
    from intake_esm_spark.functions.text import fingerprint_md5
    from intake_esm_spark.streaming.stateful import stream_dedup_exact

    docs = load_table(spark, SF_DIR, "documents")
    history = docs.filter(F.col("doc_id") >= 250)
    expected_fps = {
        r["fp"]
        for r in docs.select(fingerprint_md5(F.col("text")).alias("fp"))
        .subtract(history.select(fingerprint_md5(F.col("text")).alias("fp")))
        .collect()
    }

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    shutil.copy(f"{SF_DIR}/documents.parquet", src_dir / "documents.parquet")
    raw = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    stream = (
        spark.readStream.schema(raw.schema).format("parquet").load(str(src_dir))
    )
    out = stream_dedup_exact(stream, history)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("stream_dedup")
        .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT text FROM stream_dedup").collect()
    finally:
        q.stop()
    got_fps = {
        r["fp"]
        for r in spark.createDataFrame([(x["text"],) for x in rows], "text string")
        .select(fingerprint_md5(F.col("text")).alias("fp"))
        .collect()
    }
    assert got_fps == expected_fps
    assert len(rows) == len(got_fps)  # one survivor per fingerprint


def test_stream_dedup_exact_batch_keeps_earliest(spark):
    """Batch fallback with ts_col must keep the EARLIEST row per
    fingerprint (the batch mirror of streaming first-arrival-wins), not an
    arbitrary dropDuplicates survivor."""
    import datetime as dt

    from intake_esm_spark.streaming.stateful import stream_dedup_exact

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, "same doc", t0 + dt.timedelta(hours=2)),
        (2, "same doc", t0),
        (3, "same  DOC", t0 + dt.timedelta(hours=1)),  # same normalized fp
        (4, "other", t0),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, ts timestamp")
    history = spark.createDataFrame([(99, "hist", t0)], "doc_id long, text string, ts timestamp")
    out = stream_dedup_exact(df, history, ts_col="ts")
    assert {r["doc_id"] for r in out.collect()} == {2, 4}


def test_near_dup_pipeline_matches_exact(spark):
    """LSH-candidates + verify must reproduce the exact all-pairs result on
    real documents (the production path's correctness claim)."""
    docs = load_table(spark, SF_DIR, "documents")
    exact = {
        (r["id_a"], r["id_b"])
        for r in dedup.jaccard_pairs(docs, shingle_n=5, threshold=0.8).collect()
    }
    cands = dedup.minhash_lsh_candidates(docs, num_hashes=32, bands=16, shingle_n=5)
    near = {
        (r["id_a"], r["id_b"])
        for r in dedup.jaccard_pairs(
            docs, shingle_n=5, threshold=0.8, candidates=cands
        ).collect()
    }
    assert near == exact
    fused = {
        (r["id_a"], r["id_b"])
        for r in dedup.near_duplicates(
            docs, num_hashes=32, bands=16, shingle_n=5, threshold=0.8
        ).collect()
    }
    assert fused == exact


def test_stream_curate_streaming_matches_batch(spark, tmp_path):
    """stream_curate is stateless, so streaming and batch invocations must
    keep exactly the same documents; the kept set must equal the
    independently-composed batch predicate (token window + repetition cap
    + gram-overlap decontamination via operators.contamination)."""
    from intake_esm_spark.operators import contamination
    from intake_esm_spark.operators.corpus import repetition_stats
    from intake_esm_spark.functions.text import ws_token_count
    from intake_esm_spark.streaming.stateful import stream_curate

    docs = load_table(spark, SF_DIR, "documents")
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    corp = docs.filter(F.col("doc_id") % 20 != 0)

    # independent batch expectation from the individually-tested operators
    rep = repetition_stats(corp, n=2).select("doc_id", "top_frac")
    bad = {r["doc_id"] for r in contamination.contaminated_ids(corp, bench, n=5).collect()}
    expected = {
        r["doc_id"]
        for r in corp.withColumn("__t", ws_token_count(F.col("text")))
        .join(rep, "doc_id")
        .filter((F.col("__t") >= 20) & (F.col("__t") <= 2000) & (F.col("top_frac") <= 0.3))
        .collect()
        if r["doc_id"] not in bad
    }

    # batch invocation of the streaming operator
    got_batch = {r["doc_id"] for r in stream_curate(corp, bench).collect()}
    assert got_batch == expected

    # streaming invocation over the same rows
    src_dir = tmp_path / "curate_src"
    src_dir.mkdir()
    corp.write.parquet(str(src_dir / "corp.parquet"))
    stream = (
        spark.readStream.schema(corp.schema)
        .format("parquet")
        .load(str(src_dir / "corp.parquet"))
    )
    out = stream_curate(stream, bench)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("stream_curate_t")
        .option("checkpointLocation", str(tmp_path / "ckpt_curate"))
        .start()
    )
    try:
        q.processAllAvailable()
        got_stream = {
            r["doc_id"] for r in spark.sql("SELECT doc_id FROM stream_curate_t").collect()
        }
    finally:
        q.stop()
    assert got_stream == expected


def test_stream_curate_bench_guard(spark):
    from intake_esm_spark.streaming.stateful import stream_curate

    docs = load_table(spark, SF_DIR, "documents").limit(50)
    with pytest.raises(ValueError, match="max_bench_grams"):
        stream_curate(docs, docs, max_bench_grams=3)


def test_stream_line_filter_matches_batch_line_dedup(spark, tmp_path):
    """Ingest-time boilerplate removal: a real streaming run through
    stream_line_filter (static boilerplate set from duplicated_lines over
    the same corpus) rewrites documents EXACTLY like the batch
    line_dedup(keep='none') pass."""
    from intake_esm_spark.operators import structural
    from intake_esm_spark.streaming.stateful import stream_line_filter

    rows = [
        (1, "boiler\nalpha one\nshared tail"),
        (2, "beta two\nboiler\nshared tail"),
        (3, "gamma three\nboiler\ngamma four"),
        (4, "all alone here"),
        (5, "Boiler \nmine only"),  # normalized variant of 'boiler'
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    src_dir = tmp_path / "line_src"
    docs.write.parquet(str(src_dir))

    boiler = structural.duplicated_lines(docs, min_doc_freq=2)
    expected = {
        r["doc_id"]: r["text"]
        for r in structural.line_dedup(docs, min_doc_freq=2).collect()
    }

    stream = (
        spark.readStream.schema(docs.schema).format("parquet").load(str(src_dir))
    )
    out = stream_line_filter(stream, boiler)
    q = (
        out.writeStream.format("memory")
        .queryName("line_filter_sink")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r["doc_id"]: r["text"]
            for r in spark.sql("SELECT * FROM line_filter_sink").collect()
        }
    finally:
        q.stop()
    assert got == expected

    # batch-mode application of the same operator agrees too
    batch_got = {
        r["doc_id"]: r["text"] for r in stream_line_filter(docs, boiler).collect()
    }
    assert batch_got == expected


def test_stream_line_filter_guard_and_nulls(spark):
    from intake_esm_spark.operators import structural
    from intake_esm_spark.streaming.stateful import stream_line_filter

    docs = spark.createDataFrame(
        [(1, "a\nb"), (2, "a\nc"), (3, None)], "doc_id bigint, text string"
    )
    boiler = structural.duplicated_lines(docs, min_doc_freq=2)
    with pytest.raises(ValueError, match="max_boilerplate"):
        stream_line_filter(docs, boiler, max_boilerplate=0)
    out = {r["doc_id"]: r["text"] for r in stream_line_filter(docs, boiler).collect()}
    assert out[1] == "b" and out[2] == "c" and out[3] is None


def test_stream_span_filter_matches_batch_span_dedup(spark, tmp_path):
    """Ingest-time substring-run dedup: a real streaming run through
    stream_span_filter (static window-hash snapshot over the same
    corpus) rewrites documents EXACTLY like the batch
    span_dedup_against pass — and both equal the from-scratch
    span_dedup."""
    from intake_esm_spark.operators import spans
    from intake_esm_spark.streaming.stateful import stream_span_filter

    rows = [
        (1, "intro words the quick brown fox jumps over the lazy dog outro"),
        (2, "the quick brown fox jumps over the lazy dog and more here"),
        (3, "totally unrelated content in this third document"),
        (4, "MIXED Case  the QUICK brown fox jumps over the lazy dog tail"),
        (5, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    src_dir = tmp_path / "span_src"
    docs.write.parquet(str(src_dir))

    snap = spans.duplicated_window_hashes(docs, n=3, min_doc_freq=2)
    expected = {
        r["doc_id"]: r["text"]
        for r in spans.span_dedup_against(docs, snap, n=3, min_run=3).collect()
    }
    expected[5] = None  # span_dedup drops null-text rows; the stream keeps them

    stream = (
        spark.readStream.schema(docs.schema).format("parquet").load(str(src_dir))
    )
    out = stream_span_filter(stream, snap, n=3, min_run=3)
    q = (
        out.writeStream.format("memory")
        .queryName("span_filter_sink")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r["doc_id"]: r["text"]
            for r in spark.sql("SELECT * FROM span_filter_sink").collect()
        }
    finally:
        q.stop()
    assert got == expected

    batch_got = {
        r["doc_id"]: r["text"]
        for r in stream_span_filter(docs, snap, n=3, min_run=3).collect()
    }
    assert batch_got == expected


def test_stream_span_filter_guard(spark):
    from intake_esm_spark.operators import spans
    from intake_esm_spark.streaming.stateful import stream_span_filter

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d")], "doc_id bigint, text string"
    )
    snap = spans.duplicated_window_hashes(docs, n=3, min_doc_freq=2)
    with pytest.raises(ValueError, match="max_windows"):
        stream_span_filter(docs, snap, max_windows=0)


def test_full_streaming_ingest_chain_matches_batch(spark, tmp_path):
    """The WHOLE streaming ingest pipeline composed: line filter (static
    boilerplate snapshot) -> span filter (static window-hash snapshot)
    -> exact dedup vs history -> curation gates + decontamination — one
    real streaming run, compared stage-for-stage against the batch
    operators applied in the same order. This is the composition a
    production ingest job runs; the parity is what makes the batch
    oracles meaningful for the stream."""
    from intake_esm_spark.operators import spans, structural
    from intake_esm_spark.streaming.stateful import (
        stream_curate,
        stream_dedup_exact,
        stream_line_filter,
        stream_span_filter,
    )

    # history corpus defines the snapshots; the arriving batch carries
    # boilerplate lines, a verbatim span, an exact dup, and clean docs
    filler_a = " ".join(f"alpha{i} beta{i}" for i in range(12))
    filler_b = " ".join(f"gamma{i} delta{i}" for i in range(12))
    span = "the quick brown fox jumps over the lazy dog tonight again"
    hist_rows = [
        (100, f"cookie banner\n{filler_a}"),
        (101, f"cookie banner\n{filler_b}"),
        (102, f"{filler_a} {span} unique history tail words here"),
        (103, f"{span} {filler_b}"),
    ]
    hist = spark.createDataFrame(hist_rows, "doc_id bigint, text string")
    bench = spark.createDataFrame(
        [(900, "benchmark probe sentence nothing shares this")],
        "doc_id bigint, text string",
    )

    line_snap = structural.duplicated_lines(hist, min_doc_freq=2)
    span_snap = spans.duplicated_window_hashes(hist, n=3, min_doc_freq=2)

    arriving = [
        # boilerplate line + long filler: line scrubbed, survives gates
        (1, f"cookie banner\n{' '.join(f'w{i} x{i}' for i in range(15))}"),
        # contains the history span: span cut, shortened but survives
        (2, f"{span} {' '.join(f'y{i} z{i}' for i in range(15))}"),
        # exact duplicate of history doc 103 (after normalization)
        (3, f"{span} {filler_b}"),
        # too short after all filters
        (4, "tiny doc"),
    ]
    docs = spark.createDataFrame(arriving, "doc_id bigint, text string")
    src = tmp_path / "chain_src"
    docs.write.parquet(str(src))

    def chain(frame):
        out = stream_line_filter(frame, line_snap, join_sep=" ")
        out = stream_span_filter(out, span_snap.filter("doc_freq >= 2"), n=3, min_run=3)
        out = stream_dedup_exact(out, hist)
        return stream_curate(out, bench, min_tokens=10, max_tokens=100)

    stream = spark.readStream.schema(docs.schema).format("parquet").load(str(src))
    q = (
        chain(stream)
        .writeStream.format("memory")
        .queryName("chain_sink")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r["doc_id"]: r["text"]
            for r in spark.sql("SELECT doc_id, text FROM chain_sink").collect()
        }
    finally:
        q.stop()

    # batch application of the same chain agrees row-for-row
    batch = {r["doc_id"]: r["text"] for r in chain(docs).collect()}
    assert got == batch

    # and the outcomes are the intended ones
    assert set(got) == {1, 2}          # 3 = exact dup of history, 4 = too short
    assert "cookie banner" not in got[1]
    assert "quick brown fox" not in got[2]
