"""Custom stateful streaming operators (applyInPandasWithState).

The built-in windows cover time-bucketed aggregation; these cover the
genuinely custom state machines a pipeline needs: running per-key
accumulators that survive across micro-batches with timeout-based eviction.
State is per-key and partitioned by Spark's shuffle, so the operator scales
horizontally like any streaming aggregation; the Arrow batches keep the
Python boundary cheap.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

RUNNING_TOTALS_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

RUNNING_TOTALS_STATE = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def _make_update_fn(timeout_ms: int | None):
    def _update(
        key: Tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            (n, total) = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
            )
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in batches:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return _update


def running_user_totals(events: DataFrame, timeout_ms: int | None = None) -> DataFrame:
    """Per-user running (count, sum(value)) maintained across micro-batches.

    ``timeout_ms`` enables processing-time state eviction (a final row is
    emitted when a key goes idle) — the production setting for unbounded
    key spaces. Leave None for drain-style tests: with a processing-time
    timeout the trigger never goes idle, so ``processAllAvailable()`` would
    block forever.

    In batch mode the same logic degenerates to a plain groupBy aggregate —
    used as the correctness oracle in tests.
    """
    if not events.isStreaming:
        from pyspark.sql import functions as F

        return events.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _make_update_fn(timeout_ms),
        RUNNING_TOTALS_OUTPUT,
        RUNNING_TOTALS_STATE,
        "update",
        timeout_conf,
    )


def stream_dedup_exact(
    stream_df: DataFrame,
    history_df: DataFrame,
    text_col: str = "text",
    ts_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming side of incremental exact dedup — the ingest-pipeline
    twin of ``operators.dedup.dedup_exact_incremental``: documents arrive
    as a stream, rows whose normalized fingerprint already exists in the
    STATIC history are dropped by a stream-static LEFT ANTI join
    (re-planned per micro-batch; the history side is reduced to distinct
    16-byte fingerprints, the broadcastable shape), and in-stream repeats
    are removed by fingerprint with ``dropDuplicatesWithinWatermark``
    when ``ts_col`` is given (bounded state: a fingerprint is remembered
    for ``watermark``), or unbounded ``dropDuplicates`` otherwise (state
    grows with distinct documents — only for bounded backfills).

    Survivor rule differs from the batch operator by necessity: a stream
    keeps the FIRST ARRIVAL per fingerprint, not the min id (a stream
    cannot see the future to pick a smaller id). The surviving
    fingerprint SET is identical.
    """
    from pyspark.sql import functions as F

    from intake_esm_spark.functions.text import fingerprint_md5
    from intake_esm_spark.operators.dedup import history_fingerprints

    # persist: a stream-static join re-executes the static side on EVERY
    # micro-batch — without materialization each trigger would re-scan
    # and re-fingerprint the whole history (which dwarfs the batch's own
    # work at any real history size)
    hist_fp = history_fingerprints(history_df, text_col).persist()
    s = stream_df.withColumn("__fp", fingerprint_md5(F.col(text_col)))
    s = s.join(hist_fp, on="__fp", how="left_anti")
    if ts_col is not None and stream_df.isStreaming:
        s = s.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(["__fp"])
    elif ts_col is not None:
        # batch fallback with a timestamp: keep the EARLIEST row per
        # fingerprint (ties broken by the full row for determinism) — the
        # batch mirror of first-arrival-wins, so batch-vs-streaming parity
        # checks compare like with like instead of an arbitrary survivor
        from pyspark.sql import Window

        w = Window.partitionBy("__fp").orderBy(
            F.col(ts_col).asc(), *[F.col(c).asc() for c in stream_df.columns if c != ts_col]
        )
        s = (
            s.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    else:
        s = s.dropDuplicates(["__fp"])
    return s.drop("__fp")

def stream_curate(
    stream_df: DataFrame,
    benchmark_df: DataFrame,
    text_col: str = "text",
    shingle_n: int = 5,
    min_tokens: int = 20,
    max_tokens: int = 2000,
    max_top_frac: float = 0.3,
    rep_n: int = 2,
    max_bench_grams: int = 5_000_000,
) -> DataFrame:
    """Streaming twin of the batch curation pass (``docs_curated`` minus
    the dedup stage — compose with :func:`stream_dedup_exact` upstream for
    the full ingest pipeline): per-row quality gates plus decontamination
    against a STATIC benchmark set, all STATELESS, so the operator behaves
    identically on a stream and on a batch frame (parity-tested).

    * token-length window and top-``rep_n``-gram repetition cap are pure
      in-row projections (``ws_token_count``; the zero-shuffle run-length
      encoding shared with ``operators.corpus.repetition_stats``);
    * decontamination broadcasts the benchmark's distinct ``shingle_n``-gram
      60-bit hash set (eval sets are MBs by nature; ``max_bench_grams``
      guards the driver collect with a diagnostic instead of an OOM) and
      drops any document sharing a gram with it via an Arrow-batched
      pandas UDF over the document's in-row gram-hash array. The batch
      operator's explode+join shape would need a stream-stream anti-join
      (unsupported); a broadcast-set membership projection is the
      streaming-native formulation of the same predicate.
    """
    from pyspark.sql import functions as F

    from intake_esm_spark.functions.text import (
        portable_hash60,
        shingles,
        ws_token_count,
    )
    from intake_esm_spark.operators.contamination import benchmark_ngrams
    from intake_esm_spark.operators.corpus import _rle_fold

    bench = benchmark_ngrams(benchmark_df, text_col=text_col, n=shingle_n)
    rows = bench.limit(max_bench_grams + 1).collect()
    if len(rows) > max_bench_grams:
        raise ValueError(
            f"benchmark n-gram set exceeds max_bench_grams={max_bench_grams}; "
            "a benchmark this large cannot broadcast — decontaminate in "
            "batch with operators.contamination (shuffle join) instead"
        )
    bench_set = frozenset(r["__ng_h"] for r in rows)
    bc = stream_df.sparkSession.sparkContext.broadcast(bench_set)

    @F.pandas_udf("boolean")
    def _is_clean(gram_hashes: pd.Series) -> pd.Series:
        s = bc.value
        # null text -> null gram array: tolerate it here (a null row is
        # "clean" as far as decontamination goes — the token-count gate
        # rejects it anyway) rather than rely on Catalyst ordering the
        # deterministic conjuncts below this Python eval node.
        return gram_hashes.map(
            lambda arr: True if arr is None else not any(int(h) in s for h in arr)
        )

    text = F.col(text_col)
    sorted_rep = F.array_sort(shingles(text, rep_n))
    # ONE reference to the (expensive) sorted-shingle expression: the
    # whole repetition gate is computed inside the fold's finish lambda,
    # so the regex shingling runs once per row even though this lands in
    # a Filter with no projection boundary (SCALE.md pitfall #4)
    rep_ok = _rle_fold(
        sorted_rep,
        finish=lambda acc: (
            acc["best"].cast("double") / acc["n"].cast("double")
        )
        <= F.lit(max_top_frac),
    )
    grams = F.transform(F.array_distinct(shingles(text, shingle_n)), portable_hash60)
    n_tok = ws_token_count(text)
    return stream_df.filter(
        (n_tok >= min_tokens)
        & (n_tok <= max_tokens)
        & rep_ok
        & _is_clean(grams)
    )


def stream_line_filter(
    stream_df: DataFrame,
    boilerplate_df: DataFrame,
    text_col: str = "text",
    sep: str = "\n",
    join_sep: str = "\n",
    normalize: bool = True,
    fingerprint_col: str = "fingerprint",
    max_boilerplate: int = 5_000_000,
) -> DataFrame:
    """Ingest-time structural dedup — the streaming twin of
    ``operators.structural.line_dedup(keep="none")``: every arriving
    document is rewritten with the lines whose fingerprint appears in a
    STATIC boilerplate set removed, preserving the order of the surviving
    lines. The set is built offline by
    ``operators.structural.duplicated_lines`` over the history corpus
    (cross-document frequency is corpus-global state a stream cannot
    compute row-by-row, exactly like the LSH index: the set is a
    snapshot — rebuild it as the corpus grows).

    Stateless per-row projection: works in any output mode, needs no
    watermark, composes before :func:`stream_dedup_exact` (boilerplate
    out BEFORE document fingerprints, the CCNet ordering). The
    fingerprints are collected once (guarded by ``max_boilerplate`` —
    beyond that a broadcast set stops being the right shape; fall back to
    a batch ``line_dedup`` pass), broadcast, and probed inside one
    Arrow-batched pandas UDF.

    Caveats mirroring the batch operator: ``sep`` here is a LITERAL
    separator (``str.split``), matching ``line_dedup``'s default but not
    its regex option; the md5-of-normalized-line BYTE-replays
    ``functions.text.normalized_text`` (ASCII-explicit whitespace class
    + space-only strip — python's unicode-aware ``\\s``/``strip()``
    defaults would fingerprint NBSP-bearing lines differently than the
    JVM report). Null text passes through as null.
    """
    import hashlib
    import re

    from pyspark.sql import functions as F

    rows = (
        boilerplate_df.select(fingerprint_col).limit(max_boilerplate + 1).collect()
    )
    if len(rows) > max_boilerplate:
        raise ValueError(
            f"boilerplate set exceeds max_boilerplate={max_boilerplate}; a "
            "set this large cannot broadcast — run the batch "
            "operators.structural.line_dedup pass instead"
        )
    bset = frozenset(r[0] for r in rows)
    bc = stream_df.sparkSession.sparkContext.broadcast(bset)
    # byte-replay of the batch report's JVM normalization, NOT python's
    # defaults: Java regex \s is ASCII-only ([ \t\n\x0B\f\r]) while python
    # str-mode \s matches unicode whitespace (NBSP is common in
    # HTML-derived boilerplate — a unicode-aware sub here would fingerprint
    # those lines differently and reported boilerplate would silently
    # survive streaming ingest); Spark SQL trim() strips only the SPACE
    # character, which python's argless .strip() (any unicode whitespace)
    # does not replay — hence .strip(" ").
    ws_re = re.compile(r"[ \t\n\x0b\f\r]+")

    @F.pandas_udf("string")
    def _scrub(texts: pd.Series) -> pd.Series:
        s = bc.value

        def one(t):
            if t is None:
                return None
            kept = []
            for line in t.split(sep):
                key = (
                    ws_re.sub(" ", line.lower()).strip(" ")
                    if normalize
                    else line
                )
                if hashlib.md5(key.encode("utf-8")).hexdigest() not in s:
                    kept.append(line)
            return join_sep.join(kept)

        return texts.map(one)

    return stream_df.withColumn(text_col, _scrub(F.col(text_col)))


def stream_span_filter(
    stream_df: DataFrame,
    window_hashes_df: DataFrame,
    text_col: str = "text",
    n: int = 5,
    min_run: int = 2,
    hash_col: str = "window_hash",
    max_windows: int = 5_000_000,
) -> DataFrame:
    """Ingest-time substring-run dedup — the streaming twin of
    ``operators.spans.span_dedup_against``: every arriving document is
    rewritten with the token spans covered by >= ``min_run`` consecutive
    KNOWN-duplicated windows cut out. The duplicated-window snapshot is
    built offline by ``operators.spans.duplicated_window_hashes`` (+
    ``merge_window_reports`` across batches) and thresholded by the
    caller — corpus-global window frequency is exactly the state a
    stream cannot compute row-by-row (the ``stream_line_filter`` /
    LSH-index shape: snapshot, refresh as the corpus grows).

    Stateless per-row projection (any output mode, no watermark);
    composes with :func:`stream_line_filter` BEFORE
    :func:`stream_dedup_exact` — boilerplate and verbatim spans out
    before document fingerprints. The hash set is collected once
    (``max_windows``-guarded: beyond that a broadcast set is the wrong
    shape — run the batch pass), broadcast, and probed inside one
    Arrow-batched pandas UDF that BYTE-replays the engine pipeline:
    ASCII-whitespace normalization, the <=n-words whole-text window
    rule, md5-based 60-bit window hashes, gaps-and-islands runs, token
    cut. Parity with the batch operator is asserted in tests. Output
    text is normalized text (the batch operator's convention). Null
    passes through as null."""
    import hashlib
    import re

    from pyspark.sql import functions as F

    # mirror the batch twin's guards (spans._window_runs raises for
    # these; silent acceptance here would cut every isolated window)
    if min_run < 1:
        raise ValueError(f"min_run must be >= 1, got {min_run}")
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")

    rows = (
        window_hashes_df.select(hash_col).limit(max_windows + 1).collect()
    )
    if len(rows) > max_windows:
        raise ValueError(
            f"window-hash set exceeds max_windows={max_windows}; a set "
            "this large cannot broadcast — run the batch "
            "operators.spans.span_dedup_against pass instead"
        )
    hset = frozenset(r[0] for r in rows)
    bc = stream_df.sparkSession.sparkContext.broadcast(hset)
    ws_re = re.compile(r"[ \t\n\x0b\f\r]+")

    @F.pandas_udf("string")
    def _cut(texts: pd.Series) -> pd.Series:
        s = bc.value

        def h60(x: str) -> int:
            return int(hashlib.md5(x.encode("utf-8")).hexdigest()[:15], 16)

        def one(t):
            if t is None:
                return None
            w = ws_re.sub(" ", t.lower()).strip(" ").split(" ")
            if len(w) <= n:
                wins = [" ".join(w)]
            else:
                wins = [" ".join(w[i : i + n]) for i in range(len(w) - n + 1)]
            covered = set()
            i = 0
            while i < len(wins):
                if h60(wins[i]) in s:
                    j = i
                    while j < len(wins) and h60(wins[j]) in s:
                        j += 1
                    if j - i >= min_run:
                        covered.update(range(i, j - 1 + n))
                    i = j
                else:
                    i += 1
            return " ".join(
                tok for k, tok in enumerate(w) if k not in covered
            )

        return texts.map(one)

    return stream_df.withColumn(text_col, _cut(F.col(text_col)))


def stream_distinct_kmv(
    df: DataFrame,
    key_col: str,
    group_col: str,
    k: int = 64,
) -> DataFrame:
    """Streaming twin of ``operators.sketch.kmv_distinct``: a per-group
    KMV bottom-k sketch maintained across micro-batches with
    ``applyInPandasWithState`` — the live "distinct users per segment"
    counter. State per group is exactly the sketch (<= k bigints, the
    whole point of KMV: bounded state for unbounded key streams), and
    because KMV merging is associative, after any batch split the final
    update row per group equals the batch operator's output bit-for-bit
    (hashes, n_kept, AND the HALF_UP-rounded estimate) — pinned by the
    parity test.

    In batch mode degenerates to the batch operator (the oracle).
    """
    import hashlib
    from decimal import ROUND_HALF_UP, Decimal

    from pyspark.sql import functions as F

    from intake_esm_spark.operators.sketch import _HASH_SPACE, kmv_distinct

    if k < 2:
        raise ValueError(f"k must be >= 2 for the (k-1)/u estimator, got {k}")
    if not df.isStreaming:
        return kmv_distinct(df, key_col, [group_col], k)

    # cast the key to string JVM-side so the python hash replays the
    # batch operator's CAST(key AS STRING) exactly — without this, a
    # LongType key column with any null reaches pandas as float64 and
    # str(5.0) = '5.0' hashes differently than Spark's '5' (and bool/
    # double renderings diverge too)
    df = df.select(
        F.col(group_col), F.col(key_col).cast("string").alias(key_col)
    )
    group_type = df.schema[group_col].dataType
    output_schema = T.StructType(
        [
            T.StructField(group_col, group_type),
            T.StructField("kmv_hashes", T.ArrayType(T.LongType())),
            T.StructField("n_kept", T.LongType()),
            T.StructField("distinct_est", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [T.StructField("kept", T.ArrayType(T.LongType()))]
    )

    def _h60(key: str) -> int:
        # byte-replay of functions.text.salted_hash60(key, salt=""):
        # md5('|' + str(key)), first 15 hex chars as a 60-bit int
        return int(hashlib.md5(("|" + key).encode("utf-8")).hexdigest()[:15], 16)

    def _update(
        key: Tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        kept = set(state.get[0]) if state.exists else set()
        for pdf in batches:
            col = pdf[key_col].dropna()
            # values are Spark-cast strings (see the select above)
            kept.update(_h60(v) for v in col)
            if len(kept) > 4 * k:  # keep the working set bounded mid-batch
                kept = set(sorted(kept)[:k])
        kept_sorted = sorted(kept)[:k]
        if not kept_sorted:
            # all-null group: the batch operator emits no row for it
            # (key IS NOT NULL filter) — neither do we
            return
        state.update((kept_sorted,))
        n = len(kept_sorted)
        est = float(n) if n < k else (k - 1) * _HASH_SPACE / kept_sorted[-1]
        est = float(
            Decimal(repr(est)).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
        )
        yield pd.DataFrame(
            {
                group_col: [key[0]],
                "kmv_hashes": [kept_sorted],
                "n_kept": [n],
                "distinct_est": [est],
            }
        )

    return df.groupBy(group_col).applyInPandasWithState(
        _update,
        output_schema,
        state_schema,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def stream_scd2(
    df: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming twin of ``operators.eventlog.scd2_from_log``: the
    per-entity type-2 dimension maintained live across micro-batches
    with ``applyInPandasWithState`` — the warehouse dimension that
    updates as the change log arrives instead of on the nightly batch.

    State per entity is ONE open version — (attribute value, null flag,
    effective_from micros, version number) — bounded regardless of event
    volume. Each qualifying event whose attribute IS DISTINCT FROM the
    open version's closes that version (emitting it with its
    ``effective_to``) and opens the next; every update re-emits the
    current open row, so downstream sinks always hold the latest row per
    (entity, version) — take last-write-wins per that pair and the table
    equals the batch operator's output (the parity test's compare rule).

    Exactness caveats (the ``stream_funnel`` contract): equal to the
    batch operator when each entity's events are processed in event-time
    order — a micro-batch's chunks are gathered and sorted once here
    (ties broken like the batch window would with a monotone
    ``order_col``: stable sort on arrival order), so single-batch
    delivery is exact and cross-batch delivery is exact under per-entity
    event-time-ordered arrival. A late EARLIER event cannot rewrite
    already-closed versions (that would need unbounded state). The
    attribute column must be string-typed (cast upstream) so the state
    tuple round-trips without engine-specific renderings; null entity
    keys are excluded like the batch operator.

    In batch mode degenerates to the batch operator (the oracle).
    """
    from pyspark.sql import functions as F

    from intake_esm_spark.operators.eventlog import scd2_from_log

    if not df.isStreaming:
        return scd2_from_log(df, key_col, attr_col, ts_col)
    if not isinstance(df.schema[attr_col].dataType, T.StringType):
        raise ValueError(
            f"stream_scd2 requires a string attribute column; cast "
            f"{attr_col!r} upstream (got {df.schema[attr_col].dataType})"
        )
    key_type = df.schema[key_col].dataType
    output_schema = T.StructType(
        [
            T.StructField(key_col, key_type),
            T.StructField(attr_col, T.StringType()),
            T.StructField("effective_from", T.TimestampType()),
            T.StructField("effective_to", T.TimestampType()),
            T.StructField("version", T.IntegerType()),
            T.StructField("is_current", T.IntegerType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("attr", T.StringType()),
            T.StructField("attr_null", T.IntegerType()),
            T.StructField("from_us", T.LongType()),
            T.StructField("version", T.IntegerType()),
        ]
    )

    def _update(
        key: Tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if key[0] is None or pd.isna(key[0]):
            # batch operator filters null keys (a null long key reaches
            # the python boundary as NaN, not None)
            return
        if state.exists:
            attr, attr_null, from_us, version = state.get
            cur = (None if attr_null else attr, from_us, version)
        else:
            cur = None
        chunks = [c for c in batches if len(c)]
        pdf = pd.concat(chunks, ignore_index=True) if chunks else pd.DataFrame()
        out_rows = []
        changed = False
        if len(pdf):
            pdf = pdf.dropna(subset=[ts_col]).sort_values(
                ts_col, kind="mergesort"
            )
            for val, ts in zip(pdf[attr_col], pdf[ts_col]):
                v = None if pd.isna(val) else val
                ts_us = ts.value // 1000
                if cur is None:
                    cur = (v, ts_us, 1)
                    changed = True
                elif v != cur[0]:  # IS DISTINCT FROM on (str|None) values
                    out_rows.append(
                        (cur[0], cur[1], ts_us, cur[2], 0)
                    )  # close the open version
                    cur = (v, ts_us, cur[2] + 1)
                    changed = True
        if cur is None:
            return  # no qualifying events yet: batch emits nothing
        if changed:
            state.update(
                (cur[0], 1 if cur[0] is None else 0, cur[1], cur[2])
            )
        out_rows.append((cur[0], cur[1], None, cur[2], 1))
        yield pd.DataFrame(
            {
                key_col: [key[0]] * len(out_rows),
                attr_col: [r[0] for r in out_rows],
                "effective_from": [
                    pd.Timestamp(r[1] * 1000) for r in out_rows
                ],
                "effective_to": [
                    pd.Timestamp(r[2] * 1000) if r[2] is not None else pd.NaT
                    for r in out_rows
                ],
                "version": [r[3] for r in out_rows],
                "is_current": [r[4] for r in out_rows],
            }
        )

    return df.groupBy(key_col).applyInPandasWithState(
        _update,
        output_schema,
        state_schema,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def stream_cusum(
    df: DataFrame,
    mean: float,
    sd: float,
    key_col: str = "series",
    day_col: str = "day",
    value_col: str = "value",
    k_sigma: float = 0.5,
    h_sigma: float = 4.0,
) -> DataFrame:
    """Streaming CUSUM level-shift alerting — the live twin of
    ``operators.timeseries.detect_level_shift``: per-series cumulative
    drift evidence maintained across micro-batches with
    ``applyInPandasWithState``, against a FIXED baseline ``(mean, sd)``
    computed offline (corpus-global moments are exactly the state a
    stream cannot compute — the ``stream_line_filter`` snapshot rule:
    refresh the baseline as the history grows). Input is a DAY-GRAIN
    stream ``(key, day, value)`` — the output of an upstream daily
    rollup — and each update emits that day's ``cusum_up/down`` and
    alarm flags.

    State per series is FOUR int64s: the running drift prefix sums and
    their running minimums, in exact millionths (the 6dp-quantized
    drifts are integers at 1e-6 scale, so cross-batch accumulation is
    EXACT — no float drift ever enters the state), giving bit-equality
    with the batch operator's decimal windows when it is handed the same
    baseline: the drifts replay ``F.round``'s HALF_UP via Decimal, and
    S⁺ = prefix − min(0, min-prefix) is the same closed form. Exactness
    needs per-series day-ordered arrival across batches (in-batch days
    are sorted here); a late earlier day cannot rewrite emitted history.

    In batch mode degenerates to the same closed form over ordered
    windows with the given baseline (used by the parity test against
    ``detect_level_shift``'s internally-computed moments)."""
    from decimal import ROUND_HALF_UP, Decimal

    from pyspark.sql import functions as F

    if sd is None or not sd > 0:
        raise ValueError(f"sd must be a positive baseline sigma, got {sd}")
    h = h_sigma * sd
    if not df.isStreaming:
        from pyspark.sql import Window

        x = F.col(value_col).cast("double")
        du = F.round(x - F.lit(mean) - F.lit(k_sigma) * F.lit(sd), 6).cast(
            "decimal(18,6)"
        )
        dn = F.round(F.lit(mean) - x - F.lit(k_sigma) * F.lit(sd), 6).cast(
            "decimal(18,6)"
        )
        w = (
            Window.partitionBy(key_col)
            .orderBy(day_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        pre = df.select(
            key_col, day_col, x.alias("__x"), du.alias("__du"), dn.alias("__dd")
        ).select(
            key_col,
            day_col,
            "__x",
            F.sum("__du").over(w).alias("__pu"),
            F.sum("__dd").over(w).alias("__pd"),
        )
        zero = F.lit(0).cast("decimal(18,6)")
        cu = (F.col("__pu") - F.least(zero, F.min("__pu").over(w))).cast("double")
        cd = (F.col("__pd") - F.least(zero, F.min("__pd").over(w))).cast("double")
        return pre.select(
            key_col,
            day_col,
            F.round(cu, 6).alias("cusum_up"),
            F.round(cd, 6).alias("cusum_down"),
            (F.round(cu, 6) > F.lit(h)).cast("int").alias("shift_up"),
            (F.round(cd, 6) > F.lit(h)).cast("int").alias("shift_down"),
        )

    key_type = df.schema[key_col].dataType
    day_type = df.schema[day_col].dataType
    output_schema = T.StructType(
        [
            T.StructField(key_col, key_type),
            T.StructField(day_col, day_type),
            T.StructField("cusum_up", T.DoubleType()),
            T.StructField("cusum_down", T.DoubleType()),
            T.StructField("shift_up", T.IntegerType()),
            T.StructField("shift_down", T.IntegerType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("pu", T.LongType()),
            T.StructField("minu", T.LongType()),
            T.StructField("pd", T.LongType()),
            T.StructField("mind", T.LongType()),
        ]
    )
    q6 = Decimal("0.000001")

    def _drift_units(x: float, sign: int) -> int:
        raw = (x - mean - k_sigma * sd) if sign > 0 else (mean - x - k_sigma * sd)
        return int(
            (Decimal(repr(raw)).quantize(q6, rounding=ROUND_HALF_UP))
            .scaleb(6)
            .to_integral_value()
        )

    def _update(
        key: Tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        pu, minu, pdn, mind = state.get if state.exists else (0, 0, 0, 0)
        chunks = [c for c in batches if len(c)]
        pdf = pd.concat(chunks, ignore_index=True) if chunks else pd.DataFrame()
        out = []
        if len(pdf):
            pdf = pdf.dropna(subset=[day_col, value_col]).sort_values(
                day_col, kind="mergesort"
            )
            for day, val in zip(pdf[day_col], pdf[value_col]):
                pu += _drift_units(float(val), +1)
                minu = min(minu, pu)
                pdn += _drift_units(float(val), -1)
                mind = min(mind, pdn)
                cu = float(Decimal(pu - min(0, minu)).scaleb(-6))
                cd = float(Decimal(pdn - min(0, mind)).scaleb(-6))
                out.append((day, cu, cd, int(cu > h), int(cd > h)))
        if not out:
            return
        state.update((pu, minu, pdn, mind))
        yield pd.DataFrame(
            {
                key_col: [key[0]] * len(out),
                day_col: [o[0] for o in out],
                "cusum_up": [o[1] for o in out],
                "cusum_down": [o[2] for o in out],
                "shift_up": [o[3] for o in out],
                "shift_down": [o[4] for o in out],
            }
        )

    return df.groupBy(key_col).applyInPandasWithState(
        _update,
        output_schema,
        state_schema,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def stream_transition_pairs(
    df: DataFrame,
    type_col: str = "event_type",
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming side of ``operators.eventlog.transition_matrix``: the
    per-entity consecutive-pair stream, maintained across micro-batches
    with ``applyInPandasWithState`` — state per entity is ONE (ts, type)
    tuple (the last seen event), so a cross-batch boundary pair
    ``last_of_batch_N -> first_of_batch_N+1`` is emitted exactly like an
    in-batch pair. Each emitted row is one ``(from_type, to_type)``
    transition, exactly once; pipe into ``groupBy(from_type,
    to_type).count()`` (streaming update mode) for live counts — the
    aggregation is deliberately left to the caller so the pair stream
    composes (count, probability, alerting) without re-reading state.

    Total emitted pairs equal the batch operator's ``n_transitions``
    totals (terminal=None form) under per-entity event-time-ordered
    arrival — the ``stream_funnel`` exactness contract (in-batch chunks
    gathered and stably sorted once; a late earlier event would pair in
    arrival position). Null keys and null types are excluded like the
    batch operator.

    In batch mode degenerates to the batch pair derivation (lead window
    — the oracle)."""
    from pyspark.sql import functions as F

    if not df.isStreaming:
        from pyspark.sql import Window

        base = df.filter(
            F.col(key_col).isNotNull() & F.col(type_col).isNotNull()
        )
        w = Window.partitionBy(key_col).orderBy(ts_col)
        return base.select(
            F.col(type_col).alias("from_type"),
            F.lead(type_col).over(w).alias("to_type"),
        ).filter(F.col("to_type").isNotNull())
    if not isinstance(df.schema[type_col].dataType, T.StringType):
        raise ValueError(
            f"stream_transition_pairs requires a string type column; got "
            f"{df.schema[type_col].dataType} for {type_col!r}"
        )
    output_schema = T.StructType(
        [
            T.StructField("from_type", T.StringType()),
            T.StructField("to_type", T.StringType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("last_ts_us", T.LongType()),
            T.StructField("last_type", T.StringType()),
        ]
    )

    def _update(
        key: Tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if key[0] is None or pd.isna(key[0]):
            return
        last = state.get if state.exists else None
        chunks = [c for c in batches if len(c)]
        pdf = pd.concat(chunks, ignore_index=True) if chunks else pd.DataFrame()
        pairs = []
        if len(pdf):
            pdf = pdf.dropna(subset=[ts_col, type_col]).sort_values(
                ts_col, kind="mergesort"
            )
            for val, ts in zip(pdf[type_col], pdf[ts_col]):
                ts_us = ts.value // 1000
                if last is not None:
                    pairs.append((last[1], val))
                last = (ts_us, val)
        if last is None:
            return
        state.update(tuple(last))
        if pairs:
            yield pd.DataFrame(
                {
                    "from_type": [p[0] for p in pairs],
                    "to_type": [p[1] for p in pairs],
                }
            )

    return df.groupBy(key_col).applyInPandasWithState(
        _update,
        output_schema,
        state_schema,
        "update",
        GroupStateTimeout.NoTimeout,
    )


_INTERVAL_UNITS_US = {
    "second": 1_000_000, "seconds": 1_000_000,
    "minute": 60_000_000, "minutes": 60_000_000,
    "hour": 3_600_000_000, "hours": 3_600_000_000,
    "day": 86_400_000_000, "days": 86_400_000_000,
}


def _interval_us(within: str) -> int:
    """Parse the simple '<n> <unit>' interval strings funnel() accepts
    into microseconds (the subset both the SQL INTERVAL literal and this
    python replay agree on)."""
    parts = within.strip().split()
    if len(parts) != 2 or parts[1].lower() not in _INTERVAL_UNITS_US:
        raise ValueError(
            f"within must look like '12 hours' "
            f"(units: {sorted(set(_INTERVAL_UNITS_US))}), got {within!r}"
        )
    return int(parts[0]) * _INTERVAL_UNITS_US[parts[1].lower()]


def stream_funnel(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within: str | None = None,
) -> DataFrame:
    """Streaming twin of ``operators.funnel.funnel``: the per-user
    funnel state machine maintained across micro-batches with
    ``applyInPandasWithState``. State per user is just the completed-step
    timestamps (<= k epoch-micros longs — bounded regardless of how many
    events the user produces), advanced one qualifying event at a time:
    step 1 anchors on the first ``steps[0]`` event, step i+1 on the first
    ``steps[i]`` event strictly after t_i (and inside ``within`` of it).
    Each update emits the user's current funnel row.

    Exactness caveats (stated, like ``stream_dedup_exact``'s): equals
    the batch operator when each user's events are processed in
    event-time order — a micro-batch's events are gathered across ALL
    Arrow chunks and sorted once here, so single-batch delivery is
    always exact, and cross-batch delivery is exact when arrival order
    respects event time per user. A late-arriving EARLIER event cannot
    re-anchor a funnel already past it (that would need unbounded
    state). Timestamp arithmetic runs on epoch micros as rendered in the
    session timezone — ``get_spark()`` pins ``spark.sql.session.
    timeZone=UTC``, which this operator assumes (a DST-observing session
    zone would make wall-clock deltas diverge from the batch operator's
    instant arithmetic).

    In batch mode degenerates to the batch operator (the oracle).
    """
    from intake_esm_spark.operators.funnel import funnel

    if len(steps) < 1:
        raise ValueError("steps must be non-empty")
    if not df.isStreaming:
        return funnel(df, steps, user_col, ts_col, type_col, within)

    tol_us = _interval_us(within) if within is not None else None
    k = len(steps)
    user_type = df.schema[user_col].dataType
    output_schema = T.StructType(
        [T.StructField(user_col, user_type)]
        + [T.StructField(f"t{i}", T.TimestampType()) for i in range(1, k + 1)]
        + [T.StructField("steps_completed", T.IntegerType())]
    )
    state_schema = T.StructType([T.StructField("ts_us", T.ArrayType(T.LongType()))])

    def _update(
        key: Tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        done = list(state.get[0]) if state.exists else []
        progressed = False
        # a group's micro-batch arrives as MULTIPLE Arrow chunks (capped
        # by arrow.maxRecordsPerBatch); sorting per-chunk would misorder
        # events that straddle a chunk boundary — gather, then sort once
        chunks = [c for c in batches if len(c)]
        pdf = (
            pd.concat(chunks, ignore_index=True) if chunks else pd.DataFrame()
        )
        if len(pdf):
            pdf = pdf.dropna(subset=[ts_col]).sort_values(ts_col, kind="mergesort")
            for etype, ts in zip(pdf[type_col], pdf[ts_col]):
                ts_us = ts.value // 1000  # pandas ns -> engine micros
                j = len(done)
                if j == 0:
                    if etype == steps[0]:
                        done.append(ts_us)
                        progressed = True
                # a NULL user key can anchor step 1 (the batch groupBy
                # keeps the null group) but never advance: the batch
                # operator's equi-joins drop null keys past step 1
                elif j < k and etype == steps[j] and key[0] is not None:
                    prev = done[-1]
                    if ts_us > prev and (
                        tol_us is None or ts_us <= prev + tol_us
                    ):
                        done.append(ts_us)
                        progressed = True
        if not done:
            return  # not in the cohort: batch emits no row either
        if progressed or not state.exists:
            state.update((done,))
        ts_vals = [
            pd.Timestamp(done[i] * 1000) if i < len(done) else pd.NaT
            for i in range(k)
        ]
        yield pd.DataFrame(
            {
                user_col: [key[0]],
                **{f"t{i+1}": [ts_vals[i]] for i in range(k)},
                "steps_completed": [len(done)],
            }
        )

    return df.groupBy(user_col).applyInPandasWithState(
        _update,
        output_schema,
        state_schema,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def stream_cm_sketch(
    df: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 1024,
    salt: str = "cm",
) -> DataFrame:
    """Streaming twin of ``operators.sketch.cm_sketch`` — the live
    frequency sketch. CM counters are plain additive counts, which is
    EXACTLY the class Spark's built-in streaming aggregation maintains,
    so unlike the KMV/CUSUM/SCD2 twins this one needs no
    ``applyInPandasWithState``: the batch operator's own plan (in-row
    cell derivation → groupBy(row, col) count) is a legal streaming
    aggregation in update mode. Each update row is that cell's new
    RUNNING total; the latest update per cell equals the batch sketch
    of everything ingested so far bit-for-bit (integer counters, no
    rounding anywhere) — pinned by the parity test. State per cell is
    one long; the state store holds ≤ depth·width cells total, whatever
    the stream length — the sketch's bounded-memory guarantee carries
    straight over to the state store."""
    from intake_esm_spark.operators.sketch import cm_sketch

    return cm_sketch(df, item_col, depth=depth, width=width, salt=salt)


def stream_bloom_build(
    df: DataFrame,
    item_col: str,
    n_hashes: int = 7,
    n_bits: int = 65536,
    salt: str = "bf",
) -> DataFrame:
    """Streaming twin of ``operators.sketch.bloom_build`` — the live
    membership filter. Like the Count-Min twin, no custom state: a
    Bloom filter only ever SETS bits, so the build is exactly Spark's
    built-in streaming deduplication (each bit position emitted once,
    on the micro-batch that first lights it — append mode). The union
    of all emitted rows equals the batch filter of everything ingested
    bit-for-bit (parity-tested); dedup state is one entry per lit bit,
    ≤ ``n_bits`` total whatever the stream length — the same bounded-
    memory guarantee as the batch bit array, carried by the state
    store. Downstream, snapshot the sink table and probe it with the
    batch ``bloom_probe``."""
    from intake_esm_spark.operators.sketch import bloom_build

    return bloom_build(
        df, item_col, n_hashes=n_hashes, n_bits=n_bits, salt=salt
    )


def stream_quantile_sketch(
    df: DataFrame,
    value_col: str,
    key_col: str,
    group_col: str,
    k: int = 128,
    salt: str = "qs",
) -> DataFrame:
    """Streaming twin of ``operators.sketch.quantile_sketch`` (#16 —
    every sketch in the quartet has a live twin): per-group bottom-k
    (hash, value) pairs maintained across micro-batches with
    ``applyInPandasWithState``. State per group is exactly the sketch
    (≤ k pairs — bounded for unbounded streams), and bottom-k merging
    is associative, so after any batch split the final update per group
    equals the batch operator bit-for-bit (hashes, values, n_kept) —
    pinned by the parity test. In batch mode degenerates to the batch
    operator (the oracle)."""
    import hashlib

    from pyspark.sql import functions as F

    from intake_esm_spark.operators.sketch import quantile_sketch

    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if not df.isStreaming:
        return quantile_sketch(df, value_col, key_col, [group_col], k, salt)

    # cast JVM-side so the python hash replays CAST(key AS STRING)
    # exactly (the stream_distinct_kmv float64-null lesson)
    df = df.select(
        F.col(group_col),
        F.col(key_col).cast("string").alias(key_col),
        F.col(value_col).cast("double").alias(value_col),
    )
    group_type = df.schema[group_col].dataType
    output_schema = T.StructType(
        [
            T.StructField(group_col, group_type),
            T.StructField("qs_hashes", T.ArrayType(T.LongType())),
            T.StructField("qs_values", T.ArrayType(T.DoubleType())),
            T.StructField("n_kept", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("hs", T.ArrayType(T.LongType())),
            T.StructField("vs", T.ArrayType(T.DoubleType())),
        ]
    )

    def _h60(key: str) -> int:
        # byte-replay of salted_hash60(key, salt)
        return int(
            hashlib.md5((salt + "|" + key).encode("utf-8")).hexdigest()[:15],
            16,
        )

    def _update(
        key: Tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        # a SET of (hash, value) PAIRS, not a hash-keyed dict: the batch
        # operator keeps BOTH pairs when distinct keys collide on the
        # hash (or a duplicated key carries two values) — array_sort
        # orders by (h, v) and the slice keeps each; a dict would drop
        # one and break bit-parity
        if state.exists:
            hs, vs = state.get
            kept = set(zip(hs, vs))
        else:
            kept = set()
        for pdf in batches:
            sub = pdf[[key_col, value_col]].dropna()
            for kv, vv in zip(sub[key_col], sub[value_col]):
                kept.add((_h60(kv), float(vv)))
            if len(kept) > 4 * k:
                kept = set(sorted(kept)[:k])
        pairs = sorted(kept)[:k]
        if not pairs:
            return
        hs = [h for h, _ in pairs]
        vs = [v for _, v in pairs]
        state.update((hs, vs))
        yield pd.DataFrame(
            {
                group_col: [key[0]],
                "qs_hashes": [hs],
                "qs_values": [vs],
                "n_kept": [len(pairs)],
            }
        )

    return df.groupBy(group_col).applyInPandasWithState(
        _update,
        output_schema,
        state_schema,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def stream_calibration(
    df: DataFrame,
    label_col: str,
    score_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Streaming twin of ``operators.evaluation.calibration_report`` —
    the LIVE reliability table for a deployed probability-emitting
    model ("is the quality classifier still calibrated on today's
    traffic"). Like the Count-Min twin, no custom state: the batch
    plan is (in-row clamped bin id → groupBy(bin) count/decimal-sum
    aggregation → in-row rate projection), and per-bin additive
    counters are EXACTLY the class Spark's built-in streaming
    aggregation maintains — the batch operator's own plan is a legal
    streaming aggregation in update mode. Each update row is that
    bin's new running (n_units, avg_score, pos_rate, abs_gap); the
    latest update per bin equals the batch report over everything
    ingested so far bit-for-bit (integer counts + DECIMAL(18,6) score
    sums — no float accumulation, pinned by the parity test). State is
    one counter triple per bin, ≤ n_bins entries total whatever the
    stream length."""
    from intake_esm_spark.operators.evaluation import calibration_report

    return calibration_report(df, label_col, score_col, n_bins=n_bins)


def stream_srm(
    df: DataFrame,
    variant_col: str,
    expected_shares: list[tuple[str, float]],
) -> DataFrame:
    """Streaming twin of ``operators.experiment.srm_report``'s counter
    half — the LIVE sample-ratio-mismatch monitor (an assignment bug
    shows up in the traffic split within minutes; waiting for the batch
    readout wastes the experiment). Like the Count-Min and calibration
    twins, no custom state: per-variant counters are plain additive
    counts, exactly the class Spark's built-in streaming aggregation
    maintains in update mode. Unconfigured labels fold into ONE
    ``__unassigned`` counter pre-aggregation (so state stays bounded at
    len(shares)+1 rows even if a bug sprays garbage labels); each
    update row is that arm's new running ``(variant, n_obs)``.

    The chi-square readout needs the cross-variant total — a second
    aggregation over this one, which streaming update mode cannot
    legally express — so the twin emits the counters and the snapshot
    goes through :func:`~.operators.experiment.srm_from_counts`, the
    SAME code path the batch report tails into: latest-update-per-
    variant → srm_from_counts == batch srm_report bit-for-bit (integer
    counters, no rounding anywhere; pinned by the parity test)."""
    from pyspark.sql import functions as F

    from intake_esm_spark.operators.experiment import _validate_srm_shares

    _validate_srm_shares(expected_shares)
    labels = [lab for lab, _ in expected_shares]
    v = F.col(variant_col).cast("string")
    mapped = df.filter(F.col(variant_col).isNotNull()).select(
        F.when(v.isin(labels), v).otherwise(F.lit("__unassigned")).alias(
            "variant"
        )
    )
    return mapped.groupBy("variant").agg(F.count(F.lit(1)).alias("__c"))


def stream_psi(
    df: DataFrame,
    group_col: str,
    baseline: str,
    current: str,
    score_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Streaming twin of ``operators.evaluation.psi_report``'s counter
    half — the LIVE score-drift monitor (a feature pipeline regression
    shifts the scored population within one deploy window; PSI is the
    number on the dashboard that catches it). Like the SRM and
    calibration twins, no custom state: the shared ``_psi_bins``
    collapse is per-bin conditional ADDITIVE counters — exactly Spark's
    built-in streaming aggregation in update mode; each update row is
    that bin's new running ``(bin, __nb, __nc)``, state bounded at
    ``n_bins`` rows whatever the stream length.

    The PSI scalar needs cross-bin totals — a second aggregation over
    this one, illegal in streaming update mode — so the snapshot goes
    through :func:`~.operators.evaluation.psi_from_bins`, the SAME
    readout the batch report tails into: latest-update-per-bin →
    psi_from_bins == batch psi_report bit-for-bit (integer counters;
    pinned by the parity test)."""
    from intake_esm_spark.operators.evaluation import _psi_bins

    return _psi_bins(df, group_col, baseline, current, score_col, n_bins)


def stream_scoring_rules(
    df: DataFrame,
    label_col: str,
    score_col: str,
    eps: float = 1e-15,
) -> DataFrame:
    """Streaming twin #20 — ``operators.evaluation.
    scoring_rules_report`` as a LIVE training monitor (Brier/log-loss
    drifting upward on fresh traffic is the earliest "the classifier
    went stale" signal). Like the calibration twin, no custom state:
    the batch plan is ONE global aggregation of additive 12dp-decimal
    per-unit terms plus a count — exactly a legal streaming global
    aggregation in update mode (state: two decimal sums + one long).
    Each update row is the new running ``(n_units, brier, log_loss)``;
    the LAST update equals the batch report over everything ingested
    bit-for-bit (decimal term sums — no float accumulation; pinned by
    the parity test)."""
    from intake_esm_spark.operators.evaluation import scoring_rules_report

    return scoring_rules_report(df, label_col, score_col, eps=eps)


def stream_msprt(
    df: DataFrame,
    variant_col: str,
    converted_col: str,
    treatment: str,
    control: str,
    tau: float = 0.05,
    alpha: float = 0.05,
) -> DataFrame:
    """Streaming twin #21 — ``operators.experiment.msprt_report`` as a
    LIVE always-valid experiment monitor, and the one readout in the
    family that is DESIGNED to be watched continuously: the mixture-
    SPRT p-value is valid at every sample size simultaneously, so
    acting on the first significant update is statistically sound
    (this twin is the intended consumption mode; the batch report is
    the snapshot). Like the scoring-rules twin, no custom state: the
    batch plan is ONE global aggregation of four additive integer arm
    counters with an in-row closed-form projection on top — exactly a
    legal streaming global aggregation in update mode (state: four
    longs). Each update row is the new running report; the LAST update
    equals the batch report over everything ingested bit-for-bit
    (exact integer counters into fixed IEEE expressions; pinned by the
    parity test)."""
    from intake_esm_spark.operators.experiment import msprt_report

    return msprt_report(
        df, variant_col, converted_col, treatment, control,
        tau=tau, alpha=alpha,
    )


def stream_anova_moments(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Streaming twin #22 — ``operators.groupstats.anova_report``'s
    moment half as a LIVE k-arm monitor (per-source mean quality
    drifting apart across shards is a between-run regression signal;
    watching the F statistic move beats re-running the batch sweep).
    Like the PSI twin, no custom state: the batch plan's first half is
    ONE grouped aggregation of additive counters — a count, a 6dp
    DECIMAL(18,6) sum, and a DECIMAL(38,12) sum of squares — exactly
    Spark's built-in streaming aggregation in update mode; each update
    row is that group's new running ``(__g, __n, __s1, __s2)``, state
    bounded at k rows whatever the stream length.

    The F statistic needs cross-group totals — a second aggregation
    over this one, illegal in streaming update mode — so the snapshot
    goes through :func:`~.operators.groupstats.anova_from_moments`,
    the SAME readout the batch report tails into: latest-update-per-
    group → anova_from_moments == batch anova_report bit-for-bit
    (exact additive decimals, any micro-batch split; pinned by the
    parity test)."""
    from intake_esm_spark.operators.groupstats import _group_moments

    return _group_moments(df, group_col, value_col)


def stream_association_cells(
    df: DataFrame,
    a_col: str,
    b_col: str,
) -> DataFrame:
    """Streaming twin #23 — ``operators.groupstats.
    association_report``'s cell half as a LIVE dependence monitor (a
    routing bug that couples source to language, or a label leak
    coupling a metadata column to the target, shows up as NMI /
    Cramér's V moving on fresh traffic). Like the PSI and ANOVA twins,
    no custom state: the batch plan's first half is ONE grouped
    aggregation of additive integer cell counters — exactly Spark's
    built-in streaming aggregation in update mode; each update row is
    that (a, b) cell's new running count, state bounded by the
    categorical cross product.

    The MI/χ² scalars need cross-cell totals — a second aggregation,
    illegal in streaming update mode — so the snapshot goes through
    :func:`~.operators.groupstats.association_from_cells`, the SAME
    readout the batch report tails into: latest-update-per-cell →
    association_from_cells == batch association_report bit-for-bit
    (integer counters into identical quantized term sums; pinned by
    the parity test)."""
    from intake_esm_spark.operators.groupstats import _assoc_cells

    return _assoc_cells(df, a_col, b_col)


def stream_ratio_ab(
    df: DataFrame,
    group_col: str,
    num_col: str,
    den_col: str,
    treatment: str,
    control: str,
) -> DataFrame:
    """Streaming twin #24 — ``operators.experiment.ratio_ab_test`` as
    a LIVE ratio-metric monitor (revenue-per-session is the metric
    most experiments actually ship on, and its delta-method variance
    needs the within-unit numerator/denominator covariance — all
    twelve moments of which are ADDITIVE). Like the mSPRT twin, no
    custom state: the batch plan is ONE global aggregation of per-arm
    conditional exact-decimal moments with an in-row closed-form
    projection on top — a legal streaming global aggregation in update
    mode (state: two longs + ten decimals). Each update row is the new
    running report; the LAST update equals the batch report over
    everything ingested bit-for-bit (exact decimal moments into fixed
    IEEE expressions; pinned by the parity test)."""
    from intake_esm_spark.operators.experiment import ratio_ab_test

    return ratio_ab_test(
        df, group_col, num_col, den_col, treatment, control
    )


def stream_ols_moments(
    df: DataFrame,
    y_col: str,
    x_cols: list[str],
) -> DataFrame:
    """Streaming twin #25 — ``operators.regression.ols_report``'s
    moment pass as a LIVE regression monitor (the price~drivers slopes
    drifting on fresh traffic is a data-shift signal; watching the
    coefficients move beats re-running the batch fit).  Like the ANOVA
    and ratio twins, no custom state: the batch plan IS one global
    aggregation of ``(p+1)(p+2)/2`` ADDITIVE exact-decimal sums
    (counts, 6dp DECIMAL(18,6) first moments, DECIMAL(38,12) second
    moments) — a legal streaming global aggregation in update mode,
    state one bounded row.

    The solve needs the full moment row at once — driver arithmetic,
    not an aggregation — so the snapshot tails into the SAME
    :func:`~intake_esm_spark.operators.regression.
    ols_solve_from_moments` the batch report uses: last update row →
    ``ols_solve_from_moments`` == batch ``ols_report`` bit-for-bit
    (exact additive decimals, any micro-batch split; pinned by the
    parity test)."""
    from intake_esm_spark.operators.regression import ols_moment_frame

    return ols_moment_frame(df, y_col, x_cols)


def stream_wls_moments(
    df: DataFrame,
    y_col: str,
    x_cols: list[str],
    w_col: str,
) -> DataFrame:
    """Streaming twin #26 — ``operators.regression.wls_report``'s
    weighted moment pass as a LIVE heteroscedasticity-aware regression
    monitor (precision-weighted slopes drifting on fresh traffic — the
    WLS sibling of twin #25's OLS monitor).  No custom state: the
    batch plan IS one global aggregation of additive exact-decimal
    sums (row count, the 6dp DECIMAL(18,6) weight sum, the
    DECIMAL(38,12) weighted first/second moments) — a legal streaming
    global aggregation in update mode, state one bounded row.

    The solve needs the full moment row at once — driver arithmetic —
    so the snapshot tails into the SAME :func:`~intake_esm_spark.
    operators.regression.wls_solve_from_moments` the batch report
    uses: last update row → ``wls_solve_from_moments`` == batch
    ``wls_report`` bit-for-bit (exact additive decimals, any
    micro-batch split; pinned by the parity test)."""
    from intake_esm_spark.operators.regression import wls_moment_frame

    return wls_moment_frame(df, y_col, x_cols, w_col)


def stream_iv_moments(
    df: DataFrame,
    y_col: str,
    x_cols: list[str],
    z_cols: list[str],
) -> DataFrame:
    """Streaming twin #27 — ``operators.regression.iv2sls_report``'s
    widened (1, x, z, y) moment pass as a LIVE causal-effect monitor
    (the instrumented price-elasticity estimate drifting on fresh
    traffic).  No custom state: the batch plan IS one global
    aggregation of additive exact-decimal sums (the OLS moment grid
    widened with the Z'X / Z'Z cross-moments) — a legal streaming
    global aggregation in update mode, state one bounded row.

    The sandwich solve needs the full moment row at once — driver
    arithmetic — so the snapshot tails into the SAME
    :func:`~intake_esm_spark.operators.regression.
    iv_solve_from_moments` the batch report uses: last update row →
    ``iv_solve_from_moments`` == batch ``iv2sls_report`` bit-for-bit
    (exact additive decimals, any micro-batch split; pinned by the
    parity test)."""
    from intake_esm_spark.operators.regression import iv_moment_frame

    return iv_moment_frame(df, y_col, x_cols, z_cols)


def stream_binned_histogram(
    df: DataFrame,
    label_col: str,
    x_cols: list[str],
    ranges: dict,
    n_bins: int = 16,
) -> DataFrame:
    """Streaming twin #28 — ``operators.trees.histogram_split_report``'s
    binned-count pass as a LIVE GBDT-node monitor: the per-(feature,
    bin) label histogram refreshing on fresh traffic, with the best
    split re-derived from any snapshot via the SAME shared
    ``best_splits_from_hist`` the batch operator uses.  The bin
    boundaries are FIXED caller-supplied literals (a deployed
    monitor's contract — the batch operator derives them from a range
    pass; a stream cannot re-scan history, so the boundaries are
    pinned at deployment).  No custom state: the batch plan IS one
    grouped aggregation of additive integer counts over the bounded
    ``|features| × n_bins`` grid — a legal streaming aggregation in
    update mode; latest rows → ``_hist_rows_to_dict`` →
    ``best_splits_from_hist`` == the batch split over everything
    ingested, exactly (integer counts — no float caveat at all;
    pinned by the parity test)."""
    from intake_esm_spark.operators.trees import binned_histogram_frame

    frame = binned_histogram_frame(df, label_col, x_cols, ranges, n_bins)
    if frame is None:
        raise ValueError(
            "stream_binned_histogram: no binnable feature (every "
            "range is empty or constant)"
        )
    return frame
