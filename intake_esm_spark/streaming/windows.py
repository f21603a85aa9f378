"""Streaming window operators over an events stream.

The reference is batch-only (SURVEY.md §2.7); these are the Structured
Streaming extensions. Each helper works identically on a batch DataFrame
(for oracle checks) and a streaming DataFrame (``spark.readStream``) — the
transformations are the same Catalyst plan; only the sink differs.

Watermarks bound state: ``withWatermark(ts, horizon)`` lets late rows
older than the horizon be dropped and window state be evicted, which is
what keeps a forever-running aggregation at a fixed memory footprint on a
real cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _exact_sum(col: str):
    """Order-independent double sum (decimal accumulate): identical results
    across partitionings/engines — required for oracle parity and helpful
    for deterministic streaming re-runs. DECIMAL(32,6) per value: a
    narrower cast (18,6) turns any |value| >= 10^12 into NULL under
    non-ANSI mode and silently drops it from the sum."""
    return F.sum(F.expr(f"CAST({col} AS DECIMAL(32,6))")).cast("double")


def tumbling_counts(
    df: DataFrame,
    window_size: str = "10 minutes",
    ts_col: str = "ts",
    group_cols: list[str] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling-window count + sum(value) per event_type (or custom cols)."""
    group_cols = group_cols if group_cols is not None else ["event_type"]
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, window_size).alias("win"), *group_cols)
        .agg(F.count(F.lit(1)).alias("n_events"), _exact_sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *group_cols,
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    df: DataFrame,
    window_size: str = "10 minutes",
    slide: str = "5 minutes",
    ts_col: str = "ts",
    group_cols: list[str] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    group_cols = group_cols if group_cols is not None else ["event_type"]
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, window_size, slide).alias("win"), *group_cols)
        .agg(F.count(F.lit(1)).alias("n_events"), _exact_sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *group_cols,
            "n_events",
            "sum_value",
        )
    )


def session_windows(
    df: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
    watermark: str | None = None,
) -> DataFrame:
    """Session windows per key: events separated by <= gap coalesce into
    one session (built-in ``session_window``; in batch mode this matches
    the lag+cumsum sessionization oracle)."""
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("win"), key_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _exact_sum("value").alias("sum_value"),
        )
        .select(
            F.col(key_col),
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def dedup_within_watermark(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stateful streaming dedup: first occurrence of each key wins; state
    evicts past the watermark. Batch fallback picks the EARLIEST row per
    key (row_number over ts) — plain dropDuplicates keeps an arbitrary
    row, which would make batch-vs-streaming parity checks flaky."""
    if df.isStreaming:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(key_cols)
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(F.col(ts_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def session_stats(
    df: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap_minutes: float = 30.0,
) -> DataFrame:
    """One-row session summary over :func:`session_windows`: session and
    user counts, mean events per session, mean event-span minutes
    (``session_end`` includes the closing gap — subtracted back out so
    the span measures first-to-last EVENT), and the bounce rate
    (single-event sessions). The engagement-overview row next to the
    per-session frame.

    ``gap_minutes`` must restate ``gap`` numerically (the interval
    string feeds ``session_window``; the subtraction needs a number).
    Exactness: counts and epoch-micro spans are exact integers; the
    means are single divisions, 6dp-rounded. One aggregation over the
    session frame — the session groupBy's exchange is the only
    corpus-scale one."""
    sessions = session_windows(df, gap, ts_col, key_col)
    # spans accumulate as exact epoch-micro LONGS (a double sum would be
    # partition-order-dependent); the division happens once on the total
    span_us = F.unix_micros("session_end") - F.unix_micros("session_start")
    n = F.count(F.lit(1)).cast("double")
    return sessions.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.countDistinct(key_col).alias("n_users"),
        F.round(F.sum("n_events").cast("double") / n, 6).alias(
            "avg_events_per_session"
        ),
        F.round(
            F.sum(span_us).cast("double") / n / F.lit(60_000_000.0)
            - F.lit(gap_minutes),
            6,
        ).alias("avg_span_minutes"),
        F.round(
            F.sum((F.col("n_events") == 1).cast("bigint")).cast("double") / n,
            6,
        ).alias("bounce_rate"),
    )


def touch_pairs(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_type: str = "click",
    lookback: str = "24 hours",
    watermark: str = "1 hour",
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """(conversion, touch) pairs within the lookback window — the
    STREAM-STREAM interval self-join (the one streaming join class no
    other twin here exercises): conversions and touches are two
    filtered views of the same stream, watermarked on both sides, inner
    joined on the key with an event-time range condition. Spark buffers
    each side's state only up to ``watermark + lookback`` and then
    evicts — the condition is what makes an unbounded self-join run at
    fixed memory forever.

    This is exactly the join inside
    :func:`~intake_esm_spark.operators.eventlog.multi_touch_attribution`
    (minus the credit windows, which need the complete per-conversion
    group and belong to the batch/report side). On a batch frame the
    same plan runs un-watermarked — the parity oracle."""
    conv = events.filter(
        (F.col("event_type") == conversion_type)
        & F.col(key_col).isNotNull()
    ).select(
        F.col(key_col).alias("__k"),
        F.col(ts_col).alias("conversion_ts"),
        F.col(id_col).alias("conversion_id"),
    )
    touch = events.filter(
        (F.col("event_type") == touch_type) & F.col(key_col).isNotNull()
    ).select(
        F.col(key_col).alias("__k2"),
        F.col(ts_col).alias("touch_ts"),
        F.col(id_col).alias("touch_event_id"),
    )
    if events.isStreaming:
        conv = conv.withWatermark("conversion_ts", watermark)
        touch = touch.withWatermark("touch_ts", watermark)
    delta = F.expr(f"INTERVAL {lookback}")
    j = conv.join(
        touch,
        (F.col("__k") == F.col("__k2"))
        & (F.col("touch_ts") <= F.col("conversion_ts"))
        & (F.col("touch_ts") >= F.col("conversion_ts") - delta),
    )
    return j.select(
        "conversion_id",
        F.col("__k").alias(key_col),
        "touch_event_id",
        "touch_ts",
        "conversion_ts",
    )
