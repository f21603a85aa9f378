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
