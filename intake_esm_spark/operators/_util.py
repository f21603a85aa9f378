"""Shared execution-shape helpers used across operator modules.

``_spread`` started as a private helper of ``dedup`` (r14's systemic
single-file-scan fix) and was imported from there by eight other
modules; promoted here (ADVICE r15) so generic partitioning utilities
do not couple unrelated operators to the dedup module.  ``dedup``
re-exports it for compatibility.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_WIDTH_MEMO: dict[tuple[str, int], int] = {}
"""Per-application memo of the ``.rdd.getNumPartitions()`` width probe,
keyed by (applicationId, analyzed-plan semanticHash).  EXECUTION
metadata only — never results: the same analyzed plan in the same
session always plans the same initial partition count, and iterative
fits rebuild semantically identical frames every pass (ADVICE r15: the
ADF moment passes re-paid a full driver-side physical-planning
conversion per pass on their lagged-join frame just to re-learn its
width).  A session that changes ``spark.sql.shuffle.partitions``
mid-flight could read a stale width — that only shapes execution, never
values, and no code path here does so."""


def _pin_partitioned(df: DataFrame, key: str) -> DataFrame:
    """EAGER ``localCheckpoint`` of a loop-invariant frame, hash-
    partitioned by ``key`` at the session's shuffle partition count, with
    AQE disabled around the materialization (r15, guide §3.1).

    Why the AQE toggle: Spark 4.1.2's ``localCheckpoint`` materializes an
    ``AdaptiveSparkPlan`` as ``LogicalRDD ... UnknownPartitioning(0)`` —
    the r14 probe's dead end — so every downstream join re-exchanges the
    invariant side each iteration.  With AQE off for just this
    materialization the checkpointed plan keeps
    ``hashpartitioning(key, N)``, and every loop join keyed on ``key``
    skips the invariant side's exchange (N = shuffle partitions = the
    join's required count, at any scale).  Partitioning is
    execution-only; values are unchanged.

    Eager by necessity: the partitioning must be captured from the
    EXECUTED plan.  Streaming frames are returned untouched (checkpoints
    and width probes are batch APIs; a streaming caller keeps its own
    per-microbatch shape)."""
    if df.isStreaming:
        return df
    spark = df.sparkSession
    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        from pyspark.sql import functions as F

        return df.repartition(n, F.col(key)).localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


def _spread(df: DataFrame) -> DataFrame:
    """Ensure row-inflating kernels use every core: a single parquet file
    with one row group arrives as ONE partition, serializing the whole
    per-row pipeline. One narrow round-robin shuffle buys full
    parallelism; on a many-file 100 TB table the partition count is
    already >= cores and this is a no-op.

    Two-step width probe: ``df.inputFiles()`` first — a driver-side file
    listing (already cached by the scan relation) that settles the common
    case (a many-file table is always wide) without touching ``.rdd``.
    Only when the file count is below target does it fall back to the
    precise ``df.rdd.getNumPartitions()`` (which pays a driver-side
    physical-planning conversion — memoized per analyzed plan above, so
    per-pass rebuilders pay it once): files UNDER-count partitions when
    one large file splits against ``maxPartitionBytes`` (a 10×1 TB table
    is ~80k partitions, not 10 — repartitioning it would be a
    full-corpus exchange), and a non-file source reports zero files
    regardless of its real width.

    Streaming frames pass through untouched (r14): the width probes are
    batch-only APIs, and the shared moment builders (OLS/WLS twins
    #25/#26) call this on both batch and streaming inputs — a streaming
    source's parallelism is the reader's concern, not ours."""
    if df.isStreaming:
        return df
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if len(df.inputFiles()) >= target:
        return df
    key = None
    try:
        key = (spark.sparkContext.applicationId, df.semanticHash())
    except Exception:  # noqa: BLE001 — probe memo is best-effort
        key = None
    n = _WIDTH_MEMO.get(key) if key is not None else None
    if n is None:
        n = df.rdd.getNumPartitions()
        if key is not None:
            _WIDTH_MEMO[key] = n
    if n >= target:
        return df
    return df.repartition(target)
