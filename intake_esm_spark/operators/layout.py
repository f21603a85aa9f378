"""Data-layout optimization: Z-order (Morton) interleaved sort keys.

Extension (SURVEY §2.9): at 100 TB the cheapest query is the one whose
files you never open — and file skipping on MULTIPLE columns needs a
clustered layout, not a lexicographic sort (sorting by (a, b) gives
perfect min/max pruning on ``a`` and none on ``b``). Z-ordering (the
technique behind Delta's ``OPTIMIZE ZORDER BY`` and ClickHouse/Hudi
space-filling-curve layouts) interleaves the BITS of the dimensions so
rows close in the key are close in every dimension: writing
``df.repartitionByRange(F.col("zkey")).write...`` yields parquet files
whose per-column min/max ranges are tight on ALL z-ordered columns at
once, and Spark's scan-level min/max + partition pruning does the rest.

Engine-exactness: dimensions are rank-free integer min-max buckets —
``u = (x − min) · 2^bits ÷ (max − min + 1)`` in pure BIGINT arithmetic
(no doubles, no ntile sort) — and the interleave is a fixed fold of
``shiftleft``/bit-or literals, so the key is a deterministic row
function any engine replays bit-for-bit.

Scale: the key itself is zero-shuffle in-row compute; the only
corpus-touching cost is the 1-row min/max aggregate (broadcast back)
and whatever range-partitioned write the caller performs with the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.column import Column


def _interleave(cols: list[Column], bits: int) -> Column:
    """Morton-interleave ``len(cols)`` already-bucketed non-negative ints
    of ``bits`` bits each: bit ``i`` of column ``j`` lands at position
    ``i·n + j``. A fixed fold over literal positions — pure codegen."""
    n = len(cols)
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    out_col: str = "zkey",
) -> DataFrame:
    """Append the Z-order key of the given INTEGER columns as
    ``out_col`` (bigint). ``bits`` per dimension; ``len(cols) · bits``
    must fit 63 bits. Null dimension values bucket to 0 (they cluster
    together at the curve's origin — documented, not dropped, so the
    write keeps every row).

    Bucketing is integer min-max: ``(x − min) · 2^bits ÷ (max − min + 1)``
    — exact BIGINT arithmetic, one 1-row min/max aggregate broadcast
    back. Constant columns bucket to 0 (the divisor's ``+1`` guards the
    zero range). For doubles, quantize upstream (cents, micros) — rank
    bucketing would need a corpus sort, the thing this avoids."""
    if not cols or len(cols) < 2:
        raise ValueError("zorder_key needs at least 2 columns")
    if bits < 1 or len(cols) * bits > 63:
        raise ValueError(
            f"len(cols)*bits must be in [2, 63], got {len(cols)}*{bits}"
        )
    aggs = []
    for c in cols:
        aggs.append(F.min(c).cast("bigint").alias(f"__min_{c}"))
        aggs.append(F.max(c).cast("bigint").alias(f"__max_{c}"))
    ranges = df.agg(*aggs)
    j = df.crossJoin(F.broadcast(ranges))
    scale = F.lit(2**bits).cast("bigint")
    # materialize numerator/width, then BIGINT `div` (true integer
    # division — DataFrame `/` is double division, which drifts at the
    # bit level for wide ranges). Caller contract: range · 2^bits < 2^63.
    tmp = j
    for c in cols:
        lo = F.col(f"__min_{c}")
        width = F.col(f"__max_{c}") - lo + F.lit(1)
        tmp = tmp.withColumn(
            f"__num_{c}", (F.col(c).cast("bigint") - lo) * scale
        ).withColumn(f"__wid_{c}", width.cast("bigint"))
    bucketed = [
        F.least(
            F.coalesce(
                F.expr(f"__num_{c} div __wid_{c}"), F.lit(0).cast("bigint")
            ),
            scale - F.lit(1),
        )
        for c in cols
    ]
    return tmp.select(*df.columns, _interleave(bucketed, bits).alias(out_col))
