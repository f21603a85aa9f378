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


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str] | str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigating equi-join: spread each hot key of ``big`` across
    ``n_salts`` sub-partitions and replicate ``small`` once per salt,
    so one pathological key (the null-ish sentinel everyone joins on,
    the one whale customer) stops pinning an entire shuffle partition
    to a single straggler task. The classic manual remedy when AQE's
    runtime skew-split can't apply (it only splits SORT-merge
    partitions after materialization; a straggler inside an ongoing
    stage, or a shuffled-hash join, still wants pre-salting).

    SALTING IS EXECUTION-ONLY: the output rows are byte-identical to
    the plain join (the salt never reaches the output schema, and any
    big-row→salt assignment is valid), which is exactly what lets the
    DuckDB oracle replay the UNSALTED join. The salt here is
    ``spark_partition_id() mod n_salts`` — zero compute, deterministic
    within a run, and it spreads a hot key over as many salts as
    source partitions carry it.

    Cost model (why this is not the default): ``small`` is duplicated
    ``n_salts``× through the shuffle — worth it only when ``small`` is
    much smaller than the skewed side yet too big to broadcast. ``how``
    supports ``inner`` and ``left`` (the skewed-side-preserving
    outer); a right/full outer would multiply unmatched ``small`` rows
    per salt and is rejected."""
    if n_salts < 2:
        raise ValueError(f"n_salts must be >= 2, got {n_salts}")
    if how not in ("inner", "left"):
        raise ValueError(
            f"how must be 'inner' or 'left' (got {how!r}): outer sides "
            "on the replicated input would duplicate unmatched rows"
        )
    keys = [on] if isinstance(on, str) else list(on)
    clash = set(keys) & {"__salt"}
    if clash or "__salt" in big.columns or "__salt" in small.columns:
        raise ValueError("'__salt' column name is reserved")
    b = big.withColumn(
        "__salt", F.pmod(F.spark_partition_id(), F.lit(n_salts))
    )
    s = small.withColumn(
        "__salt",
        F.explode(F.expr(f"sequence(0, {int(n_salts) - 1})")),
    )
    out = b.join(s, keys + ["__salt"], how)
    return out.drop("__salt")
