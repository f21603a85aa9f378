"""Customer/product segmentation: RFM scoring and ABC (Pareto) classes.

Extension (SURVEY §2.9): the two segmentation reports every commerce
warehouse ships — RFM (recency / frequency / monetary quintiles per
customer) and ABC analysis (rank items by revenue, class A = the head
that carries 80% of it). Both reduce the corpus to an entity-grain
aggregate first, so every window below runs over entity-cardinality
frames (the benign class), never raw events.

Determinism: quintiles use ``ntile`` over a TOTAL order (metric +
entity-id tiebreak — both engines split remainder rows into the
earliest buckets identically); money accumulates as DECIMAL(18,6);
cumulative shares divide exact decimals in double at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rfm_segments(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    n_tiles: int = 5,
) -> DataFrame:
    """Per entity: recency (days since last activity, vs the corpus max
    timestamp — a deterministic anchor), frequency (event count),
    monetary (decimal value total), each scored 1..``n_tiles`` by
    ``ntile`` (higher = better: most recent / most frequent / highest
    spend), plus the concatenated segment code ("555" = best).

    Scale: one entity-keyed aggregate (map-side partial) collapses the
    corpus; the three ntile windows are unpartitioned BUT run over the
    entity-cardinality aggregate with a total order each — at extreme
    entity counts swap ntile for a percent_rank bucketing over the same
    order (identical classes away from boundaries)."""
    if n_tiles < 2:
        raise ValueError(f"n_tiles must be >= 2, got {n_tiles}")
    # pinned: the per-user collapse feeds BOTH the anchor aggregate and
    # the scored frame — unpinned, the anchor re-runs the corpus groupBy
    # from the scan (the repo's multi-reference re-planning rule)
    per_user = (
        events.filter(F.col(key_col).isNotNull())
        .groupBy(key_col)
        .agg(
            F.max(ts_col).alias("__last"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.col(value_col).cast("decimal(18,6)")).alias("__m"),
        )
        .localCheckpoint(eager=False)
    )
    anchor = per_user.agg(F.max("__last").alias("__anchor"))
    base = per_user.crossJoin(F.broadcast(anchor)).select(
        F.col(key_col),
        F.datediff(F.to_date("__anchor"), F.to_date("__last")).alias(
            "recency_days"
        ),
        "frequency",
        F.round(F.coalesce(F.col("__m").cast("double"), F.lit(0.0)), 6).alias(
            "monetary"
        ),
    )
    # higher score = better: recency orders ASC (0 days ago = tile n),
    # frequency/monetary DESC — ntile fills earliest buckets first, so
    # invert via (n_tiles + 1 - tile) on ASC orders instead where needed
    wr = Window.orderBy(F.col("recency_days").asc(), F.col(key_col).asc())
    wf = Window.orderBy(F.col("frequency").desc(), F.col(key_col).asc())
    wm = Window.orderBy(F.col("monetary").desc(), F.col(key_col).asc())
    nt = n_tiles
    r = (F.lit(nt + 1) - F.ntile(nt).over(wr)).alias("r_score")
    f_ = (F.lit(nt + 1) - F.ntile(nt).over(wf)).alias("f_score")
    m = (F.lit(nt + 1) - F.ntile(nt).over(wm)).alias("m_score")
    out = base.select(key_col, "recency_days", "frequency", "monetary", r, f_, m)
    return out.withColumn(
        "segment",
        F.concat(
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ),
    )


def abc_classification(
    df: DataFrame,
    key_col: str,
    value_col: str,
    a_cut: float = 0.8,
    b_cut: float = 0.95,
) -> DataFrame:
    """ABC / Pareto analysis: rank keys by their decimal value total
    descending, cumulative revenue share, class ``A`` while the
    cumulative share is ≤ ``a_cut``, ``B`` ≤ ``b_cut``, else ``C`` —
    "which 20% of parts carry 80% of revenue".

    Scale: one keyed aggregate collapses the corpus to key grain; the
    cumulative window is unpartitioned but key-cardinality, totally
    ordered by (total desc, key asc); the grand total broadcasts as one
    row. Cumulative sums stay DECIMAL until the final double divide."""
    if not 0.0 < a_cut < b_cut <= 1.0:
        raise ValueError(f"need 0 < a_cut < b_cut <= 1, got ({a_cut}, {b_cut})")
    # pinned: the key collapse feeds the grand total AND the ranked
    # frame (multi-reference rule — unpinned, the total re-scans)
    per_key = (
        df.filter(F.col(key_col).isNotNull())
        .groupBy(key_col)
        .agg(
            F.sum(F.col(value_col).cast("decimal(18,6)"))
            .cast("decimal(18,6)")
            .alias("__t")
        )
        .localCheckpoint(eager=False)
    )
    total = per_key.agg(
        F.sum("__t").cast("decimal(18,6)").alias("__tot")
    )
    w = (
        Window.orderBy(F.col("__t").desc(), F.col(key_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum("__t").over(w).cast("decimal(18,6)")
    j = per_key.crossJoin(F.broadcast(total))
    share = cum.cast("double") / F.col("__tot").cast("double")
    return j.select(
        key_col,
        F.round(F.col("__t").cast("double"), 6).alias("value_total"),
        F.round(share, 6).alias("cum_share"),
        F.when(F.round(share, 6) <= a_cut, "A")
        .when(F.round(share, 6) <= b_cut, "B")
        .otherwise("C")
        .alias("abc_class"),
    )
