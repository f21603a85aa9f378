"""Customer/product segmentation: RFM scoring and ABC (Pareto) classes.

Extension (SURVEY §2.9): the two segmentation reports every commerce
warehouse ships — RFM (recency / frequency / monetary quintiles per
customer) and ABC analysis (rank items by revenue, class A = the head
that carries 80% of it). Both reduce the corpus to an entity-grain
aggregate first; ranks and cumulative shares over that frame then come
from the bucketed prefix sum (``operators.ranks``), NOT from an
unpartitioned total-order window — at billions of entities the latter
is a one-task global sort (the round-10 rewrite of the r8 shape).

Determinism: quintiles follow the SQL ``ntile`` remainder rule exactly
(``ranks.ntile_from_rank`` over the exact global rank, metric +
entity-id tiebreak — both engines split remainder rows into the
earliest buckets identically); money accumulates as DECIMAL(18,6);
cumulative shares divide exact decimals in double at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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
    ``ntile`` semantics (higher = better: most recent / most frequent /
    highest spend), plus the concatenated segment code ("555" = best).

    Scale: one entity-keyed aggregate (map-side partial) collapses the
    corpus; each of the three tiles is then EXACT rank arithmetic over
    the bucketed prefix sum (:func:`~.ranks.global_rank` +
    :func:`~.ranks.ntile_from_rank` — per-bucket windows, broadcast
    ≤64-row offsets, identical remainder splits to the SQL ``ntile``),
    so the r8 unpartitioned entity-frame ntile windows are GONE: at
    billions of entities nothing sorts in one task.  Ranks run with
    heavy-value fan-out (round 11): frequency/monetary are exactly the
    frames where a MODAL value is the norm (half of all customers can
    share order-count 1), and value-only bucketing would put that
    entire tied run back into one window task — heavy values
    sub-bucket by the entity-id tiebreak instead.  All THREE metrics'
    heavy-value tables come from ONE exploded rollup + TakeOrdered job
    (:func:`~.ranks.probe_heavy_values`, round 12 — the r11 form ran a
    probe per pass, tripling the entity-frame passes; the verdict's
    only >2× bench move) and feed each rank pass as ``heavy=``
    literals.  Each rank pass is lineage-pinned so the next pass reads
    the materialized frame instead of replaying the prior rank
    stages."""
    if n_tiles < 2:
        raise ValueError(f"n_tiles must be >= 2, got {n_tiles}")
    from .ranks import global_rank, ntile_from_rank, probe_heavy_values
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
    # ONE aggregate carries the anchor, the entity count AND a
    # conservative span for every ranked metric — the three rank passes
    # then bucket off these broadcast bounds instead of each paying its
    # own full-frame span aggregate (3 entity-frame passes saved; the
    # monetary span is widened to include the null→0 coalesce)
    anchor = per_user.agg(
        F.max("__last").alias("__anchor"),
        F.min("__last").alias("__first"),
        F.count(F.lit(1)).alias("__ne"),
        F.min("frequency").alias("__lo_f"),
        F.max("frequency").alias("__hi_f"),
        F.least(F.min("__m").cast("double"), F.lit(0.0)).alias("__lo_m"),
        F.greatest(F.max("__m").cast("double"), F.lit(0.0)).alias("__hi_m"),
    )
    base = (
        per_user.crossJoin(F.broadcast(anchor))
        .select(
            F.col(key_col),
            F.datediff(F.to_date("__anchor"), F.to_date("__last")).alias(
                "recency_days"
            ),
            "frequency",
            F.round(
                F.coalesce(F.col("__m").cast("double"), F.lit(0.0)), 6
            ).alias("monetary"),
            "__ne",
            F.lit(0.0).alias("__lo_r"),
            F.datediff(F.to_date("__anchor"), F.to_date("__first"))
            .cast("double")
            .alias("__hi_r"),
            "__lo_f",
            "__hi_f",
            "__lo_m",
            "__hi_m",
        )
        # pinned: three rank passes re-reference this frame — unpinned,
        # each re-plans the join
        .localCheckpoint(eager=False)
    )
    # higher score = better: recency ranks ASC (0 days ago = tile n),
    # frequency/monetary DESC — tiles fill earliest buckets first, so
    # invert via (n_tiles + 1 - tile) on the ASC order where needed
    nt = n_tiles
    scored = base
    passes = [
        ("__rr", "recency_days", False, "r_score", ("__lo_r", "__hi_r")),
        ("__rf", "frequency", True, "f_score", ("__lo_f", "__hi_f")),
        ("__rm", "monetary", True, "m_score", ("__lo_m", "__hi_m")),
    ]
    # ONE probe job for all three metrics (all int/6dp-double — exactly
    # double-representable, the probe_heavy_values contract)
    heavy = probe_heavy_values(
        base, [(val, val, key_col) for _, val, _, _, _ in passes]
    )
    for i, (rank_col, val, ties_desc, score, bnds) in enumerate(passes):
        scored = global_rank(
            scored,
            val,
            [key_col],
            descending=ties_desc,
            out_col=rank_col,
            bounds=bnds,
            heavy=heavy[val],
        ).withColumn(
            score,
            F.lit(nt + 1)
            - ntile_from_rank(F.col(rank_col), F.col("__ne"), nt),
        ).drop(rank_col)
        if i < len(passes) - 1:
            # pin BETWEEN passes only: the next pass's bucketed cumsum
            # multi-references this frame (window stage + bucket-totals
            # aggregate + join-back — unpinned, each replays the prior
            # rank stages); the last pass stays unpinned so the
            # bucketed-window plan remains visible end-to-end
            scored = scored.localCheckpoint(eager=False)
    return scored.select(
        key_col,
        "recency_days",
        "frequency",
        "monetary",
        "r_score",
        "f_score",
        "m_score",
        F.concat(
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ).alias("segment"),
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
    cumulative sum is the bucketed prefix sum over the total order
    (value desc, key asc) — :func:`~.ranks.bucketed_cumsum` with the
    key as tiebreak, so every boundary row gets the same exact
    cumulative as the r8 unpartitioned window it replaces, with no
    single-task key-frame sort; the grand total broadcasts as one row.
    ``tie_fanout`` (round 11) sub-buckets heavy tied revenue totals by
    the key so a modal value (thousands of keys carrying one
    identically-priced order each) cannot collapse into one window
    task.  Cumulative sums stay DECIMAL until the final double
    divide."""
    if not 0.0 < a_cut < b_cut <= 1.0:
        raise ValueError(f"need 0 < a_cut < b_cut <= 1, got ({a_cut}, {b_cut})")
    from .ranks import bucketed_cumsum

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
    cummed = bucketed_cumsum(
        per_key.crossJoin(F.broadcast(total)),
        ["__t"],
        val_col="__t",
        tiebreaks=[key_col],
        descending=True,
        tie_fanout=True,
    )
    cum = F.col("__cum___t").cast("decimal(18,6)")
    share = cum.cast("double") / F.col("__tot").cast("double")
    return cummed.select(
        key_col,
        F.round(F.col("__t").cast("double"), 6).alias("value_total"),
        F.round(share, 6).alias("cum_share"),
        F.when(F.round(share, 6) <= a_cut, "A")
        .when(F.round(share, 6) <= b_cut, "B")
        .otherwise("C")
        .alias("abc_class"),
    )
