"""Market-basket analysis: pairwise association rules.

Extension (SURVEY §2.9): the co-occurrence mining family — "customers
who bought A also bought B" — as support / confidence / lift over item
PAIRS (the 2-itemset core of Apriori; higher-order itemsets compose by
re-running over pair-merged items, but pairs are what product surfaces
actually consume).

Scale shape: the only quadratic step is the within-basket self-join,
whose output is Σ_b |b|² — bounded by the BASKET SIZE distribution, not
the corpus, and guarded twice: mega-baskets beyond
``max_basket_items`` are dropped up front (a single boilerplate basket
of 10⁴ items would emit 5·10⁷ pairs; real baskets are small), and the
Apriori prefilter removes infrequent ITEMS before the join (an item
must appear at least as often as any pair containing it — pruning
before the quadratic step, not after). Everything else is
partial-aggregated groupBys and item-keyed joins AQE can broadcast.

Determinism: counts are exact integers over distinct (basket, item)
pairs; support/confidence/lift are fixed IEEE expressions over them,
6dp-rounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: float,
    max_basket_items: int = 1000,
) -> DataFrame:
    """Directional pair rules ``antecedent → consequent`` with
    ``support = pn/N`` (fraction of baskets holding both),
    ``confidence = pn/n_antecedent`` and
    ``lift = confidence / (n_consequent/N)``; both directions of every
    pair that clears ``min_support`` are emitted (their supports are
    equal, confidences are not). Duplicate items within a basket count
    once (distinct first); null baskets/items are excluded.

    ``min_support`` is a fraction of the (post-guard) basket count and
    is applied to items (Apriori prefilter) AND to pairs."""
    if not 0.0 < min_support <= 1.0:
        raise ValueError(f"min_support must be in (0, 1], got {min_support}")
    if max_basket_items < 2:
        raise ValueError(
            f"max_basket_items must be >= 2, got {max_basket_items}"
        )
    from pyspark.sql import Window

    bi = (
        df.filter(F.col(basket_col).isNotNull() & F.col(item_col).isNotNull())
        .select(F.col(basket_col).alias("__b"), F.col(item_col).alias("__i"))
        .distinct()
    )
    # mega-basket guard as a count WINDOW on the basket key (not a
    # sizes-aggregate join, which would cost an extra exchange of the
    # whole frame): one basket-keyed exchange that the within-basket
    # self-join below then REUSES — a mega basket is one partition of at
    # most |b| rows, trivial next to the corpus
    wb = Window.partitionBy("__b")
    bix = (
        bi.withColumn("__bs", F.count(F.lit(1)).over(wb))
        .filter(F.col("__bs") <= max_basket_items)
        .drop("__bs")
        # pin: bix feeds nb, icnt, AND both self-join sides — unpinned,
        # each reference re-runs the distinct+window (the multi-reference
        # re-planning pitfall)
        .localCheckpoint(eager=False)
    )
    nb = bix.agg(F.countDistinct("__b").alias("__nb"))
    icnt = bix.groupBy("__i").agg(F.count(F.lit(1)).alias("__ic"))
    freq = (
        icnt.crossJoin(F.broadcast(nb))
        .filter(
            F.col("__ic").cast("double")
            >= F.lit(min_support) * F.col("__nb").cast("double")
        )
        .select("__i", "__ic")
        # frequency table is item-cardinality-sized; it seeds three
        # joins below — pin it too
        .localCheckpoint(eager=False)
    )
    bif = bix.join(freq.select("__i"), "__i")
    left = bif.select(F.col("__b"), F.col("__i").alias("__ia"))
    right = bif.select(F.col("__b").alias("__b2"), F.col("__i").alias("__ib"))
    pairs = (
        left.join(
            right,
            (F.col("__b") == F.col("__b2")) & (F.col("__ia") < F.col("__ib")),
        )
        .groupBy("__ia", "__ib")
        .agg(F.count(F.lit(1)).alias("__pn"))
    )
    directional = pairs.select(
        F.col("__ia").alias("antecedent"),
        F.col("__ib").alias("consequent"),
        "__pn",
    ).unionByName(
        pairs.select(
            F.col("__ib").alias("antecedent"),
            F.col("__ia").alias("consequent"),
            "__pn",
        )
    )
    fa = freq.select(
        F.col("__i").alias("antecedent"), F.col("__ic").alias("__na")
    )
    fb = freq.select(
        F.col("__i").alias("consequent"), F.col("__ic").alias("__nc")
    )
    j = (
        directional.join(fa, "antecedent")
        .join(fb, "consequent")
        .crossJoin(F.broadcast(nb))
    )
    nbd = F.col("__nb").cast("double")
    pn = F.col("__pn").cast("double")
    support = pn / nbd
    confidence = pn / F.col("__na").cast("double")
    lift = confidence / (F.col("__nc").cast("double") / nbd)
    return j.filter(
        pn >= F.lit(min_support) * nbd
    ).select(
        "antecedent",
        "consequent",
        F.col("__pn").alias("pair_n"),
        F.round(support, 6).alias("support"),
        F.round(confidence, 6).alias("confidence"),
        F.round(lift, 6).alias("lift"),
    )
