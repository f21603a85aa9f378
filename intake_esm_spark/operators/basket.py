"""Market-basket analysis: pairwise and triple association rules.

Extension (SURVEY §2.9): the co-occurrence mining family — "customers
who bought A also bought B" — as support / confidence / lift over item
PAIRS (the 2-itemset core of Apriori) and TRIPLES
(:func:`association_rules3`, the level-3 Apriori step: frequent pairs
extend by one frequent item, counted against the baskets, with
{x,y} → z rules per triple).

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


def association_rules3(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: float,
    max_basket_items: int = 1000,
) -> DataFrame:
    """Level-3 Apriori: frequent TRIPLES {a,b,c} and the three rules
    ``{x,y} → z`` each triple generates. ``support = tn/N`` (fraction of
    baskets holding all three), ``confidence = tn/pair_n(x,y)``,
    ``lift = confidence / (n_z/N)``. Same input contract and
    ``min_support`` semantics as :func:`association_rules`.

    Scale (the Apriori ladder, each rung pruned by the one below):
    items clear ``min_support`` BEFORE the quadratic pair join (Σ|b|²
    over frequent items only); basket-level pairs are then semi-joined
    against the FREQUENT-pair set (pair-monotonicity: a triple can only
    be frequent if every sub-pair is — the prune is lossless), so the
    cubic extension join runs frequent-pairs × frequent-items per
    basket, not |b|³; the candidate closure ((a,c) and (b,c) also
    frequent) prunes again before the count aggregate. Counts are exact
    distinct-basket integers, ratios fixed IEEE 6dp — the oracle can
    skip every prune and still match bit-for-bit because the prunes are
    support-monotone."""
    if not 0.0 < min_support <= 1.0:
        raise ValueError(f"min_support must be in (0, 1], got {min_support}")
    if max_basket_items < 3:
        raise ValueError(
            f"max_basket_items must be >= 3 for triples, got {max_basket_items}"
        )
    from pyspark.sql import Window

    bi = (
        df.filter(F.col(basket_col).isNotNull() & F.col(item_col).isNotNull())
        .select(F.col(basket_col).alias("__b"), F.col(item_col).alias("__i"))
        .distinct()
    )
    wb = Window.partitionBy("__b")
    bix = (
        bi.withColumn("__bs", F.count(F.lit(1)).over(wb))
        .filter(F.col("__bs") <= max_basket_items)
        .drop("__bs")
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
        .localCheckpoint(eager=False)
    )
    bif = bix.join(freq.select("__i"), "__i").localCheckpoint(eager=False)
    left = bif.select(F.col("__b"), F.col("__i").alias("__ia"))
    right = bif.select(F.col("__b").alias("__b2"), F.col("__i").alias("__ib"))
    # basket-grain pair occurrences — kept (not aggregated away) because
    # the triple extension joins against them
    bp = left.join(
        right,
        (F.col("__b") == F.col("__b2")) & (F.col("__ia") < F.col("__ib")),
    ).select("__b", "__ia", "__ib")
    pairs = bp.groupBy("__ia", "__ib").agg(F.count(F.lit(1)).alias("__pn"))
    freq_pairs = (
        pairs.crossJoin(F.broadcast(nb))
        .filter(
            F.col("__pn").cast("double")
            >= F.lit(min_support) * F.col("__nb").cast("double")
        )
        .select("__ia", "__ib", "__pn")
        # seeds the bp semi-filter, both closure prunes, and the
        # confidence lookups — pin it (multi-reference rule)
        .localCheckpoint(eager=False)
    )
    bpf = bp.join(F.broadcast(freq_pairs.select("__ia", "__ib")), ["__ia", "__ib"])
    ext = bif.select(F.col("__b"), F.col("__i").alias("__ic3"))
    tri_b = bpf.join(ext, "__b").filter(F.col("__ic3") > F.col("__ib"))
    # Apriori closure: (ia, c) and (ib, c) must be frequent pairs too —
    # lossless prune (support monotonicity) BEFORE the count shuffle
    tri_b = tri_b.join(
        F.broadcast(
            freq_pairs.select(
                F.col("__ia"), F.col("__ib").alias("__ic3")
            )
        ),
        ["__ia", "__ic3"],
    ).join(
        F.broadcast(
            freq_pairs.select(
                F.col("__ia").alias("__ib"), F.col("__ib").alias("__ic3")
            )
        ),
        ["__ib", "__ic3"],
    )
    triples = (
        tri_b.groupBy("__ia", "__ib", "__ic3")
        .agg(F.count(F.lit(1)).alias("__tn"))
        .crossJoin(F.broadcast(nb))
        .filter(
            F.col("__tn").cast("double")
            >= F.lit(min_support) * F.col("__nb").cast("double")
        )
        .select("__ia", "__ib", "__ic3", "__tn", "__nb")
        .localCheckpoint(eager=False)
    )
    # three rules per triple: consequent = each element, antecedents the
    # other two (already sorted since ia < ib < c)
    rules = (
        triples.select(
            F.col("__ib").alias("__a1"),
            F.col("__ic3").alias("__a2"),
            F.col("__ia").alias("__cq"),
            "__tn",
            "__nb",
        )
        .unionByName(
            triples.select(
                F.col("__ia").alias("__a1"),
                F.col("__ic3").alias("__a2"),
                F.col("__ib").alias("__cq"),
                "__tn",
                "__nb",
            )
        )
        .unionByName(
            triples.select(
                F.col("__ia").alias("__a1"),
                F.col("__ib").alias("__a2"),
                F.col("__ic3").alias("__cq"),
                "__tn",
                "__nb",
            )
        )
    )
    pair_n = freq_pairs.select(
        F.col("__ia").alias("__a1"),
        F.col("__ib").alias("__a2"),
        F.col("__pn"),
    )
    fz = freq.select(F.col("__i").alias("__cq"), F.col("__ic"))
    j = rules.join(F.broadcast(pair_n), ["__a1", "__a2"]).join(
        F.broadcast(fz), "__cq"
    )
    nbd = F.col("__nb").cast("double")
    tn = F.col("__tn").cast("double")
    support = tn / nbd
    confidence = tn / F.col("__pn").cast("double")
    lift = confidence / (F.col("__ic").cast("double") / nbd)
    return j.select(
        F.col("__a1").alias("antecedent_1"),
        F.col("__a2").alias("antecedent_2"),
        F.col("__cq").alias("consequent"),
        F.col("__tn").alias("triple_n"),
        F.round(support, 6).alias("support"),
        F.round(confidence, 6).alias("confidence"),
        F.round(lift, 6).alias("lift"),
    )
