"""Item-to-item co-occurrence recommendations ("also bought").

Extension (SURVEY §2.9): the classic neighborhood recommender — cosine
similarity between items over the baskets that contain them, top-k
neighbors per item. Complements :mod:`basket` (directional rules with
support/confidence/lift) with the symmetric similarity ranking a
retrieval or "related items" surface actually serves.

Scale shape: identical to the basket family — the only quadratic step
is the within-basket self-join (Σ_b |b|² output, bounded by basket
size, mega-baskets dropped up front by a count window that REUSES the
basket-keyed exchange), followed by pair- and item-keyed partial
aggregates. The top-k pick is a row_number window partitioned by item
over the pair-cardinality frame. Nothing is ever item×item dense.

Determinism: co-occurrence and item counts are exact integers;
``cosine = c_ij / sqrt(c_i · c_j)`` is a fixed IEEE expression over
them (sqrt is correctly rounded by both engines), 6dp-rounded; the
top-k ties break on the neighbor id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def also_bought(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    top_k: int = 5,
    min_pair_count: int = 2,
    max_basket_items: int = 1000,
) -> DataFrame:
    """Top-``top_k`` co-occurrence neighbors per item, ranked by cosine
    similarity (descending, neighbor id ascending on ties). Duplicate
    items within a basket count once; null baskets/items are excluded;
    pairs seen in fewer than ``min_pair_count`` baskets are dropped
    (noise floor AND join-output bound). Both directions of every
    surviving pair are emitted. Returns
    ``(item, neighbor, n_both, cosine, rank)``."""
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    if min_pair_count < 1:
        raise ValueError(f"min_pair_count must be >= 1, got {min_pair_count}")
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
    wb = Window.partitionBy("__b")
    bix = (
        bi.withColumn("__bs", F.count(F.lit(1)).over(wb))
        .filter(F.col("__bs") <= max_basket_items)
        .drop("__bs")
        # feeds the item counts AND both self-join sides
        .localCheckpoint(eager=False)
    )
    # referenced twice below (both sides of the score join) — pinned so
    # the corpus-scale count runs once
    icnt = (
        bix.groupBy("__i")
        .agg(F.count(F.lit(1)).alias("__ic"))
        .localCheckpoint(eager=False)
    )
    left = bix.select(F.col("__b"), F.col("__i").alias("__ia"))
    right = bix.select(F.col("__b"), F.col("__i").alias("__ib"))
    pairs = (
        left.join(right, "__b")
        .filter(F.col("__ia") < F.col("__ib"))
        .groupBy("__ia", "__ib")
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= min_pair_count)
    )
    sym = pairs.unionAll(
        pairs.select(
            F.col("__ib").alias("__ia"),
            F.col("__ia").alias("__ib"),
            "n_both",
        )
    )
    # item counts are item-cardinality — small for catalogs, but not
    # guaranteed broadcastable at 100 TB (1e7+ items); leave the join
    # strategy to AQE, which broadcasts when the stat is actually small
    scored = (
        sym.join(
            icnt.select(F.col("__i").alias("__ia"), F.col("__ic").alias("__ca")),
            "__ia",
        )
        .join(
            icnt.select(F.col("__i").alias("__ib"), F.col("__ic").alias("__cb")),
            "__ib",
        )
        .select(
            F.col("__ia").alias("item"),
            F.col("__ib").alias("neighbor"),
            "n_both",
            F.round(
                F.col("n_both").cast("double")
                / F.sqrt(
                    F.col("__ca").cast("double") * F.col("__cb").cast("double")
                ),
                6,
            ).alias("cosine"),
        )
    )
    pick = Window.partitionBy("item").orderBy(
        F.col("cosine").desc(), F.col("neighbor").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(pick))
        .filter(F.col("rank") <= top_k)
    )
