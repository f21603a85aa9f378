"""Corpus-level text statistics for training-data pipelines.

These are the aggregate views a data curation loop reads before deciding
filters: the token vocabulary (is the corpus full of markup junk?), and
document-length distribution (where to cut truncation). Both are single
map-side-combined aggregations over in-row tokenization — no Python in
the hot path, no shuffle beyond the one the aggregation needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from intake_esm_spark.functions.text import words_array
from intake_esm_spark.operators.dedup import _spread


def vocab_topk(df: DataFrame, text_col: str = "text", k: int = 100) -> DataFrame:
    """Top-k most frequent normalized tokens: (token, n_docs-agnostic
    total frequency), ordered by frequency desc then token asc (a total
    order, so the k-boundary is deterministic and oracle-checkable).

    Plan: in-row normalize+split (zero shuffle), explode, ONE
    map-side-combined count aggregation, then a TakeOrderedAndProject —
    top-k never sorts the full vocabulary globally; each partition ships
    only its local top-k to the driver-side merge. At 100 TB the shuffle
    carries (token, partial_count) pairs only."""
    tokens = (
        _spread(df.select(text_col))
        .select(F.explode(words_array(F.col(text_col))).alias("token"))
        .filter(F.col("token") != "")
    )
    return (
        tokens.groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("token"))
        .limit(k)
    )


def length_histogram(
    df: DataFrame, text_col: str = "text", bin_width: int = 100
) -> DataFrame:
    """Document-length histogram: (bin_start, n_docs) with bins of
    ``bin_width`` characters — one aggregation, keyed by a derived bin
    column, map-side combined."""
    bin_start = (F.floor(F.length(F.col(text_col)) / bin_width) * bin_width).cast(
        "long"
    )
    return (
        df.select(bin_start.alias("bin_start"))
        .groupBy("bin_start")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
