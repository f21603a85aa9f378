"""Bucketed table sink — the co-located-join scale path.

At 100 TB the dominant cost of a repeated fact-fact join (orders ⋈
customer, lineitem ⋈ orders, dedup candidate ⋈ corpus) is re-shuffling
both sides on every query. Writing each table ONCE bucketed (and
optionally sorted) on the join key amortizes that shuffle into the write:

* join of two tables bucketed on the same key into the same bucket count
  → Catalyst plans a SortMergeJoin with NO Exchange on either side
  (sorted buckets additionally skip the per-task Sort);
* an equality filter on the bucket key prunes to a single bucket
  (``SelectedBucketsCount 1 out of N`` in the scan) — the bucketed
  analogue of partition pruning, without the small-files problem a
  high-cardinality partition column would cause.

Tables are written as EXTERNAL parquet tables (explicit ``path``), so the
data layout is plain parquet + Spark's bucket metadata; the in-memory
session catalog carries the bucket spec. On a cluster with a shared
metastore the same calls register permanent tables.

The reference engine (single-node polars/pandas) has no notion of
co-located storage — this module is part of the Spark-first scale layer
(SURVEY.md §4), not operator parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and optionally sorted) parquet table.

    ``sort_cols`` defaults to ``bucket_cols`` — sorted buckets let a
    same-key join skip its Sort as well as its Exchange. Pass ``[]`` to
    write unsorted buckets (Exchange elimination only, skipping the
    per-task sort cost).
    """
    writer = (
        df.write.format("parquet").mode(mode).bucketBy(num_buckets, *bucket_cols)
    )
    effective_sort = sort_cols if sort_cols is not None else bucket_cols
    if effective_sort:
        writer = writer.sortBy(*effective_sort)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def co_located_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str] | str,
    how: str = "inner",
) -> DataFrame:
    """Join two registered bucketed tables on their bucket key.

    Pure convenience — ``spark.table(a).join(spark.table(b), on)`` plans
    identically; this form just documents the intent. When both tables are
    bucketed on ``on`` with equal bucket counts, the plan contains no
    Exchange (verified in tests/test_bucketed.py).
    """
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
