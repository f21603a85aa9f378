"""Bucketed co-located joins: the write-once-shuffle-never scale path.

Asserts the PLANS, not just the values: a join of two tables bucketed on
the join key into equal bucket counts must contain no Exchange, and an
equality filter on the bucket key must prune to one bucket.
"""

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from intake_esm_spark.sources.bucketed import co_located_join, write_bucketed

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("bucketed")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    customer = spark.read.parquet(f"{SF}/customer.parquet")
    write_bucketed(
        orders, "orders_b", ["o_custkey"], 8, path=str(tmp / "orders_b")
    )
    write_bucketed(
        customer, "customer_b", ["c_custkey"], 8, path=str(tmp / "customer_b")
    )
    yield orders, customer
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")


def test_co_located_join_has_no_exchange(spark, bucketed_tables):
    orders, customer = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = co_located_join(
            spark,
            "orders_b",
            "customer_b",
            on=spark.table("orders_b").o_custkey
            == spark.table("customer_b").c_custkey,
        )
        plan = plan_of(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # same answer as the shuffled join on the raw parquet
        expect = orders.join(
            customer, orders.o_custkey == customer.c_custkey
        ).count()
        assert joined.count() == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucket_key_filter_prunes_buckets(spark, bucketed_tables):
    """Equality on the bucket key scans 1/8 of the files. Spark's
    autoBucketedScan turns bucketed reading OFF for scans where no
    operator needs the hash partitioning — which also forfeits bucket
    pruning — so a pruning-only workload disables it (on a cluster:
    spark.sql.sources.bucketing.autoBucketedScan.enabled=false)."""
    some_key = spark.table("orders_b").select("o_custkey").first()[0]
    conf = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    old = spark.conf.get(conf)
    spark.conf.set(conf, "false")
    try:
        plan = plan_of(
            spark.table("orders_b").filter(F.col("o_custkey") == some_key)
        )
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan
    finally:
        spark.conf.set(conf, old)


def test_sorted_buckets_skip_the_sort(spark, bucketed_tables):
    """Both sides written sortBy(bucket key): the sort-merge join reads
    pre-sorted buckets, so no Sort node feeds the join either."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("orders_b").join(
            spark.table("customer_b"),
            spark.table("orders_b").o_custkey
            == spark.table("customer_b").c_custkey,
        )
        plan = plan_of(joined)
        assert "SortMergeJoin" in plan and "Exchange" not in plan
        assert "Sort [" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_rank_null_placement_matches_window_order(spark):
    """NULL sort values rank FIRST under ascending and LAST under
    descending — the default null placement of the unpartitioned
    row_number windows the bucketed rank replaces (a bare F.least would
    silently drop nulls into the last value bucket, an arbitrary
    mid-order rank)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from intake_esm_spark.operators.ranks import global_rank

    rows = [(i, float(i)) for i in range(10)] + [(10, None), (11, None)]
    df = spark.createDataFrame(rows, "id int, v double")
    for desc in (False, True):
        order = [
            F.col("v").desc() if desc else F.col("v").asc(),
            F.col("id").asc(),
        ]
        expect = {
            r["id"]: r["rn"]
            for r in df.withColumn(
                "rn", F.row_number().over(Window.orderBy(*order))
            ).collect()
        }
        got = {
            r["id"]: r["__rank"]
            for r in global_rank(df, "v", ["id"], descending=desc).collect()
        }
        assert got == expect, (desc, got, expect)
