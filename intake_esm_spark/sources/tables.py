"""Synthetic-table loader for the driver's TPC-H-ish parquet fixtures.

One wrinkle: ``events.parquet`` stores ``ts`` as parquet TIMESTAMP(NANOS),
which Spark's vectorized reader rejects (PARQUET_TYPE_ILLEGAL). We flip
``spark.sql.legacy.parquet.nanosAsLong`` and convert the raw nanosecond
longs to microsecond timestamps with integer division (``div`` — a double
round-trip would lose precision above 2^53 ns). DuckDB truncates ns->us the
same way, so oracle comparisons agree.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pyarrow.types as pat
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _nano_ts_columns(path: str) -> list[str]:
    schema = pq.read_schema(path)
    return [
        f.name
        for f in schema
        if pat.is_timestamp(f.type) and f.type.unit == "ns"
    ]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir}/{name}.parquet"
    # the caller's session may not be ours (the driver harness builds its
    # own): pin UTC so timestamp values agree with DuckDB's UTC-naive ones
    # regardless of host timezone
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ns_cols = _nano_ts_columns(path)
    if ns_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in ns_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def ns_ts_to_timestamp(df: DataFrame, col: str) -> DataFrame:
    """Convert a nanosecond-long timestamp column to a microsecond
    timestamp — a no-op when the column is already a timestamp. Test
    fixtures have carried ``ts`` both ways (TIMESTAMP(NANOS) read under
    ``nanosAsLong``, and plain TIMESTAMP(MICROS)); callers that re-read
    the raw parquet (e.g. streaming sources) use this instead of
    hard-coding the division."""
    from pyspark.sql.types import LongType

    if isinstance(df.schema[col].dataType, LongType):
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names or TABLES}


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    for n, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(n)
