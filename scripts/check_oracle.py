"""Local replica of the driver's t2 correctness gate.

Runs every ``queries()`` entry at sf0.01 on Spark AND its ``oracle_sql()``
on DuckDB (tables pre-registered as views, like the driver), then compares:
row count, column names, and an order-insensitive value hash (columns
sorted by name, rows sorted, values canonicalized). Exact float equality —
if this passes, any reasonable hash the driver uses passes too.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

import __spark_entry__ as entrymod
from intake_esm_spark.session import get_spark


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).astype("datetime64[us]").astype(str)
        elif s.dtype == object:
            df[c] = s.map(lambda v: repr(v))
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.map(lambda v: repr(float(v)) if pd.notna(v) else "NaN")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64").astype(str)
        else:
            df[c] = s.astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    # Driver-canon probe (r7 failure mode): the DRIVER hashes raw result
    # rows into a set, so a list/dict-valued cell raises `unhashable
    # type` there even when our column-sorted tuple compare below
    # passes. Replicate that canon so local green implies driver green.
    for side, pdf in (("spark", spark_pdf), ("duck", duck_pdf)):
        try:
            set(map(tuple, pdf.itertuples(index=False)))
        except TypeError as exc:
            problems.append(
                f"driver-canon incompatible ({side}): {exc} — "
                "an output column holds unhashable (list/dict) cells"
            )
    if problems:
        return problems
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count {len(spark_pdf)} vs {len(duck_pdf)}")
    s_cols, d_cols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if s_cols != d_cols:
        problems.append(f"columns {s_cols} vs {d_cols}")
        return problems
    a, b = canonicalize(spark_pdf), canonicalize(duck_pdf)
    if len(a) == len(b) and not a.equals(b):
        neq = (a != b).any(axis=1)
        diff_rows = a[neq].head(3)
        diff_rows_b = b[neq].head(3)
        problems.append(
            f"values differ in {int(neq.sum())}/{len(a)} rows\n"
            f"  spark: {diff_rows.to_dict(orient='records')}\n"
            f"  duck : {diff_rows_b.to_dict(orient='records')}"
        )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) else "/root/testdata/sf0.01"
    only = set(a for a in sys.argv[1:] if not os.path.isdir(a))
    spark = get_spark(app_name="check_oracle")
    con = duck_connection(sf_dir)
    # data-derived oracles (embed_pca's literal eigh loadings) must be
    # built against the SAME sf the sweep compares at
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            print(f"FAIL  {name}: spark error: {exc}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(spark_pdf)} rows (no oracle — rows-only)")
            continue
        try:
            duck_pdf = con.execute(oracles[name]).fetchdf()
        except Exception as exc:
            print(f"FAIL  {name}: duckdb error: {exc}")
            n_fail += 1
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            n_fail += 1
            print(f"FAIL  {name}: " + "; ".join(problems))
        else:
            print(f"OK    {name}: {len(spark_pdf)} rows match")
    print(f"\n{n_fail} failures")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
