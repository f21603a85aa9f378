"""Measure what Z-ordering buys at the file level: write the orders
table 16-ways under (a) lexicographic order and (b) z-order, then — for
a grid of two-sided box queries — count how many files each layout's
parquet min/max footer stats allow an engine to SKIP.

    python scripts/zorder_skipping_demo.py [sf_dir]   # default sf0.1

Prints one JSON line; the numbers go to BASELINE.md.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from intake_esm_spark.operators.layout import zorder_key
from intake_esm_spark.session import get_spark


def file_ranges(path: str, cols: list[str]) -> list[dict]:
    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        lo = {c: None for c in cols}
        hi = {c: None for c in cols}
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            for c in cols:
                st = md.row_group(rg).column(idx[c]).statistics
                lo[c] = st.min if lo[c] is None else min(lo[c], st.min)
                hi[c] = st.max if hi[c] is None else max(hi[c], st.max)
        out.append({c: (lo[c], hi[c]) for c in cols})
    return out


def skipped(ranges: list[dict], box: dict) -> int:
    n = 0
    for r in ranges:
        for c, (qlo, qhi) in box.items():
            flo, fhi = r[c]
            if fhi < qlo or flo > qhi:  # file range disjoint from query
                n += 1
                break
    return n


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="zorder_demo")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey",
        "o_custkey",
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("cents"),
    )
    cols = ["o_custkey", "cents"]
    stats = orders.agg(
        *[F.min(c).alias(f"lo_{c}") for c in cols],
        *[F.max(c).alias(f"hi_{c}") for c in cols],
    ).collect()[0]

    tmp = tempfile.mkdtemp(prefix="zorder_demo_")
    try:
        lex_dir, z_dir = os.path.join(tmp, "lex"), os.path.join(tmp, "z")
        orders.repartitionByRange(16, "o_custkey", "cents").write.parquet(lex_dir)
        zed = zorder_key(orders, cols, bits=16)
        zed.repartitionByRange(16, "zkey").drop("zkey").write.parquet(z_dir)
        lex_r = file_ranges(lex_dir, cols)
        z_r = file_ranges(z_dir, cols)

        def window(c: str, t: int) -> tuple:
            lo, hi = stats[f"lo_{c}"], stats[f"hi_{c}"]
            w = (hi - lo) // 4
            qlo = lo + t * (hi - lo - w) // 4
            return (qlo, qlo + w)

        # three query classes x 5 positions each: a quarter-range window
        # on the primary dim only, the SECONDARY dim only (where a
        # lexicographic layout prunes nothing), and both (a box)
        classes = {
            "custkey_only": [{"o_custkey": window("o_custkey", t)} for t in range(5)],
            "cents_only": [{"cents": window("cents", t)} for t in range(5)],
            "box_both": [
                {"o_custkey": window("o_custkey", t), "cents": window("cents", t)}
                for t in range(5)
            ],
        }
        result = {}
        for name, boxes in classes.items():
            result[name] = {
                "lex": round(sum(skipped(lex_r, b) for b in boxes) / len(boxes), 2),
                "zorder": round(sum(skipped(z_r, b) for b in boxes) / len(boxes), 2),
            }
        print(
            json.dumps(
                {
                    "zorder_demo": "OK",
                    "n_files": {"lex": len(lex_r), "z": len(z_r)},
                    "rows": orders.count(),
                    "mean_files_skipped_of_16": result,
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
