"""r15 probe (verdict item #7): can an Arrow/NumPy batch kernel replace
the 16 interpreted in-row plane-dot folds of band_signatures with EXACT
signature-bit parity?

The JVM fold is a strict left-to-right float64 accumulation
(F.aggregate(zip_with(mul), 0.0, +)).  NumPy's dot/add.reduce use
pairwise/BLAS summation (different rounding), but cumsum is sequential
left-to-right by definition — so ``np.cumsum(x * p)[-1]`` reproduces the
fold bit-for-bit IF every elementwise product and partial add rounds
identically (both are correctly-rounded IEEE float64 ops, so they do).

This script computes all 16 plane signs for every sf0.1 embedding row
via (a) the production band_signatures expression and (b) the NumPy
cumsum kernel, and reports the number of differing band signatures.
Zero differences = the Arrow kernel is parity-eligible; any difference
= close the idea (the verdict's gate).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from intake_esm_spark.session import get_spark
from intake_esm_spark.sources.tables import load_table
from intake_esm_spark.operators.simsearch import (
    band_signatures,
    hyperplane_coeffs,
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="lsh_sig_parity")
    emb = load_table(spark, sf_dir, "embeddings")
    planes = hyperplane_coeffs(16, 64, "hp")
    sigs = band_signatures(F.col("embedding"), planes, 4)

    t0 = time.perf_counter()
    jvm = (
        emb.select(F.col("vec_id"), F.explode(sigs).alias("bs"))
        .select("vec_id", F.col("bs")["band"].alias("band"), F.col("bs")["sig"].alias("sig"))
        .toPandas()
    )
    t_jvm = time.perf_counter() - t0
    rows = emb.select("vec_id", "embedding").toPandas()
    x = np.array(rows["embedding"].tolist(), dtype=np.float64)
    p = np.array(planes, dtype=np.float64)  # 16 x 64

    t0 = time.perf_counter()
    # sequential left-to-right dot per (row, plane): cumsum semantics
    bits = np.empty((x.shape[0], 16), dtype=np.int64)
    for j in range(16):
        dots = np.cumsum(x * p[j], axis=1)[:, -1]
        bits[:, j] = (dots >= 0).astype(np.int64)
    t_np = time.perf_counter() - t0
    np_sig = {}
    for b in range(4):
        s = np.zeros(x.shape[0], dtype=np.int64)
        for i in range(4):
            s += bits[:, b * 4 + i] << i
        np_sig[b] = s

    idx = {int(v): k for k, v in enumerate(rows["vec_id"])}
    mismatches = 0
    checked = 0
    for _, r in jvm.iterrows():
        k = idx[int(r["vec_id"])]
        checked += 1
        if int(np_sig[int(r["band"])][k]) != int(r["sig"]):
            mismatches += 1
    print(
        f"rows={x.shape[0]} band-sigs checked={checked} "
        f"mismatches={mismatches} (jvm leg {t_jvm:.2f}s, numpy kernel "
        f"{t_np:.3f}s batch-side only)"
    )
    print("PARITY" if mismatches == 0 else "BITS FLIP — close per gate")


if __name__ == "__main__":
    main()
