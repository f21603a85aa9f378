"""Breakdown profiling for the iterative fit kernels (guide §1).

Usage: python scripts/fit_profile.py logit|cox|variants

Times, in isolation at $SPARK_GRAFT_SF_DIR (default sf0.1):
- checkpoint materialization of the fit base frame
- one IRLS pass on the materialized base
- attribution variants of the pass (count-only floor, no-round,
  double-sums) — NOT semantics-preserving, measurement only.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: F401  (registers helpers)
from pyspark.sql import functions as F

from intake_esm_spark.session import get_spark


def t(fn, n=3):
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        runs.append(time.perf_counter() - t0)
    return statistics.median(runs), runs


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "logit"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="fit_profile")
    spark.range(1000).count()  # warm-up

    if which == "logit":
        from intake_esm_spark.operators.regression import (
            _finite,
            _logistic_pass,
            logistic_step,
        )

        frame = entrymod._returnflag_logit_frame(spark, sf_dir)
        y, xs = "ret", ["l_quantity", "l_discount"]
        cond = _finite(y)
        for c in xs:
            cond = cond & _finite(c)
        base = frame.filter(cond)
        par = spark.sparkContext.defaultParallelism
        if base.rdd.getNumPartitions() < par:
            base = base.repartition(par)
        base = base.localCheckpoint(eager=False)
        med, runs = t(lambda: base.count(), 1)
        print(f"checkpoint+count: {med:.3f}s")
        med, _ = t(lambda: base.count())
        print(f"recount (materialized): {med:.3f}s")
        beta = [0.0, 0.0, 0.0]
        med, runs = t(lambda: _logistic_pass(base, y, xs, beta))
        print(f"one pass (beta=0): {med:.3f}s {runs}")
        b1 = logistic_step(_logistic_pass(base, y, xs, beta), beta, 2)
        med, runs = t(lambda: _logistic_pass(base, y, xs, b1))
        print(f"one pass (beta=b1): {med:.3f}s {runs}")
        # attribution variants (NOT semantics-preserving)
        names = ["__x1", "__x2"]
        proj1 = base.select(
            F.col(y).cast("double").alias("__y"),
            *[
                F.round(F.col(c).cast("double"), 6).alias(nm)
                for c, nm in zip(xs, names)
            ],
        )
        eta = F.lit(b1[0])
        for bj, nm in zip(b1[1:], names):
            eta = eta + F.lit(float(bj)) * F.col(nm)
        proj2 = proj1.select(
            "__y", *names,
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))).alias("__mu"),
        )
        mu = F.col("__mu")
        w = mu * (F.lit(1.0) - mu)
        resid = F.col("__y") - mu
        colsx = [F.lit(1.0)] + [F.col(nm) for nm in names]
        # v3: count-only floor
        med, _ = t(lambda: proj2.agg(F.count(F.lit(1))).collect())
        print(f"variant count-only floor: {med:.3f}s")
        # v4: double sums of raw terms (no round, no decimal)
        terms_d = []
        for j2, xj in enumerate(colsx):
            terms_d.append(F.sum(resid * xj))
            for i in range(j2, len(colsx)):
                terms_d.append(F.sum(w * xj * colsx[i]))
        med, _ = t(lambda: proj2.agg(*terms_d).collect())
        print(f"variant double-sums (no round/decimal): {med:.3f}s")
        # v5: rounded double sums (round, no decimal)
        terms_r = []
        for j2, xj in enumerate(colsx):
            terms_r.append(F.sum(F.round(resid * xj, 12)))
            for i in range(j2, len(colsx)):
                terms_r.append(F.sum(F.round(w * xj * colsx[i], 12)))
        med, _ = t(lambda: proj2.agg(*terms_r).collect())
        print(f"variant round-no-decimal sums: {med:.3f}s")
        # v6: projected round+decimal then sums (the real shape, no ll/sidecar)
        tc = []
        for j2, xj in enumerate(colsx):
            tc.append(
                F.round(resid * xj, 12).cast("decimal(38,12)").alias(f"g{j2}")
            )
            for i in range(j2, len(colsx)):
                tc.append(
                    F.round(w * xj * colsx[i], 12)
                    .cast("decimal(38,12)")
                    .alias(f"h{j2}_{i}")
                )
        proj3 = proj2.select(*tc)
        med, _ = t(
            lambda: proj3.agg(
                *[F.sum(c) for c in proj3.columns]
            ).collect()
        )
        print(f"variant real decimal shape (no sidecar): {med:.3f}s")
        # v7: decimal(28,12) instead of (38,12)
        tc28 = []
        for j2, xj in enumerate(colsx):
            tc28.append(
                F.round(resid * xj, 12).cast("decimal(28,12)").alias(f"g{j2}")
            )
            for i in range(j2, len(colsx)):
                tc28.append(
                    F.round(w * xj * colsx[i], 12)
                    .cast("decimal(28,12)")
                    .alias(f"h{j2}_{i}")
                )
        proj28 = proj2.select(*tc28)
        med, _ = t(
            lambda: proj28.agg(
                *[F.sum(c) for c in proj28.columns]
            ).collect()
        )
        print(f"variant decimal(28,12) shape: {med:.3f}s")

    elif which == "cox":
        from intake_esm_spark.operators.survival import (
            _cox_base,
            _cox_pass,
        )

        subjects = entrymod._cox_subjects(spark, sf_dir)
        base = _cox_base(subjects, "dur", "ev", ["x1", "x2"])
        med, _ = t(lambda: base.count(), 1)
        print(f"checkpoint+count: {med:.3f}s")
        med, _ = t(lambda: base.count())
        print(f"recount (materialized): {med:.3f}s")
        beta = [0.0, 0.0]
        med, runs = t(lambda: _cox_pass(base, ["x1", "x2"], beta))
        print(f"one cox pass: {med:.3f}s {runs}")


if __name__ == "__main__":
    main()
