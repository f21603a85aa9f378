"""Per-pass Cox profiling: wall-clock + Spark JOB COUNT per Newton pass
(guide §1 — the r14 verdict's "Done" criterion for the pass fusion is a
halved per-pass job count in a listener probe).

Usage: python scripts/cox_profile_r15.py [--plan OUT.txt]

Builds the events_cox subject base once (pin materialized out-of-band),
then runs one `_cox_pass` at beta=0 and one at the first Newton iterate,
each inside its own job group; reports seconds and the number of Spark
jobs the group ran (statusTracker.getJobIdsForGroup). With --plan, also
writes the pass frame's .explain("formatted").
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from intake_esm_spark.session import get_spark


def main() -> None:
    plan_out = None
    args = sys.argv[1:]
    if args and args[0] == "--plan":
        plan_out = args[1]
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="cox_profile_r15")
    sc = spark.sparkContext
    spark.range(1000).count()  # warm-up

    from intake_esm_spark.operators.regression import logistic_step
    from intake_esm_spark.operators.survival import (
        _cox_base,
        _cox_pass,
        _cox_pass_frame,
        _t_span,
    )

    subjects = entrymod._cox_subjects(spark, sf_dir)
    base = _cox_base(subjects, "dur", "ev", ["x1", "x2"])
    base.count()  # materialize the pin out-of-band
    span = _t_span(base)
    print(f"span={span}")

    def probe(tag: str, beta: list[float]) -> dict:
        sc.setJobGroup(tag, tag)
        t0 = time.perf_counter()
        mom = _cox_pass(base, ["x1", "x2"], beta, t_bounds=span)
        dt = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        jobs = sc.statusTracker().getJobIdsForGroup(tag)
        print(f"{tag}: {dt:.3f}s jobs={len(jobs)}")
        return mom

    mom0 = probe("pass_beta0_warm", [0.0, 0.0])
    beta1 = logistic_step(mom0, [0.0, 0.0], 1)
    reps = []
    for i in range(3):
        probe(f"pass_beta0_{i}", [0.0, 0.0])
        t0 = time.perf_counter()
        probe(f"pass_beta1_{i}", beta1)
        reps.append(time.perf_counter() - t0)
    print(f"pass_beta1 median: {statistics.median(reps):.3f}s")

    if plan_out:
        frame = _cox_pass_frame(base, ["x1", "x2"], beta1, t_bounds=span)
        plan = frame._sc._jvm.PythonSQLUtils.explainString(
            frame._jdf.queryExecution(), "formatted"
        )
        with open(plan_out, "w") as fh:
            fh.write(plan)
        print(f"plan -> {plan_out}")


if __name__ == "__main__":
    main()
