"""Isolated per-query timing with the noop sink (guide §1.4).

Usage: python scripts/qtime.py [-r N] <query> [query ...]

Times each named queries() entry (or bench-only phase callable) R times
(default 3) after one untimed warm-up of q1, printing per-run and median
seconds. The timed action is a noop-sink write when the callable returns
a DataFrame (computes every column, unlike count()); entries whose
callable returns None (index-build phases) are timed on the callable
itself. SF dir from $SPARK_GRAFT_SF_DIR (default sf0.1).
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
    args = sys.argv[1:]
    repeats = 3
    if args and args[0] == "-r":
        repeats = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="qtime")
    qs = dict(entrymod.queries())
    qs["q1_pricing_summary"](spark, sf_dir).count()  # warm-up
    for name in args:
        fn = qs[name]
        runs = []
        for i in range(repeats):
            spark.sparkContext.setJobDescription(f"{name}#{i}")
            t0 = time.perf_counter()
            out = fn(spark, sf_dir)
            if out is not None:
                out.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        med = statistics.median(runs)
        print(
            f"{name}: median={med:.3f}s runs="
            + ",".join(f"{r:.3f}" for r in runs),
            flush=True,
        )


if __name__ == "__main__":
    main()
