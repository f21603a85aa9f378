"""Single-process leg of a paired A/B bench: time a few queries() entries
from ONE repo checkout in a fresh JVM and print one JSON line.

    python scripts/ab_query_bench.py <repo_dir> <q1,q2,...> [repeats]

Used by scripts/ab_bench.sh-style drivers that alternate legs between two
checkouts (e.g. a round-pinned git worktree vs the working tree) to cancel
host drift: each leg pays its own JVM start, warms up every query once,
then records per-query medians over ``repeats`` runs.
"""

from __future__ import annotations

import json
import statistics
import sys
import time


def main() -> None:
    repo = sys.argv[1]
    names = sys.argv[2].split(",")
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    sf_dir = "/root/testdata/sf0.1"

    sys.path.insert(0, repo)
    import __spark_entry__ as entrymod
    from intake_esm_spark.session import get_spark

    spark = get_spark(app_name="ab_bench")
    qs = entrymod.queries()
    for n in names:  # warm-up: JVM, codegen, table cache
        qs[n](spark, sf_dir).count()

    timings = {}
    for n in names:
        runs = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            qs[n](spark, sf_dir).count()
            runs.append(time.perf_counter() - t0)
        timings[n] = round(statistics.median(runs), 3)
    print(json.dumps({"repo": repo, "queries": timings, "repeats": repeats}))


if __name__ == "__main__":
    main()
