"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is total wall-clock over all benchmark queries (each executed to
completion with a count() action after a warm-up of the table cache).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from intake_esm_spark.session import get_spark

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "top_suppliers",
    "cube_rollup",
    "customer_order_stats",
    "profile_numeric",
    "require_all_on",
    "search_membership",
    "events_hourly",
    "events_sliding",
    "events_sessionize",
    "events_topk_user",
    "asof_join",
    "text_stats",
    "text_quality",
    "dedup_exact",
    "dedup_minhash",
    "dedup_near",
    "simsearch_scores",
    "simsearch_topk",
    # headline pairs query is the BLOCKED kernel (the 100 TB path); the
    # broadcast-join variant stays in queries() as the oracle cross-check
    # only and is not benched
    "simsearch_pairs_blocked",
    "simsearch_ivf",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark(app_name="bench")
    qs = entrymod.queries()

    # warm-up: JVM + file listing (not counted)
    qs["q1_pricing_summary"](spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "bench_total_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
