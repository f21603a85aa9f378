"""Capture .explain("formatted") output for declared queries.

Usage: python scripts/capture_plans.py <out_dir> <suffix> [query ...]

Writes <out_dir>/<query>_<suffix>.txt for each query (all queries if none
given). Queries whose callables return None (write-phase bench entries)
are skipped. SF dir from $SPARK_GRAFT_SF_DIR (default sf0.1).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from intake_esm_spark.session import get_spark


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="capture_plans")
    qs = entrymod.queries()
    if not names:
        names = sorted(qs)
    for name in names:
        if name not in qs:
            print(f"SKIP {name}: not in queries()")
            continue
        try:
            df = qs[name](spark, sf_dir)
            if df is None:
                print(f"SKIP {name}: returns None")
                continue
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            print(f"ERR  {name}: {exc}")
            continue
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"OK   {name} -> {path}")


if __name__ == "__main__":
    main()
