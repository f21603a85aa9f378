"""Catalog-at-scale demo (VERDICT r7 #8): the reference's real-world
upper bound is the pangeo-cmip6 catalog at ~27k assets (reference
core.py:574-586); this drives the SAME datastore surface over a
synthetic 1.2M-row CMIP6-shaped catalog — 44x that — and prints one
JSON line of wall-clock timings. Proves the parity layer (search /
require_all_on / unique / nunique / keys) is Spark-scan-bound, not
driver-bound, beyond toy scale.

The catalog is generated IN SPARK (no driver-side row list): a cross of
CMIP6-ish vocab dimensions via sequence+explode, written once as a
parquet catalog + JSON descriptor, then opened through the public API.

Usage: python scripts/catalog_scale_demo.py [n_rows] [out_dir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from intake_esm_spark import open_esm_datastore
from intake_esm_spark.session import get_spark


def build_catalog(spark, n_rows: int, out_dir: str) -> str:
    """Write a CMIP6-shaped parquet catalog of ~n_rows and its JSON
    descriptor; return the descriptor path."""
    acts = ["CMIP", "ScenarioMIP", "DCPP", "HighResMIP", "OMIP"]
    insts = [f"INST{i:02d}" for i in range(20)]
    srcs = [f"MODEL-{i:02d}" for i in range(30)]
    exps = ["historical", "ssp126", "ssp245", "ssp370", "ssp585", "piControl"]
    tables = ["Amon", "Omon", "day", "Lmon"]
    vars_ = ["tas", "pr", "psl", "zg", "ua", "va", "tos", "sos", "o2", "chl"]
    grids = ["gn", "gr"]
    # ~2/3 of the dim-cross survives the sparsity filter below, so the
    # member count that yields ≈ n_rows is n_rows / (|cross| * 2/3)
    n_cross = len(acts) * len(insts) * len(srcs) * len(exps)
    n_members = max(1, round(n_rows / (n_cross * 2 / 3)))
    # one row per (act, inst, src, exp, member, table, var, grid) sample:
    # explode a member sequence over the dim cross, then derive the
    # remaining columns by hash so the data is skewed-realistic, not a
    # pure cross (every member does not run every experiment)
    dims = (
        spark.createDataFrame(
            [(a, i, s, e) for a in acts for i in insts for s in srcs for e in exps],
            "activity_id string, institution_id string, source_id string, experiment_id string",
        )
        .withColumn(
            "member_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.lit(n_members)),
                    lambda i: F.concat(F.lit("r"), i.cast("string"), F.lit("i1p1f1")),
                )
            ),
        )
    )
    h = F.abs(F.xxhash64("activity_id", "institution_id", "source_id",
                         "experiment_id", "member_id"))
    cat = (
        dims
        .withColumn("table_id", F.element_at(
            F.array(*[F.lit(t) for t in tables]), (h % 4 + 1).cast("int")))
        .withColumn("variable_id", F.element_at(
            F.array(*[F.lit(v) for v in vars_]), (h % 10 + 1).cast("int")))
        .withColumn("grid_label", F.element_at(
            F.array(*[F.lit(g) for g in grids]), (h % 2 + 1).cast("int")))
        # realistic sparsity: each (inst, src) pair only runs ~2/3 of
        # experiments; drop by hash
        .filter(h % 3 != 0)
        .withColumn(
            "zstore",
            F.concat_ws(
                "/",
                F.lit("s3://demo-cmip6"),
                "activity_id", "institution_id", "source_id",
                "experiment_id", "member_id", "table_id", "variable_id",
                "grid_label",
            ),
        )
        .withColumn("dcpp_init_year", (h % 20 + 2000).cast("double"))
    )
    cat_path = os.path.join(out_dir, "catalog.parquet")
    cat.coalesce(8).write.mode("overwrite").parquet(cat_path)
    desc = {
        "esmcat_version": "0.1.0",
        "id": "scale-demo-cmip6",
        "description": "synthetic 1M-row CMIP6-shaped catalog",
        "catalog_file": cat_path,
        "attributes": [
            {"column_name": c, "vocabulary": ""}
            for c in [
                "activity_id", "institution_id", "source_id",
                "experiment_id", "member_id", "table_id", "variable_id",
                "grid_label",
            ]
        ],
        "assets": {"column_name": "zstore", "format": "zarr"},
        "aggregation_control": {
            "variable_column_name": "variable_id",
            "groupby_attrs": [
                "activity_id", "institution_id", "source_id",
                "experiment_id", "table_id", "grid_label",
            ],
            "aggregations": [
                {"type": "union", "attribute_name": "variable_id"},
                {
                    "type": "join_new",
                    "attribute_name": "member_id",
                    "options": {"coords": "minimal"},
                },
            ],
        },
    }
    desc_path = os.path.join(out_dir, "catalog.json")
    with open(desc_path, "w") as f:
        json.dump(desc, f)
    return desc_path


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_200_000
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(
        prefix="catalog_scale_"
    )
    spark = get_spark(app_name="catalog_scale_demo")
    t = {}
    t0 = time.perf_counter()
    desc_path = build_catalog(spark, n_rows, out_dir)
    t["generate_write"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    cat = open_esm_datastore(desc_path, spark=spark)
    n_assets = cat.df.count()
    t["open_and_count"] = round(time.perf_counter() - t0, 3)
    assert n_assets >= 0.5 * n_rows, f"unexpectedly small: {n_assets}"

    t0 = time.perf_counter()
    n_keys = len(cat)
    t["len_groups"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    sub = cat.search(experiment_id="historical", variable_id=["tas", "pr"])
    n_sub = sub.df.count()
    t["search_eq_isin"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    n_rx = cat.search(source_id="^MODEL-0.*$", table_id="Amon").df.count()
    t["search_regex"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    req = cat.search(
        variable_id=["tas", "pr"], require_all_on=["source_id"]
    )
    n_req = req.df.count()
    t["require_all_on"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    from intake_esm_spark.operators import grouping

    uniq = grouping.unique(
        cat.df, ["experiment_id", "table_id", "grid_label"]
    )
    t["unique_3cols"] = round(time.perf_counter() - t0, 3)

    # nunique over the VOCAB columns (zstore is the asset path — all
    # unique by construction; profiling it exactly means collecting a
    # million-element distinct, which is exactly what approx exists for)
    vocab_cols = [
        "activity_id", "institution_id", "source_id", "experiment_id",
        "member_id", "table_id", "variable_id", "grid_label",
    ]
    t0 = time.perf_counter()
    nu_exact = grouping.nunique(cat.df, vocab_cols)
    t["nunique_exact_8cols"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    nu_approx = grouping.nunique(cat.df, vocab_cols + ["zstore"], exact=False)
    t["nunique_approx_9cols"] = round(time.perf_counter() - t0, 3)

    # sanity: approx within 5% of exact on every vocab column
    for c, v in nu_exact.items():
        assert abs(nu_approx[c] - v) <= max(2, 0.05 * v), (c, v, nu_approx[c])
    assert nu_approx["zstore"] >= 0.9 * n_assets

    print(json.dumps({
        "catalog_scale_demo": "OK",
        "n_assets": n_assets,
        "n_groups": n_keys,
        "n_search": n_sub,
        "n_regex": n_rx,
        "n_require_all_on": n_req,
        "n_unique_experiments": len(uniq["experiment_id"]),
        "timings_sec": t,
    }))


if __name__ == "__main__":
    main()
