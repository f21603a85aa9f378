"""End-to-end drive of the public library surface."""
import json
import os
import sys
import tempfile

sys.path.insert(0, "/root/repo")

from intake_esm_spark import open_esm_datastore
from intake_esm_spark.session import get_spark

spark = get_spark()
tmp = tempfile.mkdtemp(prefix="verify_drive_")

# --- build a throwaway catalog: JSON descriptor + CSV table + parquet assets
rows = []
for exp in ["CTRL", "20C"]:
    for var in ["SHF", "TEMP"]:
        for member in [1, 2]:
            path = os.path.join(tmp, f"{exp}_{var}_{member}.parquet")
            pdf = spark.createDataFrame(
                [(t, float(t * member), var) for t in range(5)],
                "time int, value double, variable string",
            )
            pdf.write.mode("overwrite").parquet(path)
            rows.append(
                {
                    "component": "ocn",
                    "experiment": exp,
                    "variable": var,
                    "member_id": member,
                    "path": path,
                    "format": "parquet",
                }
            )

csv_path = os.path.join(tmp, "catalog.csv")
import pandas as pd

pd.DataFrame(rows).to_csv(csv_path, index=False)
desc = {
    "esmcat_version": "0.1.0",
    "id": "verify-drive",
    "description": "throwaway",
    "catalog_file": csv_path,
    "attributes": [{"column_name": c} for c in ["component", "experiment", "variable", "member_id"]],
    "assets": {"column_name": "path", "format_column_name": "format"},
    "aggregation_control": {
        "variable_column_name": "variable",
        "groupby_attrs": ["component", "experiment"],
        "aggregations": [
            {"type": "union", "attribute_name": "variable"},
            {"type": "join_new", "attribute_name": "member_id", "options": {"coords": "minimal"}},
        ],
    },
}
json_path = os.path.join(tmp, "catalog.json")
with open(json_path, "w") as f:
    json.dump(desc, f)

# --- open, profile, search, assemble
cat = open_esm_datastore(json_path, spark=spark)
assert len(cat) == 2, len(cat)
nun = cat.nunique()
print("nunique:", nun)
assert cat.unique()["experiment"] and sorted(cat.keys()) == ["ocn.20C", "ocn.CTRL"]

sub = cat.search(experiment=["CTRL"], variable="SHF")
assert sorted(sub.keys()) == ["ocn.CTRL"], sub.keys()

dsets = sub.to_dataset_dict()
df = dsets["ocn.CTRL"]
got_cols = set(df.columns)
assert "member_id" in got_cols and "value" in got_cols, got_cols
n = df.count()
assert n == 10, n  # 2 members x 5 timesteps, SHF only
assert df.select("variable").distinct().collect()[0][0] == "SHF"

# regex search + empty query + unknown column probes
assert cat.search(experiment="^C.*L$").df.count() > 0
try:
    cat.search(bogus_column="x")
    raise AssertionError("unknown column should raise")
except Exception as exc:
    print("unknown-column raises:", type(exc).__name__)

# require_all_on: only CTRL has both members for... both do; restrict members
r = cat.search(variable=["SHF", "TEMP"], require_all_on=["experiment"])
assert r.df.count() == 8, r.df.count()  # 2 exp x 2 var x 2 member rows, all kept

# --- serialize + reopen round trip
out = cat.serialize("verify_cat", directory=tmp, catalog_type="file")
re_cat = open_esm_datastore(os.path.join(tmp, "verify_cat.json"), spark=spark)
assert len(re_cat) == 2 and re_cat.df.count() == cat.df.count()

print("VERIFY-DRIVE-OK")

# --- driver-contract audit (VERDICT r7 #6): a local green sweep must
# imply a driver green sweep. Three gaps the r7 round exposed:
# (1) entry/oracle key drift, (2) non-atomic output columns (the
# driver's set-hash canon raises `unhashable type` on list cells —
# our tuple canon did not), (3) silent entry-count regressions.
import __spark_entry__ as entrymod  # noqa: E402

qs, oracles = entrymod.queries(), entrymod.oracle_sql()
extra_oracles = set(oracles) - set(qs)
assert not extra_oracles, f"oracles without queries: {sorted(extra_oracles)}"
missing_oracles = set(qs) - set(oracles)
# rows-only entries are allowed but must be a deliberate, short
# allowlist with the reason documented at the entry's docstring.
# EMPTY since round 12: embed_pca (the last holdout) is oracled via
# the data-derived-literal construction (_build_embed_pca_oracle).
ROWS_ONLY_ALLOWED: set[str] = set()
assert missing_oracles <= ROWS_ONLY_ALLOWED, (
    f"entries without oracles (rows-only): "
    f"{sorted(missing_oracles - ROWS_ONLY_ALLOWED)} — "
    "add oracles or add to the documented allowlist"
)
assert len(qs) >= 190, f"entry count regressed: {len(qs)} < 190"

plan_sf = os.environ.get("SPARK_GRAFT_PLAN_SF_DIR", "/root/testdata/sf0.001")
complex_types = ("ArrayType", "MapType", "StructType")
offenders = {}
for name, fn in qs.items():
    schema = fn(spark, plan_sf).schema
    bad = [
        f.name for f in schema.fields
        if type(f.dataType).__name__ in complex_types
    ]
    if bad:
        offenders[name] = bad
assert not offenders, f"non-atomic entry output columns: {offenders}"
print(f"DRIVER-CONTRACT-AUDIT-OK ({len(qs)} entries, all schemas atomic)")
