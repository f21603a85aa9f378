"""Descriptor validation + catalog IO: iterable-column codec, container-type
round-trip (reference tests/test_cat.py:148-177), compression, dict source."""

import json
import os

import pytest

from intake_esm_spark.sources import catalog_io
from intake_esm_spark.sources.descriptor import (
    Assets,
    DescriptorError,
    ESMCatalogDescriptor,
)


def test_assets_format_xor():
    with pytest.raises(DescriptorError):
        Assets(column_name="path")
    with pytest.raises(DescriptorError):
        Assets(column_name="path", format="netcdf", format_column_name="fmt")
    a = Assets(column_name="path", format_column_name="fmt")
    assert a.format is None


def test_catalog_file_dict_mutual_exclusion():
    with pytest.raises(DescriptorError):
        ESMCatalogDescriptor(catalog_file="x.csv", catalog_dict=[{"a": 1}])


def test_decode_iterable_cells(spark):
    df = spark.createDataFrame(
        [
            ("('SHF', 'REGION_MASK')",),
            ("['a', 'b']",),
            ("{'s1', 's2'}",),
            ("('single',)",),
        ],
        ["v"],
    )
    out = [r["v"] for r in df.select(catalog_io.decode_iterable_column("v")).collect()]
    assert out == [
        ["SHF", "REGION_MASK"],
        ["a", "b"],
        ["s1", "s2"],
        ["single"],
    ]


@pytest.mark.parametrize("kind,cell", [
    ("list", "['x', 'y']"),
    ("tuple", "('x', 'y')"),
    ("set", "{'y', 'x'}"),
])
def test_container_type_round_trip(spark, tmp_path, kind, cell):
    """CSV -> array -> CSV preserves the original Python container repr."""
    src = tmp_path / "cat.csv"
    src.write_text(f"path,variable\np1,\"{cell}\"\n")
    df, dtypes = catalog_io.read_catalog_csv(spark, str(src))
    assert dtypes == {"variable": kind}
    desc = ESMCatalogDescriptor(
        assets=Assets(column_name="path", format="parquet"),
        iterable_dtypes=dtypes,
    )
    json_path = catalog_io.save_catalog(df, desc, "rt", str(tmp_path / "out"))
    with open(json_path) as f:
        saved = json.load(f)
    assert saved["iterable_dtypes"] == {"variable": kind}
    csv_out = os.path.join(os.path.dirname(json_path), saved["catalog_file"])
    body = open(csv_out).read()
    if kind == "set":
        # sets are unordered; stored sorted
        assert "{'x', 'y'}" in body
    else:
        assert cell in body
    # and it reads back identically
    df2, dtypes2 = catalog_io.read_catalog_csv(spark, csv_out, saved["iterable_dtypes"])
    assert dtypes2 == dtypes
    v1 = sorted(df.select("variable").first()[0])
    v2 = sorted(df2.select("variable").first()[0])
    assert v1 == v2


def test_single_item_tuple_round_trip(spark, tmp_path):
    src = tmp_path / "cat.csv"
    src.write_text("path,variable\np1,\"('only',)\"\n")
    df, dtypes = catalog_io.read_catalog_csv(spark, str(src))
    assert df.select("variable").first()[0] == ["only"]
    desc = ESMCatalogDescriptor(
        assets=Assets(column_name="path", format="parquet"), iterable_dtypes=dtypes
    )
    json_path = catalog_io.save_catalog(df, desc, "st", str(tmp_path / "out"))
    saved = json.load(open(json_path))
    body = open(os.path.join(os.path.dirname(json_path), saved["catalog_file"])).read()
    assert "('only',)" in body


def test_gzip_compression_round_trip(spark, tmp_path):
    src = tmp_path / "cat.csv"
    src.write_text("path,x\np1,1\np2,2\n")
    df, _ = catalog_io.read_catalog_csv(spark, str(src))
    desc = ESMCatalogDescriptor(assets=Assets(column_name="path", format="parquet"))
    json_path = catalog_io.save_catalog(
        df, desc, "gz", str(tmp_path / "out"), compression="gzip"
    )
    saved = json.load(open(json_path))
    assert saved["catalog_file"].endswith(".csv.gz")
    df2, _ = catalog_io.read_catalog_csv(
        spark, os.path.join(os.path.dirname(json_path), saved["catalog_file"])
    )
    assert df2.count() == 2


def test_dict_source_and_serialize(spark, tmp_path):
    records = [
        {"path": "p1", "variable": ("SHF", "SST"), "x": 1},
        {"path": "p2", "variable": ("FOO",), "x": 2},
    ]
    df, dtypes = catalog_io.read_catalog_dict(spark, records)
    assert dtypes == {"variable": "tuple"}
    assert df.count() == 2
    desc = ESMCatalogDescriptor(
        assets=Assets(column_name="path", format="parquet"), iterable_dtypes=dtypes
    )
    json_path = catalog_io.save_catalog(df, desc, "d", str(tmp_path), catalog_type="dict")
    saved = json.load(open(json_path))
    assert len(saved["catalog_dict"]) == 2
    assert "catalog_file" not in saved


def test_parquet_catalog_round_trip(spark, tmp_path):
    df = spark.createDataFrame([("p1", ["a", "b"])], ["path", "variable"])
    desc = ESMCatalogDescriptor(
        assets=Assets(column_name="path", format="parquet"),
        iterable_dtypes={"variable": "list"},
    )
    json_path = catalog_io.save_catalog(
        df, desc, "pq", str(tmp_path), file_format="parquet"
    )
    saved = json.load(open(json_path))
    df2, dtypes = catalog_io.read_catalog_parquet(
        spark, os.path.join(os.path.dirname(json_path), saved["catalog_file"])
    )
    assert dtypes == {"variable": "list"}
    assert df2.first()["variable"] == ["a", "b"]


def test_relative_catalog_file_resolution(tmp_path):
    (tmp_path / "cat.csv").write_text("path\np1\n")
    desc_path = tmp_path / "cat.json"
    desc_path.write_text(json.dumps({
        "assets": {"column_name": "path", "format": "parquet"},
        "catalog_file": "cat.csv",
    }))
    desc = ESMCatalogDescriptor.load(str(desc_path))
    assert os.path.isabs(desc.catalog_file)
    assert os.path.exists(desc.catalog_file)


def test_null_iterable_cell_round_trips_as_null(spark, tmp_path):
    """NULL collection cells must stay NULL through CSV save/load — the
    old encoder wrote '()' and reloaded an empty collection."""
    from intake_esm_spark.sources import catalog_io
    from intake_esm_spark.sources.descriptor import Assets, ESMCatalogDescriptor

    df = spark.createDataFrame(
        [("p1", ["SHF", "SST"]), ("p2", None)],
        "path string, variable array<string>",
    )
    desc = ESMCatalogDescriptor(
        id="nulls", assets=Assets(column_name="path", format="parquet")
    )
    desc.iterable_dtypes = {"variable": "tuple"}
    out_json = catalog_io.save_catalog(df, desc, "nulls", str(tmp_path))
    import json as _json

    desc2 = ESMCatalogDescriptor.load(out_json)
    df2, _ = catalog_io.load_catalog(spark, desc2)
    rows = {r["path"]: r["variable"] for r in df2.collect()}
    assert rows["p1"] == ["SHF", "SST"]
    assert rows["p2"] is None


def test_quote_in_iterable_element_raises_on_save(spark, tmp_path):
    from intake_esm_spark.sources import catalog_io
    from intake_esm_spark.sources.descriptor import Assets, ESMCatalogDescriptor

    df = spark.createDataFrame(
        [("p1", ["O'Brien"])], "path string, variable array<string>"
    )
    desc = ESMCatalogDescriptor(
        id="quotes", assets=Assets(column_name="path", format="parquet")
    )
    desc.iterable_dtypes = {"variable": "list"}
    with pytest.raises(Exception, match="quote character"):
        catalog_io.save_catalog(df, desc, "quotes", str(tmp_path))
