"""Compatibility tests against the REFERENCE'S OWN sample catalogs.

These open the unmodified fixture files shipped with intake-esm
(/root/reference/tests/sample-catalogs, read-only) through THIS engine and
assert the reference's golden expectations (tests/test_core.py:251-279,
tests/test_cat.py round-trips). Skipped when the reference checkout isn't
present — the rest of the suite is self-contained.
"""

import os

import pytest

from intake_esm_spark.datastore import open_esm_datastore

REF = "/root/reference/tests/sample-catalogs"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference sample catalogs not available"
)


def _open(spark, name):
    return open_esm_datastore(f"{REF}/{name}", spark=spark)


# golden sizes from /root/reference/tests/test_core.py:251-263
@pytest.mark.parametrize(
    "query, expected_groups",
    [
        ({"experiment": "CTRL"}, 1),
        ({"experiment": ["CTRL", "20C"]}, 2),
        ({}, 0),
        ({"variable": "SHF", "time_range": ["200601-210012"]}, 1),
    ],
)
def test_cesm1_lens_search_sizes(spark, query, expected_groups):
    cat = _open(spark, "cesm1-lens-netcdf.json")
    assert len(cat.search(**query)) == expected_groups


def test_cesm1_lens_keys(spark):
    cat = _open(spark, "cesm1-lens-netcdf.json")
    keys = cat.keys()
    for k in ["ocn.20C.pop.h", "ocn.CTRL.pop.h", "ocn.RCP85.pop.h"]:
        assert k in keys
    assert cat.key_template == "component.experiment.stream"


# golden sizes from /root/reference/tests/test_core.py:267-279
@pytest.mark.parametrize(
    "name, kind",
    [
        ("access-columns-with-lists.json", "list"),
        ("access-columns-with-tuples.json", "tuple"),
        ("access-columns-with-sets.json", "set"),
    ],
)
def test_access_iterable_catalogs(spark, name, kind):
    cat = _open(spark, name)
    # container kind detected from the serialized cells
    assert cat.descriptor.iterable_dtypes.get("variable") == kind
    assert "variable" in cat.iterable_columns
    assert len(cat.search(variable=["aice_m"])) == 1


def test_access_single_item_iterables(spark):
    cat = _open(spark, "access-single-item-iterables.json")
    assert "variable" in cat.iterable_columns
    assert cat.df.count() > 0


def test_multi_variable_catalog(spark):
    cat = _open(spark, "multi-variable-catalog.json")
    assert cat.has_multiple_variable_assets
    sub = cat.search(variable="SHF")
    assert sub.df.count() > 0
    assert sub._requested_variables == ["SHF"]


def test_catalog_dict_records(spark):
    cat = _open(spark, "catalog-dict-records.json")
    assert cat.df.count() == 5
    assert len(cat.search(variable="FLNS")) >= 1


def test_cmip6_allnan_column_dropped_from_grouping(spark):
    """dcpp_init_year is all-NaN in the test CSV -> silently dropped from
    groupby_attrs (reference cat.py:26-45)."""
    cat = _open(spark, "cmip6-netcdf.json")
    assert "dcpp_init_year" not in cat.key_template.split(".")
    assert len(cat) > 0


def test_bad_descriptor_rejected(spark):
    with pytest.raises(Exception):
        _open(spark, "bad.json")


def test_noaa_opendap_numeric_facets(spark):
    cat = _open(spark, "noaa-pathfinder-opendap.json")
    # integer-valued facet query (scode), aggregation-free grouping
    sub = cat.search(scode=482)
    assert sub.df.count() > 0
