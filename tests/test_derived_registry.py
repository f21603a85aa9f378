"""Derived-variable registry unit tests: decorator registration, search,
load-from-module (reference derived.py:52-88, tests/my_registry.py)."""

import sys
import textwrap

import pytest

from intake_esm_spark.derived import (
    DerivedVariable,
    DerivedVariableError,
    DerivedVariableRegistry,
)


def test_register_decorator_and_dict_protocol():
    reg = DerivedVariableRegistry()

    @reg.register(variable="FOO", query={"variable": ["FLNS", "FLUT"]})
    def foo(df):
        return df

    assert "FOO" in reg
    assert len(reg) == 1
    assert reg["FOO"].dependent_variables("variable") == ["FLNS", "FLUT"]
    # scalar query values normalized to lists (reference derived.py:22-28)
    reg.register(lambda df: df, variable="BAR", query={"variable": "FLUT"})
    assert reg["BAR"].query == {"variable": ["FLUT"]}


def test_search_subsets_registry():
    reg = DerivedVariableRegistry()
    reg.register(lambda df: df, variable="A", query={"variable": ["x"]})
    reg.register(lambda df: df, variable="B", query={"variable": ["y"]})
    sub = reg.search("A")
    assert list(sub) == ["A"]
    sub2 = reg.search(["A", "B"])
    assert len(sub2) == 2


def test_load_from_module(tmp_path):
    mod = tmp_path / "my_test_registry.py"
    mod.write_text(
        textwrap.dedent(
            """
            from intake_esm_spark.derived import DerivedVariableRegistry

            registry = DerivedVariableRegistry()

            @registry.register(variable='FOO', query={'variable': ['FLNS']})
            def foo(df):
                return df
            """
        )
    )
    sys.path.insert(0, str(tmp_path))
    try:
        reg = DerivedVariableRegistry.load("my_test_registry")
        assert "FOO" in reg
    finally:
        sys.path.remove(str(tmp_path))
        sys.modules.pop("my_test_registry", None)


def test_load_from_module_without_registry(tmp_path):
    mod = tmp_path / "empty_mod_for_registry.py"
    mod.write_text("x = 1\n")
    sys.path.insert(0, str(tmp_path))
    try:
        with pytest.raises(ValueError, match="no DerivedVariableRegistry"):
            DerivedVariableRegistry.load("empty_mod_for_registry")
    finally:
        sys.path.remove(str(tmp_path))
        sys.modules.pop("empty_mod_for_registry", None)


def test_derivation_error_wrapping(spark):
    def boom(df):
        raise RuntimeError("kaput")

    dv = DerivedVariable(func=boom, variable="X", query={"variable": ["y"]})
    df = spark.createDataFrame([("y", 1.0)], ["variable", "value"])
    with pytest.raises(DerivedVariableError):
        dv(df, variable_key_name="variable")


def test_prefer_derived_semantics(spark):
    """A dataset already containing the target variable is recomputed only
    with prefer_derived=True (reference derived.py:167-208)."""
    from intake_esm_spark.derived import elementwise

    reg = DerivedVariableRegistry()
    reg.register(
        elementwise("FOO", ["FLNS"], lambda a: a * 2),
        variable="FOO",
        query={"variable": ["FLNS"]},
    )
    df = spark.createDataFrame(
        [("FLNS", 1, 10.0), ("FOO", 1, 999.0)], ["variable", "time", "value"]
    )
    out = reg.update_datasets({"k": df}, "variable")["k"]
    foo_vals = sorted(r["value"] for r in out.filter("variable='FOO'").collect())
    assert foo_vals == [999.0]  # left untouched

    reg2 = DerivedVariableRegistry()
    reg2.register(
        elementwise("FOO", ["FLNS"], lambda a: a * 2),
        variable="FOO",
        query={"variable": ["FLNS"]},
        prefer_derived=True,
    )
    out2 = reg2.update_datasets({"k": df}, "variable")["k"]
    foo_vals2 = sorted(r["value"] for r in out2.filter("variable='FOO'").collect())
    assert 20.0 in foo_vals2  # recomputed value present
