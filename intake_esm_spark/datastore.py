"""Public catalog API — the Spark-native ``esm_datastore``.

Mirrors the reference's user surface (/root/reference/intake_esm/core.py:89-922)
on a lazy Spark DataFrame:

* ``open_esm_datastore(obj)`` — JSON path / descriptor dict / (descriptor,
  DataFrame) pair (core.py:139-146)
* ``search(require_all_on=..., **query)`` — returns a NEW datastore whose
  DataFrame is the filtered Catalyst plan (core.py:400-510), including
  derived-variable dependency expansion + union + dedup (core.py:464-493)
* ``keys`` / ``keys_info`` / ``key_template`` / ``__len__`` /
  ``__contains__`` / ``__getitem__`` (core.py:172-345)
* ``unique`` / ``nunique`` incl. the synthetic ``derived_<variable_col>``
  entry (core.py:567-604)
* ``to_dataset_dict`` / ``to_datatree`` / ``to_dataframe`` (to_dask
  analogue) (core.py:607-894)
* ``serialize`` (core.py:513-565)

The datastore never holds collected rows — only the descriptor (metadata)
and the DataFrame plan, so the same handle works against a 100 TB catalog
on a cluster.
"""

from __future__ import annotations

import copy
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from intake_esm_spark.derived import DerivedVariableRegistry
from intake_esm_spark.operators import grouping
from intake_esm_spark.operators.combine import open_asset_union
from intake_esm_spark.operators.division import apply_require_all_on
from intake_esm_spark.plans.predicates import search as base_search
from intake_esm_spark.plans.query import Query
from intake_esm_spark.sources import catalog_io
from intake_esm_spark.sources.descriptor import ESMCatalogDescriptor

MAX_DATASET_KEYS = 1_000_000
"""Cap on dataset keys materialized driver-side by keys()/to_dataset_dict().
See ESMDataStore._bounded_key_collect."""


class ESMDataStore:
    """A catalog handle: descriptor + lazy catalog DataFrame + registries."""

    def __init__(
        self,
        spark: SparkSession,
        descriptor: ESMCatalogDescriptor,
        df: DataFrame,
        registry: DerivedVariableRegistry | None = None,
        requested_variables: list[str] | None = None,
        sep: str = ".",
    ) -> None:
        self.spark = spark
        self.descriptor = descriptor
        self._df = df
        self.derivedcat = registry or DerivedVariableRegistry()
        self._requested_variables = requested_variables or []
        self.sep = sep
        # _df is immutable per instance, so the group-attr profile (a
        # catalog aggregation job) and the key list are computed at most
        # once per datastore
        self._attrs_cache: list[str] | None = None
        self._keys_cache: list[str] | None = None
        self._validate_registry()

    # -- construction --------------------------------------------------------

    @classmethod
    def from_json(
        cls,
        spark: SparkSession,
        json_path: str,
        registry: DerivedVariableRegistry | None = None,
        sep: str = ".",
    ) -> "ESMDataStore":
        desc = ESMCatalogDescriptor.load(json_path)
        df, _ = catalog_io.load_catalog(spark, desc)
        return cls(spark, desc, df, registry=registry, sep=sep)

    @classmethod
    def from_dict(
        cls,
        spark: SparkSession,
        obj: dict[str, Any],
        registry: DerivedVariableRegistry | None = None,
        sep: str = ".",
    ) -> "ESMDataStore":
        desc = ESMCatalogDescriptor.from_dict(obj)
        df, _ = catalog_io.load_catalog(spark, desc)
        return cls(spark, desc, df, registry=registry, sep=sep)

    def _validate_registry(self) -> None:
        """Derived queries must reference the variable column and known
        columns; requires aggregation_control (reference core.py:155-170)."""
        if not len(self.derivedcat):
            return
        if self.descriptor.aggregation_control is None:
            raise ValueError(
                "derived variables require a descriptor with aggregation_control"
            )
        var_col = self.descriptor.variable_column_name
        cols = set(self.df.columns)
        for name, dv in self.derivedcat.items():
            if var_col not in dv.query:
                raise ValueError(
                    f"derived variable {name!r} query must include the "
                    f"variable column {var_col!r}"
                )
            unknown = sorted(set(dv.query) - cols)
            if unknown:
                raise ValueError(
                    f"derived variable {name!r} query has unknown columns {unknown}"
                )

    # -- basic introspection ---------------------------------------------------

    @property
    def df(self) -> DataFrame:
        return self._df

    @property
    def iterable_columns(self) -> set[str]:
        return {
            f.name
            for f in self._df.schema.fields
            if isinstance(f.dataType, T.ArrayType)
        }

    @property
    def has_multiple_variable_assets(self) -> bool:
        var_col = self.descriptor.variable_column_name
        return var_col is not None and var_col in self.iterable_columns

    def __repr__(self) -> str:
        return (
            f"<ESMDataStore {self.descriptor.id or '(unnamed)'}: "
            f"{len(self)} dataset group(s)>"
        )

    # -- grouping / keys -------------------------------------------------------

    def _effective_attrs(self) -> list[str]:
        if self._attrs_cache is None:
            self._attrs_cache = grouping.effective_groupby_attrs(
                self._df,
                self.descriptor.groupby_attrs,
                self.descriptor.aggregation_control is not None,
            )
        return self._attrs_cache

    @property
    def key_template(self) -> str:
        attrs = self._effective_attrs()
        return self.sep.join(attrs)

    def keys(self) -> list[str]:
        if self._keys_cache is None:
            attrs = self._effective_attrs()
            keys_df = grouping.group_keys(self._df, attrs, self.sep).select("key")
            self._keys_cache = sorted(
                r["key"] for r in self._bounded_key_collect(keys_df, "keys()")
            )
        return self._keys_cache

    def _bounded_key_collect(self, keys_df: DataFrame, api: str) -> list:
        """Guarded driver-side collect for APIs whose CONTRACT is a Python
        list/dict keyed by dataset group (keys(), to_dataset_dict(), mirroring
        the reference's dict-of-datasets API). The collect is bounded by
        dataset-GROUP count, not rows — generous for any real catalog (the
        reference's largest cited catalog has ~27k assets) — but a catalog
        whose groupby attrs have pathological cardinality gets a diagnostic
        steering to keys_info() (a DataFrame) instead of a driver OOM."""
        rows = keys_df.limit(MAX_DATASET_KEYS + 1).collect()
        if len(rows) > MAX_DATASET_KEYS:
            raise ValueError(
                f"{api} would materialize more than {MAX_DATASET_KEYS:,} "
                "dataset keys on the driver. This catalog's groupby attrs "
                "produce pathological group cardinality — use keys_info() "
                "(a DataFrame) or coarser groupby_attrs instead."
            )
        return rows

    def keys_info(self) -> DataFrame:
        """One row per dataset key with its group attribute values."""
        attrs = self._effective_attrs()
        return grouping.group_keys(self._df, attrs, self.sep)

    def attrs_for(self, key: str) -> dict[str, Any]:
        """Dataset metadata for one group: ``<attrs_prefix>:<attr> -> value``
        plus the dataset key (reference F10, source.py:140-150)."""
        from intake_esm_spark.options import OPTIONS

        attrs = self._effective_attrs()
        rows = (
            grouping.group_keys(self._df, attrs, self.sep)
            .filter(F.col("key") == key)
            .collect()
        )
        if not rows:
            raise KeyError(key)
        row = rows[0]
        prefix = OPTIONS["attrs_prefix"]
        out = {f"{prefix}:{a}": row[a] for a in attrs}
        out[OPTIONS["dataset_key"]] = key
        return out

    def __len__(self) -> int:
        attrs = self._effective_attrs()
        return self._df.select(*attrs).distinct().count()

    def __contains__(self, key: str) -> bool:
        return key in set(self.keys())

    def __getitem__(self, key: str) -> DataFrame:
        """Catalog rows of one dataset group (reference: the records that
        feed one ESMDataSource, core.py:311-341). An unknown key raises
        KeyError like the reference (core.py:343-345) — a silently empty
        DataFrame gives downstream code zero rows with no diagnostic.
        The key list is cached per instance, so repeated access costs no
        extra jobs."""
        if key not in self:
            raise KeyError(
                f"{key!r} not found in catalog; available keys: {self.keys()[:20]}"
            )
        attrs = self._effective_attrs()
        return self._df.filter(grouping.key_column(attrs, self.sep) == key)

    # -- profiling ---------------------------------------------------------------

    def unique(self) -> dict[str, list]:
        out = grouping.unique(self._df)
        var_col = self.descriptor.variable_column_name
        if var_col and len(self.derivedcat):
            out[f"derived_{var_col}"] = sorted(self.derivedcat.keys())
        return out

    def nunique(self, exact: bool = True) -> dict[str, int]:
        out = grouping.nunique(self._df, exact=exact)
        var_col = self.descriptor.variable_column_name
        if var_col and len(self.derivedcat):
            out[f"derived_{var_col}"] = len(self.derivedcat)
        return out

    # -- search --------------------------------------------------------------------

    def search(
        self, require_all_on: str | list[str] | None = None, **query: Any
    ) -> "ESMDataStore":
        """Multi-column predicate search + optional relational division +
        derived-variable dependency expansion. Returns a new datastore over
        the filtered (still lazy) DataFrame."""
        q = Query.normalize(query, self._df.columns, require_all_on)
        results = base_search(self._df, q)
        if q.require_all_on and q.query:
            results = apply_require_all_on(results, q, self.iterable_columns)

        # derived-variable expansion (reference core.py:464-493)
        var_col = self.descriptor.variable_column_name
        variables = query.get(var_col) if var_col else None
        if variables is not None and not isinstance(variables, (list, tuple, set)):
            variables = [variables]
        dependents: list[str] = []
        derived_subset: dict[str, Any] = {}
        if variables:
            rest = {k: v for k, v in query.items() if k != var_col}
            for name, dv in self.derivedcat.items():
                if name in variables:
                    dep_query = {**dv.query, **rest}
                    dq = Query.normalize(dep_query, self._df.columns, require_all_on)
                    res = base_search(self._df, dq)
                    if dq.require_all_on and dq.query:
                        res = apply_require_all_on(res, dq, self.iterable_columns)
                    results = results.unionByName(res)
                    dependents.extend(dv.dependent_variables(var_col))
                    derived_subset[name] = dv
            if derived_subset:
                # dedup only when derived results were actually merged
                # (reference gates on query_results, core.py:490-493) —
                # a plain variable search must neither drop legitimate
                # duplicate catalog rows nor pay a full-width shuffle
                results = results.dropDuplicates()

        new_desc = copy.deepcopy(self.descriptor)
        new_desc.catalog_file = None
        new_desc.catalog_dict = None
        if self.has_multiple_variable_assets:
            # no sort: variables may mix str and re.Pattern (reference
            # supports compiled-pattern variable queries, core.py docstring)
            requested = list(dict.fromkeys(list(variables or []) + dependents))
        else:
            requested = []
        if variables is not None:
            reg = DerivedVariableRegistry()
            reg._registry = derived_subset
        else:
            reg = self.derivedcat
        out = self.__class__(
            self.spark,
            new_desc,
            results,
            registry=reg,
            requested_variables=requested,
            sep=self.sep,
        )
        return out

    # -- dataset assembly -------------------------------------------------------------

    def to_dataset_dict(
        self,
        aggregate: bool = True,
        skip_on_error: bool = False,
        requested_variables: list[str] | None = None,
        sep: str | None = None,
        preprocess: Any | None = None,
    ) -> dict[str, DataFrame]:
        """Assemble each dataset group into a long-format DataFrame.

        All groups share ONE scan plan; the dict values are key-filtered
        views of it (cheap — Catalyst prunes files by the pushed key
        predicate when assets are partitioned by group attrs).

        ``preprocess`` (reference U4, core.py:611 / source.py:105-111): a
        ``DataFrame -> DataFrame`` transformation applied to the combined
        long-format rows before grouping — the Spark-idiomatic equivalent
        of the per-asset xarray preprocess (rows carry their group/asset
        attributes, so per-asset logic is a filter away).
        """
        sep = sep or self.sep
        if self._df.isEmpty():
            return {}
        combined, attrs = self._combined_plan(aggregate, requested_variables, sep=sep)
        if preprocess is not None:
            combined = preprocess(combined)
            # a preprocess may drop whole groups, so only then is a key
            # probe of the combined rows needed
            keys = [
                r["key"]
                for r in self._bounded_key_collect(
                    combined.select("key").distinct(), "to_dataset_dict()"
                )
            ]
        else:
            # keys come from the CATALOG — one metadata-scale job, never
            # a distinct scan over asset-scale data (same reasoning as
            # _catalog_dataset_variables)
            keys = [
                r["key"]
                for r in self._bounded_key_collect(
                    grouping.group_keys(self._df, attrs, sep).select("key"),
                    "to_dataset_dict()",
                )
            ]
        datasets = {k: combined.filter(F.col("key") == k) for k in sorted(keys)}
        var_col = self.descriptor.variable_column_name
        if len(self.derivedcat) and var_col:
            long_var_col = "variable" if "variable" in combined.columns else var_col
            # per-group variable sets come from the CATALOG — one
            # metadata-scale aggregation job — instead of a distinct() probe
            # scan of every dataset's asset rows (one full-data job per
            # group). A user preprocess may add/drop variables the catalog
            # cannot know about, so only then fall back to probing.
            dataset_variables = None
            if preprocess is None:
                dataset_variables = self._catalog_dataset_variables(
                    attrs, sep, requested_variables
                )
            datasets = self.derivedcat.update_datasets(
                datasets,
                long_var_col,
                skip_on_error=skip_on_error,
                dataset_variables=dataset_variables,
            )
        return datasets

    def _catalog_dataset_variables(
        self,
        attrs: list[str],
        sep: str,
        requested_variables: list[str] | None,
    ) -> dict[str, set[str]]:
        """Per-dataset-key variable sets read off the catalog table.

        The catalog declares which variables each asset carries, so the
        union per group key is one tiny aggregation over catalog rows —
        derived-variable application then needs ZERO extra scans of asset
        data. Respects the requested-variables projection (literal names
        and compiled patterns) exactly as combine.open_asset_union applies
        it to the data rows."""
        import re as _re

        var_col = self.descriptor.variable_column_name
        keyed = self._df.withColumn(
            "key", F.concat_ws(sep, *[F.col(a).cast("string") for a in attrs])
        )
        if isinstance(keyed.schema[var_col].dataType, T.ArrayType):
            agg = F.array_distinct(
                F.array_compact(F.flatten(F.collect_set(F.col(var_col))))
            )
        else:
            agg = F.collect_set(F.col(var_col))
        rows = keyed.groupBy("key").agg(agg.alias("__vars")).collect()
        out = {r["key"]: set(r["__vars"] or []) for r in rows}
        requested = requested_variables or self._requested_variables or None
        if requested:
            literals = {v for v in requested if isinstance(v, str)}
            patterns = [p for p in requested if isinstance(p, _re.Pattern)]
            out = {
                k: {
                    v
                    for v in vs
                    if v in literals or any(p.search(v) for p in patterns)
                }
                for k, vs in out.items()
            }
        return out

    def _combined_plan(
        self,
        aggregate: bool,
        requested_variables: list[str] | None,
        sep: str | None = None,
    ) -> tuple[DataFrame, list[str]]:
        sep = sep or self.sep
        desc = self.descriptor
        if not aggregate:
            desc = copy.deepcopy(desc)
            if desc.aggregation_control:
                desc.aggregation_control.groupby_attrs = []
        attrs = grouping.effective_groupby_attrs(
            self._df, desc.groupby_attrs, desc.aggregation_control is not None
        )
        requested = requested_variables or self._requested_variables or None
        # the public key is computed on the CATALOG side (its attrs may
        # collide with asset data columns, e.g. `variable`), then attached
        # to asset rows through the broadcast join; asset-path resolution
        # (exact files vs pruned directory scans) happens inside
        # open_asset_union so a huge catalog never lists every asset on
        # the driver
        cat_keyed = self._df.withColumn(
            "key", F.concat_ws(sep, *[F.col(a).cast("string") for a in attrs])
        )
        combined = open_asset_union(
            self.spark,
            cat_keyed,
            desc,
            requested_variables=requested,
            extra_catalog_columns=["key"] + attrs,
        )
        return combined, attrs

    def to_dataframe(
        self,
        aggregate: bool = True,
        requested_variables: list[str] | None = None,
    ) -> DataFrame:
        """The whole result as ONE DataFrame with a ``key`` column — the
        scale-friendly alternative to a dict of datasets (and the analogue
        of ``to_dask`` when exactly one group matches)."""
        combined, _ = self._combined_plan(aggregate, requested_variables)
        return combined

    def to_datatree(self, **kwargs: Any) -> dict[str, DataFrame]:
        """Dataset dict keyed by '/'-joined paths (reference core.py:765-867).
        Passes sep through rather than mutating shared state — a
        concurrent reader of this datastore must never observe '/'."""
        kwargs.setdefault("sep", "/")
        return self.to_dataset_dict(**kwargs)

    def to_dask(self, **kwargs: Any) -> DataFrame:
        """Single-dataset accessor: errors unless exactly one group
        (reference core.py:869-894)."""
        if len(self) != 1:
            raise ValueError(
                "expected exactly one dataset group; use to_dataset_dict()"
            )
        datasets = self.to_dataset_dict(**kwargs)
        return next(iter(datasets.values()))

    def to_parquet(
        self,
        path: str,
        partition_by: list[str] | None = None,
        mode: str = "overwrite",
        requested_variables: list[str] | None = None,
    ) -> None:
        """Materialize the assembled result as parquet partitioned by the
        group attributes (default) — the scale-path sink: downstream reads
        of one dataset group become partition-pruned scans, and re-assembly
        never touches the other groups' files."""
        combined, attrs = self._combined_plan(True, requested_variables)
        partition_by = partition_by if partition_by is not None else attrs
        writer = combined.write.mode(mode)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)

    def to_pandas(self, limit: int | None = 10_000):
        """Driver-side pandas view of the CATALOG table (display boundary,
        reference keeps pandas for repr — core.py:240-248). Guarded by a
        limit so a 100 TB-scale catalog can't flatten the driver."""
        df = self._df.limit(limit) if limit is not None else self._df
        return df.toPandas()

    # -- serialization ------------------------------------------------------------------

    def serialize(
        self,
        name: str,
        directory: str = ".",
        catalog_type: str = "dict",
        file_format: str = "csv",
        compression: str | None = None,
    ) -> str:
        return catalog_io.save_catalog(
            self._df,
            self.descriptor,
            name,
            directory,
            catalog_type=catalog_type,
            file_format=file_format,
            compression=compression,
        )


def open_esm_datastore(
    obj: str | dict[str, Any],
    spark: SparkSession | None = None,
    registry: DerivedVariableRegistry | None = None,
    sep: str = ".",
) -> ESMDataStore:
    """Open a catalog from a JSON path or a descriptor dict
    (reference core.py:139-146 dispatch)."""
    if spark is None:
        from intake_esm_spark.session import get_spark

        spark = get_spark()
    if isinstance(obj, str):
        return ESMDataStore.from_json(spark, obj, registry=registry, sep=sep)
    if isinstance(obj, dict):
        return ESMDataStore.from_dict(spark, obj, registry=registry, sep=sep)
    raise TypeError(f"cannot open a datastore from {type(obj)!r}")
