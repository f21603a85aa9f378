"""ESM catalog descriptor model (JSON sidecar) with validation.

Semantics mirror the reference's pydantic models (``ESMCatalogModel``,
``Assets``, ``AggregationControl`` at /root/reference/intake_esm/cat.py:48-134
and the spec at docs/source/reference/esm-catalog-spec.md) re-implemented as
plain dataclasses — the descriptor is a tiny driver-side JSON, so no Spark
machinery is involved until the catalog *table* is read.

Validation rules preserved from the reference:
* ``catalog_file`` XOR ``catalog_dict`` (cat.py:128-134)
* ``assets.column_name`` required; ``format`` XOR ``format_column_name``
  (cat.py:81-88)
* aggregation types limited to {join_new, join_existing, union} (cat.py:46-51)
* iterable-container dtype map (list/tuple/set) remembered for round-trip
  serialization (cat.py:124, 215-216)
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from enum import Enum
from typing import Any


class AggregationType(str, Enum):
    join_new = "join_new"
    join_existing = "join_existing"
    union = "union"


class DataFormat(str, Enum):
    netcdf = "netcdf"
    zarr = "zarr"
    zarr2 = "zarr2"
    zarr3 = "zarr3"
    reference = "reference"
    opendap = "opendap"
    parquet = "parquet"  # native format for this engine's long-format assets
    csv = "csv"


class DescriptorError(ValueError):
    """Raised when a catalog descriptor fails validation."""


@dataclass
class Assets:
    """Which catalog column holds asset paths, and the asset data format.

    Exactly one of ``format`` / ``format_column_name`` must be set
    (reference: cat.py:81-88).
    """

    column_name: str
    format: str | None = None
    format_column_name: str | None = None

    def __post_init__(self) -> None:
        if not self.column_name:
            raise DescriptorError("assets.column_name is required")
        if (self.format is None) == (self.format_column_name is None):
            raise DescriptorError(
                "exactly one of assets.format or assets.format_column_name "
                "must be set"
            )
        if self.format is not None:
            DataFormat(self.format)  # raises ValueError on unknown format

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> Assets:
        return cls(
            column_name=d.get("column_name", ""),
            format=d.get("format"),
            format_column_name=d.get("format_column_name"),
        )

    def to_dict(self) -> dict[str, Any]:
        out: dict[str, Any] = {"column_name": self.column_name}
        if self.format is not None:
            out["format"] = self.format
        if self.format_column_name is not None:
            out["format_column_name"] = self.format_column_name
        return out


@dataclass
class Aggregation:
    """One aggregation rule: how matching assets combine into a dataset.

    Reference: cat.py:53-60; spec esm-catalog-spec.md:143.
    """

    type: AggregationType
    attribute_name: str
    options: dict[str, Any] = field(default_factory=dict)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> Aggregation:
        return cls(
            type=AggregationType(d["type"]),
            attribute_name=d["attribute_name"],
            options=d.get("options") or {},
        )

    def to_dict(self) -> dict[str, Any]:
        return {
            "type": self.type.value,
            "attribute_name": self.attribute_name,
            "options": self.options,
        }


@dataclass
class AggregationControl:
    """Grouping + aggregation declaration (reference: cat.py:62-71)."""

    variable_column_name: str
    groupby_attrs: list[str] = field(default_factory=list)
    aggregations: list[Aggregation] = field(default_factory=list)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> AggregationControl:
        return cls(
            variable_column_name=d["variable_column_name"],
            groupby_attrs=list(d.get("groupby_attrs") or []),
            aggregations=[Aggregation.from_dict(a) for a in d.get("aggregations") or []],
        )

    def to_dict(self) -> dict[str, Any]:
        return {
            "variable_column_name": self.variable_column_name,
            "groupby_attrs": self.groupby_attrs,
            "aggregations": [a.to_dict() for a in self.aggregations],
        }

    def aggregations_of(self, agg_type: AggregationType) -> list[Aggregation]:
        return [a for a in self.aggregations if a.type == agg_type]


@dataclass
class ESMCatalogDescriptor:
    """The catalog JSON descriptor (reference: ESMCatalogModel, cat.py:107-134).

    ``iterable_dtypes`` maps iterable-column name -> original Python container
    kind ("list" | "tuple" | "set"), preserved through save/load exactly as
    the reference's ``_iterable_dtype_map`` (cat.py:124, 215-216).
    """

    esmcat_version: str = "0.1.0"
    id: str = ""
    description: str = ""
    attributes: list[dict[str, Any]] = field(default_factory=list)
    assets: Assets | None = None
    aggregation_control: AggregationControl | None = None
    catalog_file: str | None = None
    catalog_dict: list[dict[str, Any]] | None = None
    last_updated: str | None = None
    iterable_dtypes: dict[str, str] = field(default_factory=dict)

    def __post_init__(self) -> None:
        if self.catalog_file is not None and self.catalog_dict is not None:
            raise DescriptorError(
                "catalog_file and catalog_dict are mutually exclusive"
            )
        for col, kind in self.iterable_dtypes.items():
            if kind not in ("list", "tuple", "set"):
                raise DescriptorError(
                    f"iterable_dtypes[{col!r}] must be list|tuple|set, got {kind!r}"
                )

    # -- construction -------------------------------------------------------

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> ESMCatalogDescriptor:
        assets = Assets.from_dict(d["assets"]) if d.get("assets") else None
        agg = (
            AggregationControl.from_dict(d["aggregation_control"])
            if d.get("aggregation_control")
            else None
        )
        return cls(
            esmcat_version=d.get("esmcat_version", "0.1.0"),
            id=d.get("id", ""),
            description=d.get("description", ""),
            attributes=list(d.get("attributes") or []),
            assets=assets,
            aggregation_control=agg,
            catalog_file=d.get("catalog_file"),
            catalog_dict=d.get("catalog_dict"),
            last_updated=d.get("last_updated"),
            iterable_dtypes=dict(d.get("iterable_dtypes") or {}),
        )

    @classmethod
    def load(cls, json_path: str) -> ESMCatalogDescriptor:
        """Load + validate a descriptor JSON; resolve a relative catalog_file
        against the JSON's own directory (reference: cat.py:318-322)."""
        with open(json_path) as f:
            d = json.load(f)
        desc = cls.from_dict(d)
        json_dir = os.path.dirname(os.path.abspath(json_path))
        if desc.catalog_file and desc.catalog_file.startswith("tar://"):
            # resolve a RELATIVE ARCHIVE part against the JSON's dir (the
            # member part is archive-internal, never a filesystem path)
            member, sep, archive = desc.catalog_file[len("tar://"):].partition("::")
            if sep and archive and "://" not in archive and not os.path.isabs(archive):
                candidate = os.path.join(json_dir, archive)
                if os.path.exists(candidate) or not os.path.exists(archive):
                    desc.catalog_file = f"tar://{member}::{candidate}"
        elif (
            desc.catalog_file
            # other scheme-qualified URLs (s3a://...) are never relative
            and "://" not in desc.catalog_file
            and not os.path.isabs(desc.catalog_file)
        ):
            candidate = os.path.join(json_dir, desc.catalog_file)
            if os.path.exists(candidate) or not os.path.exists(desc.catalog_file):
                desc.catalog_file = candidate
        return desc

    # -- serialization ------------------------------------------------------

    def to_dict(self) -> dict[str, Any]:
        out: dict[str, Any] = {
            "esmcat_version": self.esmcat_version,
            "id": self.id,
            "description": self.description,
            "attributes": self.attributes,
        }
        if self.assets is not None:
            out["assets"] = self.assets.to_dict()
        if self.aggregation_control is not None:
            out["aggregation_control"] = self.aggregation_control.to_dict()
        if self.catalog_file is not None:
            out["catalog_file"] = self.catalog_file
        if self.catalog_dict is not None:
            out["catalog_dict"] = self.catalog_dict
        if self.last_updated is not None:
            out["last_updated"] = self.last_updated
        if self.iterable_dtypes:
            out["iterable_dtypes"] = self.iterable_dtypes
        return out

    def save_json(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2, default=str)

    # -- convenience --------------------------------------------------------

    @property
    def groupby_attrs(self) -> list[str]:
        if self.aggregation_control is None:
            return []
        return self.aggregation_control.groupby_attrs

    @property
    def variable_column_name(self) -> str | None:
        if self.aggregation_control is None:
            return None
        return self.aggregation_control.variable_column_name
