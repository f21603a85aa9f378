"""Asset readers: format dispatch for the data files the catalog points at.

The reference's ``_open_dataset`` dispatches per-row on ``data_format``
(netcdf / zarr / kerchunk-reference / opendap, source.py:70-137). This
engine's native asset format is **long-format parquet** (FIXTURES.md §8);
the other formats keep the same dispatch slot:

* ``parquet`` / ``csv`` — native Spark scans, glob-capable (S7: a '*' in
  the path or a directory is handled by Spark's file index).
* ``netcdf`` / ``zarr*`` — xarray-backed ingestion via Arrow
  ``mapInPandas``: each task opens its file(s) and emits long-format rows.
  Gated behind an import-try: the container has no netCDF/zarr codecs, so
  the reader raises ``FormatNotAvailable`` with the plumbing (schema,
  batching, dispatch) in place and unit-tested via the error path.
* ``reference`` — a kerchunk-style MANIFEST source: a JSON file listing
  member files; the scan reads the referenced files (S9's manifest -> file
  list -> scan pattern, natively useful for parquet too).
* ``opendap`` — remote-protocol stub (S10), same gate.
"""

from __future__ import annotations

import json
import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LONG_FORMAT_SCHEMA = (
    "variable string, time timestamp, lat double, lon double, value double, "
    "__asset_path string"
)


class FormatNotAvailable(NotImplementedError):
    """The codec for this asset format is not installed in this environment."""


def read_parquet_assets(spark: SparkSession, paths: list[str]) -> DataFrame:
    return spark.read.parquet(*paths)


def read_csv_assets(spark: SparkSession, paths: list[str]) -> DataFrame:
    return spark.read.csv(paths, header=True, inferSchema=True)


def read_manifest_assets(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Kerchunk-style 'reference' source: each path is a JSON manifest with
    {"files": ["/abs/one.parquet", ...]}; the scan targets the union of all
    referenced files. The manifest is metadata (driver-side read is right);
    the data scan stays distributed."""
    files: list[str] = []
    for p in paths:
        with open(p) as f:
            manifest = json.load(f)
        files.extend(manifest["files"])
    if not files:
        raise ValueError(f"manifests {paths} reference no files")
    return spark.read.parquet(*files)


_TAR_STAGE_CACHE: dict[str, str] = {}


def is_tar_url(path: str) -> bool:
    return isinstance(path, str) and path.startswith("tar://")


def stage_tar_url(url: str) -> str:
    """Resolve a ``tar://member::archive`` chain URL (the reference's
    fsspec form, source.py:100; test_source.py:58-75) to a local extracted
    file, via stdlib ``tarfile`` — no fsspec dependency needed.

    Staging is performed on the DRIVER and cached per (archive, member,
    archive mtime+size) — a rewritten archive re-stages instead of
    serving a stale member. Staged dirs are removed at interpreter exit.
    Extraction uses the 'data' filter (with an equivalent manual guard on
    interpreters predating the backport), so a malicious member path
    (absolute / ``..``) raises instead of escaping the staging dir.

    Deployment note: the staged file is subsequently read by a Spark
    scan, so on a MULTI-NODE cluster the staging directory must be on a
    filesystem the executors can also see — set
    ``SPARK_GRAFT_TAR_STAGE_DIR`` to a shared mount (NFS/posix-mounted
    object store). Local mode (and any shared-FS cluster) needs nothing.
    Tar is not splittable, so archive members are inherently
    metadata-scale inputs — a 100 TB corpus belongs in a splittable
    container (parquet directories), not a tarball; MIGRATION.md says so
    explicitly.
    """
    import atexit
    import shutil
    import tarfile
    import tempfile

    body = url[len("tar://") :]
    member, sep, archive = body.partition("::")
    if not sep or not member or not archive:
        raise ValueError(
            f"malformed tar URL {url!r}; expected tar://member::archive"
        )
    stat = os.stat(archive)
    key = f"{archive}::{member}::{stat.st_mtime_ns}::{stat.st_size}"
    if key not in _TAR_STAGE_CACHE:
        base = os.environ.get("SPARK_GRAFT_TAR_STAGE_DIR")
        out_dir = tempfile.mkdtemp(prefix="tar_stage_", dir=base)
        atexit.register(shutil.rmtree, out_dir, ignore_errors=True)
        with tarfile.open(archive) as tf:
            try:
                tf.extract(member, path=out_dir, filter="data")
            except TypeError:
                # 'filter' kwarg needs >=3.10.12/3.11.4; equivalent guard
                parts = member.replace("\\", "/").split("/")
                if member.startswith(("/", "\\")) or ".." in parts:
                    raise ValueError(
                        f"tar member path {member!r} escapes the staging dir"
                    ) from None
                tf.extract(member, path=out_dir)
        _TAR_STAGE_CACHE[key] = os.path.join(out_dir, member)
    return _TAR_STAGE_CACHE[key]


def _require(module: str, fmt: str):
    try:
        return __import__(module)
    except ImportError as exc:
        raise FormatNotAvailable(
            f"asset format {fmt!r} needs {module!r}, which is not installed; "
            "the dispatch plumbing is in place — install the codec to enable"
        ) from exc


def _xarray_long_format(spark: SparkSession, paths: list[str], opener: str) -> DataFrame:
    """Shared xarray ingestion kernel: one task per file/store via
    mapInPandas, each emitting long-format Arrow batches. ``opener`` names
    the xarray entry point ('open_dataset' / 'open_zarr') so the closure
    stays picklable without capturing modules. Coordinate columns absent
    from a store (e.g. a zarr cube with no 'lat') are reindexed to null —
    the long-format schema is fixed, not per-file."""
    paths_df = spark.createDataFrame([(p,) for p in paths], ["__path"]).repartition(
        min(len(paths), 256)
    )
    out_cols = ["variable", "time", "lat", "lon", "value", "__asset_path"]

    def _open(batches):
        import pandas as pd  # noqa: F401
        import xarray as xr

        open_fn = getattr(xr, opener)
        for pdf in batches:
            for p in pdf["__path"]:
                ds = open_fn(p)
                long = ds.to_dataframe().reset_index().melt(
                    id_vars=[c for c in ("time", "lat", "lon") if c in ds.coords],
                    var_name="variable",
                    value_name="value",
                )
                long["__asset_path"] = p
                yield long.reindex(columns=out_cols)

    return paths_df.mapInPandas(_open, LONG_FORMAT_SCHEMA)


def read_netcdf_assets(spark: SparkSession, paths: list[str]) -> DataFrame:
    """netCDF -> long format via xarray inside mapInPandas (one task per
    file, Arrow batches out). Runs only where xarray+netCDF4 exist."""
    _require("xarray", "netcdf")
    _require("netCDF4", "netcdf")
    return _xarray_long_format(spark, paths, "open_dataset")


def read_zarr_assets(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Zarr store -> long format through the same xarray kernel as netCDF.
    Import-gated: this container has neither xarray nor zarr (PARITY.md S8
    records the attempt), so only the gate executes here; enabling the
    codec is a zero-code change."""
    _require("xarray", "zarr")
    _require("zarr", "zarr")
    return _xarray_long_format(spark, paths, "open_zarr")


def read_opendap_assets(spark: SparkSession, paths: list[str]) -> DataFrame:
    raise FormatNotAvailable(
        "opendap assets need a remote netCDF client; not available here"
    )


READERS: dict[str, Callable[[SparkSession, list[str]], DataFrame]] = {
    "parquet": read_parquet_assets,
    "csv": read_csv_assets,
    "reference": read_manifest_assets,
    "netcdf": read_netcdf_assets,
    "zarr": read_zarr_assets,
    "zarr2": read_zarr_assets,
    "zarr3": read_zarr_assets,
    "opendap": read_opendap_assets,
}


def read_assets(spark: SparkSession, fmt: str, paths: list[str]) -> DataFrame:
    if fmt not in READERS:
        raise ValueError(f"unknown asset format {fmt!r}; known: {sorted(READERS)}")
    return READERS[fmt](spark, paths)
