"""Catalog table readers/writers: CSV / parquet / inline records.

Re-expresses the reference's ``CatalogFileDataReader`` + ``save``
(/root/reference/intake_esm/cat.py:153-236, 582-691) on Spark:

* CSV is read with Spark schema inference (numeric facets like ``scode``
  or ``member_id`` arrive typed, matching the reference's pandas fallback,
  cat.py:617-628 — note this re-types zero-padded string facets like
  '001'); iterable columns are decoded JVM-side with a ``regexp_replace``
  chain + ``from_json`` — the Spark analogue of the reference's polars
  string-surgery + ``json_decode`` (cat.py:652-682). No Python UDFs
  anywhere on this path.
* Parquet is self-describing; array columns arrive typed.
* The original Python container kind (list/tuple/set) of each iterable
  column is kept in the descriptor's ``iterable_dtypes`` and restored on
  save (reference: cat.py:124, 215-216, round-trip test
  tests/test_cat.py:148-177). Sets are stored ``array_sort``-ed since they
  are unordered.
* Compression is inferred from the file extension (cat.py:221-223); Spark
  reads .gz/.bz2 CSV natively, so no pandas fallback is needed.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from intake_esm_spark.sources.descriptor import ESMCatalogDescriptor

_ITERABLE_CELL_RE = re.compile(r"^\s*[\[({].*[\])}]\s*$", re.DOTALL)

_COMPRESSION_BY_EXT = {".gz": "gzip", ".bz2": "bzip2", ".zip": "zip", ".xz": "xz"}


def _strip_compression_ext(path: str) -> str:
    base, ext = os.path.splitext(path)
    return base if ext in _COMPRESSION_BY_EXT else path


def infer_format(path: str) -> str:
    """'csv' | 'parquet' from the (possibly compressed) file name."""
    stem = _strip_compression_ext(path)
    ext = os.path.splitext(stem)[1].lower()
    if ext in (".csv", ".txt", ""):
        return "csv"
    if ext in (".parquet", ".pq"):
        return "parquet"
    raise ValueError(f"cannot infer catalog file format from {path!r}")


def decode_iterable_column(col_name: str) -> F.Column:
    """Column expression turning a serialized Python-collection string like
    ``"('SHF', 'REGION_MASK')"`` / ``"['a']"`` / ``"{'x', 'y'}"`` into
    ``array<string>``.

    Same normalization steps as the reference's polars path (cat.py:652-682):
    bracket unification, quote swap, trailing-comma strip — then a JSON
    decode, all as Catalyst expressions.
    """
    c = F.col(col_name)
    # ( { -> [   and   ) } -> ]
    c = F.regexp_replace(c, r"^\s*[\(\{]", "[")
    c = F.regexp_replace(c, r"[\)\}]\s*$", "]")
    # single-item tuple trailing comma: ['SHF',] -> ['SHF']
    c = F.regexp_replace(c, r",\s*\]$", "]")
    # single -> double quotes (catalog values are identifiers; embedded
    # quotes are out of the reference's supported space too)
    c = F.regexp_replace(c, r"'", '"')
    return F.from_json(c, T.ArrayType(T.StringType())).alias(col_name)


def sniff_iterable_columns(df: DataFrame, string_cols: list[str] | None = None) -> dict[str, str]:
    """Probe ONE row to find serialized-collection string columns, returning
    {column: container_kind}. Mirrors the reference's 1-row head probe
    (cat.py:559-568) — a LIMIT 1 scan, never a full pass.
    """
    if string_cols is None:
        string_cols = [f.name for f in df.schema.fields if isinstance(f.dataType, T.StringType)]
    if not string_cols:
        return {}
    rows = df.select(*string_cols).limit(1).collect()
    if not rows:
        return {}
    row = rows[0]
    out: dict[str, str] = {}
    for c in string_cols:
        v = row[c]
        if isinstance(v, str) and _ITERABLE_CELL_RE.match(v):
            first = v.lstrip()[0]
            out[c] = {"[": "list", "(": "tuple", "{": "set"}[first]
    return out


def read_catalog_csv(
    spark: SparkSession,
    path: str,
    iterable_dtypes: dict[str, str] | None = None,
) -> tuple[DataFrame, dict[str, str]]:
    """Read a catalog CSV (optionally .gz/.bz2) into a DataFrame, decoding
    iterable columns to ``array<string>``. Returns (df, iterable_dtypes).
    """
    raw = spark.read.csv(path, header=True, inferSchema=True)
    # inferSchema gives numerics proper types; collection cells stay strings
    dtypes = dict(iterable_dtypes) if iterable_dtypes else sniff_iterable_columns(raw)
    if not dtypes:
        return raw, {}
    cols = [
        decode_iterable_column(c) if c in dtypes else F.col(c)
        for c in raw.columns
    ]
    return raw.select(*cols), dtypes


def read_catalog_parquet(
    spark: SparkSession, path: str, iterable_dtypes: dict[str, str] | None = None
) -> tuple[DataFrame, dict[str, str]]:
    df = spark.read.parquet(path)
    dtypes = dict(iterable_dtypes or {})
    if not dtypes:
        # arrays are typed in parquet; record them as lists by default
        dtypes = {
            f.name: "list"
            for f in df.schema.fields
            if isinstance(f.dataType, T.ArrayType)
        }
    return df, dtypes


def read_catalog_dict(
    spark: SparkSession, records: list[dict[str, Any]]
) -> tuple[DataFrame, dict[str, str]]:
    """Inline ``catalog_dict`` records -> DataFrame (reference: cat.py:274-278).

    Tiny driver-side payload by definition (it is embedded in the JSON).
    """
    dtypes: dict[str, str] = {}
    norm: list[dict[str, Any]] = []
    for rec in records:
        r = dict(rec)
        for k, v in r.items():
            if isinstance(v, (list, tuple, set)):
                dtypes.setdefault(
                    k, "tuple" if isinstance(v, tuple) else "set" if isinstance(v, set) else "list"
                )
                r[k] = sorted(v) if isinstance(v, set) else list(v)
        norm.append(r)
    df = spark.createDataFrame(norm)  # type: ignore[arg-type]
    return df, dtypes


def load_catalog(
    spark: SparkSession, desc: ESMCatalogDescriptor
) -> tuple[DataFrame, dict[str, str]]:
    """Dispatch on descriptor contents (reference: cat.py:266-282, 598-612)."""
    if desc.catalog_dict is not None:
        df, dtypes = read_catalog_dict(spark, desc.catalog_dict)
    elif desc.catalog_file is not None:
        cat_file = desc.catalog_file
        if cat_file.startswith("tar://"):
            # archive-member catalog (reference S11): stage the member
            # driver-side — a catalog table is metadata-scale by contract
            from intake_esm_spark.sources.assets import stage_tar_url

            cat_file = stage_tar_url(cat_file)
        fmt = infer_format(cat_file)
        if fmt == "csv":
            df, dtypes = read_catalog_csv(spark, cat_file, desc.iterable_dtypes or None)
        else:
            df, dtypes = read_catalog_parquet(spark, cat_file, desc.iterable_dtypes or None)
    else:
        raise ValueError("descriptor has neither catalog_file nor catalog_dict")
    if not desc.iterable_dtypes:
        desc.iterable_dtypes = dtypes
    return df, dtypes


# -- save (sink) -------------------------------------------------------------


def _encode_iterable_column(col_name: str, kind: str) -> F.Column:
    """array<string> -> the original serialized Python repr for CSV output.

    NULL cells stay NULL (an empty collection is a different value — the
    old encoding silently wrote '[]'/'()' for NULL and reloaded it as an
    empty collection). Elements containing a quote character raise at
    write time: the quote-swap decoder cannot round-trip them, and a loud
    failure beats silently corrupting the saved catalog."""
    src = F.col(col_name)
    arr = F.array_sort(src) if kind == "set" else src
    checked = F.transform(
        arr,
        lambda x: F.when(
            x.rlike("[\"']"),
            F.raise_error(
                F.concat(
                    F.lit(
                        f"cannot serialize iterable column {col_name!r}: "
                        "element contains a quote character, which the "
                        "CSV codec cannot round-trip: "
                    ),
                    x,
                )
            ),
        ).otherwise(x),
    )
    quoted = F.transform(checked, lambda x: F.concat(F.lit("'"), x, F.lit("'")))
    body = F.concat_ws(", ", quoted)
    if kind == "tuple":
        # single-element tuples need the trailing comma: ('SHF',)
        encoded = F.when(
            F.size(arr) == 1, F.concat(F.lit("("), body, F.lit(",)"))
        ).otherwise(F.concat(F.lit("("), body, F.lit(")")))
    else:
        open_b, close_b = ("{", "}") if kind == "set" else ("[", "]")
        encoded = F.concat(F.lit(open_b), body, F.lit(close_b))
    return F.when(src.isNull(), F.lit(None)).otherwise(encoded).alias(col_name)


def save_catalog(
    df: DataFrame,
    desc: ESMCatalogDescriptor,
    name: str,
    directory: str,
    catalog_type: str = "file",
    file_format: str = "csv",
    compression: str | None = None,
    to_csv_kwargs: dict[str, Any] | None = None,
) -> str:
    """Write the catalog table + JSON descriptor sidecar.

    Reference: ESMCatalogModel.save (cat.py:153-236). ``catalog_type='dict'``
    embeds the records in the JSON; ``'file'`` writes CSV (default) or
    parquet next to it. Iterable columns are re-serialized with their
    original container kind; ``last_updated`` is stamped.

    Spark writes a directory of part files; for the single-file layout the
    reference uses we coalesce(1) and move the part out — catalogs are
    metadata-scale (<<1 GB), so a single output file is the right call even
    at 100 TB of *asset* data.
    """
    import datetime
    import glob
    import shutil

    os.makedirs(directory, exist_ok=True)
    out_desc = ESMCatalogDescriptor.from_dict(desc.to_dict())
    out_desc.id = name
    out_desc.last_updated = datetime.datetime.now(datetime.timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%SZ"
    )
    out_desc.iterable_dtypes = dict(desc.iterable_dtypes)
    json_path = os.path.join(directory, f"{name}.json")

    if catalog_type == "dict":
        encode_df = df
        for col, kind in desc.iterable_dtypes.items():
            if kind == "set" and col in encode_df.columns:
                encode_df = encode_df.withColumn(col, F.array_sort(F.col(col)))
        out_desc.catalog_dict = [r.asDict(recursive=True) for r in encode_df.collect()]
        out_desc.catalog_file = None
        out_desc.save_json(json_path)
        return json_path

    # honor the reference's to_csv_kwargs channel for compression
    # (cat.py:221-224); silently dropping options a user passed is worse
    # than rejecting the ones this writer doesn't support
    if to_csv_kwargs:
        kw = dict(to_csv_kwargs)
        kw_comp = kw.pop("compression", None)
        if kw:
            raise ValueError(
                f"unsupported to_csv_kwargs {sorted(kw)}; this writer "
                "supports only 'compression' (pass Spark CSV options via "
                "the engine API instead)"
            )
        if kw_comp is not None:
            if compression is not None and compression != kw_comp:
                raise ValueError(
                    "conflicting compression settings: "
                    f"compression={compression!r} vs to_csv_kwargs "
                    f"compression={kw_comp!r}"
                )
            compression = kw_comp
    if compression is not None and compression not in ("gzip", "bzip2"):
        raise ValueError(
            f"unsupported compression {compression!r}: the extension map "
            "covers gzip/bzip2 (a mismatched extension would reload as garbage)"
        )
    if file_format == "csv":
        cols = [
            _encode_iterable_column(c, desc.iterable_dtypes[c])
            if c in desc.iterable_dtypes
            else F.col(c)
            for c in df.columns
        ]
        writer = df.select(*cols).coalesce(1).write.mode("overwrite").option("header", True)
        if compression:
            writer = writer.option("compression", compression)
        tmp = os.path.join(directory, f"_{name}_csv_tmp")
        writer.csv(tmp)
        ext = ".csv" + {"gzip": ".gz", "bzip2": ".bz2"}.get(compression or "", "")
        final = os.path.join(directory, f"{name}{ext}")
        part = glob.glob(os.path.join(tmp, "part-*"))[0]
        shutil.move(part, final)
        shutil.rmtree(tmp)
    elif file_format == "parquet":
        tmp = os.path.join(directory, f"_{name}_parquet_tmp")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        final = os.path.join(directory, f"{name}.parquet")
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        shutil.move(part, final)
        shutil.rmtree(tmp)
    else:
        raise ValueError(f"unsupported file_format {file_format!r}")

    out_desc.catalog_file = os.path.basename(final)
    out_desc.catalog_dict = None
    out_desc.save_json(json_path)
    return json_path
