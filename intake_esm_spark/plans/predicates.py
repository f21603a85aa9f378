"""Predicate compiler: search query -> one Catalyst filter expression.

Semantics follow the reference's pure search function
(/root/reference/intake_esm/_search.py:32-58):

* per column: OR-mask over the query's value list
* across columns: AND of the per-column masks
* EMPTY QUERY -> EMPTY RESULT (not the full catalog; _search.py:37-38)
* value kinds:
    - NaN/None        -> IS NULL                      (_search.py:51-52)
    - regex pattern   -> substring regex search, only on string columns
                         (_search.py:49-50; pandas str.contains ==
                         Java regex find(), i.e. Spark rlike)
    - iterable column -> collection membership; regex detection bypassed
                         (_search.py:45-48)
    - anything else   -> equality
* ``is_pattern``: has unescaped ``* ? $ ^`` or is a compiled re.Pattern
  (_search.py:19-29). Compiled patterns carry their flags — IGNORECASE maps
  to an inline ``(?i)`` (java.util.regex understands inline flags).

The whole query compiles to a single Column expression, so Catalyst can push
it into the parquet/CSV scan — at 100 TB the filter runs inside the scan,
not as a post-pass.
"""

from __future__ import annotations

import re
from functools import reduce
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from intake_esm_spark.plans.query import Query, is_na

_UNESCAPED_PATTERN_CHARS = re.compile(r"(^|[^\\])[\*\?\$\^]")


def is_pattern(value: Any) -> bool:
    """True if the value should be treated as a regex (reference:
    _search.py:19-29): a compiled pattern, or a string containing an
    unescaped ``*``, ``?``, ``$`` or ``^``."""
    if isinstance(value, re.Pattern):
        return True
    if not isinstance(value, str):
        return False
    return bool(_UNESCAPED_PATTERN_CHARS.search(value))


def to_java_regex(value: str | re.Pattern) -> str:
    """Python regex -> Java regex for ``rlike``.

    The dialects agree on the subset the reference documents (wildcards,
    anchors, classes, ``\\d`` etc.). Two shims:
    * compiled-pattern flags -> inline flags (``(?i)`` / ``(?s)`` / ``(?m)``)
    * Python named groups ``(?P<n>...)`` -> Java ``(?<n>...)``
    """
    if isinstance(value, re.Pattern):
        flags = ""
        if value.flags & re.IGNORECASE:
            flags += "i"
        if value.flags & re.DOTALL:
            flags += "s"
        if value.flags & re.MULTILINE:
            flags += "m"
        pat = _translate_syntax(value.pattern)
        return f"(?{flags}){pat}" if flags else pat
    return _translate_syntax(str(value))


def _translate_syntax(pat: str) -> str:
    pat = pat.replace("(?P<", "(?<")
    return re.sub(r"\(\?P=(\w+)\)", r"\\k<\1>", pat)


def column_mask(
    col_name: str,
    values: list[Any],
    dtype: T.DataType,
    is_iterable: bool,
) -> Column:
    """OR-mask over one column's query values (reference _search.py:41-55)."""
    col = F.col(col_name)
    if not values:
        # an empty value list matches nothing (reference: an all-False
        # local mask, _search.py:41-55)
        return F.lit(False)
    masks: list[Column] = []
    for value in values:
        # iterable branch FIRST, mirroring the reference's branch order
        # (_search.py:46-52): a null value against an iterable column
        # matches NOTHING there (str.contains(None) yields an all-NaN
        # mask that collapses to False under pandas logical ops), not
        # NULL cells
        if is_iterable and is_na(value):
            masks.append(F.lit(False))
        elif is_iterable:
            if isinstance(value, re.Pattern):
                # extension: a compiled pattern against an iterable column
                # matches ELEMENTS by regex (the reference raises on this
                # combination — pandas str.contains(compiled, regex=False))
                pat = to_java_regex(value)
                masks.append(
                    F.exists(col, lambda x: x.rlike(pat))
                )
            else:
                # membership in the cell's collection; string wildcards
                # explicitly bypassed (reference regex=False,
                # _search.py:47-48)
                masks.append(F.array_contains(col, value))
        elif is_na(value):
            masks.append(col.isNull())
        elif is_pattern(value) and isinstance(dtype, T.StringType):
            masks.append(col.rlike(to_java_regex(value)))
        else:
            masks.append(col == F.lit(value))
    return reduce(lambda a, b: a | b, masks)


def compile_query(df: DataFrame, query: Query) -> Column | None:
    """Build the full filter expression, or None for the empty query
    (caller returns an empty frame — reference _search.py:37-38)."""
    if not query.query:
        return None
    dtype_by_col = {f.name: f.dataType for f in df.schema.fields}
    masks = [
        column_mask(
            col,
            values,
            dtype_by_col[col],
            isinstance(dtype_by_col[col], T.ArrayType),
        )
        for col, values in query.query.items()
    ]
    return reduce(lambda a, b: a & b, masks)


def search(df: DataFrame, query: Query) -> DataFrame:
    """Apply the base search (no require_all_on): one ``filter`` call,
    fully pushdown-eligible."""
    mask = compile_query(df, query)
    if mask is None:
        return df.limit(0)
    return df.filter(mask)
