"""Query normalization + validation.

Mirrors the reference's ``QueryModel`` (/root/reference/intake_esm/cat.py:456-489):
* query keys must be catalog columns (error before building any plan)
* scalar values normalized to one-element lists (incl. None / NaN)
* ``require_all_on`` normalized to a list and validated against columns
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field
from typing import Any


class QueryError(ValueError):
    """Raised when a query references unknown columns."""


def is_na(value: Any) -> bool:
    """NULL query marker: None, float NaN, ``pd.NA``, or a numpy NaN scalar
    (reference normalizes all of these via pd.isna — _search.py:51 and
    QueryModel at cat.py:483-488). Collections are never NA (they are value
    lists), so the pandas fallback only sees scalars."""
    if value is None:
        return True
    if isinstance(value, float) and math.isnan(value):
        return True
    if isinstance(value, (str, bytes, list, tuple, set, dict)):
        return False
    try:
        import pandas as pd

        return bool(pd.isna(value))
    except (ImportError, TypeError, ValueError):
        return False


@dataclass
class Query:
    """A normalized search query: {column: [values...]} + require_all_on."""

    query: dict[str, list[Any]] = field(default_factory=dict)
    require_all_on: list[str] = field(default_factory=list)

    @classmethod
    def normalize(
        cls,
        query: dict[str, Any],
        columns: list[str],
        require_all_on: str | list[str] | None = None,
    ) -> Query:
        bad = sorted(set(query) - set(columns))
        if bad:
            raise QueryError(
                f"query keys {bad} not in catalog columns {sorted(columns)}"
            )
        norm: dict[str, list[Any]] = {}
        for col, values in query.items():
            if isinstance(values, (str, re.Pattern)) or not isinstance(
                values, (list, tuple, set)
            ):
                values = [values]
            norm[col] = list(values)
        if require_all_on is None:
            rao: list[str] = []
        elif isinstance(require_all_on, str):
            rao = [require_all_on]
        else:
            rao = list(require_all_on)
        bad = sorted(set(rao) - set(columns))
        if bad:
            raise QueryError(
                f"require_all_on columns {bad} not in catalog columns"
            )
        return cls(query=norm, require_all_on=rao)
