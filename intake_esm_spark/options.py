"""Engine options (reference: set_options / OPTIONS at
/root/reference/intake_esm/utils.py:120-184).

``attrs_prefix`` controls the key prefix used when group attributes are
exposed as dataset metadata (reference F10: ``intake_esm_attrs:<col>``);
``dataset_key`` is the metadata key carrying the group key.
"""

from __future__ import annotations

from contextlib import contextmanager

OPTIONS: dict[str, str] = {
    "attrs_prefix": "intake_esm_attrs",
    "dataset_key": "intake_esm_dataset_key",
}

_VALID = set(OPTIONS)


@contextmanager
def set_options(**kwargs: str):
    """Temporarily (or, used without ``with``, permanently) override options.

    >>> with set_options(attrs_prefix="my_prefix"):
    ...     ...
    """
    bad = sorted(set(kwargs) - _VALID)
    if bad:
        raise ValueError(f"unknown options {bad}; valid: {sorted(_VALID)}")
    old = {k: OPTIONS[k] for k in kwargs}
    OPTIONS.update(kwargs)
    try:
        yield OPTIONS
    finally:
        OPTIONS.update(old)
