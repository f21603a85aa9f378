"""Engine options (reference: set_options / OPTIONS at
/root/reference/intake_esm/utils.py:120-184).

``attrs_prefix`` controls the key prefix used when group attributes are
exposed as dataset metadata (reference F10: ``intake_esm_attrs:<col>``);
``dataset_key`` is the metadata key carrying the group key.
"""

from __future__ import annotations

OPTIONS: dict[str, str] = {
    "attrs_prefix": "intake_esm_attrs",
    "dataset_key": "intake_esm_dataset_key",
}

_VALID = set(OPTIONS)


class set_options:
    """Set engine options — permanently when called plainly, scoped when
    used as a context manager (the reference's dual-use class shape,
    utils.py:127-184; a @contextmanager would make the plain call a
    silent no-op that also skips validation).

    >>> set_options(attrs_prefix="my_prefix")          # applies now
    >>> with set_options(attrs_prefix="tmp_prefix"):   # restored on exit
    ...     ...
    """

    def __init__(self, **kwargs: str) -> None:
        bad = sorted(set(kwargs) - _VALID)
        if bad:
            raise ValueError(f"unknown options {bad}; valid: {sorted(_VALID)}")
        self._old = {k: OPTIONS[k] for k in kwargs}
        OPTIONS.update(kwargs)

    def __enter__(self) -> dict[str, str]:
        return OPTIONS

    def __exit__(self, *exc) -> None:
        OPTIONS.update(self._old)
