"""Named catalog URL registry (reference: /root/reference/intake_esm/tutorial.py).

A tiny name -> descriptor-URL lookup so docs/tests can open well-known
public catalogs by name. Ships with the canonical public Pangeo/CMIP6
entries; users register their own.
"""

from __future__ import annotations

DEFAULT_CATALOGS: dict[str, str] = {
    # the reference's own tutorial keys and URLs (tutorial.py:9-13) —
    # code ported from intake-esm must resolve the same names
    "aws_cesm2_le": "https://raw.githubusercontent.com/intake/intake-esm/main/tutorial-catalogs/AWS-CESM2-LENS.json",
    "aws_cmip6": "https://raw.githubusercontent.com/intake/intake-esm/main/tutorial-catalogs/AWS-CMIP6.json",
    "google_cmip6": "https://raw.githubusercontent.com/intake/intake-esm/main/tutorial-catalogs/GOOGLE-CMIP6.json",
    # extension aliases for the full public Pangeo/CMIP6 catalog
    "google-cmip6": "https://storage.googleapis.com/cmip6/pangeo-cmip6.json",
    "pangeo-cmip6": "https://storage.googleapis.com/cmip6/pangeo-cmip6.json",
}

_registry = dict(DEFAULT_CATALOGS)


def register_catalog(name: str, url: str) -> None:
    _registry[name] = url


def get_available_cats() -> list[str]:
    """Reference API parity (tutorial.py:45-56)."""
    return list(_registry)


def get_url(name: str) -> str:
    try:
        return _registry[name]
    except KeyError:
        raise KeyError(
            f"unknown tutorial catalog {name!r}; known: {sorted(_registry)}"
        ) from None


def available_catalogs() -> list[str]:
    return sorted(_registry)
