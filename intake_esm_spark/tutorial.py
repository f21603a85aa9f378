"""Named catalog URL registry (reference: /root/reference/intake_esm/tutorial.py).

A tiny name -> descriptor-URL lookup so docs/tests can open well-known
public catalogs by name. Ships with the canonical public Pangeo/CMIP6
entries; users register their own.
"""

from __future__ import annotations

DEFAULT_CATALOGS: dict[str, str] = {
    # public, well-known ESM catalog descriptors
    "google-cmip6": "https://storage.googleapis.com/cmip6/pangeo-cmip6.json",
    "pangeo-cmip6": "https://storage.googleapis.com/cmip6/pangeo-cmip6.json",
}

_registry = dict(DEFAULT_CATALOGS)


def register_catalog(name: str, url: str) -> None:
    _registry[name] = url


def get_url(name: str) -> str:
    try:
        return _registry[name]
    except KeyError:
        raise KeyError(
            f"unknown tutorial catalog {name!r}; known: {sorted(_registry)}"
        ) from None


def available_catalogs() -> list[str]:
    return sorted(_registry)
