"""Catalog and asset sources: descriptor model, catalog IO, asset readers."""
