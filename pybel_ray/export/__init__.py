"""Exports: triple conversion, nodelink-equivalent tables, BEL script."""

from .triples import edge_to_triple  # noqa: F401
