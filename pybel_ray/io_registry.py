"""Pluggable I/O format registry (reference ``struct/graph.py:798-826``).

The reference dispatches ``BELGraph.serialize(fmt=...)`` through setuptools
entry points (``pybel.object_exporter`` / ``pybel.file_exporter`` /
``pybel.importer``, setup.cfg:91-125).  The engine keeps the same contract
with an in-process registry plus optional ``importlib.metadata``
entry-point discovery (groups ``pybel_ray.exporter`` /
``pybel_ray.importer``) so third-party packages can add formats without
touching this repo.

* exporter: ``fn(graph, **kwargs) -> object`` registered under a format
  name; ``serialize(graph, fmt, file=...)`` writes JSON-able results to the
  file when given one.
* importer: ``fn(obj_or_path, **kwargs) -> Graph``.
"""

from __future__ import annotations

import json
from typing import Callable, Dict, Optional

from .struct.graph import Graph

__all__ = [
    "register_exporter",
    "register_importer",
    "get_exporter",
    "get_importer",
    "registered_formats",
    "serialize",
    "deserialize",
]

_EXPORTERS: Dict[str, Callable] = {}
_IMPORTERS: Dict[str, Callable] = {}
_DISCOVERED = False


def register_exporter(fmt: str, fn: Optional[Callable] = None):
    """Register (or decorate) a Graph exporter under a format name."""
    if fn is None:
        def decorator(f):
            _EXPORTERS[fmt] = f
            return f

        return decorator
    _EXPORTERS[fmt] = fn
    return fn


def register_importer(fmt: str, fn: Optional[Callable] = None):
    if fn is None:
        def decorator(f):
            _IMPORTERS[fmt] = f
            return f

        return decorator
    _IMPORTERS[fmt] = fn
    return fn


def _discover():
    """One-shot entry-point discovery (third-party format plugins)."""
    global _DISCOVERED
    if _DISCOVERED:
        return
    _DISCOVERED = True
    try:
        from importlib.metadata import entry_points
    except ImportError:  # pragma: no cover
        return
    try:
        eps = entry_points()
        for ep in eps.select(group="pybel_ray.exporter"):
            _EXPORTERS.setdefault(ep.name, ep.load())
        for ep in eps.select(group="pybel_ray.importer"):
            _IMPORTERS.setdefault(ep.name, ep.load())
    except Exception:  # pragma: no cover - malformed third-party metadata
        pass


def get_exporter(fmt: str) -> Callable:
    _discover()
    try:
        return _EXPORTERS[fmt]
    except KeyError:
        raise ValueError("no exporter for format {!r}; known: {}".format(
            fmt, ", ".join(sorted(_EXPORTERS)),
        ))


def get_importer(fmt: str) -> Callable:
    _discover()
    try:
        return _IMPORTERS[fmt]
    except KeyError:
        raise ValueError("no importer for format {!r}; known: {}".format(
            fmt, ", ".join(sorted(_IMPORTERS)),
        ))


def registered_formats() -> dict:
    _discover()
    return {
        "exporters": sorted(_EXPORTERS),
        "importers": sorted(_IMPORTERS),
    }


def serialize(graph: Graph, fmt: str = "nodelink", file=None, **kwargs):
    """Serialize a Graph to an object, or write it to ``file`` if given
    (reference ``BELGraph.serialize``, struct/graph.py:798-817)."""
    result = get_exporter(fmt)(graph, **kwargs)
    if file is None:
        return result
    close = False
    if isinstance(file, str):
        file = open(file, "w")
        close = True
    try:
        if isinstance(result, str):
            file.write(result)
        elif isinstance(result, (list, tuple)) and result and isinstance(result[0], str):
            file.write("\n".join(result))
            file.write("\n")
        else:
            json.dump(result, file, sort_keys=True)
    finally:
        if close:
            file.close()
    return None


def deserialize(obj, fmt: str = "nodelink", **kwargs) -> Graph:
    """Build a Graph from a serialized object via the importer registry."""
    return get_importer(fmt)(obj, **kwargs)


def _register_builtins():
    from .export.bel_script import to_bel_script_lines
    from .export.extras import to_csv, to_edgelist, to_gsea, to_sif
    from .export.interchange import (
        from_cbn_jgif,
        from_cx,
        from_jgif,
        to_cx,
        to_graphdati,
        to_graphdati_jsonl,
        to_jgif,
    )
    from .export.nodelink import from_nodelink, to_nodelink, to_umbrella_nodelink

    register_exporter("nodelink", to_nodelink)
    register_exporter("umbrella_nodelink", to_umbrella_nodelink)
    register_exporter("cx", to_cx)
    register_exporter("jgif", to_jgif)
    register_exporter("graphdati", to_graphdati)
    register_exporter("graphdati_jsonl", to_graphdati_jsonl)
    register_exporter("bel", lambda graph, **kw: list(to_bel_script_lines(graph, **kw)))
    register_exporter(
        "sif",
        lambda graph, **kw: [
            "{}\t{}\t{}".format(r["src_bel"], r["relation"], r["dst_bel"])
            for r in to_sif(graph, **kw).take_all()
        ],
    )
    register_exporter("csv", to_csv)
    register_exporter("gsea", to_gsea)
    from .export.html_viz import to_html, to_jupyter_str

    register_exporter("html", to_html)
    register_exporter("jupyter_js", to_jupyter_str)
    from .export.neo4j_bulk import to_neo4j_bulk

    register_exporter("neo4j_bulk", to_neo4j_bulk)
    register_exporter(
        "edgelist",
        lambda graph, **kw: [
            "{}\t{}\t{}".format(r["h"], r["t"], r["relation_json"])
            for r in to_edgelist(graph, **kw).take_all()
        ],
    )

    register_importer("nodelink", from_nodelink)
    register_importer("cx", from_cx)
    register_importer("jgif", from_jgif)
    register_importer("cbn_jgif", from_cbn_jgif)
    from .io_hetionet import from_hetionet_json

    register_importer("hetionet", from_hetionet_json)
    from .io_indra import from_indra_statements

    register_importer("indra", from_indra_statements)
    from .io_biopax import from_biopax

    register_importer("biopax", from_biopax)


_register_builtins()
