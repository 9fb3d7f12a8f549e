"""Canonical BEL script writer (reference canonicalize.py:41-344).

Edges sorted by (citation, evidence) then grouped with SET/UNSET framing;
unqualified edges and isolated nodes go in an auto-evidence footer.  The
distributed path sorts the edge Dataset by the grouping keys; formatting is
a per-batch pass (each group's lines assembled driver-side here since BEL
scripts are small-document artifacts).
"""

from __future__ import annotations

import json
from typing import Iterable, List, Optional

from ..canon import ensure_quotes
from ..constants import (
    ACTIVITY,
    ANNOTATIONS,
    BEL_DEFAULT_NAMESPACE,
    CELL_SURFACE,
    DEGRADATION,
    EFFECT,
    EXTRACELLULAR,
    FROM_LOC,
    INTRACELLULAR,
    LOCATION,
    MODIFIER,
    NAME,
    NAMESPACE,
    OBJECT,
    RELATION,
    SUBJECT,
    TO_LOC,
    TRANSLOCATION,
    UNQUALIFIED_EDGES,
)
from ..struct.graph import Graph

__all__ = ["edge_to_bel_statement", "decanonicalize_edge_node", "to_bel_script_lines"]

#: citation + auto-evidence used for the unqualified footer (PyBEL's own
#: publication, as in the reference constants.py)
_FOOTER_CITATION = 'SET Citation = {"PubMed", "29048466"}'
_FOOTER_EVIDENCE = 'SET SupportingText = "Automatically added by PyBEL"'


def _postpend_location(bel: str, location: dict) -> str:
    return '{}, loc({}:{}))'.format(
        bel[:-1], location[NAMESPACE], ensure_quotes(location[NAME]),
    )


def decanonicalize_edge_node(node: dict, edge_data: dict, position: str) -> str:
    """Node BEL + its edge-side modifiers folded back in
    (reference canonicalize.py:91-152)."""
    from ..canon import node_to_bel

    node_str = node_to_bel(node, use_identifiers=False)
    side = edge_data.get(position)
    if not side:
        return node_str

    if LOCATION in side:
        node_str = _postpend_location(node_str, side[LOCATION])

    modifier = side.get(MODIFIER)
    if modifier is None:
        return node_str
    if modifier == DEGRADATION:
        return "deg({})".format(node_str)

    effect = side.get(EFFECT)
    if modifier == ACTIVITY:
        if effect is None:
            return "act({})".format(node_str)
        if effect[NAMESPACE] == BEL_DEFAULT_NAMESPACE:
            return "act({}, ma({}))".format(node_str, effect[NAME])
        return "act({}, ma({}:{}))".format(
            node_str, effect[NAMESPACE], ensure_quotes(effect[NAME]),
        )
    if modifier == TRANSLOCATION:
        if effect is None:
            return "tloc({})".format(node_str)
        from_loc = effect[FROM_LOC]
        to_loc = effect[TO_LOC]
        if from_loc[NAMESPACE] == BEL_DEFAULT_NAMESPACE and from_loc[NAME] == INTRACELLULAR:
            if to_loc[NAMESPACE] == BEL_DEFAULT_NAMESPACE and to_loc[NAME] == EXTRACELLULAR:
                return "sec({})".format(node_str)
            if to_loc[NAMESPACE] == BEL_DEFAULT_NAMESPACE and to_loc[NAME] == CELL_SURFACE:
                return "surf({})".format(node_str)
        return "tloc({}, fromLoc({}:{}), toLoc({}:{}))".format(
            node_str,
            from_loc[NAMESPACE], ensure_quotes(from_loc[NAME]),
            to_loc[NAMESPACE], ensure_quotes(to_loc[NAME]),
        )
    raise ValueError("invalid modifier: {}".format(modifier))


def edge_to_bel_statement(u_node: dict, edge_data: dict, v_node: dict, sep: str = " ") -> str:
    """Re-serialize an edge as a BEL statement (reference edge_to_bel)."""
    u_str = decanonicalize_edge_node(u_node, edge_data, SUBJECT)
    v_str = decanonicalize_edge_node(v_node, edge_data, OBJECT)
    return sep.join((u_str, edge_data[RELATION], v_str))


def _set_annotation_lines(annotations: dict) -> List[str]:
    out = []
    for key in sorted(annotations):
        values = annotations[key]
        if len(values) == 1:
            out.append('SET {} = "{}"'.format(key, list(values)[0]))
        else:
            out.append('SET {} = {{{}}}'.format(
                key, ", ".join('"{}"'.format(v) for v in sorted(values)),
            ))
    return out


def _unset_annotation_line(keys: List[str]) -> str:
    if len(keys) == 1:
        return "UNSET {}".format(keys[0])
    return "UNSET {{{}}}".format(", ".join(keys))


def to_bel_script_lines(graph: Graph, metadata: Optional[dict] = None) -> Iterable[str]:
    """Produce the canonical BEL script lines for a graph.

    Qualified edges sorted by (citation_db, citation_id, evidence) with
    grouped SET framing (reference canonicalize.py:279-307); unqualified
    edges + isolated nodes in the auto-evidence footer (L310-344).
    """
    metadata = metadata or {}
    for key in sorted(metadata):
        yield 'SET DOCUMENT {} = "{}"'.format(key, metadata[key])

    node_json = {}
    edge_rows = graph.edges.take_all()
    used_nodes = set()
    for r in graph.nodes.take_all():
        node_json[r["md5"]] = json.loads(r["node_json"])

    qualified = [
        r for r in edge_rows
        if r.get("citation_db") is not None and r.get("evidence") is not None
    ]
    qualified.sort(key=lambda r: (r["citation_db"], r["citation_id"], r["evidence"]))

    last_citation = None
    last_evidence = None
    for r in qualified:
        used_nodes.update((r["src_md5"], r["dst_md5"]))
        citation = (r["citation_db"], r["citation_id"])
        if citation != last_citation:
            if last_evidence is not None:
                yield "UNSET SupportingText"
            if last_citation is not None:
                yield "UNSET Citation\n"
            yield 'SET Citation = {{"{}", "{}"}}\n'.format(*citation)
            last_citation = citation
            last_evidence = None
        if r["evidence"] != last_evidence:
            if last_evidence is not None:
                yield "UNSET SupportingText"
            yield 'SET SupportingText = "{}"'.format(r["evidence"])
            last_evidence = r["evidence"]

        annotations = json.loads(r["annotations_json"]) if r.get("annotations_json") else None
        data = {RELATION: r["relation"]}
        if r.get("subject_json"):
            data[SUBJECT] = json.loads(r["subject_json"])
        if r.get("object_json"):
            data[OBJECT] = json.loads(r["object_json"])
        keys = sorted(annotations) if annotations else []
        if keys:
            yield from _set_annotation_lines(annotations)
        yield edge_to_bel_statement(
            node_json[r["src_md5"]], data, node_json[r["dst_md5"]],
        )
        if keys:
            yield _unset_annotation_line(keys)
    if last_evidence is not None:
        yield "UNSET SupportingText"
    if last_citation is not None:
        yield "UNSET Citation\n"

    # footer: unqualified structural edges + isolated nodes
    unqualified = [
        r for r in edge_rows
        if r["relation"] in UNQUALIFIED_EDGES and r.get("evidence") is None
    ]
    for r in edge_rows:
        used_nodes.update((r["src_md5"], r["dst_md5"]))
    isolated = [md5 for md5 in node_json if md5 not in used_nodes]

    if unqualified or isolated:
        yield _FOOTER_CITATION
        yield _FOOTER_EVIDENCE
        from ..canon import node_to_bel

        for r in sorted(unqualified, key=lambda r: (r["src_bel"], r["relation"], r["dst_bel"])):
            yield "{} {} {}".format(r["src_bel"], r["relation"], r["dst_bel"])
        for md5 in sorted(isolated, key=lambda m: node_to_bel(node_json[m])):
            yield node_to_bel(node_json[md5], use_identifiers=False)
        yield "UNSET SupportingText"
        yield "UNSET Citation"
