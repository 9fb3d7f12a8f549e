"""Node/edge predicate library -> vectorized batch masks.

The reference's ``struct.filters`` combinators
(``/root/reference/src/pybel/struct/filters/*``) become named mask builders:
each predicate maps an Arrow batch to a boolean array; ``filter_nodes`` /
``filter_edges`` compose them with AND/OR/NOT and apply one vectorized
``map_batches`` pass.
"""

from __future__ import annotations

from typing import Callable, Iterable, Union

import pyarrow as pa
import pyarrow.compute as pc

from ..constants import (
    ABUNDANCE,
    ASSOCIATION,
    CAUSAL_RELATIONS,
    CORRELATIVE_RELATIONS,
    DIRECT_CAUSAL_RELATIONS,
    GENE,
    MIRNA,
    PATHOLOGY,
    POLAR_RELATIONS,
    PROTEIN,
    RNA,
)
from .graph import bel_function_of

__all__ = [
    "NODE_PREDICATES",
    "EDGE_PREDICATES",
    "filter_nodes",
    "filter_edges",
    "function_inclusion_filter",
    "namespace_inclusion_filter",
    "name_inclusion_filter",
    "relation_filter",
    "annotation_value_filter",
    "invert",
]

Mask = Callable[[pa.Table], pa.Array]


def _isin(col, values) -> pa.Array:
    return pc.is_in(col, value_set=pa.array(list(values)))


def _json_contains(col, substring: str) -> pa.Array:
    """Membership test on a canonical-JSON column (kind tags etc.)."""
    return pc.fill_null(pc.match_substring(col, substring), False)


# -- node predicates (reference struct/filters/node_predicates.py:78-260) ---

def _node_pred(func_set=None, json_sub=None):
    def mask(t: pa.Table) -> pa.Array:
        if func_set is not None:
            return _isin(t.column("function"), func_set)
        return _json_contains(t.column("node_json"), json_sub)

    return mask


NODE_PREDICATES = {
    "is_abundance": _node_pred(func_set={ABUNDANCE}),
    "is_gene": _node_pred(func_set={GENE}),
    "is_protein": _node_pred(func_set={PROTEIN}),
    "is_rna": _node_pred(func_set={RNA}),
    "is_mirna": _node_pred(func_set={MIRNA}),
    "is_pathology": _node_pred(func_set={PATHOLOGY}),
    "is_central_dogma": _node_pred(func_set={GENE, RNA, MIRNA, PROTEIN}),
    "has_variant": _node_pred(json_sub='"variants":'),
    "has_protein_modification": _node_pred(json_sub='"kind":"pmod"'),
    "has_gene_modification": _node_pred(json_sub='"kind":"gmod"'),
    "has_hgvs": _node_pred(json_sub='"kind":"hgvs"'),
    "has_fragment": _node_pred(json_sub='"kind":"frag"'),
    "is_fusion": _node_pred(json_sub='"fusion":'),
    "is_list_abundance": _node_pred(json_sub='"members":'),
    "is_reaction": _node_pred(json_sub='"reactants":'),
}


def not_pathology(t: pa.Table) -> pa.Array:
    return pc.invert(NODE_PREDICATES["is_pathology"](t))


NODE_PREDICATES["not_pathology"] = not_pathology


def function_inclusion_filter(functions: Union[str, Iterable[str]]) -> Mask:
    if isinstance(functions, str):
        functions = [functions]

    def mask(t: pa.Table) -> pa.Array:
        return _isin(t.column("function"), functions)

    return mask


def namespace_inclusion_filter(namespaces: Union[str, Iterable[str]]) -> Mask:
    if isinstance(namespaces, str):
        namespaces = [namespaces]

    def mask(t: pa.Table) -> pa.Array:
        return pc.fill_null(_isin(t.column("namespace"), namespaces), False)

    return mask


def name_inclusion_filter(names: Union[str, Iterable[str]]) -> Mask:
    if isinstance(names, str):
        names = [names]

    def mask(t: pa.Table) -> pa.Array:
        return pc.fill_null(_isin(t.column("name"), names), False)

    return mask


# -- edge predicates (reference struct/filters/edge_predicates.py:70-172) ---

def _relation_in(values):
    def mask(t: pa.Table) -> pa.Array:
        return _isin(t.column("relation"), values)

    return mask


def _modifier_pred(side_col: str, modifier: str) -> Mask:
    def mask(t: pa.Table) -> pa.Array:
        return _json_contains(
            t.column(side_col), '"modifier":"{}"'.format(modifier),
        )

    return mask


def has_provenance(t: pa.Table) -> pa.Array:
    return pc.and_(
        pc.is_valid(t.column("citation_db")), pc.is_valid(t.column("evidence")),
    )


def has_pubmed(t: pa.Table) -> pa.Array:
    return pc.fill_null(pc.equal(t.column("citation_db"), "PubMed"), False)


def has_pathology_causal(t: pa.Table) -> pa.Array:
    """Causal edge whose subject is a pathology (edge_predicates.py:160-172)."""
    causal = _isin(t.column("relation"), CAUSAL_RELATIONS)
    src_path = pc.fill_null(
        pc.equal(bel_function_of(t.column("src_bel")), PATHOLOGY), False,
    )
    return pc.and_(causal, src_path)


EDGE_PREDICATES = {
    "has_provenance": has_provenance,
    "has_pubmed": has_pubmed,
    "is_causal_relation": _relation_in(CAUSAL_RELATIONS),
    "not_causal_relation": lambda t: pc.invert(_relation_in(CAUSAL_RELATIONS)(t)),
    "is_direct_causal_relation": _relation_in(DIRECT_CAUSAL_RELATIONS),
    "is_associative_relation": _relation_in({ASSOCIATION}),
    "is_correlative_relation": _relation_in(CORRELATIVE_RELATIONS),
    "has_polarity": _relation_in(POLAR_RELATIONS),
    "edge_has_activity": lambda t: pc.or_(
        _modifier_pred("subject_json", "Activity")(t),
        _modifier_pred("object_json", "Activity")(t),
    ),
    "edge_has_degradation": lambda t: pc.or_(
        _modifier_pred("subject_json", "Degradation")(t),
        _modifier_pred("object_json", "Degradation")(t),
    ),
    "edge_has_translocation": lambda t: pc.or_(
        _modifier_pred("subject_json", "Translocation")(t),
        _modifier_pred("object_json", "Translocation")(t),
    ),
    "has_pathology_causal": has_pathology_causal,
}


def relation_filter(relations: Union[str, Iterable[str]]) -> Mask:
    if isinstance(relations, str):
        relations = [relations]
    return _relation_in(set(relations))


def annotation_value_filter(key: str, value: str) -> Mask:
    """Edges annotated with key=value.

    Two-phase: a cheap vectorized substring prefilter (both needles
    anywhere in the JSON) selects candidates, then only those rows pay a
    JSON parse that verifies the value sits under THE key — a value
    match under a different annotation key must not count (the same
    contract as the DuckDB oracle's ``json_extract``).
    """
    import json as _json

    key_needle = '"{}":{{'.format(key)
    value_needle = '"{}":true'.format(value)

    def mask(t: pa.Table) -> pa.Array:
        col = t.column("annotations_json")
        candidates = pc.and_(
            _json_contains(col, key_needle),
            _json_contains(col, value_needle),
        )
        if isinstance(candidates, pa.ChunkedArray):
            candidates = candidates.combine_chunks()
        cand_np = candidates.to_numpy(zero_copy_only=False)
        if not cand_np.any():
            return candidates
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        out = cand_np.copy()
        import numpy as np

        for i in np.flatnonzero(cand_np):
            payload = col[int(i)].as_py()
            try:
                annotations = _json.loads(payload)
            except (TypeError, ValueError):
                out[i] = False
                continue
            out[i] = bool((annotations.get(key) or {}).get(value))
        return pa.array(out)

    return mask


def invert(pred: Mask) -> Mask:
    def mask(t: pa.Table) -> pa.Array:
        return pc.invert(pred(t))

    return mask


def _compose(predicates) -> Mask:
    if callable(predicates):
        return predicates
    preds = [p if callable(p) else _lookup(p) for p in predicates]

    def mask(t: pa.Table) -> pa.Array:
        out = preds[0](t)
        for p in preds[1:]:
            out = pc.and_(out, p(t))
        return out

    return mask


def _lookup(name: str) -> Mask:
    if name in NODE_PREDICATES:
        return NODE_PREDICATES[name]
    if name in EDGE_PREDICATES:
        return EDGE_PREDICATES[name]
    raise KeyError(name)


def filter_nodes(nodes, predicates):
    """Apply composed node predicates (AND) in one vectorized pass."""
    if isinstance(predicates, str):
        predicates = [predicates]
    mask = _compose(predicates)
    return nodes.map_batches(
        lambda t: t.filter(mask(t)), batch_format="pyarrow",
    )


def filter_edges(edges, predicates):
    """Apply composed edge predicates (AND) in one vectorized pass."""
    if isinstance(predicates, str):
        predicates = [predicates]
    mask = _compose(predicates)
    return edges.map_batches(
        lambda t: t.filter(mask(t)), batch_format="pyarrow",
    )
