"""Canonical BEL serialization, node identity, and edge hashing.

Node identity in the engine is *the canonical BEL string*: two nodes are the
same node iff their canonical serializations are byte-equal, and the stable
node id is ``md5(bel)`` — the same invariant as the reference
(``/root/reference/src/pybel/dsl/node_classes.py:93-103``).

Edge identity is a content hash over
``(u_bel, v_bel, "db:db_id", evidence, canonicalized-modifiers)`` following
``/root/reference/src/pybel/utils.py:143-291``.  The reference hashes a Python
pickle of that tuple, which is only stable within one interpreter; we instead
hash a canonical JSON encoding.  The hash *bytes* therefore differ from the
reference, but the equivalence classes (what deduplicates with what) are
identical — a deliberate, documented deviation (SURVEY.md §1.4).

Nodes are plain nested dicts (JSON-serializable) so they can move through
Arrow batches without a class hierarchy.
"""

from __future__ import annotations

import hashlib
import json
from typing import Any, Mapping, Optional

from .constants import (
    ACTIVITY,
    BEL_DEFAULT_NAMESPACE,
    CITATION,
    CITATION_DB,
    CITATION_IDENTIFIER,
    COMPLEX,
    CONCEPT,
    DEGRADATION,
    EFFECT,
    EVIDENCE,
    FRAGMENT,
    FRAGMENT_DESCRIPTION,
    FRAGMENT_MISSING,
    FRAGMENT_START,
    FRAGMENT_STOP,
    FUNCTION,
    FUSION,
    FUSION_MISSING,
    FUSION_REFERENCE,
    FUSION_START,
    FUSION_STOP,
    GENE,
    GMOD,
    HGVS,
    IDENTIFIER,
    KIND,
    LOCATION,
    MEMBERS,
    MIRNA,
    MODIFIER,
    NAME,
    NAMESPACE,
    FROM_LOC,
    TO_LOC,
    PARTNER_3P,
    PARTNER_5P,
    PMOD,
    PMOD_CODE,
    PMOD_POSITION,
    PRODUCTS,
    PROTEIN,
    RANGE_3P,
    RANGE_5P,
    REACTANTS,
    REACTION,
    RELATION,
    REV_ABUNDANCE_LABELS,
    RNA,
    SUBJECT,
    OBJECT,
    TRANSLOCATION,
    VARIANTS,
)

__all__ = [
    "ensure_quotes",
    "entity_curie",
    "entity_obo",
    "entity_label",
    "node_to_bel",
    "node_md5",
    "variant_to_bel",
    "sort_variants",
    "sort_members",
    "get_parent",
    "node_curie",
    "safe_label",
    "is_central_dogma",
    "has_variants",
    "canonicalize_edge",
    "edge_tuple",
    "edge_md5",
    "canonical_json",
]

CENTRAL_DOGMA_FUNCTIONS = {GENE, RNA, MIRNA, PROTEIN}


def ensure_quotes(s: str) -> str:
    """Quote a string that isn't solely alphanumeric (reference utils.py:94-96)."""
    return '"{}"'.format(s) if not s.isalnum() else s


# ---------------------------------------------------------------------------
# entity (namespace/name/identifier triple)
# ---------------------------------------------------------------------------

def entity_curie(entity: Mapping[str, Any]) -> str:
    """CURIE form of an entity (reference language.py:61-70)."""
    if entity[NAMESPACE] == BEL_DEFAULT_NAMESPACE:
        return entity[NAME]
    value = entity.get(IDENTIFIER) or entity.get(NAME)
    return "{}:{}".format(entity[NAMESPACE], ensure_quotes(value))


def entity_obo(entity: Mapping[str, Any]) -> str:
    """OBO-style CURIE of an entity (reference language.py:72-79)."""
    return "{}:{} ! {}".format(
        entity[NAMESPACE],
        ensure_quotes(entity[IDENTIFIER]),
        ensure_quotes(entity[NAME]),
    )


def entity_label(entity: Mapping[str, Any], use_identifiers: bool = True) -> str:
    """Label used inside a BEL term: OBO form when both identifier and name exist."""
    if use_identifiers and entity.get(IDENTIFIER) and entity.get(NAME):
        return entity_obo(entity)
    return entity_curie(entity)


# ---------------------------------------------------------------------------
# variants
# ---------------------------------------------------------------------------

def variant_to_bel(variant: Mapping[str, Any], use_identifiers: bool = True) -> str:
    """Serialize a variant dict (reference dsl/node_classes.py:398-569)."""
    kind = variant[KIND]
    if kind == HGVS:
        return 'var("{}")'.format(variant[HGVS])
    if kind == PMOD:
        x = entity_label(variant[CONCEPT], use_identifiers)
        suffix = ""
        if PMOD_CODE in variant:
            suffix += ", {}".format(variant[PMOD_CODE])
        if PMOD_POSITION in variant:
            suffix += ", {}".format(variant[PMOD_POSITION])
        return "pmod({}{})".format(x, suffix)
    if kind == GMOD:
        return "gmod({})".format(entity_label(variant[CONCEPT], use_identifiers))
    if kind == FRAGMENT:
        if FRAGMENT_MISSING in variant:
            rng = "?"
        else:
            rng = "{}_{}".format(variant[FRAGMENT_START], variant[FRAGMENT_STOP])
        res = '"{}"'.format(rng)
        if FRAGMENT_DESCRIPTION in variant:
            res += ', "{}"'.format(variant[FRAGMENT_DESCRIPTION])
        return "frag({})".format(res)
    raise ValueError("invalid variant kind: {}".format(kind))


def sort_variants(variants):
    """Sort variants by their BEL string (construction-time determinism rule)."""
    return sorted(variants, key=variant_to_bel)


def sort_members(members):
    """Sort member node dicts by their BEL string."""
    return sorted(members, key=node_to_bel)


# ---------------------------------------------------------------------------
# nodes
# ---------------------------------------------------------------------------

def _fusion_range_to_bel(rng: Mapping[str, Any]) -> str:
    if FUSION_MISSING in rng:
        return "?"
    return "{}.{}_{}".format(rng[FUSION_REFERENCE], rng[FUSION_START], rng[FUSION_STOP])


def node_to_bel(node: Mapping[str, Any], use_identifiers: bool = True) -> str:
    """Serialize a node dict to its canonical BEL string.

    Mirrors the reference ``as_bel`` methods in dsl/node_classes.py exactly,
    including sorting of variants/members/reactants/products.
    """
    func = node[FUNCTION]
    label = REV_ABUNDANCE_LABELS.get(func)

    if func == REACTION:
        return "rxn(reactants({}), products({}))".format(
            ", ".join(node_to_bel(n, use_identifiers) for n in node[REACTANTS]),
            ", ".join(node_to_bel(n, use_identifiers) for n in node[PRODUCTS]),
        )

    if FUSION in node:
        fus = node[FUSION]
        return '{}(fus({}, "{}", {}, "{}"))'.format(
            label,
            entity_label(fus[PARTNER_5P][CONCEPT], use_identifiers),
            _fusion_range_to_bel(fus[RANGE_5P]),
            entity_label(fus[PARTNER_3P][CONCEPT], use_identifiers),
            _fusion_range_to_bel(fus[RANGE_3P]),
        )

    if MEMBERS in node:
        return "{}({})".format(
            label,
            ", ".join(node_to_bel(n, use_identifiers) for n in node[MEMBERS]),
        )

    concept_str = entity_label(node[CONCEPT], use_identifiers)

    if node.get(VARIANTS):
        variants_canon = sorted(
            variant_to_bel(v, use_identifiers) for v in node[VARIANTS]
        )
        return "{}({}, {})".format(label, concept_str, ", ".join(variants_canon))

    return "{}({})".format(label, concept_str)


def node_md5(node: Mapping[str, Any]) -> str:
    """Stable node id: md5 of the canonical BEL string (reference node_classes.py:93-97)."""
    return hashlib.md5(node_to_bel(node).encode("utf8")).hexdigest()  # noqa: S324


def bel_md5(bel: str) -> str:
    """md5 of an already-serialized canonical BEL string."""
    return hashlib.md5(bel.encode("utf8")).hexdigest()  # noqa: S324


def get_parent(node: Mapping[str, Any]) -> Optional[dict]:
    """Variant node -> its reference (parent) node (reference node_classes.py:298-316)."""
    if VARIANTS not in node:
        return None
    parent = {FUNCTION: node[FUNCTION], CONCEPT: dict(node[CONCEPT])}
    return parent


def is_central_dogma(node: Mapping[str, Any]) -> bool:
    """g/r/m/p node that is not a fusion (reference CentralDogma class)."""
    return node[FUNCTION] in CENTRAL_DOGMA_FUNCTIONS and FUSION not in node


def has_variants(node: Mapping[str, Any]) -> bool:
    return bool(node.get(VARIANTS))


def node_curie(node: Mapping[str, Any]) -> Optional[str]:
    """CURIE of a node's concept, if the node is concept-bearing *and* is a
    BaseAbundance in the reference class hierarchy.

    Complexes with enumerated members are ListAbundances in the reference even
    when named, so they have no ``curie`` attribute (converters.py:20-29).
    """
    if CONCEPT not in node:
        return None
    if MEMBERS in node or REACTANTS in node or FUSION in node:
        return None
    return entity_curie(node[CONCEPT])


def safe_label(node: Mapping[str, Any]) -> str:
    """Label used in triple export (reference io/tsv/converters.py:20-29)."""
    if is_central_dogma(node) and has_variants(node):
        return node_to_bel(node)
    curie = node_curie(node)
    if curie is not None:
        return curie
    return node_to_bel(node)


# ---------------------------------------------------------------------------
# edges
# ---------------------------------------------------------------------------

def _canonicalize_side(side: Optional[Mapping[str, Any]]):
    """Canonicalize SUBJECT/OBJECT modifier dict (reference utils.py:231-291)."""
    if side is None:
        return None

    modifier = side.get(MODIFIER)
    location = side.get(LOCATION)
    effect = side.get(EFFECT)

    if modifier is None and location is None:
        return None

    result = []
    if modifier == ACTIVITY:
        if effect:
            result.append((ACTIVITY, effect[NAMESPACE], effect.get(IDENTIFIER), effect.get(NAME)))
        else:
            result.append((ACTIVITY,))
    elif modifier == DEGRADATION:
        result.append((DEGRADATION,))
    elif modifier == TRANSLOCATION:
        if effect:
            f, t = effect[FROM_LOC], effect[TO_LOC]
            result.append((
                TRANSLOCATION,
                f[NAMESPACE], f.get(IDENTIFIER), f.get(NAME),
                t[NAMESPACE], t.get(IDENTIFIER), t.get(NAME),
            ))
        else:
            result.append((TRANSLOCATION,))

    if location:
        result.append((LOCATION, location[NAMESPACE], location.get(IDENTIFIER), location.get(NAME)))

    if not result:
        raise ValueError("invalid modifier data: {}".format(side))
    return tuple(result)


def canonicalize_edge(edge_data: Mapping[str, Any]):
    """(relation, canonical subject mods, canonical object mods) — utils.py:222-228."""
    return (
        edge_data[RELATION],
        _canonicalize_side(edge_data.get(SUBJECT)),
        _canonicalize_side(edge_data.get(OBJECT)),
    )


def _citation_str(edge_data: Mapping[str, Any]) -> Optional[str]:
    citation = edge_data.get(CITATION)
    if citation is not None:
        return "{}:{}".format(citation[CITATION_DB], citation[CITATION_IDENTIFIER])
    return None


def edge_tuple(u_bel: str, v_bel: str, edge_data: Mapping[str, Any]):
    """Consistent tuple identifying an edge (reference utils.py:157-175)."""
    return (
        u_bel,
        v_bel,
        _citation_str(edge_data),
        edge_data.get(EVIDENCE),
        canonicalize_edge(edge_data),
    )


def canonical_json(obj: Any) -> str:
    """Deterministic JSON encoding (sorted keys, no whitespace, unicode kept)."""
    return json.dumps(obj, sort_keys=True, separators=(",", ":"), ensure_ascii=False)


def edge_md5(u_bel: str, v_bel: str, edge_data: Mapping[str, Any]) -> str:
    """Stable edge content hash.

    Same equivalence classes as the reference's pickle-based
    ``hash_edge`` (utils.py:143-154).  The edge tuple contains only
    str/int/None/tuple values, so ``repr`` is an unambiguous, deterministic
    byte encoding — and runs at C speed (this is the hot path: one hash per
    emitted edge).
    """
    t = edge_tuple(u_bel, v_bel, edge_data)
    return hashlib.md5(repr(t).encode("utf8")).hexdigest()  # noqa: S324
