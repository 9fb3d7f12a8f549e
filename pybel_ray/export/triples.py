"""Edge -> (h, r, t) triple conversion.

The ordered converter chain of the reference's TSV export
(``/root/reference/src/pybel/io/tsv/api.py:87-133`` with the 28 converter
classes in ``io/tsv/converters.py``), re-expressed as one pure function over
(node dict, edge data, node dict).  Edges matching no converter yield
``None`` and are dropped.  **This is the output the P/R >= 0.95 criterion
compares** (BASELINE.md).

The converter chain is a flat case-expression — ideal for a vectorizable
``map_batches`` stage; the per-edge function here is applied per row inside
an Arrow batch by :mod:`pybel_ray.stages.export`.
"""

from __future__ import annotations

from typing import Mapping, Optional, Tuple

from ..canon import (
    entity_curie,
    is_central_dogma,
    node_curie,
    node_to_bel,
    safe_label,
)
from ..constants import (
    ABUNDANCE,
    ACTIVITY,
    ASSOCIATION,
    BIOPROCESS,
    CAUSES_NO_CHANGE,
    COMPLEX,
    CONCEPT,
    CORRELATIVE_RELATIONS,
    DECREASES,
    DEGRADATION,
    DIRECTLY_DECREASES,
    EQUIVALENT_TO,
    FUNCTION,
    HAS_PRODUCT,
    HAS_REACTANT,
    HAS_VARIANT,
    INCREASES,
    IS_A,
    MEMBERS,
    MIRNA,
    MODIFIER,
    OBJECT,
    PART_OF,
    PATHOLOGY,
    PRODUCTS,
    PROTEIN,
    REACTANTS,
    REACTION,
    REGULATES,
    RELATION,
    RNA,
)

__all__ = ["edge_to_triple"]


def _is_named_complex(node: Mapping) -> bool:
    """NamedComplexAbundance: complex defined by concept, no member list."""
    return node[FUNCTION] == COMPLEX and MEMBERS not in node and CONCEPT in node


def _is_list_complex(node: Mapping) -> bool:
    """ComplexAbundance: complex with enumerated members."""
    return node[FUNCTION] == COMPLEX and MEMBERS in node


def _is_base_abundance(node: Mapping) -> bool:
    """Concept-bearing node (reference BaseAbundance hierarchy)."""
    return (
        CONCEPT in node
        and MEMBERS not in node
        and REACTANTS not in node
        and "fusion" not in node
    )


def _object_modifier(data: Mapping) -> Optional[str]:
    obj = data.get(OBJECT)
    if not obj:
        return None
    return obj.get(MODIFIER)


def _catalyst_bels(node: Mapping) -> set:
    reactant_bels = {node_to_bel(n) for n in node.get(REACTANTS, ())}
    product_bels = {node_to_bel(n) for n in node.get(PRODUCTS, ())}
    return reactant_bels & product_bels


def edge_to_triple(
    u: Mapping, data: Mapping, v: Mapping,
) -> Optional[Tuple[str, str, str]]:
    """Convert one edge to an (h, r, t) triple, or None if unconvertible.

    Follows the exact converter priority order of the reference
    (io/tsv/api.py:96-126).
    """
    relation = data[RELATION]
    u_func = u[FUNCTION]
    v_func = v[FUNCTION]

    # 1. ListComplexHasComponentConverter: u partOf complex(members)
    if relation == PART_OF and _is_base_abundance(u) and _is_list_complex(v):
        # NB: reference convert() swaps: (u.curie, partOf, v.as_bel())
        return entity_curie(u[CONCEPT]), "partOf", node_to_bel(v)

    # 2. PartOfNamedComplexConverter: p(X) partOf namedComplex(Y)
    if (
        relation == PART_OF
        and u_func == PROTEIN and is_central_dogma(u)
        and _is_named_complex(v)
    ):
        return safe_label(u), "partOf", safe_label(v)

    # 3. SubprocessPartOfBiologicalProcess: bp partOf bp
    if (
        relation == PART_OF
        and u_func == BIOPROCESS and _is_base_abundance(u)
        and v_func == BIOPROCESS and _is_base_abundance(v)
    ):
        return safe_label(u), "partOf", safe_label(v)

    # 4. ProteinPartOfBiologicalProcess: p partOf bp
    if (
        relation == PART_OF
        and u_func == PROTEIN and is_central_dogma(u)
        and v_func == BIOPROCESS and _is_base_abundance(v)
    ):
        return safe_label(u), "partOf", safe_label(v)

    # 5-7. activity converters handled below with amount/degradation family
    obj_modifier = _object_modifier(data)

    if relation == REGULATES and obj_modifier == ACTIVITY:
        return safe_label(u), "activityDirectlyRegulatesActivityOf", safe_label(v)

    # 6-7. miRNA decreases expression (before generic amount converters)
    if (
        u_func == MIRNA and is_central_dogma(u)
        and v_func == RNA and is_central_dogma(v)
    ):
        if relation == DECREASES:
            return safe_label(u), "repressesExpressionOf", safe_label(v)
        if relation == DIRECTLY_DECREASES:
            return safe_label(u), "repressesExpressionOf", safe_label(v)

    # 8. IsA
    if relation == IS_A:
        return safe_label(u), relation, safe_label(v)

    # 9. Equivalence
    if relation == EQUIVALENT_TO:
        return safe_label(u), relation, safe_label(v)

    # 10. Correlation family (relation kept as-is)
    if relation in CORRELATIVE_RELATIONS:
        return safe_label(u), relation, safe_label(v)

    # 11. Association (allows a more specific association_type)
    if relation == ASSOCIATION:
        return safe_label(u), data.get("association_type", ASSOCIATION), safe_label(v)

    # 12-13. Drug indication / side effect: a(X) -|/-> path(Y)
    if (
        u_func == ABUNDANCE and _is_base_abundance(u)
        and v_func == PATHOLOGY and _is_base_abundance(v)
        and relation in (DECREASES, INCREASES)
    ):
        return safe_label(u), relation, safe_label(v)

    # 14-17. amount family (no object modifier)
    if not obj_modifier:
        if relation == REGULATES:
            return safe_label(u), "regulatesAmountOf", safe_label(v)
        if relation == INCREASES:
            return safe_label(u), "increasesAmountOf", safe_label(v)
        if relation == DECREASES:
            return safe_label(u), "decreasesAmountOf", safe_label(v)
        if relation == CAUSES_NO_CHANGE:
            return safe_label(u), "notRegulatesAmountOf", safe_label(v)

    # 18-20. activity family
    if obj_modifier == ACTIVITY:
        if relation == INCREASES:
            return safe_label(u), "activityDirectlyPositivelyRegulatesActivityOf", safe_label(v)
        if relation == DECREASES:
            return safe_label(u), "activityDirectlyNegativelyRegulatesActivityOf", safe_label(v)
        if relation == CAUSES_NO_CHANGE:
            return safe_label(u), "notActivityDirectlyRegulatesActivityOf", safe_label(v)

    # 21-23. reaction membership (catalyst = both reactant and product)
    if u_func == REACTION and _is_base_abundance(v):
        v_bel = node_to_bel(v)
        is_catalyst = v_bel in _catalyst_bels(u)
        if relation == HAS_PRODUCT and not is_catalyst:
            return node_to_bel(u), "hasProduct", entity_curie(v[CONCEPT])
        if relation == HAS_REACTANT and not is_catalyst:
            return node_to_bel(u), "hasReactant", entity_curie(v[CONCEPT])
        if relation in (HAS_PRODUCT, HAS_REACTANT) and is_catalyst:
            return node_to_bel(u), "hasCatalyst", entity_curie(v[CONCEPT])

    # 24. hasVariant between central-dogma nodes
    if relation == HAS_VARIANT and is_central_dogma(u) and is_central_dogma(v):
        return safe_label(u), "hasVariant", safe_label(v)

    # 25-28. degradation family
    if obj_modifier == DEGRADATION:
        if relation == INCREASES:
            return safe_label(u), "decreasesAmountOf", safe_label(v)
        if relation == DECREASES:
            return safe_label(u), "increasesAmountOf", safe_label(v)
        if relation == REGULATES:
            return safe_label(u), "regulatesAmountOf", safe_label(v)
        if relation == CAUSES_NO_CHANGE:
            return safe_label(u), "notRegulatesAmountOf", safe_label(v)

    return None
