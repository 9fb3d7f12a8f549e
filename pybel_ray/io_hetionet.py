"""Hetionet JSON importer (reference ``io/hetionet/hetionet.py:58-205`` and
``io/hetionet/constants.py``).

The reference walks the 2.25M-edge Hetionet dict on the driver, calling one
``BELGraph.add_*`` per edge.  Here the edge list is normalized into ONE
Arrow table on the driver (ids + kind + data JSON — the heavy dict never
crosses per-row), becomes a Ray Dataset, and a single ``map_batches`` pass
maps each edge through the public Hetionet→BEL mapping tables into engine
node/edge rows; one exact-dedup per table finishes the Graph.  The
(kind, identifier)→name lookup is broadcast once via ``ray.put``.

Mapping semantics mirrored from the reference:

* ``QUALIFIED_MAPPING`` rows carry per-row source/target BEL functions
  (e.g. a Hetionet ``Gene`` becomes an ``Rna`` in anatomy rows and a
  ``Protein`` in compound rows), a relation, and a two-way flag for the
  correlative/association adders (``_add_two_way_qualified_edge`` adds the
  reversed edge too).
* ``add_binds(u, v)`` ≡ ``u directlyIncreases complex(u, v)`` plus the
  complex's partOf member auto-edges.
* Compound–binds–Gene edges fan out per drug action through the public
  action→adder tables (activates → directlyIncreases with an Activity
  object modifier, etc.), always cited to the Hetionet publication.
* ``Pharmacologic Class includes Compound`` ≡ unqualified
  ``isA(compound, class)``.
"""

from __future__ import annotations

import json
from typing import Any, Mapping, Optional

import pyarrow as pa

from .constants import (
    ABUNDANCE,
    ACTIVITY,
    ANNOTATIONS,
    ASSOCIATION,
    BIOPROCESS,
    CITATION,
    CITATION_DB,
    CITATION_IDENTIFIER,
    COMPLEX,
    CONCEPT,
    CORRELATION,
    DECREASES,
    DIRECTLY_DECREASES,
    DIRECTLY_INCREASES,
    EVIDENCE,
    FUNCTION,
    IDENTIFIER,
    INCREASES,
    IS_A,
    MEMBERS,
    MODIFIER,
    NAME,
    NAMESPACE,
    NEGATIVE_CORRELATION,
    OBJECT,
    PART_OF,
    PATHOLOGY,
    POPULATION,
    POSITIVE_CORRELATION,
    PROTEIN,
    REGULATES,
    RELATION,
    RNA,
)
from .struct.graph import (
    EDGE_COLUMNS, NODE_COLUMNS, Graph, edge_row, emit_schema,
    node_row_from_dict, pick_emitted,
)

__all__ = [
    "HETIONET_PUBMED",
    "from_hetionet_json",
    "from_hetionet_file",
    "from_hetionet_gz",
    "synthetic_hetionet",
    "synthetic_hetionet_expected_edges",
]

#: the Hetionet publication (Himmelstein et al. 2017), used as the citation
#: for edges without their own pubmed ids (ref hetionet/constants.py:9)
HETIONET_PUBMED = "28936969"

#: Hetionet node kind -> BEL namespace (ref hetionet/constants.py DSL_MAP)
NAMESPACE_MAP = {
    "Anatomy": "uberon",
    "Gene": "ncbigene",
    "Pathway": "reactome",
    "Biological Process": "go",
    "Compound": "drugbank",
    "Side Effect": "umls",
    "Disease": "doid",
    "Pharmacologic Class": "drugcentral",
    "Symptom": "mesh",
}

#: (src_kind, kind, dst_kind) -> (src_function, dst_function, relation,
#: two_way).  Ref hetionet/constants.py QUALIFIED_MAPPING: the adder method
#: determines relation + two-way-ness; the DSL class per side determines
#: the BEL function.
QUALIFIED_MAPPING = {
    ("Anatomy", "upregulates", "Gene"): (POPULATION, RNA, POSITIVE_CORRELATION, True),
    ("Anatomy", "downregulates", "Gene"): (POPULATION, RNA, NEGATIVE_CORRELATION, True),
    ("Anatomy", "expresses", "Gene"): (POPULATION, RNA, CORRELATION, True),
    ("Compound", "resembles", "Compound"): (ABUNDANCE, ABUNDANCE, ASSOCIATION, True),
    ("Compound", "upregulates", "Gene"): (ABUNDANCE, PROTEIN, INCREASES, False),
    ("Compound", "downregulates", "Gene"): (ABUNDANCE, PROTEIN, DECREASES, False),
    ("Compound", "treats", "Disease"): (ABUNDANCE, PATHOLOGY, DECREASES, False),
    ("Compound", "palliates", "Disease"): (ABUNDANCE, PATHOLOGY, DECREASES, False),
    ("Compound", "causes", "Side Effect"): (ABUNDANCE, PATHOLOGY, INCREASES, False),
    ("Gene", "interacts", "Gene"): (PROTEIN, PROTEIN, "__binds__", False),
    ("Gene", "regulates", "Gene"): (PROTEIN, PROTEIN, REGULATES, False),
    ("Gene", "covaries", "Gene"): (RNA, RNA, CORRELATION, True),
    ("Disease", "localizes", "Anatomy"): (PATHOLOGY, POPULATION, ASSOCIATION, True),
    ("Disease", "associates", "Gene"): (PATHOLOGY, PROTEIN, ASSOCIATION, True),
    ("Disease", "upregulates", "Gene"): (PATHOLOGY, RNA, POSITIVE_CORRELATION, True),
    ("Disease", "downregulates", "Gene"): (PATHOLOGY, RNA, NEGATIVE_CORRELATION, True),
    ("Disease", "presents", "Symptom"): (PATHOLOGY, PATHOLOGY, ASSOCIATION, True),
    ("Disease", "resembles", "Disease"): (PATHOLOGY, PATHOLOGY, ASSOCIATION, True),
}

#: unqualified partOf rows (ref UNQUALIFIED_MAPPING: add_part_of)
UNQUALIFIED_MAPPING = {
    ("Gene", "participates", "Pathway"): (PROTEIN, BIOPROCESS, PART_OF),
    ("Gene", "participates", "Biological Process"): (PROTEIN, BIOPROCESS, PART_OF),
}

#: drug action tags (ref hetionet/constants.py:67-85)
ACTIVATES_ACTIONS = {
    "agonist", "potentiator", "inducer", "positive modulator", "partial agonist",
    "positive allosteric modulator", "activator", "stimulator",
}
INHIBITS_ACTIONS = {
    "inhibitor", "antagonist", "blocker", "partial antagonist",
    "inhibitor, competitive", "negative modulator", "negative allosteric modulator",
    "allosteric antagonist", "suppressor", "inhibitory allosteric modulator",
    "conversion inhibitor",
}
REGULATES_ACTIONS = {"modulator", "allosteric modulator"}

#: edge-data keys that never become annotations (handled explicitly)
_SKIP_DATA_KEYS = {"actions", "urls", "subtypes", "unbiased", "pubmed_ids",
                   "source", "sources"}


def _concept_node(function: str, kind: str, identifier, name: str) -> dict:
    return {
        FUNCTION: function,
        CONCEPT: {
            NAMESPACE: NAMESPACE_MAP[kind],
            NAME: name,
            IDENTIFIER: str(identifier),
        },
    }


def _annotations_of(data: Mapping[str, Any]) -> Optional[dict]:
    annotations: dict = {}
    if "source" in data:
        annotations["source"] = {data["source"]: True}
    elif "sources" in data:
        annotations["source"] = {s: True for s in data["sources"]}
    for k, v in data.items():
        if k in _SKIP_DATA_KEYS:
            continue
        if not isinstance(v, (str, int, bool, float)):
            continue  # ref logs and skips non-scalar values
        annotations[k] = {v: True}
    return annotations or None


def _qualified_data(relation: str, citation_id: str, annotations,
                    object_modifier=None) -> dict:
    data = {
        RELATION: relation,
        EVIDENCE: "",
        CITATION: {CITATION_DB: "PubMed", CITATION_IDENTIFIER: str(citation_id)},
    }
    if annotations:
        data[ANNOTATIONS] = annotations
    if object_modifier:
        data[OBJECT] = object_modifier
    return data


class _Emitter:
    """Accumulates node/edge rows for one batch."""

    def __init__(self):
        self.rows = []

    def node(self, node_dict: dict) -> dict:
        row = node_row_from_dict(node_dict)
        self.rows.append(dict(row, _emit_kind="node"))
        return row

    def edge(self, u_row: dict, v_row: dict, data: dict) -> None:
        self.rows.append(dict(edge_row(u_row, v_row, data), _emit_kind="edge"))

    def qualified(self, u_row, v_row, relation, citation_id, annotations,
                  two_way=False, object_modifier=None) -> None:
        data = _qualified_data(relation, citation_id, annotations, object_modifier)
        self.edge(u_row, v_row, data)
        if two_way:
            self.edge(v_row, u_row, data)

    def binds(self, u, u_row, v, v_row, citation_id, annotations) -> None:
        """add_binds: u directlyIncreases complex(u, v) + partOf members."""
        from .canon import sort_members

        cplx = {FUNCTION: COMPLEX, MEMBERS: sort_members([u, v])}
        c_row = self.node(cplx)
        self.qualified(u_row, c_row, DIRECTLY_INCREASES, citation_id, annotations)
        for m, m_row in ((u, u_row), (v, v_row)):
            self.edge(m_row, c_row, {RELATION: PART_OF})


def _emit_edge(em: _Emitter, names: Mapping, edge: Mapping[str, Any]) -> None:
    """Mirror of reference ``_add_edge`` (hetionet.py:100-205)."""
    src_kind, src_id = edge["source_id"]
    dst_kind, dst_id = edge["target_id"]
    if src_kind not in NAMESPACE_MAP or dst_kind not in NAMESPACE_MAP:
        return
    kind = edge["kind"]
    data = edge.get("data") or {}
    annotations = _annotations_of(data)
    citations = [str(p) for p in data["pubmed_ids"]] if "pubmed_ids" in data \
        else [HETIONET_PUBMED]

    key = (src_kind, kind, dst_kind)

    if key in QUALIFIED_MAPPING:
        src_func, dst_func, relation, two_way = QUALIFIED_MAPPING[key]
        u = _concept_node(src_func, src_kind, src_id, names[(src_kind, src_id)])
        v = _concept_node(dst_func, dst_kind, dst_id, names[(dst_kind, dst_id)])
        u_row = em.node(u)
        v_row = em.node(v)
        for citation in citations:
            if relation == "__binds__":
                em.binds(u, u_row, v, v_row, citation, annotations)
            else:
                em.qualified(u_row, v_row, relation, citation, annotations,
                             two_way=two_way)
        return

    if key in UNQUALIFIED_MAPPING:
        src_func, dst_func, relation = UNQUALIFIED_MAPPING[key]
        u_row = em.node(_concept_node(src_func, src_kind, src_id,
                                      names[(src_kind, src_id)]))
        v_row = em.node(_concept_node(dst_func, dst_kind, dst_id,
                                      names[(dst_kind, dst_id)]))
        em.edge(u_row, v_row, {RELATION: relation})
        return

    if key == ("Compound", "binds", "Gene"):
        u = _concept_node(ABUNDANCE, src_kind, src_id, names[(src_kind, src_id)])
        v = _concept_node(PROTEIN, dst_kind, dst_id, names[(dst_kind, dst_id)])
        u_row = em.node(u)
        v_row = em.node(v)
        activity = {MODIFIER: ACTIVITY}
        for action in data.get("actions", []):
            action = action.lower()
            if action in ACTIVATES_ACTIONS:
                em.qualified(u_row, v_row, DIRECTLY_INCREASES, HETIONET_PUBMED,
                             annotations, object_modifier=activity)
            elif action in INHIBITS_ACTIONS:
                em.qualified(u_row, v_row, DIRECTLY_DECREASES, HETIONET_PUBMED,
                             annotations, object_modifier=activity)
            elif action in REGULATES_ACTIONS:
                em.qualified(u_row, v_row, REGULATES, HETIONET_PUBMED, annotations)
            else:
                em.binds(u, u_row, v, v_row, HETIONET_PUBMED, annotations)
        return

    if key == ("Pharmacologic Class", "includes", "Compound"):
        # add_is_a(compound, class): compound isA class (unqualified)
        cls_row = em.node(_concept_node(ABUNDANCE, src_kind, src_id,
                                        names[(src_kind, src_id)]))
        cpd_row = em.node(_concept_node(ABUNDANCE, dst_kind, dst_id,
                                        names[(dst_kind, dst_id)]))
        em.edge(cpd_row, cls_row, {RELATION: IS_A})
        return
    # unmapped metaedge: reference logs and skips


def from_hetionet_json(hetionet_dict: Mapping[str, Any],
                       num_blocks: int = 32) -> Graph:
    """Convert a Hetionet dict to an engine :class:`Graph`, distributed."""
    import ray
    import ray.data

    from .stages.dedup import dedup_exact

    names = {
        (x["kind"], x["identifier"]): x["name"]
        for x in hetionet_dict["nodes"]
    }
    names_ref = ray.put(names)

    edges = hetionet_dict["edges"]
    table = pa.Table.from_pydict({
        "src_kind": [e["source_id"][0] for e in edges],
        "src_id": [json.dumps(e["source_id"][1]) for e in edges],
        "dst_kind": [e["target_id"][0] for e in edges],
        "dst_id": [json.dumps(e["target_id"][1]) for e in edges],
        "kind": [e["kind"] for e in edges],
        "data_json": [json.dumps(e.get("data") or {}) for e in edges],
    })
    ds = ray.data.from_arrow(table)
    if table.num_rows > num_blocks:
        ds = ds.repartition(num_blocks)

    schema = emit_schema()

    def _emit(t: pa.Table) -> pa.Table:
        nm = ray.get(names_ref)
        em = _Emitter()
        cols = {c: t.column(c).to_pylist() for c in t.column_names}
        for i in range(t.num_rows):
            edge = {
                "source_id": (cols["src_kind"][i], json.loads(cols["src_id"][i])),
                "target_id": (cols["dst_kind"][i], json.loads(cols["dst_id"][i])),
                "kind": cols["kind"][i],
                "data": json.loads(cols["data_json"][i]),
            }
            _emit_edge(em, nm, edge)
        return pa.Table.from_pylist(em.rows, schema=schema)

    emitted = ds.map_batches(_emit, batch_format="pyarrow").materialize()

    return Graph(
        dedup_exact(pick_emitted(emitted, "node", NODE_COLUMNS), "md5"),
        dedup_exact(pick_emitted(emitted, "edge", EDGE_COLUMNS), "edge_md5"),
        metadata={"name": "Hetionet", "version": "1.0",
                  "authors": "Daniel Himmelstein"},
    )


def from_hetionet_file(file) -> Graph:
    """Hetionet from an open JSON file object."""
    return from_hetionet_json(json.load(file))


def from_hetionet_gz(path: str) -> Graph:
    """Hetionet from its .json.bz2 distribution file (ref from_hetionet_gz —
    the published artifact is bz2 despite the reference's 'gz' name)."""
    import bz2

    with bz2.open(path) as file:
        return from_hetionet_file(file)


# ---------------------------------------------------------------------------
# synthetic Hetionet-shaped corpus (bench / scale tests)
# ---------------------------------------------------------------------------

#: real Hetionet v1.0 metaedge mix (public release counts, Himmelstein et
#: al. 2017 — the reference's only published scale anchor is importing this
#: 2,250,197-edge file, ref io/hetionet/hetionet.py:32-56).  The synthetic
#: generator scales these proportions to any target edge count.
_METAEDGE_MIX = [
    # (src_kind, kind, dst_kind, real_count, bel_edges_per_input_edge)
    ("Gene", "participates", "Biological Process", 559_504, 1),
    ("Anatomy", "expresses", "Gene", 526_407, 2),
    ("Gene", "regulates", "Gene", 265_672, 1),
    ("Gene", "interacts", "Gene", 147_164, 3),  # binds: dIncreases + 2 partOf
    ("Compound", "causes", "Side Effect", 138_944, 1),
    ("Anatomy", "downregulates", "Gene", 102_240, 2),
    ("Anatomy", "upregulates", "Gene", 97_848, 2),
    ("Gene", "participates", "Pathway", 84_372, 1),
    ("Gene", "covaries", "Gene", 61_690, 2),
    ("Compound", "downregulates", "Gene", 21_102, 1),
    ("Compound", "upregulates", "Gene", 18_756, 1),
    ("Disease", "associates", "Gene", 12_623, 2),
    ("Compound", "binds", "Gene", 11_571, 1),  # one action per edge below
    ("Disease", "downregulates", "Gene", 7_623, 2),
    ("Disease", "upregulates", "Gene", 7_731, 2),
    ("Compound", "resembles", "Compound", 6_486, 2),
    ("Disease", "localizes", "Anatomy", 3_602, 2),
    ("Disease", "presents", "Symptom", 3_357, 2),
    ("Pharmacologic Class", "includes", "Compound", 1_029, 1),
    ("Compound", "treats", "Disease", 755, 1),
    ("Disease", "resembles", "Disease", 543, 2),
    ("Compound", "palliates", "Disease", 390, 1),
]

#: actions assigned round-robin to synthetic Compound-binds-Gene edges —
#: each maps to exactly ONE qualified BEL edge (activates/inhibits), so
#: the expected-count formula stays exact
_SYNTH_BINDS_ACTIONS = ["agonist", "inhibitor"]


def _metaedge_allocation(n_edges: int):
    """Scale the real mix to ``n_edges`` input edges (integer floor,
    remainder onto the largest metaedge)."""
    total = sum(c for _, _, _, c, _ in _METAEDGE_MIX)
    alloc = [(s, k, d, (c * n_edges) // total, m)
             for s, k, d, c, m in _METAEDGE_MIX]
    short = n_edges - sum(a[3] for a in alloc)
    s, k, d, c, m = alloc[0]
    alloc[0] = (s, k, d, c + short, m)
    return alloc


def synthetic_hetionet_expected_edges(n_edges: int) -> int:
    """EXACT deduped BEL edge count :func:`from_hetionet_json` produces for
    ``synthetic_hetionet(n_edges)`` — every generated input edge uses
    metaedge-disjoint node id ranges and unique (src, dst) pairs, so no
    two BEL edges ever collide in the md5 dedup."""
    return sum(c * m for _, _, _, c, m in _metaedge_allocation(n_edges))


def synthetic_hetionet(n_edges: int, seed: int = 0) -> dict:
    """Deterministic Hetionet-shaped dict (``nodes`` + ``edges``) with the
    real v1.0 metaedge proportions, sized to ``n_edges`` input edges.

    Node identifiers are disjoint per metaedge slot (``m<slot>.<i>``), and
    within a slot (src, dst) pairs enumerate a rectangle uniquely — so the
    import's BEL edge count is exactly
    :func:`synthetic_hetionet_expected_edges` (the bench's count check).
    ``seed`` only perturbs node display names; the topology is fixed.
    """
    import math

    nodes = []
    edges = []
    for slot, (src_kind, kind, dst_kind, count, _m) in enumerate(
        _metaedge_allocation(n_edges),
    ):
        if count <= 0:
            continue
        n_src = max(1, int(math.isqrt(count)))
        n_dst = count // n_src + 2
        sp = "m{}s.".format(slot)
        dp = "m{}d.".format(slot)
        for i, prefix, knd in (
            (n_src, sp, src_kind), (n_dst, dp, dst_kind),
        ):
            for j in range(i):
                ident = prefix + str(j)
                nodes.append({
                    "kind": knd,
                    "identifier": ident,
                    "name": "{} {}{}".format(knd, ident, seed),
                })
        for i in range(count):
            e = {
                "source_id": (src_kind, sp + str(i % n_src)),
                "target_id": (dst_kind, dp + str(i // n_src)),
                "kind": kind,
            }
            if kind == "binds":
                e["data"] = {
                    "actions": [
                        _SYNTH_BINDS_ACTIONS[i % len(_SYNTH_BINDS_ACTIONS)],
                    ],
                }
            edges.append(e)
    return {"nodes": nodes, "edges": edges}
