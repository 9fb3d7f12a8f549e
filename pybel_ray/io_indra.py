"""INDRA statement interop (reference ``io/indra.py:46-180``).

The reference's ``from_indra_statements``/``to_indra_statements`` are thin
wrappers that delegate the whole conversion to the external ``indra``
package (``PybelAssembler``/``PybelProcessor``), which is not available in
this environment.  This module therefore implements the conversion from
scratch over INDRA's *public statement JSON format* (the canonical
serialization every INDRA statement carries via ``Statement.to_json()``),
mirroring the assembler's published BEL semantics:

* Agents ground by db_refs priority FPLX > HGNC > UP > MIRBASE > CHEBI >
  GO > MESH, falling back to a TEXT-namespace abundance; agent ``mods``
  become BEL ``pmod()`` variants (one-letter residues widened to the
  BEL three-letter amino-acid codes).
* ``Phosphorylation``-family modifications: ``enz`` directlyIncreases
  ``sub`` + pmod; the ``De``-modifications use directlyDecreases.
* ``Activation``/``Inhibition``: directlyIncreases/-Decreases with an
  Activity object modifier (the ``obj_activity`` as a ``ma()`` effect).
* ``IncreaseAmount``/``DecreaseAmount``: directlyIncreases/-Decreases.
* ``Complex``: a BEL complex node over the sorted members plus the
  engine's standard ``partOf`` member auto-edges.
* ``ActiveForm``: modified agent directlyIncreases (or -Decreases when
  ``is_active`` is false) the agent's activity.
* ``Gef``/``Gap``: act(gef/gap) directlyIncreases/-Decreases
  act(ras, ma(gtp)).
* One edge per evidence (text -> evidence, pmid -> PubMed citation).

Execution is Ray-Data-native like :mod:`.io_hetionet`: the statement list
becomes ONE Arrow table of JSON strings, a single ``map_batches`` pass
emits node/edge rows, and one exact-dedup per table finishes the Graph.
``to_indra_statements`` runs the inverse per-edge mapping distributed over
the edges Dataset (plus one pass over complex nodes).
"""

from __future__ import annotations

import json
from typing import Any, Iterable, Mapping, Optional

import pyarrow as pa

from .constants import (
    ABUNDANCE,
    ACTIVITY,
    ANNOTATIONS,
    BEL_DEFAULT_NAMESPACE,
    BIOPROCESS,
    CITATION,
    CITATION_DB,
    CITATION_IDENTIFIER,
    COMPLEX,
    CONCEPT,
    DIRECTLY_DECREASES,
    DIRECTLY_INCREASES,
    EFFECT,
    EVIDENCE,
    FUNCTION,
    IDENTIFIER,
    KIND,
    MEMBERS,
    MIRNA,
    MODIFIER,
    NAME,
    NAMESPACE,
    OBJECT,
    PART_OF,
    PMOD,
    PMOD_CODE,
    PMOD_POSITION,
    PROTEIN,
    RELATION,
    SUBJECT,
    VARIANTS,
    AMINO_ACIDS,
)
from .struct.graph import (
    EDGE_COLUMNS, NODE_COLUMNS, Graph, edge_row, emit_schema,
    node_row_from_dict, pick_emitted,
)

__all__ = [
    "from_indra_statements",
    "from_indra_json_file",
    "to_indra_statements",
]

#: db_refs key -> (BEL namespace, node function), in grounding priority
#: order (mirrors the public PybelAssembler grounding hierarchy)
_GROUNDING_ORDER = [
    ("FPLX", ("fplx", PROTEIN)),
    ("HGNC", ("hgnc", PROTEIN)),
    ("UP", ("uniprot", PROTEIN)),
    ("MIRBASE", ("mirbase", MIRNA)),
    ("CHEBI", ("chebi", ABUNDANCE)),
    ("GO", ("go", BIOPROCESS)),
    ("MESH", ("mesh", ABUNDANCE)),
]

#: INDRA mod_type -> BEL pmod name (public BEL default-namespace labels)
_MOD_TYPE_TO_PMOD = {
    "phosphorylation": "Ph",
    "ubiquitination": "Ub",
    "sumoylation": "Sumo",
    "hydroxylation": "Hy",
    "acetylation": "Ac",
    "glycosylation": "Glyco",
    "methylation": "Me",
    "farnesylation": "Farn",
    "geranylgeranylation": "Gerger",
    "palmitoylation": "Palm",
    "myristoylation": "Myr",
    "ribosylation": "ADPRib",
}
_PMOD_TO_MOD_TYPE = {v: k for k, v in _MOD_TYPE_TO_PMOD.items()}

#: statement type -> (mod_type, polarity); De-modifications decrease
_MODIFICATION_TYPES = {}
for _mt, _pmod in _MOD_TYPE_TO_PMOD.items():
    _stmt = _mt[0].upper() + _mt[1:]
    _MODIFICATION_TYPES[_stmt] = (_mt, DIRECTLY_INCREASES)
    _MODIFICATION_TYPES["De" + _mt] = (_mt, DIRECTLY_DECREASES)

_THREE_LETTER_TO_ONE = {v: k for k, v in AMINO_ACIDS.items()}


def _agent_node(agent: Mapping[str, Any]) -> Optional[dict]:
    """INDRA Agent JSON -> engine node dict (None for a null agent)."""
    if agent is None:
        return None
    name = agent.get("name")
    db_refs = agent.get("db_refs") or {}
    node = None
    for key, (namespace, function) in _GROUNDING_ORDER:
        if key in db_refs:
            identifier = str(db_refs[key])
            # CHEBI/GO ids are commonly CURIE-prefixed in db_refs
            prefix = key + ":"
            if identifier.upper().startswith(prefix):
                identifier = identifier[len(prefix):]
            node = {
                FUNCTION: function,
                CONCEPT: {
                    NAMESPACE: namespace,
                    NAME: name,
                    IDENTIFIER: identifier,
                },
            }
            break
    if node is None:  # ungrounded -> TEXT namespace abundance
        node = {
            FUNCTION: ABUNDANCE,
            CONCEPT: {NAMESPACE: "text", NAME: name or db_refs.get("TEXT", "?")},
        }
    variants = [_mod_variant(m) for m in agent.get("mods") or []]
    if variants:
        from .canon import sort_variants

        node[VARIANTS] = sort_variants(variants)
    return node


def _mod_variant(mod: Mapping[str, Any]) -> dict:
    """INDRA ModCondition JSON -> BEL pmod variant dict."""
    pmod_name = _MOD_TYPE_TO_PMOD.get(mod.get("mod_type"), "Ph")
    variant = {
        KIND: PMOD,
        CONCEPT: {NAMESPACE: BEL_DEFAULT_NAMESPACE, NAME: pmod_name},
    }
    residue = mod.get("residue")
    if residue:
        variant[PMOD_CODE] = AMINO_ACIDS.get(residue, residue)
    if mod.get("position") is not None:
        variant[PMOD_POSITION] = int(mod["position"])
    return variant


def _pmod_node(agent: Mapping[str, Any], mod_type: str,
               residue: Optional[str], position) -> dict:
    """Target node for a Modification statement: sub + one pmod variant."""
    node = _agent_node(agent)
    mod = {"mod_type": mod_type}
    if residue:
        mod["residue"] = residue
    if position is not None:
        mod["position"] = position
    from .canon import sort_variants

    node = dict(node)
    node[VARIANTS] = sort_variants(
        list(node.get(VARIANTS) or []) + [_mod_variant(mod)],
    )
    return node


def _activity_modifier(activity: Optional[str]) -> dict:
    modifier = {MODIFIER: ACTIVITY}
    if activity and activity != "activity":
        modifier[EFFECT] = {NAMESPACE: BEL_DEFAULT_NAMESPACE, NAME: activity}
    return modifier


def _evidences(stmt: Mapping[str, Any]) -> list:
    """(evidence_text, citation_dict|None) per evidence; one default.
    ``pmid`` maps to a PubMed citation; otherwise the first (sorted)
    ``text_refs`` entry becomes the citation database/id pair."""
    out = []
    for ev in stmt.get("evidence") or []:
        citation = None
        if ev.get("pmid"):
            citation = {CITATION_DB: "PubMed",
                        CITATION_IDENTIFIER: str(ev["pmid"])}
        elif ev.get("text_refs"):
            db, ident = sorted(ev["text_refs"].items())[0]
            citation = {CITATION_DB: str(db), CITATION_IDENTIFIER: str(ident)}
        out.append((ev.get("text") or "", citation))
    return out or [("", None)]


class _Emitter:
    """Accumulates node/edge rows for one batch (same shape as io_hetionet)."""

    def __init__(self):
        self.rows = []

    def node(self, node_dict: dict) -> dict:
        row = node_row_from_dict(node_dict)
        self.rows.append(dict(row, _emit_kind="node"))
        return row

    def edge(self, u_row: dict, v_row: dict, data: dict) -> None:
        self.rows.append(dict(edge_row(u_row, v_row, data), _emit_kind="edge"))

    def qualified(self, u_row, v_row, relation, stmt,
                  subject_modifier=None, object_modifier=None) -> None:
        for evidence_text, citation in _evidences(stmt):
            data = {RELATION: relation, EVIDENCE: evidence_text}
            if citation:
                data[CITATION] = citation
            if subject_modifier:
                data[SUBJECT] = subject_modifier
            if object_modifier:
                data[OBJECT] = object_modifier
            self.edge(u_row, v_row, data)


def _emit_statement(em: _Emitter, stmt: Mapping[str, Any]) -> bool:
    """Emit node/edge rows for one statement; False if unsupported."""
    stype = stmt.get("type")

    if stype in _MODIFICATION_TYPES:
        mod_type, relation = _MODIFICATION_TYPES[stype]
        enz, sub = stmt.get("enz"), stmt.get("sub")
        if enz is None or sub is None:
            return False
        u_row = em.node(_agent_node(enz))
        v_row = em.node(_pmod_node(sub, mod_type, stmt.get("residue"),
                                   stmt.get("position")))
        em.qualified(u_row, v_row, relation, stmt)
        return True

    if stype == "Autophosphorylation":
        enz = stmt.get("enz")
        if enz is None:
            return False
        u_row = em.node(_agent_node(enz))
        v_row = em.node(_pmod_node(enz, "phosphorylation", stmt.get("residue"),
                                   stmt.get("position")))
        em.qualified(u_row, v_row, DIRECTLY_INCREASES, stmt)
        return True

    if stype in ("Activation", "Inhibition"):
        subj, obj = stmt.get("subj"), stmt.get("obj")
        if subj is None or obj is None:
            return False
        relation = DIRECTLY_INCREASES if stype == "Activation" else DIRECTLY_DECREASES
        u_row = em.node(_agent_node(subj))
        v_row = em.node(_agent_node(obj))
        em.qualified(u_row, v_row, relation, stmt,
                     object_modifier=_activity_modifier(stmt.get("obj_activity")))
        return True

    if stype in ("IncreaseAmount", "DecreaseAmount"):
        subj, obj = stmt.get("subj"), stmt.get("obj")
        if subj is None or obj is None:
            return False  # subject-less amounts carry no BEL edge
        relation = (DIRECTLY_INCREASES if stype == "IncreaseAmount"
                    else DIRECTLY_DECREASES)
        u_row = em.node(_agent_node(subj))
        v_row = em.node(_agent_node(obj))
        em.qualified(u_row, v_row, relation, stmt)
        return True

    if stype == "Complex":
        members = [m for m in stmt.get("members") or [] if m is not None]
        if len(members) < 2:
            return False
        from .canon import sort_members

        member_nodes = [_agent_node(m) for m in members]
        cplx = {FUNCTION: COMPLEX, MEMBERS: sort_members(member_nodes)}
        c_row = em.node(cplx)
        for m in member_nodes:
            em.edge(em.node(m), c_row, {RELATION: PART_OF})
        return True

    if stype == "ActiveForm":
        agent = stmt.get("agent")
        if agent is None or not agent.get("mods"):
            # a state-less ActiveForm (the state lived in bound conditions
            # or mutations, which have no BEL pmod form here) would emit a
            # vacuous self-edge — skip it, as INDRA's own assembler does
            return False
        base = dict(_agent_node(agent))
        base.pop(VARIANTS, None)
        u_row = em.node(_agent_node(agent))
        v_row = em.node(base)
        relation = (DIRECTLY_INCREASES if stmt.get("is_active", True)
                    else DIRECTLY_DECREASES)
        em.qualified(u_row, v_row, relation, stmt,
                     object_modifier=_activity_modifier(stmt.get("activity")))
        return True

    if stype in ("Gef", "Gap"):
        subj = stmt.get("gef") if stype == "Gef" else stmt.get("gap")
        ras = stmt.get("ras")
        if subj is None or ras is None:
            return False
        relation = DIRECTLY_INCREASES if stype == "Gef" else DIRECTLY_DECREASES
        u_row = em.node(_agent_node(subj))
        v_row = em.node(_agent_node(ras))
        em.qualified(u_row, v_row, relation, stmt,
                     subject_modifier=_activity_modifier("gef" if stype == "Gef"
                                                         else "gap"),
                     object_modifier=_activity_modifier("gtp"))
        return True

    return False  # Translocation, Conversion, ... : no BEL edge form here


def from_indra_statements(stmts: Iterable[Any], name: Optional[str] = None,
                          version: Optional[str] = None,
                          num_blocks: int = 32) -> Graph:
    """Convert INDRA statements (JSON dicts, or objects with ``to_json()``)
    to an engine :class:`Graph`, distributed via one map_batches pass."""
    import ray
    import ray.data

    from .stages.dedup import dedup_exact

    payloads = []
    for s in stmts:
        if hasattr(s, "to_json"):  # live indra objects, when available
            s = s.to_json()
        payloads.append(json.dumps(s))

    table = pa.Table.from_pydict({"stmt_json": payloads})
    ds = ray.data.from_arrow(table)
    if table.num_rows > num_blocks:
        ds = ds.repartition(num_blocks)

    schema = emit_schema()

    def _emit(t: pa.Table) -> pa.Table:
        em = _Emitter()
        for payload in t.column("stmt_json").to_pylist():
            _emit_statement(em, json.loads(payload))
        return pa.Table.from_pylist(em.rows, schema=schema)

    emitted = ds.map_batches(_emit, batch_format="pyarrow").materialize()

    return Graph(
        dedup_exact(pick_emitted(emitted, "node", NODE_COLUMNS), "md5"),
        dedup_exact(pick_emitted(emitted, "edge", EDGE_COLUMNS), "edge_md5"),
        metadata={"name": name or "INDRA", "version": version or "1.0.0"},
    )


def from_indra_json_file(path: str, **kwargs) -> Graph:
    """INDRA statements from a JSON list file (``stmts_to_json`` output)."""
    with open(path) as file:
        return from_indra_statements(json.load(file), **kwargs)


# ---------------------------------------------------------------------------
# export
# ---------------------------------------------------------------------------

_NAMESPACE_TO_DB_REF = {
    "fplx": "FPLX", "hgnc": "HGNC", "uniprot": "UP", "mirbase": "MIRBASE",
    "chebi": "CHEBI", "go": "GO", "mesh": "MESH", "text": "TEXT",
}


def _node_to_agent(node: Mapping[str, Any]) -> Optional[dict]:
    concept = node.get(CONCEPT)
    if not concept:
        return None
    namespace = concept.get(NAMESPACE)
    key = _NAMESPACE_TO_DB_REF.get(namespace)
    if key is None:
        return None
    agent: dict = {"name": concept.get(NAME), "db_refs": {}}
    if key == "TEXT":
        agent["db_refs"]["TEXT"] = concept.get(NAME)
    else:
        agent["db_refs"][key] = concept.get(IDENTIFIER)
    mods = []
    for variant in node.get(VARIANTS) or []:
        if variant.get(KIND) != PMOD:
            return None  # hgvs/frag variants have no INDRA agent form
        mod_type = _PMOD_TO_MOD_TYPE.get((variant.get(CONCEPT) or {}).get(NAME))
        if mod_type is None:
            return None
        mod = {"mod_type": mod_type, "is_modified": True}
        if PMOD_CODE in variant:
            mod["residue"] = _THREE_LETTER_TO_ONE.get(
                variant[PMOD_CODE], variant[PMOD_CODE],
            )
        if PMOD_POSITION in variant:
            mod["position"] = str(variant[PMOD_POSITION])
        mods.append(mod)
    if mods:
        agent["mods"] = mods
    return agent


def _edge_to_statement(src: dict, dst: dict, relation: str,
                       evidence: Optional[str], citation_db: Optional[str],
                       citation_id: Optional[str],
                       object_json: Optional[str]) -> Optional[dict]:
    """Inverse of :func:`_emit_statement` for one edge row."""
    if relation not in (DIRECTLY_INCREASES, DIRECTLY_DECREASES):
        return None
    subj = _node_to_agent(src)
    positive = relation == DIRECTLY_INCREASES

    obj_modifier = json.loads(object_json) if object_json else None
    evidence_list = []
    if evidence or citation_id:
        ev: dict = {}
        if evidence:
            ev["text"] = evidence
        if citation_id:
            # only PubMed ids are pmids; everything else rides text_refs
            if citation_db == "PubMed":
                ev["pmid"] = citation_id
            else:
                ev["text_refs"] = {str(citation_db or "UNKNOWN"): citation_id}
        evidence_list = [ev]

    if obj_modifier and obj_modifier.get(MODIFIER) == ACTIVITY:
        obj = _node_to_agent(dst)
        if subj is None or obj is None:
            return None
        effect = (obj_modifier.get(EFFECT) or {}).get(NAME, "activity")
        return {
            "type": "Activation" if positive else "Inhibition",
            "subj": subj, "obj": obj, "obj_activity": effect,
            "evidence": evidence_list,
        }

    dst_mods = [v for v in dst.get(VARIANTS) or [] if v.get(KIND) == PMOD]
    if dst_mods:
        last = dst_mods[-1]
        mod_type = _PMOD_TO_MOD_TYPE.get((last.get(CONCEPT) or {}).get(NAME))
        if mod_type is None or subj is None:
            return None
        base = dict(dst)
        base[VARIANTS] = dst_mods[:-1]
        if not base[VARIANTS]:
            base.pop(VARIANTS)
        sub = _node_to_agent(base)
        if sub is None:
            return None
        stmt_type = (mod_type[0].upper() + mod_type[1:] if positive
                     else "De" + mod_type)
        stmt = {"type": stmt_type, "enz": subj, "sub": sub,
                "evidence": evidence_list}
        if PMOD_CODE in last:
            stmt["residue"] = _THREE_LETTER_TO_ONE.get(
                last[PMOD_CODE], last[PMOD_CODE],
            )
        if PMOD_POSITION in last:
            stmt["position"] = str(last[PMOD_POSITION])
        return stmt

    obj = _node_to_agent(dst)
    if subj is None or obj is None:
        return None
    return {
        "type": "IncreaseAmount" if positive else "DecreaseAmount",
        "subj": subj, "obj": obj, "evidence": evidence_list,
    }


#: nodes tables at or below this row count broadcast their md5->node_json
#: map; above it the edge enrichment runs as two distributed equi-joins
#: (the same budget-hybrid shape as the entity-linking and segment-dedup
#: operators)
_NODE_BROADCAST_BUDGET = 2_000_000


def to_indra_statements(graph: Graph, broadcast_budget: int = _NODE_BROADCAST_BUDGET):
    """Engine Graph -> Dataset of INDRA statement JSON strings
    (column ``stmt_json``), the inverse of :func:`from_indra_statements`
    for the supported statement subset.  Distributed: one map_batches
    over the edges (causal statements) plus one over the nodes (Complex
    statements from complex nodes).

    Edges carry only BEL strings + md5s, so node dicts are re-attached
    from the nodes table: a broadcast md5 -> node_json lookup when the
    nodes fit ``broadcast_budget`` (one ``ray.put``, read per actor
    task), else two distributed bucketed equi-joins (src, then dst) —
    the nodes table never lands on the driver at scale.
    """
    import pyarrow.compute as pc

    edge_cols = ["src_md5", "dst_md5", "relation", "evidence",
                 "citation_db", "citation_id", "object_json"]

    # materialize the narrow projection ONCE: count + (broadcast drain or
    # two join sides) would otherwise re-run the dedup lineage 2-3x
    nodes_narrow = graph.nodes.select_columns(["md5", "node_json"]).materialize()

    if nodes_narrow.count() <= broadcast_budget:
        import ray

        node_map = {
            r["md5"]: r["node_json"]
            for r in nodes_narrow.take_all()
        }
        node_map_ref = ray.put(node_map)

        def _attach(t: pa.Table) -> pa.Table:
            nm = ray.get(node_map_ref)
            src = pa.array(
                [nm.get(m) for m in t.column("src_md5").to_pylist()],
                pa.string(),
            )
            dst = pa.array(
                [nm.get(m) for m in t.column("dst_md5").to_pylist()],
                pa.string(),
            )
            t = t.append_column("src_node_json", src)
            return t.append_column("dst_node_json", dst)

        enriched = graph.edges.select_columns(edge_cols).map_batches(
            _attach, batch_format="pyarrow",
        )
    else:  # beyond-budget path: two bucketed distributed joins
        from .ops.relational import equi_join

        def _rename(col_from, col_to):
            def _f(t: pa.Table) -> pa.Table:
                return t.rename_columns([
                    col_to if c == col_from else c for c in t.column_names
                ])

            return _f

        src_side = nodes_narrow.map_batches(
            _rename("node_json", "src_node_json"), batch_format="pyarrow",
        )
        dst_side = nodes_narrow.map_batches(
            _rename("node_json", "dst_node_json"), batch_format="pyarrow",
        )
        enriched = equi_join(
            graph.edges.select_columns(edge_cols), src_side,
            on="src_md5", right_on="md5", how="inner",
        )
        enriched = equi_join(
            enriched, dst_side, on="dst_md5", right_on="md5", how="inner",
        )

    def _edge_batch(t: pa.Table) -> pa.Table:
        out = []
        cols = {c: t.column(c).to_pylist() for c in (
            "src_node_json", "dst_node_json", "relation", "evidence",
            "citation_db", "citation_id", "object_json",
        )}
        for i in range(t.num_rows):
            src_json = cols["src_node_json"][i]
            dst_json = cols["dst_node_json"][i]
            if not src_json or not dst_json:
                continue
            stmt = _edge_to_statement(
                json.loads(src_json), json.loads(dst_json),
                cols["relation"][i], cols["evidence"][i],
                cols["citation_db"][i], cols["citation_id"][i],
                cols["object_json"][i],
            )
            if stmt is not None:
                out.append({"stmt_json": json.dumps(stmt, sort_keys=True)})
        return pa.Table.from_pylist(
            out, schema=pa.schema([("stmt_json", pa.string())]),
        )

    def _complex_batch(t: pa.Table) -> pa.Table:
        out = []
        mask = pc.equal(t.column("function"), COMPLEX)
        for payload in t.filter(mask).column("node_json").to_pylist():
            node = json.loads(payload)
            members = [_node_to_agent(m) for m in node.get(MEMBERS) or []]
            if len(members) >= 2 and all(m is not None for m in members):
                out.append({"stmt_json": json.dumps(
                    {"type": "Complex", "members": members, "evidence": []},
                    sort_keys=True,
                )})
        return pa.Table.from_pylist(
            out, schema=pa.schema([("stmt_json", pa.string())]),
        )

    causal = enriched.map_batches(_edge_batch, batch_format="pyarrow")
    complexes = graph.nodes.map_batches(_complex_batch, batch_format="pyarrow")
    from .stages.dedup import dedup_exact

    return dedup_exact(causal.union(complexes), "stmt_json")
