"""Statement-level BEL parsing and node/edge emission.

Replicates the relation semantics of the reference
(``/root/reference/src/pybel/parser/parse_bel.py:509-860`` and
``struct/graph.py:346-577``): qualified-relation harness (citation/evidence
required), two-way relation materialization, ``binds`` rewrite to
``u => complex(u, v)``, hasMembers/hasComponents distribution, nested causal
statements, structural auto-edges (hasVariant/partOf/hasReactant/hasProduct),
and idempotent content-hash edge insertion.

Instead of mutating a graph object, parsing *emits rows* (nodes, edges,
errors) that flow into Ray Data; global dedup happens downstream in a
groupby shuffle.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from ..canon import edge_md5, get_parent, node_to_bel, sort_members
from ..constants import (
    ALL_RELATION_TAGS,
    ANNOTATIONS,
    BEL_TO_BEL_RELATION_TAGS,
    BINDS,
    BIOMARKER_FOR,
    CAUSAL_RELATION_TAGS,
    CITATION,
    CITATION_DB,
    CITATION_IDENTIFIER,
    COMPLEX,
    DIRECTLY_INCREASES,
    EVIDENCE,
    FUNCTION,
    HAS_COMPONENT,
    HAS_COMPONENTS,
    HAS_MEMBER,
    HAS_MEMBERS,
    HAS_PRODUCT,
    HAS_REACTANT,
    HAS_VARIANT,
    IS_A,
    LINE,
    MEMBERS,
    OBJECT,
    PART_OF,
    PRODUCTS,
    PROGNOSTIC_BIOMARKER_FOR,
    RATE_LIMITING_STEP_OF,
    REACTANTS,
    RELATION,
    SUBJECT,
    SUBPROCESS_OF,
    TRANSCRIBED_TO,
    TRANSLATED_TO,
    TWO_WAY_RELATIONS,
    VARIANTS,
)
from ..exc import (
    BELSyntaxError,
    MissingAnnotationWarning,
    MissingCitationException,
    MissingSupportWarning,
    NestedRelationWarning,
)
from .cursor import Cursor, ParseFailure
from .terms import (
    ABUNDANCE_SHAPES,
    PROCESS_SHAPES,
    TRANSFORMATION_SHAPES,
    ConceptValidator,
    Term,
    TermParser,
)

__all__ = ["Emissions", "BELStatementParser"]

#: 2-character relation symbols, tried before reading a word
_SYMBOLS = ("->", "=>", "-|", "=|", "--", ":>", ">>")
_UNI_SYMBOLS = ("→", "⇒")


class Emissions:
    """Collects node/edge rows for one document with per-document dedup."""

    __slots__ = ("nodes", "edges", "seen_nodes", "seen_edges", "_bel_by_id")

    def __init__(self):
        self.nodes: List[Tuple[str, dict]] = []  # (bel, node-dict)
        self.edges: List[dict] = []  # {src_bel, dst_bel, md5, data}
        self.seen_nodes = set()
        self.seen_edges = set()
        # node dicts are immutable once built, so their serialization can be
        # cached by object identity; the dict value keeps the node alive so
        # its id() can't be recycled for a different object
        self._bel_by_id: Dict[int, Tuple[dict, str]] = {}

    # -- node insertion (reference graph.py:557-577) -----------------------

    def ensure_node(self, node: dict) -> str:
        """Add a node and its structural auto-edges; return its BEL string."""
        cached = self._bel_by_id.get(id(node))
        if cached is not None and cached[0] is node:
            bel = cached[1]
        else:
            bel = node_to_bel(node)
            self._bel_by_id[id(node)] = (node, bel)
        if bel in self.seen_nodes:
            return bel
        self.seen_nodes.add(bel)
        self.nodes.append((bel, node))

        if VARIANTS in node:
            self.add_unqualified_edge(get_parent(node), node, HAS_VARIANT)
        elif MEMBERS in node:
            for member in node[MEMBERS]:
                self.add_unqualified_edge(member, node, PART_OF)
        elif PRODUCTS in node and REACTANTS in node:
            for reactant in node[REACTANTS]:
                self.add_unqualified_edge(node, reactant, HAS_REACTANT)
            for product in node[PRODUCTS]:
                self.add_unqualified_edge(node, product, HAS_PRODUCT)
        return bel

    def _add_edge(self, u: dict, v: dict, data: dict) -> str:
        u_bel = self.ensure_node(u)
        v_bel = self.ensure_node(v)
        key = edge_md5(u_bel, v_bel, data)
        if key not in self.seen_edges:
            self.seen_edges.add(key)
            self.edges.append({
                "src_bel": u_bel,
                "dst_bel": v_bel,
                "md5": key,
                "data": data,
            })
        return key

    def add_unqualified_edge(self, u: dict, v: dict, relation: str) -> str:
        return self._add_edge(u, v, {RELATION: relation})

    def add_qualified_edge(self, u: dict, v: dict, data: dict) -> str:
        return self._add_edge(u, v, data)


class BELStatementParser:
    """Parse one BEL statement line and emit node/edge rows.

    Build once (per actor) with frozen namespace maps; reuse for every
    statement of every document — the control state is reset per document via
    :meth:`start_document`.
    """

    def __init__(
        self,
        validator: Optional[ConceptValidator] = None,
        control=None,
        disallow_nested: bool = False,
        disallow_unqualified_translocations: bool = False,
        required_annotations: Optional[List[str]] = None,
    ):
        self.terms = TermParser(
            validator=validator,
            disallow_unqualified_translocations=disallow_unqualified_translocations,
        )
        if control is None:
            from ..parsing.control import ControlParser

            control = ControlParser()
        self.control = control
        self.disallow_nested = disallow_nested
        self.required_annotations = required_annotations or []
        self.line = ""
        self.line_number = 0

    def start_document(self) -> None:
        """Reset per-document control state."""
        self.control.clear()

    # -- main entry --------------------------------------------------------

    def parse_statement(self, line: str, line_number: int, em: Emissions) -> None:
        """Parse a single statement line; emits into ``em``.

        :raises BELParserWarning: on any recoverable parse problem; the
            caller records it as an error row.
        """
        self.line = line
        self.line_number = line_number
        self.terms.line = line
        self.terms.line_number = line_number

        cur = Cursor(line)
        try:
            self._parse_statement_inner(cur, em)
        except ParseFailure as exc:
            raise BELSyntaxError(line_number, line, exc.pos) from exc

    def _parse_statement_inner(self, cur: Cursor, em: Emissions) -> None:
        subject = self.terms.parse_bel_term(cur)

        if cur.at_end():
            # singleton term (reference parse_bel.py:631): just ensure node
            em.ensure_node(subject.node)
            return

        relation_tag = self._read_relation(cur)
        relation = ALL_RELATION_TAGS[relation_tag]

        if relation in (HAS_MEMBERS, HAS_COMPONENTS):
            self._require(subject.is_abundance, cur)
            children = self._parse_abundance_list(cur)
            # distribute with switched polarity (parse_bel.py:731-749)
            child_relation = IS_A if relation == HAS_MEMBERS else PART_OF
            parent_bel_node = subject.node
            em.ensure_node(parent_bel_node)
            for child in children:
                em.add_unqualified_edge(child.node, parent_bel_node, child_relation)
            return

        if cur.peek() == "(" and relation_tag in CAUSAL_RELATION_TAGS:
            self._parse_nested(cur, em, subject, relation)
            return

        obj = self.terms.parse_bel_term(cur)

        # mixed / unqualified relations ------------------------------------
        if relation in (HAS_MEMBER, HAS_COMPONENT):
            self._require(subject.is_abundance and obj.is_abundance, cur)
            # reversed unqualified (parse_bel.py:841-847)
            em.add_unqualified_edge(obj.node, subject.node, relation)
            return
        if relation == HAS_VARIANT:
            self._require(subject.is_abundance and obj.is_abundance, cur)
            em.add_unqualified_edge(subject.node, obj.node, relation)
            return
        if relation in (HAS_REACTANT, HAS_PRODUCT):
            self._require(subject.shape == "rxn" and obj.is_abundance, cur)
            em.add_unqualified_edge(subject.node, obj.node, relation)
            return

        # typed qualified relations ----------------------------------------
        if relation == TRANSCRIBED_TO:
            self._require(subject.shape == "g" and obj.shape == "r", cur)
        elif relation == TRANSLATED_TO:
            self._require(subject.shape == "r" and obj.shape == "p", cur)
        elif relation == RATE_LIMITING_STEP_OF:
            self._require(
                subject.shape == "bp" or subject.shape == "act" or subject.is_transformation,
                cur,
            )
            self._require(obj.shape == "bp", cur)
        elif relation == SUBPROCESS_OF:
            self._require(subject.is_process or subject.is_transformation, cur)
            self._require(obj.is_process, cur)
        elif relation in (BIOMARKER_FOR, PROGNOSTIC_BIOMARKER_FOR):
            self._require(obj.is_process, cur)
        elif relation not in BEL_TO_BEL_RELATION_TAGS.values():
            raise cur.fail("relation")

        self._handle_relation_checked(cur, em, subject, relation, obj)

    # -- helpers -----------------------------------------------------------

    @staticmethod
    def _require(condition: bool, cur: Cursor) -> None:
        if not condition:
            raise cur.fail("type constraint")

    def _read_relation(self, cur: Cursor) -> str:
        cur.skip_ws()
        for sym in _SYMBOLS:
            if cur.text.startswith(sym, cur.pos):
                cur.pos += 2
                return sym
        for sym in _UNI_SYMBOLS:
            if cur.text.startswith(sym, cur.pos):
                cur.pos += len(sym)
                return sym
        word = cur.try_word()
        if word in ALL_RELATION_TAGS:
            return word
        raise cur.fail("relation")

    def _parse_abundance_list(self, cur: Cursor) -> List[Term]:
        word = cur.try_word()
        if word != "list":
            raise cur.fail("list")
        cur.expect("(")
        children = [self.terms.parse_abundance(cur)]
        while cur.try_literal(","):
            children.append(self.terms.parse_abundance(cur))
        cur.expect(")")
        return children

    def _parse_nested(self, cur: Cursor, em: Emissions, subject: Term, relation: str) -> None:
        """``a -> (b -> c)`` -> two qualified edges (parse_bel.py:658-684)."""
        if self.disallow_nested:
            raise NestedRelationWarning(self.line_number, self.line, cur.pos)
        cur.expect("(")
        inner_subject = self.terms.parse_bel_term(cur)
        inner_tag = self._read_relation(cur)
        if inner_tag not in CAUSAL_RELATION_TAGS:
            raise cur.fail("causal relation")
        inner_relation = CAUSAL_RELATION_TAGS[inner_tag]
        inner_object = self.terms.parse_bel_term(cur)
        cur.expect(")")

        self._handle_relation_checked(cur, em, subject, relation, inner_subject)
        self._handle_relation_checked(cur, em, inner_subject, inner_relation, inner_object)

    # -- qualified edges ---------------------------------------------------

    def _handle_relation_checked(
        self, cur: Cursor, em: Emissions, u: Term, relation: str, v: Term,
    ) -> None:
        """Qualified-relation harness (reference parse_bel.py:820-831)."""
        if not self.control.citation_is_set:
            raise MissingCitationException(self.line_number, self.line, cur.pos)
        if not self.control.evidence:
            raise MissingSupportWarning(self.line_number, self.line, cur.pos)
        missing = [
            a for a in self.required_annotations if a not in self.control.annotations
        ]
        if missing:
            raise MissingAnnotationWarning(self.line_number, self.line, cur.pos, missing)

        annotations = self.control.prepared_annotations()
        if relation in TWO_WAY_RELATIONS:
            self._emit_qualified(em, v, relation, u, annotations)
        self._emit_qualified(em, u, relation, v, annotations)

    def _emit_qualified(
        self, em: Emissions, u: Term, relation: str, v: Term, annotations: dict,
    ) -> None:
        if relation == BINDS:
            # u binds v  ->  u directlyIncreases complex(u, v)
            # (reference graph.py:487-506)
            complex_node = {
                FUNCTION: COMPLEX,
                MEMBERS: sort_members([u.node, v.node]),
            }
            data = self._build_edge_data(DIRECTLY_INCREASES, annotations, u.modifier, v.modifier)
            em.add_qualified_edge(u.node, complex_node, data)
            return
        data = self._build_edge_data(relation, annotations, u.modifier, v.modifier)
        em.add_qualified_edge(u.node, v.node, data)

    def _build_edge_data(
        self,
        relation: str,
        annotations: dict,
        subject_modifier: Optional[dict],
        object_modifier: Optional[dict],
    ) -> dict:
        data: Dict = {
            RELATION: relation,
            EVIDENCE: self.control.evidence,
            CITATION: {
                CITATION_DB: self.control.citation_db,
                CITATION_IDENTIFIER: self.control.citation_db_id,
            },
            LINE: self.line_number,
        }
        if annotations:
            data[ANNOTATIONS] = annotations
        if subject_modifier:
            data[SUBJECT] = subject_modifier
        if object_modifier:
            data[OBJECT] = object_modifier
        return data
