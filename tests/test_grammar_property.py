"""Property-based round-trip: canonical node dict -> BEL string -> parser
-> identical node dict.

``node_to_bel`` (canon.py) and ``TermParser`` (grammar/terms.py) are
written independently; hypothesis drives random term trees (concepts with
and without identifiers, quoted names, hgvs/pmod/gmod/fragment variants,
complex/composite members, reactions) through serialize-then-parse and
requires exact dict equality — the same invariant the golden corpora
enforce pointwise, here over the whole generated space.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from pybel_ray.canon import node_to_bel, sort_members, sort_variants
from pybel_ray.constants import (
    ABUNDANCE,
    BIOPROCESS,
    COMPLEX,
    COMPOSITE,
    CONCEPT,
    FRAGMENT,
    FRAGMENT_DESCRIPTION,
    FRAGMENT_MISSING,
    FRAGMENT_START,
    FRAGMENT_STOP,
    FUNCTION,
    GENE,
    GMOD,
    HGVS,
    KIND,
    MEMBERS,
    MIRNA,
    PATHOLOGY,
    PMOD,
    PMOD_CODE,
    PMOD_POSITION,
    PRODUCTS,
    PROTEIN,
    REACTANTS,
    REACTION,
    RNA,
    VARIANTS,
)
from pybel_ray.grammar.cursor import Cursor
from pybel_ray.grammar.terms import TermParser

# names exercise the quoting path: spaces, parens, commas, plus, dashes
_NAME_ALPHABET = "abcdefgXYZ0189 ()+-_./,"
names = st.text(_NAME_ALPHABET, min_size=1, max_size=12).map(str.strip).filter(
    lambda s: s and not s.isspace(),
)
identifiers = st.one_of(st.none(), st.text("0123456789", min_size=1, max_size=6))
namespaces = st.sampled_from(["HGNC", "CHEBI", "GO", "MESHD"])


@st.composite
def concepts(draw):
    c = {"namespace": draw(namespaces), "name": draw(names)}
    ident = draw(identifiers)
    if ident is not None:
        c["identifier"] = ident
    return c


@st.composite
def hgvs_variants(draw):
    return {KIND: HGVS, HGVS: "p." + draw(st.text("ACGTdel0123456789", min_size=1, max_size=8))}


@st.composite
def pmod_variants(draw):
    v = {KIND: PMOD, CONCEPT: {"namespace": "bel", "name": draw(st.sampled_from(["Ph", "Ac", "Me", "Ub"]))}}
    code = draw(st.one_of(st.none(), st.sampled_from(["Ser", "Thr", "Tyr"])))
    if code is not None:
        v[PMOD_CODE] = code
        pos = draw(st.one_of(st.none(), st.integers(1, 999)))
        if pos is not None:
            v[PMOD_POSITION] = pos
    return v


gmod_variants = st.just({KIND: GMOD, CONCEPT: {"namespace": "bel", "name": "Me"}})


@st.composite
def fragment_variants(draw):
    if draw(st.booleans()):
        v = {KIND: FRAGMENT, FRAGMENT_MISSING: "?"}
    else:
        start = draw(st.integers(1, 500))
        v = {
            KIND: FRAGMENT,
            FRAGMENT_START: start,
            FRAGMENT_STOP: start + draw(st.integers(0, 500)),
        }
    if draw(st.booleans()):
        v[FRAGMENT_DESCRIPTION] = draw(names)
    return v


@st.composite
def central_dogma_nodes(draw):
    fn = draw(st.sampled_from([PROTEIN, GENE, RNA, MIRNA]))
    node = {FUNCTION: fn, CONCEPT: draw(concepts())}
    # variant families per function mirror the grammar (reference
    # parse_bel.py: pmod/frag protein-only, gmod gene-only, var everywhere)
    kinds = [hgvs_variants()]
    if fn == PROTEIN:
        kinds += [pmod_variants(), fragment_variants()]
    elif fn == GENE:
        kinds.append(gmod_variants)
    variants = draw(st.lists(st.one_of(*kinds), min_size=0, max_size=3))
    if variants:
        node[VARIANTS] = sort_variants(variants)
    return node


@st.composite
def simple_nodes(draw):
    # abundance functions only — BEL list/reaction members must be
    # abundances, never processes (the parser rejects bp()/path() members,
    # which this test confirmed)
    fn = draw(st.sampled_from([ABUNDANCE, COMPLEX]))
    return {FUNCTION: fn, CONCEPT: draw(concepts())}


@st.composite
def process_nodes(draw):
    fn = draw(st.sampled_from([BIOPROCESS, PATHOLOGY]))
    return {FUNCTION: fn, CONCEPT: draw(concepts())}


leaf_nodes = st.one_of(central_dogma_nodes(), simple_nodes())


@st.composite
def list_nodes(draw):
    fn = draw(st.sampled_from([COMPLEX, COMPOSITE]))
    members = draw(st.lists(leaf_nodes, min_size=2, max_size=4))
    return {FUNCTION: fn, MEMBERS: sort_members(members)}


@st.composite
def reaction_nodes(draw):
    return {
        FUNCTION: REACTION,
        REACTANTS: sort_members(draw(st.lists(leaf_nodes, min_size=1, max_size=3))),
        PRODUCTS: sort_members(draw(st.lists(leaf_nodes, min_size=1, max_size=3))),
    }


all_nodes = st.one_of(leaf_nodes, process_nodes(), list_nodes(), reaction_nodes())

_parser = TermParser()


@settings(max_examples=250, deadline=None)
@given(all_nodes)
def test_node_roundtrip(node):
    bel = node_to_bel(node)
    cur = Cursor(bel)
    term = _parser.parse_bel_term(cur)
    assert cur.at_end(), "parser left input: {!r}".format(bel[cur.pos:])
    assert term.node == node, bel


#: one-way causal keywords — none collide with structural auto-edge
#: relations (hasVariant/partOf/hasReactant/hasProduct/...), so exactly
#: one primary edge must come back
_ONE_WAY_RELATIONS = [
    "increases", "decreases", "directlyIncreases", "directlyDecreases",
    "regulates", "causesNoChange",
]


@settings(max_examples=150, deadline=None)
@given(subj=all_nodes, obj=all_nodes, rel=st.sampled_from(_ONE_WAY_RELATIONS))
def test_statement_roundtrip(subj, obj, rel):
    """Full statement round-trip: render 'subj rel obj' from random node
    dicts, parse it through the statement grammar with citation/evidence
    set, and require the primary edge to reproduce both node dicts and
    the relation exactly."""
    from pybel_ray.grammar.statements import BELStatementParser, Emissions

    parser = BELStatementParser()
    parser.start_document()
    parser.control.parse_line('SET Citation = {"PubMed", "12345"}', 1)
    parser.control.parse_line('SET Evidence = "ev"', 2)

    em = Emissions()
    line = "{} {} {}".format(node_to_bel(subj), rel, node_to_bel(obj))
    parser.parse_statement(line, 3, em)

    primary = [e for e in em.edges if e["data"]["relation"] == rel]
    assert len(primary) == 1, line
    edge = primary[0]
    assert edge["src_bel"] == node_to_bel(subj)
    assert edge["dst_bel"] == node_to_bel(obj)
    by_bel = dict(em.nodes)
    assert by_bel[node_to_bel(subj)] == subj
    assert by_bel[node_to_bel(obj)] == obj
    assert edge["data"]["citation"] == {"db": "PubMed", "db_id": "12345"}
