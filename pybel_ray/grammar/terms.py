"""Recursive-descent parser for BEL terms.

Covers the full BEL 1.0/2.0 term surface of the reference grammar
(``/root/reference/src/pybel/parser/parse_bel.py:55-507`` and
``parser/modifiers/*``): all abundance functions, variants (pmod incl. legacy
codes, gmod, var/HGVS, frag, legacy sub/trunc), fusions (2.0 + legacy),
activities (act/ma incl. BEL 1.0 activity upgrade), translocations
(standard/legacy/unqualified, sec/surf), degradation, reactions, locations.

Produced nodes are plain nested dicts; see ``pybel_ray.canon`` for identity.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Mapping, Optional

from ..constants import (
    ABUNDANCE,
    ACTIVITY,
    ACTIVITY_LABELS,
    AMINO_ACIDS,
    AMINO_ACID_TRIPLES,
    BEL_DEFAULT_NAMESPACE,
    BELNS_ENCODINGS,
    BIOPROCESS,
    CELL_SURFACE,
    COMPLEX,
    COMPOSITE,
    CONCEPT,
    DEGRADATION,
    DIRTY,
    DNA_NUCLEOTIDES,
    EFFECT,
    EXTRACELLULAR,
    FRAGMENT,
    FRAGMENT_DESCRIPTION,
    FRAGMENT_MISSING,
    FRAGMENT_START,
    FRAGMENT_STOP,
    FROM_LOC,
    FUNCTION,
    FUSION,
    FUSION_MISSING,
    FUSION_REFERENCE,
    FUSION_START,
    FUSION_STOP,
    GENE,
    GMOD,
    GMOD_NAMESPACE,
    HGVS,
    IDENTIFIER,
    INTRACELLULAR,
    KIND,
    LOCATION,
    MEMBERS,
    MIRNA,
    MODIFIER,
    NAME,
    NAMESPACE,
    PARTNER_3P,
    PARTNER_5P,
    PATHOLOGY,
    PMOD,
    PMOD_CODE,
    PMOD_LEGACY_LABELS,
    PMOD_NAMESPACE,
    PMOD_POSITION,
    POPULATION,
    PRODUCTS,
    PROTEIN,
    RANGE_3P,
    RANGE_5P,
    REACTANTS,
    REACTION,
    RNA,
    TO_LOC,
    TRANSLOCATION,
    VARIANTS,
)
from ..canon import sort_members, sort_variants
from ..exc import (
    InvalidEntity,
    InvalidFunctionSemantic,
    MalformedTranslocationWarning,
    MissingNamespaceNameWarning,
    MissingNamespaceRegexWarning,
    NakedNameWarning,
    PlaceholderAminoAcidWarning,
    UndefinedNamespaceWarning,
)
from .cursor import Cursor, ParseFailure

__all__ = ["Term", "TermParser", "ConceptValidator"]

# shapes (which grammar production produced the term) for statement-level
# type constraints
ABUNDANCE_SHAPES = {"a", "complex", "composite", "g", "m", "p", "r"}
SIMPLE_ABUNDANCE_SHAPES = {"a", "complex", "g", "m", "p", "r"}
PROCESS_NODE_SHAPES = {"bp", "path", "pop"}
PROCESS_SHAPES = PROCESS_NODE_SHAPES | {"act"}
TRANSFORMATION_SHAPES = {"tloc", "sec", "surf", "deg", "rxn"}

_FUNC_SHAPE = {
    ABUNDANCE: "a", GENE: "g", MIRNA: "m", PROTEIN: "p", RNA: "r",
    COMPLEX: "complex", COMPOSITE: "composite",
    BIOPROCESS: "bp", PATHOLOGY: "path", POPULATION: "pop", REACTION: "rxn",
}

#: term tag -> (function constant)
_SINGLE_TAGS = {
    "a": ABUNDANCE, "abundance": ABUNDANCE,
    "g": GENE, "geneAbundance": GENE,
    "m": MIRNA, "microRNAAbundance": MIRNA,
    "p": PROTEIN, "proteinAbundance": PROTEIN,
    "r": RNA, "rnaAbundance": RNA,
}
_PROCESS_TAGS = {
    "bp": BIOPROCESS, "biologicalProcess": BIOPROCESS,
    "o": PATHOLOGY, "path": PATHOLOGY, "pathology": PATHOLOGY,
    "pop": POPULATION, "populationAbundance": POPULATION,
}
_COMPLEX_TAGS = {"complex", "complexAbundance"}
_COMPOSITE_TAGS = {"composite", "compositeAbundance"}
_REACTION_TAGS = {"rxn", "reaction"}
_ACTIVITY_TAGS = {"act", "activity"}
_TLOC_TAGS = {"tloc", "translocation"}
_SEC_TAGS = {"sec", "cellSecretion"}
_SURF_TAGS = {"surf", "cellSurfaceExpression"}
_DEG_TAGS = {"deg", "degradation"}
_MA_TAGS = {"ma", "molecularActivity"}
_LOC_TAGS = {"loc", "location"}
_FUS_TAGS = {"fus", "fusion"}

_GENE_VARIANT_TAGS = {"var", "variant", "sub", "substitution", "gmod", "geneModification"}
_PROTEIN_VARIANT_TAGS = {
    "pmod", "proteinModification", "var", "variant", "frag", "fragment",
    "sub", "substitution", "trunc", "truncation",
}
_RNA_VARIANT_TAGS = {"var", "variant"}

# longest-first literal lists for default-namespace matching (some contain
# spaces/dashes, so plain word reads don't suffice)
_PMOD_DEFAULT_KEYS = sorted(PMOD_NAMESPACE, key=len, reverse=True)
_PMOD_LEGACY_KEYS = sorted(PMOD_LEGACY_LABELS, key=len, reverse=True)
_GMOD_KEYS = sorted(GMOD_NAMESPACE, key=len, reverse=True)
_ACTIVITY_KEYS = sorted(ACTIVITY_LABELS, key=len, reverse=True)

_HGVS_CHARS = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789._*=?>"
)


@dataclass
class Term:
    """A parsed BEL term: the node plus edge-side modifier info."""

    node: dict
    modifier: dict = field(default_factory=dict)
    shape: str = ""

    @property
    def is_abundance(self) -> bool:
        return self.shape in ABUNDANCE_SHAPES

    @property
    def is_process(self) -> bool:
        return self.shape in PROCESS_SHAPES

    @property
    def is_transformation(self) -> bool:
        return self.shape in TRANSFORMATION_SHAPES


class ConceptValidator:
    """Validates ``NS:name`` concepts against frozen namespace maps.

    Mirrors ``/root/reference/src/pybel/parser/parse_concept.py`` semantics:
    enumerated namespaces validate name membership, regex namespaces validate
    the pattern, bare names either become namespace ``dirty`` (lenient) or
    raise ``NakedNameWarning`` (strict).
    """

    def __init__(
        self,
        namespace_to_name_to_encoding: Optional[Mapping[str, Mapping[str, str]]] = None,
        namespace_to_pattern: Optional[Mapping[str, Any]] = None,
        allow_naked_names: bool = False,
    ):
        self.namespace_to_name_to_encoding = dict(namespace_to_name_to_encoding or {})
        self.namespace_to_pattern = dict(namespace_to_pattern or {})
        self.allow_naked_names = allow_naked_names
        self.skip_validation = not self.namespace_to_name_to_encoding and not self.namespace_to_pattern

    def has_namespace(self, namespace: str) -> bool:
        return namespace in self.namespace_to_name_to_encoding or namespace in self.namespace_to_pattern

    def validate(self, line_number: int, line: str, position: int, namespace: str, name: str) -> None:
        if self.skip_validation:
            return
        if not self.has_namespace(namespace):
            raise UndefinedNamespaceWarning(line_number, line, position, namespace, name)
        names = self.namespace_to_name_to_encoding.get(namespace)
        if names is not None and name not in names:
            raise MissingNamespaceNameWarning(line_number, line, position, namespace, name)
        pattern = self.namespace_to_pattern.get(namespace)
        if pattern is not None and not pattern.match(name):
            raise MissingNamespaceRegexWarning(line_number, line, position, namespace, name)


def _match_longest(cur: Cursor, keys) -> Optional[str]:
    """Match the longest literal from ``keys`` at the cursor (pyparsing oneOf)."""
    cur.skip_ws()
    text, pos = cur.text, cur.pos
    for key in keys:
        if text.startswith(key, pos):
            cur.pos = pos + len(key)
            return key
    return None


def _term_span(text: str, pos: int) -> int:
    """End index of the balanced ``word(...)`` term starting at ``pos``.

    Quote-aware (backslash escapes honored).  Returns -1 when the text at
    ``pos`` is not a parenthesized term or the parens don't balance — the
    caller then falls back to the ordinary parse.
    """
    n = len(text)
    i = pos
    while i < n and (text[i].isalnum() or text[i] in "_"):
        i += 1
    if i == pos or i >= n or text[i] != "(":
        return -1
    depth = 1
    i += 1
    while i < n:
        c = text[i]
        if c == '"':
            i += 1
            while i < n:
                if text[i] == "\\":
                    i += 2
                    continue
                if text[i] == '"':
                    break
                i += 1
            if i >= n:
                return -1
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    return -1


class TermParser:
    """Parser for BEL terms, reusable across statements (build once per actor)."""

    def __init__(
        self,
        validator: Optional[ConceptValidator] = None,
        disallow_unqualified_translocations: bool = False,
    ):
        self.validator = validator or ConceptValidator()
        self.disallow_unqualified_translocations = disallow_unqualified_translocations
        # optional cross-document term cache (set by the compile driver)
        self.term_cache = None
        self.scope_key = None
        # line context, set by the statement parser before each parse
        self.line = ""
        self.line_number = 0

    # -- concepts ----------------------------------------------------------

    def parse_concept(self, cur: Cursor, validate: bool = True) -> dict:
        """Parse ``NS:name``, ``NS:id!name``, or a bare name."""
        position = cur.save()
        ns = cur.try_word()
        if ns and cur.try_literal(":"):
            first = cur.try_word_or_quote()
            if first is None:
                raise cur.fail("name after ':'")
            if cur.try_literal("!"):
                name = cur.try_word_or_quote()
                if name is None:
                    raise cur.fail("name after '!'")
                entity = {NAMESPACE: ns, NAME: name, IDENTIFIER: first}
            else:
                entity = {NAMESPACE: ns, NAME: first}
            if validate:
                self.validator.validate(self.line_number, self.line, position, ns, entity[NAME])
            return entity

        # bare name (restore in case the word was followed by something else)
        cur.restore(position)
        name = cur.try_word_or_quote()
        if name is None:
            raise cur.fail("concept")
        if self.validator.allow_naked_names:
            return {NAMESPACE: DIRTY, NAME: name}
        raise NakedNameWarning(self.line_number, self.line, position, name)

    def check_function_semantics(self, cur_pos: int, node: dict) -> None:
        """Function-vs-encoding check (reference parse_bel.py:686-724)."""
        if self.validator.skip_validation or CONCEPT not in node:
            return
        concept = node[CONCEPT]
        namespace, name = concept[NAMESPACE], concept.get(NAME)
        if namespace in self.validator.namespace_to_pattern:
            return
        if self.validator.allow_naked_names and namespace == DIRTY:
            return
        if namespace not in self.validator.namespace_to_name_to_encoding:
            return
        encoding = self.validator.namespace_to_name_to_encoding[namespace].get(name, "")
        valid_functions = set()
        for letter in encoding:
            valid_functions |= BELNS_ENCODINGS.get(letter, set())
        if not valid_functions:
            raise InvalidEntity(self.line_number, self.line, cur_pos, namespace, name)
        if node[FUNCTION] not in valid_functions:
            raise InvalidFunctionSemantic(
                self.line_number, self.line, cur_pos,
                node[FUNCTION], namespace, name, sorted(valid_functions),
            )

    # -- locations ---------------------------------------------------------

    def _try_location(self, cur: Cursor) -> Optional[dict]:
        """Parse ``loc(concept)``; cursor must be positioned at the tag word."""
        save = cur.save()
        word = cur.try_word()
        if word not in _LOC_TAGS or not cur.try_literal("("):
            cur.restore(save)
            return None
        entity = self.parse_concept(cur)
        cur.expect(")")
        return entity

    # -- variants ----------------------------------------------------------

    def _parse_amino_acid(self, cur: Cursor) -> str:
        position = cur.save()
        word = cur.try_word()
        if word in AMINO_ACID_TRIPLES:
            return word
        if word == "X":
            raise PlaceholderAminoAcidWarning(self.line_number, self.line, position, word)
        if word in AMINO_ACIDS:
            return AMINO_ACIDS[word]
        raise cur.fail("amino acid")

    def _parse_pmod(self, cur: Cursor) -> dict:
        cur.expect("(")
        save = cur.save()
        # MatchFirst: qualified concept, then default-namespace, then legacy
        concept = None
        word = cur.try_word()
        if word and cur.try_literal(":"):
            cur.restore(save)
            concept = self.parse_concept(cur)
        else:
            cur.restore(save)
            key = _match_longest(cur, _PMOD_DEFAULT_KEYS)
            if key is not None:
                concept = {NAMESPACE: BEL_DEFAULT_NAMESPACE, NAME: PMOD_NAMESPACE[key]}
            else:
                key = _match_longest(cur, _PMOD_LEGACY_KEYS)
                if key is not None:
                    concept = {NAMESPACE: BEL_DEFAULT_NAMESPACE, NAME: PMOD_LEGACY_LABELS[key]}
        if concept is None:
            raise cur.fail("pmod concept")
        variant = {KIND: PMOD, CONCEPT: concept}
        if cur.try_literal(","):
            variant[PMOD_CODE] = self._parse_amino_acid(cur)
            if cur.try_literal(","):
                pos_val = cur.try_int()
                if pos_val is None:
                    raise cur.fail("pmod position")
                variant[PMOD_POSITION] = pos_val
        cur.expect(")")
        return variant

    def _parse_gmod(self, cur: Cursor) -> dict:
        cur.expect("(")
        save = cur.save()
        word = cur.try_word()
        if word and cur.try_literal(":"):
            cur.restore(save)
            concept = self.parse_concept(cur)
        else:
            cur.restore(save)
            key = _match_longest(cur, _GMOD_KEYS)
            if key is None:
                raise cur.fail("gmod concept")
            concept = {NAMESPACE: BEL_DEFAULT_NAMESPACE, NAME: GMOD_NAMESPACE[key]}
        cur.expect(")")
        return {KIND: GMOD, CONCEPT: concept}

    def _parse_hgvs(self, cur: Cursor) -> dict:
        cur.expect("(")
        value = cur.try_quote()
        if value is None:
            value = cur.try_chars(_HGVS_CHARS)
            if not value:
                raise cur.fail("hgvs string")
        cur.expect(")")
        return {KIND: HGVS, HGVS: value}

    def _parse_fragment(self, cur: Cursor) -> dict:
        cur.expect("(")
        quoted = cur.try_quote()
        if quoted is not None:
            inner = Cursor(quoted)
            variant = self._parse_fragment_range(inner)
            if not inner.at_end():
                raise cur.fail("fragment range")
        else:
            variant = self._parse_fragment_range(cur)
        if cur.try_literal(","):
            desc = cur.try_quote()
            if desc is None:
                raise cur.fail("fragment description")
            variant[FRAGMENT_DESCRIPTION] = desc
        cur.expect(")")
        return variant

    def _parse_fragment_range(self, cur: Cursor) -> dict:
        start = cur.try_int()
        if start is None and cur.try_literal("?"):
            if cur.try_literal("_"):
                start = "?"
            else:
                # lone '?': missing fragment
                return {KIND: FRAGMENT, FRAGMENT_MISSING: "?"}
        elif start is not None:
            cur.expect("_")
        else:
            raise cur.fail("fragment range")
        stop = cur.try_int()
        if stop is None:
            if cur.try_literal("?"):
                stop = "?"
            elif cur.try_literal("*"):
                stop = "*"
            else:
                raise cur.fail("fragment stop")
        # mirror reference Fragment.__init__: falsy start/stop -> missing
        if start and stop:
            return {KIND: FRAGMENT, FRAGMENT_START: start, FRAGMENT_STOP: stop}
        return {KIND: FRAGMENT, FRAGMENT_MISSING: "?"}

    def _parse_psub(self, cur: Cursor) -> dict:
        """Legacy ``sub(R, 275, H)`` -> HGVS ``p.Arg275His``."""
        cur.expect("(")
        ref = self._parse_amino_acid(cur)
        cur.expect(",")
        position = cur.try_int()
        if position is None:
            raise cur.fail("substitution position")
        cur.expect(",")
        var = self._parse_amino_acid(cur)
        cur.expect(")")
        return {KIND: HGVS, HGVS: "p.{}{}{}".format(ref, position, var)}

    def _parse_gsub(self, cur: Cursor) -> dict:
        """Legacy gene ``sub(G, 275341, C)`` -> HGVS ``c.275341G>C``."""
        cur.expect("(")
        ref = cur.try_word()
        if ref not in DNA_NUCLEOTIDES:
            raise cur.fail("nucleotide")
        cur.expect(",")
        position = cur.try_int()
        if position is None:
            raise cur.fail("substitution position")
        cur.expect(",")
        var = cur.try_word()
        if var not in DNA_NUCLEOTIDES:
            raise cur.fail("nucleotide")
        cur.expect(")")
        return {KIND: HGVS, HGVS: "c.{}{}>{}".format(position, ref, var)}

    def _parse_trunc(self, cur: Cursor) -> dict:
        """Legacy ``trunc(Gly, 17)`` / ``trunc(40)`` -> HGVS ``p.Gly17*`` / ``p.40*``."""
        cur.expect("(")
        save = cur.save()
        try:
            aa = self._parse_amino_acid(cur)
            cur.expect(",")
            position = cur.try_int()
            if position is None:
                raise cur.fail("truncation position")
            cur.expect(")")
            return {KIND: HGVS, HGVS: "p.{}{}*".format(aa, position)}
        except ParseFailure:
            cur.restore(save)
        position = cur.try_int()
        if position is None:
            raise cur.fail("truncation position")
        cur.expect(")")
        return {KIND: HGVS, HGVS: "p.{}*".format(position)}

    def _parse_variant(self, cur: Cursor, tag: str, func: str) -> dict:
        if tag in ("var", "variant"):
            return self._parse_hgvs(cur)
        if tag in ("pmod", "proteinModification"):
            return self._parse_pmod(cur)
        if tag in ("gmod", "geneModification"):
            return self._parse_gmod(cur)
        if tag in ("frag", "fragment"):
            return self._parse_fragment(cur)
        if tag in ("trunc", "truncation"):
            return self._parse_trunc(cur)
        if tag in ("sub", "substitution"):
            return self._parse_gsub(cur) if func == GENE else self._parse_psub(cur)
        raise cur.fail("variant")

    # -- fusions -----------------------------------------------------------

    def _parse_fusion_range(self, cur: Cursor) -> dict:
        """``"r.1_79"`` / ``"?"`` with permissive unquoted fallback."""
        quoted = cur.try_quote()
        if quoted is not None:
            inner = Cursor(quoted)
            rng = self._parse_fusion_range_inner(inner)
            if not inner.at_end():
                raise cur.fail("fusion range")
            return rng
        return self._parse_fusion_range_inner(cur)

    def _parse_fusion_range_inner(self, cur: Cursor) -> dict:
        save = cur.save()
        ref = cur.try_word()
        if ref in ("r", "p", "c") and cur.try_literal("."):
            start = cur.try_int()
            if start is None:
                cur.expect("?")
                start = "?"
            cur.expect("_")
            stop = cur.try_int()
            if stop is None:
                cur.expect("?")
                stop = "?"
            return {FUSION_REFERENCE: ref, FUSION_START: start, FUSION_STOP: stop}
        cur.restore(save)
        cur.expect("?")
        return {FUSION_MISSING: "?"}

    def _parse_modern_fusion(self, cur: Cursor, func: str) -> dict:
        """``fus(HGNC:TMPRSS2, "r.1_79", HGNC:ERG, "r.312_5034")`` (tag consumed)."""
        cur.expect("(")
        partner_5p = self.parse_concept(cur)
        cur.expect(",")
        range_5p = self._parse_fusion_range(cur)
        cur.expect(",")
        partner_3p = self.parse_concept(cur)
        cur.expect(",")
        range_3p = self._parse_fusion_range(cur)
        cur.expect(")")
        return {
            FUNCTION: func,
            FUSION: {
                PARTNER_5P: {FUNCTION: func, CONCEPT: partner_5p},
                PARTNER_3P: {FUNCTION: func, CONCEPT: partner_3p},
                RANGE_5P: range_5p,
                RANGE_3P: range_3p,
            },
        }

    def _parse_legacy_fusion(self, cur: Cursor, func: str, partner_5p: dict, reference: str) -> dict:
        """``HGNC:BCR, fus(HGNC:JAK2, 1875, 2626)`` — 'fus' tag consumed."""
        cur.expect("(")
        partner_3p = self.parse_concept(cur)
        range_5p: dict = {FUSION_MISSING: "?"}
        range_3p: dict = {FUSION_MISSING: "?"}
        if cur.try_literal(","):
            # 5' break: known stop; 3' break: known start
            # (reference modifiers/fusion.py:100-126)
            break5 = cur.try_int()
            if break5 is None:
                cur.expect("?")
                range_5p = {FUSION_MISSING: "?"}
            else:
                range_5p = {FUSION_REFERENCE: reference, FUSION_START: "?", FUSION_STOP: break5}
            cur.expect(",")
            break3 = cur.try_int()
            if break3 is None:
                cur.expect("?")
                range_3p = {FUSION_MISSING: "?"}
            else:
                range_3p = {FUSION_REFERENCE: reference, FUSION_START: break3, FUSION_STOP: "?"}
        cur.expect(")")
        return {
            FUNCTION: func,
            FUSION: {
                PARTNER_5P: {FUNCTION: func, CONCEPT: partner_5p},
                PARTNER_3P: {FUNCTION: func, CONCEPT: partner_3p},
                RANGE_5P: range_5p,
                RANGE_3P: range_3p,
            },
        }

    # -- abundances --------------------------------------------------------

    def _central_dogma_variant_tags(self, func: str):
        if func == GENE:
            return _GENE_VARIANT_TAGS
        if func == PROTEIN:
            return _PROTEIN_VARIANT_TAGS
        return _RNA_VARIANT_TAGS

    _LEGACY_FUSION_REF = {GENE: "c", RNA: "r", MIRNA: "r", PROTEIN: "p"}

    def _parse_single_abundance(self, cur: Cursor, func: str) -> Term:
        """g/m/p/r/a(...) after the tag word."""
        cur.expect("(")
        start_pos = cur.save()
        modifier: dict = {}

        if func == ABUNDANCE:
            concept = self.parse_concept(cur)
            node = {FUNCTION: func, CONCEPT: concept}
            if cur.try_literal(","):
                loc = self._try_location(cur)
                if loc is None:
                    raise cur.fail("loc()")
                modifier[LOCATION] = loc
            cur.expect(")")
            self.check_function_semantics(start_pos, node)
            return Term(node=node, modifier=modifier, shape="a")

        # central dogma: fusion | legacy fusion | concept [+ variants] [+ loc]
        save = cur.save()
        word = cur.try_word()
        if word in _FUS_TAGS and cur.peek() == "(" and func != MIRNA:
            node = self._parse_modern_fusion(cur, func)
            if cur.try_literal(","):
                loc = self._try_location(cur)
                if loc is None:
                    raise cur.fail("loc()")
                modifier[LOCATION] = loc
            cur.expect(")")
            return Term(node=node, modifier=modifier, shape=_FUNC_SHAPE[func])
        cur.restore(save)

        concept = self.parse_concept(cur)
        node = {FUNCTION: func, CONCEPT: concept}
        variants = []
        variant_tags = self._central_dogma_variant_tags(func)
        while cur.try_literal(","):
            save = cur.save()
            word = cur.try_word()
            if word in _LOC_TAGS:
                cur.restore(save)
                loc = self._try_location(cur)
                if loc is None:
                    raise cur.fail("loc()")
                modifier[LOCATION] = loc
                break
            if word in _FUS_TAGS and not variants and func != MIRNA:
                node = self._parse_legacy_fusion(
                    cur, func, concept, self._LEGACY_FUSION_REF[func],
                )
                if cur.try_literal(","):
                    loc = self._try_location(cur)
                    if loc is None:
                        raise cur.fail("loc()")
                    modifier[LOCATION] = loc
                break
            if word in variant_tags:
                variants.append(self._parse_variant(cur, word, func))
                continue
            raise cur.fail("variant or loc")
        if variants:
            node[VARIANTS] = sort_variants(variants)
        cur.expect(")")
        self.check_function_semantics(start_pos, node)
        return Term(node=node, modifier=modifier, shape=_FUNC_SHAPE[func])

    def _parse_complex(self, cur: Cursor) -> Term:
        """complex(...) after the tag: member list first, else named singleton."""
        cur.expect("(")
        start_pos = cur.save()
        modifier: dict = {}

        # member list? (first token is a function tag followed by '(')
        save = cur.save()
        word = cur.try_word()
        is_list = (
            (word in _SINGLE_TAGS or word in _COMPLEX_TAGS) and cur.peek() == "("
        )
        cur.restore(save)

        if is_list:
            members = []
            while True:
                members.append(self._parse_complex_member(cur))
                if not cur.try_literal(","):
                    break
                save = cur.save()
                w = cur.try_word()
                if w in _LOC_TAGS:
                    cur.restore(save)
                    loc = self._try_location(cur)
                    if loc is None:
                        raise cur.fail("loc()")
                    modifier[LOCATION] = loc
                    break
                cur.restore(save)
            cur.expect(")")
            node = {FUNCTION: COMPLEX, MEMBERS: sort_members(members)}
            self.check_function_semantics(start_pos, node)
            return Term(node=node, modifier=modifier, shape="complex")

        concept = self.parse_concept(cur)
        node = {FUNCTION: COMPLEX, CONCEPT: concept}
        if cur.try_literal(","):
            loc = self._try_location(cur)
            if loc is None:
                raise cur.fail("loc()")
            modifier[LOCATION] = loc
        cur.expect(")")
        self.check_function_semantics(start_pos, node)
        return Term(node=node, modifier=modifier, shape="complex")

    def _parse_complex_member(self, cur: Cursor) -> dict:
        """single_abundance | complex_singleton (reference parse_bel.py:399-401)."""
        save = cur.save()
        word = cur.try_word()
        if word in _SINGLE_TAGS:
            return self._parse_single_abundance(cur, _SINGLE_TAGS[word]).node
        if word in _COMPLEX_TAGS:
            cur.expect("(")
            start_pos = cur.save()
            concept = self.parse_concept(cur)
            cur.expect(")")
            node = {FUNCTION: COMPLEX, CONCEPT: concept}
            self.check_function_semantics(start_pos, node)
            return node
        cur.restore(save)
        raise cur.fail("complex member")

    def parse_simple_abundance(self, cur: Cursor) -> Term:
        """complex_abundances | single_abundance."""
        save = cur.save()
        word = cur.try_word()
        if word in _COMPLEX_TAGS:
            return self._parse_complex(cur)
        if word in _SINGLE_TAGS:
            return self._parse_single_abundance(cur, _SINGLE_TAGS[word])
        cur.restore(save)
        raise cur.fail("simple abundance")

    def _parse_composite(self, cur: Cursor) -> Term:
        cur.expect("(")
        modifier: dict = {}
        members = [self.parse_simple_abundance(cur).node]
        while cur.try_literal(","):
            save = cur.save()
            w = cur.try_word()
            if w in _LOC_TAGS:
                cur.restore(save)
                loc = self._try_location(cur)
                if loc is None:
                    raise cur.fail("loc()")
                modifier[LOCATION] = loc
                break
            cur.restore(save)
            members.append(self.parse_simple_abundance(cur).node)
        cur.expect(")")
        node = {FUNCTION: COMPOSITE, MEMBERS: sort_members(members)}
        return Term(node=node, modifier=modifier, shape="composite")

    def parse_abundance(self, cur: Cursor) -> Term:
        save = cur.save()
        word = cur.try_word()
        if word in _COMPOSITE_TAGS:
            return self._parse_composite(cur)
        cur.restore(save)
        return self.parse_simple_abundance(cur)

    # -- processes ---------------------------------------------------------

    def _parse_process_node(self, cur: Cursor, func: str) -> Term:
        cur.expect("(")
        start_pos = cur.save()
        concept = self.parse_concept(cur)
        cur.expect(")")
        node = {FUNCTION: func, CONCEPT: concept}
        self.check_function_semantics(start_pos, node)
        return Term(node=node, shape=_FUNC_SHAPE[func])

    def _parse_molecular_activity(self, cur: Cursor) -> dict:
        """``ma(...)`` -> effect entity; tag already consumed, at '('."""
        cur.expect("(")
        save = cur.save()
        word = cur.try_word()
        if word in ACTIVITY_LABELS and cur.peek() == ")":
            effect = {NAMESPACE: BEL_DEFAULT_NAMESPACE, NAME: ACTIVITY_LABELS[word]}
        else:
            cur.restore(save)
            effect = self.parse_concept(cur)
        cur.expect(")")
        return effect

    def _parse_activity(self, cur: Cursor) -> Term:
        """``act(target [, ma(...)])`` after the tag."""
        cur.expect("(")
        target = self.parse_simple_abundance(cur)
        modifier = {MODIFIER: ACTIVITY}
        if cur.try_literal(","):
            word = cur.try_word()
            if word not in _MA_TAGS:
                raise cur.fail("ma()")
            modifier[EFFECT] = self._parse_molecular_activity(cur)
        cur.expect(")")
        if LOCATION in target.modifier:
            modifier[LOCATION] = target.modifier[LOCATION]
        return Term(node=target.node, modifier=modifier, shape="act")

    def _parse_legacy_activity(self, cur: Cursor, label: str) -> Term:
        """BEL 1.0 ``kin(p(X))`` -> act(p(X), ma(kin)) (parse_bel.py:873-882)."""
        cur.expect("(")
        target = self.parse_simple_abundance(cur)
        cur.expect(")")
        modifier = {
            MODIFIER: ACTIVITY,
            EFFECT: {NAMESPACE: BEL_DEFAULT_NAMESPACE, NAME: ACTIVITY_LABELS[label]},
        }
        if LOCATION in target.modifier:
            modifier[LOCATION] = target.modifier[LOCATION]
        return Term(node=target.node, modifier=modifier, shape="act")

    def parse_process(self, cur: Cursor) -> Term:
        save = cur.save()
        word = cur.try_word()
        if word in _PROCESS_TAGS:
            return self._parse_process_node(cur, _PROCESS_TAGS[word])
        if word in _ACTIVITY_TAGS:
            return self._parse_activity(cur)
        if word in ACTIVITY_LABELS:
            return self._parse_legacy_activity(cur, word)
        cur.restore(save)
        raise cur.fail("process")

    # -- transformations ---------------------------------------------------

    def _parse_translocation(self, cur: Cursor) -> Term:
        """``tloc(...)`` after the tag: unqualified | standard | legacy."""
        cur.expect("(")
        start_pos = cur.save()
        target = self.parse_simple_abundance(cur)
        if cur.try_literal(")"):
            # unqualified translocation
            if self.disallow_unqualified_translocations:
                raise MalformedTranslocationWarning(
                    self.line_number, self.line, start_pos,
                )
            modifier = {MODIFIER: TRANSLOCATION}
            if LOCATION in target.modifier:
                modifier[LOCATION] = target.modifier[LOCATION]
            return Term(node=target.node, modifier=modifier, shape="tloc")

        cur.expect(",")
        save = cur.save()
        word = cur.try_word()
        if word == FROM_LOC and cur.peek() == "(":
            cur.expect("(")
            from_loc = self.parse_concept(cur)
            cur.expect(")")
            cur.expect(",")
            w2 = cur.try_word()
            if w2 != TO_LOC:
                raise cur.fail("toLoc")
            cur.expect("(")
            to_loc = self.parse_concept(cur)
            cur.expect(")")
        else:
            # legacy: tloc(term, NS:A, NS:B)
            cur.restore(save)
            from_loc = self.parse_concept(cur)
            cur.expect(",")
            to_loc = self.parse_concept(cur)
        cur.expect(")")
        modifier = {
            MODIFIER: TRANSLOCATION,
            EFFECT: {FROM_LOC: from_loc, TO_LOC: to_loc},
        }
        if LOCATION in target.modifier:
            modifier[LOCATION] = target.modifier[LOCATION]
        return Term(node=target.node, modifier=modifier, shape="tloc")

    def _parse_secretion_like(self, cur: Cursor, shape: str, to_name: str) -> Term:
        cur.expect("(")
        target = self.parse_simple_abundance(cur)
        cur.expect(")")
        modifier = {
            MODIFIER: TRANSLOCATION,
            EFFECT: {
                FROM_LOC: {NAMESPACE: BEL_DEFAULT_NAMESPACE, NAME: INTRACELLULAR},
                TO_LOC: {NAMESPACE: BEL_DEFAULT_NAMESPACE, NAME: to_name},
            },
        }
        if LOCATION in target.modifier:
            modifier[LOCATION] = target.modifier[LOCATION]
        return Term(node=target.node, modifier=modifier, shape=shape)

    def _parse_degradation(self, cur: Cursor) -> Term:
        cur.expect("(")
        target = self.parse_simple_abundance(cur)
        cur.expect(")")
        modifier = {MODIFIER: DEGRADATION}
        if LOCATION in target.modifier:
            modifier[LOCATION] = target.modifier[LOCATION]
        return Term(node=target.node, modifier=modifier, shape="deg")

    def _parse_reaction(self, cur: Cursor) -> Term:
        cur.expect("(")
        word = cur.try_word()
        if word != "reactants":
            raise cur.fail("reactants")
        cur.expect("(")
        reactants = [self.parse_simple_abundance(cur).node]
        while cur.try_literal(","):
            reactants.append(self.parse_simple_abundance(cur).node)
        cur.expect(")")
        cur.expect(",")
        word = cur.try_word()
        if word != "products":
            raise cur.fail("products")
        cur.expect("(")
        products = [self.parse_simple_abundance(cur).node]
        while cur.try_literal(","):
            products.append(self.parse_simple_abundance(cur).node)
        cur.expect(")")
        cur.expect(")")
        node = {
            FUNCTION: REACTION,
            REACTANTS: sort_members(reactants),
            PRODUCTS: sort_members(products),
        }
        return Term(node=node, shape="rxn")

    def parse_transformation(self, cur: Cursor) -> Term:
        save = cur.save()
        word = cur.try_word()
        if word in _SEC_TAGS:
            return self._parse_secretion_like(cur, "sec", EXTRACELLULAR)
        if word in _SURF_TAGS:
            return self._parse_secretion_like(cur, "surf", CELL_SURFACE)
        if word in _TLOC_TAGS:
            return self._parse_translocation(cur)
        if word in _DEG_TAGS:
            return self._parse_degradation(cur)
        if word in _REACTION_TAGS:
            return self._parse_reaction(cur)
        cur.restore(save)
        raise cur.fail("transformation")

    # -- top level ---------------------------------------------------------

    def parse_bel_term(self, cur: Cursor) -> Term:
        """transformation | process | abundance (reference parse_bel.py:507).

        When the statement parser attaches a ``term_cache`` (actor-lifetime,
        keyed by (namespace-scope, exact term text)), a previously parsed
        term is returned without re-parsing and the cursor jumps over its
        span.  Valid because a Term is a pure function of the term text and
        the frozen namespace scope, and parsed node/modifier dicts are
        immutable downstream; only *successful* parses are cached, so
        warning/error paths always re-parse with correct positions.
        """
        cache = self.term_cache
        if cache is not None:
            cur.skip_ws()
            start = cur.pos
            end = _term_span(cur.text, start)
            if end > 0:
                key = (self.scope_key, cur.text[start:end])
                hit = cache.get(key)
                if hit is not None:
                    cur.pos = end
                    return hit
                term = self._parse_bel_term_uncached(cur)
                if cur.pos == end:  # parse consumed exactly the span
                    cache[key] = term
                return term
        return self._parse_bel_term_uncached(cur)

    def _parse_bel_term_uncached(self, cur: Cursor) -> Term:
        save = cur.save()
        word = cur.try_word()
        if not word:
            raise cur.fail("BEL term")
        cur.restore(save)

        if word in _SEC_TAGS or word in _SURF_TAGS or word in _TLOC_TAGS \
                or word in _DEG_TAGS or word in _REACTION_TAGS:
            return self.parse_transformation(cur)
        if word in _PROCESS_TAGS or word in _ACTIVITY_TAGS or word in ACTIVITY_LABELS:
            return self.parse_process(cur)
        if word in _COMPOSITE_TAGS:
            cur.try_word()
            return self._parse_composite(cur)
        if word in _COMPLEX_TAGS or word in _SINGLE_TAGS:
            return self.parse_simple_abundance(cur)
        raise cur.fail("BEL term")
