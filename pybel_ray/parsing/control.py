"""SET/UNSET control-record state machine.

Line-ordered mutable state *within one document* (citation, evidence,
statement group, annotations), mirroring
``/root/reference/src/pybel/parser/parse_control.py`` including
citation-clearing semantics (SET Citation clears evidence + annotations by
default, parse_control.py:363-370).  State never crosses documents — the
document fold owns exactly one instance per document.
"""

from __future__ import annotations

import re
from typing import Dict, List, Mapping, Optional, Pattern, Set

from ..constants import (
    BEL_KEYWORD_ALL,
    BEL_KEYWORD_CITATION,
    BEL_KEYWORD_EVIDENCE,
    BEL_KEYWORD_STATEMENT_GROUP,
    BEL_KEYWORD_SUPPORT,
    CITATION_TYPE_PUBMED,
    CITATION_TYPES,
)
from ..exc import (
    CitationTooLongException,
    CitationTooShortException,
    IllegalAnnotationValueWarning,
    InvalidCitationType,
    InvalidPubMedIdentifierWarning,
    MissingAnnotationKeyWarning,
    MissingAnnotationRegexWarning,
    MissingCitationException,
    UndefinedAnnotationWarning,
)
from ..grammar.cursor import Cursor, ParseFailure

__all__ = ["ControlParser"]

_INT_RE = re.compile(r"^[+-]?\d+$")


class ControlParser:
    """Parser + state for BEL control statements."""

    def __init__(
        self,
        annotation_to_term: Optional[Mapping[str, Set[str]]] = None,
        annotation_to_pattern: Optional[Mapping[str, Pattern]] = None,
        annotation_to_local: Optional[Mapping[str, Set[str]]] = None,
        citation_clearing: bool = True,
    ):
        self.citation_clearing = citation_clearing
        self.annotation_to_term = dict(annotation_to_term or {})
        self.annotation_to_pattern = dict(annotation_to_pattern or {})
        self.annotation_to_local = dict(annotation_to_local or {})

        self.statement_group: Optional[str] = None
        self.citation_db: Optional[str] = None
        self.citation_db_id: Optional[str] = None
        self.evidence: Optional[str] = None
        self.annotations: Dict[str, object] = {}

        self.line = ""
        self.line_number = 0

    # -- state queries -----------------------------------------------------

    @property
    def _in_debug_mode(self) -> bool:
        # quirk preserved from the reference (parse_control.py:135-137):
        # LIST-only documents skip annotation validation
        return not self.annotation_to_term and not self.annotation_to_pattern

    @property
    def citation_is_set(self) -> bool:
        return self.citation_db is not None and self.citation_db_id is not None

    def has_annotation(self, annotation: str) -> bool:
        return (
            annotation in self.annotation_to_term
            or annotation in self.annotation_to_pattern
            or annotation in self.annotation_to_local
        )

    def get_citation(self) -> Optional[dict]:
        if self.citation_db is None:
            return None
        return {"db": self.citation_db, "db_id": self.citation_db_id}

    def prepared_annotations(self) -> dict:
        """{key: {value: True, ...}} (reference parse_bel.py:797-810)."""
        out = {}
        for key, entry in self.annotations.items():
            if isinstance(entry, (set, frozenset, list)):
                out[key] = {v: True for v in sorted(entry)}
            else:
                out[key] = {entry: True}
        return out

    def get_annotations_context(self) -> dict:
        """Context snapshot stored with warnings (parse_control.py:343-349)."""
        return {
            "evidence": self.evidence,
            "citation": self.get_citation(),
            "annotations": {
                k: (sorted(v) if isinstance(v, (set, frozenset)) else v)
                for k, v in self.annotations.items()
            },
        }

    # -- clearing ----------------------------------------------------------

    def clear_citation(self) -> None:
        self.citation_db = None
        self.citation_db_id = None
        if self.citation_clearing:
            self.evidence = None
            self.annotations.clear()

    def clear(self) -> None:
        self.statement_group = None
        self.citation_db = None
        self.citation_db_id = None
        self.evidence = None
        self.annotations.clear()

    # -- validation --------------------------------------------------------

    def _raise_for_missing_citation(self, pos: int) -> None:
        if self.citation_clearing and not self.citation_is_set:
            raise MissingCitationException(self.line_number, self.line, pos)

    def _raise_for_undefined_annotation(self, pos: int, annotation: str) -> None:
        if self._in_debug_mode:
            return
        if not self.has_annotation(annotation):
            raise UndefinedAnnotationWarning(self.line_number, self.line, pos, annotation)

    def _raise_for_invalid_value(self, pos: int, key: str, value: str) -> None:
        if self._in_debug_mode:
            return
        if key in self.annotation_to_term and value not in self.annotation_to_term[key]:
            raise IllegalAnnotationValueWarning(self.line_number, self.line, pos, key, value)
        elif key in self.annotation_to_pattern and not self.annotation_to_pattern[key].match(value):
            raise MissingAnnotationRegexWarning(self.line_number, self.line, pos, key, value)
        elif key in self.annotation_to_local and value not in self.annotation_to_local[key]:
            raise IllegalAnnotationValueWarning(self.line_number, self.line, pos, key, value)

    # -- line dispatch -----------------------------------------------------

    def is_control_line(self, line: str) -> bool:
        stripped = line.lstrip()
        word = stripped.split(" ", 1)[0].split("\t", 1)[0]
        return word in ("SET", "UNSET")

    def parse_line(self, line: str, line_number: int) -> None:
        """Parse one SET/UNSET line, updating state.

        :raises BELParserWarning: on validation failures
        """
        self.line = line
        self.line_number = line_number
        cur = Cursor(line)
        word = cur.try_word()
        if word == "SET":
            self._parse_set(cur)
        elif word == "UNSET":
            self._parse_unset(cur)
        else:
            raise cur.fail("SET or UNSET")

    # -- SET ---------------------------------------------------------------

    def _parse_set(self, cur: Cursor) -> None:
        key_pos = cur.save()
        key = cur.try_identifier()
        if not key:
            raise cur.fail("annotation key")

        if key == BEL_KEYWORD_STATEMENT_GROUP:
            cur.expect("=")
            value = self._read_qid(cur)
            self.statement_group = value
            return

        if key == BEL_KEYWORD_CITATION:
            cur.expect("=")
            values = self._read_quoted_list(cur)
            self._handle_set_citation(key_pos, values)
            return

        if key in (BEL_KEYWORD_EVIDENCE, BEL_KEYWORD_SUPPORT):
            cur.expect("=")
            value = cur.try_quote()
            if value is None:
                raise cur.fail("quoted evidence")
            self.evidence = value
            return

        # generic annotation: validated key, then single value or list
        self._raise_for_missing_citation(key_pos)
        self._raise_for_undefined_annotation(key_pos, key)
        cur.expect("=")
        if cur.peek() == "{":
            values = self._read_quoted_list(cur)
            for v in values:
                self._raise_for_invalid_value(key_pos, key, v)
            self.annotations[key] = set(values)
        else:
            value = self._read_qid(cur)
            self._raise_for_invalid_value(key_pos, key, value)
            self.annotations[key] = value

    def _handle_set_citation(self, pos: int, values: List[str]) -> None:
        """(reference parse_control.py:215-248)."""
        self.clear_citation()

        if len(values) < 2:
            raise CitationTooShortException(self.line_number, self.line, pos)

        citation_db = values[0]
        if citation_db not in CITATION_TYPES:
            raise InvalidCitationType(self.line_number, self.line, pos, citation_db)

        if len(values) == 2:
            citation_db_id = values[1]
        elif len(values) > 6:
            raise CitationTooLongException(self.line_number, self.line, pos)
        else:
            # journal title in position 2 is discarded
            citation_db_id = values[2]

        if citation_db == CITATION_TYPE_PUBMED and not _INT_RE.match(citation_db_id):
            raise InvalidPubMedIdentifierWarning(
                self.line_number, self.line, pos, citation_db_id,
            )

        self.citation_db = citation_db
        self.citation_db_id = citation_db_id

    # -- UNSET -------------------------------------------------------------

    def _parse_unset(self, cur: Cursor) -> None:
        if cur.peek() == "{":
            keys = self._read_unquoted_list(cur)
            for key in keys:
                if key in (BEL_KEYWORD_EVIDENCE, BEL_KEYWORD_SUPPORT):
                    self.evidence = None
                else:
                    self._validate_unset(cur.pos, key)
                    del self.annotations[key]
            return

        key_pos = cur.save()
        key = cur.try_identifier()
        if not key:
            raise cur.fail("annotation key")

        if key == BEL_KEYWORD_ALL:
            self.clear()
        elif key == BEL_KEYWORD_CITATION:
            if not self.citation_is_set:
                raise MissingAnnotationKeyWarning(
                    self.line_number, self.line, key_pos, BEL_KEYWORD_CITATION,
                )
            self.clear_citation()
        elif key in (BEL_KEYWORD_EVIDENCE, BEL_KEYWORD_SUPPORT):
            if self.evidence is None:
                raise MissingAnnotationKeyWarning(self.line_number, self.line, key_pos, key)
            self.evidence = None
        elif key == BEL_KEYWORD_STATEMENT_GROUP:
            if self.statement_group is None:
                raise MissingAnnotationKeyWarning(
                    self.line_number, self.line, key_pos, BEL_KEYWORD_STATEMENT_GROUP,
                )
            self.statement_group = None
        else:
            # annotation-key validation applies to UNSET too
            # (reference parse_control.py:97-98 reuses the validated key element)
            self._raise_for_missing_citation(key_pos)
            self._raise_for_undefined_annotation(key_pos, key)
            self._validate_unset(key_pos, key)
            del self.annotations[key]

    def _validate_unset(self, pos: int, annotation: str) -> None:
        if annotation not in self.annotations:
            raise MissingAnnotationKeyWarning(self.line_number, self.line, pos, annotation)

    # -- token helpers -----------------------------------------------------

    @staticmethod
    def _read_qid(cur: Cursor) -> str:
        q = cur.try_quote()
        if q is not None:
            return q
        w = cur.try_identifier()
        if not w:
            raise cur.fail("value")
        return w

    @staticmethod
    def _read_quoted_list(cur: Cursor) -> List[str]:
        cur.expect("{")
        values = []
        q = cur.try_quote()
        if q is None:
            raise cur.fail("quoted value")
        values.append(q)
        while cur.try_literal(","):
            q = cur.try_quote()
            if q is None:
                raise cur.fail("quoted value")
            values.append(q)
        cur.expect("}")
        return values

    @staticmethod
    def _read_unquoted_list(cur: Cursor) -> List[str]:
        cur.expect("{")
        values = []
        w = cur.try_identifier()
        if not w:
            raise cur.fail("key")
        values.append(w)
        while cur.try_literal(","):
            w = cur.try_identifier()
            if not w:
                raise cur.fail("key")
            values.append(w)
        cur.expect("}")
        return values
