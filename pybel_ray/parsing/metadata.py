"""Parser for the document-metadata and definitions sections.

``SET DOCUMENT k = v``, ``DEFINE NAMESPACE k AS URL|PATTERN ...``,
``DEFINE ANNOTATION k AS URL|LIST|PATTERN ...`` — semantics per
``/root/reference/src/pybel/parser/parse_metadata.py:46-306``.
"""

from __future__ import annotations

import re
from datetime import datetime
from typing import Optional

from ..constants import DOCUMENT_KEYS
from ..exc import (
    InvalidMetadataException,
    RedefinedAnnotationError,
    RedefinedNamespaceError,
    VersionFormatWarning,
)
from ..grammar.cursor import Cursor
from ..resources import ResourceRegistry

__all__ = ["MetadataParser"]

SEMANTIC_VERSION_RE = re.compile(
    r"(?P<major>\d+)\.(?P<minor>\d+)\.(?P<patch>\d+)"
    r"(?:-(?P<release>[0-9A-Za-z-]+(?:\.[0-9A-Za-z-]+)*))?"
    r"(?:\+(?P<build>[0-9A-Za-z-]+(?:\.[0-9A-Za-z-]+)*))?",
)


def _valid_date_version(version: str) -> bool:
    try:
        datetime.strptime(version, "%Y%m%d")
        return True
    except ValueError:
        return False


class MetadataParser:
    """Accumulates document metadata and namespace/annotation definitions."""

    def __init__(
        self,
        registry: Optional[ResourceRegistry] = None,
        allow_redefinition: bool = False,
    ):
        self.registry = registry or ResourceRegistry()
        self.disallow_redefinition = not allow_redefinition

        self.document_metadata = {}
        #: {namespace keyword: {name: encoding}}
        self.namespace_to_name_to_encoding = {}
        #: {namespace keyword: {name: identifier}} (for OBO-style output)
        self.namespace_to_name_to_identifier = {}
        #: {namespace keyword: compiled regex}
        self.namespace_to_pattern = {}
        self.namespace_url_dict = {}
        #: {annotation keyword: set of values}
        self.annotation_to_term = {}
        self.annotation_to_pattern = {}
        self.annotation_to_local = {}
        self.annotation_url_dict = {}

        self.line = ""
        self.line_number = 0

    # -- queries -----------------------------------------------------------

    def has_namespace(self, keyword: str) -> bool:
        return keyword in self.namespace_to_name_to_encoding or keyword in self.namespace_to_pattern

    def has_annotation(self, keyword: str) -> bool:
        return (
            keyword in self.annotation_to_term
            or keyword in self.annotation_to_pattern
            or keyword in self.annotation_to_local
        )

    # -- dispatch ----------------------------------------------------------

    def parse_line(self, line: str, line_number: int) -> None:
        """Parse one document/definitions line.

        :raises BELParserWarning: on metadata problems
        :raises ResourceError: when a resource URL is not in the registry
        """
        self.line = line
        self.line_number = line_number
        cur = Cursor(line)
        word = cur.try_word()
        if word == "SET":
            w2 = cur.try_word()
            if w2 != "DOCUMENT":
                raise cur.fail("DOCUMENT")
            self._parse_document(cur)
        elif word == "DEFINE":
            w2 = cur.try_word()
            if w2 == "NAMESPACE":
                self._parse_namespace(cur)
            elif w2 == "ANNOTATION":
                self._parse_annotation(cur)
            else:
                raise cur.fail("NAMESPACE or ANNOTATION")
        else:
            raise cur.fail("SET or DEFINE")

    # -- document metadata -------------------------------------------------

    def _parse_document(self, cur: Cursor) -> None:
        key_pos = cur.save()
        key = cur.try_word()
        if not key:
            raise cur.fail("metadata key")
        cur.expect("=")
        value = cur.try_quote()
        if value is None:
            value = cur.try_identifier()
            if not value:
                raise cur.fail("metadata value")

        if key not in DOCUMENT_KEYS:
            raise InvalidMetadataException(self.line_number, self.line, key_pos, key, value)
        norm_key = DOCUMENT_KEYS[key]
        if norm_key in self.document_metadata:
            # reference logs a warning and keeps the first value
            return
        self.document_metadata[norm_key] = value
        if norm_key == "version":
            self._raise_for_version(key_pos, value)

    def _raise_for_version(self, pos: int, version: str) -> None:
        if _valid_date_version(version):
            return
        if not SEMANTIC_VERSION_RE.match(version):
            raise VersionFormatWarning(self.line_number, self.line, pos, version)

    # -- definitions -------------------------------------------------------

    def _parse_namespace(self, cur: Cursor) -> None:
        pos = cur.save()
        keyword = cur.try_identifier()
        if not keyword:
            raise cur.fail("namespace keyword")
        word = cur.try_word()
        if word != "AS":
            raise cur.fail("AS")
        kind = cur.try_word()
        if self.disallow_redefinition and self.has_namespace(keyword):
            raise RedefinedNamespaceError(self.line_number, self.line, pos, keyword)

        if kind == "URL":
            url = cur.try_quote()
            if url is None:
                raise cur.fail("quoted URL")
            self.namespace_url_dict[keyword] = url
            content = self.registry.resolve_namespace(url)
            self.namespace_to_name_to_encoding[keyword] = content["names"]
            self.namespace_to_name_to_identifier[keyword] = content.get("id_name", {})
        elif kind == "PATTERN":
            pattern = cur.try_quote()
            if pattern is None:
                raise cur.fail("quoted pattern")
            self.namespace_to_pattern[keyword] = re.compile(pattern)
        else:
            raise cur.fail("URL or PATTERN")

    def _parse_annotation(self, cur: Cursor) -> None:
        pos = cur.save()
        keyword = cur.try_identifier()
        if not keyword:
            raise cur.fail("annotation keyword")
        word = cur.try_word()
        if word != "AS":
            raise cur.fail("AS")
        kind = cur.try_word()
        if self.disallow_redefinition and self.has_annotation(keyword):
            raise RedefinedAnnotationError(self.line_number, self.line, pos, keyword)

        if kind == "URL":
            url = cur.try_quote()
            if url is None:
                raise cur.fail("quoted URL")
            self.annotation_url_dict[keyword] = url
            content = self.registry.resolve_annotation(url)
            self.annotation_to_term[keyword] = set(content["values"])
        elif kind == "PATTERN":
            pattern = cur.try_quote()
            if pattern is None:
                raise cur.fail("quoted pattern")
            self.annotation_to_pattern[keyword] = re.compile(pattern)
        elif kind == "LIST":
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
            self.annotation_to_local[keyword] = set(values)
        else:
            raise cur.fail("URL, PATTERN, or LIST")
