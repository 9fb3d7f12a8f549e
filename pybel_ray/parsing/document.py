"""Whole-document compilation: section split + ordered fold.

One web page's ``text`` column holds one BEL document.  Documents are
mutually independent (the parallel unit); *within* a document the lines are
processed strictly in order because SET/UNSET control state is line-ordered
(SURVEY.md §2.10).  This module is pure Python — the Ray stage simply calls
:func:`compile_document` per row inside an actor-pool ``map_batches``.

Section-split and line sanitation semantics follow the public
``bel_resources.split_file_to_annotations_and_definitions`` behavior used by
the reference (``/root/reference/src/pybel/io/line_utils.py:31,78``):
blank/comment lines dropped, backslash line-continuations joined with a
space, document section = through the last ``SET DOCUMENT`` line,
definitions = through the last ``DEFINE NAMESPACE|ANNOTATION`` line.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

from ..canon import canonical_json
from ..constants import INVERSE_DOCUMENT_KEYS, REQUIRED_METADATA
from ..exc import (
    BELParserWarning,
    InconsistentDefinitionError,
    MalformedMetadataException,
    MissingMetadataException,
    VersionFormatWarning,
)
from ..grammar.statements import BELStatementParser, Emissions
from ..grammar.terms import ConceptValidator
from ..resources import ResourceError, ResourceRegistry
from .control import ControlParser
from .metadata import MetadataParser

__all__ = ["sanitize_lines", "split_sections", "compile_document", "DocumentResult"]

METADATA_LINE_RE = re.compile(r"(SET\s+DOCUMENT|DEFINE\s+NAMESPACE|DEFINE\s+ANNOTATION)")


def sanitize_lines(lines) -> List[Tuple[int, str]]:
    """Strip blanks/comments, join backslash continuations; keep line numbers."""
    cleaned = []
    for line_number, line in enumerate(lines, start=1):
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        cleaned.append((line_number, line))

    out: List[Tuple[int, str]] = []
    i = 0
    while i < len(cleaned):
        line_number, line = cleaned[i]
        while line.endswith("\\") and i + 1 < len(cleaned):
            i += 1
            line = line.rstrip("\\").strip() + " " + cleaned[i][1]
        out.append((line_number, line))
        i += 1
    return out


def split_sections(content: List[Tuple[int, str]]):
    """Split sanitized lines into (document, definitions, statements)."""
    end_document = 0
    end_definitions = 0
    for idx, (_, line) in enumerate(content):
        if line.startswith("SET DOCUMENT"):
            end_document = idx + 1
        if METADATA_LINE_RE.match(line):
            end_definitions = idx + 1
    end_definitions = max(end_definitions, end_document)
    return (
        content[:end_document],
        content[end_document:end_definitions],
        content[end_definitions:],
    )


@dataclass
class DocumentResult:
    """Everything emitted by compiling one document."""

    nodes: List[Tuple[str, dict]] = field(default_factory=list)
    edges: List[dict] = field(default_factory=list)
    errors: List[dict] = field(default_factory=list)
    metadata: dict = field(default_factory=dict)
    aborted: bool = False
    n_statements: int = 0

    def add_error(self, exc: BELParserWarning, context: Optional[dict] = None) -> None:
        self.errors.append({
            "line_number": int(getattr(exc, "line_number", 0) or 0),
            "error_class": type(exc).__name__,
            "line": getattr(exc, "line", ""),
            "context": canonical_json(context) if context else None,
        })

    def prepend_error(self, exc: BELParserWarning) -> None:
        self.errors.insert(0, {
            "line_number": int(getattr(exc, "line_number", 0) or 0),
            "error_class": type(exc).__name__,
            "line": getattr(exc, "line", ""),
            "context": None,
        })


def compile_document(
    text: str,
    registry: ResourceRegistry,
    citation_clearing: bool = True,
    allow_naked_names: bool = False,
    disallow_nested: bool = False,
    disallow_unqualified_translocations: bool = False,
    required_annotations: Optional[List[str]] = None,
    allow_redefinition: bool = False,
    term_cache: Optional[dict] = None,
) -> DocumentResult:
    """Compile one BEL document (the ``text`` of one page) into emitted rows.

    Mirrors ``parse_lines`` (reference io/line_utils.py:36-130) with one
    deviation: a fatal metadata/definition failure aborts *this document*
    (``aborted=True`` + error row) instead of raising out of the whole job.
    """
    result = DocumentResult()
    content = sanitize_lines(text.splitlines())
    doc_lines, def_lines, stmt_lines = split_sections(content)

    meta = MetadataParser(registry, allow_redefinition=allow_redefinition)

    # -- document section (reference line_utils.py:133-165) ----------------
    for line_number, line in doc_lines:
        try:
            meta.parse_line(line, line_number)
        except VersionFormatWarning as exc:
            result.add_error(exc)
        except BELParserWarning as exc:
            result.add_error(MalformedMetadataException(line_number, line, 0))
            result.aborted = True
            return result
        except Exception:
            result.add_error(MalformedMetadataException(line_number, line, 0))
            result.aborted = True
            return result

    for required in sorted(REQUIRED_METADATA):
        if meta.document_metadata.get(required) is None:
            result.prepend_error(
                MissingMetadataException.make(INVERSE_DOCUMENT_KEYS[required]),
            )
    result.metadata = dict(meta.document_metadata)

    # -- definitions section (reference line_utils.py:168-226) -------------
    for line_number, line in def_lines:
        try:
            meta.parse_line(line, line_number)
        except (InconsistentDefinitionError, ResourceError) as exc:
            if isinstance(exc, BELParserWarning):
                result.add_error(exc)
            else:
                result.add_error(MalformedMetadataException(line_number, line, 0))
            result.aborted = True
            return result
        except Exception:
            result.add_error(MalformedMetadataException(line_number, line, 0))
            result.aborted = True
            return result

    # -- statements section (reference line_utils.py:229-274) --------------
    validator = ConceptValidator(
        namespace_to_name_to_encoding=meta.namespace_to_name_to_encoding,
        namespace_to_pattern=meta.namespace_to_pattern,
        allow_naked_names=allow_naked_names,
    )
    control = ControlParser(
        annotation_to_term=meta.annotation_to_term,
        annotation_to_pattern=meta.annotation_to_pattern,
        annotation_to_local=meta.annotation_to_local,
        citation_clearing=citation_clearing,
    )
    parser = BELStatementParser(
        validator=validator,
        control=control,
        disallow_nested=disallow_nested,
        disallow_unqualified_translocations=disallow_unqualified_translocations,
        required_annotations=required_annotations,
    )
    if term_cache is not None:
        # scope identity: each keyword's name table is keyed by the URL it
        # resolved from (stable content identity — unlike id(), safe when a
        # shared cache outlives a registry); regex namespaces by pattern
        # text.  Inline-defined LIST namespaces have no URL; fall back to
        # id() for those (they are document-local and the registry keeps
        # resolved dicts alive for its own lifetime).
        parser.terms.term_cache = term_cache
        parser.terms.scope_key = (
            allow_naked_names,
            tuple(sorted(
                (k, meta.namespace_url_dict.get(k) or id(v))
                for k, v in meta.namespace_to_name_to_encoding.items()
            )),
            tuple(sorted(
                (k, p.pattern) for k, p in meta.namespace_to_pattern.items()
            )),
        )

    em = Emissions()
    for line_number, line in stmt_lines:
        result.n_statements += 1
        try:
            if control.is_control_line(line):
                control.parse_line(line, line_number)
            else:
                parser.parse_statement(line, line_number, em)
        except BELParserWarning as exc:
            result.add_error(exc, context=control.get_annotations_context())

    result.nodes = em.nodes
    result.edges = em.edges
    return result
