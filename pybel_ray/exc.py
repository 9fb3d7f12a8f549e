"""Parse warnings/exceptions.

Every parse failure becomes a warning *row* in the errors side-channel
dataset instead of aborting the pipeline (reference behavior:
``/root/reference/src/pybel/io/line_utils.py:252-268``).  The class names
mirror the reference's taxonomy (``/root/reference/src/pybel/parser/exc.py``)
so error summaries compare 1:1.
"""

from __future__ import annotations


class BELParserWarning(Exception):
    """Base class for all BEL parse warnings."""

    def __init__(self, line_number: int, line: str, position: int, *args):
        super().__init__(line_number, line, position, *args)
        self.line_number = line_number
        self.line = line
        self.position = position
        self.args_extra = args

    def __str__(self):
        return '[{}] "{}" ({})'.format(self.line_number, self.line, self.position)


class BELSyntaxError(BELParserWarning):
    """The statement could not be parsed at all."""


class InconsistentDefinitionError(BELParserWarning):
    """A namespace/annotation was redefined."""


class RedefinedNamespaceError(InconsistentDefinitionError):
    pass


class RedefinedAnnotationError(InconsistentDefinitionError):
    pass


class NameWarning(BELParserWarning):
    pass


class NakedNameWarning(NameWarning):
    """A name was used without a namespace in strict mode."""


class MissingDefaultNameWarning(NameWarning):
    pass


class NamespaceIdentifierWarning(NameWarning):
    pass


class UndefinedNamespaceWarning(NamespaceIdentifierWarning):
    """The referenced namespace was never defined."""


class MissingNamespaceNameWarning(NamespaceIdentifierWarning):
    """The name is not a member of its (enumerated) namespace."""


class MissingNamespaceRegexWarning(NamespaceIdentifierWarning):
    """The name does not match its (regex) namespace pattern."""


class AnnotationWarning(BELParserWarning):
    pass


class UndefinedAnnotationWarning(AnnotationWarning):
    pass


class MissingAnnotationKeyWarning(AnnotationWarning):
    """UNSET of something that was not set."""


class AnnotationIdentifierWarning(AnnotationWarning):
    pass


class IllegalAnnotationValueWarning(AnnotationIdentifierWarning):
    pass


class MissingAnnotationRegexWarning(AnnotationIdentifierWarning):
    pass


class VersionFormatWarning(BELParserWarning):
    pass


class MetadataException(BELParserWarning):
    pass


class MalformedMetadataException(MetadataException):
    pass


class InvalidMetadataException(BELParserWarning):
    pass


class MissingMetadataException(BELParserWarning):
    @classmethod
    def make(cls, key: str) -> "MissingMetadataException":
        return cls(0, "", 0, key)


class InvalidCitationLengthException(BELParserWarning):
    pass


class CitationTooShortException(InvalidCitationLengthException):
    pass


class CitationTooLongException(InvalidCitationLengthException):
    pass


class MissingCitationException(BELParserWarning):
    """A qualified relation appeared before any citation was set."""


class MissingSupportWarning(BELParserWarning):
    """A qualified relation appeared before any evidence was set."""


class MissingAnnotationWarning(BELParserWarning):
    """A required annotation is missing."""


class InvalidCitationType(BELParserWarning):
    pass


class InvalidPubMedIdentifierWarning(BELParserWarning):
    pass


class MalformedTranslocationWarning(BELParserWarning):
    pass


class PlaceholderAminoAcidWarning(BELParserWarning):
    """The placeholder amino acid X was used."""


class NestedRelationWarning(BELParserWarning):
    """A nested statement appeared while disallow_nested is set."""


class InvalidEntity(BELParserWarning):
    pass


class InvalidFunctionSemantic(BELParserWarning):
    """The BEL function is not allowed by the name's namespace encoding."""
