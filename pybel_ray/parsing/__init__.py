"""Document-level parsing: control records, metadata, section split, fold."""

from .control import ControlParser  # noqa: F401
from .metadata import MetadataParser  # noqa: F401

# document imports grammar.statements which imports parsing.control; import
# it last so the submodules above are initialized first
from .document import DocumentResult, compile_document  # noqa: E402,F401
