"""pybel_ray — a Ray-Data-native BEL knowledge-graph construction engine.

From-scratch reimplementation of the query/data-processing capabilities of
``10mubeen/pybel`` (reference at ``/root/reference``) on Ray Data: streaming
Common-Crawl-style page tables through batched Arrow transforms, actor-pool
parsers, groupby dedup shuffles, and Parquet node/edge/triple sinks.
"""

__version__ = "0.1.0"

from .canon import (  # noqa: F401
    edge_md5,
    node_md5,
    node_to_bel,
    safe_label,
)
from .grammar import BELStatementParser, ConceptValidator, Emissions, TermParser  # noqa: F401
from .parsing import ControlParser, MetadataParser, compile_document  # noqa: F401
from .resources import ResourceRegistry  # noqa: F401
