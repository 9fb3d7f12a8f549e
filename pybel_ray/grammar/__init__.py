"""Hand-written recursive-descent BEL grammar.

A from-scratch implementation of the BEL 1.0/2.0 statement grammar with the
same language surface as the reference pyparsing grammar
(``/root/reference/src/pybel/parser/parse_bel.py``), built for batched reuse
inside Ray Data actor pools: the parser object is constructed once per actor
with frozen namespace maps and then applied to millions of statements.
"""

from .statements import BELStatementParser, Emissions  # noqa: F401
from .terms import ConceptValidator, TermParser  # noqa: F401
