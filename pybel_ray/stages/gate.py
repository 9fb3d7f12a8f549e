"""Candidate-statement gating.

At web scale most pages contain no BEL at all; parsing them would emit one
syntax-error row per line.  The gate is a cheap vectorizable pre-filter that
keeps only pages that could plausibly contain BEL control records or
statements (cf. relation symbols at reference parse_bel.py:144-190).
"""

from __future__ import annotations

import re

__all__ = ["looks_like_bel", "GATE_RE"]

#: control records, definitions, or relation tokens
GATE_RE = re.compile(
    r"SET\s+DOCUMENT"
    r"|DEFINE\s+(NAMESPACE|ANNOTATION)"
    r"|SET\s+Citation"
    r"|\)\s*(->|=>|-\||=\||--|:>|>>)\s*"
    r"|\)\s*(increases|decreases|directlyIncreases|directlyDecreases|regulates"
    r"|association|isA|partOf|hasMembers|hasComponents|binds)\s+",
)


def looks_like_bel(text: str, probe_limit: int = 65536) -> bool:
    """Cheap check whether a page could contain BEL statements."""
    if not text:
        return False
    return GATE_RE.search(text[:probe_limit]) is not None
