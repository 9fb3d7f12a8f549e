"""Generate golden fixtures by running the reference compiler offline.

Writes ``tests/golden/<name>.json`` with nodes/edges/triples/warnings for
each conformance corpus.  Run from the repo root:

    python tools/gen_golden.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from golden_harness import compile_reference, graph_summary  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_BEL = "/root/reference/src/pybel/testing/resources/bel"

CORPORA = [
    # (name, path, options)
    ("simple", os.path.join(REF_BEL, "test_bel.bel"), {}),
    ("thorough", os.path.join(REF_BEL, "thorough.bel"), {}),
    ("isolated", os.path.join(REF_BEL, "isolated.bel"), {}),
    ("slushy", os.path.join(REF_BEL, "slushy.bel"), {}),
    ("misordered", os.path.join(REF_BEL, "misordered.bel"), {"citation_clearing": False}),
    ("extras", os.path.join(REPO, "tests", "corpora", "extras.bel"), {}),
    ("lenient", os.path.join(REPO, "tests", "corpora", "lenient.bel"), {"allow_naked_names": True}),
]


def main():
    out_dir = os.path.join(REPO, "tests", "golden")
    os.makedirs(out_dir, exist_ok=True)
    for name, path, options in CORPORA:
        with open(path) as f:
            text = f.read()
        graph = compile_reference(text, **options)
        summary = graph_summary(graph)
        summary["options"] = options
        summary["source"] = path
        out_path = os.path.join(out_dir, name + ".json")
        with open(out_path, "w") as f:
            json.dump(summary, f, indent=1, sort_keys=True)
        print(
            name, len(summary["nodes"]), "nodes", len(summary["edges"]), "edges",
            len(summary["triples"]), "triples", len(summary["warnings"]), "warnings",
        )


if __name__ == "__main__":
    main()
