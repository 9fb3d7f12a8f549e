"""Generate the Hetionet-import golden fixture by running the READ-ONLY
reference ``from_hetionet_json`` offline on the synthetic fixture slice.

    python tools/gen_golden_hetionet.py
"""

from __future__ import annotations

import json
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "refstubs"))
sys.path.insert(0, "/root/reference/src")
sys.path.insert(0, _HERE)

REPO = os.path.dirname(_HERE)


def main():
    from golden_harness import graph_summary
    from pybel.io.hetionet.hetionet import from_hetionet_json

    fixture = os.path.join(REPO, "tests", "corpora", "hetionet_fixture.json")
    with open(fixture) as f:
        het = json.load(f)
    graph = from_hetionet_json(het, use_tqdm=False)
    summary = graph_summary(graph)
    summary["source"] = fixture
    out = os.path.join(REPO, "tests", "golden", "hetionet.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    print("hetionet:", len(summary["nodes"]), "nodes",
          len(summary["edges"]), "edges")


if __name__ == "__main__":
    main()
