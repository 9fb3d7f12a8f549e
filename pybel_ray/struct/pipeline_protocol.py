"""JSON-serializable transformation pipeline + query protocol.

Reference: ``struct/pipeline/pipeline.py:30-331`` (named-step pipeline with
a decorator registry) and ``struct/query/query.py:21-120`` (networks +
seeding + pipeline).  Steps are registered by name and applied to a
:class:`Graph`; a pipeline serializes to/from a JSON list so stored query
plans replay across sessions.
"""

from __future__ import annotations

import json
from typing import Callable, Dict, List, Optional

from .graph import Graph

__all__ = [
    "transformation",
    "get_transformation",
    "Pipeline",
    "Query",
    "registered_transformations",
]

_REGISTRY: Dict[str, Callable] = {}


def transformation(name: Optional[str] = None):
    """Register a Graph -> Graph transformation under a stable name."""

    def decorator(fn):
        _REGISTRY[name or fn.__name__] = fn
        return fn

    return decorator


def get_transformation(name: str) -> Callable:
    return _REGISTRY[name]


def registered_transformations() -> List[str]:
    return sorted(_REGISTRY)


class Pipeline:
    """An ordered list of (name, kwargs) steps (pipeline.py:30-331)."""

    def __init__(self, protocol: Optional[List[dict]] = None):
        self.protocol = list(protocol or [])

    def append(self, name: str, **kwargs) -> "Pipeline":
        if name not in _REGISTRY:
            raise KeyError("unregistered transformation: {}".format(name))
        self.protocol.append({"function": name, "kwargs": kwargs})
        return self

    def extend(self, other: "Pipeline") -> "Pipeline":
        self.protocol.extend(other.protocol)
        return self

    def run(self, graph: Graph) -> Graph:
        for step in self.protocol:
            fn = get_transformation(step["function"])
            graph = fn(graph, **step.get("kwargs", {}))
        return graph

    def to_json(self) -> str:
        return json.dumps(self.protocol)

    @classmethod
    def from_json(cls, s: str) -> "Pipeline":
        return cls(json.loads(s))


class Query:
    """Seeding + pipeline over a stored graph (query/query.py:21-120)."""

    def __init__(
        self,
        seeding: Optional[List[dict]] = None,
        pipeline: Optional[Pipeline] = None,
    ):
        self.seeding = list(seeding or [])
        self.pipeline = pipeline or Pipeline()

    def append_seeding_neighbors(self, node_md5s, hops: int = 1) -> "Query":
        self.seeding.append({
            "type": "neighbors", "node_md5s": list(node_md5s), "hops": hops,
        })
        return self

    def append_seeding_annotation(self, key: str, value: str) -> "Query":
        self.seeding.append({"type": "annotation", "key": key, "value": value})
        return self

    def append_seeding_sample(self, number_edges: int = 250, seed: int = 0) -> "Query":
        self.seeding.append({
            "type": "sample", "number_edges": number_edges, "seed": seed,
        })
        return self

    def run(self, graph: Graph) -> Graph:
        from .induction import (
            get_random_subgraph,
            get_subgraph_by_annotation_value,
            get_subgraph_by_neighborhood,
        )
        from .operations import union

        if self.seeding:
            parts = []
            for seed in self.seeding:
                if seed["type"] == "neighbors":
                    parts.append(get_subgraph_by_neighborhood(
                        graph, seed["node_md5s"], seed.get("hops", 1),
                    ))
                elif seed["type"] == "annotation":
                    parts.append(get_subgraph_by_annotation_value(
                        graph, seed["key"], seed["value"],
                    ))
                elif seed["type"] == "sample":
                    parts.append(get_random_subgraph(
                        graph, seed.get("number_edges", 250),
                        seed=seed.get("seed"),
                    ))
                else:
                    raise ValueError("unknown seed type: {}".format(seed["type"]))
            graph = parts[0] if len(parts) == 1 else union(parts)

        return self.pipeline.run(graph)

    def to_json(self) -> str:
        return json.dumps({
            "seeding": self.seeding,
            "pipeline": self.pipeline.protocol,
        })

    @classmethod
    def from_json(cls, s: str) -> "Query":
        d = json.loads(s)
        return cls(seeding=d.get("seeding"), pipeline=Pipeline(d.get("pipeline")))


# -- built-in registered transformations ------------------------------------

def _register_builtins():
    from .collapse import collapse_all_variants, collapse_equivalences, collapse_to_genes
    from .filters import EDGE_PREDICATES, filter_edges
    from .inference import enrich_protein_and_rna_origins

    @transformation("remove_associations")
    def remove_associations(graph: Graph) -> Graph:
        """Drop associative edges (deletion/deletion.py:30-40)."""
        from .filters import invert, relation_filter

        return Graph(
            graph.nodes,
            filter_edges(graph.edges, invert(relation_filter("association"))),
        )

    @transformation("remove_non_causal_edges")
    def remove_non_causal_edges(graph: Graph) -> Graph:
        return Graph(
            graph.nodes,
            filter_edges(graph.edges, EDGE_PREDICATES["is_causal_relation"]),
        )

    @transformation("remove_pathologies")
    def remove_pathologies(graph: Graph) -> Graph:
        """Drop pathology nodes + their edges (deletion/deletion.py:55-66)."""
        import pyarrow as pa
        import pyarrow.compute as pc

        from ..constants import PATHOLOGY
        from .graph import bel_function_of

        def _nodes(t: pa.Table) -> pa.Table:
            return t.filter(pc.invert(pc.equal(t.column("function"), PATHOLOGY)))

        def _edges(t: pa.Table) -> pa.Table:
            src_ok = pc.invert(pc.fill_null(
                pc.equal(bel_function_of(t.column("src_bel")), PATHOLOGY), False,
            ))
            dst_ok = pc.invert(pc.fill_null(
                pc.equal(bel_function_of(t.column("dst_bel")), PATHOLOGY), False,
            ))
            return t.filter(pc.and_(src_ok, dst_ok))

        return Graph(
            graph.nodes.map_batches(_nodes, batch_format="pyarrow"),
            graph.edges.map_batches(_edges, batch_format="pyarrow"),
        )

    @transformation("remove_isolated_nodes")
    def remove_isolated_nodes(graph: Graph) -> Graph:
        """Keep only nodes that appear in some edge (deletion/utils.py:20-40)."""
        import pyarrow as pa
        import pyarrow.compute as pc

        ids = set()
        for r in graph.edges.select_columns(["src_md5", "dst_md5"]).take_all():
            ids.add(r["src_md5"])
            ids.add(r["dst_md5"])
        id_array = pa.array(sorted(ids))

        def _nodes(t: pa.Table) -> pa.Table:
            return t.filter(pc.is_in(t.column("md5"), value_set=id_array))

        return Graph(
            graph.nodes.map_batches(_nodes, batch_format="pyarrow"),
            graph.edges,
        )

    @transformation("strip_annotations")
    def strip_annotations(graph: Graph) -> Graph:
        """Drop the annotations column content (mutation/metadata.py:21-33)."""
        import pyarrow as pa

        def _f(t: pa.Table) -> pa.Table:
            idx = t.schema.get_field_index("annotations_json")
            return t.set_column(
                idx, "annotations_json",
                pa.nulls(t.num_rows, pa.string()),
            )

        return Graph(graph.nodes, graph.edges.map_batches(_f, batch_format="pyarrow"))

    transformation("collapse_all_variants")(collapse_all_variants)
    transformation("collapse_equivalences")(collapse_equivalences)
    transformation("collapse_to_genes")(collapse_to_genes)
    transformation("enrich_protein_and_rna_origins")(enrich_protein_and_rna_origins)


_register_builtins()
