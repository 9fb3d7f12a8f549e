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
    "uni_transformation",
    "get_transformation",
    "Pipeline",
    "Query",
    "registered_transformations",
]

_REGISTRY: Dict[str, Callable] = {}
#: universe transformations take (universe Graph, graph Graph) -> Graph
#: (reference ``struct/pipeline/decorators.py:27-105`` uni_transformation)
_UNIVERSE_REGISTRY: Dict[str, Callable] = {}


def _keep_metadata(fn, graph_arg_index: int):
    """Wrap a transformation so the input graph's metadata survives:
    transformations rebuild Graph(nodes, edges) freely, and without this
    every pipeline step would silently strip provenance (name/authors/...)
    from the result."""
    import functools

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        out = fn(*args, **kwargs)
        source = args[graph_arg_index]
        if isinstance(out, Graph) and not out.metadata and source.metadata:
            out.metadata = dict(source.metadata)
        return out

    return wrapper


def transformation(name: Optional[str] = None):
    """Register a Graph -> Graph transformation under a stable name."""

    def decorator(fn):
        _REGISTRY[name or fn.__name__] = _keep_metadata(fn, 0)
        return fn

    return decorator


def uni_transformation(name: Optional[str] = None):
    """Register a (universe, graph) -> Graph transformation
    (reference decorators.py:46-58): steps that expand a working graph
    with content drawn from the stored universe graph."""

    def decorator(fn):
        _UNIVERSE_REGISTRY[name or fn.__name__] = _keep_metadata(fn, 1)
        return fn

    return decorator


def get_transformation(name: str) -> Callable:
    return _REGISTRY[name]


def registered_transformations() -> List[str]:
    return sorted(_REGISTRY) + sorted(_UNIVERSE_REGISTRY)


class Pipeline:
    """An ordered list of (name, kwargs) steps (pipeline.py:30-331).

    Besides plain named steps, the protocol supports the reference's
    meta-steps (pipeline.py:238-331): ``{"meta": "union"|"intersection",
    "pipelines": [protocol, ...]}`` runs each sub-pipeline on the incoming
    graph and combines the results, and universe steps
    (``@uni_transformation``) receive the stored universe graph as their
    first argument (set via ``run(graph, universe=...)``).
    """

    def __init__(self, protocol: Optional[List[dict]] = None):
        self.protocol = list(protocol or [])

    def append(self, name: str, **kwargs) -> "Pipeline":
        if name not in _REGISTRY and name not in _UNIVERSE_REGISTRY:
            raise KeyError("unregistered transformation: {}".format(name))
        self.protocol.append({"function": name, "kwargs": kwargs})
        return self

    def extend(self, other: "Pipeline") -> "Pipeline":
        self.protocol.extend(other.protocol)
        return self

    def append_union(self, *pipelines: "Pipeline") -> "Pipeline":
        """Meta-step: union of sub-pipeline results (pipeline.py:238-269)."""
        self.protocol.append({
            "meta": "union", "pipelines": [p.protocol for p in pipelines],
        })
        return self

    def append_intersection(self, *pipelines: "Pipeline") -> "Pipeline":
        """Meta-step: node intersection of sub-pipeline results
        (pipeline.py:271-301)."""
        self.protocol.append({
            "meta": "intersection", "pipelines": [p.protocol for p in pipelines],
        })
        return self

    def run(self, graph: Graph, universe: Optional[Graph] = None) -> Graph:
        from .operations import node_intersection, union

        for step in self.protocol:
            meta = step.get("meta")
            if meta is not None:
                parts = [
                    Pipeline(proto).run(graph, universe=universe)
                    for proto in step["pipelines"]
                ]
                if meta == "union":
                    graph = union(parts)
                elif meta == "intersection":
                    result = parts[0]
                    for other in parts[1:]:
                        result = node_intersection(result, other)
                    graph = result
                else:
                    raise ValueError("unknown meta step: {}".format(meta))
                continue
            name = step["function"]
            kwargs = step.get("kwargs", {})
            if name in _UNIVERSE_REGISTRY:
                if universe is None:
                    raise ValueError(
                        "step {!r} needs a universe graph; pass run(graph, "
                        "universe=...)".format(name),
                    )
                graph = _UNIVERSE_REGISTRY[name](universe, graph, **kwargs)
            else:
                graph = get_transformation(name)(graph, **kwargs)
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

    def append_seeding_upstream(self, node_md5s, hops: int = 1) -> "Query":
        """Upstream causal seeding (reference seeding.py SEED_TYPE_UPSTREAM)."""
        self.seeding.append({
            "type": "upstream", "node_md5s": list(node_md5s), "hops": hops,
        })
        return self

    def append_seeding_downstream(self, node_md5s, hops: int = 1) -> "Query":
        self.seeding.append({
            "type": "downstream", "node_md5s": list(node_md5s), "hops": hops,
        })
        return self

    def run(self, graph: Graph) -> Graph:
        from .induction import (
            expand_downstream,
            expand_upstream,
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
                elif seed["type"] == "upstream":
                    parts.append(expand_upstream(
                        graph, seed["node_md5s"], seed.get("hops", 1),
                    ))
                elif seed["type"] == "downstream":
                    parts.append(expand_downstream(
                        graph, seed["node_md5s"], seed.get("hops", 1),
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

def _remove_nodes_by_function(graph: Graph, function: str) -> Graph:
    """Drop all nodes of one BEL function + every touching edge — the
    shared body of remove_pathologies / remove_biological_processes
    (deletion/deletion.py:55-77)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .graph import bel_function_of

    def _nodes(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(pc.equal(t.column("function"), function)))

    def _edges(t: pa.Table) -> pa.Table:
        src_ok = pc.invert(pc.fill_null(
            pc.equal(bel_function_of(t.column("src_bel")), function), False,
        ))
        dst_ok = pc.invert(pc.fill_null(
            pc.equal(bel_function_of(t.column("dst_bel")), function), False,
        ))
        return t.filter(pc.and_(src_ok, dst_ok))

    return Graph(
        graph.nodes.map_batches(_nodes, batch_format="pyarrow"),
        graph.edges.map_batches(_edges, batch_format="pyarrow"),
    )


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
        from ..constants import PATHOLOGY

        return _remove_nodes_by_function(graph, PATHOLOGY)

    @transformation("remove_isolated_nodes")
    def remove_isolated_nodes(graph: Graph) -> Graph:
        """Keep only nodes that appear in some edge (deletion/utils.py:20-40).

        Fully distributed: distinct endpoint ids (combiner + bucketed
        dedup) feed a bucketed semi-join of the node table — the edge
        table never visits the driver.
        """
        from .degree import bucketed_semi_join, endpoint_ids

        return Graph(
            bucketed_semi_join(graph.nodes, "md5", endpoint_ids(graph.edges)),
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


def _register_more_builtins():
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..constants import BIOPROCESS
    from .filters import filter_edges, filter_nodes
    from .graph import bel_function_of

    @transformation("remove_biological_processes")
    def remove_biological_processes(graph: Graph) -> Graph:
        """Drop bp nodes + their edges (deletion/deletion.py:69-77)."""
        return _remove_nodes_by_function(graph, BIOPROCESS)

    @transformation("remove_isolated_list_abundances")
    def remove_isolated_list_abundances(graph: Graph) -> Graph:
        """Drop list abundances whose only edges are their partOf member
        edges (deletion/deletion.py:80-87).

        Distributed shape: "has a non-partOf edge" = distinct endpoints of
        the non-partOf edge subset; victims = list-abundance nodes
        anti-joined against that set (bucketed, no driver edge scan).
        Only the victim md5 set — bounded by the list-abundance node count
        — is collected for the broadcast anti-join on nodes + edges.
        """
        from .degree import bucketed_semi_join, collect_small_key_set, endpoint_ids
        from .filters import invert, relation_filter

        list_md5s = filter_nodes(
            graph.nodes, "is_list_abundance",
        ).select_columns(["md5"])
        non_partof = filter_edges(graph.edges, invert(relation_filter("partOf")))
        victims_ds = bucketed_semi_join(
            list_md5s, "md5", endpoint_ids(non_partof), anti=True,
        )
        victims = collect_small_key_set(victims_ds, "md5")
        v_array = pa.array(sorted(victims), pa.string())

        def _nodes(t: pa.Table) -> pa.Table:
            return t.filter(pc.invert(pc.is_in(t.column("md5"), value_set=v_array)))

        def _edges(t: pa.Table) -> pa.Table:
            keep = pc.and_(
                pc.invert(pc.is_in(t.column("src_md5"), value_set=v_array)),
                pc.invert(pc.is_in(t.column("dst_md5"), value_set=v_array)),
            )
            return t.filter(keep)

        return Graph(
            graph.nodes.map_batches(_nodes, batch_format="pyarrow"),
            graph.edges.map_batches(_edges, batch_format="pyarrow"),
        )

    @transformation("prune_protein_rna_origins")
    def prune_protein_rna_origins(graph: Graph) -> Graph:
        """Remove degree-1 gene/rna leaves attached only by central-dogma
        edges (deletion/protein_rna_origins.py:15-60).

        Distributed: ``node_degree_stats`` explodes endpoints with per-batch
        partial counts and one small groupby shuffle; candidate leaves
        (degree 1, a central-dogma edge out) are semi-joined against the
        gene/rna node subset.  Only the victim md5 set — degree-1 leaves,
        small by construction — is collected for the broadcast anti-join.
        """
        from .degree import bucketed_semi_join, collect_small_key_set, node_degree_stats
        from .filters import function_inclusion_filter

        stats = node_degree_stats(
            graph.edges, central_relations=("transcribedTo", "translatedTo"),
        )

        def _leaves(t: pa.Table) -> pa.Table:
            keep = pc.and_(
                pc.equal(t.column("degree"), 1),
                pc.greater_equal(t.column("central_out"), 1),
            )
            return t.filter(keep).select(["md5"])

        leaves = stats.map_batches(_leaves, batch_format="pyarrow")
        gene_rna = filter_nodes(
            graph.nodes,
            [function_inclusion_filter(("Gene", "RNA", "miRNA"))],
        ).select_columns(["md5"])
        victims_ds = bucketed_semi_join(leaves, "md5", gene_rna)
        victims = collect_small_key_set(victims_ds, "md5")
        v_array = pa.array(sorted(victims), pa.string())

        def _nodes(t: pa.Table) -> pa.Table:
            return t.filter(pc.invert(pc.is_in(t.column("md5"), value_set=v_array)))

        def _edges(t: pa.Table) -> pa.Table:
            keep = pc.and_(
                pc.invert(pc.is_in(t.column("src_md5"), value_set=v_array)),
                pc.invert(pc.is_in(t.column("dst_md5"), value_set=v_array)),
            )
            return t.filter(keep)

        return Graph(
            graph.nodes.map_batches(_nodes, batch_format="pyarrow"),
            graph.edges.map_batches(_edges, batch_format="pyarrow"),
        )

    @transformation("remove_citation_metadata")
    def remove_citation_metadata(graph: Graph) -> Graph:
        """Null out citation columns (mutation/metadata.py:83-98)."""

        def _f(t: pa.Table) -> pa.Table:
            for col in ("citation_db", "citation_id"):
                idx = t.schema.get_field_index(col)
                t = t.set_column(idx, col, pa.nulls(t.num_rows, pa.string()))
            return t

        return Graph(graph.nodes, graph.edges.map_batches(_f, batch_format="pyarrow"))


_register_more_builtins()


def _register_universe_builtins():
    """Universe expansion steps (reference expansion/neighborhood.py:24-111,
    expansion/upstream.py): pull content from the stored universe graph
    into the working subgraph."""
    from .induction import (
        expand_downstream,
        expand_upstream,
        get_subgraph_by_neighborhood,
    )
    from .operations import union

    @uni_transformation("expand_node_neighborhood")
    def expand_node_neighborhood(universe: Graph, graph: Graph, node_md5s, hops: int = 1) -> Graph:
        return union([
            graph, get_subgraph_by_neighborhood(universe, list(node_md5s), hops),
        ])

    @uni_transformation("expand_upstream_causal")
    def expand_upstream_causal(universe: Graph, graph: Graph, hops: int = 1) -> Graph:
        return union([graph, expand_upstream(universe, graph.node_md5_set(), hops)])

    @uni_transformation("expand_downstream_causal")
    def expand_downstream_causal(universe: Graph, graph: Graph, hops: int = 1) -> Graph:
        return union([graph, expand_downstream(universe, graph.node_md5_set(), hops)])


_register_universe_builtins()


def add_annotation_value(graph: Graph, key: str, value: str) -> Graph:
    """Add key=value to every edge's annotations (mutation/metadata.py:36-60)."""
    import json as _json

    import pyarrow as pa

    def _f(t: pa.Table) -> pa.Table:
        out = []
        for aj in t.column("annotations_json").to_pylist():
            annotations = _json.loads(aj) if aj else {}
            annotations.setdefault(key, {})[value] = True
            from ..canon import canonical_json

            out.append(canonical_json(annotations))
        idx = t.schema.get_field_index("annotations_json")
        return t.set_column(idx, "annotations_json", pa.array(out, pa.string()))

    return Graph(graph.nodes, graph.edges.map_batches(_f, batch_format="pyarrow"))


def remove_annotation_value(graph: Graph, key: str, value: str) -> Graph:
    """Remove key=value from edges carrying it (mutation/metadata.py:63-80)."""
    import json as _json

    import pyarrow as pa

    def _f(t: pa.Table) -> pa.Table:
        out = []
        for aj in t.column("annotations_json").to_pylist():
            if not aj:
                out.append(aj)
                continue
            annotations = _json.loads(aj)
            entry = annotations.get(key)
            if entry and value in entry:
                del entry[value]
                if not entry:
                    del annotations[key]
            from ..canon import canonical_json

            out.append(canonical_json(annotations) if annotations else None)
        idx = t.schema.get_field_index("annotations_json")
        return t.set_column(idx, "annotations_json", pa.array(out, pa.string()))

    return Graph(graph.nodes, graph.edges.map_batches(_f, batch_format="pyarrow"))
