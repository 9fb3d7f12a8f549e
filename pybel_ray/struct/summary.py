"""Summary aggregations over a Graph (SURVEY.md §2.6).

Reference: ``struct/summary/{node_summary,edge_summary,errors,provenance}``.
All reduce to groupby-count / distinct / top-k on the node/edge tables —
pre-aggregated per block, tiny results.
"""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.compute as pc

from ..constants import PATHOLOGY
from ..ops.relational import distinct_values, groupby_count, topk
from .graph import Graph, bel_function_of

__all__ = [
    "count_functions",
    "count_namespaces",
    "get_unused_namespaces",
    "count_relations",
    "count_annotations",
    "get_annotation_values",
    "count_variants",
    "get_top_hubs",
    "get_top_pathologies",
    "count_error_types",
    "count_naked_names",
    "get_pubmed_identifiers",
    "number_of_citations",
    "get_metaedge_counts",
]


def count_functions(graph: Graph):
    """groupby(function).count() (node_summary.py:33-57)."""
    return groupby_count(graph.nodes, "function").sort("function")


def count_namespaces(graph: Graph):
    def _nn(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_valid(t.column("namespace")))

    return groupby_count(
        graph.nodes.map_batches(_nn, batch_format="pyarrow"), "namespace",
    ).sort("namespace")


def get_unused_namespaces(graph: Graph, defined_namespaces) -> set:
    """Defined-but-unused namespaces (node_summary.py:77-93)."""
    used = {
        r["namespace"]
        for r in count_namespaces(graph).take_all()
    }
    return set(defined_namespaces) - used


def count_relations(graph: Graph):
    return groupby_count(graph.edges, "relation").sort("relation")


def count_variants(graph: Graph):
    """Count variant kinds across nodes (node_summary.py:196-207)."""

    def _kinds(t: pa.Table) -> pa.Table:
        out = []
        for nj in t.column("node_json").to_pylist():
            node = json.loads(nj)
            for v in node.get("variants", ()):
                out.append({"kind": v["kind"]})
        return pa.Table.from_pylist(out) if out else pa.Table.from_pylist(
            [{"kind": ""}],
        ).slice(0, 0)

    kinds = graph.nodes.map_batches(_kinds, batch_format="pyarrow")
    return groupby_count(kinds, "kind").sort("kind")


def count_annotations(graph: Graph):
    """Exploded annotation-key counts (edge_summary.py:29-57)."""

    def _keys(t: pa.Table) -> pa.Table:
        out = []
        for aj in t.column("annotations_json").to_pylist():
            if not aj:
                continue
            for key in json.loads(aj):
                out.append({"annotation": key})
        return pa.Table.from_pylist(out) if out else pa.Table.from_pylist(
            [{"annotation": ""}],
        ).slice(0, 0)

    keys = graph.edges.map_batches(_keys, batch_format="pyarrow")
    return groupby_count(keys, "annotation").sort("annotation")


def get_annotation_values(graph: Graph, annotation: str):
    """Distinct values used for one annotation (edge_summary.py:95-116)."""

    def _vals(t: pa.Table) -> pa.Table:
        out = []
        for aj in t.column("annotations_json").to_pylist():
            if not aj:
                continue
            entry = json.loads(aj).get(annotation)
            if entry:
                out.extend({"value": v} for v in entry)
        return pa.Table.from_pylist(out) if out else pa.Table.from_pylist(
            [{"value": ""}],
        ).slice(0, 0)

    vals = graph.edges.map_batches(_vals, batch_format="pyarrow")
    return distinct_values(vals, "value").sort("value")


def _degrees(graph: Graph):
    def _endpoints(t: pa.Table) -> pa.Table:
        md5 = pa.concat_arrays([
            t.column("src_md5").combine_chunks(), t.column("dst_md5").combine_chunks(),
        ])
        bel = pa.concat_arrays([
            t.column("src_bel").combine_chunks(), t.column("dst_bel").combine_chunks(),
        ])
        return pa.Table.from_arrays([md5, bel], names=["md5", "bel"])

    ends = graph.edges.map_batches(_endpoints, batch_format="pyarrow")
    return groupby_count(ends, ["md5", "bel"], "degree")


def get_top_hubs(graph: Graph, n: int = 15):
    """Degree top-n (node_summary.py:209-220)."""
    return topk(_degrees(graph), "degree", n, tie_keys=["bel"]).select_columns(
        ["bel", "degree"],
    )


def get_top_pathologies(graph: Graph, n: int = 15):
    """Pathology degree top-n (node_summary.py:223-238)."""
    degrees = _degrees(graph)

    def _path_only(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.fill_null(pc.equal(bel_function_of(t.column("bel")), PATHOLOGY), False),
        )

    return topk(
        degrees.map_batches(_path_only, batch_format="pyarrow"),
        "degree", n, tie_keys=["bel"],
    ).select_columns(["bel", "degree"])


def count_error_types(errors_ds):
    """groupby(error_class).count() over the errors dataset (errors.py:24-47)."""
    return groupby_count(errors_ds, "error_class").sort("error_class")


def count_naked_names(errors_ds):
    """Count NakedNameWarning rows (errors.py:60-70)."""

    def _f(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t.column("error_class"), "NakedNameWarning"))

    return errors_ds.map_batches(_f, batch_format="pyarrow").count()


def get_pubmed_identifiers(graph: Graph):
    """Distinct PubMed ids (provenance.py:16-24)."""

    def _f(t: pa.Table) -> pa.Table:
        t = t.filter(pc.fill_null(pc.equal(t.column("citation_db"), "PubMed"), False))
        return t.select(["citation_id"])

    ds = graph.edges.map_batches(_f, batch_format="pyarrow")
    return distinct_values(ds, "citation_id")


def number_of_citations(graph: Graph) -> int:
    """Distinct (db, id) citation count (graph.py:307-316)."""

    def _f(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("citation_db")))
        key = pc.binary_join_element_wise(
            t.column("citation_db"), t.column("citation_id"), ":",
        )
        return pa.Table.from_arrays([key], names=["citation"])

    ds = graph.edges.map_batches(_f, batch_format="pyarrow")
    return distinct_values(ds, "citation").count()


def get_metaedge_counts(graph: Graph):
    """Group edges by (src function, relation, dst function)
    (edge_summary.py:155-170)."""

    def _meta(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                bel_function_of(t.column("src_bel")),
                t.column("relation").combine_chunks(),
                bel_function_of(t.column("dst_bel")),
            ],
            names=["src_function", "relation", "dst_function"],
        )

    meta = graph.edges.map_batches(_meta, batch_format="pyarrow")
    return groupby_count(meta, ["src_function", "relation", "dst_function"]).sort(
        ["src_function", "relation", "dst_function"],
    )


def count_names_by_namespace(graph: Graph, namespace: str):
    """Name usage counts within one namespace, recursing into members,
    reactants/products, variants' concepts, and fusion partners
    (reference node_summary.py:95-194)."""

    def _names(t: pa.Table) -> pa.Table:
        out = []

        def visit(node):
            concept = node.get("concept")
            if concept and concept.get("namespace") == namespace and concept.get("name"):
                out.append({"name": concept["name"]})
            for key in ("members", "reactants", "products"):
                for child in node.get(key, ()):
                    visit(child)
            for variant in node.get("variants", ()):
                c = variant.get("concept")
                if c and c.get("namespace") == namespace and c.get("name"):
                    out.append({"name": c["name"]})
            fusion = node.get("fusion")
            if fusion:
                visit(fusion["partner_5p"])
                visit(fusion["partner_3p"])

        for nj in t.column("node_json").to_pylist():
            visit(json.loads(nj))
        return pa.Table.from_pylist(
            out, schema=pa.schema([("name", pa.string())]),
        )

    names = graph.nodes.map_batches(_names, batch_format="pyarrow")
    return groupby_count(names, "name").sort("name")


def get_syntax_errors(errors_ds):
    """BELSyntaxError rows only (reference errors.py:24-35)."""

    def _f(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t.column("error_class"), "BELSyntaxError"))

    return errors_ds.map_batches(_f, batch_format="pyarrow")


def calculate_incorrect_name_dict(errors_ds):
    """Undefined/missing-name warnings grouped by class
    (reference errors.py:73-86)."""

    def _f(t: pa.Table) -> pa.Table:
        name_classes = pa.array([
            "MissingNamespaceNameWarning", "MissingNamespaceRegexWarning",
            "UndefinedNamespaceWarning", "NakedNameWarning",
        ])
        return t.filter(pc.is_in(t.column("error_class"), value_set=name_classes))

    bad = errors_ds.map_batches(_f, batch_format="pyarrow")
    return groupby_count(bad, "error_class").sort("error_class")


def calculate_error_by_annotation(errors_ds, annotation: str):
    """Error counts grouped by the annotation value in the error context
    (reference errors.py:89-98)."""

    def _vals(t: pa.Table) -> pa.Table:
        out = []
        for cj in t.column("context_json").to_pylist():
            if not cj:
                continue
            annotations = json.loads(cj).get("annotations") or {}
            value = annotations.get(annotation)
            if value is None:
                continue
            values = value if isinstance(value, list) else [value]
            out.extend({"value": v} for v in values)
        return pa.Table.from_pylist(
            out, schema=pa.schema([("value", pa.string())]),
        )

    vals = errors_ds.map_batches(_vals, batch_format="pyarrow")
    return groupby_count(vals, "value").sort("value")
