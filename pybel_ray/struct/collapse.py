"""Collapse family: victim→survivor rewiring (SURVEY.md §2.8).

Reference: ``struct/mutation/collapse/collapse.py`` — rewire the victim's
in/out edges onto the survivor, drop the victim, drop survivor↔victim and
self edges.  The reference leaves edge keys stale (its own FIXME,
collapse.py:44,51); we recompute content hashes after rewiring and re-dedup,
which preserves the dedup invariant — a documented improvement.

Distributed shape: build a survivor map (victim_md5 → survivor row) from
the relevant relation edges — equivalence classes are computed by
union-find over that SMALL edge subset on the driver — then broadcast the
map into one vectorized edge/node rewrite pass; no shuffle beyond the final
re-dedup.
"""

from __future__ import annotations

import json
from typing import Dict, Mapping, Tuple

import pyarrow as pa
import pyarrow.compute as pc

from ..canon import edge_md5
from ..constants import (
    EQUIVALENT_TO,
    HAS_VARIANT,
    ORTHOLOGOUS,
    RELATION,
    TRANSCRIBED_TO,
    TRANSLATED_TO,
)
from ..stages.dedup import dedup_exact
from .filters import relation_filter
from .graph import Graph

__all__ = [
    "collapse_nodes",
    "collapse_nodes_ds",
    "collapse_all_variants",
    "collapse_equivalences",
    "collapse_to_genes",
    "build_equivalence_survivor_map",
    "build_equivalence_survivor_ds",
]

#: victim_md5 -> (survivor_md5, survivor_bel)
SurvivorMap = Mapping[str, Tuple[str, str]]


def _edge_pairs(graph: Graph, relations) -> list:
    """Collect (src, dst) rows for the given (small) relation subset."""
    from .filters import filter_edges

    ds = filter_edges(graph.edges, relation_filter(relations))
    return ds.select_columns(["src_md5", "src_bel", "dst_md5", "dst_bel"]).take_all()


#: relation-edge counts at or below this use the driver union-find
_DRIVER_EDGE_BUDGET = 2_000_000


def build_equivalence_survivor_map(graph: Graph, relations=(EQUIVALENT_TO,)) -> Dict[str, Tuple[str, str]]:
    """Survivor map from equivalence-class edges: min-md5 representative.

    Hybrid: small relation subsets run a driver union-find; large ones run
    distributed min-label propagation and only the final (victim →
    survivor) rows — bounded by equivalence-class membership, which the
    rewrite pass must broadcast anyway — visit the driver.
    """
    from .filters import filter_edges

    ds = filter_edges(graph.edges, relation_filter(set(relations))).select_columns(
        ["src_md5", "src_bel", "dst_md5", "dst_bel"],
    ).materialize()

    if ds.count() <= _DRIVER_EDGE_BUDGET:
        from .operations import connected_components_driver

        rows = ds.take_all()
        bel_of = {}
        pairs = []
        for r in rows:
            bel_of[r["src_md5"]] = r["src_bel"]
            bel_of[r["dst_md5"]] = r["dst_bel"]
            pairs.append((r["src_md5"], r["dst_md5"]))
        comp = connected_components_driver(pairs)
        return {
            victim: (rep, bel_of[rep])
            for victim, rep in comp.items()
            if victim != rep
        }

    from .components import connected_components
    from .degree import bucketed_attach

    comp = connected_components(ds)

    def _victims(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.not_equal(t.column("id"), t.column("component")),
        )

    victims = comp.map_batches(_victims, batch_format="pyarrow")
    # (md5, bel) lookup from the relation edges' own endpoint columns
    from ..stages.dedup import dedup_exact as _dedup

    def _bels(t: pa.Table) -> pa.Table:
        md5 = pa.concat_arrays([
            t.column("src_md5").combine_chunks(), t.column("dst_md5").combine_chunks(),
        ])
        bel = pa.concat_arrays([
            t.column("src_bel").combine_chunks(), t.column("dst_bel").combine_chunks(),
        ])
        return pa.Table.from_arrays([md5, bel], names=["md5", "bel"])

    bels = _dedup(ds.map_batches(_bels, batch_format="pyarrow"), "md5")
    labelled = bucketed_attach(victims, "component", bels, "md5", ["bel"])
    out: Dict[str, Tuple[str, str]] = {}
    for batch in labelled.iter_batches(batch_format="pyarrow"):
        for v, c, b in zip(
            batch.column("id").to_pylist(),
            batch.column("component").to_pylist(),
            batch.column("bel").to_pylist(),
        ):
            out[v] = (c, b)
    return out


def build_equivalence_survivor_ds(graph: Graph, relations=(EQUIVALENT_TO,)):
    """Survivor map as a Dataset (victim, survivor_md5, survivor_bel) —
    the fully distributed input to :func:`collapse_nodes_ds` (components
    via label propagation, survivor BEL attached with a bucketed join)."""
    from .components import connected_components
    from .degree import bucketed_attach
    from .filters import filter_edges
    from ..stages.dedup import dedup_exact as _dedup

    ds = filter_edges(graph.edges, relation_filter(set(relations))).select_columns(
        ["src_md5", "src_bel", "dst_md5", "dst_bel"],
    ).materialize()
    comp = connected_components(ds)

    def _victims(t: pa.Table) -> pa.Table:
        return t.filter(pc.not_equal(t.column("id"), t.column("component")))

    victims = comp.map_batches(_victims, batch_format="pyarrow")

    def _bels(t: pa.Table) -> pa.Table:
        md5 = pa.concat_arrays([
            t.column("src_md5").combine_chunks(), t.column("dst_md5").combine_chunks(),
        ])
        bel = pa.concat_arrays([
            t.column("src_bel").combine_chunks(), t.column("dst_bel").combine_chunks(),
        ])
        return pa.Table.from_arrays([md5, bel], names=["md5", "bel"])

    bels = _dedup(ds.map_batches(_bels, batch_format="pyarrow"), "md5")
    labelled = bucketed_attach(victims, "component", bels, "md5", ["bel"])
    return labelled.map_batches(
        lambda t: t.rename_columns(["victim", "survivor_md5", "survivor_bel"]),
        batch_format="pyarrow",
    )


def collapse_nodes(graph: Graph, survivor_map: SurvivorMap, drop_relations=()) -> Graph:
    """Rewire all edges through the survivor map; drop victims + self edges."""
    if not survivor_map:
        return graph
    victims = pa.array(sorted(survivor_map))
    md5_map = {k: v[0] for k, v in survivor_map.items()}
    bel_map = {k: v[1] for k, v in survivor_map.items()}
    drop_relations = set(drop_relations)

    def _rewrite_edges(t: pa.Table) -> pa.Table:
        if drop_relations:
            t = t.filter(
                pc.invert(pc.is_in(t.column("relation"), value_set=pa.array(sorted(drop_relations)))),
            )
        # fast path: batches touching no victim endpoint skip the Python
        # rewrite (victims ≪ edges) — but self-edge dropping must still
        # apply, or the operator's output would depend on which block a
        # pre-existing self-edge landed in (the slow path drops them all;
        # collapse_nodes_ds and the DuckDB oracle drop them globally)
        touched_mask = pc.or_(
            pc.is_in(t.column("src_md5"), value_set=victims),
            pc.is_in(t.column("dst_md5"), value_set=victims),
        )
        n_touched = pc.sum(pc.cast(touched_mask, pa.int64())).as_py() or 0
        if n_touched == 0:
            return t.filter(
                pc.invert(pc.equal(t.column("src_md5"), t.column("dst_md5"))),
            )

        src_md5 = t.column("src_md5").to_pylist()
        dst_md5 = t.column("dst_md5").to_pylist()
        src_bel = t.column("src_bel").to_pylist()
        dst_bel = t.column("dst_bel").to_pylist()
        new_src_md5 = [md5_map.get(x, x) for x in src_md5]
        new_dst_md5 = [md5_map.get(x, x) for x in dst_md5]
        new_src_bel = [bel_map.get(x, b) for x, b in zip(src_md5, src_bel)]
        new_dst_bel = [bel_map.get(x, b) for x, b in zip(dst_md5, dst_bel)]

        keep = [a != b for a, b in zip(new_src_md5, new_dst_md5)]

        # recompute content hashes — ONLY for rewired rows (fixes reference
        # FIXME); untouched rows keep their existing edge_md5
        touched = touched_mask.combine_chunks().to_numpy(zero_copy_only=False)
        old_md5 = t.column("edge_md5").to_pylist()
        relations = t.column("relation").to_pylist()
        evidences = t.column("evidence").to_pylist()
        cit_db = t.column("citation_db").to_pylist()
        cit_id = t.column("citation_id").to_pylist()
        subj = t.column("subject_json").to_pylist()
        obj = t.column("object_json").to_pylist()
        new_md5 = []
        for i in range(t.num_rows):
            if not touched[i]:
                new_md5.append(old_md5[i])
                continue
            data = {RELATION: relations[i]}
            if evidences[i] is not None:
                data["evidence"] = evidences[i]
            if cit_db[i] is not None:
                data["citation"] = {"db": cit_db[i], "db_id": cit_id[i]}
            if subj[i]:
                data["subject"] = json.loads(subj[i])
            if obj[i]:
                data["object"] = json.loads(obj[i])
            new_md5.append(edge_md5(new_src_bel[i], new_dst_bel[i], data))

        t = t.drop_columns(["edge_md5", "src_md5", "dst_md5", "src_bel", "dst_bel"])
        t = t.append_column("edge_md5", pa.array(new_md5))
        t = t.append_column("src_md5", pa.array(new_src_md5))
        t = t.append_column("dst_md5", pa.array(new_dst_md5))
        t = t.append_column("src_bel", pa.array(new_src_bel))
        t = t.append_column("dst_bel", pa.array(new_dst_bel))
        return t.filter(pa.array(keep))

    def _drop_victims(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(pc.is_in(t.column("md5"), value_set=victims)))

    from .graph import EDGE_COLUMNS

    def _reorder(t: pa.Table) -> pa.Table:
        return t.select(EDGE_COLUMNS)

    edges = graph.edges.map_batches(_rewrite_edges, batch_format="pyarrow")
    edges = edges.map_batches(_reorder, batch_format="pyarrow")
    nodes = graph.nodes.map_batches(_drop_victims, batch_format="pyarrow")
    return Graph(nodes, dedup_exact(edges, "edge_md5"))


def collapse_nodes_ds(graph: Graph, survivor_ds, drop_relations=()) -> Graph:
    """Fully distributed victim→survivor rewiring: the survivor map stays a
    Dataset — no driver dict, no broadcast.

    ``survivor_ds`` columns: (victim, survivor_md5, survivor_bel).  Two
    bucketed LEFT lookup joins attach survivors to each edge's endpoints;
    rewired rows get fresh content hashes; victims leave the node table via
    a bucketed anti-join.  Semantics identical to :func:`collapse_nodes`
    (the broadcast path remains the faster choice for small maps).
    """
    from .degree import bucketed_attach, bucketed_semi_join
    from .graph import EDGE_COLUMNS

    survivor_ds = survivor_ds.materialize()
    drop_relations = set(drop_relations)

    def _rename(frm, to):
        def _f(t: pa.Table) -> pa.Table:
            return t.rename_columns([to if c == frm else c for c in t.column_names])

        return _f

    edges = graph.edges
    if drop_relations:
        rels = pa.array(sorted(drop_relations))

        def _drop_rel(t: pa.Table) -> pa.Table:
            return t.filter(
                pc.invert(pc.is_in(t.column("relation"), value_set=rels)),
            )

        edges = edges.map_batches(_drop_rel, batch_format="pyarrow")

    lk = survivor_ds.map_batches(
        lambda t: t.rename_columns([
            {"victim": "victim", "survivor_md5": "s_md5", "survivor_bel": "s_bel"}[c]
            for c in t.column_names
        ]),
        batch_format="pyarrow",
    )
    edges = bucketed_attach(edges, "src_md5", lk, "victim", ["s_md5", "s_bel"], how="left")
    edges = edges.map_batches(_rename("s_md5", "_src_smd5"), batch_format="pyarrow")
    edges = edges.map_batches(_rename("s_bel", "_src_sbel"), batch_format="pyarrow")
    edges = bucketed_attach(edges, "dst_md5", lk, "victim", ["s_md5", "s_bel"], how="left")
    edges = edges.map_batches(_rename("s_md5", "_dst_smd5"), batch_format="pyarrow")
    edges = edges.map_batches(_rename("s_bel", "_dst_sbel"), batch_format="pyarrow")

    def _rewrite(t: pa.Table) -> pa.Table:
        src_s = t.column("_src_smd5")
        dst_s = t.column("_dst_smd5")
        touched_mask = pc.or_(pc.is_valid(src_s), pc.is_valid(dst_s))
        new_src_md5 = pc.coalesce(src_s, t.column("src_md5"))
        new_dst_md5 = pc.coalesce(dst_s, t.column("dst_md5"))
        new_src_bel = pc.coalesce(t.column("_src_sbel"), t.column("src_bel"))
        new_dst_bel = pc.coalesce(t.column("_dst_sbel"), t.column("dst_bel"))
        keep = pc.invert(pc.equal(new_src_md5, new_dst_md5))

        touched = touched_mask.combine_chunks().to_numpy(zero_copy_only=False)
        old_md5 = t.column("edge_md5").to_pylist()
        sb = new_src_bel.combine_chunks().to_pylist()
        db = new_dst_bel.combine_chunks().to_pylist()
        relations = t.column("relation").to_pylist()
        evidences = t.column("evidence").to_pylist()
        cit_db = t.column("citation_db").to_pylist()
        cit_id = t.column("citation_id").to_pylist()
        subj = t.column("subject_json").to_pylist()
        obj = t.column("object_json").to_pylist()
        new_md5 = []
        for i in range(t.num_rows):
            if not touched[i]:
                new_md5.append(old_md5[i])
                continue
            data = {RELATION: relations[i]}
            if evidences[i] is not None:
                data["evidence"] = evidences[i]
            if cit_db[i] is not None:
                data["citation"] = {"db": cit_db[i], "db_id": cit_id[i]}
            if subj[i]:
                data["subject"] = json.loads(subj[i])
            if obj[i]:
                data["object"] = json.loads(obj[i])
            new_md5.append(edge_md5(sb[i], db[i], data))

        for name, arr in (
            ("edge_md5", pa.array(new_md5, pa.string())),
            ("src_md5", new_src_md5),
            ("dst_md5", new_dst_md5),
            ("src_bel", new_src_bel),
            ("dst_bel", new_dst_bel),
        ):
            t = t.set_column(t.schema.get_field_index(name), name, arr)
        return t.filter(keep).select(EDGE_COLUMNS)

    edges = edges.map_batches(_rewrite, batch_format="pyarrow")
    nodes = bucketed_semi_join(graph.nodes, "md5", survivor_ds, "victim", anti=True)
    return Graph(nodes, dedup_exact(edges, "edge_md5"))


#: survivor-map sizes at or below this use the broadcast dict rewrite
_BROADCAST_MAP_BUDGET = 1_000_000


def collapse_equivalences(graph: Graph, relations=(EQUIVALENT_TO,)) -> Graph:
    """Collapse equivalence/orthology classes to their min-md5 representative.

    Hybrid: small relation subsets broadcast a driver survivor dict; large
    ones run end-to-end distributed (label-propagation components +
    Dataset survivor map + :func:`collapse_nodes_ds`)."""
    from .filters import filter_edges

    n = filter_edges(graph.edges, relation_filter(set(relations))).count()
    if n > _DRIVER_EDGE_BUDGET:
        survivor_ds = build_equivalence_survivor_ds(graph, relations)
        return collapse_nodes_ds(graph, survivor_ds, drop_relations=set(relations))
    survivor_map = build_equivalence_survivor_map(graph, relations)
    return collapse_nodes(graph, survivor_map, drop_relations=set(relations))


def collapse_orthologies(graph: Graph) -> Graph:
    return collapse_equivalences(graph, relations=(ORTHOLOGOUS,))


def _survivor_ds_from_edges(graph: Graph, relations):
    """(victim=dst, survivor=src) Dataset from a relation edge subset —
    the distributed survivor map of the variant/central-dogma collapses."""
    from .filters import filter_edges
    from ..stages.dedup import dedup_exact as _dedup

    ds = filter_edges(graph.edges, relation_filter(set(relations)))

    def _project(t: pa.Table) -> pa.Table:
        keep = pc.invert(pc.equal(t.column("dst_md5"), t.column("src_md5")))
        t = t.filter(keep)
        return pa.Table.from_arrays(
            [t.column("dst_md5"), t.column("src_md5"), t.column("src_bel")],
            names=["victim", "survivor_md5", "survivor_bel"],
        )

    return _dedup(ds.map_batches(_project, batch_format="pyarrow"), "victim")


def collapse_all_variants(graph: Graph) -> Graph:
    """Collapse variant nodes to their parents (collapse.py:88-100).

    Survivor = the hasVariant edge's source (the reference node).  Hybrid:
    small survivor maps broadcast (dict rewrite); large ones stay a
    Dataset and go through :func:`collapse_nodes_ds`.
    """
    survivor_ds = _survivor_ds_from_edges(graph, {HAS_VARIANT}).materialize()
    if survivor_ds.count() > _BROADCAST_MAP_BUDGET:
        return collapse_nodes_ds(graph, survivor_ds, drop_relations={HAS_VARIANT})
    survivor_map = {
        r["victim"]: (r["survivor_md5"], r["survivor_bel"])
        for r in survivor_ds.take_all()
    }
    return collapse_nodes(graph, survivor_map, drop_relations={HAS_VARIANT})


def collapse_to_genes(graph: Graph) -> Graph:
    """Collapse proteins/RNAs/miRNAs to genes (protein_rna_origins.py:48).

    Uses transcribedTo (gene→rna) and translatedTo (rna→protein) edges; runs
    origin enrichment first so every protein/rna has a parent chain.
    """
    from .inference import enrich_protein_and_rna_origins

    graph = enrich_protein_and_rna_origins(graph)
    graph = graph.materialize()

    gene_of_rna_ds = _survivor_ds_from_edges(graph, {TRANSCRIBED_TO}).materialize()

    if gene_of_rna_ds.count() > _BROADCAST_MAP_BUDGET:
        # distributed: protein -> gene via one bucketed lookup join of the
        # translatedTo edges (key = rna) against the rna -> gene map
        from .degree import bucketed_attach
        from .filters import filter_edges
        from ..stages.dedup import dedup_exact as _dedup

        translated = filter_edges(graph.edges, relation_filter({TRANSLATED_TO}))
        prot = bucketed_attach(
            translated.select_columns(["src_md5", "dst_md5"]),
            "src_md5", gene_of_rna_ds, "victim",
            ["survivor_md5", "survivor_bel"],
        )

        def _prot_rows(t: pa.Table) -> pa.Table:
            keep = pc.invert(pc.equal(t.column("dst_md5"), t.column("survivor_md5")))
            t = t.filter(keep)
            return pa.Table.from_arrays(
                [t.column("dst_md5"), t.column("survivor_md5"), t.column("survivor_bel")],
                names=["victim", "survivor_md5", "survivor_bel"],
            )

        survivor_ds = _dedup(gene_of_rna_ds.union(
            prot.map_batches(_prot_rows, batch_format="pyarrow"),
        ), "victim")
        return collapse_nodes_ds(
            graph, survivor_ds, drop_relations={TRANSCRIBED_TO, TRANSLATED_TO},
        )

    gene_of_rna = {
        r["victim"]: (r["survivor_md5"], r["survivor_bel"])
        for r in gene_of_rna_ds.take_all()
    }
    survivor_map = dict(gene_of_rna)
    for r in _edge_pairs(graph, {TRANSLATED_TO}):
        rna = r["src_md5"]
        if rna in gene_of_rna:
            survivor_map[r["dst_md5"]] = gene_of_rna[rna]
    survivor_map = {
        victim: surv for victim, surv in survivor_map.items() if victim != surv[0]
    }
    return collapse_nodes(
        graph, survivor_map, drop_relations={TRANSCRIBED_TO, TRANSLATED_TO},
    )
