"""End-to-end KG construction pipeline (Ray-Data-first).

``read_parquet(pages)`` → stateless extract (`map_batches`, zero-copy Arrow)
→ candidate gate → actor-pool parse (grammar + namespace maps built once per
actor) → events stream with a ``kind`` discriminator → salted exact-dedup
groupby shuffles for nodes/edges → triple dedup + global sort → Parquet
sinks.  See SURVEY.md §3.4.

Three stage-boundary modes:

* :func:`compile_pages` (default) — in-memory: events materialized once
  (small runs, tests).
* :func:`compile_pages` with ``events_dir`` — the scale path: parse actors
  write one Parquet shard per input block themselves (deterministic names,
  idempotent on retry) and return a per-shard count manifest; downstream
  views re-read only their columns (Parquet pruning).  Measured faster than
  both a downstream ``write_parquet`` operator (which starves next to a
  near-full actor pool and backpressures the parse) and a wide
  ``materialize()`` (object-store scans can't prune columns).
* :class:`CheckpointedCompile` — per-shard checkpointing with a resume
  manifest: a re-run anti-joins the manifest and skips finished shards.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import List, Optional, Sequence

import pyarrow as pa
import pyarrow.compute as pc

from .resources import ResourceRegistry
from .stages.dedup import dedup_exact, dedup_exact_sorted
from .stages.extract import ExtractText
from .stages.parse_stage import EVENTS_SCHEMA, ParseDocuments, ParseDocumentsToDir

__all__ = ["KGTables", "compile_pages", "events_pipeline", "CheckpointedCompile"]


def _default_concurrency():
    """Fixed-size actor pool sized to the cluster.

    An autoscaling ``(1, cpus)`` pool ramps up one actor at a time and
    measurably starves a 32-CPU run for its first minute (observed: load
    peaked at ~17 of 32 during the scaling bench).  A fixed pool launches
    every actor up front; construction (grammar + registry fetch) is
    parallel and amortized across the whole run.

    The pool must NOT take every CPU: actors hold their CPU while alive, so
    a pool of exactly ``cpus`` starves the upstream read and downstream
    write tasks and the pipeline deadlocks (observed at 8 CPUs: 8 idle
    actors, ReadParquet backpressured forever).  Leave 2 CPUs of headroom.
    """
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return max(2, cpus - max(1, cpus // 16))


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
    events_dir: Optional[str] = None,
    triples_dir: Optional[str] = None,
    filesystem=None,
):
    """pages Dataset -> lazy events Dataset (extract → gate+parse).

    With ``events_dir`` the parse actors write one Parquet shard per input
    block themselves (see :class:`ParseDocumentsToDir`) and the returned
    Dataset is the tiny per-shard manifest instead of the events; with
    ``triples_dir`` they additionally write the narrow per-shard-deduped
    raw triples.  ``events_dir``/``triples_dir`` may be local paths,
    ``pyarrow.fs`` URIs, or paths under an explicit ``filesystem``.
    """
    import ray

    from . import fsio

    registry_ref = ray.put(registry or ResourceRegistry())
    extracted = pages.map_batches(ExtractText(), batch_format="pyarrow")
    kwargs = dict(
        registry_ref=registry_ref,
        citation_clearing=citation_clearing,
        allow_naked_names=allow_naked_names,
        disallow_nested=disallow_nested,
        gate=gate,
    )
    if events_dir is not None:
        fsio.ensure_dir(*fsio.parse_target(events_dir, filesystem))
        if triples_dir is not None:
            fsio.ensure_dir(*fsio.parse_target(triples_dir, filesystem))
        return extracted.map_batches(
            ParseDocumentsToDir,
            fn_constructor_kwargs=dict(
                out_dir=events_dir, triples_dir=triples_dir,
                filesystem=filesystem, **kwargs,
            ),
            batch_format="pyarrow",
            batch_size=None,  # one shard per input block
            concurrency=concurrency or _default_concurrency(),
        )
    return extracted.map_batches(
        ParseDocuments,
        fn_constructor_kwargs=kwargs,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or _default_concurrency(),
    )


@dataclass
class KGTables:
    """The compiled knowledge graph as a family of Datasets.

    Backed either by an in-memory events Dataset (small/medium runs) or by
    an events Parquet directory (``events_path``).  The Parquet form is the
    scale path: every view re-reads ONLY its columns from disk (Parquet
    column pruning), which measured ~4× faster than filtering a wide
    materialized Arrow dataset out of the object store, and doubles as the
    resume checkpoint.
    """

    events: "object" = None  # ray.data.Dataset of all event rows
    events_path: Optional[str] = None
    manifest: "object" = None  # Dataset of per-shard counts (events_dir mode)
    triples_path: Optional[str] = None  # narrow raw-triples shards side output
    filesystem: "object" = None  # pyarrow.fs.FileSystem for the paths (None=local)

    # -- views -------------------------------------------------------------

    def _events(self, columns: Optional[List[str]] = None):
        import ray.data

        if self.events_path is not None:
            if columns is None:
                schema = EVENTS_SCHEMA
            else:
                schema = pa.schema([
                    (c, EVENTS_SCHEMA.field(c).type) for c in columns
                ])
            return ray.data.read_parquet(
                self.events_path, columns=columns, schema=schema,
                filesystem=self.filesystem,
            )
        ds = self.events
        if columns is not None:
            ds = ds.select_columns(columns)
        return ds

    def _kind(self, kind: str, columns: Optional[List[str]] = None):
        if columns is not None and "kind" not in columns:
            columns = ["kind"] + columns

        def _f(t: pa.Table, _k=kind) -> pa.Table:
            return t.filter(pc.equal(t.column("kind"), _k))

        return self._events(columns).map_batches(_f, batch_format="pyarrow")

    def nodes_raw(self, columns: Optional[List[str]] = None):
        return self._kind("node", columns)

    def edges_raw(self, columns: Optional[List[str]] = None):
        return self._kind("edge", columns)

    def errors(self):
        return self._kind(
            "error",
            ["url", "line_number", "error_class", "error_line", "context_json"],
        ).select_columns(
            ["url", "line_number", "error_class", "error_line", "context_json"],
        )

    def docs(self):
        return self._kind(
            "doc", ["url", "gated", "aborted", "n_statements", "metadata_json"],
        ).select_columns(
            ["url", "gated", "aborted", "n_statements", "metadata_json"],
        )

    # -- deduped outputs ---------------------------------------------------

    def nodes(self):
        """Global node table, exact-deduped on canonical-BEL md5."""
        cols = [
            "md5", "bel", "function", "namespace", "name", "identifier", "node_json",
        ]
        return dedup_exact(self.nodes_raw(cols).select_columns(cols), "md5")

    def edges(self):
        """Global edge table, exact-deduped on content hash."""
        cols = [
            "edge_md5", "src_md5", "dst_md5", "src_bel", "dst_bel", "relation",
            "evidence", "citation_db", "citation_id", "annotations_json",
            "subject_json", "object_json", "triple_h", "triple_r", "triple_t",
        ]
        return dedup_exact(self.edges_raw(cols).select_columns(cols), "edge_md5")

    def triples(self):
        """Deduped, globally sorted (h, r, t) — the graded export.

        Equivalent to reference ``get_triples`` (io/tsv/api.py:61-84):
        converter chain (already applied at parse time) → set-dedup → sort.
        """
        if self.triples_path is not None:
            import ray
            import ray.data

            cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
            # coalesce the many small per-actor shards to ~one block per
            # CPU — but ONLY while that keeps blocks reasonable: forcing
            # cpus blocks on a multi-TB triples dir would build giant
            # blocks, so above ~256MB/CPU let Ray size blocks itself
            total_bytes = 0
            try:
                if self.filesystem is None:
                    for root, _dirs, files in os.walk(self.triples_path):
                        total_bytes += sum(
                            os.path.getsize(os.path.join(root, f))
                            for f in files if f.endswith(".parquet")
                        )
                else:
                    from pyarrow import fs as pafs

                    sel = pafs.FileSelector(self.triples_path, recursive=True)
                    total_bytes = sum(
                        info.size or 0
                        for info in self.filesystem.get_file_info(sel)
                        if info.type == pafs.FileType.File
                        and info.path.endswith(".parquet")
                    )
            except OSError:
                total_bytes = 0
            override = cpus if total_bytes <= cpus * (256 << 20) else None
            ds = ray.data.read_parquet(
                self.triples_path,
                schema=pa.schema([
                    ("h", pa.string()), ("r", pa.string()), ("t", pa.string()),
                ]),
                override_num_blocks=override,
                filesystem=self.filesystem,
            )

            def _key(t: pa.Table) -> pa.Table:
                key = pc.binary_join_element_wise(
                    t.column("h"), t.column("r"), t.column("t"), "\x1f",
                )
                return t.append_column("hrt", key)

            ds = ds.map_batches(_key, batch_format="pyarrow")
            ds = dedup_exact_sorted(ds, "hrt", ["h", "r", "t"])
            return ds.drop_columns(["hrt"])

        def _has_triple(t: pa.Table) -> pa.Table:
            return t.filter(pc.is_valid(t.column("triple_h")))

        ds = self.edges_raw(["triple_h", "triple_r", "triple_t"]).map_batches(
            _has_triple, batch_format="pyarrow",
        )

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
        # dedup + global sort share ONE exchange (the hrt key is exactly the
        # concatenation of the sort columns, so duplicates co-locate)
        ds = dedup_exact_sorted(ds, "hrt", ["h", "r", "t"])
        return ds.drop_columns(["hrt"])

    def graph(self):
        """Deduped (nodes, edges) as a :class:`pybel_ray.struct.Graph`."""
        from .struct.graph import Graph

        return Graph(self.nodes(), self.edges())

    def statement_count(self) -> int:
        """Total parsed statements across all documents.

        Free from the shard manifest when available; else a narrow
        two-column scan (never pull the wide doc rows to the driver).
        """
        if self.manifest is not None:
            return int(self.manifest.sum("statements"))
        ds = self._kind("doc", ["n_statements"])
        return int(ds.sum("n_statements") or 0)

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
    events_dir: Optional[str] = None,
    dedup_urls: bool = False,
    **options,
) -> KGTables:
    """Run extract→parse and return a :class:`KGTables` over the events.

    ``materialize=True`` pins the (small) events dataset in the object store
    so node/edge/error/triple views don't re-run the parse.  For large runs
    pass ``events_dir``: the events land in Parquet there instead — views
    then read back only their columns (pruned scans), and the directory is
    a resumable checkpoint.
    """
    if dedup_urls:
        # crawl hygiene: canonicalize urls, keep the latest capture per url
        # (only contended urls shuffle — see pages.dedup_pages_by_url)
        from .pages import dedup_pages_by_url, normalize_urls

        pages = dedup_pages_by_url(normalize_urls(pages))
    if events_dir is not None:
        from . import fsio

        fs = options.get("filesystem")
        ev = fsio.join(fs, events_dir, "events")
        tr = fsio.join(fs, events_dir, "triples")
        manifest = events_pipeline(
            pages, registry, events_dir=ev, triples_dir=tr, **options,
        ).materialize()  # tiny: one row per shard; drives execution
        return KGTables(events_path=ev, triples_path=tr, manifest=manifest,
                        filesystem=fs)
    events = events_pipeline(pages, registry, **options)
    if materialize:
        events = events.materialize()
    return KGTables(events=events)


class CheckpointedCompile:
    """Per-shard, resumable compile over a list of input Parquet files.

    One shard = one group of input files (the natural 100 TB partition
    unit).  Each shard's events land in ``out_dir/events/shard=<id>/`` and a
    manifest entry ``(shard_id, files, rows, triples, seconds)`` commits it
    on completion; a re-run skips shards already in the manifest
    (anti-join resume, BASELINE.md checkpoint criterion).

    ``out_dir`` may be a local path (manifest = appended ``manifest.jsonl``,
    atomicity via ``os.replace``), a ``pyarrow.fs`` URI, or a path under an
    explicit ``filesystem`` (object-store protocol: direct-PUT parts +
    one ``manifest/shard=<id>.json`` commit object per shard — see
    :mod:`pybel_ray.fsio`).  Resume semantics are identical in both modes:
    a shard without its manifest entry is cleared and re-run.
    """

    def __init__(
        self,
        out_dir: str,
        registry: Optional[ResourceRegistry] = None,
        files_per_shard: int = 1,
        filesystem=None,
        **options,
    ):
        from . import fsio

        self.fs, self.out_dir = fsio.parse_target(out_dir, filesystem)
        self.registry = registry
        self.files_per_shard = files_per_shard
        self.options = options
        if self.fs is None:
            self.manifest_path = os.path.join(self.out_dir, "manifest.jsonl")
        else:
            self.manifest_path = fsio.join(self.fs, self.out_dir, "manifest")
        fsio.ensure_dir(self.fs, fsio.join(self.fs, self.out_dir, "events"))

    def completed_shards(self) -> dict:
        from . import fsio

        if self.fs is not None:
            return fsio.read_manifest_dir(self.fs, self.manifest_path)
        done = {}
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                for line in f:
                    entry = json.loads(line)
                    done[entry["shard_id"]] = entry
        return done

    def _commit_shard(self, entry: dict) -> None:
        from . import fsio

        if self.fs is None:
            with open(self.manifest_path, "a") as f:
                f.write(json.dumps(entry) + "\n")
            return
        fsio.ensure_dir(self.fs, self.manifest_path)
        fsio.write_text_atomic(
            self.fs,
            fsio.join(
                self.fs, self.manifest_path,
                "shard={}.json".format(entry["shard_id"]),
            ),
            json.dumps(entry),
        )

    def _shards(self, files: Sequence[str]) -> List[List[str]]:
        files = sorted(files)
        n = self.files_per_shard
        return [list(files[i:i + n]) for i in range(0, len(files), n)]

    def run(self, files: Sequence[str]) -> KGTables:
        """Compile all shards (skipping completed ones); return KGTables."""
        import ray

        from . import fsio

        done = self.completed_shards()
        for shard_id, shard_files in enumerate(self._shards(files)):
            if shard_id in done:
                continue
            t0 = time.time()
            shard_dir = fsio.join(
                self.fs, self.out_dir, "events", "shard={}".format(shard_id),
            )
            tri_dir = fsio.join(
                self.fs, self.out_dir, "triples", "shard={}".format(shard_id),
            )
            # A shard absent from the manifest may still have partial output
            # from a crashed attempt.  Part filenames depend on input block
            # boundaries (parallelism-dependent), so a resume with different
            # blocking would leave stale parts alongside the new ones —
            # clear the shard dirs/prefixes before re-running.
            for d in (shard_dir, tri_dir):
                fsio.delete_dir(self.fs, d)
            pages = ray.data.read_parquet(shard_files)
            # actor-write path: parse actors write the shard's Parquet
            # themselves and return per-block counts (see ParseDocumentsToDir)
            manifest_rows = events_pipeline(
                pages, self.registry,
                events_dir=shard_dir, triples_dir=tri_dir,
                filesystem=self.fs, **self.options,
            ).take_all()
            self._commit_shard({
                "shard_id": shard_id,
                "files": shard_files,
                "rows": sum(r["rows"] for r in manifest_rows),
                "statements": sum(r["statements"] for r in manifest_rows),
                "triples": sum(r["triples"] for r in manifest_rows),
                "seconds": round(time.time() - t0, 3),
            })
        return self.tables()

    def tables(self) -> KGTables:
        from . import fsio

        triples_dir = fsio.join(self.fs, self.out_dir, "triples")
        return KGTables(
            events_path=fsio.join(self.fs, self.out_dir, "events"),
            triples_path=(
                triples_dir if fsio.is_dir(self.fs, triples_dir) else None
            ),
            filesystem=self.fs,
        )
