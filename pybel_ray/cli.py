"""Command-line interface (reference ``cli.py:92-262``).

``python -m pybel_ray <command>``:

* ``compile PATH``   — compile BEL (a ``.bel`` file, a directory of them,
  or a page-table Parquet file/dir) into an events/triples Parquet
  directory — the engine's analog of the reference's pickle cache.
* ``summarize DIR``  — print the compiled graph's summary counts.
* ``warnings DIR``   — print the warning rows as TSV.
* ``serialize DIR``  — export to nodelink/sif/gsea/graphml/bel/... via the
  I/O format registry.

The CLI owns the Ray session (library code never calls ``ray.init``).
"""

from __future__ import annotations

import json
import os
import sys

import click


def _ray_init():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)


def _pages_dataset(path: str):
    """PATH -> pages Dataset (url, text): .bel file(s) or page Parquet."""
    import ray.data

    if os.path.isfile(path) and path.endswith(".bel"):
        with open(path) as f:
            text = f.read()
        return ray.data.from_items([{"url": "file://" + os.path.abspath(path),
                                     "text": text}])
    if os.path.isdir(path):
        bels = sorted(
            os.path.join(path, n) for n in os.listdir(path) if n.endswith(".bel")
        )
        if bels:
            rows = []
            for p in bels:
                with open(p) as f:
                    rows.append({"url": "file://" + os.path.abspath(p),
                                 "text": f.read()})
            return ray.data.from_items(rows)
    ds = ray.data.read_parquet(path)
    names = ds.schema().names
    if "url" not in names or "text" not in names:
        raise click.ClickException(
            "page table at {} must have 'url' and 'text' columns; found {}".format(
                path, names,
            ),
        )
    return ds


def _tables(out_dir: str):
    from .pipeline import KGTables

    triples = os.path.join(out_dir, "triples")
    return KGTables(
        events_path=os.path.join(out_dir, "events"),
        triples_path=triples if os.path.isdir(triples) else None,
    )


@click.group(help="pybel_ray CLI (Ray-Data BEL knowledge-graph engine)")
def main():
    pass


@main.command(name="compile")
@click.argument("path")
@click.option("-o", "--out", default=None,
              help="Output directory (default: PATH + '.pybel_ray')")
@click.option("--allow-naked-names", is_flag=True,
              help="Enable lenient parsing for naked names")
@click.option("--disallow-nested", is_flag=True,
              help="Disable lenient parsing for nested statements")
@click.option("--no-citation-clearing", is_flag=True,
              help="Turn off citation clearing")
@click.option("--no-gate", is_flag=True,
              help="Parse every page (skip the looks-like-BEL gate)")
@click.option("--synthetic-registry", is_flag=True,
              help="Resolve namespaces from the built-in synthetic registry "
                   "(offline fixtures) instead of an empty one")
@click.option("--dedup-urls", is_flag=True,
              help="Normalize urls and keep only the latest capture per url "
                   "before parsing (crawl-input hygiene)")
def compile_cmd(path, out, allow_naked_names, disallow_nested,
                no_citation_clearing, no_gate, synthetic_registry,
                dedup_urls):
    """Compile a BEL script / page table to a graph (reference cli.py:110)."""
    _ray_init()
    from .pipeline import compile_pages

    registry = None
    if synthetic_registry:
        from .pages import default_registry

        registry = default_registry()
    out = out or (path.rstrip("/") + ".pybel_ray")
    pages = _pages_dataset(path)
    tables = compile_pages(
        pages,
        registry,
        events_dir=out,
        allow_naked_names=allow_naked_names,
        disallow_nested=disallow_nested,
        citation_clearing=not no_citation_clearing,
        gate=not no_gate,
        dedup_urls=dedup_urls,
    )
    summary = tables.summary()
    click.echo("Compilation -> {}".format(out))
    for key, value in summary.items():
        click.echo("  {}: {}".format(key, value))
    # reference parity: nonzero exit when the compile produced warnings
    sys.exit(0 if summary["warnings"] == 0 else 1)


@main.command()
@click.argument("out_dir")
def summarize(out_dir):
    """Summarize a compiled graph (reference cli.py:147-152)."""
    _ray_init()
    for key, value in _tables(out_dir).summary().items():
        click.echo("{}: {}".format(key, value))


@main.command()
@click.argument("out_dir")
def warnings(out_dir):
    """List warnings from a compiled graph as TSV (reference cli.py:200-205)."""
    _ray_init()
    for batch in _tables(out_dir).errors().iter_batches(batch_format="pyarrow"):
        for r in batch.to_pylist():
            click.echo("{}\t{}\t{}\t{}".format(
                r["url"], r["line_number"], r["error_class"], r["error_line"],
            ))


@main.command()
@click.argument("out_dir")
@click.option("--fmt", default=None,
              help="Any registered format (see `formats`); writes to --output")
@click.option("--output", default="-", help="Output file for --fmt ('-' = stdout)")
@click.option("--tsv", default=None, help="Path to output a triples TSV file.")
@click.option("--edgelist", default=None, help="Path to output an edgelist file.")
@click.option("--sif", default=None, help="Path to output an SIF file.")
@click.option("--gsea", default=None, help="Path to output a GRP file.")
@click.option("--graphml", default=None, help="Path to output a GraphML file.")
@click.option("--nodelink", default=None, help="Path to output node-link JSON.")
@click.option("--bel", default=None, help="Output canonical BEL.")
def serialize(out_dir, fmt, output, tsv, edgelist, sif, gsea, graphml,
              nodelink, bel):
    """Serialize a compiled graph to various formats (reference cli.py:224)."""
    _ray_init()
    from .io_registry import serialize as serialize_fmt

    tables = _tables(out_dir)
    graph = tables.graph().materialize()

    if fmt is not None:
        if output == "-":
            result = serialize_fmt(graph, fmt)
            click.echo(json.dumps(result, sort_keys=True)
                       if not isinstance(result, (str, list)) else result)
        else:
            serialize_fmt(graph, fmt, file=output)
        return

    if tsv:
        _write_triples_tsv(tables, tsv)
    for path, name in ((edgelist, "edgelist"), (sif, "sif"), (bel, "bel"),
                       (nodelink, "nodelink")):
        if path:
            serialize_fmt(graph, name, file=path)
    if gsea:
        serialize_fmt(graph, "gsea", file=gsea)
    if graphml:
        from .export.extras import to_graphml

        to_graphml(graph, graphml)


def _write_triples_tsv(tables, path):
    with open(path, "w") as f:
        for batch in tables.triples().iter_batches(batch_format="pyarrow"):
            for r in batch.to_pylist():
                f.write("{}\t{}\t{}\n".format(r["h"], r["r"], r["t"]))


@main.command(name="import")
@click.argument("fmt")
@click.argument("path")
@click.option("-o", "--out", required=True,
              help="Output graph directory (Parquet nodes/edges snapshot)")
def import_cmd(fmt, path, out):
    """Import an external format into a graph snapshot.

    FMT is any registered importer: hetionet (json/bz2), indra
    (statement-JSON list file), biopax (Level-3 OWL), nodelink, cx,
    jgif, cbn_jgif.  The result lands as the engine's standard Parquet
    nodes/edges checkpoint, readable by summarize/serialize.
    """
    _ray_init()
    from .io_bulk import save_graph
    from .io_registry import get_importer

    importer = get_importer(fmt)
    if fmt == "indra":
        from .io_indra import from_indra_json_file

        graph = from_indra_json_file(path)
    elif fmt == "biopax":
        graph = importer(path)
    elif fmt == "hetionet":
        if path.endswith(".bz2"):
            from .io_hetionet import from_hetionet_gz

            graph = from_hetionet_gz(path)
        else:
            with open(path) as f:
                graph = importer(json.load(f))
    else:  # json-document formats (nodelink/cx/jgif/...)
        with open(path) as f:
            graph = importer(json.load(f))
    save_graph(graph, out)
    click.echo("Imported {} -> {}".format(path, out))
    for key, value in graph.summary_dict().items():
        click.echo("  {}: {}".format(key, value))


@main.command()
def formats():
    """List registered I/O formats (the plugin registry)."""
    from .io_registry import registered_formats

    click.echo(json.dumps(registered_formats(), indent=2))


if __name__ == "__main__":  # pragma: no cover
    main()
