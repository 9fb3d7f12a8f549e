"""Benchmark decontamination: flag corpus documents that share a word
n-gram with a benchmark/eval set.

The standard pre-training hygiene step (GPT-3 §C / PaLM-style 8–13-gram
overlap): any training document containing an exact n-gram that also
appears in an evaluation set is contaminated and must be flagged or
dropped before training.

Scale shape: the benchmark side is *small by definition* (an eval set),
so its distinct n-grams are collected once and broadcast via ``ray.put``;
the corpus side is a stateless one-pass ``map_batches`` — n-grams are
materialized per batch as shifted-slice joins of the flat word stream
(no per-row Python), matched with one ``pc.is_in``, and only per-doc
counts survive.  No shuffle, no driver materialization of the corpus.

Reference scope note: the reference engine (a BEL compiler) has no
decontamination surface; this is part of the training-data-pipeline
family (SURVEY.md §2 "beyond-reference" operators).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .lines import _split_words

__all__ = ["benchmark_ngrams", "flag_contamination"]


def _ngram_positions(t: pa.Table, text_col: str, n: int):
    """Flat (grams, doc_idx) for every within-document word n-gram.

    Grams are built as one ``binary_join_element_wise`` over ``n``
    shifted slices of the batch's flat word array; a position is valid
    iff its first and last word fall in the same document.
    """
    parts = _split_words(t, text_col)
    offs = np.asarray(parts.offsets)
    vals = parts.values
    lens = np.diff(offs)
    doc_idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), lens)
    m = len(vals) - n + 1
    if m <= 0:
        return None, None
    grams = pc.binary_join_element_wise(
        *[vals.slice(k, m) for k in range(n)], " ",
    )
    valid = doc_idx[:m] == doc_idx[n - 1:]
    return grams, (doc_idx[:m], valid)


def benchmark_ngrams(benchmark_ds, n: int = 8, text_col: str = "text") -> pa.Array:
    """Distinct word n-grams of the benchmark set, as one Arrow array.

    Streams the benchmark through ``iter_batches`` and dedups on the
    driver — sound because an eval set is small by definition (document
    the assumption; the corpus side never visits the driver).
    """
    seen = set()
    projected = benchmark_ds.select_columns([text_col]).map_batches(
        lambda t: (lambda g: pa.Table.from_arrays(
            [pc.unique(g[0].filter(pa.array(g[1][1])))] if g[0] is not None
            else [pa.array([], pa.string())],
            names=["g"],
        ))(_ngram_positions(t, text_col, n)),
        batch_format="pyarrow",
    )
    for b in projected.iter_batches(batch_format="pyarrow"):
        seen.update(b.column("g").to_pylist())
    return pa.array(sorted(seen), pa.string())


def flag_contamination(
    corpus_ds,
    benchmark_ds=None,
    n: int = 8,
    text_col: str = "text",
    gram_set: pa.Array | None = None,
):
    """Append ``n_contaminated`` (distinct benchmark n-grams the document
    contains) and ``contaminated`` (any hit) to every corpus row.

    Pass either ``benchmark_ds`` (its gram set is computed and broadcast)
    or a precomputed ``gram_set`` (reusable across corpora).
    """
    import ray

    if gram_set is None:
        if benchmark_ds is None:
            raise ValueError("need benchmark_ds or gram_set")
        gram_set = benchmark_ngrams(benchmark_ds, n=n, text_col=text_col)
    gram_ref = ray.put(gram_set)

    def _f(t: pa.Table) -> pa.Table:
        grams, pos = _ngram_positions(t, text_col, n)
        counts = np.zeros(t.num_rows, dtype=np.int64)
        if grams is not None:
            doc_of_gram, valid = pos
            hit = pc.and_(
                pc.fill_null(pc.is_in(grams, value_set=ray.get(gram_ref)), False),
                pa.array(valid),
            ).to_numpy(zero_copy_only=False)
            if hit.any():
                # distinct (doc, gram) pairs among hits
                enc = grams.filter(pa.array(hit)).dictionary_encode()
                codes = np.asarray(
                    enc.indices.to_numpy(zero_copy_only=False), dtype=np.int64,
                )
                docs = doc_of_gram[hit]
                order = np.lexsort((codes, docs))
                d, c = docs[order], codes[order]
                starts = np.r_[True, (d[1:] != d[:-1]) | (c[1:] != c[:-1])]
                counts = np.bincount(
                    d[starts], minlength=t.num_rows,
                ).astype(np.int64)
        t = t.append_column("n_contaminated", pa.array(counts, pa.int64()))
        return t.append_column("contaminated", pa.array(counts > 0))

    return corpus_ds.map_batches(_f, batch_format="pyarrow")
