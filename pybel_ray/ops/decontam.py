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

__all__ = [
    "benchmark_ngrams", "flag_contamination", "dup_ngram_stats",
    "substring_dedup",
]


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


def dup_ngram_stats(ds, n: int = 8, id_col: str = "doc_id", text_col: str = "text"):
    """Cross-document duplicate n-gram fraction, one row per document.

    The RefinedWeb/Gopher duplication-hygiene signal: for each document,
    how many of its DISTINCT word ``n``-grams also occur in at least one
    OTHER document.  Output columns: ``(id_col, n_grams, n_dup,
    dup_frac_e6)`` where ``dup_frac_e6 = n_dup * 1e6 // n_grams``
    (integer micros, SQL-exact).  Documents with fewer than ``n`` words
    emit no row.

    Scale shape — exactly TWO aggregate exchanges, no gram group is ever
    co-located (hot grams like stop-word runs are safe):

    1. per-batch (docs never span batches): distinct grams per doc via
       one vectorized ``dictionary_encode`` + ``np.unique``; each batch
       emits the (gram, doc) pairs AND one (doc, n_grams) partial row.
    2. ``groupby(gram)`` AGGREGATE (count + min doc) — a combiner-backed
       aggregate, not ``map_groups``, so a gram shared by millions of
       docs never lands on one worker.  Grams with count == 1 attribute
       one *unique* gram to their only document.
    3. the complement trick: ``n_dup = n_grams - n_unique``, folded by a
       single ``groupby(doc)`` sum over the union of both partial
       streams.

    No reference analog (training-data-pipeline family, SURVEY.md §2
    beyond-reference operators).
    """
    from .relational import groupby_agg

    def _pairs(t: pa.Table) -> pa.Table:
        grams, pos = _ngram_positions(t, text_col, n)
        if grams is None:
            return pa.Table.from_arrays(
                [pa.array([], pa.string()), pa.array([], pa.int64())],
                names=["g", id_col],
            )
        doc_idx, valid = pos
        if not valid.all():
            grams = grams.filter(pa.array(valid))
            doc_idx = doc_idx[valid]
        enc = grams.dictionary_encode()
        codes = np.asarray(enc.indices.to_numpy(zero_copy_only=False), np.int64)
        # distinct (doc, gram) per batch; docs are single rows, so this
        # IS the exact per-document distinct set
        composite = doc_idx * np.int64(len(enc.dictionary)) + codes
        _, first = np.unique(composite, return_index=True)
        ids = np.asarray(
            t.column(id_col).to_numpy(zero_copy_only=False), np.int64,
        )[doc_idx[first]]
        return pa.Table.from_arrays(
            [grams.take(pa.array(first)), pa.array(ids, pa.int64())],
            names=["g", id_col],
        )

    pairs = ds.select_columns([id_col, text_col]).map_batches(
        _pairs, batch_format="pyarrow",
    )

    def _totals(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column(id_col).to_numpy(zero_copy_only=False), np.int64)
        uniq, cnt = np.unique(ids, return_counts=True)
        return pa.Table.from_arrays(
            [pa.array(uniq, pa.int64()), pa.array(cnt.astype(np.int64)),
             pa.array(np.zeros(len(uniq), np.int64))],
            names=[id_col, "n_grams", "n_unique"],
        )

    # NOTE: a doc's pairs all come from its one source batch, so the
    # per-batch count is already the exact per-document total
    totals = pairs.map_batches(_totals, batch_format="pyarrow")

    per_gram = groupby_agg(
        pairs, "g", {"n_docs": ("count", "g"), "only_doc": ("min", id_col)},
    )

    def _singles(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("n_docs"), 1))
        z = np.zeros(t.num_rows, np.int64)
        return pa.Table.from_arrays(
            [pc.cast(t.column("only_doc"), pa.int64()), pa.array(z),
             pa.array(np.ones(t.num_rows, np.int64))],
            names=[id_col, "n_grams", "n_unique"],
        )

    singles = per_gram.map_batches(_singles, batch_format="pyarrow")

    folded = groupby_agg(
        totals.union(singles), id_col,
        {"n_grams": ("sum", "n_grams"), "n_unique": ("sum", "n_unique")},
    )

    def _finish(t: pa.Table) -> pa.Table:
        tot = np.asarray(t.column("n_grams").to_numpy(zero_copy_only=False), np.int64)
        unq = np.asarray(t.column("n_unique").to_numpy(zero_copy_only=False), np.int64)
        dup = tot - unq
        frac = dup * np.int64(1_000_000) // tot
        return pa.Table.from_arrays(
            [t.column(id_col), pa.array(tot), pa.array(dup), pa.array(frac)],
            names=[id_col, "n_grams", "n_dup", "dup_frac_e6"],
        )

    return folded.map_batches(_finish, batch_format="pyarrow")


def _window_token_stats(
    t: pa.Table, text_col: str, id_col: str, n: int,
    with_grams: bool = True,
):
    """Per-batch tokenization shared by :func:`substring_dedup`: flat
    token values, per-doc lengths, flat window grams with their
    within-document validity and flat start positions.  The gram
    construction is the expensive kernel (n shifted slices joined), so
    passes that only need the token layout set ``with_grams=False``."""
    parts = _split_words(t, text_col)
    offs = np.asarray(parts.offsets)
    vals = parts.values
    lens = np.diff(offs)
    doc_idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), lens)
    m = len(vals) - n + 1
    if not with_grams or m <= 0:
        return vals, lens, doc_idx, None, None
    grams = pc.binary_join_element_wise(
        *[vals.slice(k, m) for k in range(n)], " ",
    )
    valid = doc_idx[:m] == doc_idx[n - 1:]
    return vals, lens, doc_idx, grams, valid


def substring_dedup(
    ds,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
    broadcast_budget: int = 2_000_000,
):
    """ExactSubstr-style duplicated-span REMOVAL (the rewrite step of
    Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    Better", word-window variant): every word ``n``-gram occurring at
    least ``min_count`` times in the corpus (counting repeats within a
    document) marks its ``n`` covered tokens for removal; overlapping
    duplicated windows merge into maximal spans automatically.  Output
    one row per non-null-text document: ``(id_col, n_tokens, n_removed,
    clean_text)`` — surviving tokens re-joined with single spaces,
    NULL when nothing survives (SQL ``string_agg`` semantics).

    Scale shape: the duplicated-gram table comes from per-batch partial
    counts + ONE ``groupby(gram).sum`` (a hot gram never co-locates its
    raw occurrences).  Then a budget hybrid, same contract as
    :func:`~pybel_ray.ops.lines.remove_duplicated_segments`:

    * at or below ``broadcast_budget`` duplicated grams: ``ray.put``
      once, one vectorized ``pc.is_in`` + difference-array span cover
      per batch — document text never shuffles;
    * beyond it: exploded (gram, id, start) occurrence rows, a bucketed
      semi-join against the gram table, per-doc start packing, and a
      bucketed re-attach to the documents by id — no driver
      materialization anywhere on that path.
    """
    from ..struct.degree import bucketed_attach, bucketed_semi_join

    def _gram_partials(t: pa.Table) -> pa.Table:
        _, _, _, grams, valid = _window_token_stats(t, text_col, id_col, n)
        if grams is None:
            return pa.Table.from_arrays(
                [pa.array([], pa.string()), pa.array([], pa.int64())],
                names=["g", "c"],
            )
        if not valid.all():
            grams = grams.filter(pa.array(valid))
        gt = pa.Table.from_arrays([grams], names=["g"])
        local = gt.group_by(["g"]).aggregate([([], "count_all")])
        return local.rename_columns(["g", "c"])

    counts = ds.select_columns([id_col, text_col]).map_batches(
        _gram_partials, batch_format="pyarrow",
    ).groupby("g").sum("c")

    def _dups(t: pa.Table) -> pa.Table:
        t = t.rename_columns(["g", "c"])
        return t.filter(
            pc.greater_equal(t.column("c"), min_count),
        ).select(["g"])

    dup_grams = counts.map_batches(_dups, batch_format="pyarrow")
    dup_grams = dup_grams.materialize()
    n_dup = dup_grams.count()

    def _covered_mask(vals_len, starts):
        """Token cover from duplicated window starts via a difference
        array — O(tokens), overlap-merging by construction."""
        diff = np.zeros(vals_len + n, np.int64)
        np.add.at(diff, starts, 1)
        np.add.at(diff, starts + n, -1)
        return np.cumsum(diff[:vals_len]) > 0

    def _emit(t: pa.Table, covered, vals, lens, doc_idx) -> pa.Table:
        ids = t.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        keep = ~covered
        kept_per_doc = (
            np.bincount(doc_idx[keep], minlength=t.num_rows)
            if len(doc_idx)
            else np.zeros(t.num_rows, np.int64)
        )
        new_offs = np.r_[0, np.cumsum(kept_per_doc)]
        la = pa.ListArray.from_arrays(
            pa.array(new_offs, pa.int32()), vals.filter(pa.array(keep)),
        )
        joined = pc.binary_join(la, " ")
        clean = pc.if_else(
            pa.array(kept_per_doc > 0), joined,
            pa.scalar(None, pa.string()),
        )
        # null-text docs tokenize to zero tokens and are dropped
        # (matching the SQL, whose token CTE loses them)
        has = lens > 0
        out = pa.Table.from_arrays(
            [
                ids,
                pa.array(lens, pa.int64()),
                pa.array(lens - kept_per_doc, pa.int64()),
                clean,
            ],
            names=[id_col, "n_tokens", "n_removed", "clean_text"],
        )
        return out.filter(pa.array(has)) if not has.all() else out

    if n_dup == 0:
        def _clean_only(t: pa.Table) -> pa.Table:
            vals, lens, doc_idx, _, _ = _window_token_stats(
                t, text_col, id_col, n, with_grams=False,
            )
            covered = np.zeros(len(vals), bool)
            return _emit(t, covered, vals, lens, doc_idx)

        return ds.select_columns([id_col, text_col]).map_batches(
            _clean_only, batch_format="pyarrow",
        )

    if n_dup <= broadcast_budget:
        import ray

        chunks = [
            b.column("g").combine_chunks()
            for b in dup_grams.iter_batches(batch_format="pyarrow")
        ]
        dup_ref = ray.put(pa.concat_arrays(chunks))

        def _strip(t: pa.Table) -> pa.Table:
            vset = ray.get(dup_ref)
            vals, lens, doc_idx, grams, valid = _window_token_stats(
                t, text_col, id_col, n,
            )
            if grams is None:
                covered = np.zeros(len(vals), bool)
            else:
                hit = pc.is_in(grams, value_set=vset).to_numpy(
                    zero_copy_only=False,
                ) & valid
                covered = _covered_mask(len(vals), np.flatnonzero(hit))
            return _emit(t, covered, vals, lens, doc_idx)

        return ds.select_columns([id_col, text_col]).map_batches(
            _strip, batch_format="pyarrow",
        )

    # scale path: exploded occurrences -> bucketed semi-join -> per-doc
    # start packing -> bucketed re-attach by id -> local span cover
    def _occurrences(t: pa.Table) -> pa.Table:
        vals, lens, doc_idx, grams, valid = _window_token_stats(
            t, text_col, id_col, n,
        )
        if grams is None:
            return pa.Table.from_arrays(
                [pa.array([], pa.string()), pa.array([], pa.string()),
                 pa.array([], pa.int64())],
                names=["g", "_id", "start"],
            )
        offs0 = np.r_[0, np.cumsum(lens)][:-1]
        m = len(grams)
        starts = np.arange(m, dtype=np.int64) - offs0[doc_idx[:m]]
        ids = pc.cast(t.column(id_col), pa.string())
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        va = pa.array(valid)
        return pa.Table.from_arrays(
            [
                grams.filter(va),
                ids.take(pa.array(doc_idx[:m][valid])),
                pa.array(starts[valid], pa.int64()),
            ],
            names=["g", "_id", "start"],
        )

    occ = ds.select_columns([id_col, text_col]).map_batches(
        _occurrences, batch_format="pyarrow",
    )
    hits = bucketed_semi_join(occ, "g", dup_grams, "g")

    def _pack(g: pa.Table) -> pa.Table:
        starts = np.unique(
            np.asarray(
                g.column("start").to_numpy(zero_copy_only=False), np.int64,
            ),
        )
        return pa.Table.from_arrays(
            [
                g.column("_id").slice(0, 1),
                pa.array([",".join(map(str, starts))], pa.string()),
            ],
            names=["_id", "_starts"],
        )

    packed = hits.groupby("_id").map_groups(_pack, batch_format="pyarrow")

    def _with_key(t: pa.Table) -> pa.Table:
        k = pc.cast(t.column(id_col), pa.string())
        return t.append_column("_id", k)

    keyed = ds.select_columns([id_col, text_col]).map_batches(
        _with_key, batch_format="pyarrow",
    )
    attached = bucketed_attach(
        keyed, "_id", packed, "_id", ["_starts"], how="left",
    )

    def _strip_attached(t: pa.Table) -> pa.Table:
        vals, lens, doc_idx, _, _ = _window_token_stats(
            t, text_col, id_col, n, with_grams=False,
        )
        offs0 = np.r_[0, np.cumsum(lens)][:-1]
        starts_col = t.column("_starts").to_pylist()
        flat = []
        for row, packed_starts in enumerate(starts_col):
            if not packed_starts:
                continue
            base = offs0[row]
            flat.extend(base + int(s) for s in packed_starts.split(","))
        starts = np.asarray(flat, np.int64) if flat else np.zeros(0, np.int64)
        covered = _covered_mask(len(vals), starts)
        return _emit(t, covered, vals, lens, doc_idx)

    return attached.map_batches(_strip_attached, batch_format="pyarrow")
