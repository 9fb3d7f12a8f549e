"""Corpus-level segment dedup and repetition quality signals.

The pre-training text operations a Common-Crawl-scale pipeline runs that
the per-document family in :mod:`pybel_ray.ops.text` does not cover:

* :func:`repetition_stats` — Gopher-style within-document repetition
  signals (duplicate-word fraction, top-bigram fraction, longest
  same-word run), fully vectorized per batch (one lexsort over the
  batch's flattened word stream — no Python loop over rows).
* :func:`duplicated_segments` / :func:`remove_duplicated_segments` —
  CCNet/RefinedWeb-style cross-document segment dedup: a segment (line,
  sentence, word — any exact separator) occurring in ``min_docs``
  distinct documents is stripped from every document.  The counting side
  ships one row per *distinct* (segment, document) pair (per-batch
  combiner first), and the strip side is a budget hybrid: a broadcast
  ``ray.put`` value-set filter when the victim table is small (the common
  case — no document text ever shuffles), else a bucketed anti-join +
  per-document rebuild (documents co-locate by id; no driver
  materialization).

Reference scope note: the reference engine has no corpus-level text
operators (it is a BEL compiler); these exist for the training-data
pipeline surface alongside ``ops/text.py`` and ``ops/dedup_approx.py``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "repetition_stats",
    "duplicated_segments",
    "remove_duplicated_segments",
    "filter_lines",
]

#: victim tables at or below this many segments broadcast via ``ray.put``
#: (strings; a few hundred MB at worst) — above it, the strip becomes a
#: bucketed anti-join + per-document rebuild.
_BROADCAST_VICTIM_BUDGET = 2_000_000


def _split_words(t: pa.Table, text_col: str) -> pa.ListArray:
    """``\\s+`` split of the trimmed text — same tokenization as
    ``add_token_counts`` (and ``regexp_split_to_array(trim(t), '\\s+')``
    in DuckDB, so oracles reproduce counts exactly)."""
    trimmed = pc.utf8_trim_whitespace(t.column(text_col))
    parts = pc.split_pattern_regex(trimmed, pattern=r"\s+")
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    return parts


def repetition_stats(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Gopher-style repetition signals, one row per document.

    Appends to each row:

    * ``n_words`` — whitespace token count (empty text counts 1, matching
      ``add_token_counts``' convention).
    * ``n_distinct_words`` — distinct tokens.
    * ``dup_word_frac`` — ``(n_words - n_distinct_words) / n_words``.
    * ``top_bigram_count`` — occurrences of the most frequent adjacent
      word pair (0 when ``n_words < 2``).
    * ``top_bigram_frac`` — ``top_bigram_count / (n_words - 1)``
      (0.0 when ``n_words < 2``).
    * ``max_word_run`` — length of the longest run of consecutive
      identical words.

    All computed with one batch-wide ``dictionary_encode`` + two lexsorts
    over the flattened word stream; cost is O(W log W) per batch in
    vectorized numpy, independent of document count.
    """

    def _stats(t: pa.Table) -> pa.Table:
        parts = _split_words(t, text_col)
        offs = np.asarray(parts.offsets)
        vals = parts.values
        ndocs = t.num_rows
        lens = np.diff(offs)
        n_words = lens.astype(np.int64)
        codes = np.asarray(
            vals.dictionary_encode().indices.to_numpy(zero_copy_only=False),
            dtype=np.int64,
        )
        doc_idx = np.repeat(np.arange(ndocs, dtype=np.int64), lens)

        # distinct words per doc: sort (doc, code), count run starts
        order = np.lexsort((codes, doc_idx))
        dc, cc = doc_idx[order], codes[order]
        if dc.size:
            starts = np.r_[True, (dc[1:] != dc[:-1]) | (cc[1:] != cc[:-1])]
            n_distinct = np.bincount(dc[starts], minlength=ndocs).astype(np.int64)
        else:
            n_distinct = np.zeros(ndocs, dtype=np.int64)

        # top bigram per doc: adjacent pairs within a doc, sorted runs
        top_big = np.zeros(ndocs, dtype=np.int64)
        if codes.size > 1:
            same_doc = doc_idx[:-1] == doc_idx[1:]
            bd = doc_idx[:-1][same_doc]
            b1 = codes[:-1][same_doc]
            b2 = codes[1:][same_doc]
            if bd.size:
                o2 = np.lexsort((b2, b1, bd))
                bd, b1, b2 = bd[o2], b1[o2], b2[o2]
                s2 = np.flatnonzero(
                    np.r_[True,
                          (bd[1:] != bd[:-1]) | (b1[1:] != b1[:-1]) | (b2[1:] != b2[:-1])],
                )
                run_len = np.diff(np.r_[s2, bd.size])
                np.maximum.at(top_big, bd[s2], run_len)

        # longest identical-word run per doc (original order)
        max_run = np.zeros(ndocs, dtype=np.int64)
        if codes.size:
            if codes.size > 1:
                cont = (doc_idx[:-1] == doc_idx[1:]) & (codes[:-1] == codes[1:])
                rs = np.flatnonzero(np.r_[True, ~cont])
            else:
                rs = np.array([0])
            run_len = np.diff(np.r_[rs, codes.size])
            np.maximum.at(max_run, doc_idx[rs], run_len)

        nw = np.maximum(n_words, 1).astype(np.float64)
        dup_frac = (n_words - n_distinct) / nw
        denom = np.maximum(n_words - 1, 1).astype(np.float64)
        big_frac = np.where(n_words < 2, 0.0, top_big / denom)

        t = t.append_column("n_words", pa.array(n_words, pa.int64()))
        t = t.append_column("n_distinct_words", pa.array(n_distinct, pa.int64()))
        t = t.append_column("dup_word_frac", pa.array(dup_frac, pa.float64()))
        t = t.append_column("top_bigram_count", pa.array(top_big, pa.int64()))
        t = t.append_column("top_bigram_frac", pa.array(big_frac, pa.float64()))
        return t.append_column("max_word_run", pa.array(max_run, pa.int64()))

    return ds.map_batches(_stats, batch_format="pyarrow")


def filter_lines(
    ds,
    text_col: str = "text",
    sep: str = "\n",
    min_words: int = 3,
    require_terminal_punct: bool = False,
    drop_markers: tuple = (),
):
    """C4-style per-line quality filter.

    Splits each document on the exact separator ``sep``, keeps a line iff

    * it has at least ``min_words`` words (``\\S+`` matches — empty lines
      have 0, matching ``len(regexp_extract_all(line, '\\S+'))``),
    * ``require_terminal_punct`` ⇒ it ends in ``. ! ? "`` or ``'``,
    * its lowercase form contains none of ``drop_markers`` (C4 drops
      "lorem ipsum" / "javascript" / ``{`` boilerplate lines),

    then rejoins the survivors in order and appends ``n_lines`` /
    ``n_lines_kept``.  A document whose every line is dropped comes back
    with empty text (documents are never dropped — compose with
    ``ds.filter`` for that).

    Fully vectorized: one split, one RE2 count, one boolean mask and one
    ``ListArray`` rebuild per batch; stateless, so it streams as plain Ray
    tasks at any scale.
    """
    markers = tuple(m.lower() for m in drop_markers)

    def _f(t: pa.Table) -> pa.Table:
        parts = _split_segments(t, text_col, sep)
        offs = np.asarray(parts.offsets)
        vals = parts.values
        lens = np.diff(offs)
        n_lines = lens.astype(np.int64)

        wc = pc.count_substring_regex(vals, r"\S+")
        keep = pc.greater_equal(wc, min_words)
        if require_terminal_punct:
            keep = pc.and_(
                keep, pc.match_substring_regex(vals, "[.!?\"']$"),
            )
        if markers:
            low = pc.utf8_lower(vals)
            for m in markers:
                keep = pc.and_(
                    keep, pc.invert(pc.match_substring(low, m)),
                )
        keep_np = pc.fill_null(keep, False).to_numpy(zero_copy_only=False)

        doc_idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), lens)
        kept_per_doc = (
            np.bincount(doc_idx[keep_np], minlength=t.num_rows)
            if keep_np.size else np.zeros(t.num_rows, dtype=np.int64)
        )
        new_offs = np.r_[0, np.cumsum(kept_per_doc)]
        la = pa.ListArray.from_arrays(
            pa.array(new_offs, pa.int32()),
            vals.filter(pa.array(keep_np)),
        )
        joined = pc.binary_join(la, sep)
        t = t.set_column(t.schema.get_field_index(text_col), text_col, joined)
        t = t.append_column("n_lines", pa.array(n_lines, pa.int64()))
        return t.append_column(
            "n_lines_kept", pa.array(kept_per_doc.astype(np.int64), pa.int64()),
        )

    return ds.map_batches(_f, batch_format="pyarrow")


def _split_segments(t: pa.Table, text_col: str, sep: str) -> pa.ListArray:
    """Exact-separator split (``string_split(text, sep)`` in DuckDB)."""
    parts = pc.split_pattern(t.column(text_col), pattern=sep)
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    return parts


def duplicated_segments(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    min_docs: int = 2,
):
    """(segment, n_docs) Dataset of segments occurring in ``min_docs`` or
    more distinct documents.

    Per batch, each document's segments are deduplicated locally
    (dictionary-encode + one lexsort), so exactly one (segment, doc) row
    per distinct pair enters the shuffle; a document lives in exactly one
    batch row, so a single ``groupby(segment).count()`` yields the
    distinct-document count — one exchange, never any document text
    beyond its distinct segments.
    """

    def _distinct_pairs(t: pa.Table) -> pa.Table:
        parts = _split_segments(t, text_col, sep)
        offs = np.asarray(parts.offsets)
        vals = parts.values
        lens = np.diff(offs)
        enc = vals.dictionary_encode()
        codes = np.asarray(enc.indices.to_numpy(zero_copy_only=False), dtype=np.int64)
        doc_idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), lens)
        if codes.size:
            order = np.lexsort((codes, doc_idx))
            dc, cc = doc_idx[order], codes[order]
            starts = np.r_[True, (dc[1:] != dc[:-1]) | (cc[1:] != cc[:-1])]
            keep_codes = cc[starts]
        else:
            keep_codes = codes
        segs = enc.dictionary.take(pa.array(keep_codes, pa.int64()))
        return pa.Table.from_arrays([segs], names=["segment"])

    from .relational import groupby_count

    counts = groupby_count(
        ds.select_columns([id_col, text_col]).map_batches(
            _distinct_pairs, batch_format="pyarrow",
        ),
        "segment", "n_docs",
    )

    def _thresh(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t.column("n_docs"), min_docs))

    return counts.map_batches(_thresh, batch_format="pyarrow")


def remove_duplicated_segments(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    min_docs: int = 2,
    victims=None,
):
    """Strip every occurrence of cross-document duplicated segments.

    ``victims`` defaults to :func:`duplicated_segments` on the same
    input.  Documents are never dropped — a fully-duplicated document
    comes back with empty text.  Segment order is preserved.

    Small victim tables broadcast (``ray.put`` once, one vectorized
    ``pc.is_in`` + list rebuild per batch — document text never
    shuffles); large ones run a bucketed anti-join over the exploded
    (doc, pos, segment) rows and a per-document rebuild, then re-attach
    by id — no driver materialization on that path.
    """
    if victims is None:
        victims = duplicated_segments(ds, text_col, id_col, sep, min_docs)
    victims = victims.materialize()
    n_victims = victims.count()
    if n_victims == 0:
        return ds

    if n_victims <= _BROADCAST_VICTIM_BUDGET:
        import ray

        chunks = [
            b.column("segment").combine_chunks()
            for b in victims.select_columns(["segment"]).iter_batches(
                batch_format="pyarrow",
            )
        ]
        victims_ref = ray.put(pa.concat_arrays(chunks))

        def _strip(t: pa.Table) -> pa.Table:
            vset = ray.get(victims_ref)
            parts = _split_segments(t, text_col, sep)
            offs = np.asarray(parts.offsets)
            vals = parts.values
            lens = np.diff(offs)
            doc_idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), lens)
            keep = pc.invert(
                pc.fill_null(pc.is_in(vals, value_set=vset), False),
            ).to_numpy(zero_copy_only=False)
            kept_per_doc = np.bincount(
                doc_idx[keep], minlength=t.num_rows,
            ) if keep.size else np.zeros(t.num_rows, dtype=np.int64)
            new_offs = np.r_[0, np.cumsum(kept_per_doc)]
            la = pa.ListArray.from_arrays(
                pa.array(new_offs, pa.int32()),
                vals.filter(pa.array(keep)),
            )
            joined = pc.binary_join(la, sep)
            return t.set_column(
                t.schema.get_field_index(text_col), text_col, joined,
            )

        return ds.map_batches(_strip, batch_format="pyarrow")

    # scale path: explode -> bucketed anti-join on segment -> rebuild per
    # document (ordered join) -> left-attach the rebuilt text back by id
    def _explode(t: pa.Table) -> pa.Table:
        parts = _split_segments(t, text_col, sep)
        offs = np.asarray(parts.offsets)
        lens = np.diff(offs)
        doc_ids = t.column(id_col)
        if isinstance(doc_ids, pa.ChunkedArray):
            doc_ids = doc_ids.combine_chunks()
        rep = doc_ids.take(
            pa.array(np.repeat(np.arange(t.num_rows, dtype=np.int64), lens)),
        )
        pos = np.concatenate(
            [np.arange(n, dtype=np.int64) for n in lens],
        ) if lens.size else np.array([], np.int64)
        return pa.Table.from_arrays(
            [rep, pa.array(pos, pa.int64()), parts.values],
            names=[id_col, "_pos", "segment"],
        )

    from ..struct.degree import bucketed_attach, bucketed_semi_join

    exploded = ds.select_columns([id_col, text_col]).map_batches(
        _explode, batch_format="pyarrow",
    )
    kept = bucketed_semi_join(exploded, "segment", victims, "segment", anti=True)

    def _rebuild(group: pa.Table) -> pa.Table:
        group = group.sort_by([(id_col, "ascending"), ("_pos", "ascending")])
        ids = group.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        codes = ids.dictionary_encode()
        idx = np.asarray(codes.indices.to_numpy(zero_copy_only=False))
        counts = np.bincount(idx, minlength=len(codes.dictionary))
        offsets = np.r_[0, np.cumsum(counts)]
        segs = group.column("segment")
        if isinstance(segs, pa.ChunkedArray):
            segs = segs.combine_chunks()
        la = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), segs)
        return pa.Table.from_arrays(
            [codes.dictionary, pc.binary_join(la, sep)],
            names=[id_col, "_clean"],
        )

    rebuilt = kept.groupby(id_col).map_groups(_rebuild, batch_format="pyarrow")

    # the bucketed joins key on strings (crc32 of utf8); ids may be ints
    def _rebuilt_key(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [pc.cast(t.column(id_col), pa.string()), t.column("_clean")],
            names=["_key", "_clean"],
        )

    def _tag(t: pa.Table) -> pa.Table:
        return t.append_column("_key", pc.cast(t.column(id_col), pa.string()))

    out = bucketed_attach(
        ds.map_batches(_tag, batch_format="pyarrow"),
        "_key",
        rebuilt.map_batches(_rebuilt_key, batch_format="pyarrow"),
        "_key",
        ["_clean"],
        how="left",
    )

    def _finish(t: pa.Table) -> pa.Table:
        clean = pc.fill_null(t.column("_clean"), "")
        t = t.set_column(t.schema.get_field_index(text_col), text_col, clean)
        return t.drop_columns(["_clean", "_key"])

    return out.map_batches(_finish, batch_format="pyarrow")
