"""Document chunking and sentence splitting — the reshape steps of a
training-data pipeline (fixed token windows for sequence packing, sentence
rows for alignment / filtering).

Both operators are pure per-batch ``map_batches`` transforms (no shuffle,
no driver materialization) and share the repo's SQL-reproducible
tokenizations so the driver oracles are exact:

* :func:`chunk_text` — whitespace tokens (``regexp_split_to_array(trim(t),
  '\\s+')``, same as ``add_token_counts``), windows of ``chunk`` tokens
  every ``stride`` tokens (overlapping when ``stride < chunk``), chunk
  text rebuilt with single spaces (``string_agg(tok,' ' ORDER BY pos)``).
* :func:`split_sentences` — splits on ``[.!?]+`` runs, trims each piece,
  drops empties, numbers the rest 1..n per document.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .lines import _split_words

__all__ = ["chunk_text", "split_sentences", "fim_split"]


def chunk_text(
    ds,
    chunk: int = 50,
    stride: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """One row per token window: (id, chunk_id, chunk, n_tokens).

    Window ``c`` covers token positions ``(c*stride, c*stride + chunk]``
    (1-based); windows start while ``c*stride < n_tokens``, so the last
    window may be short.  Each token lands in at most
    ``ceil(chunk/stride)`` windows — the expansion below loops over that
    small constant with vectorized numpy passes, never over rows.
    """
    if chunk <= 0 or stride <= 0:
        raise ValueError("chunk and stride must be positive")
    n_rep = -(-chunk // stride)  # ceil

    def _f(t: pa.Table) -> pa.Table:
        parts = _split_words(t, text_col)
        offs = np.asarray(parts.offsets)
        vals = parts.values
        lens = np.diff(offs)
        doc_idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), lens)
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        pos = np.arange(len(doc_idx), dtype=np.int64) - np.repeat(starts, lens) + 1

        tok_i, docs, cids = [], [], []
        base = (pos - 1) // stride
        for r in range(n_rep):
            c = base - r
            ok = (c >= 0) & (pos <= c * stride + chunk)
            if not ok.any():
                continue
            idx = np.flatnonzero(ok)
            tok_i.append(idx)
            docs.append(doc_idx[idx])
            cids.append(c[idx])
        ids = t.column(id_col).combine_chunks()
        if not tok_i:
            return pa.Table.from_arrays(
                [
                    pa.array([], ids.type), pa.array([], pa.int64()),
                    pa.array([], pa.string()), pa.array([], pa.int64()),
                ],
                names=[id_col, "chunk_id", "chunk", "n_tokens"],
            )
        tok_i = np.concatenate(tok_i)
        docs = np.concatenate(docs)
        cids = np.concatenate(cids)
        # group copies into (doc, chunk) runs ordered by token position
        order = np.lexsort((pos[tok_i], cids, docs))
        tok_i, docs, cids = tok_i[order], docs[order], cids[order]
        run = np.r_[True, (docs[1:] != docs[:-1]) | (cids[1:] != cids[:-1])]
        run_start = np.flatnonzero(run)
        run_len = np.diff(np.r_[run_start, len(docs)])
        taken = pc.take(vals, pa.array(tok_i))
        if isinstance(taken, pa.ChunkedArray):
            taken = taken.combine_chunks()
        chunk_lists = pa.ListArray.from_arrays(
            pa.array(np.r_[0, np.cumsum(run_len)], pa.int32()), taken,
        )
        return pa.Table.from_arrays(
            [
                pc.take(ids, pa.array(docs[run_start])),
                pa.array(cids[run_start], pa.int64()),
                pc.binary_join(chunk_lists, " "),
                pa.array(run_len, pa.int64()),
            ],
            names=[id_col, "chunk_id", "chunk", "n_tokens"],
        )

    return ds.map_batches(_f, batch_format="pyarrow")


def split_sentences(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    pattern: str = r"[.!?]+",
):
    """One row per sentence: (id, sent_id, sentence).

    Splits on every run matching ``pattern``, trims whitespace from each
    piece, drops pieces that trim to empty, and numbers the survivors
    1..n in document order — identical to the DuckDB idiom
    ``unnest(regexp_split_to_array(...))`` + trim + filter + row_number.
    """

    def _f(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern_regex(t.column(text_col), pattern=pattern)
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        offs = np.asarray(parts.offsets)
        vals = pc.utf8_trim_whitespace(parts.values)
        lens = np.diff(offs)
        doc_idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), lens)
        keep = pc.not_equal(vals, "").to_numpy(zero_copy_only=False)
        vals = vals.filter(pa.array(keep))
        doc_idx = doc_idx[keep]
        kept_lens = (
            np.bincount(doc_idx, minlength=t.num_rows)
            if len(doc_idx)
            else np.zeros(t.num_rows, dtype=np.int64)
        )
        starts = np.concatenate(([0], np.cumsum(kept_lens)[:-1]))
        sent_id = (
            np.arange(len(doc_idx), dtype=np.int64)
            - np.repeat(starts, kept_lens) + 1
        )
        ids = t.column(id_col).combine_chunks()
        return pa.Table.from_arrays(
            [
                pc.take(ids, pa.array(doc_idx)),
                pa.array(sent_id, pa.int64()),
                vals,
            ],
            names=[id_col, "sent_id", "sentence"],
        )

    return ds.map_batches(_f, batch_format="pyarrow")


def fim_split(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 16,
):
    """Fill-in-the-middle (FIM) transformation — the code/LLM
    training-data rewrite (Bavarian et al. 2022) that turns a document
    into ``(prefix, middle, suffix)`` so the model learns infilling:
    two md5-derived cut points (``H1 = md5(id)``, ``H2 = md5(id|2)``,
    60-bit hex prefixes) pick ``cut1 = 1 + H1 % (n // 2)`` and ``cut2 =
    cut1 + H2 % (n - cut1 + 1)`` over the character length ``n`` —
    deterministic per document, layout/resume-invariant, and exactly
    reproducible in SQL (``substr`` + the shared hex-to-int idiom).
    Documents shorter than ``min_len`` characters (or null) emit the
    whole text as ``fim_prefix`` with empty middle/suffix.

    One stateless pass; the per-row md5 is the same unavoidable digest
    as the sampling gates.  Character (codepoint) arithmetic matches
    DuckDB ``substr``/``length`` on the corpus's text.
    """
    import hashlib

    if min_len < 2:
        raise ValueError(
            "fim_split: min_len must be >= 2 (cut-point arithmetic needs"
            " n // 2 >= 1)",
        )

    def _h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)  # noqa: S324

    def _f(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        texts = t.column(text_col).to_pylist()
        pre, mid, suf = [], [], []
        for i, txt in zip(ids, texts):
            if txt is None or len(txt) < min_len:
                pre.append(txt if txt is not None else "")
                mid.append("")
                suf.append("")
                continue
            n = len(txt)
            cut1 = 1 + _h60(str(i)) % (n // 2)
            cut2 = cut1 + _h60(f"{i}|2") % (n - cut1 + 1)
            # 1-based [1, cut1) / [cut1, cut2) / [cut2, n]
            pre.append(txt[:cut1 - 1])
            mid.append(txt[cut1 - 1:cut2 - 1])
            suf.append(txt[cut2 - 1:])
        out = pa.Table.from_arrays(
            [t.column(id_col),
             pa.array(pre, pa.string()),
             pa.array(mid, pa.string()),
             pa.array(suf, pa.string())],
            names=[id_col, "fim_prefix", "fim_middle", "fim_suffix"],
        )
        return out

    return ds.select_columns([id_col, text_col]).map_batches(
        _f, batch_format="pyarrow",
    )
