"""Text analysis operators over a documents table (doc_id, text, ...).

All hot-path work is vectorized via ``pyarrow.compute`` string kernels
inside ``map_batches`` — no Python loop over rows except where a true
per-row scalar (rolling hash) is required.
"""

from __future__ import annotations

import hashlib
from typing import Dict, List, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "add_token_counts",
    "add_quality_stats",
    "add_lang_id",
    "add_fingerprint",
    "add_fingerprint_md5",
    "add_quality_score",
    "gopher_rules",
    "add_bpe_token_counts",
    "STOPWORDS",
    "BPE_TOKEN_PATTERN",
    "exact_dedup",
    "token_count_partials",
    "word_frequencies",
    "vocab_topk",
    "term_frequencies",
    "tfidf_topk",
    "inverted_index",
    "type_token_ratio",
    "normalize_text",
    "source_overlap",
    "add_readability",
    "ngram_topk",
    "LANG_MARKERS",
]

#: language -> marker substrings counted on the lowercased, space-padded text.
#: Deliberately simple so a SQL oracle can reproduce it exactly.
LANG_MARKERS = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " die "],
    "fr": [" le ", " et ", " les "],
}


def add_token_counts(ds, text_col: str = "text", out_col: str = "n_tokens"):
    """Whitespace token count (== duckdb len(regexp_split_to_array(trim(t),'\\s+')))."""

    def _f(t: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim_whitespace(t.column(text_col))
        parts = pc.split_pattern_regex(trimmed, pattern=r"\s+")
        counts = pc.list_value_length(parts).cast(pa.int64())
        return t.append_column(out_col, counts)

    return ds.map_batches(_f, batch_format="pyarrow")


def add_quality_stats(ds, text_col: str = "text"):
    """Quality-scoring columns: n_chars, n_punct (sentence enders), n_digits.

    Integer-valued so an oracle compares exactly.
    """

    def _f(t: pa.Table) -> pa.Table:
        text = t.column(text_col)
        for existing in ("n_chars", "n_punct", "n_digits"):
            if existing in t.column_names:
                t = t.drop_columns([existing])
        t = t.append_column("n_chars", pc.utf8_length(text).cast(pa.int64()))
        t = t.append_column(
            "n_punct", pc.count_substring_regex(text, r"[.!?]").cast(pa.int64()),
        )
        t = t.append_column(
            "n_digits", pc.count_substring_regex(text, r"[0-9]").cast(pa.int64()),
        )
        return t

    return ds.map_batches(_f, batch_format="pyarrow")


def add_lang_id(ds, text_col: str = "text"):
    """n-gram-marker language ID with a deterministic tie rule (en > de > fr)."""

    def _f(t: pa.Table) -> pa.Table:
        padded = pc.binary_join_element_wise(
            " ", pc.utf8_lower(t.column(text_col)), " ", "",
        )
        counts = {}
        for lang, markers in LANG_MARKERS.items():
            total = None
            for m in markers:
                c = pc.count_substring(padded, m)
                total = c if total is None else pc.add(total, c)
            counts[lang] = total.cast(pa.int64())
        en, de, fr = counts["en"], counts["de"], counts["fr"]
        pred = pc.if_else(
            pc.and_(pc.greater_equal(en, de), pc.greater_equal(en, fr)),
            "en",
            pc.if_else(pc.greater_equal(de, fr), "de", "fr"),
        )
        for lang in ("en", "de", "fr"):
            t = t.append_column("hits_" + lang, counts[lang])
        return t.append_column("lang_pred", pred)

    return ds.map_batches(_f, batch_format="pyarrow")


_FP_BASE = np.uint64(257)


def _fingerprint(text: str) -> int:
    """Polynomial rolling hash over the normalized word stream.

    Vectorized: h = Σ byte_i · BASE^(n−1−i) with natural uint64 wraparound
    (one cumprod + dot product instead of a per-character Python loop).
    Returned as a signed 64-bit value so it round-trips through an Arrow
    int64 column.
    """
    stream = (" ".join(text.lower().split()) + " ").encode("utf8")
    b = np.frombuffer(stream, dtype=np.uint8).astype(np.uint64)
    with np.errstate(over="ignore"):
        powers = np.full(b.size, _FP_BASE, dtype=np.uint64)
        powers[0] = 1
        powers = np.cumprod(powers)[::-1]  # BASE^(n-1) ... BASE^0
        h = np.uint64(np.dot(b, powers))
    return int(h.astype(np.int64))


def add_fingerprint(ds, text_col: str = "text", out_col: str = "fingerprint"):
    def _f(t: pa.Table) -> pa.Table:
        vals = [_fingerprint(v) for v in t.column(text_col).to_pylist()]
        return t.append_column(out_col, pa.array(vals, pa.int64()))

    return ds.map_batches(_f, batch_format="pyarrow")


#: common-word markers for the stopword-ratio quality signal; space-padded
#: substring counts so a SQL oracle reproduces the numbers exactly
STOPWORDS = ["the", "and", "of", "to", "in", "a", "is", "that", "for", "it"]

#: BPE-ish pretokenizer (ASCII approximation of the GPT-2 pattern, written
#: in portable RE2 so pyarrow and DuckDB count identical matches):
#: letter runs | digit runs | non-alnum-non-space runs
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def add_quality_score(ds, text_col: str = "text"):
    """Gopher-style quality signals: stopword hits + ratio flags.

    ``n_stopwords`` counts space-padded stopword occurrences on the
    lowercased text; ``quality_ok`` = has ≥2 stopword hits AND ≥50 chars
    AND digit fraction < 20% (all integer/boolean so the DuckDB oracle
    compares exactly).
    """

    def _f(t: pa.Table) -> pa.Table:
        padded = pc.binary_join_element_wise(
            " ", pc.utf8_lower(t.column(text_col)), " ", "",
        )
        total = None
        for w in STOPWORDS:
            c = pc.count_substring(padded, " {} ".format(w))
            total = c if total is None else pc.add(total, c)
        n_stop = total.cast(pa.int64())
        n_chars = pc.utf8_length(t.column(text_col)).cast(pa.int64())
        n_digits = pc.count_substring_regex(t.column(text_col), r"[0-9]").cast(pa.int64())
        ok = pc.and_(
            pc.and_(
                pc.greater_equal(n_stop, 2),
                pc.greater_equal(n_chars, 50),
            ),
            pc.less(pc.multiply(n_digits, 5), n_chars),
        )
        t = t.append_column("n_stopwords", n_stop)
        return t.append_column("quality_ok", ok)

    return ds.map_batches(_f, batch_format="pyarrow")


def _count_matching_per_list(lst: pa.Array, pattern: str) -> np.ndarray:
    """Per-row count of list elements matching an RE2 pattern.

    Flatten once, match once (vectorized), then a cumsum-gather back to
    row granularity — no Python loop over rows or elements.
    """
    if isinstance(lst, pa.ChunkedArray):
        lst = lst.combine_chunks()
    flat = pc.list_flatten(lst)
    hits = pc.match_substring_regex(flat, pattern)
    arr = hits.to_numpy(zero_copy_only=False).astype(np.int64)
    lengths = pc.list_value_length(lst).to_numpy(zero_copy_only=False)
    cum = np.concatenate([[0], np.cumsum(lengths, dtype=np.int64)])
    csum = np.concatenate([[0], np.cumsum(arr, dtype=np.int64)])
    return csum[cum[1:]] - csum[cum[:-1]]


def gopher_rules(
    ds,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100000,
    min_stopwords: int = 2,
):
    """Gopher-style repetition/quality rule filter (Rae et al. 2021,
    "Scaling Language Models", public heuristics), integer-exact so a
    DuckDB oracle reproduces every column bit-for-bit:

    - ``r_words``:      ``min_words <= n_words <= max_words``
    - ``r_mean_len``:   mean word length in [3, 10] chars — compared as
      ``3·n_words <= n_word_chars <= 10·n_words`` (no float division)
    - ``r_alpha``:      ≥80% of words contain an alphabetic char
      (``5·n_alpha_words >= 4·n_words``)
    - ``r_bullet``:     ≤10% of lines start with a bullet (``-``/``*``)
    - ``r_ellipsis``:   ≤30% of lines end with ``...``
    - ``r_stop``:       ≥``min_stopwords`` distinct :data:`STOPWORDS`
      present (space-padded substring presence)
    - ``gopher_ok``:    AND of all six

    Deviations from the paper, documented: the symbol-ratio rule uses
    the ASCII bullet/ellipsis forms only (no codec issues across
    engines), and the stopword list is :data:`STOPWORDS` (shared with
    :func:`add_quality_score`).  One vectorized ``map_batches`` pass —
    splits, regex matches and presence tests are Arrow kernels; the
    per-row folds are cumsum gathers.
    """

    def _f(t: pa.Table) -> pa.Table:
        text = t.column(text_col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        text = pc.fill_null(text, "")
        trimmed = pc.utf8_trim_whitespace(text)
        words = pc.split_pattern_regex(trimmed, pattern=r"\s+")
        n_words = pc.list_value_length(words).cast(pa.int64())
        n_word_chars = pc.utf8_length(
            pc.replace_substring_regex(text, r"\s", ""),
        ).cast(pa.int64())
        n_alpha = pa.array(
            _count_matching_per_list(words, r"[A-Za-z]"), pa.int64(),
        )
        lines = pc.split_pattern(text, "\n")
        n_lines = pc.list_value_length(lines).cast(pa.int64())
        n_bullet = pa.array(
            _count_matching_per_list(lines, r"^\s*[-*]"), pa.int64(),
        )
        n_ellipsis = pa.array(
            _count_matching_per_list(lines, r"\.\.\.\s*$"), pa.int64(),
        )
        padded = pc.binary_join_element_wise(" ", pc.utf8_lower(text), " ", "")
        n_stop = None
        for w in STOPWORDS:
            present = pc.cast(
                pc.greater(pc.count_substring(padded, " {} ".format(w)), 0),
                pa.int64(),
            )
            n_stop = present if n_stop is None else pc.add(n_stop, present)

        r_words = pc.and_(
            pc.greater_equal(n_words, min_words),
            pc.less_equal(n_words, max_words),
        )
        r_mean_len = pc.and_(
            pc.less_equal(pc.multiply(n_words, 3), n_word_chars),
            pc.less_equal(n_word_chars, pc.multiply(n_words, 10)),
        )
        r_alpha = pc.greater_equal(
            pc.multiply(n_alpha, 5), pc.multiply(n_words, 4),
        )
        r_bullet = pc.less_equal(pc.multiply(n_bullet, 10), n_lines)
        r_ellipsis = pc.less_equal(
            pc.multiply(n_ellipsis, 10), pc.multiply(n_lines, 3),
        )
        r_stop = pc.greater_equal(n_stop, min_stopwords)
        ok = r_words
        for r in (r_mean_len, r_alpha, r_bullet, r_ellipsis, r_stop):
            ok = pc.and_(ok, r)
        cols = {
            "n_words": n_words,
            "n_word_chars": n_word_chars,
            "n_alpha_words": n_alpha,
            "n_lines": n_lines,
            "n_bullet_lines": n_bullet,
            "n_ellipsis_lines": n_ellipsis,
            "n_stop_present": n_stop,
            "r_words": r_words,
            "r_mean_len": r_mean_len,
            "r_alpha": r_alpha,
            "r_bullet": r_bullet,
            "r_ellipsis": r_ellipsis,
            "r_stop": r_stop,
            "gopher_ok": ok,
        }
        for name, arr in cols.items():
            if name in t.column_names:
                t = t.drop_columns([name])
            t = t.append_column(name, arr)
        return t

    return ds.map_batches(_f, batch_format="pyarrow")


def add_bpe_token_counts(ds, text_col: str = "text", out_col: str = "n_bpe_tokens"):
    """BPE-ish pretokenizer count: matches of ``BPE_TOKEN_PATTERN``
    (letters | digits | punct runs) — one RE2 pass, reproducible in SQL
    via ``len(regexp_extract_all(text, pattern))``."""

    def _f(t: pa.Table) -> pa.Table:
        counts = pc.count_substring_regex(
            t.column(text_col), BPE_TOKEN_PATTERN,
        ).cast(pa.int64())
        return t.append_column(out_col, counts)

    return ds.map_batches(_f, batch_format="pyarrow")


def add_fingerprint_md5(ds, text_col: str = "text", out_col: str = "fingerprint_md5"):
    """SQL-reproducible fingerprint: md5 hex of the lowercased,
    whitespace-normalized text.

    Exactly ``md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))`` in
    DuckDB — normalization uses RE2 ``\\s`` semantics (via ``re``), not
    ``str.split``'s wider Unicode whitespace set, so the oracle matches
    byte-for-byte.
    """
    import re

    ws = re.compile(r"\s+")

    def _f(t: pa.Table) -> pa.Table:
        vals = [
            hashlib.md5(  # noqa: S324
                ws.sub(" ", v.lower()).strip(" ").encode("utf8"),
            ).hexdigest()
            for v in t.column(text_col).to_pylist()
        ]
        return t.append_column(out_col, pa.array(vals, pa.string()))

    return ds.map_batches(_f, batch_format="pyarrow")


def token_count_partials(ds, text_col: str = "text"):
    """Per-batch word-count partials: one ``(word, n)`` row per distinct
    word per batch (one ``dictionary_encode`` + bincount, no exchange).

    The shared first stage of :func:`word_frequencies` and the Count-Min
    sketch (:func:`pybel_ray.ops.sketch.cms_from_partials`): downstream
    consumers either merge with one ``groupby(word)`` exchange (exact
    counts) or fold into a fixed-size sketch (no exchange at all).
    """

    def _partial(t: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim_whitespace(t.column(text_col))
        parts = pc.split_pattern_regex(trimmed, pattern=r"\s+")
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        enc = parts.values.dictionary_encode()
        idx = enc.indices.to_numpy(zero_copy_only=False)
        counts = np.bincount(idx, minlength=len(enc.dictionary))
        return pa.Table.from_arrays(
            [enc.dictionary, pa.array(counts, pa.int64())],
            names=["word", "n"],
        )

    return ds.select_columns([text_col]).map_batches(
        _partial, batch_format="pyarrow",
    )


def word_frequencies(ds, text_col: str = "text"):
    """Corpus-wide word frequencies: one (word, n) row per distinct word.

    The canonical partial-aggregate shape for a 100 TB corpus: each batch
    counts its own words locally (:func:`token_count_partials`), so the
    ``groupby`` exchange moves one row per *distinct word per batch* —
    orders of magnitude less than one row per token.  Equivalent SQL:
    ``SELECT word, count(*) FROM unnest(split(text)) GROUP BY word``.
    """
    from .relational import groupby_agg

    partials = token_count_partials(ds, text_col)
    return groupby_agg(partials, "word", {"n": ("sum", "n")})


def vocab_topk(ds, k: int = 100, text_col: str = "text"):
    """Top-``k`` most frequent words (ties broken by word, so the result
    is deterministic and a SQL oracle compares exactly)."""
    from .relational import topk

    freqs = word_frequencies(ds, text_col)
    return topk(freqs, "n", k, tie_keys=["word"])


#: df tables at or below this many distinct terms broadcast via ray.put;
#: above it the df attach becomes a bucketed join on the term
_DF_BROADCAST_BUDGET = 2_000_000


def term_frequencies(ds, text_col: str = "text", id_col: str = "doc_id"):
    """One (doc_id, word, tf) row per distinct (document, word) pair.

    Per batch: one ``dictionary_encode`` + one lexsort over the flat
    word stream — run lengths are the term frequencies; no Python loop.
    """

    def _tf(t: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim_whitespace(t.column(text_col))
        parts = pc.split_pattern_regex(trimmed, pattern=r"\s+")
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        offs = np.asarray(parts.offsets)
        lens = np.diff(offs)
        enc = parts.values.dictionary_encode()
        codes = np.asarray(enc.indices.to_numpy(zero_copy_only=False), np.int64)
        doc_idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), lens)
        if not codes.size:
            return pa.Table.from_arrays(
                [t.column(id_col).slice(0, 0), pa.array([], pa.string()),
                 pa.array([], pa.int64())],
                names=[id_col, "word", "tf"],
            )
        order = np.lexsort((codes, doc_idx))
        dc, cc = doc_idx[order], codes[order]
        starts = np.flatnonzero(np.r_[True, (dc[1:] != dc[:-1]) | (cc[1:] != cc[:-1])])
        tf = np.diff(np.r_[starts, dc.size])
        ids = t.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.Table.from_arrays(
            [
                ids.take(pa.array(dc[starts], pa.int64())),
                enc.dictionary.take(pa.array(cc[starts], pa.int64())),
                pa.array(tf, pa.int64()),
            ],
            names=[id_col, "word", "tf"],
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        _tf, batch_format="pyarrow",
    )


def type_token_ratio(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Lexical-diversity quality feature: per document, token count,
    distinct-token count, and their ratio in integer micros
    (``n_distinct * 1e6 // n_tokens`` — exact int64, so the SQL
    ``count(DISTINCT)`` oracle matches bit-for-bit).

    Fully vectorized (the :func:`term_frequencies` lexsort-run-length
    kernel, reduced per doc), zero shuffle — one output row per input
    row."""

    def _ttr(t: pa.Table) -> pa.Table:
        # null-text docs are dropped (the SQL unnest oracle emits no
        # row for them; the engine must agree)
        t = t.filter(pc.is_valid(t.column(text_col)))
        trimmed = pc.utf8_trim_whitespace(t.column(text_col))
        parts = pc.split_pattern_regex(trimmed, pattern=r"\s+")
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        offs = np.asarray(parts.offsets)
        lens = np.diff(offs)
        enc = parts.values.dictionary_encode()
        codes = np.asarray(enc.indices.to_numpy(zero_copy_only=False), np.int64)
        doc_idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), lens)
        if codes.size:
            order = np.lexsort((codes, doc_idx))
            dc, cc = doc_idx[order], codes[order]
            runs = np.r_[True, (dc[1:] != dc[:-1]) | (cc[1:] != cc[:-1])]
            distinct = np.bincount(
                dc[runs], minlength=t.num_rows,
            ).astype(np.int64)
        else:
            distinct = np.zeros(t.num_rows, np.int64)
        n_tokens = lens.astype(np.int64)
        ttr = np.where(
            n_tokens > 0, distinct * 1_000_000 // np.maximum(n_tokens, 1), 0,
        )
        ids = t.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.Table.from_arrays(
            [ids, pa.array(n_tokens), pa.array(distinct), pa.array(ttr)],
            names=[id_col, "n_tokens", "n_distinct", "ttr_e6"],
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        _ttr, batch_format="pyarrow",
    )


def normalize_text(
    ds, text_col: str = "text", out_col: str = "norm_text",
    lowercase: bool = True, form: str = "NFC",
):
    """Unicode text normalization (the hygiene pass before hashing /
    dedup so visually identical strings collide): optional lowercase,
    then NFC (or NFKC/NFD/NFKD) normalize, collapse whitespace runs,
    trim.  Lowercase runs FIRST (case mapping can change composition).

    Normalization detail: this pyarrow's ``utf8_normalize`` does not
    actually compose NFC (combining marks survive), so ASCII rows —
    already normalized by construction — take the vectorized path and
    only non-ASCII rows fall back to per-row ``unicodedata.normalize``
    (webtext corpora are overwhelmingly ASCII, so the Python step
    touches a thin tail).  DuckDB's ``nfc_normalize(lower(..))`` +
    ``regexp_replace(.., 'g')`` reproduce the whole pass exactly."""
    import unicodedata

    def _f(t: pa.Table) -> pa.Table:
        txt = t.column(text_col)
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        if lowercase:
            txt = pc.utf8_lower(txt)
        non_ascii = pc.fill_null(pc.invert(pc.string_is_ascii(txt)), False)
        if pc.any(non_ascii).as_py():
            # normalize ONLY the non-ASCII rows and scatter them back;
            # the (typically dominant) ASCII rows stay zero-copy
            idx = np.flatnonzero(non_ascii.to_numpy(zero_copy_only=False))
            tail = txt.take(pa.array(idx)).to_pylist()
            fixed = pa.array(
                [
                    unicodedata.normalize(form, v) if v is not None else None
                    for v in tail
                ],
                pa.string(),
            )
            txt = pc.replace_with_mask(txt, non_ascii, fixed)
        txt = pc.replace_substring_regex(txt, r"\s+", " ")
        txt = pc.utf8_trim_whitespace(txt)
        if out_col in t.column_names:
            t = t.drop_columns([out_col])
        return t.append_column(out_col, txt)

    return ds.map_batches(_f, batch_format="pyarrow")


def source_overlap(
    ds, text_col: str = "text", strata_col: str = "source",
    unit: str = "text",
):
    """Cross-source contamination matrix: for every source pair
    ``(src_a, src_b)`` with ``src_a < src_b``, how many distinct units
    appear in both — ``unit='text'`` counts shared full-document md5s
    (the duplicate-content audit run before mixing corpora),
    ``unit='word'`` counts shared vocabulary (lexical overlap).

    Shape: texts reduce to md5s in the first pass (text never
    shuffles); one groupby makes (hash, source) distinct; the
    distributed self :func:`~pybel_ray.ops.relational.equi_join` on
    the hash co-locates equal digests (bucket exchange, never the
    driver), and a partial-count pass per source pair feeds the final
    tiny groupby.  Per-hash group size is bounded by the number of
    sources."""
    import hashlib

    from pybel_ray.ops.relational import equi_join

    if unit not in ("text", "word"):
        raise ValueError(unit)

    def _hash_pairs(t: pa.Table) -> pa.Table:
        txt = t.column(text_col)
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        src = t.column(strata_col)
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        seen = set()
        hs, ss = [], []
        for v, s in zip(txt.to_pylist(), src.to_pylist()):
            if v is None or s is None:
                continue
            h = hashlib.md5(v.encode("utf8")).hexdigest()  # noqa: S324
            if (h, s) not in seen:
                seen.add((h, s))
                hs.append(h)
                ss.append(s)
        return pa.Table.from_arrays(
            [pa.array(hs, pa.string()), pa.array(ss, pa.string())],
            names=["h", strata_col],
        )

    def _word_pairs(t: pa.Table) -> pa.Table:
        # vectorized (word, source) local distinct: run lengths over
        # the lexsorted (source_idx, word_code) stream
        keep = pc.and_(
            pc.is_valid(t.column(text_col)),
            pc.is_valid(t.column(strata_col)),
        )
        t = t.filter(keep)
        trimmed = pc.utf8_trim_whitespace(t.column(text_col))
        parts = pc.split_pattern_regex(trimmed, pattern=r"\s+")
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        lens = np.diff(np.asarray(parts.offsets))
        enc = parts.values.dictionary_encode()
        codes = np.asarray(enc.indices.to_numpy(zero_copy_only=False), np.int64)
        src = t.column(strata_col)
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        senc = src.dictionary_encode()
        scodes = np.repeat(
            np.asarray(senc.indices.to_numpy(zero_copy_only=False), np.int64),
            lens,
        )
        if not codes.size:
            return pa.Table.from_arrays(
                [pa.array([], pa.string()), pa.array([], pa.string())],
                names=["h", strata_col],
            )
        order = np.lexsort((codes, scodes))
        sc, cc = scodes[order], codes[order]
        starts = np.flatnonzero(
            np.r_[True, (sc[1:] != sc[:-1]) | (cc[1:] != cc[:-1])],
        )
        return pa.Table.from_arrays(
            [
                enc.dictionary.take(pa.array(cc[starts], pa.int64())),
                senc.dictionary.take(pa.array(sc[starts], pa.int64())),
            ],
            names=["h", strata_col],
        )

    local = ds.select_columns([text_col, strata_col]).map_batches(
        _hash_pairs if unit == "text" else _word_pairs,
        batch_format="pyarrow",
    )

    def _first(g: pa.Table) -> pa.Table:
        return g.slice(0, 1)

    distinct = local.groupby(["h", strata_col]).map_groups(
        _first, batch_format="pyarrow",
    )
    joined = equi_join(distinct, distinct, on="h")
    right_col = strata_col + "_r"

    def _pair_partial(t: pa.Table) -> pa.Table:
        a = t.column(strata_col)
        if isinstance(a, pa.ChunkedArray):
            a = a.combine_chunks()
        b = t.column(right_col)
        if isinstance(b, pa.ChunkedArray):
            b = b.combine_chunks()
        keep = pc.less(a, b)
        a, b = a.filter(keep), b.filter(keep)
        from pybel_ray.ops._kernels import runlength_distinct_counts

        take, cnt = runlength_distinct_counts([a, b])
        return pa.Table.from_arrays(
            [pc.take(a, take), pc.take(b, take), pa.array(cnt, pa.int64())],
            names=["src_a", "src_b", "n_shared"],
        )

    partial = joined.map_batches(_pair_partial, batch_format="pyarrow")
    merged = partial.groupby(["src_a", "src_b"]).sum("n_shared")
    return merged.map_batches(
        lambda t: t.rename_columns(["src_a", "src_b", "n_shared"]),
        batch_format="pyarrow",
    )


def tfidf_topk(ds, k=5, text_col: str = "text", id_col: str = "doc_id"):
    """Top-``k`` TF-IDF terms per document: ``tf * ln(N / df)``.
    ``k=None`` returns every scored (doc, word, tfidf) row unranked
    (callers that re-quantize the score before ranking skip the
    redundant global sort).

    tf rows come from :func:`term_frequencies` (already one row per
    distinct pair, so df is a plain ``groupby(word).count()``); the df
    table is broadcast when small (≤ ``_DF_BROADCAST_BUDGET`` terms),
    else attached with a bucketed join on the term.  The final head is
    :func:`~pybel_ray.ops.relational.topk_per_group`, ties broken by
    word, so a SQL window oracle compares exactly.
    """
    import ray

    from .relational import groupby_count, topk_per_group

    n_docs = ds.count()
    tf = term_frequencies(ds, text_col, id_col).materialize()
    df = groupby_count(tf, "word", "df").materialize()

    if df.count() <= _DF_BROADCAST_BUDGET:
        chunks = []
        for b in df.iter_batches(batch_format="pyarrow"):
            chunks.append(b)
        df_table = pa.concat_tables(chunks)
        df_ref = ray.put(df_table)

        def _score(t: pa.Table) -> pa.Table:
            lkp = ray.get(df_ref)
            idx = pc.index_in(t.column("word"), value_set=lkp.column("word"))
            dfv = pc.take(lkp.column("df").combine_chunks(), idx)
            score = t.column("tf").to_numpy(zero_copy_only=False) * np.log(
                n_docs / dfv.to_numpy(zero_copy_only=False).astype(np.float64),
            )
            return t.append_column("tfidf", pa.array(score, pa.float64()))

        scored = tf.map_batches(_score, batch_format="pyarrow")
    else:
        from ..struct.degree import bucketed_attach

        joined = bucketed_attach(tf, "word", df, "word", ["df"], how="left")

        def _score(t: pa.Table) -> pa.Table:
            score = t.column("tf").to_numpy(zero_copy_only=False) * np.log(
                n_docs / t.column("df").to_numpy(zero_copy_only=False).astype(np.float64),
            )
            t = t.append_column("tfidf", pa.array(score, pa.float64()))
            return t.drop_columns(["df"])

        scored = joined.map_batches(_score, batch_format="pyarrow")

    if k is None:
        return scored
    return topk_per_group(scored, id_col, "tfidf", k, tie_keys=["word"])


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Exact text dedup: per text, keep min(id) + copy count.

    Hash-partition + per-group first (SURVEY.md §2.8): texts are md5-hashed
    inside the batch so the groupby shuffle moves 16-byte keys + ids, never
    full documents.
    """

    def _hash(t: pa.Table) -> pa.Table:
        hashes = [
            hashlib.md5(v.encode("utf8")).hexdigest()  # noqa: S324
            for v in t.column(text_col).to_pylist()
        ]
        return pa.Table.from_arrays(
            [pa.array(hashes), t.column(id_col)],
            names=["text_hash", id_col],
        )

    from .relational import groupby_agg

    hashed = ds.map_batches(_hash, batch_format="pyarrow")
    out = groupby_agg(
        hashed, "text_hash",
        {"doc_id": ("min", id_col), "n_copies": ("count", id_col)},
    )
    return out.drop_columns(["text_hash"])


def inverted_index(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
    max_df=None,
):
    """Inverted index: one ``(word, df, postings)`` row per word, where
    ``postings`` is the comma-joined list of doc ids sorted ascending and
    ``df`` is the document frequency.

    Shape: :func:`term_frequencies` already emits exactly one row per
    distinct (document, word) pair — each document lives in one batch, so
    per-batch distinct IS global distinct — then ONE ``groupby(word)``
    exchange builds each posting list vectorized (numpy sort + join).
    ``min_df`` / ``max_df`` gate the output: at corpus scale stopword
    posting lists are result-sized (the documented per-group co-location
    caveat), so callers cap ``max_df`` to keep every group
    worker-resident; the filter runs inside the group so dropped lists
    are never concatenated.  SQL equivalent: ``string_agg(doc_id, ','
    ORDER BY doc_id)`` grouped by word.
    """
    tf = term_frequencies(ds, text_col, id_col).select_columns(
        ["word", id_col],
    )
    empty = pa.Table.from_arrays(
        [pa.array([], pa.string()), pa.array([], pa.int64()),
         pa.array([], pa.string())],
        names=["word", "df", "postings"],
    )

    def _postings(g: pa.Table) -> pa.Table:
        df = g.num_rows
        if df < min_df or (max_df is not None and df > max_df):
            return empty
        ids = np.sort(g.column(id_col).to_numpy(zero_copy_only=False))
        return pa.Table.from_arrays(
            [
                g.column("word").slice(0, 1),
                pa.array([df], pa.int64()),
                pa.array([",".join(map(str, ids))], pa.string()),
            ],
            names=["word", "df", "postings"],
        )

    return tf.groupby("word").map_groups(_postings, batch_format="pyarrow")


def add_readability(ds, text_col: str = "text"):
    """Flesch reading-ease score per document in exact integer
    milli-points, from three SQL-reproducible RE2 counts:

    * ``words``      — non-overlapping ``\\S+`` matches,
    * ``sentences``  — ``max(1, count of [.!?]+ runs)``,
    * ``syllables``  — vowel-group runs ``[aeiouy]+`` in the lowercased
      text (the standard cheap syllable heuristic).

    ``flesch_e3 = 206835 - (1015*words)//sentences
    - (84600*syllables)//words`` — integer floor divisions over positive
    counts, so DuckDB ``//`` reproduces every value bit-for-bit (the
    float formula times 1000, each ratio floored once).  ``words == 0``
    (or null text) yields a null score.  Zero shuffle; three vectorized
    ``count_substring_regex`` passes per batch.
    """

    def _f(t: pa.Table) -> pa.Table:
        txt = t.column(text_col)
        words = pc.count_substring_regex(txt, r"\S+")
        sents = pc.count_substring_regex(txt, r"[.!?]+")
        syll = pc.count_substring_regex(pc.utf8_lower(txt), r"[aeiouy]+")
        w = words.to_numpy(zero_copy_only=False).astype(np.float64)
        s = sents.to_numpy(zero_copy_only=False).astype(np.float64)
        y = syll.to_numpy(zero_copy_only=False).astype(np.float64)
        null = ~np.isfinite(w) | (w == 0)
        wi = np.where(null, 1, w).astype(np.int64)
        si = np.maximum(np.where(np.isfinite(s), s, 0), 1).astype(np.int64)
        yi = np.where(np.isfinite(y), y, 0).astype(np.int64)
        score = 206835 - (1015 * wi) // si - (84600 * yi) // wi
        out = t.append_column("words", pc.cast(words, pa.int64()))
        out = out.append_column(
            "sentences", pa.array(si, pa.int64(),
                                  mask=~np.isfinite(w)),
        )
        out = out.append_column("syllables", pc.cast(syll, pa.int64()))
        return out.append_column(
            "flesch_e3", pa.array(score, pa.int64(), mask=null),
        )

    return ds.map_batches(_f, batch_format="pyarrow")


def ngram_topk(ds, n: int = 3, k: int = 50, text_col: str = "text"):
    """Top-``k`` most frequent word ``n``-grams corpus-wide (ties broken
    by gram) — the phrase-mining / boilerplate-discovery counterpart of
    :func:`vocab_topk`, over the SAME ``\\s+``-on-trimmed tokenization.

    Per batch: one vectorized split, adjacent-token joins shifted
    ``n-1`` ways (grams never cross a document boundary), then
    run-length partial counts — so the ``groupby(gram)`` exchange moves
    one row per distinct gram per batch, and only ``k`` rows leave the
    final sort.  Equivalent SQL: positional self-joins over
    ``unnest(arr)`` + ``unnest(range(...))``.
    """
    from ._kernels import runlength_distinct_counts
    from .relational import groupby_agg, topk

    def _partial(t: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim_whitespace(t.column(text_col))
        parts = pc.split_pattern_regex(trimmed, pattern=r"\s+")
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        toks = parts.values
        offsets = parts.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        total = len(toks)
        empty = pa.Table.from_arrays(
            [pa.array([], pa.string()), pa.array([], pa.int64())],
            names=["gram", "n"],
        )
        if total < n:
            return empty
        # doc index per token position; a gram starting at p is valid
        # iff position p+n-1 belongs to the same document
        lengths = np.diff(offsets)
        docidx = np.repeat(np.arange(len(lengths)), lengths)
        valid = docidx[: total - n + 1] == docidx[n - 1:]
        if not valid.any():
            return empty
        shifts = [toks.slice(j, total - n + 1) for j in range(n)]
        grams = shifts[0]
        for s in shifts[1:]:
            grams = pc.binary_join_element_wise(grams, s, " ")
        grams = grams.filter(pa.array(valid))
        take, counts = runlength_distinct_counts([grams])
        return pa.Table.from_arrays(
            [pc.take(grams, take), pa.array(counts, pa.int64())],
            names=["gram", "n"],
        )

    partials = ds.select_columns([text_col]).map_batches(
        _partial, batch_format="pyarrow",
    )
    freqs = groupby_agg(partials, "gram", {"n": ("sum", "n")})
    return topk(freqs, "n", k, tie_keys=["gram"])
