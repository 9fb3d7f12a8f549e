"""Entity linking: match surface forms in text against an alias table
(mention -> canonical CURIE), the OBO/MeSH-style identifier-cache step of
a KG-construction pipeline.

Two interchangeable engines with identical output semantics:

* :func:`link_entities` — vectorized n-gram hash join.  Tokens are
  lowercased alnum runs (``regexp_split_to_array(lower(t),'[^a-z0-9]+')``
  minus empties, 1-based positions — reproducible in DuckDB, so the
  driver oracle is exact).  For every gram length present in the alias
  table, within-document n-grams are built as shifted-slice
  ``binary_join_element_wise`` over the batch's flat token stream and
  matched with ONE ``pc.index_in`` against the broadcast alias arrays
  (``ray.put`` once, zero-copy read per task).  No Python loop, no
  shuffle; output is a flat (id, pos, gram, mention, curie) mention table.
* :class:`TrieLinker` / :func:`link_entities_trie` — an Aho–Corasick
  automaton over the same alias set, built ONCE per actor in
  ``__init__`` (the reference holds warm pyparsing namespace maps per
  process the same way — ``src/pybel/parser/parse_concept.py:45-90``),
  scanning the normalized token stream of each document and reporting
  every word-boundary match.  Char-level scanning has no Arrow kernel, so
  this is the one deliberate Python loop; use it when the alias set is
  too pattern-dense for per-length n-gram joins (e.g. thousands of
  distinct gram lengths).  Both engines return identical rows — a pytest
  asserts equality and they share one DuckDB oracle.

Scale notes: the alias table is the *small* side by definition (an
identifier cache, ~10^6 rows) and is broadcast; documents never leave
their batch.  If the alias table outgrows the broadcast budget, use
:func:`link_entities_bucketed`, which ships candidate n-grams through the
bucketed lookup join in ``struct/degree.py`` instead (one exchange, no
driver materialization).
"""

from __future__ import annotations

from collections import deque
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "alias_table_from_corpus",
    "alias_table_from_registry",
    "link_entities",
    "link_entities_bucketed",
    "TrieLinker",
    "link_entities_trie",
    "entity_link_counts",
    "cooccurrence_edges",
    "pmi_scores",
]

#: one-split-regex tokenization shared with the DuckDB oracle
TOKEN_SPLIT = r"[^a-z0-9]+"


def _link_tokens(t: pa.Table, text_col: str):
    """Flat lowercased alnum tokens with per-document 1-based positions.

    Returns ``(vals, doc_idx, pos)`` — token values, owning row index and
    within-document position, all empties removed.  Matches the oracle's
    ``row_number() OVER (PARTITION BY doc_id ORDER BY rp)`` exactly
    because both sides split with :data:`TOKEN_SPLIT` and drop ``''``.
    """
    lowered = pc.utf8_lower(t.column(text_col))
    parts = pc.split_pattern_regex(lowered, pattern=TOKEN_SPLIT)
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    offs = np.asarray(parts.offsets)
    vals = parts.values
    lens = np.diff(offs)
    doc_idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), lens)
    keep = pc.not_equal(vals, "").to_numpy(zero_copy_only=False)
    vals = vals.filter(pa.array(keep))
    doc_idx = doc_idx[keep]
    kept_lens = np.bincount(doc_idx, minlength=t.num_rows) if len(doc_idx) else (
        np.zeros(t.num_rows, dtype=np.int64)
    )
    starts = np.concatenate(([0], np.cumsum(kept_lens)[:-1]))
    pos = np.arange(len(doc_idx), dtype=np.int64) - np.repeat(starts, kept_lens) + 1
    return vals, doc_idx, pos


def _alias_by_gram(aliases: pa.Table):
    """Split an alias table into ``{gram_len: (mentions, curies)}``."""
    mentions = aliases.column("mention").combine_chunks()
    curies = aliases.column("curie").combine_chunks()
    grams = pc.add(pc.count_substring(mentions, " "), 1)
    out = {}
    for n in pc.unique(grams).to_pylist():
        mask = pc.equal(grams, n)
        out[int(n)] = (mentions.filter(mask), curies.filter(mask))
    return out


def _match_batch(
    t: pa.Table, by_gram, text_col: str, id_col: str,
    context_window: Optional[int] = None,
) -> pa.Table:
    vals, doc_idx, pos = _link_tokens(t, text_col)
    ids = t.column(id_col).combine_chunks()
    names = [id_col, "pos", "gram", "mention", "curie"]
    if context_window is not None:
        names.append("context")
    out: dict = {k: [] for k in names}
    flat_pos = np.arange(len(doc_idx), dtype=np.int64)
    for n, (mentions, curies) in sorted(by_gram.items()):
        m = len(vals) - n + 1
        if m <= 0:
            continue
        if n == 1:
            grams = vals
            gpos, gdoc, gflat = pos, doc_idx, flat_pos
        else:
            grams = pc.binary_join_element_wise(
                *[vals.slice(k, m) for k in range(n)], " ",
            )
            valid = doc_idx[:m] == doc_idx[n - 1:]
            grams = grams.filter(pa.array(valid))
            gpos, gdoc = pos[:m][valid], doc_idx[:m][valid]
            gflat = flat_pos[:m][valid]
        idx = pc.index_in(grams, value_set=mentions)
        hit = pc.is_valid(idx).to_numpy(zero_copy_only=False)
        if not hit.any():
            continue
        hit_arr = pa.array(hit)
        out[id_col].append(pc.take(ids, pa.array(gdoc[hit])))
        out["pos"].append(pa.array(gpos[hit], pa.int64()))
        out["gram"].append(pa.array(np.full(int(hit.sum()), n, dtype=np.int64)))
        out["mention"].append(grams.filter(hit_arr))
        out["curie"].append(pc.take(curies, pc.filter(idx, hit_arr)))
        if context_window is not None:
            w = int(context_window)
            g = gflat[hit]
            p = gpos[hit]
            # clamp the ±w token window to the document bounds
            doc_start = g - (p - 1)
            doc_len = np.bincount(doc_idx, minlength=t.num_rows)[gdoc[hit]] \
                if len(doc_idx) else np.zeros(0, np.int64)
            doc_end = doc_start + doc_len  # exclusive
            lo = np.maximum(doc_start, g - w)
            hi = np.minimum(doc_end, g + n + w)
            lens = hi - lo
            offs = np.r_[0, np.cumsum(lens)]
            gather = np.arange(offs[-1], dtype=np.int64) - np.repeat(
                offs[:-1], lens,
            ) + np.repeat(lo, lens)
            taken = pc.take(vals, pa.array(gather))
            if isinstance(taken, pa.ChunkedArray):
                taken = taken.combine_chunks()
            ctx = pc.binary_join(
                pa.ListArray.from_arrays(pa.array(offs, pa.int32()), taken), " ",
            )
            out["context"].append(ctx)
    if not out[id_col]:
        arrays = [
            pa.array([], ids.type), pa.array([], pa.int64()),
            pa.array([], pa.int64()), pa.array([], pa.string()),
            pa.array([], pa.string()),
        ]
        if context_window is not None:
            arrays.append(pa.array([], pa.string()))
        return pa.Table.from_arrays(arrays, names=names)
    cat = lambda chunks: pa.concat_arrays(
        [c if isinstance(c, pa.Array) else c.combine_chunks() for c in chunks]
    )
    return pa.Table.from_arrays([cat(out[k]) for k in names], names=names)


def link_entities(
    ds,
    aliases: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    context_window: Optional[int] = None,
):
    """Vectorized alias linking: one (id, pos, gram, mention, curie) row per
    within-document n-gram that exactly matches an alias mention.

    ``aliases`` must have ``mention`` (lowercased, single-space-joined
    tokens) and ``curie`` columns, unique on mention; it is broadcast via
    ``ray.put`` once.  With ``context_window=w`` each row also carries a
    ``context`` column: the mention ±w surrounding tokens (clamped to the
    document), space-joined — the relation-extraction training-example
    shape.  Context gathering is one ragged vectorized take + ListArray
    join per gram length, no Python loop.
    """
    import ray

    by_gram_ref = ray.put(_alias_by_gram(aliases))

    def _f(t: pa.Table) -> pa.Table:
        return _match_batch(
            t, ray.get(by_gram_ref), text_col, id_col,
            context_window=context_window,
        )

    return ds.map_batches(_f, batch_format="pyarrow")


def link_entities_bucketed(
    ds,
    aliases,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram_lengths=(1, 2),
    num_buckets: int = 64,
):
    """Alias linking when the alias table exceeds the broadcast budget.

    Emits every within-document n-gram of the given lengths as a flat
    candidate row, then resolves curies with the bucketed lookup join
    (hash-bucket co-location + one ``pc.index_in`` per bucket) from
    ``struct/degree.py`` — ``aliases`` is a Dataset and never visits the
    driver.  Candidate volume is ``n_tokens × len(gram_lengths)``; prefer
    :func:`link_entities` whenever the alias table fits in the object
    store.
    """
    from ..struct.degree import bucketed_attach

    lengths = sorted(set(int(n) for n in gram_lengths))

    def _candidates(t: pa.Table) -> pa.Table:
        vals, doc_idx, pos = _link_tokens(t, text_col)
        ids = t.column(id_col).combine_chunks()
        parts = []
        for n in lengths:
            m = len(vals) - n + 1
            if m <= 0:
                continue
            if n == 1:
                grams, gpos, gdoc = vals, pos, doc_idx
            else:
                grams = pc.binary_join_element_wise(
                    *[vals.slice(k, m) for k in range(n)], " ",
                )
                valid = doc_idx[:m] == doc_idx[n - 1:]
                grams = grams.filter(pa.array(valid))
                gpos, gdoc = pos[:m][valid], doc_idx[:m][valid]
            parts.append(pa.Table.from_arrays(
                [
                    pc.take(ids, pa.array(gdoc)), pa.array(gpos, pa.int64()),
                    pa.array(np.full(len(gpos), n, dtype=np.int64)),
                    grams if isinstance(grams, pa.Array) else grams.combine_chunks(),
                ],
                names=[id_col, "pos", "gram", "mention"],
            ))
        if not parts:
            return pa.Table.from_arrays(
                [
                    pa.array([], ids.type), pa.array([], pa.int64()),
                    pa.array([], pa.int64()), pa.array([], pa.string()),
                ],
                names=[id_col, "pos", "gram", "mention"],
            )
        return pa.concat_tables(parts)

    candidates = ds.map_batches(_candidates, batch_format="pyarrow")
    return bucketed_attach(
        candidates, "mention", aliases, "mention", ["curie"],
        num_buckets=num_buckets, how="inner",
    )


# ---------------------------------------------------------------------------
# alias-table builders
# ---------------------------------------------------------------------------


def alias_table_from_corpus(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    unigram_mod: int = 50,
    bigram_mod: int = 100,
    min_len: int = 5,
) -> pa.Table:
    """Deterministic test/bench alias table derived from the corpus itself.

    Unigram aliases: distinct tokens with ``len >= min_len`` from docs
    with ``doc_id % unigram_mod == 0`` (curie ``W:<tok>``); bigram
    aliases: distinct adjacent token pairs from docs with
    ``doc_id % bigram_mod == 0`` (curie ``B:<w1>_<w2>``).  Fully
    SQL-expressible, so linking queries get exact oracles without any
    external gazetteer.  The alias source is a ``1/mod`` sample, so the
    distinct set is small by construction and is drained to the driver.
    """

    def _partial(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        keep_uni = pa.array(ids % unigram_mod == 0)
        keep_bi = pa.array(ids % bigram_mod == 0)
        mention_parts, curie_parts = [], []
        for keep, is_bi in ((keep_uni, False), (keep_bi, True)):
            sub = t.filter(keep)
            if sub.num_rows == 0:
                continue
            vals, doc_idx, _pos = _link_tokens(sub, text_col)
            if not is_bi:
                m = vals.filter(
                    pc.greater_equal(pc.utf8_length(vals), min_len)
                )
                m = pc.unique(m)
                mention_parts.append(m)
                curie_parts.append(pc.binary_join_element_wise("W:", m, ""))
            else:
                k = len(vals) - 1
                if k <= 0:
                    continue
                grams = pc.binary_join_element_wise(
                    vals.slice(0, k), vals.slice(1, k), " ",
                )
                grams = pc.unique(grams.filter(pa.array(doc_idx[:k] == doc_idx[1:])))
                mention_parts.append(grams)
                curie_parts.append(pc.binary_join_element_wise(
                    "B:", pc.replace_substring(grams, " ", "_"), "",
                ))
        if not mention_parts:
            return pa.Table.from_arrays(
                [pa.array([], pa.string()), pa.array([], pa.string())],
                names=["mention", "curie"],
            )
        return pa.Table.from_arrays(
            [pa.concat_arrays(mention_parts), pa.concat_arrays(curie_parts)],
            names=["mention", "curie"],
        )

    seen: dict = {}
    projected = ds.select_columns([id_col, text_col]).map_batches(
        _partial, batch_format="pyarrow",
    )
    for b in projected.iter_batches(batch_format="pyarrow"):
        for mention, curie in zip(
            b.column("mention").to_pylist(), b.column("curie").to_pylist(),
        ):
            seen[mention] = curie
    mentions = sorted(seen)
    return pa.Table.from_arrays(
        [
            pa.array(mentions, pa.string()),
            pa.array([seen[m] for m in mentions], pa.string()),
        ],
        names=["mention", "curie"],
    )


def alias_table_from_registry(registry) -> pa.Table:
    """Alias table from a :class:`~pybel_ray.resources.ResourceRegistry`:
    every namespace name becomes a lowercased token-normalized mention
    with curie ``<KEYWORD or url>:<name>`` (the reference's concept lookup
    maps, ``src/pybel/parser/parse_concept.py:45-90``, flattened)."""
    import re

    seen: dict = {}
    for url, content in registry.namespaces.items():
        # keyword: final path-ish component of the url, uppercased
        kw = re.split(r"[/\\]", url.rstrip("/"))[-1]
        kw = re.sub(r"\.belns$", "", kw) or url
        for name in content.get("names", {}):
            toks = [w for w in re.split(TOKEN_SPLIT, name.lower()) if w]
            if not toks:
                continue
            seen.setdefault(" ".join(toks), f"{kw}:{name}")
    mentions = sorted(seen)
    return pa.Table.from_arrays(
        [
            pa.array(mentions, pa.string()),
            pa.array([seen[m] for m in mentions], pa.string()),
        ],
        names=["mention", "curie"],
    )


# ---------------------------------------------------------------------------
# Aho–Corasick actor-pool engine
# ---------------------------------------------------------------------------


class _Automaton:
    """Minimal Aho–Corasick over byte-identical Python strings.

    goto is dict-of-dicts, fail links BFS-built, outputs store
    (pattern_len, curie) so matches report their span directly.
    """

    def __init__(self, patterns):
        self.goto = [{}]
        self.fail = [0]
        self.out: list = [[]]
        for mention, curie in patterns:
            node = 0
            for ch in mention:
                nxt = self.goto[node].get(ch)
                if nxt is None:
                    self.goto.append({})
                    self.fail.append(0)
                    self.out.append([])
                    nxt = len(self.goto) - 1
                    self.goto[node][ch] = nxt
                node = nxt
            self.out[node].append((len(mention), curie, mention))
        q = deque()
        for ch, nxt in self.goto[0].items():
            q.append(nxt)
        while q:
            node = q.popleft()
            for ch, nxt in self.goto[node].items():
                q.append(nxt)
                f = self.fail[node]
                while f and ch not in self.goto[f]:
                    f = self.fail[f]
                self.fail[nxt] = self.goto[f].get(ch, 0) if self.goto[f].get(ch, 0) != nxt else 0
                self.out[nxt] = self.out[nxt] + self.out[self.fail[nxt]]

    def scan(self, text: str):
        """Yield ``(start, length, curie, mention)`` for every match."""
        node = 0
        goto, fail, out = self.goto, self.fail, self.out
        for i, ch in enumerate(text):
            while node and ch not in goto[node]:
                node = fail[node]
            node = goto[node].get(ch, 0)
            for length, curie, mention in out[node]:
                yield i - length + 1, length, curie, mention


class TrieLinker:
    """Actor-pool linker: automaton built once per actor in ``__init__``
    from the broadcast alias table; ``__call__`` scans each document's
    normalized token stream and emits word-boundary matches.

    Output rows are identical to :func:`link_entities` (same tokenization,
    same (id, pos, gram, mention, curie) schema) — a pytest and the shared
    driver oracle assert it.
    """

    def __init__(self, aliases_ref, text_col: str = "text", id_col: str = "doc_id"):
        import ray

        aliases = ray.get(aliases_ref) if not isinstance(aliases_ref, pa.Table) else aliases_ref
        pats = list(zip(
            aliases.column("mention").to_pylist(),
            aliases.column("curie").to_pylist(),
        ))
        self.automaton = _Automaton(pats)
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        lowered = pc.utf8_lower(t.column(self.text_col))
        parts = pc.split_pattern_regex(lowered, pattern=TOKEN_SPLIT)
        joined = pc.binary_join(parts, " ")
        ids = t.column(self.id_col).to_pylist()
        out_id, out_pos, out_gram, out_mention, out_curie = [], [], [], [], []
        scan = self.automaton.scan
        for row_id, doc in zip(ids, joined.to_pylist()):
            if doc is None:  # null text yields no mentions (matches link_entities)
                continue
            # normalize: collapse the empty tokens the split left behind
            norm = " ".join(w for w in doc.split(" ") if w)
            n = len(norm)
            for start, length, curie, mention in scan(norm):
                end = start + length - 1
                if (start > 0 and norm[start - 1] != " ") or (
                    end + 1 < n and norm[end + 1] != " "
                ):
                    continue
                out_id.append(row_id)
                out_pos.append(norm.count(" ", 0, start) + 1)
                out_gram.append(mention.count(" ") + 1)
                out_mention.append(mention)
                out_curie.append(curie)
        return pa.Table.from_arrays(
            [
                pa.array(out_id, t.column(self.id_col).type),
                pa.array(out_pos, pa.int64()),
                pa.array(out_gram, pa.int64()),
                pa.array(out_mention, pa.string()),
                pa.array(out_curie, pa.string()),
            ],
            names=[self.id_col, "pos", "gram", "mention", "curie"],
        )


def link_entities_trie(
    ds,
    aliases: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    concurrency=(1, 8),
    batch_size: Optional[int] = 256,
):
    """Aho–Corasick linking on an actor pool (automaton warm per actor).

    ``concurrency`` defaults to an autoscaling ``(1, 8)`` pool so the
    upstream read tasks are never starved of CPUs on small clusters (a
    fixed pool equal to the CPU count deadlocks the streaming executor).
    """
    import ray

    aliases_ref = ray.put(aliases)
    return ds.map_batches(
        TrieLinker,
        fn_constructor_args=(aliases_ref, text_col, id_col),
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )


# ---------------------------------------------------------------------------
# aggregate
# ---------------------------------------------------------------------------


def entity_link_counts(links, id_col: str = "doc_id"):
    """Per-curie mention and document counts from a mention table.

    Per-batch partial: distinct (curie, doc) pairs with their local
    mention counts (lexsort + run lengths, no Python loop); ONE
    ``groupby(curie)`` exchange then sums mentions and counts distinct
    docs per group.  Output: (curie, n_mentions, n_docs).
    """

    def _partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.Table.from_arrays(
                [
                    pa.array([], pa.string()),
                    pa.array([], t.column(id_col).type),
                    pa.array([], pa.int64()),
                ],
                names=["curie", id_col, "cnt"],
            )
        enc = t.column("curie").combine_chunks().dictionary_encode()
        codes = np.asarray(enc.indices.to_numpy(zero_copy_only=False), dtype=np.int64)
        docs_arr = t.column(id_col).combine_chunks()
        docs = docs_arr.to_numpy(zero_copy_only=False)
        order = np.lexsort((codes, docs))
        d, c = docs[order], codes[order]
        starts = np.r_[True, (d[1:] != d[:-1]) | (c[1:] != c[:-1])]
        start_idx = np.flatnonzero(starts)
        cnt = np.diff(np.r_[start_idx, len(d)])
        take = pa.array(order[start_idx])
        return pa.Table.from_arrays(
            [
                pc.take(enc, take).cast(pa.string()),
                pc.take(docs_arr, take),
                pa.array(cnt, pa.int64()),
            ],
            names=["curie", id_col, "cnt"],
        )

    partial = links.map_batches(_partial, batch_format="pyarrow")

    def _final(g: pa.Table) -> pa.Table:
        docs = g.column(id_col)
        return pa.Table.from_arrays(
            [
                g.column("curie").slice(0, 1),
                pa.array([int(pc.sum(g.column("cnt")).as_py() or 0)], pa.int64()),
                pa.array([len(pc.unique(docs.combine_chunks()))], pa.int64()),
            ],
            names=["curie", "n_mentions", "n_docs"],
        )

    return partial.groupby("curie").map_groups(_final, batch_format="pyarrow")


def cooccurrence_edges(links, id_col: str = "doc_id"):
    """Entity co-occurrence graph from a mention table: one
    (curie_a, curie_b, n_docs) row per unordered pair of distinct curies
    appearing in the same document (``curie_a < curie_b``).

    The KG-construction step after linking: co-mention edges feed
    relation candidates / PMI scoring.  Shape: per-batch distinct
    (doc, curie) pairs → ``groupby(doc)`` exchange → vectorized pair
    expansion per group (triu indices, no Python loop over pairs) →
    per-batch partial pair counts → ``groupby(pair)`` sum.  Pair volume
    is quadratic in distinct-entities-per-doc — bounded by linking
    density, the documented assumption (cap upstream for adversarial
    docs).
    """

    def _distinct(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.Table.from_arrays(
                [pa.array([], t.column(id_col).type), pa.array([], pa.string())],
                names=[id_col, "curie"],
            )
        enc = t.column("curie").combine_chunks().dictionary_encode()
        codes = np.asarray(enc.indices.to_numpy(zero_copy_only=False), np.int64)
        docs = t.column(id_col).combine_chunks()
        dv = docs.to_numpy(zero_copy_only=False)
        order = np.lexsort((codes, dv))
        d, c = dv[order], codes[order]
        firsts = np.r_[True, (d[1:] != d[:-1]) | (c[1:] != c[:-1])]
        take = pa.array(order[np.flatnonzero(firsts)])
        return pa.Table.from_arrays(
            [pc.take(docs, take), pc.take(enc, take).cast(pa.string())],
            names=[id_col, "curie"],
        )

    distinct = links.select_columns([id_col, "curie"]).map_batches(
        _distinct, batch_format="pyarrow",
    )

    def _pairs(g: pa.Table) -> pa.Table:
        curies = sorted(set(g.column("curie").to_pylist()))
        n = len(curies)
        if n < 2:
            return pa.Table.from_arrays(
                [pa.array([], pa.string()), pa.array([], pa.string()),
                 pa.array([], pa.int64())],
                names=["curie_a", "curie_b", "n_docs"],
            )
        arr = pa.array(curies, pa.string())
        ia, ib = np.triu_indices(n, 1)
        return pa.Table.from_arrays(
            [
                pc.take(arr, pa.array(ia)), pc.take(arr, pa.array(ib)),
                pa.array(np.ones(len(ia), np.int64), pa.int64()),
            ],
            names=["curie_a", "curie_b", "n_docs"],
        )

    pairs = distinct.groupby(id_col).map_groups(_pairs, batch_format="pyarrow")

    def _partial_cnt(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        key = pc.binary_join_element_wise(
            t.column("curie_a").combine_chunks(),
            t.column("curie_b").combine_chunks(), "\x00",
        )
        enc = key.dictionary_encode()
        codes = np.asarray(enc.indices.to_numpy(zero_copy_only=False), np.int64)
        order = np.argsort(codes, kind="stable")
        c = codes[order]
        starts = np.flatnonzero(np.r_[True, c[1:] != c[:-1]])
        cnt = np.diff(np.r_[starts, len(c)])
        take = pa.array(order[starts])
        return pa.Table.from_arrays(
            [
                pc.take(t.column("curie_a").combine_chunks(), take),
                pc.take(t.column("curie_b").combine_chunks(), take),
                pa.array(cnt, pa.int64()),
            ],
            names=["curie_a", "curie_b", "n_docs"],
        )

    partial = pairs.map_batches(_partial_cnt, batch_format="pyarrow")

    def _sum(g: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                g.column("curie_a").slice(0, 1),
                g.column("curie_b").slice(0, 1),
                pa.array([int(pc.sum(g.column("n_docs")).as_py())], pa.int64()),
            ],
            names=["curie_a", "curie_b", "n_docs"],
        )

    return partial.groupby(["curie_a", "curie_b"]).map_groups(
        _sum, batch_format="pyarrow",
    )


def pmi_scores(links, n_docs: int, id_col: str = "doc_id"):
    """PMI-scored co-occurrence edges: ``(curie_a, curie_b, n_ab,
    pmi_e6)`` where ``pmi = ln(n_docs · n_ab / (n_a · n_b))`` over
    document frequencies, quantized to integer micros
    (``floor(pmi·1e6 + 0.5)``) so a DuckDB oracle hash-compares exactly.

    The relation-candidate scorer on top of :func:`cooccurrence_edges`
    (KG construction: co-mention strength normalized by marginal entity
    frequency).  Per-entity doc counts come from the skew-safe
    :func:`~pybel_ray.ops.relational.distinct_count_per_group`; that
    table is bounded by the linking registry (entities, not documents),
    so it broadcasts via one ``ray.put`` and the scoring pass is one
    vectorized ``pc.index_in`` probe per batch — no extra exchange
    beyond the two inside the upstream aggregations.
    """
    import ray

    from .relational import distinct_count_per_group

    edges = cooccurrence_edges(links, id_col)
    counts = distinct_count_per_group(
        links.select_columns([id_col, "curie"]), "curie", id_col,
    )
    batches = list(counts.iter_batches(batch_format="pyarrow"))
    if not batches:  # no linked entities at all -> no co-occurrence edges
        batches = [pa.Table.from_arrays(
            [pa.array([], pa.string()), pa.array([], pa.int64())],
            names=["curie", "n_distinct"],
        )]
    lkp = pa.concat_tables(batches).combine_chunks()
    ref = ray.put(lkp)
    n_total = float(n_docs)

    def _score(t: pa.Table) -> pa.Table:
        m = ray.get(ref)
        keys = m.column("curie").combine_chunks()
        nd = m.column("n_distinct").combine_chunks()
        ia = pc.index_in(t.column("curie_a"), value_set=keys)
        ib = pc.index_in(t.column("curie_b"), value_set=keys)
        na = pc.take(nd, ia).to_numpy(zero_copy_only=False).astype(np.float64)
        nb = pc.take(nd, ib).to_numpy(zero_copy_only=False).astype(np.float64)
        nab = t.column("n_docs").to_numpy(zero_copy_only=False).astype(np.float64)
        # operation order mirrors the SQL oracle literally:
        # ln((N * n_ab) / (n_a * n_b))
        pmi = np.log((n_total * nab) / (na * nb))
        q = np.floor(pmi * 1e6 + 0.5).astype(np.int64)
        return pa.Table.from_arrays(
            [
                t.column("curie_a"), t.column("curie_b"),
                t.column("n_docs"), pa.array(q, pa.int64()),
            ],
            names=["curie_a", "curie_b", "n_ab", "pmi_e6"],
        )

    return edges.map_batches(_score, batch_format="pyarrow")
