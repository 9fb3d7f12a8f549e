"""Distributed BPE (byte-pair-encoding) vocabulary induction — the
tokenizer-training step of a pre-training data pipeline (Sennrich et al.
2016, arXiv:1508.07909).

Operates on the *word-frequency table* (the standard formulation: merges
are learned over distinct word types weighted by corpus frequency), so
the working set after one ``word_frequencies`` exchange is
vocabulary-bounded, not corpus-bounded.  Each merge round is:

1. one stateless pass over the (word, freq, syms) Dataset counting
   adjacent symbol pairs (flat shifted-slice join weighted by ``freq`` —
   pure numpy/Arrow, no Python loop over rows);
2. one tiny ``groupby(pair)`` exchange + sort/limit(1) picking the
   globally most frequent pair (ties broken by pair string ascending, so
   the result is independent of partitioning and batch layout);
3. one vectorized merge pass rewriting every symbol sequence
   (leftmost-non-overlapping occurrences, the classic ``aaa + (a,a) →
   (aa, a)`` rule, implemented with run-parity selection — no Python
   loop).

State is re-materialized per round (plan snapshot, same lesson as
``struct/components.py``).  Outputs are deterministic integer counts and
strings; no SQL oracle exists (iterative string rewriting is not
expressible in DuckDB) — correctness is pinned by a pure-Python
reference implementation in tests.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["learn_bpe", "apply_bpe", "bpe_reference"]

#: end-of-word marker appended to every word's final symbol (standard)
EOW = "</w>"


def _snapshot(ds):
    import ray

    return ray.data.from_arrow_refs(ds.materialize().to_arrow_refs())


def _word_syms_table(words: pa.Table) -> pa.Table:
    """(word, freq, syms list<string>): characters + EOW on the last."""
    out_words, out_freq, out_syms, offsets = [], [], [], [0]
    for w, f in zip(
        words.column("word").to_pylist(), words.column("n").to_pylist(),
    ):
        syms = list(w[:-1]) + [w[-1] + EOW] if w else []
        out_words.append(w)
        out_freq.append(int(f))
        out_syms.extend(syms)
        offsets.append(len(out_syms))
    return pa.Table.from_arrays(
        [
            pa.array(out_words, pa.string()),
            pa.array(out_freq, pa.int64()),
            pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()), pa.array(out_syms, pa.string()),
            ),
        ],
        names=["word", "freq", "syms"],
    )


def _pair_counts_batch(t: pa.Table) -> pa.Table:
    syms = t.column("syms")
    if isinstance(syms, pa.ChunkedArray):
        syms = syms.combine_chunks()
    offs = np.asarray(syms.offsets)
    vals = syms.values
    lens = np.diff(offs)
    freq = np.repeat(
        t.column("freq").to_numpy(zero_copy_only=False), lens,
    ).astype(np.int64)
    word_idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), lens)
    m = len(vals) - 1
    if m <= 0:
        return pa.Table.from_arrays(
            [pa.array([], pa.string()), pa.array([], pa.int64())],
            names=["pair", "cnt"],
        )
    pairs = pc.binary_join_element_wise(
        vals.slice(0, m), vals.slice(1, m), "\x00",
    )
    valid = word_idx[:m] == word_idx[1:]
    pairs = pairs.filter(pa.array(valid))
    w = freq[:m][valid]
    enc = pairs.dictionary_encode()
    codes = np.asarray(enc.indices.to_numpy(zero_copy_only=False), np.int64)
    sums = np.bincount(codes, weights=w.astype(np.float64)).astype(np.int64)
    return pa.Table.from_arrays(
        [enc.dictionary, pa.array(sums, pa.int64())],
        names=["pair", "cnt"],
    )


def _top_pair(state) -> Tuple[str, str, int]:
    partial = state.map_batches(_pair_counts_batch, batch_format="pyarrow")

    def _sum(g: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                g.column("pair").slice(0, 1),
                pa.array([int(pc.sum(g.column("cnt")).as_py())], pa.int64()),
            ],
            names=["pair", "cnt"],
        )

    totals = partial.groupby("pair").map_groups(_sum, batch_format="pyarrow")
    top = totals.sort(["cnt", "pair"], descending=[True, False]).limit(1).take_all()
    if not top:
        return None
    a, b = top[0]["pair"].split("\x00", 1)
    return a, b, int(top[0]["cnt"])


def _merge_table(t: pa.Table, a: str, b: str) -> pa.Table:
    """One vectorized merge of pair (a, b) over a (freq, syms) table."""
    merged = a + b
    syms = t.column("syms")
    if isinstance(syms, pa.ChunkedArray):
        syms = syms.combine_chunks()
    offs = np.asarray(syms.offsets)
    vals = syms.values
    lens = np.diff(offs)
    word_idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), lens)
    n = len(vals)
    if n == 0:
        return t
    is_a = pc.equal(vals, a).to_numpy(zero_copy_only=False)
    is_b = pc.equal(vals, b).to_numpy(zero_copy_only=False)
    cand = np.zeros(n, dtype=bool)
    if n > 1:
        cand[:-1] = is_a[:-1] & is_b[1:] & (word_idx[:-1] == word_idx[1:])
    if not cand.any():
        return t
    # leftmost-non-overlapping: within each run of consecutive
    # candidates keep every other one starting at the run head
    idx = np.arange(n, dtype=np.int64)
    run_head = cand & np.r_[True, ~cand[:-1]]
    head_pos = np.where(run_head, idx, 0)
    head_pos = np.maximum.accumulate(np.where(cand, head_pos, 0))
    sel = cand & (((idx - head_pos) % 2) == 0)
    drop = np.zeros(n, dtype=bool)
    drop[1:] = sel[:-1]  # the b of every selected pair disappears
    new_vals_np = vals.to_numpy(zero_copy_only=False).astype(object)
    new_vals_np[sel] = merged
    keep = ~drop
    out_vals = pa.array(new_vals_np[keep], pa.string())
    new_lens = np.bincount(word_idx[keep], minlength=t.num_rows)
    new_offs = pa.array(np.r_[0, np.cumsum(new_lens)], pa.int32())
    new_syms = pa.ListArray.from_arrays(new_offs, out_vals)
    return t.set_column(
        t.schema.get_field_index("syms"), "syms", new_syms,
    )


def _merge_pass(state, a: str, b: str):
    """Apply :func:`_merge_table` to every block of the state Dataset."""
    return state.map_batches(
        lambda t: _merge_table(t, a, b), batch_format="pyarrow",
    )


def learn_bpe(ds, num_merges: int = 10, text_col: str = "text",
              min_count: int = 1):
    """Learn ``num_merges`` BPE merges from a corpus; returns
    ``(merges, state)`` where ``merges`` is a list of
    ``(rank, left, right, merged, count)`` tuples and ``state`` the final
    (word, freq, syms) Dataset (for inspection / further merges).

    Stops early when the best remaining pair falls below ``min_count``.
    """
    import ray

    from .text import word_frequencies

    words = word_frequencies(ds, text_col=text_col)
    state_tables = []
    for b in words.iter_batches(batch_format="pyarrow"):
        state_tables.append(_word_syms_table(pa.Table.from_batches(
            [b] if isinstance(b, pa.RecordBatch) else b.to_batches(),
        )))
    state = _snapshot(ray.data.from_arrow(state_tables))

    merges: List[Tuple[int, str, str, str, int]] = []
    for rank in range(num_merges):
        top = _top_pair(state)
        if top is None or top[2] < min_count:
            break
        a, b, cnt = top
        merges.append((rank, a, b, a + b, cnt))
        state = _snapshot(_merge_pass(state, a, b))
    return merges, state


def apply_bpe(ds, merges, text_col: str = "text", out_col: str = "n_bpe"):
    """Append the BPE token count per row under the learned merges
    (greedy rank-ordered application per word, the standard encoder).

    The merge list is tiny and is applied per batch with the same
    vectorized machinery as learning (one pass per merge over the
    batch's flat symbols) — no Python loop over rows.
    """
    merge_list = [(m[1], m[2]) for m in merges]

    def _count(t: pa.Table) -> pa.Table:
        lowered = t.column(text_col)
        parts = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(lowered), pattern=r"\s+",
        )
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        offs = np.asarray(parts.offsets)
        words = parts.values.to_pylist()
        # symbol stream for every word occurrence in the batch
        syms: List[str] = []
        w_offsets = [0]
        for w in words:
            syms.extend(list(w[:-1]) + [w[-1] + EOW] if w else [])
            w_offsets.append(len(syms))
        tbl = pa.Table.from_arrays(
            [
                pa.array(np.zeros(len(words), np.int64), pa.int64()),
                pa.ListArray.from_arrays(
                    pa.array(w_offsets, pa.int32()), pa.array(syms, pa.string()),
                ),
            ],
            names=["freq", "syms"],
        )
        for a, b in merge_list:
            tbl = _merge_table(tbl, a, b)
        counts_per_word = pc.list_value_length(tbl.column("syms")) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        word_lens = np.diff(offs)
        doc_idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), word_lens)
        doc_counts = np.bincount(
            doc_idx, weights=counts_per_word.astype(np.float64),
            minlength=t.num_rows,
        ).astype(np.int64)
        return t.append_column(out_col, pa.array(doc_counts, pa.int64()))

    return ds.map_batches(_count, batch_format="pyarrow")





def bpe_reference(word_freqs, num_merges):
    """Pure-Python reference BPE (pinning correctness in tests)."""
    vocab = {
        tuple(list(w[:-1]) + [w[-1] + EOW]): f for w, f in word_freqs.items() if w
    }
    merges = []
    for rank in range(num_merges):
        counts: dict = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = counts.get(
                    (syms[i], syms[i + 1]), 0,
                ) + f
        if not counts:
            break
        # tie-break: highest count, then lexicographically smallest pair
        top_cnt = max(counts.values())
        cands = sorted(k for k, v in counts.items() if v == top_cnt)
        best_pair = cands[0]
        merges.append((rank, best_pair[0], best_pair[1],
                       best_pair[0] + best_pair[1], top_cnt))
        new_vocab = {}
        a, b = best_pair
        for syms, f in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges
