"""n-gram language-model operators: train bigram counts distributed,
score documents against the model — the KenLM-shaped quality-filtering
step of a pre-training pipeline (score against a clean reference corpus,
drop the tail).

* :func:`train_bigram_counts` — (w1, w2, n) over whitespace tokens
  (same ``\\s+``-on-trimmed tokenization as ``word_frequencies``, so SQL
  oracles reproduce it): per-batch partial pair counts (flat
  shifted-slice join + dictionary-encode bincount) → one
  ``groupby`` exchange.
* :func:`score_bigram_familiarity` — integer-exact scoring: per doc,
  ``n_bigrams``, ``n_known`` (bigrams present in the model) and
  ``sum_model_counts`` (sum of the model's counts over the doc's
  bigrams, missing = 0).  Pure integers → the DuckDB oracle (LEFT JOIN
  against the same model CTE) matches bit-for-bit.  The model is
  broadcast via ``ray.put`` (an n-gram model is vocabulary², bounded —
  document the budget; shard by w1-hash above it).
* :func:`add_perplexity` — the conventional float signal: per-doc
  average ``-log2 P(w2|w1)`` with add-one smoothing.  Floats are
  accumulation-order dependent, so this stays outside the SQL oracle
  gate and is pinned by a numpy reference in tests.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .lines import _split_words

__all__ = [
    "train_bigram_counts",
    "score_bigram_familiarity",
    "add_perplexity",
]

SEP = "\x00"


def _doc_bigrams(t: pa.Table, text_col: str):
    """Flat per-batch bigram keys (w1 SEP w2) with owning row index."""
    parts = _split_words(t, text_col)
    offs = np.asarray(parts.offsets)
    vals = parts.values
    lens = np.diff(offs)
    doc_idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), lens)
    m = len(vals) - 1
    if m <= 0:
        return None, None
    keys = pc.binary_join_element_wise(vals.slice(0, m), vals.slice(1, m), SEP)
    valid = doc_idx[:m] == doc_idx[1:]
    return keys.filter(pa.array(valid)), doc_idx[:m][valid]


def train_bigram_counts(ds, text_col: str = "text"):
    """(w1, w2, n) Dataset: corpus-wide adjacent-token pair counts."""

    def _partial(t: pa.Table) -> pa.Table:
        keys, _doc = _doc_bigrams(t, text_col)
        if keys is None or len(keys) == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.string()), pa.array([], pa.int64())],
                names=["bigram", "n"],
            )
        enc = keys.dictionary_encode()
        codes = np.asarray(enc.indices.to_numpy(zero_copy_only=False), np.int64)
        cnt = np.bincount(codes, minlength=len(enc.dictionary)).astype(np.int64)
        return pa.Table.from_arrays(
            [enc.dictionary, pa.array(cnt, pa.int64())],
            names=["bigram", "n"],
        )

    partial = ds.map_batches(_partial, batch_format="pyarrow")

    def _sum(g: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                g.column("bigram").slice(0, 1),
                pa.array([int(pc.sum(g.column("n")).as_py())], pa.int64()),
            ],
            names=["bigram", "n"],
        )

    summed = partial.groupby("bigram").map_groups(_sum, batch_format="pyarrow")

    def _split(t: pa.Table) -> pa.Table:
        key = t.column("bigram").combine_chunks()
        parts = pc.split_pattern(key, SEP, max_splits=1)
        return pa.Table.from_arrays(
            [
                pc.list_element(parts, 0), pc.list_element(parts, 1),
                t.column("n").combine_chunks(),
            ],
            names=["w1", "w2", "n"],
        )

    return summed.map_batches(_split, batch_format="pyarrow")


def _model_arrays(model) -> tuple:
    """Collect a bigram model Dataset/Table to (keys Arrow array, counts np)."""
    if isinstance(model, pa.Table):
        tables = [model]
    else:
        tables = list(model.iter_batches(batch_format="pyarrow"))
    keys, counts = [], []
    for t in tables:
        keys.append(pc.binary_join_element_wise(
            t.column("w1").combine_chunks(),
            t.column("w2").combine_chunks(), SEP,
        ))
        counts.append(t.column("n").combine_chunks())
    key_arr = pa.concat_arrays(
        [k if isinstance(k, pa.Array) else k.combine_chunks() for k in keys]
    ) if keys else pa.array([], pa.string())
    cnt_arr = np.concatenate(
        [c.to_numpy(zero_copy_only=False) for c in counts]
    ).astype(np.int64) if counts else np.zeros(0, np.int64)
    return key_arr, cnt_arr


def score_bigram_familiarity(ds, model, text_col: str = "text",
                             id_col: str = "doc_id"):
    """Append integer model-familiarity columns per document:
    ``n_bigrams``, ``n_known``, ``sum_model_counts``."""
    import ray

    key_arr, cnt_arr = _model_arrays(model)
    keys_ref = ray.put(key_arr)
    cnts_ref = ray.put(cnt_arr)

    def _f(t: pa.Table) -> pa.Table:
        nb = np.zeros(t.num_rows, np.int64)
        nk = np.zeros(t.num_rows, np.int64)
        sc = np.zeros(t.num_rows, np.int64)
        keys, doc = _doc_bigrams(t, text_col)
        if keys is not None and len(keys):
            nb = np.bincount(doc, minlength=t.num_rows).astype(np.int64)
            idx = pc.index_in(keys, value_set=ray.get(keys_ref))
            hit = pc.is_valid(idx).to_numpy(zero_copy_only=False)
            nk = np.bincount(
                doc[hit], minlength=t.num_rows,
            ).astype(np.int64)
            if hit.any():
                counts = ray.get(cnts_ref)[
                    idx.to_numpy(zero_copy_only=False)[hit].astype(np.int64)
                ]
                sc = np.bincount(
                    doc[hit], weights=counts.astype(np.float64),
                    minlength=t.num_rows,
                ).astype(np.int64)
        t = t.append_column("n_bigrams", pa.array(nb, pa.int64()))
        t = t.append_column("n_known", pa.array(nk, pa.int64()))
        return t.append_column("sum_model_counts", pa.array(sc, pa.int64()))

    return ds.map_batches(_f, batch_format="pyarrow")


def add_perplexity(ds, model, vocab_size: int, text_col: str = "text",
                   out_col: str = "bits_per_token"):
    """Average ``-log2 P(w2|w1)`` per document with add-one smoothing:
    ``P = (n(w1,w2)+1) / (n(w1,*)+V)``.  Documents with no bigrams get
    null.  Float signal — pinned by a numpy reference test, not by the
    SQL oracle gate."""
    import ray

    key_arr, cnt_arr = _model_arrays(model)
    # n(w1,*) marginals from the same model
    w1_of = pc.list_element(pc.split_pattern(key_arr, SEP, max_splits=1), 0)
    enc = w1_of.dictionary_encode()
    codes = np.asarray(enc.indices.to_numpy(zero_copy_only=False), np.int64)
    marg = np.bincount(
        codes, weights=cnt_arr.astype(np.float64),
        minlength=len(enc.dictionary),
    ).astype(np.int64)
    keys_ref = ray.put(key_arr)
    cnts_ref = ray.put(cnt_arr)
    w1_ref = ray.put(enc.dictionary)
    marg_ref = ray.put(marg)

    def _f(t: pa.Table) -> pa.Table:
        out = np.full(t.num_rows, np.nan)
        keys, doc = _doc_bigrams(t, text_col)
        if keys is not None and len(keys):
            idx = pc.index_in(keys, value_set=ray.get(keys_ref))
            iv = idx.to_numpy(zero_copy_only=False)
            hit = pc.is_valid(idx).to_numpy(zero_copy_only=False)
            joint = np.zeros(len(keys), np.int64)
            joint[hit] = ray.get(cnts_ref)[iv[hit].astype(np.int64)]
            w1 = pc.list_element(
                pc.split_pattern(keys, SEP, max_splits=1), 0,
            )
            midx = pc.index_in(w1, value_set=ray.get(w1_ref))
            mv = midx.to_numpy(zero_copy_only=False)
            mhit = pc.is_valid(midx).to_numpy(zero_copy_only=False)
            m = np.zeros(len(keys), np.int64)
            m[mhit] = ray.get(marg_ref)[mv[mhit].astype(np.int64)]
            bits = -np.log2((joint + 1.0) / (m + float(vocab_size)))
            nb = np.bincount(doc, minlength=t.num_rows).astype(np.int64)
            tot = np.bincount(doc, weights=bits, minlength=t.num_rows)
            with np.errstate(invalid="ignore"):
                out = np.where(nb > 0, tot / np.maximum(nb, 1), np.nan)
        return t.append_column(out_col, pa.array(
            [None if np.isnan(x) else float(x) for x in out], pa.float64(),
        ))

    return ds.map_batches(_f, batch_format="pyarrow")
