"""Distributed string-similarity join (edit distance).

``edit_distance_join`` finds all pairs of rows whose strings are within
Levenshtein distance ``max_dist`` — the record-linkage / entity-
resolution primitive (near-identical names, typo'd identifiers, crawl
titles).  No reference analog (the reference engine is a BEL compiler);
this is part of the training-data-pipeline family (SURVEY.md §2
beyond-reference operators).

Distance semantics are BYTE-oriented over the UTF-8 encoding — the
same contract as DuckDB/Postgres ``levenshtein`` (so the oracle is
bit-exact), and identical to character distance for ASCII keys.  A
single non-ASCII substitution therefore costs its byte length, which is
the standard trade these SQL engines make.

Algorithm — deletion-neighborhood blocking (FastSS):

For edit distance ``d``, take an optimal alignment of strings ``a`` and
``b`` and delete from each the ≤ ``d`` bytes that are not aligned as
exact matches: both sides reduce to the same byte string with at most
``d`` deletions each.  Hence ``ed(a, b) ≤ d`` implies the
≤``d``-deletion neighborhoods of ``a`` and ``b`` intersect — grouping
rows by deletion variant is a COMPLETE candidate generator, and an
exact banded DP verification removes the false positives, so the result
equals the brute-force ``levenshtein(a, b) <= d`` join (the DuckDB
oracle).

Scale shape:

* candidate generation is a stateless ``map_batches`` pass; variants
  are built VECTORIZED — one ``binary_slice`` +
  ``binary_join_element_wise`` per deletion position over the whole
  batch for ``max_dist=1`` (rows longer than ``max_vec_len`` and the
  rare ``max_dist=2`` config take a per-row fallback);
* the ONLY data exchange is one ``groupby(variant)`` over (variant,
  id, string) rows — shuffle volume is Σ ``(len+1)^~d`` short rows per
  input string, which is why this operator is documented for SHORT
  keys (names, titles, identifiers); near-dup long documents with
  MinHash/ngram-Jaccard instead (``ops/dedup_approx``);
* oversized variant buckets (a variant shared by more than
  ``max_bucket`` rows — degenerate corpora of near-identical strings
  whose TRUE pair set is itself quadratic) are truncated with a logged
  warning, the same documented cap as the LSH band buckets;
* pair dedup is one ``groupby(id1, id2)`` on ids only; verification is
  a stateless per-pair banded DP (O(d·len) each) inside ``map_batches``.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

logger = logging.getLogger(__name__)

__all__ = ["edit_distance_join", "edit_distance_leq"]

_BIG_STOP = 1 << 30


def edit_distance_leq(a, b, d: int) -> int:
    """Exact byte-level Levenshtein distance if ≤ ``d`` else ``-1`` —
    banded two-row DP, O(d·min(len)) per pair.  ``str`` inputs are
    UTF-8 encoded first (DuckDB ``levenshtein`` semantics)."""
    if isinstance(a, str):
        a = a.encode("utf8")
    if isinstance(b, str):
        b = b.encode("utf8")
    la, lb = len(a), len(b)
    if abs(la - lb) > d:
        return -1
    if a == b:
        return 0
    big = d + 1
    prev = [j if j <= d else big for j in range(lb + 1)]
    for i in range(1, la + 1):
        cur = [big] * (lb + 1)
        if i <= d:
            cur[0] = i
        lo = max(1, i - d)
        hi = min(lb, i + d)
        ai = a[i - 1]
        best = cur[0]
        for j in range(lo, hi + 1):
            c = prev[j - 1] + (ai != b[j - 1])
            up = prev[j] + 1
            if up < c:
                c = up
            left = cur[j - 1] + 1
            if left < c:
                c = left
            if c < big:
                cur[j] = c
            if cur[j] < best:
                best = cur[j]
        if best >= big:
            return -1
        prev = cur
    return prev[lb] if prev[lb] <= d else -1


def _deletion_variants_py(s: bytes, d: int) -> set:
    """≤``d``-deletion byte neighborhood (includes ``s``)."""
    out = {s}
    frontier = {s}
    for _ in range(d):
        nxt = set()
        for v in frontier:
            for j in range(len(v)):
                nxt.add(v[:j] + v[j + 1:])
        out |= nxt
        frontier = nxt
    return out


def edit_distance_join(
    ds,
    id_col: str,
    str_col: str,
    max_dist: int = 1,
    max_bucket: int = 4096,
    max_vec_len: int = 128,
):
    """All pairs ``(id1 < id2, dist)`` with ``levenshtein ≤ max_dist``.

    Exact (complete candidates + exact verification; see module
    docstring).  Null strings are dropped.  ``max_dist`` must be small
    (1–2): the neighborhood size is O(len^d) per string.
    """
    if max_dist < 1 or max_dist > 2:
        raise ValueError("max_dist must be 1 or 2")

    def _variants(t: pa.Table) -> pa.Table:
        ids = t.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        ss = t.column(str_col)
        if isinstance(ss, pa.ChunkedArray):
            ss = ss.combine_chunks()
        keep = pc.is_valid(ss)
        if not pc.all(keep).as_py():
            ids = ids.filter(keep)
            ss = ss.filter(keep)
        bb = pc.cast(ss, pa.binary())
        idv = np.asarray(ids.to_numpy(zero_copy_only=False), np.int64)
        rows_idx = np.arange(len(idv), dtype=np.int64)
        lens = np.asarray(
            pc.binary_length(bb).to_numpy(zero_copy_only=False), np.int64,
        )
        out_v: list = []
        out_r: list = []  # SOURCE ROW index per variant (not the id:
        # duplicate id values may carry different strings)
        vec = (
            lens <= max_vec_len
            if max_dist == 1
            else np.zeros(len(idv), bool)
        )
        if vec.any():
            sub = bb.filter(pa.array(vec)) if not vec.all() else bb
            sub_rows = rows_idx[vec]
            sub_lens = lens[vec]
            out_v.append(sub)
            out_r.append(sub_rows)
            for j in range(int(sub_lens.max()) if len(sub_lens) else 0):
                m = sub_lens > j
                rows = sub.filter(pa.array(m)) if not m.all() else sub
                pre = pc.binary_slice(rows, 0, j)
                suf = pc.binary_slice(rows, j + 1, _BIG_STOP)
                out_v.append(pc.binary_join_element_wise(pre, suf, b""))
                out_r.append(sub_rows[m] if not m.all() else sub_rows)
        rest = ~vec
        if rest.any():
            for ri, s in zip(
                rows_idx[rest], bb.filter(pa.array(rest)).to_pylist(),
            ):
                vs = _deletion_variants_py(s, max_dist)
                out_v.append(pa.array(list(vs), pa.binary()))
                out_r.append(np.full(len(vs), ri, np.int64))
        if not out_v:
            return pa.Table.from_arrays(
                [pa.array([], pa.binary()), pa.array([], pa.int64()),
                 pa.array([], pa.binary())],
                names=["v", "id", "s"],
            )
        var = pa.concat_arrays(
            [
                a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
                for a in out_v
            ],
        )
        vrow = np.concatenate(out_r)
        # (variant, source row) dedup within the batch (repeated bytes
        # produce the same variant from adjacent deletion positions)
        enc = var.dictionary_encode()
        codes = np.asarray(
            enc.indices.to_numpy(zero_copy_only=False), np.int64,
        )
        order = np.lexsort((codes, vrow))
        dup = np.zeros(len(order), bool)
        dup[1:] = (np.diff(vrow[order]) == 0) & (np.diff(codes[order]) == 0)
        first = order[~dup]
        kept_rows = vrow[first]
        take = pa.array(kept_rows)
        return pa.Table.from_arrays(
            [
                var.take(pa.array(first)),
                pa.array(idv[kept_rows], pa.int64()),
                bb.take(take),
            ],
            names=["v", "id", "s"],
        )

    rows = ds.select_columns([id_col, str_col]).map_batches(
        _variants, batch_format="pyarrow",
    )

    def _pairs(g: pa.Table) -> pa.Table:
        empty = pa.Table.from_arrays(
            [pa.array([], pa.int64()), pa.array([], pa.int64()),
             pa.array([], pa.binary()), pa.array([], pa.binary())],
            names=["id1", "id2", "s1", "s2"],
        )
        if g.num_rows < 2:
            return empty
        g = g.sort_by([("id", "ascending")])
        if g.num_rows > max_bucket:
            logger.warning(
                "edit_distance_join: a variant bucket has %d members; "
                "truncating to max_bucket=%d (pairs beyond the cap are "
                "dropped — a corpus this degenerate has a quadratic "
                "true pair set)",
                g.num_rows, max_bucket,
            )
            g = g.slice(0, max_bucket)
        ids = np.asarray(
            g.column("id").to_numpy(zero_copy_only=False), np.int64,
        )
        n = len(ids)
        a, b = np.triu_indices(n, k=1)
        # pairs with equal ids (caller's id column not unique) drop
        ne = ids[a] != ids[b]
        a, b = a[ne], b[ne]
        if not len(a):
            return empty
        s = g.column("s")
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        return pa.Table.from_arrays(
            [
                pa.array(ids[a], pa.int64()),
                pa.array(ids[b], pa.int64()),
                s.take(pa.array(a)),
                s.take(pa.array(b)),
            ],
            names=["id1", "id2", "s1", "s2"],
        )

    cand = rows.groupby("v").map_groups(_pairs, batch_format="pyarrow")

    def _first(g: pa.Table) -> pa.Table:
        return g.slice(0, 1)

    uniq = cand.groupby(["id1", "id2"]).map_groups(
        _first, batch_format="pyarrow",
    )

    def _verify(t: pa.Table) -> pa.Table:
        s1 = t.column("s1").to_pylist()
        s2 = t.column("s2").to_pylist()
        dist = np.full(t.num_rows, -1, np.int64)
        for i, (a, b) in enumerate(zip(s1, s2)):
            dist[i] = edit_distance_leq(a, b, max_dist)
        keep = dist >= 0
        t = t.filter(pa.array(keep))
        return pa.Table.from_arrays(
            [
                t.column("id1"),
                t.column("id2"),
                pa.array(dist[keep], pa.int64()),
            ],
            names=["id1", "id2", "dist"],
        )

    return uniq.map_batches(_verify, batch_format="pyarrow")
