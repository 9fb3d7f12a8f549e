"""Distributed BPE learning vs the pure-Python reference — merges,
tie-breaks, overlap rule, layout invariance, encoder counts."""

import pyarrow as pa


def _ds(texts, blocks=3):
    import ray

    return ray.data.from_arrow(pa.Table.from_pylist(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)],
    )).repartition(blocks)


def _ref_freqs(texts):
    wf = {}
    for t in texts:
        for w in t.split():
            wf[w] = wf.get(w, 0) + 1
    return wf


TEXTS = [
    "low low low low low", "lower lower newest newest",
    "newest newest newest newest", "wider wider wider new new",
]


def test_learn_bpe_matches_reference(ray_session):
    from pybel_ray.ops.bpe import bpe_reference, learn_bpe

    merges, _ = learn_bpe(_ds(TEXTS), num_merges=8)
    assert merges == bpe_reference(_ref_freqs(TEXTS), 8)
    assert len(merges) == 8


def test_learn_bpe_layout_invariant(ray_session):
    from pybel_ray.ops.bpe import learn_bpe

    m1, _ = learn_bpe(_ds(TEXTS, blocks=1), num_merges=5)
    m2, _ = learn_bpe(_ds(TEXTS, blocks=7), num_merges=5)
    assert m1 == m2


def test_learn_bpe_overlap_rule(ray_session):
    """aaaa + pair (a,a) merges leftmost-non-overlapping: aa aa."""
    from pybel_ray.ops.bpe import bpe_reference, learn_bpe

    texts = ["aaaa aaaa aaaa"]
    merges, state = learn_bpe(_ds(texts), num_merges=1)
    assert merges == bpe_reference(_ref_freqs(texts), 1)
    # 'aaaa' -> ['a','a','a','a</w>']; merging (a,a) leftmost-first
    # gives ['aa','a','a</w>'] (NOT ['a','aa','a</w>'])
    [row] = state.take_all()
    assert merges[0][1:3] == ("a", "a")
    assert list(row["syms"]) == ["aa", "a", "a</w>"]


def test_apply_bpe_counts(ray_session):
    from pybel_ray.ops.bpe import apply_bpe, learn_bpe

    ds = _ds(TEXTS)
    merges, _ = learn_bpe(ds, num_merges=8)
    out = {r["doc_id"]: r["n_bpe"] for r in apply_bpe(ds, merges).take_all()}
    # computed by hand under the 8 learned merges
    assert out == {0: 5, 1: 8, 2: 4, 3: 16}


def test_learn_bpe_early_stop(ray_session):
    from pybel_ray.ops.bpe import learn_bpe

    merges, _ = learn_bpe(_ds(["ab ab"]), num_merges=50)
    # 'ab' has one pair (a, b</w>); after merging it nothing remains
    assert len(merges) == 1
