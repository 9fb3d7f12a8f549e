"""Bigram LM operators vs hand-computed references (the integer
familiarity columns also go through the DuckDB oracle gate in
test_queries_oracle.py as doc_bigram_familiarity)."""

import math

import pyarrow as pa


TEXTS = [
    "the cat sat",            # doc 0 (model doc)
    "the cat ran",            # doc 1
    "a dog sat",              # doc 2
    "single",                 # doc 3: no bigrams
    "the cat sat the cat",    # doc 4
]


def _ds(blocks=3):
    import ray

    return ray.data.from_arrow(pa.Table.from_pylist(
        [{"doc_id": i, "text": t} for i, t in enumerate(TEXTS)],
    )).repartition(blocks)


def _model(ray_session_unused=None):
    import ray

    from pybel_ray.ops.lm import train_bigram_counts

    model_ds = ray.data.from_arrow(pa.Table.from_pylist(
        [{"doc_id": 0, "text": TEXTS[0]}],
    ))
    return train_bigram_counts(model_ds).materialize()


def test_train_bigram_counts(ray_session):
    from pybel_ray.ops.lm import train_bigram_counts

    out = {(r["w1"], r["w2"]): r["n"] for r in
           train_bigram_counts(_ds()).take_all()}
    assert out[("the", "cat")] == 4   # docs 0, 1, 4 (twice in doc 4)
    assert out[("cat", "sat")] == 2   # docs 0, 4
    assert out[("sat", "the")] == 1   # doc 4 crosses 'sat the'
    assert out[("a", "dog")] == 1
    assert ("cat", "the") not in out


def test_familiarity_matches_reference(ray_session):
    from pybel_ray.ops.lm import score_bigram_familiarity

    out = {r["doc_id"]: (r["n_bigrams"], r["n_known"], r["sum_model_counts"])
           for r in score_bigram_familiarity(_ds(), _model()).take_all()}
    # model = bigrams of doc 0: (the,cat):1, (cat,sat):1
    assert out[0] == (2, 2, 2)
    assert out[1] == (2, 1, 1)        # only (the, cat) known
    assert out[2] == (2, 0, 0)
    assert out[3] == (0, 0, 0)        # no bigrams
    # doc 4: the-cat (known, x2) + cat-sat (known) + sat-the (unknown)
    assert out[4] == (4, 3, 3)


def test_perplexity_matches_reference(ray_session):
    from pybel_ray.ops.lm import add_perplexity

    V = 100
    out = {r["doc_id"]: r["bits_per_token"] for r in
           add_perplexity(_ds(), _model(), vocab_size=V).take_all()}
    # model: (the,cat):1, (cat,sat):1; marginals: the:1, cat:1
    def bits(joint, marg):
        return -math.log2((joint + 1) / (marg + V))

    exp0 = (bits(1, 1) + bits(1, 1)) / 2
    assert abs(out[0] - exp0) < 1e-12
    exp1 = (bits(1, 1) + bits(0, 1)) / 2     # (cat, ran) unseen, marg(cat)=1
    assert abs(out[1] - exp1) < 1e-12
    exp2 = (bits(0, 0) + bits(0, 0)) / 2     # all unseen, unseen marginals
    assert abs(out[2] - exp2) < 1e-12
    assert out[3] is None                    # no bigrams -> null
