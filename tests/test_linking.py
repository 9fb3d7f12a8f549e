"""Entity linking: vectorized n-gram join vs Aho–Corasick trie vs bucketed
join — all three engines must emit identical mention rows.

The corpus-vs-oracle check itself lives in test_queries_oracle.py (the
``doc_entity_mentions*`` queries share one DuckDB oracle); here we cover
engine equality on a planted corpus, the registry-derived gazetteer, and
multi-word/boundary edge cases the synthetic corpus doesn't exercise.
"""

import pyarrow as pa


def _ds(rows):
    import ray

    return ray.data.from_arrow(pa.Table.from_pylist(rows))


DOCS = [
    {"doc_id": 0, "text": "Aspirin inhibits COX-2; aspirin, again! protein kinase C too"},
    {"doc_id": 1, "text": "the protein kinase c pathway (protein kinase) aspirinx naspirin"},
    {"doc_id": 2, "text": "cox 2 and COX  2 and protein-kinase-C"},
    {"doc_id": 3, "text": ""},
    {"doc_id": 4, "text": "!!! ??? ..."},
    {"doc_id": 5, "text": None},
]

ALIASES = pa.Table.from_pylist([
    {"mention": "aspirin", "curie": "CHEBI:15365"},
    {"mention": "cox 2", "curie": "HGNC:PTGS2"},
    {"mention": "protein kinase c", "curie": "HGNC:PRKC"},
    {"mention": "protein kinase", "curie": "FPLX:PKC"},
])


def _key(rows):
    return sorted(
        (r["doc_id"], r["pos"], r["gram"], r["mention"], r["curie"]) for r in rows
    )


def test_vectorized_matches(ray_session):
    from pybel_ray.ops.linking import link_entities

    rows = _key(link_entities(_ds(DOCS), ALIASES).take_all())
    # doc 0: aspirin@1, cox 2@3 ("COX-2" splits), aspirin@5,
    #        protein kinase c@7 + nested protein kinase@7
    assert (0, 1, 1, "aspirin", "CHEBI:15365") in rows
    assert (0, 3, 2, "cox 2", "HGNC:PTGS2") in rows
    assert (0, 5, 1, "aspirin", "CHEBI:15365") in rows
    assert (0, 7, 3, "protein kinase c", "HGNC:PRKC") in rows
    assert (0, 7, 2, "protein kinase", "FPLX:PKC") in rows
    # doc 1: substring-containing words do NOT match (token boundaries)
    assert not any(r[0] == 1 and r[3] == "aspirin" for r in rows)
    # doc 2: hyphen/multi-space variants normalize to matches
    assert (2, 1, 2, "cox 2", "HGNC:PTGS2") in rows
    assert (2, 4, 2, "cox 2", "HGNC:PTGS2") in rows
    assert (2, 7, 3, "protein kinase c", "HGNC:PRKC") in rows
    # empty / punctuation-only / null docs emit nothing
    assert not any(r[0] in (3, 4, 5) for r in rows)


def test_three_engines_identical(ray_session):
    import ray

    from pybel_ray.ops.linking import (
        link_entities, link_entities_bucketed, link_entities_trie,
    )

    vec = _key(link_entities(_ds(DOCS), ALIASES).take_all())
    trie = _key(link_entities_trie(_ds(DOCS), ALIASES, concurrency=(1, 2)).take_all())
    buck = _key(link_entities_bucketed(
        _ds(DOCS), ray.data.from_arrow(ALIASES),
        gram_lengths=(1, 2, 3), num_buckets=4,
    ).take_all())
    assert vec == trie
    assert vec == buck
    assert len(vec) > 0


def test_entity_link_counts(ray_session):
    from pybel_ray.ops.linking import entity_link_counts, link_entities

    links = link_entities(_ds(DOCS), ALIASES)
    out = {r["curie"]: (r["n_mentions"], r["n_docs"]) for r in
           entity_link_counts(links).take_all()}
    assert out["CHEBI:15365"] == (2, 1)       # aspirin twice in doc 0 only
    assert out["HGNC:PTGS2"] == (3, 2)        # cox 2: doc0 ×1, doc2 ×2
    assert out["HGNC:PRKC"] == (3, 3)        # once in each of docs 0, 1, 2
    assert out["FPLX:PKC"] == (4, 3)          # nested under each PKC + bare in doc1


def test_registry_gazetteer(ray_session):
    from pybel_ray.ops.linking import alias_table_from_registry, link_entities
    from pybel_ray.resources import ResourceRegistry

    reg = ResourceRegistry(namespaces={
        "https://example.org/hgnc.belns": {
            "names": {"AKT1": "GP", "MAPK1": "GP", "Protein Kinase C": "GP"},
            "ids": {}, "id_name": {},
        },
    })
    aliases = alias_table_from_registry(reg)
    got = dict(zip(
        aliases.column("mention").to_pylist(),
        aliases.column("curie").to_pylist(),
    ))
    assert got["akt1"] == "hgnc:AKT1"
    assert got["protein kinase c"] == "hgnc:Protein Kinase C"

    rows = link_entities(
        _ds([{"doc_id": 9, "text": "AKT1 phosphorylates; protein kinase C acts"}]),
        aliases,
    ).take_all()
    curies = {r["curie"] for r in rows}
    assert curies == {"hgnc:AKT1", "hgnc:Protein Kinase C"}


def test_corpus_alias_table_deterministic(ray_session):
    import ray

    from pybel_ray.ops.linking import alias_table_from_corpus

    ds1 = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", override_num_blocks=2,
    )
    ds2 = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", override_num_blocks=7,
    )
    a1 = alias_table_from_corpus(ds1)
    a2 = alias_table_from_corpus(ds2)
    assert a1.equals(a2)  # block-layout invariant
    assert a1.num_rows > 0


def test_pmi_scores_match_brute(ray_session):
    import math

    import ray

    from pybel_ray.ops.linking import (
        alias_table_from_registry,
        link_entities,
        pmi_scores,
    )

    # planted corpus: X and Y always co-occur (high PMI); X and Z rarely
    # (negative PMI exercises the round-half-up on negative values)
    docs = []
    for i in range(60):
        words = ["xxxxx", "yyyyy"] if i % 2 == 0 else ["zzzzz"]
        if i == 0:
            words = ["xxxxx", "zzzzz"]
        docs.append({"doc_id": i, "text": " ".join(words + ["filler"])})
    aliases = pa.Table.from_pylist(
        [{"mention": m, "curie": "C:" + m} for m in ("xxxxx", "yyyyy", "zzzzz")],
    )
    ds = ray.data.from_arrow(pa.Table.from_pylist(docs)).repartition(4)
    links = link_entities(ds, aliases)
    out = pmi_scores(links, n_docs=60).to_pandas()

    # brute-force reference over the planted membership
    n_docs_of = {"C:xxxxx": 30, "C:yyyyy": 29, "C:zzzzz": 31}
    pairs = {("C:xxxxx", "C:yyyyy"): 29, ("C:xxxxx", "C:zzzzz"): 1}
    assert len(out) == len(pairs)
    for r in out.itertuples():
        n_ab = pairs[(r.curie_a, r.curie_b)]
        assert r.n_ab == n_ab
        na, nb = n_docs_of[r.curie_a], n_docs_of[r.curie_b]
        pmi = math.log((60.0 * n_ab) / (na * nb))
        assert r.pmi_e6 == math.floor(pmi * 1e6 + 0.5)
    # the rare pair scores negative, the systematic pair positive
    by_pair = {(r.curie_a, r.curie_b): r.pmi_e6 for r in out.itertuples()}
    assert by_pair[("C:xxxxx", "C:yyyyy")] > 0
    assert by_pair[("C:xxxxx", "C:zzzzz")] < 0


def test_pmi_scores_empty_links(ray_session):
    import ray

    from pybel_ray.ops.linking import pmi_scores

    links = ray.data.from_arrow(pa.Table.from_arrays(
        [pa.array([], pa.int64()), pa.array([], pa.string())],
        names=["doc_id", "curie"],
    ))
    out = pmi_scores(links, n_docs=10).to_pandas()
    assert len(out) == 0
