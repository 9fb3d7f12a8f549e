"""PubMed fetch path with an injected offline transport."""

import json
from urllib.parse import parse_qs, urlparse


def _fake_transport(calls):
    def transport(url):
        calls.append(url)
        q = parse_qs(urlparse(url).query)
        pmids = q["id"][0].split(",")
        result = {"uids": pmids}
        for pmid in pmids:
            if pmid == "404":
                result[pmid] = {"error": "cannot get document summary"}
                continue
            result[pmid] = {
                "title": "Title {}".format(pmid),
                "authors": [{"name": "A {}".format(pmid)}, {"name": "B"}],
                "sortpubdate": "2021/03/0{} 00:00".format(int(pmid) % 9 + 1),
            }
        return json.dumps({"result": result}).encode()

    return transport


def test_fetch_pubmed_table_batches_and_parses():
    from pybel_ray.enrichment import fetch_pubmed_table

    calls = []
    pmids = [str(i) for i in range(1, 451)] + ["404"]
    table = fetch_pubmed_table(
        pmids, transport=_fake_transport(calls), group_size=200, sleep_seconds=0,
    )
    # 451 pmids / 200 per group -> 3 calls (reference group_size behavior)
    assert len(calls) == 3
    assert table["7"]["title"] == "Title 7"
    assert table["7"]["authors"] == "A 7|B"
    assert table["7"]["date"].startswith("2021-03-0")
    assert "404" not in table


def test_fetch_retries_then_succeeds():
    from pybel_ray.enrichment import fetch_pubmed_table

    attempts = []

    def flaky(url):
        attempts.append(url)
        if len(attempts) < 3:
            raise OSError("transient")
        return json.dumps({"result": {
            "uids": ["5"],
            "5": {"title": "t", "authors": [], "sortpubdate": ""},
        }}).encode()

    table = fetch_pubmed_table(["5"], transport=flaky, sleep_seconds=0)
    assert len(attempts) == 3
    assert table["5"]["title"] == "t"


def test_enrich_citations_fetched(ray_session):
    import ray.data

    from pybel_ray.enrichment import enrich_citations_fetched

    edges = ray.data.from_items([
        {"edge_md5": "e1", "citation_db": "PubMed", "citation_id": "12"},
        {"edge_md5": "e2", "citation_db": "PubMed", "citation_id": "34"},
        {"edge_md5": "e3", "citation_db": "DOI", "citation_id": "x/y"},
        {"edge_md5": "e4", "citation_db": None, "citation_id": None},
    ])
    calls = []
    out = enrich_citations_fetched(
        edges, transport=_fake_transport(calls), sleep_seconds=0,
    )
    rows = {r["edge_md5"]: r for r in out.take_all()}
    assert rows["e1"]["citation_title"] == "Title 12"
    assert rows["e2"]["citation_authors"] == "A 34|B"
    assert rows["e3"]["citation_title"] is None
    assert rows["e4"]["citation_title"] is None
    # only the distinct PubMed ids were requested, in one group
    assert len(calls) == 1
    assert "12%2C34" in calls[0] or "12,34" in calls[0]
