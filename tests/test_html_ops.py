"""HTML link extraction, tag stripping, host graph."""

import pyarrow as pa


def _pages():
    import ray

    rows = [
        {
            "url": "https://a.example.com/p/1",
            "html": (
                '<p>hi</p><a href="https://b.example.com/x">abs</a>'
                '<a href="/rel/2">rel</a>'
                '<a href="mailto:x@y.z">mail</a>'
                '<a href="#frag">frag</a>'
                '<a href="//cdn.example.com/p">proto-rel</a>'
            ),
        },
        {
            "url": "https://b.example.com/p/2",
            "html": '<a href="https://a.example.com/y">back</a>',
        },
        {"url": "https://c.example.com/p/3", "html": None},
    ]
    return ray.data.from_items(rows).repartition(2)


def test_extract_links_resolution(ray_session):
    from pybel_ray.ops.html import extract_links

    out = extract_links(_pages()).to_pandas()
    got = sorted(zip(out.src_url, out.dst_url, out.anchor))
    assert got == [
        ("https://a.example.com/p/1", "https://a.example.com/rel/2", "rel"),
        ("https://a.example.com/p/1", "https://b.example.com/x", "abs"),
        ("https://b.example.com/p/2", "https://a.example.com/y", "back"),
    ]


def test_host_graph_counts(ray_session):
    from pybel_ray.ops.html import extract_links, host_graph

    out = host_graph(extract_links(_pages())).to_pandas()
    got = {(r.src_host, r.dst_host): r.n for r in out.itertuples()}
    assert got == {
        ("a.example.com", "a.example.com"): 1,
        ("a.example.com", "b.example.com"): 1,
        ("b.example.com", "a.example.com"): 1,
    }


def test_strip_tags(ray_session):
    import ray

    from pybel_ray.ops.html import strip_tags

    ds = ray.data.from_items(
        [{"html": "<html><body><p>a  b</p><br/>c</body></html>"}],
    )
    out = strip_tags(ds, "html").to_pandas()
    assert out.text[0] == "a b c"


def test_host_graph_layout_invariant(ray_session):
    import ray

    from pybel_ray.ops.html import host_graph

    rows = [
        {"src_url": "https://s%d.ex/x" % (i % 3),
         "dst_url": "https://d%d.ex/y" % (i % 5)}
        for i in range(200)
    ]

    def tbl(blocks):
        ds = ray.data.from_items(rows).repartition(blocks)
        return (
            host_graph(ds)
            .to_pandas()
            .sort_values(["src_host", "dst_host"])
            .reset_index(drop=True)
        )

    assert tbl(1).equals(tbl(7))


def test_anchor_stats_counts(ray_session):
    from pybel_ray.ops.html import anchor_stats, extract_links

    out = anchor_stats(extract_links(_pages())).to_pandas()
    got = {(r.dst_host, r.anchor): r.n for r in out.itertuples()}
    assert got == {
        ("a.example.com", "rel"): 1,
        ("b.example.com", "abs"): 1,
        ("a.example.com", "back"): 1,
    }


def test_domain_rollup_varied_hosts(ray_session):
    import ray

    from pybel_ray.ops.urls import domain_rollup

    rows = [
        {"url": "https://a.news.co/x"},
        {"url": "https://b.news.co/y"},
        {"url": "https://cdn.img.io/z"},
        {"url": "http://img.io/w"},
        {"url": "not a url"},
    ]
    out = domain_rollup(ray.data.from_items(rows)).to_pandas()
    got = {(r.reg_domain, r.tld): r.n_urls for r in out.itertuples()}
    assert got == {
        ("news.co", "co"): 2,
        ("img.io", "io"): 2,
        ("", ""): 1,
    }


def test_canonicalize_urls_cases(ray_session):
    import pyarrow as pa
    import ray

    from pybel_ray.ops.urls import canonicalize_urls

    urls = [
        "HTTPS://Site3.Example.com:443/a/?utm_source=x&id=7#frag",
        "http://host.example.com:80/b/",
        "https://h.example.com",
        "http://h.example.com/c?ref=foo&q=1&utm_campaign=z",
        "https://h.example.com:8443/x",      # non-default port kept
        "ftp://h.example.com:80/x",          # :80 only default for http
        "http://h.example.com/?gclid=1&fbclid=2",
        "not a url",
        None,
        "https://h.example.com/",
    ]
    t = pa.Table.from_arrays([pa.array(urls, pa.string())], names=["url"])
    out = canonicalize_urls(
        ray.data.from_arrow(t).repartition(2),
    ).to_pandas()
    got = dict(zip(out["url"], out["canonical_url"]))
    assert got[urls[0]] == "https://site3.example.com/a?id=7"
    assert got[urls[1]] == "http://host.example.com/b"
    assert got[urls[2]] == "https://h.example.com/"
    assert got[urls[3]] == "http://h.example.com/c?q=1"
    assert got[urls[4]] == "https://h.example.com:8443/x"
    assert got[urls[5]] == "ftp://h.example.com:80/x"
    assert got[urls[6]] == "http://h.example.com/"
    assert got[urls[7]] == ""
    assert got[None] == ""
    assert got[urls[9]] == "https://h.example.com/"


def test_resolve_redirects_chains_and_cycle(ray_session):
    import pyarrow as pa
    import ray

    from pybel_ray.ops.urls import resolve_redirects

    # chain a->b->c->d (d terminal), lone e->f, cycle x->y->z->x
    t = pa.Table.from_arrays(
        [pa.array(["a", "b", "c", "e", "x", "y", "z"], pa.string()),
         pa.array(["b", "c", "d", "f", "y", "z", "x"], pa.string())],
        names=["src", "dst"],
    )
    out = resolve_redirects(
        ray.data.from_arrow(t).repartition(3), max_doublings=4,
    ).to_pandas()
    got = {r.src: (r.terminal, r.resolved) for r in out.itertuples()}
    assert got["a"] == ("d", 1)
    assert got["b"] == ("d", 1)
    assert got["c"] == ("d", 1)
    assert got["e"] == ("f", 1)
    # cycle nodes: after 2^4 = 16 steps from dst, 16 % 3 rotations;
    # unresolved flag 0, and deterministic
    assert got["x"][1] == 0 and got["y"][1] == 0 and got["z"][1] == 0
    assert got["x"][0] in {"x", "y", "z"}

    # long chain 0->1->...->20 resolves with doublings (2^5 >= 20)
    n = 21
    t2 = pa.Table.from_arrays(
        [pa.array([f"u{i}" for i in range(n - 1)], pa.string()),
         pa.array([f"u{i+1}" for i in range(n - 1)], pa.string())],
        names=["src", "dst"],
    )
    out2 = resolve_redirects(
        ray.data.from_arrow(t2).repartition(4), max_doublings=5,
    ).to_pandas()
    assert set(out2["terminal"]) == {f"u{n-1}"}
    assert set(out2["resolved"]) == {1}
