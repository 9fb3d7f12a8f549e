"""PII redaction, C4-style line filtering, benchmark decontamination."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(rows):
    import ray

    return ray.data.from_arrow(pa.Table.from_pylist(rows))


# ---------------------------------------------------------------- PII ----

PII_DOCS = [
    {"doc_id": 0, "text": "write to john.doe+x@example.co.uk or call +1 (555) 010-4242 now"},
    {"doc_id": 1, "text": "server at 10.0.255.3 and 192.168.1.1, no mail here"},
    {"doc_id": 2, "text": "clean text with nothing sensitive at all"},
    {"doc_id": 3, "text": "a@b.io b@c.net 12345678901"},
]


def test_pii_stats(ray_session):
    from pybel_ray.ops.pii import add_pii_stats

    out = {
        r["doc_id"]: r
        for r in add_pii_stats(_ds(PII_DOCS)).take_all()
    }
    assert (out[0]["n_emails"], out[0]["n_phones"], out[0]["n_ipv4"]) == (1, 1, 0)
    assert (out[1]["n_emails"], out[1]["n_phones"], out[1]["n_ipv4"]) == (0, 0, 2)
    assert (out[2]["n_emails"], out[2]["n_phones"], out[2]["n_ipv4"]) == (0, 0, 0)
    assert (out[3]["n_emails"], out[3]["n_phones"], out[3]["n_ipv4"]) == (2, 1, 0)


def test_pii_redact(ray_session):
    from pybel_ray.ops.pii import redact_pii

    out = {r["doc_id"]: r["text"] for r in redact_pii(_ds(PII_DOCS)).take_all()}
    assert out[0] == "write to <EMAIL> or call <PHONE> now"
    assert out[1] == "server at <IP> and <IP>, no mail here"
    assert out[2] == PII_DOCS[2]["text"]
    assert out[3] == "<EMAIL> <EMAIL> <PHONE>"
    # placeholders contain no PII: a second pass is a no-op
    again = {r["doc_id"]: r["text"] for r in redact_pii(_ds(
        [{"doc_id": k, "text": v} for k, v in out.items()],
    )).take_all()}
    assert again == out


def test_pii_matches_duckdb(ray_session):
    """The exact patterns produce identical counts and replacements in
    DuckDB (both engines are RE2)."""
    import duckdb

    from pybel_ray.ops.pii import PII_PATTERNS, add_pii_stats, redact_pii

    con = duckdb.connect()
    con.register("docs", pa.Table.from_pylist(PII_DOCS))
    sql = con.execute(
        r"""
        SELECT doc_id,
               len(regexp_extract_all(text, '{e}')) AS n_emails,
               regexp_replace(
                   regexp_replace(
                       regexp_replace(text, '{e}', '<EMAIL>', 'g'),
                       '{p}', '<PHONE>', 'g'),
                   '{i}', '<IP>', 'g') AS redacted
        FROM docs ORDER BY doc_id
        """.format(
            e=PII_PATTERNS["email"], p=PII_PATTERNS["phone"], i=PII_PATTERNS["ipv4"],
        ),
    ).fetchall()
    stats = {r["doc_id"]: r for r in add_pii_stats(_ds(PII_DOCS)).take_all()}
    red = {r["doc_id"]: r["text"] for r in redact_pii(_ds(PII_DOCS)).take_all()}
    for doc_id, n_emails, redacted in sql:
        assert stats[doc_id]["n_emails"] == n_emails
        assert red[doc_id] == redacted


# -------------------------------------------------------- line filter ----

LINE_DOCS = [
    {"doc_id": 0, "text": "A good long sentence right here.\nshort\n"
                          "Another fine sentence with many words!\nno punct line at all"},
    {"doc_id": 1, "text": "enable javascript to view this page.\n"
                          "Lorem ipsum dolor sit amet, consectetur.\n"
                          "This useful line definitely survives the filter."},
    {"doc_id": 2, "text": "tiny\nbits\nonly"},
    {"doc_id": 3, "text": ""},
]


def test_filter_lines_basic(ray_session):
    from pybel_ray.ops.lines import filter_lines

    out = {
        r["doc_id"]: r
        for r in filter_lines(
            _ds(LINE_DOCS), min_words=3, require_terminal_punct=True,
            drop_markers=("javascript", "lorem ipsum", "{"),
        ).take_all()
    }
    assert out[0]["text"] == (
        "A good long sentence right here.\nAnother fine sentence with many words!"
    )
    assert (out[0]["n_lines"], out[0]["n_lines_kept"]) == (4, 2)
    assert out[1]["text"] == "This useful line definitely survives the filter."
    assert out[2]["text"] == ""
    assert (out[2]["n_lines"], out[2]["n_lines_kept"]) == (3, 0)
    assert out[3]["text"] == ""
    assert (out[3]["n_lines"], out[3]["n_lines_kept"]) == (1, 0)


def test_filter_lines_no_punct_rule(ray_session):
    from pybel_ray.ops.lines import filter_lines

    out = {
        r["doc_id"]: r["text"]
        for r in filter_lines(_ds(LINE_DOCS), min_words=3).take_all()
    }
    assert out[0] == (
        "A good long sentence right here.\n"
        "Another fine sentence with many words!\nno punct line at all"
    )


def test_filter_lines_custom_sep(ray_session):
    from pybel_ray.ops.lines import filter_lines

    docs = [{"doc_id": 0, "text": "one two three|a b|x y z w"}]
    out = filter_lines(_ds(docs), sep="|", min_words=3).take_all()[0]
    assert out["text"] == "one two three|x y z w"
    assert (out["n_lines"], out["n_lines_kept"]) == (3, 2)


# -------------------------------------------------------- decontam -------

BENCH = [
    {"doc_id": 100, "text": "what is the capital of france and when was it founded"},
    {"doc_id": 101, "text": "solve for x in the quadratic equation below please now"},
]
CORPUS = [
    # contains the 8-gram "what is the capital of france and when"
    {"doc_id": 0, "text": "trivia night asked what is the capital of france and when was it founded by whom"},
    # shares only a 5-gram — not contaminated at n=8
    {"doc_id": 1, "text": "the capital of france and its museums are lovely"},
    {"doc_id": 2, "text": "completely unrelated text about trains and model railways in the alps today"},
    # two distinct overlapping benchmark 8-grams from one source sentence
    {"doc_id": 3, "text": "solve for x in the quadratic equation below please now and forever"},
]


def test_flag_contamination(ray_session):
    from pybel_ray.ops.decontam import flag_contamination

    out = {
        r["doc_id"]: r
        for r in flag_contamination(_ds(CORPUS), _ds(BENCH), n=8).take_all()
    }
    assert out[0]["contaminated"] is True and out[0]["n_contaminated"] >= 1
    assert out[1]["contaminated"] is False and out[1]["n_contaminated"] == 0
    assert out[2]["contaminated"] is False
    # doc 3 contains the benchmark's 8-grams at several offsets:
    # "solve for x ... below please" and shifted variants
    assert out[3]["contaminated"] is True and out[3]["n_contaminated"] >= 2


def test_flag_contamination_counts_distinct(ray_session):
    from pybel_ray.ops.decontam import flag_contamination

    bench = [{"doc_id": 0, "text": "a b c d e f g h"}]
    corpus = [
        # the gram "a b c d e f g h" appears twice -> distinct count 1
        {"doc_id": 1, "text": "a b c d e f g h x a b c d e f g h"},
        {"doc_id": 2, "text": "a b c d e f g x"},
    ]
    out = {
        r["doc_id"]: r
        for r in flag_contamination(_ds(corpus), _ds(bench), n=8).take_all()
    }
    assert out[1]["n_contaminated"] == 1
    assert out[2]["n_contaminated"] == 0


def test_flag_contamination_short_docs(ray_session):
    from pybel_ray.ops.decontam import flag_contamination

    bench = [{"doc_id": 0, "text": "a b c d e f g h"}]
    corpus = [{"doc_id": 1, "text": "a b c"}, {"doc_id": 2, "text": ""}]
    out = {
        r["doc_id"]: r["n_contaminated"]
        for r in flag_contamination(_ds(corpus), _ds(bench), n=8).take_all()
    }
    assert out == {1: 0, 2: 0}


def test_gram_set_reuse(ray_session):
    from pybel_ray.ops.decontam import benchmark_ngrams, flag_contamination

    grams = benchmark_ngrams(_ds(BENCH), n=8)
    assert "what is the capital of france and when" in grams.to_pylist()
    out = {
        r["doc_id"]: r["contaminated"]
        for r in flag_contamination(_ds(CORPUS), n=8, gram_set=grams).take_all()
    }
    assert out[0] is True and out[2] is False


def test_gopher_rules_planted_fail_arms(ray_session):
    """Every Gopher rule's FAIL arm fires on a crafted doc (the synthetic
    corpus is single-line word soup, so bullet/ellipsis/mean-len fails
    only exist here), and every counter matches a DuckDB recompute."""
    import duckdb
    import pandas as pd
    import ray

    from pybel_ray.ops.text import STOPWORDS, gopher_rules

    docs = pd.DataFrame({
        "doc_id": range(7),
        "text": [
            "the cat and the hat sat on a mat for it now",  # passes all but meanlen?
            "short",                                  # fails r_words
            "- b\n- b\n- b\nplain",                  # fails r_bullet (3/4)
            "more...\nagain...\nyet...\nplain",      # fails r_ellipsis (3/4)
            "aaaaaaaaaaaaaaaaaaaa bbbbbbbbbbbbbbbbbbbb ccc",  # fails r_mean_len (>10)
            "1 2 3 4 5 6 7 8 9 10",                  # fails r_alpha (0 alpha words)
            None,                                     # null text == empty
        ],
    })
    out = gopher_rules(
        ray.data.from_pandas(docs).repartition(3), min_words=3,
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)

    assert not out.loc[1, "r_words"]
    assert not out.loc[2, "r_bullet"] and out.loc[3, "r_bullet"]
    assert not out.loc[3, "r_ellipsis"] and out.loc[2, "r_ellipsis"]
    assert not out.loc[4, "r_mean_len"]
    assert not out.loc[5, "r_alpha"]
    assert not out.loc[6, "gopher_ok"]
    assert not out["gopher_ok"].iloc[1:].any()

    con = duckdb.connect()
    con.register("documents", docs)
    stop_terms = " + ".join(
        "CASE WHEN position(' {w} ' IN padded) > 0 THEN 1 ELSE 0 END".format(
            w=w,
        )
        for w in STOPWORDS
    )
    sql = r"""
        WITH base AS (
            SELECT doc_id, coalesce(text,'') AS text,
                   ' ' || lower(coalesce(text,'')) || ' ' AS padded
            FROM documents
        ), w AS (
            SELECT doc_id, text, padded,
                   regexp_split_to_array(trim(text), '\s+') AS words,
                   string_split(text, chr(10)) AS lines
            FROM base)
        SELECT doc_id,
          CAST(len(words) AS BIGINT) AS n_words,
          CAST(length(regexp_replace(text, '\s', '', 'g')) AS BIGINT)
              AS n_word_chars,
          CAST(len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]')))
              AS BIGINT) AS n_alpha_words,
          CAST(len(lines) AS BIGINT) AS n_lines,
          CAST(len(list_filter(lines, l -> regexp_matches(l, '^\s*[-\*]')))
              AS BIGINT) AS n_bullet_lines,
          CAST(len(list_filter(lines, l -> regexp_matches(l, '\.\.\.\s*$')))
              AS BIGINT) AS n_ellipsis_lines,
          CAST({stop} AS BIGINT) AS n_stop_present
        FROM w ORDER BY doc_id
    """.format(stop=stop_terms)
    ora = con.execute(sql).df()
    cols = list(ora.columns)
    pd.testing.assert_frame_equal(
        out[cols].astype("int64"), ora.astype("int64"),
    )


def test_type_token_ratio_hand_checked(ray_session):
    import pyarrow as pa
    import ray

    from pybel_ray.ops.text import type_token_ratio

    t = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": ["a b a b c", "x x x x"],
    })
    out = type_token_ratio(ray.data.from_arrow(t)).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert list(out.n_tokens) == [5, 4]
    assert list(out.n_distinct) == [3, 1]
    assert list(out.ttr_e6) == [3 * 1_000_000 // 5, 1_000_000 // 4]


def test_normalize_text_unicode_agrees_with_duckdb(ray_session):
    import duckdb
    import pyarrow as pa
    import ray

    from pybel_ray.ops.text import normalize_text

    # decomposed e + combining acute, uppercase, tabs/newlines
    raw = "Café  \t MiXeD\nCASE Éclair"
    t = pa.table({"doc_id": pa.array([0], pa.int64()), "text": [raw]})
    out = normalize_text(ray.data.from_arrow(t)).to_pandas()
    sql = duckdb.sql(
        "SELECT trim(regexp_replace(nfc_normalize(lower(?)),"
        " '\\s+', ' ', 'g')) AS n", params=[raw],
    ).fetchone()[0]
    assert out.norm_text[0] == sql == "café mixed case éclair"


def test_source_overlap_text_mode_planted(ray_session):
    import pyarrow as pa
    import ray

    from pybel_ray.ops.text import source_overlap

    # doc "dup one" appears in A and B; "dup two" in A, B and C;
    # within-source duplicates count once (distinct md5 per source)
    rows = [
        ("dup one", "A"), ("dup one", "B"), ("dup one", "A"),
        ("dup two", "A"), ("dup two", "B"), ("dup two", "C"),
        ("only a", "A"), ("only c", "C"),
    ]
    t = pa.table({
        "text": [r[0] for r in rows],
        "source": [r[1] for r in rows],
    })
    out = source_overlap(
        ray.data.from_arrow(t).repartition(3),
    ).to_pandas()
    got = {(r.src_a, r.src_b): r.n_shared for r in out.itertuples()}
    assert got == {("A", "B"): 2, ("A", "C"): 1, ("B", "C"): 1}


def test_type_token_ratio_drops_null_text(ray_session):
    import pyarrow as pa
    import ray

    from pybel_ray.ops.text import type_token_ratio

    t = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": ["a b", None],
    })
    out = type_token_ratio(ray.data.from_arrow(t)).to_pandas()
    assert list(out.doc_id) == [0]


# ---------------------------------------------------------------------------
# substring_dedup (ExactSubstr-style span removal)
# ---------------------------------------------------------------------------

_SPAN_SQL = r"""
WITH w AS (
    SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
    FROM t WHERE text IS NOT NULL
),
tok AS (
    SELECT doc_id, i, ws[i] AS tok
    FROM w, LATERAL (SELECT unnest(generate_series(1, len(ws))) AS i)
),
ng AS (
    SELECT doc_id, i, array_to_string(list_slice(ws, i, i + {nm1}), ' ') AS g
    FROM w, LATERAL (SELECT unnest(generate_series(1, len(ws) - {nm1})) AS i)
),
gc AS (SELECT g FROM ng GROUP BY g HAVING count(*) >= 2),
hit AS (SELECT doc_id, i FROM ng JOIN gc USING (g)),
rm AS (
    SELECT DISTINCT tk.doc_id, tk.i
    FROM tok tk JOIN hit h
    ON tk.doc_id = h.doc_id AND tk.i BETWEEN h.i AND h.i + {nm1}
),
agg AS (
    SELECT tk.doc_id, count(*) AS n_tokens, count(r.i) AS n_removed,
           string_agg(CASE WHEN r.i IS NULL THEN tk.tok END,
                      ' ' ORDER BY tk.i) AS clean_text
    FROM tok tk LEFT JOIN rm r ON r.doc_id = tk.doc_id AND r.i = tk.i
    GROUP BY tk.doc_id
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_removed AS BIGINT) AS n_removed, clean_text
FROM agg ORDER BY doc_id
"""


def _span_corpus():
    rng = np.random.default_rng(17)
    vocab = list("abcdefghij")
    rows = []
    for i in range(80):
        rows.append((i, " ".join(rng.choice(vocab, size=rng.integers(1, 30)))))
    # planted exact 8-gram overlaps and degenerate repeats
    rows += [
        (100, "p q r s t u v w END one"),
        (101, "start p q r s t u v w tail"),
        (102, "z " * 20),
        (103, None),
        (104, ""),
    ]
    return pa.table({
        "doc_id": pa.array([d for d, _ in rows], pa.int64()),
        "text": pa.array([s.strip() if isinstance(s, str) else s
                          for _, s in rows], pa.string()),
    })


def _span_ref(t, n):
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    return con.execute(_SPAN_SQL.format(nm1=n - 1)).fetchdf()


@pytest.mark.parametrize("budget", [2_000_000, 0])
def test_substring_dedup_matches_sql_both_paths(ray_session, budget):
    import ray.data

    from pybel_ray.ops.decontam import substring_dedup

    t = _span_corpus()
    out = substring_dedup(
        ray.data.from_arrow(t).repartition(5), n=8,
        broadcast_budget=budget,
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    ref = _span_ref(t, 8)
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_substring_dedup_overlapping_spans_merge(ray_session):
    import ray.data

    from pybel_ray.ops.decontam import substring_dedup

    # two overlapping duplicated 4-gram windows cover a 5-token span
    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([
            "a b c d e keepme",
            "x a b c d y",      # dup window (a b c d)
            "z b c d e w",      # dup window (b c d e)
        ]),
    })
    out = substring_dedup(
        ray.data.from_arrow(t), n=4,
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    # doc 0: both windows duplicated -> tokens a..e removed, keepme stays
    assert out.loc[0, "clean_text"] == "keepme"
    assert out.loc[0, "n_removed"] == 5
    ref = _span_ref(t, 4)
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_substring_dedup_no_dups_passthrough(ray_session):
    import ray.data

    from pybel_ray.ops.decontam import substring_dedup

    t = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["w1 w2 w3", "w4 w5 w6"]),
    })
    out = substring_dedup(ray.data.from_arrow(t), n=2).to_pandas()
    assert (out["n_removed"] == 0).all()
    assert sorted(out["clean_text"]) == ["w1 w2 w3", "w4 w5 w6"]
