"""URL parsing / canonicalization (web.parse_urls / normalize_urls).

Not in the frozen 67-entry driver registry, so the oracle evidence
lives HERE: a full DuckDB re-derivation with the identical
Java-regex ∩ RE2 patterns, compared row-for-row over a mixed
hand-tricky + generated URL table fed to both engines from the same
pandas frame.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from fuserank_spark.pipeline_ext.web import normalize_urls, parse_urls

TRICKY = [
    "HTTP://User:pw@Example.COM:80/a/b?utm_source=x&b=2&a=1#frag",
    "https://sub.example.co.uk",
    "https://example.com:8443/x?ref=aa&fbclid=1",
    "not a url",
    "",
    None,
    "ftp://files.example.net:21/pub/",
    "https://example.org./",
    "https://www.example.com/search?q=a+b&utm_medium=email&gclid=z",
    "http://example.com?x=1#only-fragment",
    "https://a.b.c.d.example.ac.jp/path/?z=9&y=8",
    "http://localhost:8080/dev",
    "https://example.com//double//slash?",
]


@pytest.fixture(scope="module")
def urls(spark, duck):
    rows = [(i, u) for i, u in enumerate(TRICKY)]
    base = len(TRICKY)
    for i in range(300):
        tail = ".co.uk" if i % 7 == 0 else ".com"
        u = (
            f"https://site{i % 50}.example{tail}/p/{i}"
            f"?id={i}&utm_campaign=c{i}&b={i % 3}&a={i % 5}"
        )
        if i % 11 == 0:
            u = u.upper()
        rows.append((base + i, u))
    pdf = pd.DataFrame(rows, columns=["id", "url"])
    duck.register("urls", pdf)
    sdf = spark.createDataFrame(pdf).select("id", F.col("url").cast("string").alias("url"))
    sdf.cache().count()
    yield sdf
    duck.unregister("urls")


_PARSE_ORACLE = r"""
WITH p AS (
  SELECT id, url,
    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
    regexp_replace(regexp_extract(url, '^[^:/?#]+://([^/?#]*)', 1),
                   '^.*@', '', 'g') AS hostport,
    regexp_extract(url, '^[^:/?#]+://[^/?#]*([^?#]*)', 1) AS path,
    regexp_extract(url, '\?([^#]*)', 1) AS query
  FROM urls WHERE url IS NOT NULL),
h AS (
  SELECT *, regexp_replace(lower(regexp_replace(hostport, ':[0-9]*$', '', 'g')),
                           '\.$', '', 'g') AS host,
         regexp_extract(hostport, ':([0-9]+)$', 1) AS port_s
  FROM p),
d AS (
  SELECT *, string_split(host, '.') AS ls, len(string_split(host, '.')) AS n FROM h)
SELECT id, scheme, host,
       CASE WHEN port_s <> '' THEN CAST(port_s AS INT) END AS port,
       path, query,
       CASE WHEN n <= 2 THEN host
            WHEN n >= 3 AND length(ls[n]) = 2
                 AND ls[n-1] IN ('co','com','net','org','gov','ac','edu')
            THEN array_to_string(ls[n-2:n], '.')
            ELSE array_to_string(ls[n-1:n], '.') END AS domain
FROM d ORDER BY id
"""

_TRACK = "fbclid|gclid|msclkid|ref|igshid"
_NORM_ORACLE = rf"""
WITH p AS (
  SELECT id, url,
    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
    regexp_replace(regexp_extract(url, '^[^:/?#]+://([^/?#]*)', 1),
                   '^.*@', '', 'g') AS hostport,
    regexp_extract(url, '^[^:/?#]+://[^/?#]*([^?#]*)', 1) AS path,
    regexp_extract(url, '\?([^#]*)', 1) AS query
  FROM urls WHERE url IS NOT NULL),
h AS (
  SELECT *, regexp_replace(lower(regexp_replace(hostport, ':[0-9]*$', '', 'g')),
                           '\.$', '', 'g') AS host,
         regexp_extract(hostport, ':([0-9]+)$', 1) AS port_s
  FROM p),
q AS (
  SELECT *, array_to_string(list_sort(list_filter(
      CASE WHEN query = '' THEN CAST([] AS VARCHAR[])
           ELSE string_split(query, '&') END,
      x -> NOT (regexp_matches(x, '^(utm_)')
                OR regexp_matches(x, '^({_TRACK})=')
                OR regexp_matches(x, '^({_TRACK})$')))), '&') AS qnorm
  FROM h)
SELECT id,
  CASE WHEN scheme = '' THEN ''
       ELSE scheme || '://' || host
            || CASE WHEN port_s <> '' AND NOT ((scheme='http' AND port_s='80')
                                            OR (scheme='https' AND port_s='443'))
                    THEN ':' || port_s ELSE '' END
            || CASE WHEN path = '' THEN '/' ELSE path END
            || CASE WHEN qnorm <> '' THEN '?' || qnorm ELSE '' END
  END AS url_norm
FROM q ORDER BY id
"""


def test_parse_urls_matches_duckdb_rederivation(urls, duck):
    got = {
        r["id"]: (r["scheme"], r["host"], r["port"], r["path"], r["query"], r["domain"])
        for r in parse_urls(urls)
        .filter(F.col("url").isNotNull())
        .select("id", "scheme", "host", "port", "path", "query", "domain")
        .collect()
    }
    want = {r[0]: tuple(r[1:]) for r in duck.execute(_PARSE_ORACLE).fetchall()}
    assert got == want


def test_normalize_urls_matches_duckdb_rederivation(urls, duck):
    got = {
        r["id"]: r["url_norm"]
        for r in normalize_urls(urls)
        .filter(F.col("url").isNotNull())
        .select("id", "url_norm")
        .collect()
    }
    want = {r[0]: r[1] for r in duck.execute(_NORM_ORACLE).fetchall()}
    assert got == want


def test_normalization_hand_expected(spark):
    """Normative cases: case folding, userinfo/default-port/fragment
    strip, tracking-param drop, param byte-sort, empty path → '/',
    co.uk registered domains, trailing-dot hosts."""
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(TRICKY) if u is not None],
        "id long, url string",
    )
    norm = {r["id"]: r["url_norm"] for r in normalize_urls(df).collect()}
    parsed = {r["id"]: r for r in parse_urls(df).collect()}
    assert norm[0] == "http://example.com/a/b?a=1&b=2"
    assert norm[1] == "https://sub.example.co.uk/"
    assert parsed[1]["domain"] == "example.co.uk"
    assert norm[2] == "https://example.com:8443/x"
    assert norm[3] == "" and parsed[3]["scheme"] == ""
    assert norm[6] == "ftp://files.example.net:21/pub/"
    assert norm[7] == "https://example.org/"
    assert norm[8] == "https://www.example.com/search?q=a+b"
    assert parsed[8]["domain"] == "example.com"
    assert norm[9] == "http://example.com/?x=1"
    assert parsed[10]["domain"] == "example.ac.jp"
    assert norm[11] == "http://localhost:8080/dev"
    assert parsed[11]["domain"] == "localhost"


def test_url_dedup_composition(spark):
    """The intended composition: tracking-param and case variants of
    one URL collapse to a single exact-dup group on url_norm."""
    from fuserank_spark.pipeline_ext.dedup import exact_dup_groups

    df = spark.createDataFrame(
        [
            (1, "https://Example.com/a?utm_source=x&b=1"),
            (2, "https://example.com:443/a?b=1"),
            (3, "https://example.com/a?b=1#top"),
            (4, "https://example.com/other"),
        ],
        "doc_id long, url string",
    )
    groups = exact_dup_groups(
        normalize_urls(df), text_col="url_norm", key_col="doc_id", normalize=False
    ).collect()
    assert len(groups) == 1
    assert groups[0]["n_dups"] == 3 and groups[0]["keep_id"] == 1


def test_web_plans_are_shuffle_free(urls):
    for out in (parse_urls(urls), normalize_urls(urls)):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


# ---------------------------------------------------------------- r6 s4:
# blocklist filtering + per-domain caps

from fuserank_spark.pipeline_ext.web import cap_per_domain, filter_blocked_domains

_BLOCK = ["example.co.uk", "site3.example.com", "Spam.NET."]

# suffix semantics re-derived in DuckDB: split the host into labels,
# build every dotted suffix, survive iff NO suffix is in the blocklist
_BLOCK_ORACLE = """
WITH p AS (
  SELECT id,
    coalesce(regexp_replace(lower(regexp_replace(
      regexp_replace(regexp_extract(url, '^[^:/?#]+://([^/?#]*)', 1),
                     '^.*@', ''), ':[0-9]*$', '')), '\\.$', ''), '') AS host
  FROM urls
), s AS (
  SELECT id, host, string_split(host, '.') AS l FROM p
)
SELECT id FROM s
WHERE len(list_filter(
        list_transform(range(1, len(l) + 1),
                       i -> array_to_string(l[i:len(l)], '.')),
        x -> x IN ('example.co.uk', 'site3.example.com', 'spam.net'))) = 0
ORDER BY id
"""


def test_filter_blocked_domains_matches_duckdb(urls, duck):
    hosts = parse_urls(urls).select("id", "host")
    got = sorted(
        r["id"]
        for r in filter_blocked_domains(
            hosts, _BLOCK, host_col="host", key_col="id"
        ).collect()
    )
    want = [r[0] for r in duck.execute(_BLOCK_ORACLE).fetchall()]
    assert got == want
    assert len(got) < urls.count()  # the blocklist actually bit


def test_filter_blocked_dataframe_path_matches_list_path(urls):
    hosts = parse_urls(urls).select("id", "host")
    spark = urls.sparkSession
    bdf = spark.createDataFrame([(b,) for b in _BLOCK], "domain string")
    got_df = sorted(
        r["id"]
        for r in filter_blocked_domains(
            hosts, bdf, host_col="host", key_col="id"
        ).collect()
    )
    got_list = sorted(
        r["id"]
        for r in filter_blocked_domains(
            hosts, _BLOCK, host_col="host", key_col="id"
        ).collect()
    )
    assert got_df == got_list


def test_filter_blocked_label_boundary(spark):
    """Blocking example.com must not block notexample.com (suffix =
    label boundary, not endswith)."""
    df = spark.createDataFrame(
        [(0, "a.example.com"), (1, "notexample.com"), (2, "example.com")],
        "doc_id bigint, host string",
    )
    got = sorted(
        r["doc_id"]
        for r in filter_blocked_domains(df, ["example.com"]).collect()
    )
    assert got == [1]
    # empty blocklist is a no-op
    assert filter_blocked_domains(df, []).count() == 3


_CAP = 3

_CAP_ORACLE = f"""
WITH p AS (
  SELECT id,
    regexp_replace(lower(regexp_replace(
      regexp_replace(regexp_extract(url, '^[^:/?#]+://([^/?#]*)', 1),
                     '^.*@', ''), ':[0-9]*$', '')), '\\.$', '') AS host
  FROM urls
), d AS (
  SELECT id, host,
         CAST(concat('0x', substring(md5(CAST(id AS VARCHAR)), 1, 8)) AS BIGINT)
           AS h
  FROM p
), r AS (
  SELECT id, host,
         row_number() OVER (PARTITION BY host ORDER BY h DESC, id) AS rnk
  FROM d
)
SELECT id FROM r WHERE rnk <= {_CAP} ORDER BY id
"""


def test_cap_per_domain_matches_duckdb_single_window(urls, duck):
    """The two-phase merge must pick the SAME survivors as a single
    global window over the portable-hash score (per host, to get
    real multi-row groups from the fixture)."""
    hosts = parse_urls(urls).select("id", "host")
    got = sorted(
        r["id"]
        for r in cap_per_domain(
            hosts, _CAP, domain_col="host", key_col="id"
        ).collect()
    )
    want = [r[0] for r in duck.execute(_CAP_ORACLE).fetchall()]
    assert got == want


def test_cap_per_domain_order_col_keeps_best(spark):
    df = spark.createDataFrame(
        [(i, "d.com", float(i % 10)) for i in range(30)],
        "doc_id bigint, domain string, quality double",
    )
    out = cap_per_domain(df, 5, order_col="quality")
    got = sorted(r["quality"] for r in out.collect())
    # top-5 by quality: two 9s (doc 9, 19, 29 -> three 9s) ...
    rows = sorted(
        ((r["quality"], r["doc_id"]) for r in df.collect()),
        key=lambda t: (-t[0], t[1]),
    )[:5]
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(d for _, d in rows)
    assert out.count() == 5


def test_cap_per_domain_invalid(spark):
    df = spark.createDataFrame([(0, "d", 1.0)], "doc_id bigint, domain string, q double")
    import pytest as _pt

    with _pt.raises(ValueError):
        cap_per_domain(df, 0)


# ---------------------------------------------------------------------------
# extract_html_text: the DuckDB twin is GENERATED from HTML_STRIP_STEPS
# (the script_profile precedent) so both engines always evaluate the
# identical pattern list in the identical order.

HTML_ROWS = [
    "<html><head><title>T</title><style>p{color:red}</style>"
    "<script type='text/javascript'>var x = '<p>fake</p>';</script></head>"
    "<body><h1>Header</h1><p>First para with <b>bold</b> and "
    "<a href='http://x.com?a=1&amp;b=2'>a link</a>.</p>"
    "<ul><li>one</li><li>two</li></ul>"
    "<!-- a comment with <p>markup</p> inside -->"
    "<div>Tail &lt;not a tag&gt; &quot;quoted&quot; &#39;apos&#39; "
    "&nbsp;spaced &amp;lt; stays</div></body></html>",
    "<!DOCTYPE html>\n<p>Line one<br>Line two<br/>Line three</p>",
    "plain text, no markup at all — math like 3 < 5 survives",
    "broken <p unclosed tag and <P>UPPER</P> mixed",
    "entities only: &amp; &lt; &gt; &quot; &#39; &nbsp; &#160; &apos; &#34; &#38;",
    "   \t leading ws <div>  inner \t ws  </div> trailing \n\n ",
    "<pre>code  with   spaces</pre><table><tr><td>a</td><td>b</td></tr></table>",
    "",
    None,
    "<script>no close",
    "a<br>b<br>c",
]


def test_extract_html_text_matches_duckdb_twin(spark, duck):
    from fuserank_spark.pipeline_ext.web import HTML_STRIP_STEPS, extract_html_text

    rows = [(i, h) for i, h in enumerate(HTML_ROWS)]
    # generated variety: entity/tag/comment mixes
    for i in range(200):
        h = (
            f"<div id='d{i}'><h2>Doc {i}</h2><p>body {i} &amp; more "
            f"{'<script>skip()</script>' if i % 3 == 0 else ''}"
            f"{'<!-- c -->' if i % 4 == 0 else ''}text</p></div>"
        )
        rows.append((len(HTML_ROWS) + i, h))
    pdf = pd.DataFrame(rows, columns=["id", "html"])
    duck.register("html_docs", pdf)
    sdf = spark.createDataFrame(pdf).select(
        "id", F.col("html").cast("string").alias("html")
    )

    # pattern/replacement go in as bind parameters (never SQL string
    # literals — standard SQL strings would mangle the backslashes and
    # newlines); 'g' because Spark's regexp_replace is always global,
    # and the (?is)-style inline flags ride inside the patterns
    expr = "html"
    params: list[str] = []
    for pat, repl in HTML_STRIP_STEPS:
        expr = f"regexp_replace({expr}, ?, ?, 'g')"
        params.extend([pat, repl])
    got = {
        r["id"]: r["text"]
        for r in extract_html_text(sdf).select("id", "text").collect()
    }
    exp = dict(
        duck.execute(
            f"SELECT id, {expr} AS text FROM html_docs ORDER BY id", params
        ).fetchall()
    )
    duck.unregister("html_docs")
    assert set(got) == set(exp)
    for i in sorted(exp):
        assert got[i] == exp[i], f"row {i}: spark={got[i]!r} duck={exp[i]!r}"


def test_extract_html_text_semantics(spark):
    from fuserank_spark.pipeline_ext.web import extract_html_text

    sdf = spark.createDataFrame(
        [(0, HTML_ROWS[0]), (1, HTML_ROWS[2]), (2, HTML_ROWS[4])], "id long, html string"
    )
    out = {r["id"]: r["text"] for r in extract_html_text(sdf).collect()}
    t0 = out[0]
    # script/style/comment CONTENT is gone, not just the tags
    assert "color:red" not in t0 and "fake" not in t0 and "comment" not in t0
    # body text and inline formatting content survive
    assert "First para with bold and a link" in t0.replace("\n", " ")
    # entity unescapes, and double-escaped &amp;lt; stays literal "&lt;"
    assert '"quoted"' in t0 and "'apos'" in t0 and "<not a tag>" in t0
    assert "&lt; stays" in t0
    # block boundaries became newlines
    assert "one\ntwo" in t0
    # non-HTML text passes through modulo whitespace collapsing
    assert out[1] == "plain text, no markup at all — math like 3 < 5 survives"
    assert out[2] == "entities only: & < > \" ' ' \" &"


# ---------------------------------------------------------------------------
# Link graph: extract_links (DuckDB twin on the same HREF_PATTERN),
# domain_link_graph semantics, and pagerank vs an independent numpy
# power iteration (iterative float sums have no bit-identical
# cross-engine form — 1e-9 tolerance, the eval-harness doctrine).


def test_extract_links_matches_duckdb_twin(spark, duck):
    from fuserank_spark.pipeline_ext.web import HREF_PATTERN, extract_links

    rows = [
        (0, '<a href="https://a.com/x">x</a> text <A HREF=\'http://b.org\'>b</A>'),
        (1, '<a class="z" data-x="1" href="/relative/path">r</a>'),
        (2, "<p>no links at all</p>"),
        (3, '<a href="https://c.net/p?q=1#f">c</a><a href="https://c.net/p2">c2</a>'),
        (4, "<a\n  href='https://multi.line/t'>m</a>"),
        (5, "<a href=unquoted.com>skipped by contract</a>"),
        (6, None),
    ]
    for i in range(100):
        rows.append((7 + i, f'<div><a href="https://site{i % 9}.com/p{i}">l</a></div>'))
    pdf = pd.DataFrame(rows, columns=["doc_id", "html"])
    duck.register("link_docs", pdf)
    sdf = spark.createDataFrame(pdf).select(
        "doc_id", F.col("html").cast("string").alias("html")
    )
    got = sorted(
        (r["doc_id"], r["href"]) for r in extract_links(sdf).collect()
    )
    exp = sorted(
        duck.execute(
            "SELECT doc_id, unnest(regexp_extract_all(html, ?, 1)) FROM link_docs",
            [HREF_PATTERN],
        ).fetchall()
    )
    duck.unregister("link_docs")
    assert got == exp
    assert (0, "https://a.com/x") in got and (0, "http://b.org") in got
    assert (4, "https://multi.line/t") in got
    assert not any(d == 5 for d, _ in got)


def test_domain_link_graph_semantics(spark):
    from fuserank_spark.pipeline_ext.web import domain_link_graph

    rows = [
        # cross-domain edge + self-link (dropped) + relative (dropped)
        (0, "https://news.example.com/a",
         '<a href="https://other.org/x">x</a><a href="https://www.example.com/y">self</a>'
         '<a href="/rel">r</a>'),
        # duplicate edge collapses via distinct
        (1, "https://blog.example.com/b", '<a href="https://other.org/z">z</a>'),
        (2, "https://other.org/c", '<a href="https://example.com/back">b</a>'),
    ]
    sdf = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "url", "html"]))
    edges = {
        (r["src_domain"], r["dst_domain"]) for r in domain_link_graph(sdf).collect()
    }
    assert edges == {("example.com", "other.org"), ("other.org", "example.com")}


def _np_pagerank(edges, damping, iters):
    import numpy as np

    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for s, _ in edges:
        deg[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dangling = r[deg == 0].sum()
        contrib = np.zeros(n)
        for s, d in edges:
            contrib[idx[d]] += r[idx[s]] / deg[idx[s]]
        r = (1 - damping) / n + damping * (dangling / n + contrib)
    return dict(zip(nodes, r))


def test_pagerank_matches_numpy_power_iteration(spark):
    import random

    from fuserank_spark.pipeline_ext.web import pagerank

    rng = random.Random(11)
    edges = sorted(
        {(f"d{rng.randrange(50)}", f"d{rng.randrange(60)}") for _ in range(300)}
    )
    edges = [(s, d) for s, d in edges if s != d]
    # nodes d50..d59 appear only as destinations -> dangling
    sdf = spark.createDataFrame(pd.DataFrame(edges, columns=["src_domain", "dst_domain"]))
    got = {r["node"]: r["rank"] for r in pagerank(sdf, iterations=10).collect()}
    exp = _np_pagerank(edges, 0.85, 10)
    assert set(got) == set(exp)
    for node, v in exp.items():
        assert abs(got[node] - v) < 1e-9, node
    assert abs(sum(got.values()) - 1.0) < 1e-9  # mass conservation w/ dangling


def test_pagerank_validation(spark):
    from fuserank_spark.pipeline_ext.web import pagerank

    with pytest.raises(ValueError, match="damping"):
        pagerank(None, damping=1.0)
    with pytest.raises(ValueError, match="iterations"):
        pagerank(None, iterations=0)


def test_extract_links_data_href_not_matched(spark):
    """Attribute-name delimiting: data-href must not shadow the real
    href (review catch), and a lone data-href is no link at all."""
    from fuserank_spark.pipeline_ext.web import extract_links

    sdf = spark.createDataFrame(
        [
            (0, '<a data-href="/track.js" href="https://real.com/y">r</a>'),
            (1, '<a data-href="/only-tracker">t</a>'),
        ],
        "doc_id long, html string",
    )
    got = sorted((r["doc_id"], r["href"]) for r in extract_links(sdf).collect())
    assert got == [(0, "https://real.com/y")]


def test_streaming_and_html_vertical_tab_parity(spark, duck):
    """\\x0B divergence guard: Java's \\s includes VT, RE2's does not —
    the step list must use the explicit intersection class so both
    engines agree on VT input (review catch)."""
    from fuserank_spark.pipeline_ext.web import HTML_STRIP_STEPS, extract_html_text

    pdf = pd.DataFrame({"id": [0], "html": ["a \x0b\nb <p>c</p>"]})
    duck.register("vt_docs", pdf)
    sdf = spark.createDataFrame(pdf)
    expr, params = "html", []
    for pat, repl in HTML_STRIP_STEPS:
        expr = f"regexp_replace({expr}, ?, ?, 'g')"
        params.extend([pat, repl])
    got = extract_html_text(sdf).collect()[0]["text"]
    exp = duck.execute(f"SELECT {expr} FROM vt_docs", params).fetchall()[0][0]
    duck.unregister("vt_docs")
    assert got == exp


MD_ROWS = [
    "# Title\n\nSome *emphasised* and **bold** text with `inline code`.\n\n"
    "```python\nprint('dropped')\n```\n\n"
    "A [link](https://x.com/a?b=1) and an ![image](img.png) here.\n\n"
    "> a quote line\n\n- bullet one\n- bullet two\n\n---\n\nTail text_",
    "plain text without any markdown at all",
    "    indented code line\nreal text",
    "broken [link without target] stays as words",
    "",
    None,
]


def test_extract_markdown_text_matches_duckdb_twin(spark, duck):
    from fuserank_spark.pipeline_ext.web import MD_STRIP_STEPS, extract_markdown_text

    rows = [(i, m) for i, m in enumerate(MD_ROWS)]
    for i in range(150):
        rows.append(
            (len(MD_ROWS) + i,
             f"## H{i}\n\ntext {i} with [l{i}](https://s{i % 7}.com) and `c{i}`\n"
             f"{'```js' + chr(10) + 'x()' + chr(10) + '```' if i % 3 == 0 else '* item'}")
        )
    pdf = pd.DataFrame(rows, columns=["id", "markdown"])
    duck.register("md_docs", pdf)
    sdf = spark.createDataFrame(pdf).select(
        "id", F.col("markdown").cast("string").alias("markdown")
    )
    expr, params = "markdown", []
    for pat, repl in MD_STRIP_STEPS:
        expr = f"regexp_replace({expr}, ?, ?, 'g')"
        params.extend([pat, repl])
    got = {
        r["id"]: r["text"]
        for r in extract_markdown_text(sdf).select("id", "text").collect()
    }
    exp = dict(
        duck.execute(f"SELECT id, {expr} AS text FROM md_docs ORDER BY id", params).fetchall()
    )
    duck.unregister("md_docs")
    assert got == exp


def test_extract_markdown_text_semantics(spark):
    from fuserank_spark.pipeline_ext.web import extract_markdown_text

    sdf = spark.createDataFrame(
        [(0, MD_ROWS[0]), (1, MD_ROWS[1]), (2, MD_ROWS[2])],
        "id long, markdown string",
    )
    out = {r["id"]: r["text"] for r in extract_markdown_text(sdf).collect()}
    t = out[0]
    assert "dropped" not in t and "```" not in t          # fences gone
    assert "emphasised" in t and "**" not in t            # emphasis text kept
    assert "inline code" in t and "`" not in t
    assert "link" in t and "https://x.com" not in t       # anchor kept, target gone
    assert "image" in t and "img.png" not in t
    assert "a quote line" in t and ">" not in t
    assert "bullet one\nbullet two" in t
    assert t.startswith("Title")
    assert out[1] == "plain text without any markdown at all"
    assert out[2] == "real text"


def _np_hits(edges, iters):
    import numpy as np

    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    h = np.ones(len(nodes))
    a = np.ones(len(nodes))
    for _ in range(iters):
        a_raw = np.zeros(len(nodes))
        for s, d in edges:
            a_raw[idx[d]] += h[idx[s]]
        a = a_raw / (np.linalg.norm(a_raw) or 1.0)
        h_raw = np.zeros(len(nodes))
        for s, d in edges:
            h_raw[idx[s]] += a[idx[d]]
        h = h_raw / (np.linalg.norm(h_raw) or 1.0)
    return {n: (h[idx[n]], a[idx[n]]) for n in nodes}


def test_hits_matches_numpy_power_iteration(spark):
    import random

    from fuserank_spark.pipeline_ext.web import hits

    rng = random.Random(23)
    edges = sorted({(f"d{rng.randrange(40)}", f"d{rng.randrange(50)}") for _ in range(250)})
    edges = [(s, d) for s, d in edges if s != d]
    sdf = spark.createDataFrame(pd.DataFrame(edges, columns=["src_domain", "dst_domain"]))
    got = {r["node"]: (r["hub"], r["authority"]) for r in hits(sdf, iterations=10).collect()}
    exp = _np_hits(edges, 10)
    assert set(got) == set(exp)
    for n, (eh, ea) in exp.items():
        assert abs(got[n][0] - eh) < 1e-9 and abs(got[n][1] - ea) < 1e-9, n


def test_hits_separates_hub_from_authority(spark):
    from fuserank_spark.pipeline_ext.web import hits

    # a pure directory: links to everything, nothing links to it
    edges = [("directory.com", f"content{i}.org") for i in range(5)]
    edges += [(f"content{i}.org", "canonical.org") for i in range(5)]
    sdf = spark.createDataFrame(pd.DataFrame(edges, columns=["src_domain", "dst_domain"]))
    s = {r["node"]: r for r in hits(sdf, iterations=12).collect()}
    assert s["directory.com"]["hub"] > s["directory.com"]["authority"]
    assert s["canonical.org"]["authority"] > s["canonical.org"]["hub"]
    with pytest.raises(ValueError, match="iterations"):
        hits(None, iterations=0)


def test_pagerank_reliable_checkpoint_matches_numpy(spark, tmp_path):
    """VERDICT r7 missing #4: with checkpoint_dir set the loop swaps
    localCheckpoint for reliable checkpoint() every N iterations
    (lineage-preserving persist in between) — identical numbers, and
    checkpoint files actually land in the directory."""
    import os
    import random

    from fuserank_spark.pipeline_ext.web import pagerank

    rng = random.Random(11)
    edges = sorted(
        {(f"d{rng.randrange(50)}", f"d{rng.randrange(60)}") for _ in range(300)}
    )
    edges = [(s, d) for s, d in edges if s != d]
    sdf = spark.createDataFrame(pd.DataFrame(edges, columns=["src_domain", "dst_domain"]))
    ckdir = str(tmp_path / "pr_ck")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(
            sdf, iterations=10, checkpoint_dir=ckdir, checkpoint_every=3
        ).collect()
    }
    exp = _np_pagerank(edges, 0.85, 10)
    for node, v in exp.items():
        assert abs(got[node] - v) < 1e-9, node
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # reliable checkpoint files exist on "DFS" (the configured dir)
    found = [f for _, _, fs in os.walk(ckdir) for f in fs]
    assert found, "no reliable checkpoint files written"


def test_hits_reliable_checkpoint_matches_numpy(spark, tmp_path):
    import random

    from fuserank_spark.pipeline_ext.web import hits

    rng = random.Random(23)
    edges = sorted({(f"d{rng.randrange(40)}", f"d{rng.randrange(50)}") for _ in range(250)})
    edges = [(s, d) for s, d in edges if s != d]
    sdf = spark.createDataFrame(pd.DataFrame(edges, columns=["src_domain", "dst_domain"]))
    got = {
        r["node"]: (r["hub"], r["authority"])
        for r in hits(
            sdf, iterations=10,
            checkpoint_dir=str(tmp_path / "hits_ck"), checkpoint_every=4,
        ).collect()
    }
    exp = _np_hits(edges, 10)
    for n, (eh, ea) in exp.items():
        assert abs(got[n][0] - eh) < 1e-9 and abs(got[n][1] - ea) < 1e-9, n


def test_pagerank_checkpoint_no_trailing_cache(spark, tmp_path):
    """ADVICE r8 #3: a loop ending OFF the checkpoint cadence used to
    return a persisted frame that stayed resident for the session's
    lifetime. step(last=True) now forces the final reliable checkpoint
    and unpersists every trailing cached frame — the persistent-RDD
    census returns to its pre-call level once the result is collected."""
    import random

    from fuserank_spark.pipeline_ext.web import hits, pagerank

    rng = random.Random(7)
    edges = sorted({(f"d{rng.randrange(30)}", f"d{rng.randrange(35)}") for _ in range(150)})
    edges = [(s, d) for s, d in edges if s != d]
    sdf = spark.createDataFrame(pd.DataFrame(edges, columns=["src_domain", "dst_domain"]))

    def _persisted_ids():
        # ID set, not size: the ContextCleaner asynchronously unpersists
        # GC'd frames from EARLIER tests, so a raw count can shrink
        # between measurements — the invariant is "this call leaves no
        # NEW persisted RDD behind"
        m = spark.sparkContext._jsc.getPersistentRDDs()
        it = m.keySet().iterator()
        ids = set()
        while it.hasNext():
            ids.add(it.next())
        return ids

    before = _persisted_ids()
    # 7 iterations, every=3 → last iteration (i=6) is OFF cadence
    pagerank(sdf, iterations=7, checkpoint_dir=str(tmp_path / "pr"), checkpoint_every=3).collect()
    assert _persisted_ids() - before == set()
    hits(sdf, iterations=7, checkpoint_dir=str(tmp_path / "ht"), checkpoint_every=3).collect()
    assert _persisted_ids() - before == set()
