"""Executable crawl-ingestion composition (the README fifth-session
pipeline): WARC archive → extract_html_text → parse_urls → blocklist →
domain link graph → pagerank → curate_corpus with the domain-rank
provenance gate. Pins that the stages actually compose on real column
contracts, not just individually."""

from __future__ import annotations

import gzip
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from fuserank_spark.pipeline_ext.curation import curate_corpus
from fuserank_spark.pipeline_ext.web import (
    domain_link_graph,
    extract_html_text,
    filter_blocked_domains,
    pagerank,
    parse_urls,
)
from fuserank_spark.sources import read_warc

from tests.test_warc import _record


@pytest.fixture()
def crawl(spark):
    d = tempfile.mkdtemp(prefix="fuserank_crawl_")
    recs = []
    # a tiny web: hub.com linked by everyone; spamfarm.biz links out
    # but is never linked; blocked.net is on the blocklist
    sites = ["hub.com", "alpha.org", "beta.org", "spamfarm.biz", "blocked.net"]
    for i, site in enumerate(sites):
        links = "".join(
            f'<a href="https://hub.com/h{j}">h</a>' for j in range(3)
        )
        if site == "spamfarm.biz":
            links += '<a href="https://alpha.org/a">a</a>'
        body = (
            f"<html><head><script>x()</script></head><body><h1>{site}</h1>"
            f"<p>Useful unique content of {site}, page {i}, long enough to "
            f"score as real prose for the quality gate.</p>{links}"
            f"</body></html>"
        )
        recs.append(_record("response", f"https://{site}/p{i}", body.encode()))
    with open(f"{d}/crawl.warc.gz", "wb") as f:
        f.write(gzip.compress(b"".join(recs)))
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_crawl_pipeline_end_to_end(spark, crawl):
    pages = read_warc(spark, crawl).withColumnRenamed("content", "html")
    pages = parse_urls(pages.withColumnRenamed("target_uri", "url"))
    pages = filter_blocked_domains(
        pages, ["blocked.net"], host_col="host", key_col="url"
    )
    assert pages.filter(F.col("domain") == "blocked.net").count() == 0

    edges = domain_link_graph(pages)
    ranks = pagerank(edges, iterations=8)
    rank_of = {r["node"]: r["rank"] for r in ranks.collect()}
    # the hub out-ranks the farm that nobody links to
    assert rank_of["hub.com"] > rank_of["spamfarm.biz"]

    docs = extract_html_text(pages).select(
        F.col("url").alias("doc_id"), "domain", "text"
    )
    # gate at a threshold between the farm's rank and the hub's
    thr = (rank_of["spamfarm.biz"] + rank_of["hub.com"]) / 2
    kept = curate_corpus(
        docs, key_col="doc_id", min_quality=0.0,
        domain_ranks=ranks, min_domain_rank=thr,
    )
    doms = {r["domain"] for r in kept.select("domain").distinct().collect()}
    assert "hub.com" in doms and "spamfarm.biz" not in doms
    # extraction actually stripped the markup before curation saw it
    assert all("<" not in r["text"] for r in kept.select("text").collect())
