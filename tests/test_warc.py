"""WARC source (sources.read_warc): hand-built ISO-28500 archives —
plain and gzipped — parsed to records; HTTP heads stripped; file-level
parallelism contract (one mapInPandas over binaryFile, no shuffle).
"""

from __future__ import annotations

import gzip
import shutil
import tempfile

import pytest

from fuserank_spark.sources import read_warc


@pytest.fixture()
def warcdir():
    d = tempfile.mkdtemp(prefix="fuserank_warc_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _record(rtype: str, uri: str, body: bytes, http: bool = True) -> bytes:
    if http:
        payload = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
        ctype = b"application/http; msgtype=response"
    else:
        payload = body
        ctype = b"text/plain"
    head = (
        b"WARC/1.0\r\n"
        b"WARC-Type: " + rtype.encode() + b"\r\n"
        b"WARC-Target-URI: " + uri.encode() + b"\r\n"
        b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        b"Content-Type: " + ctype + b"\r\n"
        b"Content-Length: " + str(len(payload)).encode() + b"\r\n"
        b"\r\n"
    )
    return head + payload + b"\r\n\r\n"


def _archive() -> bytes:
    return (
        _record("warcinfo", "", b"software: test", http=False)
        + _record("response", "https://a.com/x", b"<html><p>Alpha page</p></html>")
        + _record("request", "https://a.com/x", b"GET /x HTTP/1.1", http=False)
        + _record("response", "https://b.org/y", b"<html><p>Beta &amp; page</p></html>")
    )


def test_read_warc_parses_responses(spark, warcdir):
    with open(f"{warcdir}/f1.warc", "wb") as f:
        f.write(_archive())
    with open(f"{warcdir}/f2.warc.gz", "wb") as f:
        f.write(gzip.compress(_archive()))
    out = read_warc(spark, warcdir).collect()
    # default filter: responses only, from BOTH files (gz decoded)
    assert len(out) == 4
    by_uri = {}
    for r in out:
        by_uri.setdefault(r["target_uri"], []).append(r)
    assert set(by_uri) == {"https://a.com/x", "https://b.org/y"}
    r = by_uri["https://a.com/x"][0]
    assert r["record_type"] == "response"
    assert r["warc_date"] == "2024-01-01T00:00:00Z"
    # HTTP response head stripped to the entity body
    assert r["content"] == "<html><p>Alpha page</p></html>"
    assert "HTTP/1.1" not in r["content"]


def test_read_warc_all_types_and_extraction_composition(spark, warcdir):
    from pyspark.sql import functions as F

    from fuserank_spark.pipeline_ext.web import extract_html_text

    with open(f"{warcdir}/f1.warc", "wb") as f:
        f.write(_archive())
    allrec = read_warc(spark, warcdir, record_types=None).collect()
    assert sorted(r["record_type"] for r in allrec) == [
        "request", "response", "response", "warcinfo",
    ]
    # the intended pipeline: WARC -> extract_html_text -> curation
    docs = read_warc(spark, warcdir).withColumnRenamed("content", "html")
    texts = {
        r["target_uri"]: r["text"]
        for r in extract_html_text(docs).select("target_uri", "text").collect()
    }
    assert texts["https://a.com/x"] == "Alpha page"
    assert texts["https://b.org/y"] == "Beta & page"


def test_read_warc_plan_is_scan_plus_mapinpandas(spark, warcdir):
    with open(f"{warcdir}/f1.warc", "wb") as f:
        f.write(_archive())
    plan = read_warc(spark, warcdir)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_read_warc_payload_containing_version_line(spark, warcdir):
    """Content-Length-driven walking: a page whose BODY contains a
    'WARC/1.0' line (a page about the WARC format) parses intact —
    a version-line split would truncate it (review catch)."""
    tricky = b"<html><pre>WARC/1.0\r\nWARC-Type: fake</pre>end</html>"
    data = (
        _record("response", "https://a.com/warc-docs", tricky)
        + _record("response", "https://a.com/after", b"<p>next record ok</p>")
    )
    with open(f"{warcdir}/t.warc", "wb") as f:
        f.write(data)
    out = {r["target_uri"]: r["content"] for r in read_warc(spark, warcdir).collect()}
    assert out["https://a.com/warc-docs"] == tricky.decode()
    assert out["https://a.com/after"] == "<p>next record ok</p>"


def test_read_warc_lenient_lf_header_with_crlfcrlf_in_body(spark, warcdir):
    """ADVICE r6: a lenient LF-terminated header block must end at the
    FIRST separator — a CRLFCRLF occurring later (inside the body)
    must not swallow part of the body. Earliest-position rule."""
    body = b"before\r\n\r\nafter"  # CRLFCRLF lives IN the payload
    head = (
        b"WARC/1.0\n"
        b"WARC-Type: response\n"
        b"WARC-Target-URI: https://lf.example/x\n"
        b"Content-Type: text/plain\n"
        b"Content-Length: " + str(len(body)).encode() + b"\n"
        b"\n"
    )
    data = head + body + b"\r\n\r\n" + _record(
        "response", "https://b.org/y", b"<p>two</p>"
    )
    with open(f"{warcdir}/lf.warc", "wb") as f:
        f.write(data)
    out = {r["target_uri"]: r["content"] for r in read_warc(spark, warcdir).collect()}
    assert out["https://lf.example/x"] == "before\r\n\r\nafter"
    assert out["https://b.org/y"] == "<p>two</p>"


def test_read_warc_newline_terminated_payload_kept(spark, warcdir):
    """ADVICE r6: payloads genuinely ending in newlines keep them.
    Content-Length path: exactly clen bytes, zero stripping. Fallback
    path (no Content-Length): at most the separator CRLFs stripped."""
    body = b"line one\nline two\n\n"  # trailing newlines ARE payload
    data = _record("response", "https://a.com/nl", body, http=False)
    # fallback record: drop the Content-Length header entirely
    rec2 = _record("response", "https://b.org/nl2", b"tail\n", http=False)
    rec2 = rec2.replace(b"Content-Length: 5\r\n", b"")
    with open(f"{warcdir}/nl.warc", "wb") as f:
        f.write(data + rec2)
    out = {r["target_uri"]: r["content"] for r in read_warc(spark, warcdir).collect()}
    assert out["https://a.com/nl"] == "line one\nline two\n\n"
    # fallback body ran to EOF: only the two separator CRLFs stripped,
    # the payload's own trailing \n survives
    assert out["https://b.org/nl2"] == "tail\n"


def test_read_warc_truncated_final_record_keeps_payload_newlines(spark, warcdir):
    """ADVICE r7: in the no-Content-Length fallback, the FINAL record
    of a TRUNCATED file (no trailing record separator) must keep its
    genuine payload (CR)LFs — the bounded strip only applies when a
    separator was actually observed."""
    rec = _record("response", "https://b.org/trunc1", b"tail\n", http=False)
    rec = rec.replace(b"Content-Length: 5\r\n", b"")
    rec = rec[: -len(b"\r\n\r\n")]  # truncate: drop the record separator
    with open(f"{warcdir}/tr.warc", "wb") as f:
        f.write(rec)
    out = {r["target_uri"]: r["content"] for r in read_warc(spark, warcdir).collect()}
    # before the fix the bounded strip ate the payload's own \n
    assert out["https://b.org/trunc1"] == "tail\n"


def test_read_warc_bad_content_length_falls_back(spark, warcdir):
    """A record with a LYING Content-Length still parses (scan-to-next-
    version-line fallback), and following records survive."""
    rec = _record("response", "https://a.com/x", b"<p>body</p>")
    rec = rec.replace(b"Content-Length: ", b"Content-Length: 99")
    data = rec + _record("response", "https://b.org/y", b"<p>two</p>")
    with open(f"{warcdir}/bad.warc", "wb") as f:
        f.write(data)
    out = {r["target_uri"]: r["content"] for r in read_warc(spark, warcdir).collect()}
    assert set(out) == {"https://a.com/x", "https://b.org/y"}
    assert out["https://b.org/y"] == "<p>two</p>"
