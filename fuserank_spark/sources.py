"""Sources & sinks S1-S3, S7 (SURVEY §2.1).

S1  CSV scan (reference: pd.read_csv, src/load.py:21-22)
S2  embedding-cache load (torch .pt glob, src/encode.py:269-284)
S3  embedding-cache save (torch.save, src/encode.py:306-315)
S7  geocoding source (Nominatim HTTP, src/app.py:220-226) — gated

The .pt pickle cache becomes an idempotent Parquet stage keyed by
(dataset, model): re-usable across jobs, partition-parallel reads,
no driver-side tensor. S4/S5 live in index_export.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    header: bool = True,
    multi_line: bool = True,
) -> DataFrame:
    """S1: CSV scan. Explicit schema strongly preferred at scale —
    inferSchema is a full extra pass over the data (the distributed
    analog of pandas low_memory=False whole-file inference).

    multiLine + quote-escape defaults match pandas' parsing of
    quoted fields with embedded commas/newlines (the reference's
    corpora need it); note multiLine makes a file non-splittable —
    at 100 TB, land data as parquet or newline-sanitized CSV.
    """
    reader = (
        spark.read.option("header", str(header).lower())
        .option("multiLine", str(multi_line).lower())
        .option("escape", '"')
    )
    if schema is not None:
        return reader.schema(schema).csv(path)
    return reader.option("inferSchema", "true").csv(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """JSONL document source (no reference analog — raw training-data
    dumps are line-delimited JSON). Line-delimited stays splittable,
    so a 100 TB dump parallelizes by block, unlike multiLine JSON.

    With an explicit ``schema``, malformed lines land in
    ``corrupt_col`` (PERMISSIVE mode) instead of killing the job —
    filter on it to quarantine bad records:

        docs = read_jsonl(spark, path, schema)
        bad = docs.filter(F.col("_corrupt_record").isNotNull())

    Spark caveat: a query that prunes down to ONLY the corrupt
    column is disallowed (SPARK-21610) — e.g. ``bad.count()`` fails;
    select another column alongside it, collect full rows, or cache
    the frame first.

    Without a schema the reader infers (a full extra pass — same
    caveat as read_csv; always pass a schema at scale)."""
    if schema is not None:
        if corrupt_col not in schema.fieldNames():
            # copy — StructType.add mutates (and returns) self, which
            # would permanently grow the CALLER's schema object
            schema = T.StructType(
                list(schema.fields) + [T.StructField(corrupt_col, T.StringType())]
            )
        return (
            spark.read.schema(schema)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", corrupt_col)
            .json(path)
        )
    return spark.read.json(path)


def embedding_cache_path(cache_dir: str, dataset: str, model_name: str, dim: int | None = None) -> str:
    model_tail = model_name.split("/")[-1]  # reference's file_name convention
    suffix = f"_{dim}d" if dim is not None else ""
    return os.path.join(cache_dir, dataset, f"text_embeddings_{model_tail}{suffix}.parquet")


def load_cached_embeddings(
    spark: SparkSession, cache_dir: str, dataset: str, model_name: str, dim: int | None = None
) -> DataFrame | None:
    """S2: return the cached (row_id, text_emb) table, or None on
    miss/corruption — matching the reference's silent-miss contract.
    The cache is keyed by (dataset, model, dim): a different target
    dimension is a different cache, never a silent reuse."""
    path = embedding_cache_path(cache_dir, dataset, model_name, dim)
    try:
        df = spark.read.parquet(path)
        if {"row_id", "text_emb"} <= set(df.columns):
            if dim is not None:
                from pyspark.sql import functions as F2

                got = df.select(F2.size("text_emb").alias("d")).first()
                if got is not None and got["d"] != dim:
                    return None
            return df
        return None
    except Exception:
        return None


def save_embeddings(
    df: DataFrame, cache_dir: str, dataset: str, model_name: str, dim: int | None = None
) -> str:
    """S3: persist the embedding stage output (overwrite = idempotent
    stage semantics)."""
    path = embedding_cache_path(cache_dir, dataset, model_name, dim)
    df.select("row_id", "text_emb").write.mode("overwrite").parquet(path)
    return path


def embed_with_cache(
    df: DataFrame,
    text_encoding_schema: dict[str, float],
    cache_dir: str,
    dataset: str,
    model_name: str = "stub-hash-bow",
    dim: int = 64,
    embedder_factory=None,
) -> DataFrame:
    """The reference's cache-or-create flow (src/encode.py:63-66):
    join cached embeddings back by row_id, else run the embed stage
    and persist it."""
    from .embed import embed_corpus

    spark = df.sparkSession
    cached = load_cached_embeddings(spark, cache_dir, dataset, model_name, dim)
    if cached is not None:
        # a stale cache (corpus grew since it was written) must not
        # silently drop the new rows — treat coverage mismatch as a miss
        missing = df.join(cached.select("row_id"), "row_id", "left_anti").limit(1).count()
        if missing == 0:
            return df.join(cached, "row_id")
    out = embed_corpus(df, text_encoding_schema, dim=dim, embedder_factory=embedder_factory)
    save_embeddings(out, cache_dir, dataset, model_name, dim)
    return df.join(
        spark.read.parquet(embedding_cache_path(cache_dir, dataset, model_name, dim)), "row_id"
    )


def geocode(address: str) -> tuple[float, float]:
    """S7: address → (lon, lat) at query-compile time (driver-side,
    not a data-plane op). geopy/Nominatim is not available in this
    container; the gate mirrors the reference's UI-time call."""
    try:
        from geopy.geocoders import Nominatim
    except ImportError as e:
        raise NotImplementedError(
            "geocoding requires geopy + network; pass (lon, lat) directly"
        ) from e
    loc = Nominatim(user_agent="fuserank_spark").geocode(address)  # pragma: no cover
    if loc is None:  # pragma: no cover
        raise ValueError(f"address not found: {address!r}")
    return (loc.longitude, loc.latitude)  # pragma: no cover


WARC_SCHEMA = T.StructType(
    [
        T.StructField("warc_file", T.StringType()),
        T.StructField("record_type", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)


def read_warc(spark: SparkSession, path: str, record_types=("response",)) -> DataFrame:
    """WARC crawl-archive source (ISO 28500; the Common Crawl container
    format): one row per record with its WARC headers (type, target
    URI, date, content type) and the payload as text — feed straight
    into ``web.extract_html_text`` → curation.

    Parallelism contract: WARC is a concatenated-record format with no
    sync markers, so a single archive is NOT block-splittable — the
    unit of parallelism is the FILE, exactly how crawl corpora ship
    (Common Crawl segments are ~1 GB × tens of thousands of files, so
    file-level parallelism saturates any cluster; one giant WARC is
    the caller's smell). Implementation: the ``binaryFile`` source
    lists and distributes files, one mapInPandas parses records per
    file, nothing ever shuffles.

    Parser scope (documented): the walker advances by each record's
    mandatory ``Content-Length`` header (ISO 28500 §5.3), so payloads
    CONTAINING a ``WARC/1.x`` line — a page about the WARC format, an
    archived .warc served as a response — parse intact (a version-line
    regex split would truncate them; review catch). Records missing or
    mis-stating Content-Length fall back to a scan for the next
    version line from the current offset. HTTP response headers inside
    ``application/http`` payloads are stripped to the entity body.
    Content is decoded UTF-8 with replacement — binary payloads
    (images) ride through lossily; pair with phash/multimodal on raw
    bytes when fidelity matters. gzip members (.warc.gz) are
    decompressed whole-file via the stdlib when the filename says
    so."""
    import gzip as _gzip
    import re as _re

    from collections.abc import Iterator as _Iter

    import pandas as _pd

    version_re = _re.compile(rb"(?m)^WARC/\d+\.\d+\r?\n")

    def _records(data: bytes):
        """Yield (headers, body) per record, Content-Length-driven."""
        m = version_re.search(data)
        while m is not None:
            hdr_start = m.end()
            # earliest non-negative separator wins: a lenient
            # LF-terminated header block must not be overrun by a
            # CRLFCRLF that happens to occur later (in the body or a
            # subsequent record) — preferring \r\n\r\n unconditionally
            # would swallow part of the body and read Content-Length
            # from garbage (ADVICE r6)
            cands = [
                (pos, sep)
                for sep in (b"\r\n\r\n", b"\n\n")
                if (pos := data.find(sep, hdr_start)) != -1
            ]
            if not cands:
                return
            hdr_end, sep = min(cands)
            body_start = hdr_end + len(sep)
            headers = {}
            for line in data[hdr_start:hdr_end].replace(b"\r\n", b"\n").split(b"\n"):
                k, colon, v = line.partition(b":")
                if colon:
                    headers[k.strip().lower()] = v.strip()
            try:
                clen = int(headers[b"content-length"])
                if clen < 0 or body_start + clen > len(data):
                    raise ValueError
                # exactly clen bytes: ISO 28500 §5.4 puts the two
                # separator CRLFs AFTER the block, so nothing to strip —
                # payloads genuinely ending in newlines keep them
                body = data[body_start : body_start + clen]
                nxt = version_re.search(data, body_start + clen)
            except (KeyError, ValueError):
                # absent/bad length: body runs to the next version
                # line and so includes the record separator — strip AT
                # MOST the two trailing (CR)LF sequences, not every
                # trailing newline byte (ADVICE r6: an unbounded rstrip
                # perturbs content hashes of newline-terminated payloads)
                nxt = version_re.search(data, body_start)
                body = data[body_start : nxt.start() if nxt else len(data)]
                # Strip only when a record separator was actually
                # observed — another record follows, or the data ends
                # with the two-blank-line separator. The final record
                # of a TRUNCATED file has no separator, so its (CR)LFs
                # are genuine payload and must survive (ADVICE r7).
                if nxt is not None or body.endswith((b"\r\n\r\n", b"\n\n")):
                    for _ in range(2):
                        if body.endswith(b"\r\n"):
                            body = body[:-2]
                        elif body.endswith(b"\n"):
                            body = body[:-1]
                        else:
                            break
            yield headers, body
            m = nxt

    def _parse(batches: "_Iter[_pd.DataFrame]") -> "_Iter[_pd.DataFrame]":
        for pdf in batches:
            rows = []
            for fname, blob in zip(pdf["path"], pdf["content"]):
                data = bytes(blob)
                if fname.endswith(".gz"):
                    data = _gzip.decompress(data)
                for headers, body in _records(data):
                    rtype = headers.get(b"warc-type", b"").decode("ascii", "replace")
                    if record_types and rtype not in record_types:
                        continue
                    ctype = headers.get(b"content-type", b"").decode("ascii", "replace")
                    if ctype.startswith("application/http"):
                        # strip the HTTP response head to the entity body
                        hb, sep2, rest = body.partition(b"\r\n\r\n")
                        if not sep2:
                            hb, sep2, rest = body.partition(b"\n\n")
                        body = rest if sep2 else body
                    rows.append(
                        {
                            "warc_file": fname,
                            "record_type": rtype,
                            "target_uri": headers.get(b"warc-target-uri", b"").decode(
                                "utf-8", "replace"
                            ),
                            "warc_date": headers.get(b"warc-date", b"").decode(
                                "ascii", "replace"
                            ),
                            "content_type": ctype,
                            "content": body.decode("utf-8", "replace"),
                        }
                    )
            yield _pd.DataFrame(
                rows, columns=[f.name for f in WARC_SCHEMA.fields]
            )

    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return files.mapInPandas(_parse, schema=WARC_SCHEMA)
