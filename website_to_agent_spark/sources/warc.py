"""WARC source — read Common-Crawl-style WARC archives into the
engine's ``pages(url, warc_ts, html binary)`` shape.

Common Crawl stores the web as WARC (ISO 28500): a concatenation of
records, each ``WARC/1.x`` header block + body, where ``response``
records carry the full HTTP response. The reference seeds from the CC
*index* (`url_seeder.py` source='cc'); at 100 TB the engine ingests the
archives themselves, so this source completes the path: WARC files →
pages table → CrawlEngine / extract_udf.

Scale design: files arrive through Spark's ``binaryFile`` source (one
row per file/object — on a cluster, S3 globs), and parsing is an
Arrow-batched ``mapInPandas`` kernel (stdlib-only: bytes splitting +
``gzip``), so a 1000-executor cluster parses archives embarrassingly
parallel, one task per file. Typical CC WARCs are ~1 GB gzipped —
within executor memory; for larger archives set
``spark.sql.files.maxPartitionBytes`` appropriately or pre-split.

Both plain ``.warc`` and per-record-gzipped ``.warc.gz`` (the CC
layout: concatenated gzip members, one per record) are supported —
``gzip.decompress`` handles concatenated members.
"""

from __future__ import annotations

import gzip
import io
from typing import Iterator, List, Optional, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

WARC_PAGES = T.StructType(
    [
        T.StructField("url", T.StringType(), True),
        T.StructField("warc_ts", T.StringType(), True),
        T.StructField("status_code", T.IntegerType(), True),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("html", T.BinaryType(), True),
    ]
)


def _parse_headers(block: bytes) -> dict:
    headers: dict = {}
    for line in block.split(b"\r\n"):
        if b":" in line:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("latin-1")] = v.strip().decode(
                "latin-1"
            )
    return headers


def _gzip_chunks(data: bytes, chunk_size: int = 4 << 20) -> Iterator[bytes]:
    """Stream-decompress a (possibly multi-member) gzip blob in bounded
    chunks instead of one whole-file ``gzip.decompress`` — a ~1 GB CC
    archive never holds its full uncompressed form in memory. Member-
    wise (CC writes one member per record): a corrupt or truncated
    member ends the stream, KEEPING everything already decompressed,
    instead of raising (real CC archives routinely contain oddities)."""
    import zlib

    mv = memoryview(data)
    pos = 0
    while pos < len(mv):
        d = zlib.decompressobj(wbits=31)  # 31 = gzip wrapper
        try:
            while not d.eof:
                piece = bytes(mv[pos:pos + chunk_size])
                if not piece:
                    return  # truncated final member → skip
                out = d.decompress(piece)
                pos += len(piece) - len(d.unused_data)
                if out:
                    yield out
        except zlib.error:
            return  # corrupt member → skip the damaged tail


def iter_warc_records(chunks) -> Iterator[Tuple[dict, bytes]]:
    """Incrementally parse WARC records from a decompressed byte-chunk
    stream → (headers, body) pairs. Holds only the unparsed tail
    buffered. Record framing uses the mandatory ``Content-Length``
    WARC header (ISO 28500 §4), so arbitrary binary bodies are safe.
    A damaged or truncated record header skips the archive's remaining
    tail (like the other record skip-paths) rather than failing the
    whole task."""
    it = iter(chunks)
    buf = bytearray()
    pos = 0
    eof = False
    while True:
        # skip inter-record CRLFs
        while pos + 2 <= len(buf) and buf[pos:pos + 2] == b"\r\n":
            pos += 2
        hdr_end = buf.find(b"\r\n\r\n", pos)
        need_more = hdr_end < 0
        length = 0
        headers: dict = {}
        if not need_more:
            if pos >= len(buf) or buf[pos:pos + 5] != b"WARC/":
                return  # not at a record boundary: damaged → skip tail
            headers = _parse_headers(bytes(buf[pos:hdr_end]))
            try:
                length = int(headers.get("content-length", "0"))
            except ValueError:
                return  # malformed framing header → skip tail
            need_more = hdr_end + 4 + length > len(buf)
        if need_more:
            if eof:
                return  # truncated final record → skip
            try:
                piece = next(it)
            except StopIteration:
                eof = True
                if pos >= len(buf):
                    return
                continue
            del buf[:pos]
            pos = 0
            buf += piece
            continue
        body = bytes(buf[hdr_end + 4:hdr_end + 4 + length])
        pos = hdr_end + 4 + length
        yield headers, body


def _iter_responses(
    data: bytes,
) -> Iterator[Tuple[str, str, int, dict, bytes]]:
    """One WARC file's bytes → (url, ts, status, http_headers, payload)
    per ``response`` record — the shared walk behind both the page
    reader (content-type + body) and the header reader (cache
    validators)."""
    if data[:2] == b"\x1f\x8b":  # gzip magic — concatenated members OK
        chunks: Iterator[bytes] = _gzip_chunks(data)
    else:
        chunks = iter((data,))
    for headers, body in iter_warc_records(chunks):
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri", "")
        ts = headers.get("warc-date", "")
        # body = HTTP response: status line + headers + payload
        try:
            http_end = body.index(b"\r\n\r\n")
        except ValueError:
            continue
        status_line = body[:body.index(b"\r\n")]
        parts = status_line.split(b" ")
        status = int(parts[1]) if len(parts) > 1 and parts[1].isdigit() else 0
        http_headers = _parse_headers(body[:http_end])
        yield url, ts, status, http_headers, body[http_end + 4:]


def parse_warc_bytes(data: bytes) -> List[Tuple[str, str, int, str, bytes]]:
    """Parse one WARC file's bytes → [(url, ts, status, ctype, body)]
    for every ``response`` record."""
    return [
        (url, ts, status, http_headers.get("content-type", ""), payload)
        for url, ts, status, http_headers, payload in _iter_responses(data)
    ]


def warc_pages(spark: SparkSession, path: str,
               only_ok_html: bool = False) -> DataFrame:
    """WARC archive(s) at ``path`` (glob ok) → pages DataFrame
    (url, warc_ts, status_code, content_type, html binary).

    ``only_ok_html=True`` keeps 200 + text/html rows only — the
    pre-filter a training pipeline applies before extraction."""
    files = spark.read.format("binaryFile").load(path).select("content")

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in
                    ("url", "warc_ts", "status_code", "content_type", "html")}
            for blob in pdf["content"]:
                for url, ts, status, ctype, body in parse_warc_bytes(
                    bytes(blob)
                ):
                    rows["url"].append(url)
                    rows["warc_ts"].append(ts)
                    rows["status_code"].append(status)
                    rows["content_type"].append(ctype)
                    rows["html"].append(body)
            yield pd.DataFrame(rows)

    out = files.mapInPandas(_parse, schema=WARC_PAGES)
    if only_ok_html:
        from pyspark.sql import functions as F

        from website_to_agent_spark.operators.filters import content_type_ok

        out = out.filter(
            (F.col("status_code") == 200)
            & content_type_ok(F.col("content_type"))
        )
    return out


def warc_records(spark: SparkSession, path: str,
                 record_type: str = "response") -> DataFrame:
    """Generic record-level reader: WARC/WET/WAT archive(s) →
    (url, warc_ts, rec_type, body binary) for every record of
    ``record_type`` — raw body, no HTTP-envelope parsing. Common Crawl
    ships three sibling formats over the same ISO-28500 framing:
    ``response`` (WARC: HTTP capture), ``conversion`` (WET: extracted
    text), ``metadata`` (WAT: JSON metadata); this reads any of them
    with the same per-file parallel, damage-tolerant record walk."""
    files = spark.read.format("binaryFile").load(path).select("content")
    want = record_type

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("url", "warc_ts", "rec_type", "body")}
            for blob in pdf["content"]:
                data = bytes(blob)
                if data[:2] == b"\x1f\x8b":
                    chunks: Iterator[bytes] = _gzip_chunks(data)
                else:
                    chunks = iter((data,))
                for headers, body in iter_warc_records(chunks):
                    if headers.get("warc-type") != want:
                        continue
                    rows["url"].append(headers.get("warc-target-uri", ""))
                    rows["warc_ts"].append(headers.get("warc-date", ""))
                    rows["rec_type"].append(want)
                    rows["body"].append(body)
            yield pd.DataFrame(rows)

    return files.mapInPandas(
        _parse,
        schema="url string, warc_ts string, rec_type string, body binary",
    )


CACHE_HEADER_NAMES = (
    "cache-control", "expires", "date", "last-modified", "etag",
)


def warc_http_headers(
    spark: SparkSession, path: str,
    names: Tuple[str, ...] = CACHE_HEADER_NAMES,
) -> DataFrame:
    """WARC archive(s) → (url, warc_ts, status_code, <one column per
    requested HTTP response header, name lowercased with ``-`` →
    ``_``>). The freshness/validator side of a capture that
    ``warc_pages`` deliberately drops — feed the cache columns to
    ``recrawl.cache_ttl_s`` so the re-crawl schedule honors the
    server's own RFC 9111 lifetime declarations. Absent headers are
    NULL, never a row failure; same per-file-parallel damage-tolerant
    walk as the other readers."""
    files = spark.read.format("binaryFile").load(path).select("content")
    want = tuple(n.lower() for n in names)
    cols = tuple(n.replace("-", "_") for n in want)

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict = {k: [] for k in
                          ("url", "warc_ts", "status_code") + cols}
            for blob in pdf["content"]:
                for url, ts, status, hh, _payload in _iter_responses(
                    bytes(blob)
                ):
                    rows["url"].append(url)
                    rows["warc_ts"].append(ts)
                    rows["status_code"].append(status)
                    for n, c in zip(want, cols):
                        rows[c].append(hh.get(n))
            yield pd.DataFrame(rows)

    schema = "url string, warc_ts string, status_code int, " + ", ".join(
        f"{c} string" for c in cols)
    return files.mapInPandas(_parse, schema=schema)


def wet_docs(spark: SparkSession, path: str) -> DataFrame:
    """WET archive(s) → (url, warc_ts, text): Common Crawl's
    pre-extracted plain text, the input for text-only training
    pipelines that skip the HTML extraction stage entirely. Bodies are
    UTF-8 per the WET spec (undecodable bytes replaced, never a task
    failure on a damaged record)."""
    from pyspark.sql import functions as F

    recs = warc_records(spark, path, record_type="conversion")
    return recs.select(
        "url", "warc_ts",
        F.decode(F.col("body"), "UTF-8").alias("text"),
    )


def write_wet(records: List[Tuple[str, str, str]], path: str,
              gzip_records: bool = False) -> None:
    """Write [(url, ts, text)] as a WET file — the test-fixture twin
    of ``wet_docs`` (conversion records, UTF-8 plain-text bodies)."""
    chunks: List[bytes] = []
    for url, ts, text in records:
        body = text.encode("utf-8")
        rec = (
            "WARC/1.0\r\n"
            "WARC-Type: conversion\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {ts}\r\n"
            "Content-Type: text/plain\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode("latin-1") + body + b"\r\n\r\n"
        chunks.append(gzip.compress(rec) if gzip_records else rec)
    with io.open(path, "wb") as fh:
        fh.write(b"".join(chunks))


def write_warc(
    records: List[Tuple[str, str, int, str, bytes]],
    path: str,
    gzip_records: bool = False,
) -> None:
    """Write [(url, ts, status, ctype, body)] as a WARC file — the
    test-fixture twin of ``parse_warc_bytes`` (CC layout when
    ``gzip_records``: one gzip member per record)."""
    chunks: List[bytes] = []
    for url, ts, status, ctype, body in records:
        http = (
            f"HTTP/1.1 {status} OK\r\nContent-Type: {ctype}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode("latin-1") + body
        rec = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {ts}\r\n"
            f"Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode("latin-1") + http + b"\r\n\r\n"
        chunks.append(gzip.compress(rec) if gzip_records else rec)
    with io.open(path, "wb") as fh:
        fh.write(b"".join(chunks))


def _response_record(url: str, ts: str, status: int, ctype: str,
                     body: bytes) -> bytes:
    """One ``response`` record's bytes (the ``write_warc`` framing +
    a deterministic ``WARC-Record-ID`` derived from (url, ts) — ISO
    28500 wants per-record ids; deriving them keeps the file bytes
    reproducible)."""
    import hashlib

    http = (
        f"HTTP/1.1 {status} OK\r\nContent-Type: {ctype}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode("latin-1") + body
    rid = hashlib.md5((url + "\x00" + ts).encode("utf-8")).hexdigest()
    return (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Record-ID: <urn:md5:{rid}>\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {ts}\r\n"
        f"Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(http)}\r\n\r\n"
    ).encode("latin-1") + http + b"\r\n\r\n"


WARC_MANIFEST = T.StructType([
    T.StructField("shard", T.IntegerType(), False),
    T.StructField("file", T.StringType(), False),
    T.StructField("n_records", T.LongType(), False),
    T.StructField("n_bytes", T.LongType(), False),
])

# CDX-style per-record index (the Common-Crawl cc-index pattern:
# url → (file, byte offset, member length), enabling one ranged read
# per page instead of an archive scan).
WARC_INDEX = T.StructType([
    T.StructField("shard", T.IntegerType(), False),
    T.StructField("file", T.StringType(), False),
    T.StructField("url", T.StringType(), False),
    T.StructField("ts", T.StringType(), False),
    T.StructField("offset", T.LongType(), False),
    T.StructField("length", T.LongType(), False),
])


def warc_sink(pages: DataFrame, path: str, n_shards: int,
              url_col: str = "url", ts_col: str = "warc_ts",
              status_col: str = "status_code",
              ctype_col: str = "content_type", body_col: str = "html",
              salt: str = "warc-v1", gzip_records: bool = True,
              mode: str = "error", index: bool = False) -> DataFrame:
    """Distributed WARC sink: write a pages table as ``n_shards``
    CC-layout archive files (``part-NNNNN.warc.gz``, one gzip member
    per record) — the interchange format every WARC consumer reads,
    and the inverse of :func:`warc_pages` (round-trip tested).

    Determinism at cluster scale: a row's shard is md5(url ∥ salt) %
    n_shards and records are written in (url, ts) order within the
    shard, so the OUTPUT BYTES are identical across re-runs, retries,
    input partitionings and cluster sizes (gzip members are written
    with mtime=0 — wall-clock in the gzip header is the classic
    nondeterminism leak). Each shard is built and written by ONE task
    (`applyInPandas` over the shard key — embarrassingly parallel,
    exactly how CC itself shards archives); ``path`` must be a
    filesystem every executor can reach (on a real cluster: a shared
    mount — for object stores, swap the ``open`` for the store's
    client; the sharding/determinism contract is the part that
    matters). Returns the manifest (shard, file, n_records, n_bytes);
    shards with no rows write no file (documented — a 1-row manifest
    per written file, never a silent drop: Σ n_records == input rows).

    ``index=True`` returns the CDX-style per-record index instead
    (shard, file, url, ts, offset, length — one row per record, the
    cc-index pattern): persist it as parquet next to the archives and
    any single page among 100 TB of archives is ONE ranged read
    (:func:`read_warc_member` / :func:`warc_lookup`) — each gzip
    member decompresses independently, which is exactly why CC writes
    one member per record. The manifest is the index aggregated, so
    both forms come from the same write.

    Size the shards like CC does (~1 GB gzipped) via ``n_shards`` ≈
    corpus_bytes / 1 GB; one shard's records must fit one task's
    memory, same bound as every grouped kernel here.
    """
    import os

    import pandas as pd  # noqa: F811 (executor-side)
    from pyspark.sql import functions as F

    if mode not in ("error", "overwrite"):
        raise ValueError("mode must be 'error' or 'overwrite'")
    if os.path.isdir(path) and os.listdir(path):
        if mode == "error":
            raise FileExistsError(f"{path} exists and is non-empty")
        for f in os.listdir(path):
            os.unlink(os.path.join(path, f))
    os.makedirs(path, exist_ok=True)

    rows = pages.select(
        F.col(url_col).alias("url"),
        F.col(ts_col).cast("string").alias("ts"),
        F.coalesce(F.col(status_col), F.lit(200)).alias("status"),
        F.coalesce(F.col(ctype_col), F.lit("text/html")).alias("ctype"),
        F.col(body_col).cast("binary").alias("body"),
        F.pmod(
            F.conv(F.substring(F.md5(F.concat_ws(
                "\x00", F.col(url_col), F.lit(salt))), 1, 15), 16, 10)
            .cast("long"),
            F.lit(n_shards),
        ).cast("int").alias("shard"),
    )

    def _write(pdf: "pd.DataFrame") -> "pd.DataFrame":
        shard = int(pdf["shard"].iloc[0])
        pdf = pdf.sort_values(["url", "ts"], kind="mergesort")
        fname = os.path.join(path, f"part-{shard:05d}.warc"
                             + (".gz" if gzip_records else ""))
        idx = []
        offset = 0
        with open(fname, "wb") as fh:
            for r in pdf.itertuples(index=False):
                body = bytes(r.body) if r.body is not None else b""
                rec = _response_record(r.url or "", r.ts or "",
                                       int(r.status), r.ctype, body)
                if gzip_records:
                    rec = gzip.compress(rec, mtime=0)
                fh.write(rec)
                idx.append({"shard": shard, "file": fname,
                            "url": r.url or "", "ts": r.ts or "",
                            "offset": offset, "length": len(rec)})
                offset += len(rec)
        return pd.DataFrame(idx)

    index_rows = (
        rows.repartition(n_shards, "shard")
        .groupBy("shard")
        .applyInPandas(_write, schema=WARC_INDEX)
        .collect()
    )
    spark = pages.sparkSession
    index_df = spark.createDataFrame(index_rows, WARC_INDEX)
    if index:
        return index_df
    return index_df.groupBy("shard", "file").agg(
        F.count("*").alias("n_records"),
        F.sum("length").alias("n_bytes"),
    ).select("shard", "file", "n_records", "n_bytes")


def read_warc_member(file: str, offset: int, length: int
                     ) -> Tuple[str, str, int, str, bytes]:
    """ONE ranged read: seek to an index row's (offset, length), read
    that member, parse the single record → (url, ts, status, ctype,
    body). For object stores this is a ranged GET of ``length`` bytes;
    the archive is never scanned."""
    with open(file, "rb") as fh:
        fh.seek(offset)
        blob = fh.read(length)
    recs = parse_warc_bytes(blob)
    if len(recs) != 1:
        raise ValueError(
            f"index row did not frame exactly one record ({len(recs)})")
    return recs[0]


def warc_lookup(index: DataFrame, urls) -> List[
        Tuple[str, str, int, str, bytes]]:
    """Point-lookup pages from archives via the CDX index: filter the
    index on the requested urls (parquet predicate pushdown — the scan
    touches only matching row groups), then one ranged read per hit.
    Query-sized work: the collect is bounded by ``len(urls)`` rows and
    the reads by their members — the archives themselves stay cold."""
    from pyspark.sql import functions as F

    hits = index.filter(F.col("url").isin(list(urls))).collect()
    return [read_warc_member(r.file, r.offset, r.length) for r in hits]
