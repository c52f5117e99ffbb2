"""WARC (ISO 28500 / WARC/1.0) reader + record serializer.

Web-scale crawls interchange results as WARC — Common Crawl's entire
corpus is .warc.gz — so a crawl engine that can't ingest or emit it
doesn't connect to the ecosystem. This is a from-spec implementation
(record grammar per the public ISO 28500 / IIPC warc-specifications
documents): no warcio/library dependency, stdlib ``gzip`` only.

Record grammar (reader is tolerant, writer is canonical):

    WARC/1.0\r\n
    <name>: <value>\r\n ...          (WARC-Type, WARC-Target-URI,
    \r\n                              WARC-Date, Content-Length, ...)
    <Content-Length bytes of block>
    \r\n\r\n

For ``response`` records the block is an HTTP/1.1 message; the reader
parses its status line and headers and returns the decoded payload body.
``.warc.gz`` files are per-record gzip members (the Common Crawl layout —
members are concatenated, so whole-file decompression yields the plain
stream); both plain and gzip inputs are auto-detected by magic bytes.

Spark integration: :func:`read_warc` scans a directory with the
``binaryFile`` source — one task per file, so parallelism = file count,
the standard WARC sharding model (crawlers rotate ~1 GiB files) — and
parses records in ``mapInPandas`` batches. Writing stays sink-agnostic
and distributed: :func:`warc_record_bytes` serializes each result row to
a canonical record inside an Arrow-batched UDF; any binary sink (or a
per-partition concat) produces valid WARC because records are
self-delimiting.
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_CRLF = b"\r\n"

WARC_RECORDS = StructType(
    [
        StructField("file", StringType()),
        StructField("record_offset", LongType()),
        StructField("record_length", LongType()),
        StructField("warc_type", StringType()),
        StructField("target_uri", StringType()),
        StructField("warc_date", StringType()),
        StructField("record_id", StringType()),
        StructField("http_status", IntegerType()),
        StructField("content_type", StringType()),
        StructField("payload", BinaryType()),
    ]
)


def _hdr_decode(b: bytes) -> str:
    """WARC/HTTP header values are UTF-8 per spec; legacy archives carry
    latin-1 — try the spec encoding, fall back byte-preserving."""
    try:
        return b.decode("utf-8")
    except UnicodeDecodeError:
        return b.decode("latin-1")


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(_CRLF):
        if not line or b":" not in line:
            continue
        k, _, v = line.partition(b":")
        headers[_hdr_decode(k.strip()).lower()] = _hdr_decode(v.strip())
    return headers


def _parse_http_block(block: bytes) -> tuple[int | None, str | None, bytes]:
    """(status, content-type, body) from an HTTP/1.1 response message;
    (None, None, block) when the block is not an HTTP message."""
    if not block.startswith(b"HTTP/"):
        return None, None, block
    head, sep, body = block.partition(_CRLF + _CRLF)
    if not sep:
        return None, None, block
    first, _, rest = head.partition(_CRLF)
    parts = first.split(None, 2)
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        return None, None, block
    hdrs = _parse_headers(rest)
    return status, hdrs.get("content-type"), body


def iter_warc_records(data: bytes) -> Iterator[dict]:
    """Yield record dicts (WARC_RECORDS fields minus ``file``) from the
    bytes of one WARC file, plain or gzip (multi-member). Malformed
    trailing garbage ends iteration; a bad Content-Length raises
    ``ValueError`` — corrupt archives should be loud, not truncated
    silently."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)  # multi-member: yields the full stream
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record blank lines
        while data[pos:pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            return
        offset = pos
        if not data.startswith(b"WARC/", pos):
            return  # tolerate trailing junk after the last record
        head_end = data.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            return
        header_block = data[pos:head_end]
        headers = _parse_headers(header_block.partition(_CRLF)[2])
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError) as e:
            raise ValueError(f"WARC record at {offset}: bad Content-Length") from e
        block_start = head_end + 4
        block = data[block_start:block_start + length]
        if len(block) != length:
            raise ValueError(
                f"WARC record at {offset}: truncated block "
                f"({len(block)}/{length} bytes)"
            )
        status, ctype, payload = (None, headers.get("content-type"), block)
        if headers.get("warc-type") == "response":
            status, ctype, payload = _parse_http_block(block)
        yield {
            "record_offset": offset,
            "record_length": block_start + length + 4 - offset,
            "warc_type": headers.get("warc-type"),
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "record_id": headers.get("warc-record-id"),
            "http_status": status,
            "content_type": ctype,
            "payload": payload,
        }
        pos = block_start + length


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Scan ``path`` (dir or glob of .warc / .warc.gz files) into a
    WARC_RECORDS DataFrame. One binaryFile task per file — parallelism is
    the file count, matching how crawls shard archives; records parse in
    Arrow batches with one file resident per task at a time."""
    files = spark.read.format("binaryFile").load(path)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in WARC_RECORDS.fields]
        for pdf in batches:
            rows = []
            for fname, content in zip(pdf["path"], pdf["content"]):
                for rec in iter_warc_records(bytes(content)):
                    rec["file"] = fname
                    rows.append(rec)
            yield pd.DataFrame(rows, columns=cols)

    return files.select("path", "content").mapInPandas(parse, WARC_RECORDS)


def _one_record(
    uri: str, date: str, status: int, content_type: str, body: bytes,
    record_id: str,
) -> bytes:
    # UTF-8, not latin-1: WARC/1.0 header values are UTF-8 per spec, and an
    # IRI target (non-ASCII host/path) must serialize, not crash the task
    http = (
        f"HTTP/1.1 {status} \r\nContent-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode("utf-8") + body
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"WARC-Date: {date}\r\n"
        f"WARC-Record-ID: <urn:uuid:{record_id}>\r\n"
        "Content-Type: application/http;msgtype=response\r\n"
        f"Content-Length: {len(http)}\r\n\r\n"
    ).encode("utf-8")
    return head + http + _CRLF + _CRLF


def warc_record_bytes(
    df: DataFrame,
    uri_col: str = "url",
    status_col: str = "status",
    content_type_col: str = "content_type",
    body_col: str = "body",
    date_col: str | None = None,
    compress: bool = False,
) -> DataFrame:
    """Append a ``warc_record`` binary column: each row serialized as one
    canonical WARC/1.0 response record (optionally a standalone gzip
    member, the .warc.gz per-record layout). Record IDs derive from
    xxhash64(uri, body) — content-addressed and deterministic, so re-runs
    emit identical archives. Records are self-delimiting: any binary sink
    that concatenates a partition's rows yields a valid WARC file."""
    from pyspark.sql import functions as F

    date = (
        F.col(date_col)
        if date_col
        else F.lit("1970-01-01T00:00:00Z")  # deterministic default epoch
    )
    rid = F.lower(F.hex(F.xxhash64(F.col(uri_col), F.col(body_col))))
    src = df.withColumn("__date", date).withColumn("__rid", rid)

    @F.pandas_udf(BinaryType())
    def _ser(
        uri: pd.Series, status: pd.Series, ctype: pd.Series,
        body: pd.Series, date_s: pd.Series, rid_s: pd.Series,
    ) -> pd.Series:
        out = []
        for u, st, ct, b, d, r in zip(uri, status, ctype, body, date_s, rid_s):
            rec = _one_record(
                u or "", d, int(st or 0), ct or "application/octet-stream",
                bytes(b or b""), r,
            )
            if compress:
                buf = io.BytesIO()
                with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                    gz.write(rec)
                rec = buf.getvalue()
            out.append(rec)
        return pd.Series(out)

    return src.withColumn(
        "warc_record",
        _ser(
            F.col(uri_col), F.col(status_col), F.col(content_type_col),
            F.col(body_col), F.col("__date"), F.col("__rid"),
        ),
    ).drop("__date", "__rid")


def cdxj_index(records: DataFrame) -> DataFrame:
    """CDXJ capture-index rows from a WARC_RECORDS frame — the lookup
    sidecar web-archive tooling (pywb/OpenWayback) reads: per response
    record, a SURT-sorted url key, a 14-digit timestamp, and the capture
    metadata. Pure JVM expressions, zero shuffles (sorting for the final
    index file is the sink's concern).

    Documented simplifications vs pywb's canonicalizer: the urlkey is
    reverse-dotted-host ')/' + lowercased path?query (no www-stripping or
    query-sort), and the digest is hex sha1 of the payload (pywb uses
    base32). ``record_offset``/``record_length`` are decompressed-stream
    coordinates (the reader gunzips whole files)."""
    from pyspark.sql import functions as F

    scheme = r"^[A-Za-z][A-Za-z0-9+.\-]*://"
    host = F.regexp_extract("target_uri", scheme + r"([^/]+)", 1)
    rest = F.lower(F.regexp_extract("target_uri", scheme + r"[^/]*(/.*)?$", 1))
    urlkey = F.concat(
        F.array_join(F.reverse(F.split(F.lower(host), r"\.")), ","),
        F.lit(")"),
        F.when(rest == "", "/").otherwise(rest),
    )
    ts = F.substring(F.regexp_replace("warc_date", r"[^0-9]", ""), 1, 14)
    return (
        records.where(F.col("warc_type") == "response")
        .select(
            urlkey.alias("urlkey"),
            ts.alias("timestamp"),
            F.col("target_uri").alias("url"),
            F.col("content_type").alias("mime"),
            F.col("http_status").alias("status"),
            F.sha1(F.col("payload")).alias("digest"),
            F.col("record_length").alias("length"),
            F.col("record_offset").alias("offset"),
            F.col("file").alias("filename"),
        )
    )
