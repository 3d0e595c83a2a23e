"""WARC (Web ARChive, ISO 28500) source + sink — the interchange format
of web-scale crawling (Common Crawl ships ~64k ``.warc.gz`` shards per
monthly crawl). The reference persists fetched pages only as parsed rows
(/root/reference/worker.py:221-318 writes results straight to its store);
an engine meant to interoperate at 100 TB must both READ the public
crawl archives and WRITE its own fetch output as WARC.

Everything here is stdlib-only (``zlib``/``gzip`` + byte walking — no
``warcio``) and distributed:

- ``read_warc``: ``spark.read.format("binaryFile")`` gives one row per
  archive file; a ``mapInPandas`` stage parses each file's records. The
  scale unit is the FILE: per-record gzip members make a ``.warc.gz``
  unsplittable, so parallelism = shard count (Common Crawl sizes shards
  ~1 GiB for exactly this reason). For selective access at scale the
  companion CDX index (offset, length per record) turns reads into
  ranged fetches of single members — the same parser applies, seeded
  with one member instead of a whole file.
- ``write_warc``: ``applyInPandas`` grouped by a file-assignment column;
  each task serializes its group as one WARC file (each record its own
  gzip member, per the spec's recommendation, so downstream readers can
  seek) and returns a manifest row. One task = one output shard = the
  layout object stores want.

Record grammar handled (WARC/1.0 and 1.1): version line, CRLF header
block, ``Content-Length``-delimited content, two CRLFs between records.
Payload parsing covers ``application/http; msgtype=response`` content
(status line + headers + body split at the first blank line); other
WARC types (request, warcinfo, metadata) surface with a null
``http_status`` and their raw content as the payload. Content-Length
discipline means bodies may legally contain ``WARC/1.0`` or blank lines
without confusing the walker — the tests pin that.
"""

from __future__ import annotations

import gzip
import hashlib
import os
import zlib
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CRLF = b"\r\n"
_GZIP_MAGIC = b"\x1f\x8b"

WARC_RECORD_SCHEMA = T.StructType([
    T.StructField("warc_file", T.StringType()),
    T.StructField("record_id", T.StringType()),
    T.StructField("warc_type", T.StringType()),
    T.StructField("target_uri", T.StringType()),
    T.StructField("warc_date", T.StringType()),
    T.StructField("http_status", T.IntegerType()),
    T.StructField("content_type", T.StringType()),
    T.StructField("payload", T.BinaryType()),
])

WARC_MANIFEST_SCHEMA = T.StructType([
    T.StructField("file_id", T.LongType()),
    T.StructField("path", T.StringType()),
    T.StructField("n_records", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
])

# CDX(J)-style capture index: one row per record with the byte range of
# its gzip member — what turns a 100 TB archive into ranged fetches.
WARC_CDX_SCHEMA = T.StructType([
    T.StructField("target_uri", T.StringType()),
    T.StructField("path", T.StringType()),
    T.StructField("offset", T.LongType()),
    T.StructField("length", T.LongType()),
    T.StructField("http_status", T.IntegerType()),
])


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a stream of concatenated gzip members (the standard
    .warc.gz layout: one member per record) into one plain byte stream."""
    out = []
    rest = data
    while rest[:2] == _GZIP_MAGIC:
        d = zlib.decompressobj(wbits=31)
        out.append(d.decompress(rest))
        if not d.eof:  # truncated member: keep what decoded, stop
            break
        rest = d.unused_data
    return b"".join(out)


def build_warc_record(warc_type: str, record_id: str, date: str,
                      target_uri: str | None, content: bytes,
                      content_type: str = "application/http; msgtype=response",
                      ) -> bytes:
    """Serialize one WARC/1.0 record (headers + Content-Length-delimited
    content + the spec's two-CRLF record separator)."""
    headers = [
        ("WARC-Type", warc_type),
        ("WARC-Record-ID", record_id),
        ("WARC-Date", date),
        ("Content-Type", content_type),
        ("Content-Length", str(len(content))),
    ]
    if target_uri is not None:
        headers.insert(3, ("WARC-Target-URI", target_uri))
    head = b"WARC/1.0" + _CRLF + b"".join(
        f"{k}: {v}".encode("utf-8") + _CRLF for k, v in headers
    ) + _CRLF
    return head + content + _CRLF + _CRLF


def build_http_response(status: int, reason: str, content_type: str,
                        body: bytes) -> bytes:
    """Serialize the HTTP response block a ``response`` record carries."""
    return (
        f"HTTP/1.1 {status} {reason}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode("utf-8") + body


def _parse_http_response(content: bytes) -> tuple[int | None, str | None, bytes]:
    """(status, content_type, body) from an HTTP response block; a block
    that doesn't start with HTTP/ comes back as raw payload."""
    if not content.startswith(b"HTTP/"):
        return None, None, content
    sep = content.find(b"\r\n\r\n")
    if sep < 0:
        head, body = content, b""
    else:
        head, body = content[:sep], content[sep + 4:]
    lines = head.split(_CRLF)
    status = None
    parts = lines[0].split(b" ", 2)
    if len(parts) >= 2 and parts[1].isdigit():
        status = int(parts[1])
    ctype = None
    for line in lines[1:]:
        k, _, v = line.partition(b":")
        if k.strip().lower() == b"content-type":
            ctype = v.strip().decode("utf-8", "replace")
            break
    return status, ctype, body


def parse_warc_bytes(data: bytes | None) -> list[dict]:
    """Parse a (plain or per-record-gzipped) WARC byte stream into a list
    of record dicts. Malformed leading bytes abort cleanly (empty list /
    records parsed so far) — at 100 TB a corrupt shard must degrade to a
    counted failure, not a job abort."""
    if not data:
        return []
    if data[:2] == _GZIP_MAGIC:
        data = _gunzip_members(data)
    records: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        # tolerate inter-record padding/CRLFs
        while pos < n and data[pos:pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            break
        if not data[pos:pos + 5] == b"WARC/":
            break  # not a record boundary: stop (corrupt tail)
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            break
        headers: dict[str, str] = {}
        for line in data[pos:head_end].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("utf-8", "replace")] = (
                v.strip().decode("utf-8", "replace"))
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            break
        body_start = head_end + 4
        if body_start + clen > n:
            break  # truncated record
        content = data[body_start:body_start + clen]
        status, http_ctype, payload = _parse_http_response(content)
        records.append({
            "record_id": headers.get("warc-record-id"),
            "warc_type": headers.get("warc-type"),
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "http_status": status,
            "content_type": http_ctype or headers.get("content-type"),
            "payload": payload,
        })
        pos = body_start + clen
    return records


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC reader: one ``binaryFile`` row per archive shard,
    one Arrow-batched ``mapInPandas`` parse per shard. Column pruning on
    the binaryFile source keeps ``content`` out of the scan when only
    paths are selected; the parse stage holds O(one file) per task."""
    files = spark.read.format("binaryFile").load(path)

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                for rec in parse_warc_bytes(bytes(blob) if blob is not None
                                            else None):
                    rec["warc_file"] = os.path.basename(fpath)
                    rows.append(rec)
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_RECORD_SCHEMA.fields])

    return files.select("path", "content").mapInPandas(
        gen, schema=WARC_RECORD_SCHEMA)


def _serialize_group(pdf: pd.DataFrame, uri_col: str, status_col: str,
                     ctype_col: str, payload_col: str, date: str,
                     compress: bool) -> tuple[bytes, list[dict]]:
    """One shard's bytes + its per-record CDX rows (offset/length of each
    gzip member within the shard). Rows are URI-sorted so the shard is
    byte-deterministic under any upstream partitioning."""
    pdf = pdf.sort_values(uri_col, kind="mergesort")
    parts: list[bytes] = []
    cdx: list[dict] = []
    offset = 0
    for _, row in pdf.iterrows():
        status = int(row[status_col])
        reason = {200: "OK", 404: "Not Found", 301: "Moved Permanently",
                  500: "Internal Server Error"}.get(status, "Unknown")
        body = row[payload_col]
        body = bytes(body) if body is not None else b""
        uri = str(row[uri_col])
        rec = build_warc_record(
            "response",
            "<urn:md5:%s>" % hashlib.md5(uri.encode()).hexdigest(),
            date, uri,
            build_http_response(status, reason, str(row[ctype_col]), body),
        )
        member = (gzip.compress(rec, compresslevel=6, mtime=0)
                  if compress else rec)
        parts.append(member)
        cdx.append({"target_uri": uri, "offset": offset,
                    "length": len(member), "http_status": status})
        offset += len(member)
    return b"".join(parts), cdx


def _publish(path: str, blob: bytes) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)  # atomic publish, crash-safe like the ledger


def write_warc(records: DataFrame, out_dir: str,
               file_col: str = "file_id", uri_col: str = "target_uri",
               status_col: str = "http_status",
               ctype_col: str = "content_type",
               payload_col: str = "payload",
               date: str = "2026-08-19T00:00:00Z",
               compress: bool = True) -> DataFrame:
    """Distributed WARC sink: each ``file_col`` group becomes ONE
    ``part-<id>.warc[.gz]`` shard written by its own task (records sorted
    by URI inside the shard for determinism; each record its own gzip
    member so readers can seek). Returns the manifest (file_id, path,
    n_records, n_bytes). Record IDs are content-addressed
    (``urn:md5:<hex>`` of the target URI) so a re-run writes
    byte-identical shards — idempotent replay, the same discipline the
    crawl ledger uses."""
    os.makedirs(out_dir, exist_ok=True)
    ext = ".warc.gz" if compress else ".warc"

    def emit(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        fid = int(key[0])
        blob, _ = _serialize_group(pdf, uri_col, status_col, ctype_col,
                                   payload_col, date, compress)
        path = os.path.join(out_dir, f"part-{fid:05d}{ext}")
        _publish(path, blob)
        return pd.DataFrame([{"file_id": fid, "path": path,
                              "n_records": len(pdf), "n_bytes": len(blob)}])

    return (
        records.groupBy(file_col)
        .applyInPandas(emit, schema=WARC_MANIFEST_SCHEMA)
    )


def write_warc_cdx(records: DataFrame, out_dir: str,
                   file_col: str = "file_id", uri_col: str = "target_uri",
                   status_col: str = "http_status",
                   ctype_col: str = "content_type",
                   payload_col: str = "payload",
                   date: str = "2026-08-19T00:00:00Z") -> DataFrame:
    """``write_warc`` variant that returns the CDX capture index instead
    of the shard manifest: one row per record, ``(target_uri, path,
    offset, length, http_status)`` — the byte range of the record's own
    gzip member within its shard. This is Common Crawl's access model:
    the index (a few GB) is the queryable table; the archive (100s of TB)
    is only touched via ranged fetches of single members. Always
    compressed (per-record members are what make ranged access work)."""
    os.makedirs(out_dir, exist_ok=True)

    def emit(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        fid = int(key[0])
        blob, cdx = _serialize_group(pdf, uri_col, status_col, ctype_col,
                                     payload_col, date, compress=True)
        path = os.path.join(out_dir, f"part-{fid:05d}.warc.gz")
        _publish(path, blob)
        for row in cdx:
            row["path"] = path
        return pd.DataFrame(
            cdx, columns=[f.name for f in WARC_CDX_SCHEMA.fields])

    return records.groupBy(file_col).applyInPandas(
        emit, schema=WARC_CDX_SCHEMA)


def read_warc_member(path: str, offset: int, length: int) -> dict | None:
    """Ranged fetch of ONE record: seek to the gzip member's byte range,
    inflate, parse. On object storage this is a ranged GET — the only
    archive touch a CDX-driven pipeline makes."""
    with open(path, "rb") as f:
        f.seek(offset)
        member = f.read(length)
    recs = parse_warc_bytes(member)
    return recs[0] if recs else None


def fetch_warc_records(spark: SparkSession, cdx: DataFrame) -> DataFrame:
    """Distributed ranged-record fetch: a ``mapInPandas`` stage turns each
    CDX row into its parsed record. Tasks touch exactly the byte ranges
    they need — scan cost scales with the SELECTION, not the archive.
    Partition the CDX by ``path`` upstream (one repartition on a slim
    table) to coalesce each shard's ranged reads into one task."""

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, off, ln in zip(pdf["path"], pdf["offset"],
                                     pdf["length"]):
                rec = read_warc_member(str(path), int(off), int(ln))
                if rec is not None:
                    rec["warc_file"] = os.path.basename(str(path))
                    rows.append(rec)
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_RECORD_SCHEMA.fields])

    return cdx.select("path", "offset", "length").mapInPandas(
        gen, schema=WARC_RECORD_SCHEMA)
