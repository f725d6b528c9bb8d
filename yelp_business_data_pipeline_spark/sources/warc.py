"""WARC (Web ARChive, ISO 28500) source — the Common Crawl ingest format.

A 100-TB pretraining pipeline's rawest input is WARC: the format Common
Crawl, Internet Archive, and every serious crawler publish. This module
reads it with the STDLIB ONLY (no warcio in this container, and none
needed — WARC is line-oriented headers plus a Content-Length-delimited
payload), Spark-first:

- ``spark.read.format("binaryFile")`` turns each ``.warc`` /
  ``.warc.gz`` file into one (path, content) row — a WARC file is a
  self-contained record stream, so the natural unit of parallelism IS
  the file (Common Crawl ships ~1 GB segments precisely so a fleet can
  map over them; 100 TB = ~100k files = 100k tasks).
- ``read_warc_records`` is ONE zero-shuffle ``mapInPandas`` pass: each
  task decompresses its file (Common Crawl gzips PER RECORD — member-
  concatenated gzip, which ``zlib`` handles with a decompressobj loop,
  streaming, never materializing more than one member's buffer beyond
  the parse cursor), walks the records, and emits typed rows. Blobs
  never leave the executor; the driver sees only the final frame.
- Corrupt input is LOUD-OR-COUNTED, never silent: a malformed record
  header terminates that file's walk and emits a ``warc_error`` row
  carrying the byte offset (dropping the tail silently would
  under-ingest a crawl without anyone noticing), while well-formed
  records before the corruption are kept.

The parsed frame feeds the existing crawl stack directly:
``(url, html)`` rows for ``streaming.stream_web_crawl_pipeline`` /
``operators/htmlx.extract_main_text``, and the payload/metadata shape
matches ``operators/multimodal``'s binary-column conventions.

Registry twin: ``plans/extensions.py:warc_roundtrip_panel`` synthesizes
WARC bytes from the documents table in-plan, parses them back with THIS
parser, and aggregates — its DuckDB oracle computes the same aggregate
from the source rows directly, so the roundtrip-identity property is
what the twin checks (DuckDB cannot parse WARC; it doesn't need to).

Public references: ISO 28500 / the IIPC WARC 1.1 spec, Common Crawl's
"Get Started" docs (per-record gzip members), RFC 1952 (gzip framing).
No reference-repo counterpart (the reference starts from Yelp JSON).
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Output schema of :func:`read_warc_records` (and the row shape
#: :func:`parse_warc_bytes` yields). ``payload`` is the raw record block
#: (HTTP headers stripped for response/request records when
#: ``strip_http=True``); ``warc_error`` is NULL for good rows.
WARC_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("source_file", T.StringType()),
        T.StructField("record_idx", T.LongType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("warc_error", T.StringType()),
    ]
)

_CRLF2 = b"\r\n\r\n"


def gunzip_members(blob: bytes) -> bytes:
    """Decompress member-concatenated gzip (the Common Crawl layout: one
    gzip member per WARC record) into one byte stream. Plain (non-gzip)
    input is returned as-is; a truncated final member raises ``zlib.error``
    — the caller converts that to a counted ``warc_error`` row."""
    if len(blob) < 2 or blob[:2] != b"\x1f\x8b":
        return blob
    out = []
    # O(total bytes), not O(members x chunk): memoryview slices are
    # zero-copy and each member's feeds GROW GEOMETRICALLY from 4 KiB,
    # so the per-member overshoot (zlib's unused_data copy when eof
    # lands mid-chunk) is proportional to THAT member's size, never a
    # fixed large chunk — with Common Crawl's tiny per-record members a
    # fixed 1 MiB first feed copies ~1 MiB of tail per member (measured
    # 44x wall at 10x members, the r10 fix's residual quadratic); a
    # naive d.decompress(blob[pos:]) is worse still (O(members x
    # remaining)). Large members still reach the 1 MiB cap in a few
    # doublings, keeping the feed count logarithmic in member size.
    max_chunk = 1 << 20
    mv = memoryview(blob)
    n = len(blob)
    pos = 0
    while pos < n:
        d = zlib.decompressobj(wbits=31)  # 31 = gzip framing
        p = pos
        chunk = 1 << 12
        while not d.eof and p < n:
            piece = mv[p : p + chunk]
            out.append(d.decompress(piece))
            p += len(piece)
            chunk = min(chunk * 4, max_chunk)
        if not d.eof:
            raise zlib.error(f"truncated gzip member at offset {pos}")
        pos = p - len(d.unused_data)
    return b"".join(out)


def _strip_http_headers(payload: bytes) -> bytes:
    """Drop the HTTP header block from a response/request record's
    payload (status/request line through the blank line); payloads that
    don't start with an HTTP preamble pass through untouched. A response
    starts ``HTTP/``; a request's first line ends `` HTTP/<ver>``."""
    first_eol = payload.find(b"\r\n")
    if first_eol == -1:
        return payload
    first = payload[:first_eol]
    if payload[:5] == b"HTTP/" or b" HTTP/" in first:
        cut = payload.find(_CRLF2)
        if cut != -1:
            return payload[cut + 4 :]
    return payload


def parse_warc_bytes(
    blob: bytes,
    source_file: str = "",
    strip_http: bool = True,
) -> list[dict]:
    """Walk one WARC stream and return record dicts (WARC_RECORD_SCHEMA
    field names). Gzip (member-concatenated or whole-stream) is handled.

    The walk is clamped and always advances (the multimodal marker-walk
    rule): every record must declare ``Content-Length``, the cursor
    moves by exactly header + length + separator, and any malformed
    header/overrun terminates the walk with ONE error row carrying the
    byte offset — records parsed before the corruption are kept."""
    rows: list[dict] = []

    def _err(msg: str) -> None:
        rows.append(
            {
                "source_file": source_file,
                "record_idx": len(rows),
                "warc_type": None,
                "url": None,
                "warc_date": None,
                "content_type": None,
                "payload": None,
                "warc_error": msg,
            }
        )

    try:
        data = gunzip_members(blob)
    except zlib.error as e:
        _err(f"gzip: {e}")
        return rows

    pos, n = 0, len(data)
    while pos < n:
        # skip inter-record CRLF padding
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        if not data.startswith(b"WARC/", pos):
            _err(f"offset {pos}: expected WARC/ version line")
            break
        head_end = data.find(_CRLF2, pos)
        if head_end == -1:
            _err(f"offset {pos}: unterminated record header")
            break
        header_block = data[pos:head_end].decode("utf-8", errors="replace")
        headers: dict[str, str] = {}
        for line in header_block.split("\r\n")[1:]:
            k, sep, v = line.partition(":")
            if sep:
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            _err(f"offset {pos}: missing/invalid Content-Length")
            break
        body_start = head_end + 4
        body_end = body_start + length
        if length < 0 or body_end > n:
            _err(f"offset {pos}: Content-Length {length} overruns payload")
            break
        payload = data[body_start:body_end]
        wtype = headers.get("warc-type")
        if strip_http and wtype in ("response", "request"):
            payload = _strip_http_headers(payload)
        rows.append(
            {
                "source_file": source_file,
                "record_idx": len(rows),
                "warc_type": wtype,
                # WARC 1.1 allows <...> around the URI; strip it
                "url": (headers.get("warc-target-uri") or "").strip("<>") or None,
                "warc_date": headers.get("warc-date"),
                "content_type": headers.get("content-type"),
                "payload": bytes(payload),
                "warc_error": None,
            }
        )
        pos = body_end
    return rows


def write_warc_bytes(records: list[tuple[str, str, bytes]]) -> bytes:
    """Serialize (url, date, payload) triples as WARC response records —
    the test/synthesis inverse of :func:`parse_warc_bytes` (roundtrip
    identity is the registry panel's pinned property). Deterministic:
    no RNG, no wall clock — the caller supplies dates."""
    out = []
    for url, date, payload in records:
        header = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {date}\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(payload)}\r\n"
        ).encode()
        out.append(header + b"\r\n" + payload + _CRLF2)
    return b"".join(out)


def read_warc_records(
    spark: SparkSession,
    path: str,
    warc_types: tuple[str, ...] | None = ("response",),
    strip_http: bool = True,
    min_payload_bytes: int = 0,
) -> DataFrame:
    """Read ``.warc`` / ``.warc.gz`` files into WARC_RECORD_SCHEMA rows —
    one zero-shuffle Arrow pass, one task per file (the Common Crawl
    parallelism unit; see module docstring). ``warc_types`` filters to
    the record kinds a pipeline wants (responses, usually) — pass
    ``None`` to keep every type — while error rows ALWAYS pass through:
    ingest accounting must see them."""
    if warc_types is not None and len(warc_types) == 0:
        raise ValueError(
            "read_warc_records: warc_types=() matches no record type — "
            "pass None to keep all types, or name the kinds you want "
            "(('response',), ('response', 'metadata'), ...)"
        )
    binary = spark.read.format("binaryFile").load(path)

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in WARC_RECORD_SCHEMA.fields]
        for pdf in batches:
            out: list[dict] = []
            for p, blob in zip(pdf["path"], pdf["content"]):
                out.extend(
                    parse_warc_bytes(bytes(blob), source_file=p, strip_http=strip_http)
                )
            yield pd.DataFrame(out, columns=cols)

    df = binary.select("path", "content").mapInPandas(_parse, WARC_RECORD_SCHEMA)
    wanted = F.lit(True) if warc_types is None else F.col("warc_type").isin(*warc_types)
    if min_payload_bytes > 0:
        wanted = wanted & (F.length("payload") >= min_payload_bytes)
    return df.filter(F.col("warc_error").isNotNull() | wanted)
