"""WARC source (sources/warc.py): parser unit matrix (plain / gzip-member
/ HTTP-strip / corrupt), the binaryFile -> mapInPandas read path, and the
registry panel's roundtrip-identity twin (WARC_ROUNDTRIP_ORACLE)."""

from __future__ import annotations

import zlib

import pytest
from pyspark.sql import functions as F

from yelp_business_data_pipeline_spark.sources.warc import (
    WARC_RECORD_SCHEMA,
    gunzip_members,
    parse_warc_bytes,
    read_warc_records,
    write_warc_bytes,
)


def _gz(b: bytes) -> bytes:
    c = zlib.compressobj(wbits=31)
    return c.compress(b) + c.flush()


RECS = [
    ("http://a.example.com/1", "2024-01-01T00:00:00Z", b"hello world"),
    ("http://b.example.com/2", "2024-01-01T00:00:01Z", b""),  # empty payload
    ("http://c.example.com/3", "2024-01-01T00:00:02Z", "café ☃".encode()),
]


def test_roundtrip_plain_and_gzip_members():
    blob = write_warc_bytes(RECS)
    for variant in (blob, b"".join(_gz(write_warc_bytes([r])) for r in RECS)):
        rows = parse_warc_bytes(variant, source_file="t")
        assert [r["warc_error"] for r in rows] == [None] * 3
        assert [(r["url"], r["payload"]) for r in rows] == [
            (u, p) for u, _, p in RECS
        ]
        assert all(r["warc_type"] == "response" for r in rows)
        assert rows[0]["warc_date"] == "2024-01-01T00:00:00Z"


def test_http_header_stripping():
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html>body</html>"
    )
    blob = write_warc_bytes([("http://x.example.com/", "2024-01-01T00:00:00Z", http)])
    (row,) = parse_warc_bytes(blob)
    assert row["payload"] == b"<html>body</html>"
    # strip_http=False keeps the raw record payload
    (raw,) = parse_warc_bytes(blob, strip_http=False)
    assert raw["payload"] == http
    # request-line form strips too; non-HTTP payloads pass untouched
    req = b"GET /p HTTP/1.1\r\nHost: x\r\n\r\nbody"
    blob2 = write_warc_bytes([("http://x.example.com/", "d", req)])
    blob2 = blob2.replace(b"WARC-Type: response", b"WARC-Type: request")
    (row2,) = parse_warc_bytes(blob2)
    assert row2["payload"] == b"body"
    plain = b"HTTP-free payload \r\n\r\n tail stays"
    (row3,) = parse_warc_bytes(
        write_warc_bytes([("http://x.example.com/", "d", plain)])
    )
    assert row3["payload"] == plain


def test_corrupt_inputs_are_counted_not_silent():
    good = write_warc_bytes(RECS[:1])
    cases = [
        (good + b"NOTWARC garbage", "expected WARC/ version line"),
        (good + b"WARC/1.0\r\nWARC-Type: response\r\n", "unterminated"),
        (
            good
            + b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 999\r\n\r\nx",
            "overruns",
        ),
        (good + b"WARC/1.0\r\nWARC-Type: response\r\n\r\nx", "Content-Length"),
    ]
    for blob, msg in cases:
        rows = parse_warc_bytes(blob)
        assert rows[0]["warc_error"] is None  # the good prefix is KEPT
        assert rows[-1]["warc_error"] and msg in rows[-1]["warc_error"], msg
    # truncated gzip member -> one loud error row
    rows = parse_warc_bytes(_gz(good)[:-5])
    assert len(rows) == 1 and "gzip" in rows[0]["warc_error"]
    # gunzip passthrough for plain bytes
    assert gunzip_members(b"plain") == b"plain"


def test_read_warc_records_spark_path(spark, tmp_path):
    """binaryFile -> one Arrow pass -> typed rows; warc_types filters
    responses, error rows always pass, min_payload_bytes prunes."""
    f1 = tmp_path / "a.warc"
    f1.write_bytes(write_warc_bytes(RECS))
    f2 = tmp_path / "b.warc.gz"
    f2.write_bytes(b"".join(_gz(write_warc_bytes([r])) for r in RECS))
    f3 = tmp_path / "c.warc"
    f3.write_bytes(write_warc_bytes(RECS[:1]) + b"NOTWARC")

    df = read_warc_records(spark, str(tmp_path / "*.warc*"))
    rows = df.collect()
    assert df.schema == WARC_RECORD_SCHEMA
    good = [r for r in rows if r.warc_error is None]
    errs = [r for r in rows if r.warc_error is not None]
    assert len(good) == 7 and len(errs) == 1  # 3 + 3(gz) + 1 before corrupt
    assert {bytes(r.payload) for r in good} == {p for _, _, p in RECS}
    # min_payload_bytes prunes the empty record but never the error row
    pruned = read_warc_records(
        spark, str(tmp_path / "*.warc*"), min_payload_bytes=1
    ).collect()
    assert len([r for r in pruned if r.warc_error is None]) == 5
    assert len([r for r in pruned if r.warc_error is not None]) == 1
    # ADVICE r10: warc_types=() is ambiguous (no-type-filter intent vs a
    # match-nothing isin) — reject loudly BEFORE any py4j analysis error;
    # None is the explicit keep-all spelling
    import pytest

    with pytest.raises(ValueError, match="warc_types"):
        read_warc_records(spark, str(tmp_path / "*.warc*"), warc_types=())
    all_types = read_warc_records(
        spark, str(tmp_path / "*.warc*"), warc_types=None
    ).collect()
    assert len(all_types) == len(rows)  # every record type + the error row


def test_warc_panel_matches_duckdb_twin(spark, sf_dir):
    """Rotation-queue twin pin: the registered roundtrip panel (in-plan
    serialize -> real parser -> aggregate) must equal the twin's direct
    aggregate over documents — roundtrip identity, byte-exact."""
    from yelp_business_data_pipeline_spark.plans import QUERIES
    from yelp_business_data_pipeline_spark.plans.extensions import (
        WARC_ROUNDTRIP_ORACLE,
    )

    from .oracle_harness import duck_con

    srows = sorted(
        tuple(r)
        for r in QUERIES["warc_roundtrip_panel"].spark(spark, sf_dir).collect()
    )
    drows = sorted(duck_con(sf_dir).execute(WARC_ROUNDTRIP_ORACLE).fetchall())
    assert srows == drows and len(srows) >= 10


def test_warc_registry_gate_position():
    """Promoted into the 50-slot driver gate in the r11 rotation — the
    registration must sit inside the gate AND carry the
    WARC_ROUNDTRIP_ORACLE twin."""
    from yelp_business_data_pipeline_spark.plans import QUERIES
    from yelp_business_data_pipeline_spark.plans.extensions import (
        WARC_ROUNDTRIP_ORACLE,
    )

    names = list(QUERIES)
    assert names.index("warc_roundtrip_panel") < 50
    assert QUERIES["warc_roundtrip_panel"].oracle == WARC_ROUNDTRIP_ORACLE
