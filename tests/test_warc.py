"""WARC source: parse round-trip, gzip handling, pipeline integration."""

from __future__ import annotations

import gzip

import pytest

from ocr_spark import pagegen
from ocr_spark.job import run_pipeline
from ocr_spark.sources import warc
from tests.conftest import RUN_DATE

N_PAGES = 60


@pytest.fixture(scope="module")
def warc_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("warc")
    pages = [pagegen.page_for(i) for i in range(N_PAGES)]
    warc.write_warc(str(d / "crawl-00.warc.gz"), pages[: N_PAGES // 2],
                    compress=True)
    warc.write_warc(str(d / "crawl-01.warc"), pages[N_PAGES // 2:],
                    compress=False)
    return str(d)


def test_roundtrip_pure_python(tmp_path):
    pages = [pagegen.page_for(i) for i in range(5)]
    path = str(tmp_path / "t.warc.gz")
    assert warc.write_warc(path, pages) == 5
    with open(path, "rb") as fh:
        parsed = list(warc.records_to_pages(fh.read()))
    assert [p["url"] for p in parsed] == [p["url"] for p in pages]
    assert parsed[0]["html"] == pages[0]["html"]  # HTTP envelope stripped
    assert parsed[0]["warc_ts"] is not None


def test_skips_non_response_records():
    req = warc._format_record(
        {"WARC-Type": "request", "WARC-Target-URI": "http://x"}, b"GET /")
    meta = warc._format_record({"WARC-Type": "warcinfo"}, b"fields")
    resp = warc._format_record(
        {"WARC-Type": "response", "WARC-Target-URI": "http://keep",
         "WARC-Date": "2026-01-15T10:00:00Z"},
        b"HTTP/1.1 200 OK\r\n\r\n<html>hi</html>")
    parsed = list(warc.records_to_pages(req + meta + resp))
    assert [p["url"] for p in parsed] == ["http://keep"]
    assert parsed[0]["html"] == b"<html>hi</html>"


def test_truncated_archive_stops_cleanly():
    resp = warc._format_record(
        {"WARC-Type": "response", "WARC-Target-URI": "http://a"},
        b"HTTP/1.1 200 OK\r\n\r\nbody")
    assert len(list(warc.records_to_pages(resp + b"WARC/1.0\r\ngarbage"))) == 1


def test_negative_content_length_terminates():
    """A negative Content-Length can move the scan position BACKWARD onto
    bytes inside the same header block — without the guard this exact
    68-byte record re-parses itself forever (an infinite generator that
    hangs the executor task)."""
    rec = (b"WARC/1.0\r\nX: WARC/1.0\r\nWARC-Type: response\r\n"
           b"Content-Length: -54\r\n\r\n")
    assert list(warc.iter_warc_records(rec)) == []
    # and a valid record FOLLOWED by the malformed one still yields once
    resp = warc._format_record(
        {"WARC-Type": "response", "WARC-Target-URI": "http://ok"},
        b"HTTP/1.1 200 OK\r\n\r\nbody")
    assert len(list(warc.records_to_pages(resp + rec))) == 1


def test_read_warc_spark(spark, warc_dir):
    df = warc.read_warc(spark, warc_dir)
    rows = df.collect()
    assert len(rows) == N_PAGES
    assert {r["url"] for r in rows} == \
        {pagegen.page_for(i)["url"] for i in range(N_PAGES)}


def test_warc_through_pipeline(spark, warc_dir, tmp_path):
    """WARC → pages → full extraction pipeline: text recovered byte-exactly."""
    pages_df = warc.read_warc(spark, warc_dir)
    out = str(tmp_path / "out")
    summary = run_pipeline(spark, None, out, RUN_DATE, partitions=4,
                           input_df=pages_df)
    assert summary["input_count"] == N_PAGES
    data = {r["url"]: r["extracted_text"]
            for r in spark.read.parquet(f"{out}/data").collect()}
    for i in range(N_PAGES):
        page = pagegen.page_for(i)
        assert page["text"] in data[page["url"]]


def test_warc_gzip_bomb_bounded():
    """A gzip bomb pointed at the WARC reader must inflate to at most
    max_ratio x the compressed size, not gigabytes (deflate expands up
    to ~1032:1).  Legit member-per-record archives still read fully."""
    import gzip as _gzip
    import time

    from ocr_spark.sources import warc as w

    bomb = _gzip.compress(b"\x00" * 200_000_000, 9)   # ~194 KB compressed
    t0 = time.time()
    out = w._maybe_gunzip(bomb)
    assert time.time() - t0 < 10.0
    assert len(out) <= 64 * max(len(bomb), 1 << 20)   # bounded, not 200 MB
    # a bombed archive yields no valid records, cleanly
    assert list(w.iter_warc_records(bomb)) == []
