"""WARC/WET container round-trip and hardening tests."""

import gzip
import hashlib

import pyarrow as pa
import pytest

import ray.data

from pdf_to_text_ray.pipelines.extract import synthesize_docs
from pdf_to_text_ray.sources import warc as W


def test_record_bytes_deterministic_and_parseable():
    payload = b"<html>\r\n<body>x \xff\x00 tricky</body></html>"
    rec = W.warc_record_bytes(
        "https://a.example/p", 1_700_000_000_123_456, payload, "en"
    )
    assert rec == W.warc_record_bytes(
        "https://a.example/p", 1_700_000_000_123_456, payload, "en"
    )
    [(headers, block)] = list(W._iter_records(rec))
    assert headers["warc-target-uri"] == "https://a.example/p"
    assert headers["warc-identified-content-language"] == "en"
    assert W._parse_date_us(headers["warc-date"]) == 1_700_000_000_123_456
    # HTTP body slice is exact even with \r\n\r\n inside the payload
    assert W._http_payload(block) == payload


def test_record_roundtrips_payload_containing_separator():
    payload = b"a\r\n\r\nb" * 10
    rec = W.warc_record_bytes("u", 5, payload, "")
    [(_, block)] = list(W._iter_records(rec))
    assert W._http_payload(block) == payload


@pytest.mark.parametrize(
    "junk",
    [
        b"",
        b"not a warc at all",
        b"WARC/1.0\r\nContent-Length: nope\r\n\r\nxx",
        b"WARC/1.0\r\nContent-Length: 10\r\n\r\nshort",  # truncated block
        gzip.compress(b"WARC/1.0\r\n\r\n"),
    ],
)
def test_parser_never_crashes_on_junk(junk):
    out = W._parse_bytes(junk)
    assert out.num_rows == 0 or out.column_names[0] == "url"


def _record_set(t: pa.Table):
    return {
        (u, ts, lg, hashlib.md5(p or b"").hexdigest())
        for u, ts, p, lg in zip(
            t["url"].to_pylist(),
            t["warc_ts"].cast(pa.int64()).to_pylist(),
            t["html"].to_pylist(),
            t["lang"].to_pylist(),
        )
    }


def test_warc_shard_roundtrip_matches_source(sf_dir, tmp_path):
    src = synthesize_docs(sf_dir)
    manifest = W.write_warc_shards(src, str(tmp_path))
    assert manifest.num_rows >= 1
    assert int(pa.compute.sum(manifest["n_records"]).as_py()) > 500
    back = pa.concat_tables(
        [
            b
            for b in ray.get(W.read_warc(str(tmp_path)).to_arrow_refs())
            if b.num_rows
        ]
    )
    want = pa.concat_tables(
        [b for b in ray.get(synthesize_docs(sf_dir).to_arrow_refs()) if b.num_rows]
    )
    assert _record_set(back) == _record_set(want)


def test_wet_roundtrip_preserves_newlines(tmp_path):
    t = pa.table(
        {
            "url": pa.array(["https://x/1", "https://x/2"], pa.string()),
            "warc_ts": pa.array([1, 2], pa.int64()).cast(pa.timestamp("us")),
            "text": pa.array(["line one\nline two\n\nthree", ""], pa.string()),
            "lang": pa.array(["en", "de"], pa.string()),
        }
    )
    W.write_wet_shards(ray.data.from_arrow(t), str(tmp_path))
    back = W.read_wet(str(tmp_path)).to_pandas().sort_values("url")
    assert list(back["text"]) == ["line one\nline two\n\nthree", ""]
    assert list(back["lang"]) == ["en", "de"]


def test_parser_handles_negative_content_length():
    # must terminate (no infinite loop) and drop only the bad record
    bad = b"WARC/1.0\r\nContent-Length: -100\r\n\r\nxxxx"
    good = W.warc_record_bytes("https://ok/1", 7, b"payload", "en")
    out = W._parse_bytes(bad + good)
    assert out.num_rows == 1
    assert out["url"].to_pylist() == ["https://ok/1"]


def test_parser_stops_at_corrupt_gzip_member_keeping_prior_records():
    good = W._gzip_member(W.warc_record_bytes("https://ok/1", 7, b"p", "en"))
    corrupt = b"\x1f\x8b" + b"\x99" * 40
    out = W._parse_bytes(good + corrupt)
    assert out["url"].to_pylist() == ["https://ok/1"]


def test_parser_resyncs_after_missing_content_length():
    bad = b"WARC/1.0\r\nWARC-Type: response\r\n\r\njunk"
    good = W.warc_record_bytes("https://ok/2", 9, b"q", "de")
    out = W._parse_bytes(bad + good)
    assert out["url"].to_pylist() == ["https://ok/2"]


def test_non_ascii_url_roundtrips():
    url = "https://exämple.com/påth"
    rec = W.warc_record_bytes(url, 3, b"x", "sv")
    out = W._parse_bytes(rec)
    assert out["url"].to_pylist() == [url]


def test_date_roundtrip_is_microsecond_exact():
    for ts in (1090352934935922, 1, 999_999, 1_700_000_000_123_457,
               4102444799_999_999):
        assert W._parse_date_us(W._warc_date(ts)) == ts


def test_foreign_warc_casing_and_whole_second_dates_parse():
    """Shards written by other tools: non-canonical header casing and
    the whole-second WARC 1.0 date form must still parse."""
    rec = (
        b"warc/1.0\r\n"  # marker itself must stay WARC/ — build manually
    )
    rec = (
        b"WARC/1.0\r\n"
        b"warc-type: response\r\n"
        b"WARC-TARGET-URI: https://cc.example/a\r\n"
        b"Warc-Date: 2016-01-01T12:00:00Z\r\n"
        b"CONTENT-LENGTH: 43\r\n"
        b"\r\n"
        b"HTTP/1.1 200 OK\r\nContent-Length: 2\r\n\r\nhi"
        b"\r\n\r\n"
    )
    out = W._parse_bytes(rec)
    assert out["url"].to_pylist() == ["https://cc.example/a"]
    assert out["html"].to_pylist() == [b"hi"]
    ts = out["warc_ts"].cast("int64").to_pylist()[0]
    assert ts == 1451649600_000_000  # 2016-01-01T12:00:00Z in us


def test_http_payload_rejects_negative_content_length():
    block = b"HTTP/1.1 200 OK\r\nContent-Length: -5\r\n\r\npayload-bytes"
    assert W._http_payload(block) == b"payload-bytes"


def test_read_warc_accepts_dir_and_file_list(sf_dir, tmp_path):
    import os

    src = synthesize_docs(sf_dir)
    W.write_warc_shards(src, str(tmp_path))
    files = sorted(
        os.path.join(str(tmp_path), f)
        for f in os.listdir(str(tmp_path))
        if f.endswith(".warc.gz")
    )
    assert len(files) >= 1
    by_dir = W.read_warc(str(tmp_path)).count()
    by_list = W.read_warc(files).count()
    by_one = W.read_warc(files[0]).count()
    assert by_dir == by_list and by_one >= 1
