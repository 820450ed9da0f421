"""WARC container source / sink — Common Crawl interchange parity.

The north star corpus is "Common-Crawl-style", and Common Crawl's
native container is WARC (ISO 28500): one gzip member per record,
members concatenated into ~1 GiB shard files, each response record
wrapping the raw HTTP response bytes. This module gives the engine
that container on both sides:

* **sink** — :func:`write_warc_shards`: each crawl row
  ``(url, warc_ts, html, lang)`` becomes one ``WARC/1.0`` response
  record wrapping an ``HTTP/1.1 200`` response whose body is the raw
  payload bytes. Records are gzip-compressed individually and
  concatenated (the member-per-record Common Crawl convention — a
  reader can split a shard at member boundaries without decompressing
  the whole file). Shards are written one-per-input-block by a
  ``map_batches`` task, named by the md5 of their record IDs: re-runs
  produce byte-identical files under the same names, so the sink is
  idempotent under Ray task retries (write-temp + ``os.replace``).
* **source** — :func:`read_warc`: ``ray.data.read_binary_files`` over
  the shard files (one task per shard; CC shards are ~1 GiB, so file
  granularity IS the right block granularity) → vectorized member
  split + header parse → the canonical crawl table
  ``(url, warc_ts, html, text, lang)`` feeding the same sniff/extract
  pipeline as the parquet route.
* **WET sink/source** — :func:`write_wet_shards` / :func:`read_wet`:
  Common Crawl's extracted-text sidecar format (``conversion``
  records, ``text/plain`` payload), produced FROM the extraction
  output. ``read_wet`` recovers ``(url, text)``.

Everything is stdlib (``gzip``/``zlib``) and byte-deterministic
(``mtime=0``): the same table always serializes to the same shard
bytes, which the round-trip tests pin.

Language rides in the real Common Crawl header
``WARC-Identified-Content-Language`` so the WARC route reproduces the
full crawl-table schema. ``WARC-Date`` keeps microsecond precision
(WARC 1.1 §5.4 allows fractional seconds).
"""

from __future__ import annotations

import gzip
import hashlib
import os
import zlib
from datetime import datetime

import pyarrow as pa

import ray.data
from ray.data.datasource import FileBasedDatasource

_DATE_FMT = "%Y-%m-%dT%H:%M:%S.%fZ"
_EPOCH = datetime(1970, 1, 1)

# Bump when the record layout changes — keyed into shard dir names so
# stale shards from an older layout are never mixed into a read.
WARC_FORMAT_VERSION = 1


def _warc_date(ts_us: int) -> str:
    # integer arithmetic off _EPOCH (mirrors _parse_date_us): exact at
    # any magnitude, and avoids the deprecated utcfromtimestamp plus
    # the ~1 us float rounding of ts_us / 1e6 on large timestamps
    from datetime import timedelta

    return (_EPOCH + timedelta(microseconds=ts_us)).strftime(_DATE_FMT)


def _parse_date_us(s: str) -> int:
    # integer arithmetic: float total_seconds() loses ~1 us on large
    # timestamps, breaking byte-faithful round-trips. Real Common
    # Crawl WARCs use the whole-second WARC 1.0 form (no .%f) — accept
    # both.
    try:
        d = datetime.strptime(s, _DATE_FMT) - _EPOCH
    except ValueError:
        d = datetime.strptime(s, "%Y-%m-%dT%H:%M:%SZ") - _EPOCH
    return (d.days * 86_400 + d.seconds) * 1_000_000 + d.microseconds


def _record_id(url: str, ts_us: int) -> str:
    h = hashlib.md5(f"{url}@{ts_us}".encode()).hexdigest()
    return f"<urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>"


def warc_record_bytes(
    url: str, ts_us: int, payload: bytes, lang: str, warc_type: str = "response"
) -> bytes:
    """One uncompressed WARC record (response wraps HTTP; conversion
    carries the payload directly, per the WET convention)."""
    if warc_type == "response":
        http_head = (
            b"HTTP/1.1 200 OK\r\n"
            b"Content-Type: application/octet-stream\r\n"
            b"Content-Length: " + str(len(payload)).encode() + b"\r\n\r\n"
        )
        block = http_head + payload
        content_type = b"application/http; msgtype=response"
    else:
        block = payload
        content_type = b"text/plain"
    head = (
        b"WARC/1.0\r\n"
        b"WARC-Type: " + warc_type.encode() + b"\r\n"
        b"WARC-Record-ID: " + _record_id(url, ts_us).encode() + b"\r\n"
        b"WARC-Date: " + _warc_date(ts_us).encode() + b"\r\n"
        b"WARC-Target-URI: " + url.encode() + b"\r\n"
        b"WARC-Identified-Content-Language: " + lang.encode() + b"\r\n"
        b"Content-Type: " + content_type + b"\r\n"
        b"Content-Length: " + str(len(block)).encode() + b"\r\n"
        b"\r\n"
    )
    return head + block + b"\r\n\r\n"


def _gzip_member(data: bytes) -> bytes:
    return gzip.compress(data, compresslevel=6, mtime=0)


def _iter_members(data: bytes):
    """Yield decompressed gzip members (or the whole buffer once if the
    file isn't gzipped — plain ``.warc`` support). A corrupt member
    (bit-rot, truncation mid-stream) ends the iteration rather than
    crashing the read task — records before the corruption survive."""
    if not data.startswith(b"\x1f\x8b"):
        yield data
        return
    while data:
        obj = zlib.decompressobj(wbits=31)
        try:
            yield obj.decompress(data)
        except zlib.error:
            return
        data = obj.unused_data


def _iter_records(buf: bytes):
    """Yield (headers: dict, block: bytes) for each WARC record in an
    uncompressed buffer (a gzip member holds exactly one record on the
    write side, but the parser handles concatenations too)."""
    pos = 0
    n = len(buf)
    while pos < n:
        # tolerate inter-record padding / truncated tails
        start = buf.find(b"WARC/", pos)
        if start < 0:
            return
        hdr_end = buf.find(b"\r\n\r\n", start)
        if hdr_end < 0:
            return
        headers: dict[str, str] = {}
        for line in buf[start:hdr_end].split(b"\r\n")[1:]:
            k, sep, v = line.partition(b":")
            if sep:
                # values round-trip utf-8 (the write side encodes
                # utf-8); names are case-insensitive per the WARC spec
                # — normalized to lowercase once, here, so every
                # downstream lookup is case-blind
                headers[
                    k.strip().decode("utf-8", "replace").lower()
                ] = v.strip().decode("utf-8", "replace")
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            clen = -1
        if clen < 0:
            # malformed record: resync at the next record marker
            # instead of dropping the rest of the buffer
            pos = start + 5
            continue
        block_start = hdr_end + 4
        if block_start + clen > n:
            return  # truncated record
        yield headers, buf[block_start : block_start + clen]
        pos = block_start + clen


def _http_payload(block: bytes) -> bytes:
    """Strip the HTTP response head; slice the body by its
    Content-Length so payload bytes round-trip exactly."""
    head_end = block.find(b"\r\n\r\n")
    if head_end < 0:
        return block
    clen = None
    for line in block[:head_end].split(b"\r\n")[1:]:
        k, _, v = line.partition(b":")
        if k.strip().lower() == b"content-length":
            try:
                clen = int(v.strip())
            except ValueError:
                pass
    body = block[head_end + 4 :]
    return (
        body[:clen]
        if clen is not None and 0 <= clen <= len(body)
        else body
    )


# ------------------------------------------------------------- sink


def _shard_writer(out_dir: str, warc_type: str, payload_col: str):
    def write_shard(batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        if not urls:
            return pa.table(
                {
                    "path": pa.array([], pa.string()),
                    "n_records": pa.array([], pa.int64()),
                }
            )
        ts = (
            batch["warc_ts"].cast(pa.int64()).to_pylist()
            if "warc_ts" in batch.column_names
            else [0] * len(urls)
        )
        langs = (
            batch["lang"].to_pylist()
            if "lang" in batch.column_names
            else [""] * len(urls)
        )
        payloads = batch[payload_col].to_pylist()
        ids, members = [], []
        for u, t, p, lg in zip(urls, ts, payloads, langs):
            if isinstance(p, str):
                p = p.encode("utf-8")
            ids.append(_record_id(u, t))
            members.append(
                _gzip_member(warc_record_bytes(u, t, p or b"", lg or "", warc_type))
            )
        shard = b"".join(members)
        name = hashlib.md5("".join(ids).encode()).hexdigest()
        ext = ".warc.gz" if warc_type == "response" else ".warc.wet.gz"
        os.makedirs(out_dir, exist_ok=True)
        final = os.path.join(out_dir, name + ext)
        tmp = final + ".tmp"
        with open(tmp, "wb") as f:
            f.write(shard)
        os.replace(tmp, final)  # atomic; retries rewrite the same name
        return pa.table(
            {
                "path": pa.array([final], pa.string()),
                "n_records": pa.array([len(ids)], pa.int64()),
            }
        )

    return write_shard


def write_warc_shards(ds: ray.data.Dataset, out_dir: str) -> pa.Table:
    """Crawl table -> per-block ``.warc.gz`` shards under ``out_dir``.
    Returns the (tiny) manifest table (path, n_records)."""
    manifest = ds.map_batches(
        _shard_writer(out_dir, "response", "html"),
        batch_format="pyarrow",
        batch_size=None,
    )
    tables = [t for t in manifest.to_arrow_refs()]
    got = [ray.get(t) for t in tables]
    got = [t for t in got if t.num_rows]
    return (
        pa.concat_tables(got)
        if got
        else pa.table(
            {"path": pa.array([], pa.string()), "n_records": pa.array([], pa.int64())}
        )
    )


def write_wet_shards(extracted: ray.data.Dataset, out_dir: str) -> pa.Table:
    """Extraction output (url, text, lang, ...) -> WET ``conversion``
    shards (text/plain payloads), Common Crawl's extracted-text
    sidecar. Returns the manifest table."""
    manifest = extracted.map_batches(
        _shard_writer(out_dir, "conversion", "text"),
        batch_format="pyarrow",
        batch_size=None,
    )
    got = [ray.get(t) for t in manifest.to_arrow_refs()]
    got = [t for t in got if t.num_rows]
    return (
        pa.concat_tables(got)
        if got
        else pa.table(
            {"path": pa.array([], pa.string()), "n_records": pa.array([], pa.int64())}
        )
    )


# ----------------------------------------------------------- source


def _parse_bytes(data: bytes) -> pa.Table:
    """One shard's raw bytes -> crawl-table rows."""
    urls: list[str] = []
    tss: list[int] = []
    payloads: list[bytes] = []
    langs: list[str] = []
    for member in _iter_members(data or b""):
        for headers, block in _iter_records(member):
            # header names arrive lowercased from _iter_records
            wtype = headers.get("warc-type", "")
            if wtype not in ("response", "conversion"):
                continue
            urls.append(headers.get("warc-target-uri", ""))
            try:
                tss.append(_parse_date_us(headers.get("warc-date", "")))
            except ValueError:
                tss.append(0)
            langs.append(
                headers.get("warc-identified-content-language", "")
            )
            payloads.append(
                _http_payload(block) if wtype == "response" else block
            )
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.int64()).cast(pa.timestamp("us")),
            "html": pa.array(payloads, pa.binary()),
            "text": pa.array([""] * len(urls), pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def _resolve_shards(paths: str | list[str]) -> list[str]:
    if isinstance(paths, str) and os.path.isdir(paths):
        return sorted(
            os.path.join(paths, f)
            for f in os.listdir(paths)
            if f.endswith((".warc", ".warc.gz", ".wet.gz"))
        )
    return [paths] if isinstance(paths, str) else list(paths)


class WarcDatasource(FileBasedDatasource):
    """Custom Ray Data datasource: each read task decompresses and
    parses one WARC shard straight into crawl-table rows.

    Parsing INSIDE the read matters for pipeline shape: if the parse
    were a separate ``map_batches`` it would fuse into the downstream
    OCR actor-pool operator, whose row-based bundler then sees one
    row per FILE and coalesces every shard into a single task. With
    the datasource, read output blocks already hold ~record-count
    rows, so downstream batching and actor-pool fan-out size
    themselves correctly."""

    _FILE_EXTENSIONS = ["warc", "warc.gz", "wet.gz"]

    def _read_stream(self, f, path: str):
        yield _parse_bytes(f.readall())


def read_warc(paths: str | list[str]) -> ray.data.Dataset:
    """WARC shard file(s)/dir -> canonical crawl-table Dataset.
    One read task per shard file (``override_num_blocks=len(files)``
    — Ray would otherwise pack small test-scale files into one task;
    production ~1 GiB shards are file-per-task either way)."""
    files = _resolve_shards(paths)
    return ray.data.read_datasource(
        WarcDatasource(files, file_extensions=None),
        override_num_blocks=max(1, len(files)),
    )


def read_wet(paths: str | list[str]) -> ray.data.Dataset:
    """WET shard file(s)/dir -> (url, warc_ts, text, lang) Dataset."""

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": t["url"],
                "warc_ts": t["warc_ts"],
                "text": pa.array(
                    [
                        (b or b"").decode("utf-8", "replace")
                        for b in t["html"].to_pylist()
                    ],
                    pa.string(),
                ),
                "lang": t["lang"],
            }
        )

    return read_warc(paths).map_batches(
        project, batch_format="pyarrow", batch_size=None
    )


def warc_keys(paths: str | list[str]) -> ray.data.Dataset:
    """Pruned (url, ts_us) key view of WARC shards — the droplist
    pre-pass input. (The container has no columnar projection, so this
    is a second decompress pass over the shards; the parquet route's
    equivalent reads two tiny columns. Shuffle dedup mode avoids the
    second pass entirely.)"""

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": t["url"],
                "ts_us": t["warc_ts"].cast(pa.int64()),
            }
        )

    return read_warc(paths).map_batches(
        project, batch_format="pyarrow", batch_size=None
    )
