"""Driver-facing query registry: one callable per operator/pipeline
(SURVEY.md §2 inventory + training-data ops), each paired — where
SQL-expressible — with a DuckDB oracle in ORACLE_SQL.

Column names AND types match the SQL exactly (the driver's compare
sorts columns by name and hashes values). Ratios/divisions are emitted
as raw int/int IEEE divisions (bit-identical between Python and
DuckDB); cosine similarities are computed in float64 on both sides and
rounded to 6 dp.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from ..config import DEFAULT_CONFIG
from ..functions import scalar
from ..functions.rounding import round6 as _round6
from ..functions.rounding import round6_np as _round6_np
from ..stages import dedup as dedup_mod
from ..stages import multimodal
from ..stages import relational
from ..stages import textstats
from ..stages.combine import combine_page_headers, combine_reference_lex
from ..stages.similarity import ann_topk, lsh_topk
from ..stages.sniff import make_sniffer
from ..stages.summarize import summarize_batch
from ..pdfgen import paginate
from .extract import pages_pipeline, run_extraction, synthesize_docs

WORDS_PER_PAGE = 60  # keep in sync with sources/synth.py

# unit separator: joins sentence/line lists into flat string columns so
# oracle-checked schemas stay scalar
_US = "\x1f"


def _read_documents(sf_dir: str) -> ray.data.Dataset:
    """Pruned read for the text-op queries: only (doc_id, text) leave
    storage. lang_id PREDICTS language from text; queries that DO need
    the stored lang column (stratified_sample) or other columns (the
    extraction path) issue their own pruned read_parquet."""
    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )


def _with_schema(ds: ray.data.Dataset, **schema) -> ray.data.Dataset:
    """Pin a stable output schema on a possibly-empty Dataset result:
    Ray drops the schema of an empty groupby/filter chain entirely
    (zero typed blocks), but the driver compare checks column names
    even at 0 rows — so union ONE 0-row typed block. Free at any
    scale (one empty block)."""
    empty = pa.table({c: pa.array([], t) for c, t in schema.items()})
    return ray.data.from_arrow(empty).union(ds)


def _guard_pack(hi, lo, bits: int, what: str) -> None:
    """Refuse silently-corrupting packed int64 keys (the
    dedup._pack_pair_keys contract, stages/dedup.py:186): the low
    field must be non-negative and fit in ``bits`` (a negative
    day/week from a pre-1970 timestamp would bleed into the adjacent
    high-field range), and the high field must be non-negative and
    small enough that ``hi << bits`` stays inside int64."""
    if len(hi) == 0:
        return
    if int(lo.min()) < 0 or int(lo.max()) >= (1 << bits):
        raise ValueError(f"{what}: low field overflows the {bits}-bit pack")
    if int(hi.min()) < 0 or int(hi.max()) >= (1 << (62 - bits)):
        raise ValueError(f"{what}: high field overflows the packed int64 key")


# md5-nibble 32-bit doc_id hash: one Python helper + one SQL fragment
# shared by every hash-draw oracle pair (train/val split predates this
# and keeps its inline copy of the same contract).
def _docid_hash32(doc_id) -> int:
    import hashlib

    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)


_HH_SQL = """
  SELECT doc_id,
    sum(CAST(strpos('0123456789abcdef',
                    substr(md5(CAST(doc_id AS VARCHAR)), k + 1, 1)) - 1
             AS BIGINT)
        * CAST(CASE k WHEN 0 THEN 268435456 WHEN 1 THEN 16777216
               WHEN 2 THEN 1048576 WHEN 3 THEN 65536 WHEN 4 THEN 4096
               WHEN 5 THEN 256 WHEN 6 THEN 16 ELSE 1 END AS BIGINT)) AS hv
  FROM documents, generate_series(0, 7) AS g(k)
  GROUP BY doc_id
"""


# ---------------------------------------------------------------- e2e

def q_extract_e2e(sf_dir: str):
    """Flagship: synthesized CC corpus -> sniff -> extract -> OCR ->
    dedup -> combine. Text is compared whitespace-normalized (the
    pipeline's page/line separators replace single spaces 1:1, so
    n_chars still checks raw byte length); full byte-identity incl.
    newlines is pinned by the pytest golden suite."""
    return _e2e_project(run_extraction(sf_dir))


_E2E_BASE = """
WITH base AS (
  SELECT doc_id, text, lang, doc_id % 10 AS cls,
         length(regexp_extract_all(text, '\\S+')) AS nwords
  FROM documents
), expected AS (
  SELECT
    'https://site-' || CAST(doc_id % 20 AS VARCHAR) || '.example/doc/'
      || CAST(doc_id AS VARCHAR) AS url,
    CASE WHEN cls = 9 THEN '' ELSE text END AS text,
    CASE WHEN cls <= 5 THEN 'html'
         WHEN cls <= 8 THEN 'pdf'
         ELSE 'unknown' END AS doc_type,
    lang,
    CAST(CASE WHEN cls <= 5 THEN 1
              WHEN cls <= 8 THEN CAST(ceil(nwords / 60.0) AS INTEGER)
              ELSE 0 END AS INTEGER) AS n_pages,
    CAST(CASE WHEN cls = 9 THEN 0 ELSE length(text) END AS BIGINT) AS n_chars,
    (cls <> 9) AS parse_ok
  FROM base
)
"""

SQL_EXTRACT_E2E = _E2E_BASE + "SELECT * FROM expected"


def _e2e_project(ds: ray.data.Dataset) -> ray.data.Dataset:
    """The extract_e2e output projection (whitespace-normalized text),
    shared by the parquet- and WARC-sourced extraction queries."""

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": t["url"],
                "text": pc.replace_substring(t["text"], "\n", " "),
                "doc_type": t["doc_type"],
                "lang": t["lang"],
                "n_pages": t["n_pages"],
                "n_chars": t["n_chars"],
                "parse_ok": t["parse_ok"],
            }
        )

    return ds.map_batches(project, batch_format="pyarrow")


def _warc_shard_dir(sf_dir: str, kind: str) -> str:
    """Deterministic scratch dir for serialized shards, keyed by corpus
    identity + format version; wiped before each write so a stale block
    layout can never mix old shards into a read."""
    import shutil

    from ..sources.warc import WARC_FORMAT_VERSION

    nrows = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    base = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    d = f"/tmp/ptr_warc/v{WARC_FORMAT_VERSION}_{kind}_{base}_{nrows}"
    shutil.rmtree(d, ignore_errors=True)
    return d


def q_warc_extract(sf_dir: str):
    """Full WARC-container round: synthesized crawl table -> gzipped
    WARC/1.0 response shards on disk (sources/warc.py, Common Crawl's
    member-per-record convention) -> ``read_warc`` (one task per
    shard) -> the SAME sniff/extract/OCR/dedup/combine pipeline as
    extract_e2e, via the shuffle-dedup path (stale re-crawls are in
    the shards; the groupby finalize dedups them without a second pass
    over the files). Oracle: identical to extract_e2e — the container
    must be transparent."""
    from ..sources.warc import read_warc, write_warc_shards
    from .extract import extract_pipeline

    out = _warc_shard_dir(sf_dir, "warc")
    write_warc_shards(synthesize_docs(sf_dir), out)
    return _e2e_project(extract_pipeline(read_warc(out)))


SQL_WARC_EXTRACT = _E2E_BASE + "SELECT * FROM expected"


def q_wet_roundtrip(sf_dir: str):
    """Extraction output -> WET shards (Common Crawl's extracted-text
    sidecar: ``conversion`` records, text/plain payloads) -> read back
    -> (url, text, lang, n_chars). n_chars is recomputed from the
    round-tripped text, so the oracle match proves the text survived
    serialization byte-for-byte (separators replace single spaces 1:1,
    keeping char counts equal to the source text)."""
    from ..sources.warc import read_wet, write_wet_shards

    out = _warc_shard_dir(sf_dir, "wet")
    write_wet_shards(run_extraction(sf_dir), out)

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": t["url"],
                "text": pc.replace_substring(t["text"], "\n", " "),
                "lang": t["lang"],
                "n_chars": pc.cast(pc.utf8_length(t["text"]), pa.int64()),
            }
        )

    return read_wet(out).map_batches(project, batch_format="pyarrow")


SQL_WET_ROUNDTRIP = _E2E_BASE + "SELECT url, text, lang, n_chars FROM expected"


def q_domain_stats(sf_dir: str):
    """Per-domain curation stats over the extraction output: host
    parsed from the url (vectorized Arrow regex), then counts /
    char totals / parse failures per site — the per-source view a
    corpus-curation pass gates on. Map-side host extraction + one
    small groupby (hosts ≪ docs)."""
    ds = run_extraction(sf_dir)

    def with_host(t: pa.Table) -> pa.Table:
        host = pc.extract_regex(t["url"], r"https://(?P<host>[^/]+)/")
        return pa.table(
            {
                # non-matching urls -> '' like DuckDB regexp_extract
                # (a null here would fork its own group AND make Sum
                # skip those rows' failure counts)
                "host": pc.fill_null(pc.struct_field(host, "host"), ""),
                "n_chars": t["n_chars"],
                "failed": pc.cast(
                    pc.equal(t["parse_ok"], pa.scalar(False)), pa.int64()
                ),
            }
        )

    return (
        ds.map_batches(with_host, batch_format="pyarrow")
        .groupby("host")
        .aggregate(
            Count(alias_name="n_docs"),
            Sum("n_chars", alias_name="total_chars"),
            Sum("failed", alias_name="n_failed_docs"),
        )
    )


SQL_DOMAIN_STATS = _E2E_BASE + """
SELECT regexp_extract(url, 'https://([^/]+)/', 1) AS host,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(CASE WHEN parse_ok THEN 0 ELSE 1 END) AS BIGINT)
         AS n_failed_docs
FROM expected GROUP BY 1
"""


def q_extraction_metrics(sf_dir: str):
    """Grouped extraction metrics (the engine's A7 counters analogue)."""
    ds = run_extraction(sf_dir)
    out = ds.groupby("doc_type").aggregate(
        Count(alias_name="n_docs"),
        Sum("n_chars", alias_name="total_chars"),
        Sum("parse_failures", alias_name="n_failed_pages"),
    )
    return out


SQL_EXTRACTION_METRICS = _E2E_BASE + """
SELECT doc_type,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(CASE WHEN parse_ok THEN 0 ELSE 1 END) AS BIGINT) AS n_failed_pages
FROM expected GROUP BY doc_type
"""


def q_sniff_doc_types(sf_dir: str):
    """Byte-sniffer route distribution over the raw crawl (includes the
    stale dup rows — sniffing runs before dedup)."""
    docs = synthesize_docs(sf_dir)
    ds = docs.map_batches(
        make_sniffer(DEFAULT_CONFIG), batch_format="pyarrow", batch_size=4096
    )
    return ds.groupby("doc_type").aggregate(Count(alias_name="n"))


SQL_SNIFF_DOC_TYPES = """
SELECT CASE WHEN doc_id % 10 <= 5 THEN 'html'
            WHEN doc_id % 10 <= 8 THEN 'pdf'
            ELSE 'unknown' END AS doc_type,
       CAST(sum(CASE WHEN doc_id % 10 = 2 THEN 2 ELSE 1 END) AS BIGINT) AS n
FROM documents GROUP BY 1
"""


def q_route_counts(sf_dir: str):
    """Per-page route distribution (dom / text_layer / ocr / none).
    The text_layer-vs-ocr split is the reference's strict >250 rule
    over whitespace-stripped page text (core_document_processing.py:76)
    — reproducible in SQL from the page word lengths."""
    pages = pages_pipeline(synthesize_docs(sf_dir), DEFAULT_CONFIG)
    return pages.groupby("route").aggregate(Count(alias_name="n"))



# ------------------------------------------------------ scalar textops

def q_normalize_text(sf_dir: str):
    ds = _read_documents(sf_dir)

    def fn(t: pa.Table) -> pa.Table:
        # vectorized Arrow/RE2 chain; non-ASCII rows transparently fall
        # back to the per-row Python source of truth (scalar.py)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "norm_text": scalar.normalize_text_batch(
                    t["text"].combine_chunks()
                ),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


SQL_NORMALIZE_TEXT = """
SELECT doc_id,
  trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
    lower(text), '-\\s*\\n\\s*', '', 'g'), '\\n\\s*\\n+', chr(10), 'g'),
    '[•◦·▪▶►✓✔~]', '', 'g'), '\\s+', ' ', 'g')) AS norm_text
FROM documents
"""


def q_clean_text(sf_dir: str):
    ds = _read_documents(sf_dir)

    def fn(t: pa.Table) -> pa.Table:
        # RE2-exact for all input (see scalar.clean_text_batch)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "clean": scalar.clean_text_batch(
                    t["text"].combine_chunks()
                ),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


SQL_CLEAN_TEXT = """
SELECT doc_id,
  trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
       regexp_replace(regexp_replace(text,
    '[^\\x00-\\x7F]+', ' ', 'g'),
    'http\\S+|www\\S+', '', 'g'),
    '\\S+@\\S+', '', 'g'),
    '([!?.,]){2,}', '\\1', 'g'),
    '[^a-zA-Z0-9\\s\\.\\?\\!]', ' ', 'g'),
    '\\s+', ' ', 'g')) AS clean
FROM documents
"""


def q_ocr_whitelist(sf_dir: str):
    ds = _read_documents(sf_dir)

    def fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "cleaned": scalar.ocr_whitelist_clean_batch(
                    t["text"].combine_chunks()
                ),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


# strip ALL whitespace at both ends (python str.strip semantics —
# DuckDB trim() removes spaces only; caught by test_differential)
SQL_OCR_WHITELIST = """
SELECT doc_id,
  regexp_replace(regexp_replace(
    regexp_replace(text, '[^A-Za-z0-9.,!?;:''"\\\\\\-\\s]', '', 'g'),
    '^\\s+', ''), '\\s+$', '') AS cleaned
FROM documents
"""


# ---------------------------------------------------------- combiners

def _paginate_combine(fn_combine):
    def fn(t: pa.Table) -> pa.Table:
        out = []
        for text in t["text"].to_pylist():
            out.append(fn_combine(paginate(text, WORDS_PER_PAGE)))
        return pa.table({"doc_id": t["doc_id"], "combined": pa.array(out, pa.string())})

    return fn


def q_combine_pages_ref(sf_dir: str):
    """Streamlit-path combine: numeric order + PAGE headers
    (core_document_generator.py:185-187)."""
    return _read_documents(sf_dir).map_batches(
        _paginate_combine(combine_page_headers), batch_format="pyarrow"
    )


_SQL_PAGES_CTE = """
WITH words AS (
  SELECT doc_id,
         unnest(regexp_extract_all(text, '\\S+')) AS word,
         generate_subscripts(regexp_extract_all(text, '\\S+'), 1) AS ord
  FROM documents
), pages AS (
  SELECT doc_id, CAST((ord - 1) // 60 AS INTEGER) AS pno,
         string_agg(word, ' ' ORDER BY ord) AS ptext
  FROM words GROUP BY doc_id, CAST((ord - 1) // 60 AS INTEGER)
)
"""

# dup note: sniff/route run BEFORE dedup, so cls==2 re-crawl rows add
# one extra 'dom' page each.
SQL_ROUTE_COUNTS = _SQL_PAGES_CTE + """
, routed AS (
  SELECT d.doc_id,
    CASE WHEN d.doc_id % 10 <= 5 THEN 'dom'
         WHEN d.doc_id % 10 = 9 THEN 'none'
         WHEN d.doc_id % 10 = 8 THEN 'ocr'
         WHEN length(replace(p.ptext, ' ', '')) > 250 THEN 'text_layer'
         ELSE 'ocr' END AS route
  FROM documents d
  LEFT JOIN pages p
    ON d.doc_id = p.doc_id AND d.doc_id % 10 IN (6, 7, 8)
), extra_dups AS (
  SELECT 'dom' AS route FROM documents WHERE doc_id % 10 = 2
)
SELECT route, CAST(count(*) AS BIGINT) AS n
FROM (SELECT route FROM routed UNION ALL SELECT route FROM extra_dups)
GROUP BY route
"""

SQL_COMBINE_PAGES_REF = _SQL_PAGES_CTE + """
SELECT doc_id,
  string_agg(chr(10) || chr(10) || '--- PAGE ' || CAST(pno + 1 AS VARCHAR)
             || ' ---' || chr(10) || chr(10) || ptext, '' ORDER BY pno) AS combined
FROM pages GROUP BY doc_id
"""


def q_combine_pages_lex(sf_dir: str):
    """Batch-CLI combine with the reference's lexicographic
    filename-order quirk (combine_texts.py:20)."""

    def combine(pages):
        named = [(f"page_{i + 1}.txt", t) for i, t in enumerate(pages)]
        return combine_reference_lex(named)

    return _read_documents(sf_dir).map_batches(
        _paginate_combine(combine), batch_format="pyarrow"
    )


SQL_COMBINE_PAGES_LEX = _SQL_PAGES_CTE + """
SELECT doc_id,
  string_agg(chr(10) || chr(10) || '---- page_' || CAST(pno + 1 AS VARCHAR)
             || '.txt ----' || chr(10) || chr(10) || ptext || chr(10)
             || repeat('=', 50) || chr(10),
             '' ORDER BY 'page_' || CAST(pno + 1 AS VARCHAR) || '.txt') AS combined
FROM pages GROUP BY doc_id
"""


# --------------------------------------------------------------- dedup

def q_dedup_exact(sf_dir: str):
    """Exact dedup keep-first over a deliberately duplicated corpus
    (documents ∪ documents)."""
    ds = _read_documents(sf_dir)
    return dedup_mod.exact_dedup(ds.union(ds))


SQL_DEDUP_EXACT = """
SELECT md5(text) AS md5_hash,
       CAST(min(doc_id) AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_copies
FROM (SELECT doc_id, text FROM documents
      UNION ALL SELECT doc_id, text FROM documents)
GROUP BY md5(text)
"""


def q_minhash_near_dups(sf_dir: str):
    """MinHash-LSH near-dup pairs verified by true Jaccard ≥ 0.8.
    Verification fetches only candidate texts (byte-budgeted broadcast
    with partitioned-join fallback) — no full-corpus broadcast. The SQL
    oracle reproduces the ENTIRE sketch: universal-hash signatures with
    the engine's own (a, b) constants inlined, banding via raw 4-tuple
    signature equality (equivalent to the engine's band-key md5 modulo
    md5 collisions), then the same int/int IEEE Jaccard division."""
    return dedup_mod.minhash_near_dups(_read_documents(sf_dir))


def _minhash_params_values() -> str:
    """(j, a_j, b_j) VALUES rows from the engine's own deterministic
    MinHasher seed — the oracle must use bit-identical constants."""
    from ..functions.hashing import MinHasher

    mh = MinHasher()
    return ", ".join(
        f"({j}, {int(a)}, {int(b)})"
        for j, (a, b) in enumerate(zip(mh.a, mh.b))
    )


# h_j(x) = ((a_j*x + b_j) mod (2^61-1)) mod 2^32 over 32-bit shingle
# hashes: base-257 polynomial over the shingle's codepoints mod 2^32
# (Horner via list_reduce — bit-identical to the engine's vectorized
# prefix-hash extraction, functions/hashing.py). a_j*x fits UBIGINT
# because a, x < 2^32. Docs with no shingles take the all-0xFFFFFFFF
# signature like MinHasher.signature does.
SQL_MINHASH_NEAR_DUPS = r"""
WITH params(j, a, b) AS (VALUES __MINHASH_PARAMS__),
tok AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS toks FROM documents
), shl AS (
  SELECT doc_id,
    list_distinct(
      CASE WHEN len(toks) = 0 THEN []
           WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
           ELSE list_transform(range(1, len(toks) - 1),
                               i -> toks[i] || ' ' || toks[i+1] || ' '
                                    || toks[i+2]) END) AS sh
  FROM tok
), shx AS (
  SELECT doc_id, s,
    list_reduce(
      list_transform(range(1, length(s) + 1),
                     i -> CAST(unicode(substr(s, i, 1)) AS UBIGINT)),
      (acc, cp) -> (acc * 257 + cp) % 4294967296) AS x
  FROM (SELECT doc_id, unnest(sh) AS s FROM shl)
), sig0 AS (
  -- min over FULL mod-p values, truncated to 32 bits AFTER the min —
  -- MinHasher.signature does hv.min() & 0xFFFFFFFF, not min(hv & ...),
  -- and the two differ whenever the argmin of the 61-bit values isn't
  -- also the argmin of their low 32 bits
  SELECT doc_id, j,
    min((CAST(a AS UBIGINT) * x + CAST(b AS UBIGINT))
        % CAST(2305843009213693951 AS UBIGINT)) % 4294967296 AS sig
  FROM shx, params GROUP BY doc_id, j
), sig AS (
  SELECT d.doc_id, p.j, COALESCE(s.sig, 4294967295) AS sig
  FROM documents d CROSS JOIN params p
  LEFT JOIN sig0 s ON s.doc_id = d.doc_id AND s.j = p.j
), bands AS (
  SELECT doc_id, j // 4 AS band,
    CAST(j // 4 AS VARCHAR) || ':' ||
      string_agg(CAST(sig AS VARCHAR), ',' ORDER BY j) AS bkey
  FROM sig GROUP BY doc_id, j // 4
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.bkey = b.bkey AND a.doc_id < b.doc_id
), scored AS (
  SELECT c.doc_a, c.doc_b,
    CASE WHEN len(list_distinct(sa.sh || sb.sh)) = 0 THEN 1.0
         ELSE len(list_intersect(sa.sh, sb.sh))
              / len(list_distinct(sa.sh || sb.sh)) END AS jaccard
  FROM cand c JOIN shl sa ON sa.doc_id = c.doc_a
              JOIN shl sb ON sb.doc_id = c.doc_b
)
SELECT doc_a, doc_b, jaccard FROM scored WHERE jaccard >= 0.8
""".replace("__MINHASH_PARAMS__", _minhash_params_values())


def q_simhash_near_dups(sf_dir: str):
    """SimHash near-dups: 64-bit signatures, candidates via 4x16-bit
    chunk banding, verified Hamming <= 3. Banding is LOSSLESS here
    (pigeonhole: <=3 differing bits across 4 chunks always leaves one
    chunk equal), so the SQL oracle can enumerate all pairs directly
    from per-bit signature reconstruction."""
    return dedup_mod.simhash_near_dups(_read_documents(sf_dir))


# simhash64 reproduced in SQL: token hash = base-1000003 polynomial
# over the token's codepoints mod 2^64 (Horner via list_reduce in
# HUGEINT, cast back to UBIGINT — bit-identical to the engine's
# vectorized prefix-hash extraction, functions/hashing.py); v_i =
# sum(+/-1) over per-token bit i; signature bit = v_i > 0; hamming
# compared per-bit (sig never materialized as a signed integer).
SQL_SIMHASH_NEAR_DUPS = r"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\w+')) AS tok
  FROM documents
), hraw AS (
  SELECT doc_id,
    CAST(list_reduce(
      list_transform(range(1, length(tok) + 1),
                     i -> CAST(unicode(substr(tok, i, 1)) AS HUGEINT)),
      (acc, cp) -> (acc * 1000003 + cp) % 18446744073709551616)
      AS UBIGINT) AS h0
  FROM toks
), f1 AS (
  -- murmur3 fmix64 finalizer, step by step (same mix as
  -- functions/hashing.py _fmix64). The mod-2^64 multiply is split into
  -- 32-bit halves — h*C = ((hi*C mod 2^32)<<32 + lo*C) mod 2^64 — so
  -- no intermediate exceeds HUGEINT (a direct 64x64 product can hit
  -- 2^127 and overflow INT128).
  SELECT doc_id, xor(h0, h0 >> CAST(33 AS UBIGINT)) AS h1 FROM hraw
), f2 AS (
  SELECT doc_id, CAST((
      ((CAST(h1 >> CAST(32 AS UBIGINT) AS HUGEINT) * 18397679294719823053)
        % 4294967296) * 4294967296
      + CAST(h1 & CAST(4294967295 AS UBIGINT) AS HUGEINT) * 18397679294719823053
    ) % 18446744073709551616 AS UBIGINT) AS h2 FROM f1
), f3 AS (
  SELECT doc_id, xor(h2, h2 >> CAST(33 AS UBIGINT)) AS h3 FROM f2
), f4 AS (
  SELECT doc_id, CAST((
      ((CAST(h3 >> CAST(32 AS UBIGINT) AS HUGEINT) * 14181476777654086739)
        % 4294967296) * 4294967296
      + CAST(h3 & CAST(4294967295 AS UBIGINT) AS HUGEINT) * 14181476777654086739
    ) % 18446744073709551616 AS UBIGINT) AS h4 FROM f3
), hx AS (
  SELECT doc_id, xor(h4, h4 >> CAST(33 AS UBIGINT)) AS h FROM f4
), bitvals AS (
  SELECT doc_id, i,
    sum(CASE WHEN (h >> CAST(i AS UBIGINT)) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM hx, generate_series(0, 63) AS g(i)
  GROUP BY doc_id, i
), sigbits AS (
  SELECT d.doc_id, g.i,
    CASE WHEN COALESCE(b.v, 0) > 0 THEN 1 ELSE 0 END AS bit
  FROM documents d
  CROSS JOIN generate_series(0, 63) AS g(i)
  LEFT JOIN bitvals b ON b.doc_id = d.doc_id AND b.i = g.i
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
  CAST(sum(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) AS BIGINT) AS hamming
FROM sigbits a JOIN sigbits b ON a.i = b.i AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING sum(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) <= 3
"""


def q_ngram_jaccard(sf_dir: str):
    """Exact n-gram Jaccard of every doc vs the 10 broadcast probe docs
    (doc_id < 10 — an SQL-expressible probe set)."""
    probes = {
        r["doc_id"]: r["text"]
        for r in pq.read_table(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        ).to_pylist()
        if r["doc_id"] < 10
    }
    return _read_documents(sf_dir).map_batches(
        dedup_mod.NgramJaccardScorer,
        fn_constructor_kwargs={"probes_ref": ray.put(probes), "threshold": 0.2},
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=2,
    )


# Word 3-shingle sets in SQL: \w+ tokens of the lowercased text (the
# corpus is ASCII, so [a-z0-9_]+ == \w+), consecutive triples joined by
# spaces, de-duplicated. jaccard = |∩| / |∪| as a raw BIGINT/BIGINT
# division (IEEE-identical to functions/hashing.py jaccard()).
SQL_NGRAM_JACCARD = """
WITH sh AS (
  SELECT doc_id,
    list_distinct(
      CASE WHEN len(toks) = 0 THEN []
           WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
           ELSE list_transform(range(1, len(toks) - 1),
                               i -> toks[i] || ' ' || toks[i+1] || ' '
                                    || toks[i+2])
      END) AS sh
  FROM (SELECT doc_id,
               regexp_extract_all(lower(text), '[a-z0-9_]+') AS toks
        FROM documents)
), scored AS (
  SELECT d.doc_id, p.doc_id AS probe_id,
    CASE WHEN len(list_distinct(d.sh || p.sh)) = 0 THEN 1.0
         ELSE len(list_intersect(d.sh, p.sh))
              / len(list_distinct(d.sh || p.sh)) END AS jaccard
  FROM sh d JOIN sh p ON p.doc_id < 10 AND p.doc_id <> d.doc_id
)
SELECT doc_id, probe_id, jaccard FROM scored WHERE jaccard >= 0.2
"""


# ----------------------------------------------------------- textstats

def q_token_stats(sf_dir: str):
    return _read_documents(sf_dir).map_batches(
        textstats.token_stats_batch, batch_format="pyarrow"
    )


SQL_TOKEN_STATS = """
SELECT doc_id,
  CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens,
  CAST(length(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS BIGINT) AS n_bpe_tokens,
  CAST(length(regexp_extract_all(text, '[.!?,;:]')) AS BIGINT) AS n_punct
FROM documents
"""


def q_quality(sf_dir: str):
    return _read_documents(sf_dir).map_batches(
        textstats.quality_batch, batch_format="pyarrow"
    )


_STOP_SQL = ", ".join(f"'{w}'" for w in textstats.STOP_SMALL)

SQL_QUALITY = f"""
WITH t AS (
  SELECT doc_id, text,
    regexp_extract_all(text, '\\S+') AS toks,
    regexp_extract_all(lower(text), '[a-z]+') AS words
  FROM documents
)
SELECT doc_id,
  CAST(length(text) AS BIGINT) AS n_chars,
  CAST(length(toks) AS BIGINT) AS n_tokens,
  CASE WHEN length(toks) = 0 THEN 0.0
       ELSE CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT)
            / CAST(length(toks) AS BIGINT) END AS mean_word_len,
  CASE WHEN length(words) = 0 THEN 0.0
       ELSE CAST(length(list_filter(words, w -> w IN ({_STOP_SQL}))) AS BIGINT)
            / CAST(length(words) AS BIGINT) END AS stop_ratio,
  CASE WHEN length(text) = 0 THEN 0.0
       ELSE CAST(length(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT)
            / CAST(length(text) AS BIGINT) END AS alpha_ratio
FROM t
"""


def q_lang_id(sf_dir: str):
    return _read_documents(sf_dir).map_batches(
        textstats.lang_id_batch, batch_format="pyarrow"
    )


def _lang_count_sql(lang: str) -> str:
    markers = ", ".join(f"'{w}'" for w in textstats.LANG_MARKERS[lang])
    return (
        f"length(list_filter(regexp_extract_all(lower(text), '[a-z]+'),"
        f" w -> w IN ({markers})))"
    )


SQL_LANG_ID = f"""
WITH s AS (
  SELECT doc_id,
    {_lang_count_sql('en')} AS s_en,
    {_lang_count_sql('de')} AS s_de,
    {_lang_count_sql('fr')} AS s_fr,
    {_lang_count_sql('es')} AS s_es
  FROM documents
)
SELECT doc_id,
  CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
       WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
       WHEN s_fr >= s_es THEN 'fr'
       ELSE 'es' END AS pred_lang,
  CAST(greatest(s_en, s_de, s_fr, s_es) AS BIGINT) AS marker_hits
FROM s
"""


def q_longest_doc_per_lang(sf_dir: str):
    """Grouped argmax: the longest document per language (ties broken
    by min doc_id) as ONE vectorized Max over a packed key —
    n_chars·2³² + (2³²−1−doc_id) makes numeric max equal lexicographic
    (max n_chars, then min doc_id); no per-group Python, no sort."""
    from ray.data.aggregate import Max

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    )
    inv = (1 << 32) - 1

    def pack(t: pa.Table) -> pa.Table:
        # checked arithmetic: an n_chars >= 2^32 (or doc_id outside
        # [0, 2^32)) must RAISE, not silently wrap the packed key and
        # return a wrong argmax — same guard as q_line_dedup's
        key = pc.add_checked(
            pc.multiply_checked(
                pc.cast(t["n_chars"], pa.uint64(), safe=True),
                pa.scalar(1 << 32, pa.uint64()),
            ),
            # uint64 cast raises on doc_id < 0; checked subtract raises
            # (underflow) on doc_id > 2^32-1 — the low 32-bit field can
            # never silently spill into the n_chars field
            pc.subtract_checked(
                pa.scalar(inv, pa.uint64()),
                pc.cast(t["doc_id"], pa.uint64(), safe=True),
            ),
        )
        return pa.table({"lang": t["lang"], "key": key})

    def unpack(t: pa.Table) -> pa.Table:
        key = t["max_key"]
        return pa.table(
            {
                "lang": t["lang"],
                "doc_id": pc.cast(
                    pc.subtract(
                        pa.scalar(inv, pa.uint64()),
                        pc.bit_wise_and(key, pa.scalar(inv, pa.uint64())),
                    ),
                    pa.int64(),
                ),
                "n_chars": pc.cast(pc.shift_right(key, 32), pa.int64()),
            }
        )

    return (
        ds.map_batches(pack, batch_format="pyarrow", batch_size=None)
        .groupby("lang")
        .aggregate(Max("key", alias_name="max_key"))
        .map_batches(unpack, batch_format="pyarrow")
    )


SQL_LONGEST_DOC_PER_LANG = """
SELECT lang, doc_id, n_chars FROM (
  SELECT lang, doc_id, n_chars,
    row_number() OVER (PARTITION BY lang
                       ORDER BY n_chars DESC, doc_id ASC) AS rn
  FROM documents
) WHERE rn = 1
"""


def q_lang_confusion(sf_dir: str):
    """Classifier QC: confusion matrix of stored vs predicted language
    (per-(lang, pred_lang) counts). Prediction happens map-side on
    (doc_id, text, lang); the groupby moves at most |langs|² rows per
    block (combiner via the small key space)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )

    def pred(t: pa.Table) -> pa.Table:
        out = textstats.lang_id_batch(t)
        flat = pa.table(
            {"lang": t["lang"], "pred_lang": out["pred_lang"]}
        )
        g = pa.TableGroupBy(flat, ["lang", "pred_lang"]).aggregate(
            [("pred_lang", "count")]
        )
        # by-name selection (not positional rename): key/agg column
        # order is a pyarrow-version convention
        return pa.table(
            {
                "lang": g["lang"],
                "pred_lang": g["pred_lang"],
                "n": g["pred_lang_count"],
            }
        )

    return (
        ds.map_batches(pred, batch_format="pyarrow", batch_size=None)
        .groupby(["lang", "pred_lang"])
        .aggregate(Sum("n", alias_name="n_docs"))
    )


SQL_LANG_CONFUSION = f"""
WITH s AS (
  SELECT doc_id, lang,
    {_lang_count_sql('en')} AS s_en,
    {_lang_count_sql('de')} AS s_de,
    {_lang_count_sql('fr')} AS s_fr,
    {_lang_count_sql('es')} AS s_es
  FROM documents
), p AS (
  SELECT lang,
    CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
         WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
         WHEN s_fr >= s_es THEN 'fr'
         ELSE 'es' END AS pred_lang
  FROM s
)
SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n_docs
FROM p GROUP BY lang, pred_lang
"""


def q_fingerprint(sf_dir: str):
    ds = _read_documents(sf_dir).map_batches(
        textstats.fingerprint_batch, batch_format="pyarrow"
    )
    # uint64 simhash + winnow size are pytest-pinned; SQL checks md5
    return ds.select_columns(["doc_id", "md5_hash"])


SQL_FINGERPRINT = "SELECT doc_id, md5(text) AS md5_hash FROM documents"


def q_hll_distinct(sf_dir: str):
    """HyperLogLog (Flajolet et al. 2007) distinct-vocabulary estimate
    per source, plus the exact hash-distinct count as its accuracy
    twin.

    Sketch pass: per-batch register partials (<= sources x 256 rows
    per batch, whatever the batch size) -> one TINY
    groupby(source, reg).max merge — the mergeable-sketch shape whose
    shuffle is O(sources x 256), not O(vocabulary). The exact twin
    dedupes (source, token-hash) pairs — the O(vocabulary) shuffle the
    sketch exists to avoid, kept here as the visible accuracy
    baseline. Final estimates are computed driver-side from the merged
    registers (sources x 256 rows — small by construction)."""
    import numpy as np
    import pandas as pd

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )
    regs = (
        docs.map_batches(
            textstats.make_hll_partials(), batch_format="pyarrow"
        )
        .groupby(["source", "reg"])
        .aggregate(Max("rho", alias_name="rho"))
        .to_pandas()
    )
    if regs.empty or "source" not in regs.columns:
        # no \w+ token anywhere (empty Datasets also drop their
        # column names in to_pandas) — the oracle returns 0 rows
        return pd.DataFrame(
            {
                "source": pd.array([], "str"),
                "n_distinct": pd.array([], "int64"),
                "hll_estimate": pd.array([], "float64"),
            }
        )

    def hash_pairs(batch: pa.Table) -> pa.Table:
        import re as _re

        from ..functions.hashing import token_hashes64

        tok = _re.compile(r"\w+")  # same tokenizer as the sketch pass
        per_source: dict[str, set] = {}
        for s, text in zip(
            batch["source"].to_pylist(), batch["text"].to_pylist()
        ):
            per_source.setdefault(s, set()).update(
                tok.findall(text.lower())
            )
        srcs, hs, parts = [], [], []
        for s, words in per_source.items():
            h = np.asarray(token_hashes64(list(words)), dtype=np.uint64)
            srcs.extend([s] * len(h))
            hs.extend(int(x) for x in h)
            parts.extend(
                int(p) for p in (h & np.uint64(63)).astype(np.int32)
            )
        return pa.table(
            {
                "source": pa.array(srcs, pa.string()),
                "h": pa.array(hs, pa.uint64()),
                "part": pa.array(parts, pa.int32()),
            }
        )

    def count_distinct_part(df):
        # hash-disjoint partitions: per-source distinct counts add up
        return (
            df.drop_duplicates(["source", "h"])
            .groupby("source", sort=False, as_index=False)
            .size()
            .rename(columns={"size": "n_distinct"})
        )

    uniq = (
        docs.map_batches(hash_pairs, batch_format="pyarrow")
        .groupby("part")
        .map_groups(count_distinct_part, batch_format="pandas")
        .to_pandas()  # <= 64 x sources rows
        .groupby("source", sort=False, as_index=False)["n_distinct"]
        .sum()
    )

    ests = []
    for source, grp in regs.groupby("source"):
        m = np.zeros(textstats.HLL_REGISTERS, np.int64)
        m[grp["reg"].to_numpy()] = grp["rho"].to_numpy()
        ests.append(
            {
                "source": source,
                "hll_estimate": round(textstats.hll_estimate(m), 3),
            }
        )
    out = uniq.merge(pd.DataFrame(ests), on="source", how="inner")
    out["n_distinct"] = out["n_distinct"].astype("int64")
    return out


# token hash = the simhash polynomial + fmix64 chain (see
# SQL_SIMHASH_NEAR_DUPS) over each DISTINCT (source, word); register =
# h % 256, rank = 1 + trailing zeros of h // 256 via exact integer
# bit_count; the denominator sum is carried as the exact integer
# sum(2^(57 - rho)) in HUGEINT so no float accumulation order exists.
SQL_HLL_DISTINCT = r"""
WITH words AS (
  SELECT DISTINCT source,
         unnest(regexp_extract_all(lower(text), '\w+')) AS w
  FROM documents
), h0t AS (
  SELECT source,
    CAST(list_reduce(
      list_transform(range(1, length(w) + 1),
                     i -> CAST(unicode(substr(w, i, 1)) AS HUGEINT)),
      (acc, cp) -> (acc * 1000003 + cp) % 18446744073709551616)
      AS UBIGINT) AS h0
  FROM words
), f1 AS (
  SELECT source, xor(h0, h0 >> CAST(33 AS UBIGINT)) AS h1 FROM h0t
), f2 AS (
  SELECT source, CAST((
      ((CAST(h1 >> CAST(32 AS UBIGINT) AS HUGEINT) * 18397679294719823053)
        % 4294967296) * 4294967296
      + CAST(h1 & CAST(4294967295 AS UBIGINT) AS HUGEINT) * 18397679294719823053
    ) % 18446744073709551616 AS UBIGINT) AS h2 FROM f1
), f3 AS (
  SELECT source, xor(h2, h2 >> CAST(33 AS UBIGINT)) AS h3 FROM f2
), f4 AS (
  SELECT source, CAST((
      ((CAST(h3 >> CAST(32 AS UBIGINT) AS HUGEINT) * 14181476777654086739)
        % 4294967296) * 4294967296
      + CAST(h3 & CAST(4294967295 AS UBIGINT) AS HUGEINT) * 14181476777654086739
    ) % 18446744073709551616 AS UBIGINT) AS h4 FROM f3
), hx AS (
  SELECT source, xor(h4, h4 >> CAST(33 AS UBIGINT)) AS h FROM f4
), hs AS (
  SELECT DISTINCT source, h FROM hx
), regs AS (
  SELECT source, CAST(h % 256 AS BIGINT) AS reg,
    max(CASE WHEN h // 256 = CAST(0 AS UBIGINT) THEN 57
        ELSE 1 + CAST(bit_count(
               (CAST(h // 256 AS BIGINT) & -CAST(h // 256 AS BIGINT)) - 1
             ) AS BIGINT) END) AS rho
  FROM hs GROUP BY source, h % 256
), denom AS (
  SELECT s.source,
    sum(CAST(CAST(1 AS BIGINT) << (57 - COALESCE(r.rho, 0)) AS HUGEINT))
      AS den,
    sum(CASE WHEN r.rho IS NULL THEN 1 ELSE 0 END) AS zeros
  FROM (SELECT DISTINCT source FROM hs) s
  CROSS JOIN generate_series(0, 255) g(reg)
  LEFT JOIN regs r ON r.source = s.source AND r.reg = g.reg
  GROUP BY s.source
), est AS (
  SELECT source, zeros,
    (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 * 144115188075855872.0
      / CAST(den AS DOUBLE) AS e_raw
  FROM denom
), counts AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_distinct
  FROM hs GROUP BY source
)
SELECT c.source, c.n_distinct,
  round(CASE WHEN e.zeros > 0 AND e.e_raw <= 640.0
        THEN 256.0 * ln(256.0 / e.zeros) ELSE e.e_raw END, 3)
    AS hll_estimate
FROM counts c JOIN est e USING (source)
"""


def q_domain_quality_gate(sf_dir: str):
    """Per-domain ADAPTIVE quality filter (the CCNet-style per-bucket
    quantile gate): integer stopword score (1000 * stopwords //
    words), per-source discrete median threshold, keep docs at or
    above their own domain's median.

    Two passes, both bounded: pass 1 reduces to (source, score)
    histogram partials per batch — at most sources x 1001 rows ever
    shuffle, whatever the corpus — and the driver reads each
    threshold off the merged CDF (quantile_disc rank = ceil(q*n),
    the DuckDB semantics pinned by the differential fuzz). The same
    grouped-histogram shape backs stages/ranking.py's ntile (float
    score grid, driver arrow merge); this one stays integer-keyed
    with a Ray groupby merge, so they share the idea, not code. Pass 2
    re-streams the corpus with the broadcast threshold dict and
    filters map-side. Integer score + rank-based quantile = no float
    anywhere, bit-stable under any parallelism."""
    import numpy as np

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "source", "text"],
    )
    word_re = textstats._RE_WORD
    stop_set = textstats._STOP_SET

    def score_arr(texts: list) -> "np.ndarray":
        out = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            ws = word_re.findall(t.lower())
            out[i] = (
                (1000 * sum(1 for w in ws if w in stop_set)) // len(ws)
                if ws
                else 0
            )
        return out

    def hist_partial(t: pa.Table) -> pa.Table:
        scores = score_arr(t["text"].to_pylist())
        srcs = np.asarray(t["source"].to_pylist())
        out_s, out_sc, out_n = [], [], []
        for s in np.unique(srcs):
            vals, counts = np.unique(scores[srcs == s], return_counts=True)
            out_s.extend([str(s)] * len(vals))
            out_sc.extend(int(v) for v in vals)
            out_n.extend(int(c) for c in counts)
        return pa.table(
            {
                "source": pa.array(out_s, pa.string()),
                "score": pa.array(out_sc, pa.int64()),
                "n": pa.array(out_n, pa.int64()),
            }
        )

    hist = (
        docs.map_batches(hist_partial, batch_format="pyarrow")
        .groupby(["source", "score"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # <= sources x 1001 rows by construction
    )
    thr: dict[str, int] = {}
    for source, grp in hist.groupby("source"):
        grp = grp.sort_values("score")
        total = int(grp["n"].sum())
        # quantile_disc(0.5) rank = ceil(total/2) — integer form, no
        # float rank math anywhere (matches the docstring's contract)
        target = (total + 1) // 2
        cum = grp["n"].cumsum()
        thr[source] = int(grp.loc[cum >= target, "score"].iloc[0])
    thr_ref = ray.put(thr)

    def gate(t: pa.Table) -> pa.Table:
        from ..functions.broadcast import cached_get

        cuts = cached_get(thr_ref)
        scores = score_arr(t["text"].to_pylist())
        srcs = t["source"].to_pylist()
        keep = pa.array(
            [sc >= cuts[s] for s, sc in zip(srcs, scores)], pa.bool_()
        )
        mask = keep.to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": t["doc_id"].filter(keep),
                "source": t["source"].filter(keep),
                "score": pa.array(scores[mask], pa.int64()),
            }
        )

    return docs.map_batches(gate, batch_format="pyarrow")


SQL_DOMAIN_QUALITY_GATE = f"""
WITH sc AS (
  SELECT doc_id, source,
    CASE WHEN length(regexp_extract_all(lower(text), '[a-z]+')) = 0
         THEN 0
         ELSE 1000 * length(list_filter(
                regexp_extract_all(lower(text), '[a-z]+'),
                w -> w IN ({_STOP_SQL})))
              // length(regexp_extract_all(lower(text), '[a-z]+')) END
      AS score
  FROM documents
), thr AS (
  SELECT source, quantile_disc(score, 0.5) AS t FROM sc GROUP BY source
)
SELECT s.doc_id, s.source, CAST(s.score AS BIGINT) AS score
FROM sc s JOIN thr t ON t.source = s.source
WHERE s.score >= t.t
"""


def q_len_token_corr(sf_dir: str):
    """Pearson correlation between doc length and whitespace token
    count — the multi-moment aggregate shape: ONE map pass reduces
    each batch to six exact integers (n, sx, sy, sxx, syy, sxy), a
    tiny sum merges them, and the correlation derives from the same
    explicit float expression on both sides (NOT the builtin corr() —
    Welford-style streaming accumulators round differently from the
    naive sums; explicit integer sums can't)."""
    import numpy as np
    import pandas as pd

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text", "n_chars"]
    )

    def moments(t: pa.Table) -> pa.Table:
        x = t["n_chars"].to_numpy().astype(object)
        y = np.array(
            [
                len(textstats._RE_TOKEN.findall(s))
                for s in t["text"].to_pylist()
            ],
            dtype=object,
        )
        return pa.table(
            {
                "n": pa.array([len(x)], pa.int64()),
                "sx": pa.array([int(sum(x))], pa.int64()),
                "sy": pa.array([int(sum(y))], pa.int64()),
                "sxx": pa.array([int(sum(v * v for v in x))], pa.int64()),
                "syy": pa.array([int(sum(v * v for v in y))], pa.int64()),
                "sxy": pa.array(
                    [int(sum(a * b for a, b in zip(x, y)))], pa.int64()
                ),
            }
        )

    agg = ds.map_batches(moments, batch_format="pyarrow").sum(
        ["n", "sx", "sy", "sxx", "syy", "sxy"]
    )
    n, sx, sy, sxx, syy, sxy = (
        int(agg[f"sum({c})"])
        for c in ("n", "sx", "sy", "sxx", "syy", "sxy")
    )
    num = n * sxy - sx * sy
    denx = n * sxx - sx * sx
    deny = n * syy - sy * sy
    corr = (
        _round6(num / (denx**0.5 * deny**0.5))
        if denx > 0 and deny > 0
        else None
    )
    return pd.DataFrame(
        {
            "n_docs": pd.array([n], "int64"),
            "corr_len_tokens": pd.array([corr], "float64"),
        }
    )


# identical explicit expression: integer sums -> CAST once -> the same
# float multiply/sqrt/divide tree, 6-dp rounded
SQL_LEN_TOKEN_CORR = r"""
WITH m AS (
  SELECT count(*) AS n,
    CAST(sum(n_chars) AS BIGINT) AS sx,
    CAST(sum(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS sy,
    CAST(sum(n_chars * n_chars) AS BIGINT) AS sxx,
    CAST(sum(len(regexp_extract_all(text, '\S+'))
             * len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS syy,
    CAST(sum(n_chars * len(regexp_extract_all(text, '\S+')))
         AS BIGINT) AS sxy
  FROM documents
)
SELECT CAST(n AS BIGINT) AS n_docs,
  CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
       THEN round(CAST(n * sxy - sx * sy AS DOUBLE)
                  / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                     * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
       ELSE NULL END AS corr_len_tokens
FROM m
"""


def q_global_rank(sf_dir: str):
    """Global dense row numbering by (n_chars DESC, doc_id ASC) — the
    zipWithIndex shape — WITHOUT a global sort: pass 1 reduces to a
    length histogram (bounded by the length grid, not the corpus) and
    the driver derives each length's base rank off the descending
    CDF; pass 2 partitions BY LENGTH (n_chars & 63 — every doc of a
    given length lands in one partition by construction), sorts each
    bounded partition once, and reads within-length offsets off the
    equal-length runs. Rank = broadcast base + local offset; nothing
    corpus-sized is globally sorted or centralized."""
    import numpy as np

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )

    def hist_partial(t: pa.Table) -> pa.Table:
        vals, counts = np.unique(
            t["n_chars"].to_numpy(), return_counts=True
        )
        return pa.table(
            {
                "n_chars": pa.array(vals, pa.int64()),
                "n": pa.array(counts, pa.int64()),
            }
        )

    hist = (
        ds.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("n_chars")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("n_chars", ascending=False)
    )
    counts = hist["n"].to_numpy()
    base = {
        int(length): int(b)
        for length, b in zip(
            hist["n_chars"].to_numpy(),
            1 + np.concatenate(([0], np.cumsum(counts)[:-1])),
        )
    }
    base_ref = ray.put(base)

    def add_part(t: pa.Table) -> pa.Table:
        part = pc.cast(
            pc.bit_wise_and(t["n_chars"], pa.scalar(63, pa.int64())),
            pa.int32(),
        )
        return t.append_column("part", part)

    def rank_partition(df):
        from ..functions.broadcast import cached_get

        b = cached_get(base_ref)
        df = df.sort_values(
            ["n_chars", "doc_id"], kind="mergesort"
        ).reset_index(drop=True)
        lens = df["n_chars"].to_numpy()
        n = len(df)
        new_run = np.empty(n, dtype=bool)
        if n:
            new_run[0] = True
            new_run[1:] = lens[1:] != lens[:-1]
        starts = np.flatnonzero(new_run)
        run_id = np.cumsum(new_run) - 1
        offset = np.arange(n) - starts[run_id]
        df["rank"] = np.array(
            [b[int(x)] for x in lens[starts]], dtype=np.int64
        )[run_id] + offset
        return df[["doc_id", "n_chars", "rank"]]

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(rank_partition, batch_format="pandas")
    )


SQL_GLOBAL_RANK = """
SELECT doc_id, n_chars,
  CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id) AS BIGINT)
    AS rank
FROM documents
"""


def q_doclen_zscore(sf_dir: str):
    """Global z-score normalization of doc length — the
    whole-corpus-moments broadcast shape: n, sum(x), sum(x^2) reduce
    as EXACT integers (one tiny aggregate), mean/variance derive on
    the driver with the same float expression the SQL uses
    (var = s2/n - mean*mean, population form), then one map-only pass
    emits z = (x - mean)/sd rounded to 6 dp. No shuffle; constant
    driver state."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )

    def moments(t: pa.Table) -> pa.Table:
        import numpy as np

        x = t["n_chars"].to_numpy()
        return pa.table(
            {
                "n": pa.array([len(x)], pa.int64()),
                "s1": pa.array([int(x.sum())], pa.int64()),
                "s2": pa.array([int((x.astype(object) ** 2).sum())],
                               pa.int64()),
            }
        )

    agg = (
        ds.map_batches(moments, batch_format="pyarrow")
        .sum(["n", "s1", "s2"])
    )
    n, s1, s2 = (int(agg[f"sum({c})"]) for c in ("n", "s1", "s2"))
    if n == 0:
        import pandas as pd

        return pd.DataFrame(
            {
                "doc_id": pd.array([], "int64"),
                "z": pd.array([], "float64"),
            }
        )
    mean = s1 / n
    var = s2 / n - mean * mean
    sd = var**0.5

    def zmap(t: pa.Table) -> pa.Table:
        import numpy as np

        x = t["n_chars"].to_numpy().astype(np.float64)
        z = (
            _round6_np((x - mean) / sd)
            if sd > 0.0
            else np.zeros(len(x))
        )
        return pa.table(
            {"doc_id": t["doc_id"], "z": pa.array(z, pa.float64())}
        )

    return ds.map_batches(zmap, batch_format="pyarrow")


# population moments from exact integer sums; the float expression
# (s2/n - mean^2, sqrt, divide, 6-dp round) is written identically on
# both sides so the doubles match bit-for-bit
SQL_DOCLEN_ZSCORE = """
WITH m AS (
  SELECT count(*) AS n,
         CAST(sum(n_chars) AS BIGINT) AS s1,
         CAST(sum(n_chars * n_chars) AS BIGINT) AS s2
  FROM documents
), p AS (
  SELECT n, s1 / CAST(n AS DOUBLE) AS mean,
         sqrt(s2 / CAST(n AS DOUBLE)
              - (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE)))
           AS sd
  FROM m
)
SELECT d.doc_id,
  CASE WHEN p.sd > 0.0
       THEN round((CAST(d.n_chars AS DOUBLE) - p.mean) / p.sd, 6)
       ELSE 0.0 END AS z
FROM documents d CROSS JOIN p
"""


def q_bm25_topk(sf_dir: str):
    """Okapi BM25 (Robertson & Zaragoza 2009; k1=1.5, b=0.75) document
    ranking for a corpus-derived query: the 8 highest-df words (ties
    lexicographic).

    Phase 1 computes global df / N / avgdl in ONE tokenize pass with
    map-side combiners (corpus totals ride along as \\x00-prefixed
    marker rows — \\x00 can never be a \\w+ token) and one
    vocabulary-sized groupby, materialized once because both the
    marker probe and the term ranking consume it. Phase 2 broadcasts
    the 8-term query (closure constants — bytes, not a shuffle) and
    scores map-side, keeping a per-batch top-k so the final sort
    exchanges only ~k rows per block. Docs are ranked on the 6-dp
    ROUNDED score with doc_id tie-break; the residual cross-engine
    risk is a sum whose unrounded value sits within ~1 ulp of an
    x.xxxxxx5 boundary (term-addition order differs from SQL) —
    measure-zero for continuous scores, disclosed rather than
    eliminated."""
    import math
    import re as _re

    from collections import Counter

    docs = _read_documents(sf_dir)

    def df_partial(t: pa.Table) -> pa.Table:
        import zlib

        tok = _re.compile(r"\w+")
        c: Counter = Counter()
        n_docs, sum_dl = 0, 0
        for text in t["text"].to_pylist():
            ws = tok.findall(text.lower())
            n_docs += 1
            sum_dl += len(ws)
            c.update(set(ws))
        c["\x00docs"] = n_docs
        c["\x00dl"] = sum_dl
        words = list(c.keys())
        return pa.table(
            {
                "w": pa.array(words, pa.string()),
                "df": pa.array(list(c.values()), pa.int64()),
                # deterministic term partition: the vocab reduce is a
                # vectorized per-partition groupby-sum over 64 bounded
                # groups, not a global sort-aggregate over every
                # (batch x vocab) partial row
                "part": pa.array(
                    [zlib.crc32(w.encode("utf-8")) & 63 for w in words],
                    pa.int32(),
                ),
            }
        )

    def df_reduce(df):
        out = df.groupby("w", sort=False, as_index=False)["df"].sum()
        return out

    grouped = (
        docs.map_batches(df_partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(df_reduce, batch_format="pandas")
        .materialize()
    )
    markers = {
        r["w"]: r["df"]
        for r in grouped.map_batches(
            lambda t: t.filter(pc.starts_with(t["w"], "\x00")),
            batch_format="pyarrow",
        ).take_all()
    }
    n_corpus = int(markers.get("\x00docs", 0))
    if n_corpus == 0:
        import pandas as pd

        return pd.DataFrame(
            {
                "doc_id": pd.array([], "int64"),
                "score": pd.array([], "float64"),
            }
        )
    avgdl = float(markers["\x00dl"]) / n_corpus
    qterms = (
        grouped.map_batches(
            lambda t: t.filter(
                pc.invert(pc.starts_with(t["w"], "\x00"))
            ),
            batch_format="pyarrow",
        )
        .sort(["df", "w"], descending=[True, False])
        .limit(8)
        .take_all()
    )
    idf = {
        r["w"]: math.log(
            1.0 + (n_corpus - r["df"] + 0.5) / (r["df"] + 0.5)
        )
        for r in qterms
    }

    def score(t: pa.Table) -> pa.Table:
        tok = _re.compile(r"\w+")
        ids, scores = [], []
        for did, text in zip(
            t["doc_id"].to_pylist(), t["text"].to_pylist()
        ):
            ws = tok.findall(text.lower())
            dl = len(ws)
            c = Counter(w for w in ws if w in idf)
            if not c:
                continue
            s = 0.0
            for w in sorted(c):
                tf = c[w]
                s += (
                    idf[w]
                    * (tf * 2.5)
                    / (tf + 1.5 * (0.25 + 0.75 * dl / avgdl))
                )
            ids.append(did)
            scores.append(_round6(s))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "score": pa.array(scores, pa.float64()),
            }
        )

    def local_topk(t: pa.Table) -> pa.Table:
        order = t.sort_by(
            [("score", "descending"), ("doc_id", "ascending")]
        )
        return order.slice(0, 20)

    return (
        docs.map_batches(score, batch_format="pyarrow")
        .map_batches(local_topk, batch_format="pyarrow")
        .sort(["score", "doc_id"], descending=[True, False])
        .limit(20)
    )


SQL_BM25_TOPK = r"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\w+')) AS w
  FROM documents
), dl AS (
  SELECT doc_id, len(regexp_extract_all(lower(text), '\w+')) AS dl
  FROM documents
), stats AS (
  SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS sum_dl FROM dl
), df AS (
  SELECT w, count(DISTINCT doc_id) AS df FROM toks GROUP BY w
), qterms AS (
  SELECT w, df FROM df ORDER BY df DESC, w ASC LIMIT 8
), tf AS (
  SELECT t.doc_id, t.w, count(*) AS tf
  FROM toks t JOIN qterms q ON q.w = t.w
  GROUP BY t.doc_id, t.w
), scored AS (
  SELECT tf.doc_id,
    sum(
      ln(1.0 + (s.n - q.df + 0.5) / (q.df + 0.5))
      * (tf.tf * 2.5)
      / (tf.tf + 1.5 * (0.25 + 0.75 * d.dl
                        / (CAST(s.sum_dl AS DOUBLE) / s.n)))
    ) AS score
  FROM tf
  JOIN qterms q ON q.w = tf.w
  JOIN dl d ON d.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY tf.doc_id
)
SELECT doc_id, round(score, 6) AS score FROM scored
ORDER BY round(score, 6) DESC, doc_id ASC LIMIT 20
"""


def q_kmeans_clusters(sf_dir: str):
    """Distributed k-means (k=8, 3 Lloyd's iterations) over the
    embeddings table -> (vec_id, cluster, dist). Each iteration is one
    streaming pass: broadcast centroids, exact-integer argmin
    map-side, per-batch (cluster, dim) partial sums, tiny groupby
    merge — the driver only ever sees k x (d+1) reduced rows. The
    integer-quantization contract (stages/clustering.py) makes the
    serial SQL unroll bit-identical."""
    from ..stages import clustering

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return clustering.kmeans(ds)


def q_embedding_gram(sf_dir: str):
    """Distributed Gram matrix G = sum_rows q q^T over the quantized
    embedding table — the covariance/PCA building block. Each block
    reduces to ONE dense d x d int64 partial (32 KiB at d=64); the
    driver sums the blockwise partials exactly (integer addition
    commutes) — the matrix-accumulation instance of the dense-reduce
    pattern shared with kmeans/pagerank. Output: (i, j, g), 1-based
    dims, exact integers."""
    import numpy as np

    from ..stages.clustering import quantize_batch

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["embedding"]
    )

    def partial(t: pa.Table) -> pa.Table:
        q = quantize_batch(t)
        if not len(q):
            return pa.table(
                {"g": pa.array([], pa.large_binary()),
                 "d": pa.array([], pa.int64())}
            )
        g = q.T @ q  # [d, d] int64, exact
        return pa.table(
            {
                "g": pa.array([g.tobytes()], pa.large_binary()),
                "d": pa.array([g.shape[0]], pa.int64()),
            }
        )

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    rows = [r for r in rows if r["d"]]
    if not rows:
        return pa.table(
            {
                "i": pa.array([], pa.int64()),
                "j": pa.array([], pa.int64()),
                "g": pa.array([], pa.int64()),
            }
        )
    d = int(rows[0]["d"])
    total = np.zeros((d, d), np.int64)
    for r in rows:
        total += np.frombuffer(r["g"], np.int64).reshape(d, d)
    i = np.repeat(np.arange(1, d + 1), d)
    j = np.tile(np.arange(1, d + 1), d)
    return pa.table(
        {
            "i": pa.array(i, pa.int64()),
            "j": pa.array(j, pa.int64()),
            "g": pa.array(total.ravel(), pa.int64()),
        }
    )


SQL_EMBEDDING_GRAM = """
WITH q AS (
  SELECT vec_id,
    list_transform(embedding,
      e -> CAST(floor(CAST(e AS DOUBLE) * 1024.0 + 0.5) AS BIGINT)) AS qv
  FROM embeddings
), e1 AS (
  SELECT vec_id, unnest(range(1, len(qv) + 1)) AS i, unnest(qv) AS v
  FROM q
)
SELECT a.i AS i, b.i AS j, CAST(sum(a.v * b.v) AS BIGINT) AS g
FROM e1 a JOIN e1 b USING (vec_id)
GROUP BY a.i, b.i
"""


def _kmeans_sql(k: int = 8, iters: int = 3) -> str:
    """Unrolled Lloyd's in DuckDB: assignment = row_number over exact
    integer distances (ties -> smallest cluster), update =
    round-half-away-from-zero via positive-operand // (DuckDB //
    truncates, Python // floors; they agree only on non-negatives),
    empty clusters keep the previous centroid via COALESCE."""
    parts = [
        r"""
WITH q AS (
  SELECT vec_id,
    list_transform(embedding,
      e -> CAST(floor(CAST(e AS DOUBLE) * 1024.0 + 0.5) AS BIGINT)) AS qv
  FROM embeddings
), cent0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, qv AS cv
  FROM (SELECT vec_id, qv FROM q ORDER BY vec_id LIMIT """
        + str(k)
        + "))"
    ]
    it_tpl = """, d{t} AS (
  SELECT q.vec_id, q.qv, c.cluster,
    list_sum(list_transform(range(1, len(q.qv) + 1),
      i -> (q.qv[i] - c.cv[i]) * (q.qv[i] - c.cv[i]))) AS dist
  FROM q CROSS JOIN cent{p} c
), asg{t} AS (
  SELECT vec_id, qv, cluster FROM (
    SELECT vec_id, qv, cluster,
      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) AS rn
    FROM d{t}) WHERE rn = 1
), ex{t} AS (
  SELECT cluster, unnest(qv) AS v,
         unnest(range(1, len(qv) + 1)) AS dim
  FROM asg{t}
), sums{t} AS (
  SELECT cluster, dim, CAST(sum(v) AS BIGINT) AS s,
         CAST(count(*) AS BIGINT) AS n
  FROM ex{t} GROUP BY cluster, dim
), cent{t} AS (
  SELECT p.cluster, COALESCE(u.cv, p.cv) AS cv
  FROM cent{p} p LEFT JOIN (
    SELECT cluster,
      list(CASE WHEN s >= 0 THEN (2 * s + n) // (2 * n)
           ELSE -((2 * (-s) + n) // (2 * n)) END ORDER BY dim) AS cv
    FROM sums{t} GROUP BY cluster) u ON u.cluster = p.cluster
)"""
    for t in range(1, iters + 1):
        parts.append(it_tpl.format(t=t, p=t - 1))
    parts.append(
        """, dfin AS (
  SELECT q.vec_id, c.cluster,
    list_sum(list_transform(range(1, len(q.qv) + 1),
      i -> (q.qv[i] - c.cv[i]) * (q.qv[i] - c.cv[i]))) AS dist
  FROM q CROSS JOIN cent"""
        + str(iters)
        + """ c
)
SELECT vec_id, CAST(cluster AS BIGINT) AS cluster,
       CAST(dist AS BIGINT) AS dist
FROM (SELECT vec_id, cluster, dist,
        row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster)
          AS rn
      FROM dfin) WHERE rn = 1"""
    )
    return "".join(parts)


SQL_KMEANS_CLUSTERS = _kmeans_sql()


# ---------------------------------------------------------- similarity

def _query_vectors(sf_dir: str, n: int = 5) -> dict:
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    out = {}
    for r in t.to_pylist():
        if r["vec_id"] < n:
            out[r["vec_id"]] = r["embedding"]
    return out


def q_ann_cosine_topk(sf_dir: str):
    """Brute-force cosine top-10 of 5 broadcast query vectors over the
    candidate set (vec_id >= 5)."""
    queries_ref = ray.put(_query_vectors(sf_dir, 5))
    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(
        lambda t: t.filter(pc.greater_equal(t["vec_id"], pa.scalar(5))),
        batch_format="pyarrow",
    )
    return ann_topk(ds, queries_ref, k=10)


SQL_ANN_TOPK = """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings WHERE vec_id < 5
), c AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
  FROM embeddings WHERE vec_id >= 5
), scored AS (
  SELECT q.query_id, c.vec_id,
         round(list_cosine_similarity(q.qe, c.e), 6) AS sim,
         row_number() OVER (
           PARTITION BY q.query_id
           ORDER BY list_cosine_similarity(q.qe, c.e) DESC, c.vec_id
         ) AS rank
  FROM q CROSS JOIN c
)
SELECT query_id, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM scored WHERE rank <= 10
"""


def _lsh_planes_values(dim: int = 64, n_planes: int = 4, seed: int = 777) -> str:
    """The engine's hyperplanes (same RandomState seed as
    HyperplaneBucketer) inlined as SQL VALUES rows — full repr
    precision so the sign tests agree bit-for-bit."""
    import numpy as np

    planes = np.random.RandomState(seed).standard_normal((dim, n_planes))
    return ", ".join(
        "(" + ", ".join([str(i)] + [repr(float(v)) for v in planes[i]]) + ")"
        for i in range(dim)
    )


# Bucket = sign pattern of the raw (unnormalized) embedding projected
# on the 4 seeded hyperplanes; each query ranks ONLY same-bucket
# candidates — the same pruning the engine's BucketTopK applies.
SQL_LSH_TOPK = f"""
WITH planes(i, p0, p1, p2, p3) AS (VALUES {_lsh_planes_values()}),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
proj AS (
  SELECT vec_id,
    sum(e[i + 1] * p0) AS s0, sum(e[i + 1] * p1) AS s1,
    sum(e[i + 1] * p2) AS s2, sum(e[i + 1] * p3) AS s3
  FROM e, planes GROUP BY vec_id
), buck AS (
  SELECT vec_id,
    (CASE WHEN s0 >= 0 THEN 1 ELSE 0 END)
    + (CASE WHEN s1 >= 0 THEN 2 ELSE 0 END)
    + (CASE WHEN s2 >= 0 THEN 4 ELSE 0 END)
    + (CASE WHEN s3 >= 0 THEN 8 ELSE 0 END) AS bucket
  FROM proj
), q AS (
  SELECT e.vec_id AS query_id, e.e AS qe, b.bucket
  FROM e JOIN buck b ON b.vec_id = e.vec_id WHERE e.vec_id < 5
), c AS (
  SELECT e.vec_id, e.e, b.bucket
  FROM e JOIN buck b ON b.vec_id = e.vec_id WHERE e.vec_id >= 5
), scored AS (
  SELECT q.query_id, c.vec_id,
         round(list_cosine_similarity(q.qe, c.e), 6) AS sim,
         row_number() OVER (
           PARTITION BY q.query_id
           ORDER BY list_cosine_similarity(q.qe, c.e) DESC, c.vec_id
         ) AS rank
  FROM q JOIN c ON c.bucket = q.bucket
)
SELECT query_id, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM scored WHERE rank <= 10
"""


def q_lsh_topk(sf_dir: str):
    """LSH-bucketed approximate variant (scale path). SQL oracle:
    hyperplane constants inlined, bucket = projection sign pattern,
    per-bucket ranked cosine (sim rounded to 6dp like ann_cosine_topk);
    recall vs the brute-force baseline is additionally asserted in
    pytest."""
    qv = _query_vectors(sf_dir, 5)
    dim = len(next(iter(qv.values())))
    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(
        lambda t: t.filter(pc.greater_equal(t["vec_id"], pa.scalar(5))),
        batch_format="pyarrow",
    )
    return lsh_topk(ds, ray.put(qv), dim=dim, k=10, n_planes=4)


# -------------------------------------------------------------- events

def q_events_hourly(sf_dir: str):
    """Tumbling 1-hour window count per user — partial aggregation
    inside map_batches (one row per (user, hour) per batch), then a
    small groupby over the partials (the pre-agg pattern)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = t.to_pandas()
        # normalize to microseconds regardless of the pandas datetime
        # unit (pandas<2 / older pyarrow coerce to ns -> 1000x buckets)
        bucket = (
            df["ts"].astype("datetime64[us]").astype("int64") // 3_600_000_000
        )
        g = (
            df.assign(hour_bucket=bucket)
            .groupby(["user_id", "hour_bucket"], sort=False)
            .size()
            .reset_index(name="n_events")
        )
        g["part"] = ((g["user_id"] + g["hour_bucket"]) & 63).astype(
            "int32"
        )
        return pa.Table.from_pandas(
            g.astype(
                {"user_id": "int64", "hour_bucket": "int64", "n_events": "int64"}
            ),
            preserve_index=False,
        )

    def combine(df):
        return df.groupby(
            ["user_id", "hour_bucket"], sort=False, as_index=False
        )["n_events"].sum()

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(combine, batch_format="pandas")
    )


SQL_EVENTS_HOURLY = """
SELECT user_id,
       epoch_us(ts) // 3600000000 AS hour_bucket,
       CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY 1, 2
"""
# bucket via exact int64 epoch_us // — floor(epoch(ts)/3600) in double
# can flip the bucket within ~0.5 us of an hour boundary. Positive
# operands, so DuckDB's truncating // equals Python floor division.


def q_events_sliding(sf_dir: str):
    """Sliding 1-hour window (15-min slide) count per user: each event
    explodes to its 4 covering windows map-side (partial counts), then
    one small groupby over the partials."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = t.to_pandas()
        slot = df["ts"].astype("datetime64[us]").astype("int64") // (900 * 1_000_000)
        frames = []
        for j in range(4):
            frames.append(
                pd.DataFrame(
                    {"user_id": df["user_id"], "window_start": (slot - j) * 900}
                )
            )
        g = (
            pd.concat(frames)
            .groupby(["user_id", "window_start"], sort=False)
            .size()
            .reset_index(name="n_events")
        )
        # bounded-partition merge key: one vectorized groupby-sum per
        # partition instead of a global multi-key sort-aggregate over
        # every partial row
        g["part"] = ((g["user_id"] + g["window_start"]) & 63).astype(
            "int32"
        )
        return pa.Table.from_pandas(
            g.astype(
                {"user_id": "int64", "window_start": "int64", "n_events": "int64"}
            ),
            preserve_index=False,
        )

    def combine(df):
        return df.groupby(
            ["user_id", "window_start"], sort=False, as_index=False
        )["n_events"].sum()

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(combine, batch_format="pandas")
    )


SQL_EVENTS_SLIDING = """
WITH e AS (
  SELECT user_id, epoch_us(ts) // 900000000 AS slot FROM events
), exploded AS (
  SELECT user_id, slot, unnest(range(0, 4)) AS j FROM e
)
SELECT user_id, CAST((slot - j) * 900 AS BIGINT) AS window_start,
       CAST(count(*) AS BIGINT) AS n_events
FROM exploded GROUP BY 1, 2
"""


# ----------------------------------------------------------- summarize

def q_summarize(sf_dir: str):
    """Centrality top-3 extractive summary per document
    (summarizer_extractive.py semantics, deterministic BoW embedding).
    Scores are computed as exact-int dots -> one-rounding float chain
    -> ordered cumsum, so the DuckDB oracle below reproduces them
    bit-for-bit and checks the SELECTED SENTENCES, not just counts."""
    return _read_documents(sf_dir).map_batches(
        summarize_batch, batch_format="pyarrow"
    )


# Same centrality chain as stages/summarize.py centrality_scores():
# integer dot products via a word-level self-join, cos_ij =
# dot/(sqrt(dii)*sqrt(djj)) (one rounding per op), per-row sum over an
# ORDERED list (list_sum folds left-to-right like the numpy cumsum;
# absent pairs contribute exact +0.0 on the Python side — a no-op).
SQL_SUMMARIZE = f"""
WITH marked AS (
  SELECT doc_id,
    list_filter(
      string_split(
        regexp_replace(
          regexp_replace(regexp_replace(text, '^\\s+', ''), '\\s+$', ''),
          '([.!?])\\s+', '\\1{_US}', 'g'),
        '{_US}'),
      s -> s <> '') AS sents
  FROM documents
), s AS (
  SELECT doc_id, unnest(sents) AS sent,
         generate_subscripts(sents, 1) AS idx, len(sents) AS n
  FROM marked
), counts AS (
  SELECT doc_id, idx, w, count(*) AS c
  FROM (SELECT doc_id, idx,
               unnest(regexp_extract_all(lower(sent), '[a-z0-9]+')) AS w
        FROM s)
  GROUP BY doc_id, idx, w
), norms AS (
  SELECT doc_id, idx, sqrt(CAST(sum(c * c) AS DOUBLE)) AS nrm
  FROM counts GROUP BY doc_id, idx
), dots AS (
  SELECT a.doc_id, a.idx AS i, b.idx AS j,
         CAST(sum(a.c * b.c) AS BIGINT) AS dot
  FROM counts a JOIN counts b
    ON a.doc_id = b.doc_id AND a.w = b.w
  GROUP BY a.doc_id, a.idx, b.idx
), scores AS (
  SELECT d.doc_id, d.i AS idx,
    list_sum(list(CAST(d.dot AS DOUBLE) / (na.nrm * nb.nrm)
                  ORDER BY d.j)) AS score
  FROM dots d
  JOIN norms na ON na.doc_id = d.doc_id AND na.idx = d.i
  JOIN norms nb ON nb.doc_id = d.doc_id AND nb.idx = d.j
  GROUP BY d.doc_id, d.i
), ranked AS (
  SELECT s.doc_id, s.idx, s.sent, s.n,
         COALESCE(sc.score, 0.0) AS score,
         row_number() OVER (
           PARTITION BY s.doc_id
           ORDER BY COALESCE(sc.score, 0.0) DESC, s.idx
         ) AS rnk
  FROM s LEFT JOIN scores sc ON sc.doc_id = s.doc_id AND sc.idx = s.idx
), agg AS (
  SELECT doc_id,
    CASE WHEN any_value(n) <= 3
         THEN string_agg(sent, ' ' ORDER BY idx)
         ELSE string_agg(sent, ' ' ORDER BY score DESC, idx)
              FILTER (WHERE rnk <= 3)
    END AS summary,
    CAST(any_value(n) AS BIGINT) AS n_sentences
  FROM ranked GROUP BY doc_id
)
SELECT d.doc_id, COALESCE(a.summary, '') AS summary,
       COALESCE(a.n_sentences, 0) AS n_sentences
FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
"""


# --------------------------------------- training-corpus prep pipeline

def q_training_corpus(sf_dir: str):
    """C4-style corpus prep, end to end: language gate (marker n-grams)
    -> quality gates -> exact dedup keep-first. All gates use integer
    cross-multiplication (alpha*10 >= chars*6, stop*20 >= words) so the
    SQL oracle is bit-exact — no float ratio thresholds.

    -> (doc_id, md5_hash, n_tokens) of the surviving corpus.
    """
    ds = _read_documents(sf_dir)

    def gate(t: pa.Table) -> pa.Table:
        import re

        from ..functions.hashing import md5_hex
        from ..stages.textstats import LANG_MARKERS

        re_tok = re.compile(r"\S+")
        re_word = re.compile(r"[a-z]+")
        re_alpha = re.compile(r"[A-Za-z]")
        en = frozenset(LANG_MARKERS["en"])
        others = [frozenset(LANG_MARKERS[k]) for k in ("de", "fr", "es")]

        ids, hashes, ntoks = [], [], []
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            toks = re_tok.findall(text)
            words = re_word.findall(text.lower())
            s_en = sum(w in en for w in words)
            if any(sum(w in o for w in words) > s_en for o in others):
                continue  # language gate: en must win every pairwise
            n_alpha = len(re_alpha.findall(text))
            if len(toks) < 50:
                continue  # too short for training
            if n_alpha * 10 < len(text) * 6:
                continue  # alpha ratio < 0.6: likely markup/noise
            ids.append(did)
            hashes.append(md5_hex(text))
            ntoks.append(len(toks))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "md5_hash": pa.array(hashes, pa.string()),
                "n_tokens": pa.array(ntoks, pa.int64()),
            }
        )

    gated = ds.map_batches(gate, batch_format="pyarrow")
    from ray.data.aggregate import Min

    return (
        gated.groupby("md5_hash")
        .aggregate(
            Min("doc_id", alias_name="doc_id"),
            Min("n_tokens", alias_name="n_tokens"),
        )
    )


_MARKER_HITS = {
    lang: f"length(list_filter(regexp_extract_all(lower(text), '[a-z]+'),"
    f" w -> w IN ({', '.join(repr(w) for w in textstats.LANG_MARKERS[lang])})))"
    for lang in ("en", "de", "fr", "es")
}

SQL_TRAINING_CORPUS = f"""
WITH sig AS (
  SELECT doc_id, text,
    length(regexp_extract_all(text, '\\S+')) AS n_tokens,
    length(regexp_extract_all(text, '[A-Za-z]')) AS n_alpha,
    length(text) AS n_chars,
    {_MARKER_HITS['en']} AS s_en,
    {_MARKER_HITS['de']} AS s_de,
    {_MARKER_HITS['fr']} AS s_fr,
    {_MARKER_HITS['es']} AS s_es
  FROM documents
), gated AS (
  SELECT doc_id, md5(text) AS md5_hash, n_tokens
  FROM sig
  WHERE s_en >= s_de AND s_en >= s_fr AND s_en >= s_es
    AND n_tokens >= 50
    AND n_alpha * 10 >= n_chars * 6
)
SELECT md5_hash,
       CAST(min(doc_id) AS BIGINT) AS doc_id,
       CAST(min(n_tokens) AS BIGINT) AS n_tokens
FROM gated GROUP BY md5_hash
"""


# ------------------------------------ pre-aggregated global statistics

def q_doclen_quantiles(sf_dir: str):
    """Exact doc-length quantiles via mergeable histogram partials:
    each batch emits (len, count) rows (domain-bounded), one small
    groupby sums them, quantiles are read off the driver-side CDF.
    The sketch-merge pattern — no global sort."""
    ds = _read_documents(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        import numpy as np

        lens = pc.utf8_length(t["text"]).to_numpy()
        vals, counts = np.unique(lens, return_counts=True)
        return pa.table(
            {
                "len": pa.array(vals, pa.int64()),
                "n": pa.array(counts, pa.int64()),
            }
        )

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("len")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("len")
    )
    import math

    total = int(hist["n"].sum()) if len(hist) else 0
    cum = hist["n"].cumsum()
    qs: list = []
    for q in (0.25, 0.5, 0.75, 0.9, 0.99):
        # quantile_disc rank = ceil(q * n), 1-indexed — probed against
        # DuckDB across n/q grids; floor(q*(n-1))+1 only coincides on
        # some corpus sizes (caught by tests/test_differential.py).
        # Zero-row input yields NULLs, like quantile_disc over no rows.
        if total == 0:
            qs.append(None)
            continue
        target = max(1, math.ceil(q * total))
        qs.append(int(hist.loc[cum >= target, "len"].iloc[0]))
    return pa.table(
        {
            "q": pa.array([0.25, 0.5, 0.75, 0.9, 0.99], pa.float64()),
            "len_quantile": pa.array(qs, pa.int64()),
        }
    )


SQL_DOCLEN_QUANTILES = """
WITH t AS (
  SELECT quantile_disc(length(text), 0.25) AS q25,
         quantile_disc(length(text), 0.5)  AS q50,
         quantile_disc(length(text), 0.75) AS q75,
         quantile_disc(length(text), 0.9)  AS q90,
         quantile_disc(length(text), 0.99) AS q99
  FROM documents
)
SELECT 0.25 AS q, CAST(q25 AS BIGINT) AS len_quantile FROM t
UNION ALL SELECT 0.5,  CAST(q50 AS BIGINT) FROM t
UNION ALL SELECT 0.75, CAST(q75 AS BIGINT) FROM t
UNION ALL SELECT 0.9,  CAST(q90 AS BIGINT) FROM t
UNION ALL SELECT 0.99, CAST(q99 AS BIGINT) FROM t
"""


def q_top_words(sf_dir: str):
    """Global top-20 words: map-side partial counts per batch (the
    pre-agg/combiner pattern), small groupby-sum, sort+limit."""
    ds = _read_documents(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for text in t["text"].to_pylist():
            # split on single spaces exactly like the oracle's
            # string_split(lower(text), ' ') — .split() (any whitespace)
            # diverges on \n/\t-joined tokens
            c.update(w for w in text.lower().split(" ") if w)
        return pa.table(
            {
                "word": pa.array(list(c.keys()), pa.string()),
                "n": pa.array(list(c.values()), pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
        .sort(["n", "word"], descending=[True, False])
        .limit(20)
    )


SQL_TOP_WORDS = """
SELECT word, CAST(count(*) AS BIGINT) AS n
FROM (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
WHERE word <> ''
GROUP BY word ORDER BY n DESC, word ASC LIMIT 20
"""


# ------------------------------------------ relational / stream ops

def q_join_orders_segment(sf_dir: str):
    """orders ⋈ customer (hash-partitioned Dataset.join) → revenue per
    market segment."""
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    customer = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    return relational.orders_by_segment(orders, customer)


SQL_JOIN_ORDERS_SEGMENT = """
SELECT c.c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
"""


def q_revenue_by_region(sf_dir: str):
    """Multi-way join with MIXED strategies (the TPC-H Q5 shape):
    customer⋈nation⋈region collapses into one broadcast custkey→region
    lookup (dimension chain, tiny), applied map-side to orders — the
    only large table never shuffles. Revenue in integer cents."""
    import numpy as np

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"]
    )
    region = pq.read_table(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    )
    n2r = dict(
        zip(nation["n_nationkey"].to_pylist(), nation["n_regionkey"].to_pylist())
    )
    r2n = dict(
        zip(region["r_regionkey"].to_pylist(), region["r_name"].to_pylist())
    )
    custkeys = np.asarray(cust["c_custkey"].to_pylist(), dtype=np.int64)
    order_idx = np.argsort(custkeys, kind="stable")
    sorted_keys = custkeys[order_idx]
    names = [
        r2n[n2r[n]] for n in cust["c_nationkey"].to_pylist()
    ]
    sorted_names = [names[i] for i in order_idx]
    lookup_ref = ray.put((sorted_keys, sorted_names))

    def to_region(t: pa.Table) -> pa.Table:
        import numpy as _np

        from ..functions.broadcast import cached_get

        keys, rnames = cached_get(lookup_ref)
        ck = t["o_custkey"].to_numpy()
        if len(keys) == 0:
            return pa.table(
                {
                    "r_name": pa.array([], pa.string()),
                    "price_cents": pa.array([], pa.int64()),
                }
            )
        pos = _np.searchsorted(keys, ck)
        pos_c = _np.minimum(pos, len(keys) - 1)
        found = keys[pos_c] == ck
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(t["o_totalprice"], pa.scalar(100.0)), pa.scalar(0.5))),
            pa.int64(),
        ).to_numpy()
        sub = _np.nonzero(found)[0]
        return pa.table(
            {
                "r_name": pa.array(
                    [rnames[pos_c[i]] for i in sub], pa.string()
                ),
                "price_cents": pa.array(cents[sub], pa.int64()),
            }
        )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    return (
        orders.map_batches(to_region, batch_format="pyarrow")
        .groupby("r_name")
        .aggregate(
            Count(alias_name="n_orders"),
            Sum("price_cents", alias_name="revenue_cents"),
        )
    )


def q_pricing_summary(sf_dir: str):
    """TPC-H Q1 over lineitem (the largest table): shipped-before
    filter -> per-(returnflag, linestatus) pricing sums — the
    canonical scan-heavy aggregate. Map-side COMBINER (one pyarrow
    C++ group-by per batch) reduces each block to ≤ a few rows before
    the tiny global groupby; money stays in exact integer units
    (cents; disc = cents×(100−d%); charge = that ×(100+t%)) so
    parallel summation is order-independent, and the avg columns are
    derived from the exact sums by one int/int IEEE division each
    (identical to the SQL). Unit magnitudes fit int64 through ~10^10
    rows; beyond that switch the charge column to decimal128."""
    cutoff_us = 904_694_400_000_000  # 1998-09-02 00:00:00 UTC in µs

    def partial(t: pa.Table) -> pa.Table:
        keep = pc.less_equal(
            pc.cast(t["l_shipdate"], pa.int64()), pa.scalar(cutoff_us)
        )
        t = t.filter(keep)
        # floor(x + 0.5), NOT pc.round: pyarrow/np round is
        # half-to-even while DuckDB round() is half-away — they
        # disagree at exact .5 (caught by the lineitem differential
        # fuzz). floor(x+0.5) on the non-negative domain is identical
        # in both engines (the repo-wide cents convention).
        def _half_up(col, scale=None):
            if scale is not None:
                col = pc.multiply(col, pa.scalar(scale))
            return pc.cast(
                pc.floor(pc.add(col, pa.scalar(0.5))), pa.int64()
            )

        qty = _half_up(t["l_quantity"])
        cents = _half_up(t["l_extendedprice"], 100.0)
        dpct = _half_up(t["l_discount"], 100.0)
        tpct = _half_up(t["l_tax"], 100.0)
        disc_units = pc.multiply(cents, pc.subtract(pa.scalar(100), dpct))
        charge_units = pc.multiply(
            disc_units, pc.add(pa.scalar(100), tpct)
        )
        flat = pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty": qty,
                "cents": cents,
                "dpct": dpct,
                "disc_units": disc_units,
                "charge_units": charge_units,
            }
        )
        g = pa.TableGroupBy(
            flat, ["l_returnflag", "l_linestatus"]
        ).aggregate(
            [
                ("qty", "sum"),
                ("cents", "sum"),
                ("dpct", "sum"),
                ("disc_units", "sum"),
                ("charge_units", "sum"),
                ("qty", "count"),
            ]
        )
        # select by NAME ("{col}_{agg}" + key columns) — the key/agg
        # column ORDER of TableGroupBy.aggregate is a pyarrow-version
        # convention, and a positional rename would silently mislabel
        # every aggregate if it changed
        return pa.table(
            {
                "l_returnflag": g["l_returnflag"],
                "l_linestatus": g["l_linestatus"],
                "sum_qty": g["qty_sum"],
                "sum_base_cents": g["cents_sum"],
                "sum_dpct": g["dpct_sum"],
                "sum_disc_units": g["disc_units_sum"],
                "sum_charge_units": g["charge_units_sum"],
                "n": g["qty_count"],
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        n = t["n"]
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "sum_qty": t["sum_qty"],
                "sum_base_cents": t["sum_base_cents"],
                "sum_disc_units": t["sum_disc_units"],
                "sum_charge_units": t["sum_charge_units"],
                "avg_qty": pc.divide(
                    pc.cast(t["sum_qty"], pa.float64()),
                    pc.cast(n, pa.float64()),
                ),
                "avg_price_cents": pc.divide(
                    pc.cast(t["sum_base_cents"], pa.float64()),
                    pc.cast(n, pa.float64()),
                ),
                "avg_disc_pct": pc.divide(
                    pc.cast(t["sum_dpct"], pa.float64()),
                    pc.cast(n, pa.float64()),
                ),
                "count_order": t["n"],
            }
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_shipdate",
        ],
    )
    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_base_cents", alias_name="sum_base_cents"),
            Sum("sum_dpct", alias_name="sum_dpct"),
            Sum("sum_disc_units", alias_name="sum_disc_units"),
            Sum("sum_charge_units", alias_name="sum_charge_units"),
            Sum("n", alias_name="n"),
        )
        .map_batches(finish, batch_format="pyarrow")
    )


def q_parts_no_early_shipment(sf_dir: str):
    """ANTI-join: parts with no lineitem shipped before 1996 — the
    missing-relational-op shape (NOT EXISTS). The matched-key set is
    bounded by |part| regardless of |lineitem|, so it reduces
    map-side (per-batch filter + unique) into a tiny distinct set,
    broadcasts sorted, and the part table filters against it —
    lineitem, the large side, never shuffles."""
    import numpy as np

    shipped = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_shipdate"]
        )
        .map_batches(
            lambda t: pa.table(
                {
                    "l_partkey": pc.unique(
                        t.filter(
                            pc.less(
                                pc.cast(t["l_shipdate"], pa.int64()),
                                pa.scalar(820_454_400_000_000),  # 1996-01-01 µs
                            )
                        )["l_partkey"]
                    )
                }
            ),
            batch_format="pyarrow",
            batch_size=None,
        )
    )
    # per-batch-unique blocks are already bounded by |part|; final
    # dedup happens driver-side (np.unique sorts) — a distributed
    # groupby here would spend a whole shuffle generation to produce
    # the same tiny array
    matched = np.unique(
        np.concatenate(
            [t["l_partkey"].to_numpy() for t in ray.get(shipped.to_arrow_refs())]
            or [np.empty(0, np.int64)]
        )
    )
    matched_ref = ray.put(matched)

    def anti(t: pa.Table) -> pa.Table:
        import numpy as _np

        from ..functions.broadcast import cached_get

        keys = cached_get(matched_ref)
        pk = t["p_partkey"].to_numpy()
        if len(keys) == 0:
            keep = _np.ones(len(pk), dtype=bool)
        else:
            pos = _np.minimum(_np.searchsorted(keys, pk), len(keys) - 1)
            keep = keys[pos] != pk
        sub = t.filter(pa.array(keep, pa.bool_()))
        return sub.select(["p_partkey", "p_name", "p_brand"])

    return ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name", "p_brand"]
    ).map_batches(anti, batch_format="pyarrow")


def q_weighted_avg_discount(sf_dir: str):
    """Price-weighted average discount per returnflag — the weighted
    mean as a RATIO OF EXACT INTEGER SUMS (num = sum cents*disc_bp,
    den = sum cents), combined map-side per batch so only
    flag-grained partials shuffle; the single float division happens
    once per group, identically in both engines, 6-dp rounded."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_extendedprice", "l_discount"],
    )

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(t["l_extendedprice"], pa.scalar(100.0)), pa.scalar(0.5))),
            pa.int64(),
        )
        bp = pc.cast(
            pc.floor(pc.add(pc.multiply(t["l_discount"], pa.scalar(100.0)), pa.scalar(0.5))),
            pa.int64(),
        )
        w = pc.multiply_checked(cents, bp)
        tt = pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "num": w,
                "den": cents,
            }
        )
        g = pa.TableGroupBy(
            tt, "l_returnflag", use_threads=False
        ).aggregate([("num", "sum"), ("den", "sum")])
        return pa.table(
            {
                "l_returnflag": g["l_returnflag"],
                "num": g["num_sum"],
                "den": g["den_sum"],
            }
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(
            Sum("num", alias_name="num"), Sum("den", alias_name="den")
        )
        .to_pandas()
    )
    merged["avg_discount_bp"] = [
        _round6(n / d) if d else None
        for n, d in zip(merged["num"], merged["den"])
    ]
    return merged[["l_returnflag", "avg_discount_bp"]]


# num/den as exact integer sums (cents x basis points); ONE float
# division per group, same expression both sides
SQL_WEIGHTED_AVG_DISCOUNT = """
WITH m AS (
  SELECT l_returnflag,
    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
             * CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS BIGINT)
      AS num,
    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
      AS den
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
  CASE WHEN den <> 0
       THEN round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6)
       ELSE NULL END AS avg_discount_bp
FROM m
"""


def q_lang_vocab_overlap(sf_dir: str):
    """Pairwise vocabulary Jaccard between languages — the
    set-similarity-matrix shape: distinct (lang, word) pairs reduce
    through bounded word-hash partitions; within a partition every
    word contributes to its lang-pair intersection counts (langs are
    few, words are many — the loop is over langs-per-word, never
    words x words); per-lang vocab sizes and pairwise intersections
    merge as tiny integer tables and the Jaccard ratio is ONE float
    division per lang pair, 6-dp rounded."""
    import itertools
    import zlib

    import numpy as np
    import pandas as pd

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "text"]
    )

    def pairs(t: pa.Table) -> pa.Table:
        per: dict[str, set] = {}
        for lang, text in zip(
            t["lang"].to_pylist(), t["text"].to_pylist()
        ):
            per.setdefault(lang, set()).update(
                textstats._RE_WORD.findall(text.lower())
            )
        langs, words, parts = [], [], []
        for lang, ws in per.items():
            for w in ws:
                langs.append(lang)
                words.append(w)
                parts.append(zlib.crc32(w.encode("utf-8")) & 63)
        return pa.table(
            {
                "lang": pa.array(langs, pa.string()),
                "word": pa.array(words, pa.string()),
                "part": pa.array(parts, pa.int32()),
            }
        )

    def overlap_part(df):
        from collections import Counter

        dedup = df.drop_duplicates(["lang", "word"])
        sizes: Counter = Counter(dedup["lang"])
        inter: Counter = Counter()
        for _, grp in dedup.groupby("word", sort=False):
            ls = sorted(grp["lang"])
            if len(ls) > 1:
                inter.update(itertools.combinations(ls, 2))
        rows = [("\x00size", la, "", int(n)) for la, n in sizes.items()]
        rows += [
            ("\x00inter", a, b, int(n)) for (a, b), n in inter.items()
        ]
        return pd.DataFrame(
            rows, columns=["kind", "lang_a", "lang_b", "n"]
        )

    merged = (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("part")
        .map_groups(overlap_part, batch_format="pandas")
        .to_pandas()  # <= 64 x (langs + langs^2) tiny rows
    )
    sizes = (
        merged[merged["kind"] == "\x00size"]
        .groupby("lang_a")["n"]
        .sum()
        .to_dict()
    )
    inter = (
        merged[merged["kind"] == "\x00inter"]
        .groupby(["lang_a", "lang_b"])["n"]
        .sum()
        .to_dict()
    )
    out = []
    for a, b in itertools.combinations(sorted(sizes), 2):
        i = int(inter.get((a, b), 0))
        u = int(sizes[a]) + int(sizes[b]) - i
        out.append(
            {
                "lang_a": a,
                "lang_b": b,
                "n_common": i,
                "jaccard": _round6(i / u) if u else None,
            }
        )
    df = pd.DataFrame(
        out, columns=["lang_a", "lang_b", "n_common", "jaccard"]
    )
    df["n_common"] = df["n_common"].astype("int64")
    return df


SQL_LANG_VOCAB_OVERLAP = r"""
WITH v AS (
  SELECT DISTINCT lang,
         unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
  FROM documents
), sizes AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n FROM v GROUP BY lang
), inter AS (
  SELECT a.lang AS lang_a, b.lang AS lang_b,
         CAST(count(*) AS BIGINT) AS i
  FROM v a JOIN v b ON a.w = b.w AND a.lang < b.lang
  GROUP BY a.lang, b.lang
)
SELECT sa.lang AS lang_a, sb.lang AS lang_b,
  COALESCE(i.i, 0) AS n_common,
  CASE WHEN sa.n + sb.n - COALESCE(i.i, 0) > 0
       THEN round(CAST(COALESCE(i.i, 0) AS DOUBLE)
                  / (sa.n + sb.n - COALESCE(i.i, 0)), 6)
       ELSE NULL END AS jaccard
FROM sizes sa JOIN sizes sb ON sa.lang < sb.lang
LEFT JOIN inter i ON i.lang_a = sa.lang AND i.lang_b = sb.lang
"""


def q_top_word_per_lang(sf_dir: str):
    """Grouped mode: the most frequent word per language (ties ->
    lexicographically smallest). Word counts reduce through bounded
    hash(word) partitions (vectorized per-partition groupby-sum — the
    vocab never meets a global sort-aggregate); the per-lang argmax
    runs over the REDUCED vocab x lang table with one tiny
    groupby(lang)."""
    import zlib

    import pandas as pd

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "text"]
    )

    def partial(t: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for lang, text in zip(
            t["lang"].to_pylist(), t["text"].to_pylist()
        ):
            c.update(
                (lang, w) for w in textstats._RE_WORD.findall(text.lower())
            )
        langs = [k[0] for k in c]
        words = [k[1] for k in c]
        return pa.table(
            {
                "lang": pa.array(langs, pa.string()),
                "word": pa.array(words, pa.string()),
                "n": pa.array(list(c.values()), pa.int64()),
                "part": pa.array(
                    [
                        zlib.crc32(w.encode("utf-8")) & 63
                        for w in words
                    ],
                    pa.int32(),
                ),
            }
        )

    def merge_part(df):
        return df.groupby(
            ["lang", "word"], sort=False, as_index=False
        )["n"].sum()

    def top1(df):
        df = df.sort_values(
            ["n", "word"], ascending=[False, True], kind="mergesort"
        )
        return df.head(1)[["lang", "word", "n"]]

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(merge_part, batch_format="pandas")
        .groupby("lang")
        .map_groups(top1, batch_format="pandas")
    )


SQL_TOP_WORD_PER_LANG = r"""
WITH counts AS (
  SELECT lang, w AS word, CAST(count(*) AS BIGINT) AS n
  FROM (SELECT lang,
          unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
        FROM documents)
  GROUP BY lang, w
)
SELECT lang, word, n FROM (
  SELECT lang, word, n,
    row_number() OVER (PARTITION BY lang ORDER BY n DESC, word) AS rn
  FROM counts)
WHERE rn = 1
"""


def q_supplier_revenue(sf_dir: str):
    """Discounted revenue per supplier: the 10-row supplier table
    broadcasts as a sorted lookup over lineitem (map-side enrich, no
    shuffle of the big side), then a tiny groupby. Exact integer
    units: cents×(100−disc%)."""
    import numpy as np

    sup = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    )
    keys = np.asarray(sup["s_suppkey"].to_pylist(), dtype=np.int64)
    order = np.argsort(keys, kind="stable")
    names = sup["s_name"].to_pylist()
    lookup_ref = ray.put((keys[order], [names[i] for i in order]))

    def enrich(t: pa.Table) -> pa.Table:
        import numpy as _np

        from ..functions.broadcast import cached_get

        skeys, snames = cached_get(lookup_ref)
        sk = t["l_suppkey"].to_numpy()
        if len(skeys) == 0:
            return pa.table(
                {
                    "s_name": pa.array([], pa.string()),
                    "disc_units": pa.array([], pa.int64()),
                }
            )
        pos = _np.minimum(_np.searchsorted(skeys, sk), len(skeys) - 1)
        found = skeys[pos] == sk
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(t["l_extendedprice"], pa.scalar(100.0)), pa.scalar(0.5))),
            pa.int64(),
        )
        dpct = pc.cast(
            pc.floor(pc.add(pc.multiply(t["l_discount"], pa.scalar(100.0)), pa.scalar(0.5))),
            pa.int64(),
        )
        units = pc.multiply(cents, pc.subtract(pa.scalar(100), dpct)).to_numpy()
        sub = _np.nonzero(found)[0]
        return pa.table(
            {
                "s_name": pa.array([snames[pos[i]] for i in sub], pa.string()),
                "disc_units": pa.array(units[sub], pa.int64()),
            }
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_suppkey", "l_extendedprice", "l_discount"],
        )
        .map_batches(enrich, batch_format="pyarrow", batch_size=None)
        .groupby("s_name")
        .aggregate(
            Count(alias_name="n_items"),
            Sum("disc_units", alias_name="revenue_units"),
        )
    )


SQL_SUPPLIER_REVENUE = """
SELECT s.s_name,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                * (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT)))
            AS BIGINT) AS revenue_units
FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
GROUP BY s.s_name
"""


SQL_PARTS_NO_EARLY_SHIPMENT = """
SELECT p.p_partkey, p.p_name, p.p_brand
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_partkey = p.p_partkey
    AND l.l_shipdate < TIMESTAMP '1996-01-01'
)
"""


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
  CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty,
  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
    AS sum_base_cents,
  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
           * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) AS BIGINT)
    AS sum_disc_units,
  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
           * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
           * (100 + CAST(floor(l_tax * 100 + 0.5) AS BIGINT))) AS BIGINT)
    AS sum_charge_units,
  sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) / count(*) AS avg_qty,
  sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) / count(*)
    AS avg_price_cents,
  sum(CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) / count(*) AS avg_disc_pct,
  CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


SQL_REVENUE_BY_REGION = """
SELECT r.r_name,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
"""


def q_join_orders_segment_bcast(sf_dir: str):
    """Same join, broadcast strategy: customer is the small side, so
    ship it once via ray.put and merge per batch — no shuffle. Same
    oracle as the partitioned variant; bench shows the strategy gap."""
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    seg_ref = ray.put(
        dict(
            zip(
                cust["c_custkey"].to_pylist(),
                cust["c_mktsegment"].to_pylist(),
            )
        )
    )

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        seg = ray.get(seg_ref)
        df = t.to_pandas()
        df["c_mktsegment"] = df["o_custkey"].map(seg)
        df["price_cents"] = (df["o_totalprice"] * 100).round().astype("int64")
        g = df.groupby("c_mktsegment", sort=False).agg(
            n_orders=("o_custkey", "size"), revenue_cents=("price_cents", "sum")
        )
        return pa.table(
            {
                "c_mktsegment": pa.array(g.index, pa.string()),
                "n_orders": pa.array(g["n_orders"], pa.int64()),
                "revenue_cents": pa.array(g["revenue_cents"], pa.int64()),
            }
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(
            Sum("n_orders", alias_name="n_orders"),
            Sum("revenue_cents", alias_name="revenue_cents"),
        )
    )


def q_events_sessionize(sf_dir: str):
    """Session windows (30-min gap) per user."""
    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )
    return relational.sessionize(events)


SQL_EVENTS_SESSIONIZE = """
WITH x AS (
  SELECT user_id, event_id, ts,
    CASE WHEN lag(ts) OVER w IS NULL
           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
         THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), y AS (
  SELECT user_id, ts,
    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) - 1 AS session_id
  FROM x
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       CAST(count(*) AS BIGINT) AS n_events,
       min(ts) AS start_ts, max(ts) AS end_ts
FROM y GROUP BY user_id, session_id
"""


def q_events_asof_orders(sf_dir: str):
    """As-of join: each event annotated with the user's most recent
    order date at event time (broadcast small side + searchsorted)."""
    orders_tbl = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    )
    lookup_ref = ray.put(relational.make_asof_lookup(orders_tbl))
    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )
    return events.map_batches(
        relational.make_asof_join(lookup_ref),
        batch_format="pyarrow",
        batch_size=8192,
    )


SQL_EVENTS_ASOF_ORDERS = """
SELECT e.event_id, e.user_id, e.ts, o.o_orderdate AS last_order_date
FROM events e
ASOF LEFT JOIN orders o
  ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
"""


def q_pagerank(sf_dir: str):
    """PageRank (Brin & Page 1998; 3 integer-exact iterations) over
    the symmetric
    customer–supplier co-occurrence graph (an edge wherever a customer
    order contains a supplier's lineitem; node ids parity-encoded
    2*cust / 2*supp+1). Edge build: broadcast the orders orderkey ->
    custkey lookup, probe lineitem map-side (no shuffle join), dedup
    edges with one multi-key groupby; then the streaming-edges /
    broadcast-nodes iteration of relational.pagerank."""
    import numpy as np

    orders_tbl = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    okeys = orders_tbl["o_orderkey"].to_numpy()
    order = np.argsort(okeys)
    lookup_ref = ray.put(
        (okeys[order], orders_tbl["o_custkey"].to_numpy()[order])
    )

    def edge_pairs(batch: pa.Table) -> pa.Table:
        okeys_s, custs = ray.get(lookup_ref)
        lk = batch["l_orderkey"].to_numpy()
        sk = batch["l_suppkey"].to_numpy()
        cust = custs[np.searchsorted(okeys_s, lk)]
        a = 2 * cust
        b = 2 * sk + 1
        if a.size and (a.max() >= 1 << 31 or b.max() >= 1 << 31):
            # 1 << 31, not 1 << 32: (src << 32) must stay positive in
            # int64 or the unpack's arithmetic shift sign-extends
            raise ValueError("node id overflows the packed edge key")
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
        # pack the pair into ONE int64 key, combine per batch with
        # np.unique, and hash-partition into 64 bounded groups — the
        # dedup is then one vectorized np.unique per partition instead
        # of a sort-aggregate over every pair row (measured 10.5 s ->
        # 1.3 s at sf0.1; the repo's standard bounded-partition shape)
        packed = np.unique((src << 32) | dst)
        return pa.table(
            {
                "e": pa.array(packed, pa.int64()),
                "part": pa.array(
                    (packed & 63).astype(np.int32), pa.int32()
                ),
            }
        )

    def uniq_part(df):
        import pandas as pd

        e = np.unique(df["e"].to_numpy())
        return pd.DataFrame({"src": e >> 32, "dst": e & 0xFFFFFFFF})

    edges = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_suppkey"],
        )
        .map_batches(edge_pairs, batch_format="pyarrow")
        .groupby("part")
        .map_groups(uniq_part, batch_format="pandas")
    )
    return relational.pagerank(edges)


SQL_PAGERANK = """
WITH eds AS (
  SELECT DISTINCT 2 * o.o_custkey AS src, 2 * l.l_suppkey + 1 AS dst
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
), edges AS (
  SELECT src, dst FROM eds UNION SELECT dst, src FROM eds
), deg AS (
  SELECT src AS node, count(*) AS outdeg FROM edges GROUP BY src
), r0 AS (
  SELECT node, 1000000 AS rank, outdeg FROM deg
), f1 AS (
  SELECT e.dst AS node, sum(r.rank // r.outdeg) AS inflow
  FROM edges e JOIN r0 r ON r.node = e.src GROUP BY e.dst
), r1 AS (
  SELECT d.node, 150000 + (85 * COALESCE(f.inflow, 0)) // 100 AS rank,
         d.outdeg
  FROM deg d LEFT JOIN f1 f ON f.node = d.node
), f2 AS (
  SELECT e.dst AS node, sum(r.rank // r.outdeg) AS inflow
  FROM edges e JOIN r1 r ON r.node = e.src GROUP BY e.dst
), r2 AS (
  SELECT d.node, 150000 + (85 * COALESCE(f.inflow, 0)) // 100 AS rank,
         d.outdeg
  FROM deg d LEFT JOIN f2 f ON f.node = d.node
), f3 AS (
  SELECT e.dst AS node, sum(r.rank // r.outdeg) AS inflow
  FROM edges e JOIN r2 r ON r.node = e.src GROUP BY e.dst
), r3 AS (
  SELECT d.node, 150000 + (85 * COALESCE(f.inflow, 0)) // 100 AS rank,
         d.outdeg
  FROM deg d LEFT JOIN f3 f ON f.node = d.node
)
SELECT CAST(node AS BIGINT) AS node, CAST(rank AS BIGINT) AS rank
FROM r3
"""


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_events_rolling_sum(sf_dir: str):
    """Bounded window frame (ROWS BETWEEN 2 PRECEDING AND CURRENT):
    trailing-3-event spend per user — the frame variant of the
    cumulative window, same bounded user-hash partitions, computed as
    one cumsum minus its 3-shifted self within user runs. Exact
    integer cents, so the frame sum is order-proof."""
    import numpy as np
    import pandas as pd

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "value"],
    )

    def roll(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values(
            ["user_id", "ts", "event_id"], kind="mergesort"
        )
        uid = df["user_id"].to_numpy()
        cents = np.floor(
            df["value"].to_numpy() * 100.0 + 0.5
        ).astype("int64")
        n = len(df)
        if n == 0:
            return pd.DataFrame(
                {
                    "event_id": pd.array([], "int64"),
                    "rolling_cents": pd.array([], "int64"),
                }
            )
        csum = np.cumsum(cents)
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = uid[1:] != uid[:-1]
        starts = np.flatnonzero(new_user)
        run_start = starts[np.cumsum(new_user) - 1]
        pos = np.arange(n)
        # frame start = max(run_start, pos - 2); sum = csum[pos] -
        # csum[frame_start - 1] (0 before the run)
        fs = np.maximum(run_start, pos - 2)
        prev = np.where(fs > 0, csum[np.maximum(fs - 1, 0)], 0)
        prev[fs == 0] = 0
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(),
                "rolling_cents": csum - prev,
            }
        )

    return (
        events.map_batches(relational.add_user_part, batch_format="pyarrow")
        .groupby("user_part")
        .map_groups(roll, batch_format="pandas")
    )


SQL_EVENTS_ROLLING_SUM = """
SELECT event_id,
  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
       OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    AS BIGINT) AS rolling_cents
FROM events
"""


def q_events_time_delta(sf_dir: str):
    """lead/lag window: microseconds since the user's previous event
    (NULL for the first) — one vectorized diff over sorted user runs
    inside bounded partitions."""
    import numpy as np
    import pandas as pd

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )

    def delta(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values(
            ["user_id", "ts", "event_id"], kind="mergesort"
        )
        uid = df["user_id"].to_numpy()
        ts_us = (
            df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        )
        n = len(df)
        out = np.zeros(n, dtype="int64")
        first = np.empty(n, dtype=bool)
        if n:
            first[0] = True
            first[1:] = uid[1:] != uid[:-1]
            out[1:] = ts_us[1:] - ts_us[:-1]
        # Arrow int64-with-nulls, NOT pandas masked "Int64": the
        # extension dtype canonicalizes differently from the oracle's
        # nullable BIGINT under the driver's hash compare (the one red
        # row in CORRECTNESS_r03) — and the Arrow path is vectorized.
        return pa.table(
            {
                "event_id": pa.array(
                    df["event_id"].to_numpy(), pa.int64()
                ),
                "delta_us": pa.array(out, pa.int64(), mask=first),
            }
        )

    return (
        events.map_batches(relational.add_user_part, batch_format="pyarrow")
        .groupby("user_part")
        .map_groups(delta, batch_format="pandas")
    )


SQL_EVENTS_TIME_DELTA = """
SELECT event_id,
  CAST(epoch_us(ts) - lag(epoch_us(ts))
         OVER (PARTITION BY user_id ORDER BY ts, event_id)
    AS BIGINT) AS delta_us
FROM events
"""


def q_events_gap_fill(sf_dir: str):
    """Dense time-grid materialization (gap filling): per-user hourly
    counts over the corpus's FULL hour span, zeros included — the
    resample-to-regular-grid shape. Hour counts pre-aggregate
    map-side; the global [lo, hi] span is one tiny min/max; the dense
    grid materializes INSIDE bounded user-hash partitions (vectorized
    repeat/tile + indexed scatter — never a driver-side loop, never a
    users x hours shuffle: only the sparse counts move."""
    import numpy as np
    import pandas as pd

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        bucket = (
            df["ts"].astype("datetime64[us]").astype("int64")
            // 3_600_000_000
        )
        g = (
            df.assign(hour_bucket=bucket)
            .groupby(["user_id", "hour_bucket"], sort=False)
            .size()
            .reset_index(name="n_events")
        )
        g["part"] = (g["user_id"] & 63).astype("int32")
        return pa.Table.from_pandas(
            g.astype(
                {
                    "user_id": "int64",
                    "hour_bucket": "int64",
                    "n_events": "int64",
                }
            ),
            preserve_index=False,
        )

    sparse = ds.map_batches(partial, batch_format="pyarrow").materialize()
    bounds = sparse.aggregate(
        Min("hour_bucket", alias_name="lo"),
        Max("hour_bucket", alias_name="hi"),
    )
    if bounds["lo"] is None:
        return pd.DataFrame(
            {
                "user_id": pd.array([], "int64"),
                "hour_bucket": pd.array([], "int64"),
                "n_events": pd.array([], "int64"),
            }
        )
    lo, hi = int(bounds["lo"]), int(bounds["hi"])
    span = hi - lo + 1

    def fill(df):
        g = df.groupby(
            ["user_id", "hour_bucket"], sort=False, as_index=False
        )["n_events"].sum()
        users = np.sort(g["user_id"].unique())
        idx = {int(u): i for i, u in enumerate(users)}
        dense = np.zeros(len(users) * span, dtype=np.int64)
        pos = (
            g["user_id"].map(idx).to_numpy() * span
            + (g["hour_bucket"].to_numpy() - lo)
        )
        dense[pos] = g["n_events"].to_numpy()
        return pd.DataFrame(
            {
                "user_id": np.repeat(users, span),
                "hour_bucket": np.tile(
                    np.arange(lo, hi + 1, dtype=np.int64), len(users)
                ),
                "n_events": dense,
            }
        )

    return sparse.groupby("part").map_groups(fill, batch_format="pandas")


SQL_EVENTS_GAP_FILL = """
WITH c AS (
  SELECT user_id, epoch_us(ts) // 3600000000 AS h,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
), b AS (
  SELECT min(h) AS lo, max(h) AS hi FROM c
), grid AS (
  SELECT u.user_id, unnest(range(b.lo, b.hi + 1)) AS h
  FROM (SELECT DISTINCT user_id FROM events) u CROSS JOIN b
)
SELECT g.user_id, g.h AS hour_bucket,
       CAST(COALESCE(c.n, 0) AS BIGINT) AS n_events
FROM grid g LEFT JOIN c ON c.user_id = g.user_id AND c.h = g.h
"""


def q_events_pivot(sf_dir: str):
    """Pivot: one row per user, one count column per event type (the
    wide-format features table a trainer consumes). Map-side partial
    (user, type) counts pivot to the fixed column set inside each
    batch; bounded user-hash partitions merge with one vectorized
    groupby-sum each — the pivoted width is the known type vocabulary,
    so no dynamic-schema machinery is needed."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )

    def partial(df):
        wide = (
            df.groupby(["user_id", "event_type"], sort=False)
            .size()
            .unstack(fill_value=0)
            .reindex(columns=list(_EVENT_TYPES), fill_value=0)
            .reset_index()
        )
        wide.columns = ["user_id"] + [f"n_{t}" for t in _EVENT_TYPES]
        wide["part"] = (wide["user_id"] & 63).astype("int32")
        return wide

    cols = [f"n_{t}" for t in _EVENT_TYPES]

    def combine(df):
        out = df.groupby("user_id", sort=False, as_index=False)[
            cols
        ].sum()
        for c in cols:
            out[c] = out[c].astype("int64")
        return out

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("part")
        .map_groups(combine, batch_format="pandas")
    )


SQL_EVENTS_PIVOT = """
SELECT user_id,
  CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_click,
  CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS n_error,
  CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
    AS n_purchase,
  CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS n_signup,
  CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS n_view
FROM events GROUP BY user_id
"""


def q_events_running_total(sf_dir: str):
    """Window function: per-event cumulative spend per user
    (SUM OVER (PARTITION BY user ORDER BY ts, event_id)) — bounded
    user-hash partitions, one vectorized cumsum per partition."""
    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "value"],
    )
    return relational.running_total(events)


SQL_EVENTS_RUNNING_TOTAL = """
SELECT event_id, user_id,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts, event_id)
         AS BIGINT) AS running_cents
FROM events
"""


def q_events_range_join(sf_dir: str):
    """Range (interval) join: every event attributed to each SIGNUP
    event of the same user whose 1-hour post-signup window contains
    it, aggregated per signup. Broadcast CSR + two searchsorted probes
    per event (an event can fall in SEVERAL overlapping signup
    windows — the expansion is vectorized), batch-combined partials,
    one small groupby. The no-shuffle shape for a large-probe x
    broadcastable-anchor interval join; at 100 TB the anchor side
    (one event type) broadcasts once via ``ray.put`` and only
    anchor-grained partials move — a large x large interval join
    would time-bucket both sides instead."""
    anchors = pq.read_table(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"],
        filters=[("event_type", "=", "signup")],
    )
    lookup_ref = ray.put(
        relational.make_range_lookup(
            anchors["user_id"].to_numpy(),
            anchors["ts"].cast(pa.int64()).to_numpy(),
            anchors["event_id"].to_numpy(),
        )
    )
    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
    )
    return (
        events.map_batches(
            relational.make_range_join_partials(lookup_ref),
            batch_format="pyarrow",
            batch_size=8192,
        )
        .groupby("anchor_id")
        .aggregate(
            Sum("n_follow", alias_name="n_follow"),
            Sum("value_cents", alias_name="value_cents"),
        )
    )


SQL_EVENTS_RANGE_JOIN = """
SELECT a.event_id AS anchor_id,
       CAST(count(*) AS BIGINT) AS n_follow,
       CAST(sum(CAST(floor(e.value * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS value_cents
FROM events a
JOIN events e
  ON e.user_id = a.user_id
 AND e.ts >= a.ts
 AND e.ts < a.ts + INTERVAL 1 HOUR
WHERE a.event_type = 'signup'
GROUP BY a.event_id
"""


def q_dup_clusters(sf_dir: str):
    """Near-dup clusters: verified MinHash pairs -> connected
    components (doc_id, cluster_id) via distributed min-label
    propagation — no ``take_all()``/driver state anywhere on the path
    (driver union-find remains the pytest oracle,
    tests/test_relational.py). SQL oracle: recursive reachability
    closure over the inlined MinHash pair SQL."""
    pairs_ds = q_minhash_near_dups(sf_dir).map_batches(
        lambda t: t.select(["doc_a", "doc_b"]), batch_format="pyarrow"
    )
    return relational.cluster_pairs_distributed(pairs_ds)


# Connected components as a recursive reachability closure over the
# verified-pair edge set (the full MinHash oracle is inlined as the
# edge source); cluster_id = min reachable node, the engine's label.
SQL_DUP_CLUSTERS = f"""
WITH RECURSIVE pairs AS ({SQL_MINHASH_NEAR_DUPS}),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs
), reach(node, label) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node
)
SELECT CAST(node AS BIGINT) AS doc_id, CAST(min(label) AS BIGINT) AS cluster_id
FROM reach GROUP BY node
"""


# --------------------------------------------- chunker / sort / limit

def q_chunk_pages(sf_dir: str):
    """Reference page chunker (chunk_pages(pages, 5) —
    core_document_processing.py:196-199) + chunk-level join with the
    '\\n\\n---\\n\\n' separator (A2, :280). One row per (doc, chunk)."""

    def fn(t: pa.Table) -> pa.Table:
        doc_ids, chunk_ids, chunk_texts = [], [], []
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            pages = paginate(text, WORDS_PER_PAGE)
            for c in range(0, len(pages), 5):
                doc_ids.append(did)
                chunk_ids.append(c // 5)
                chunk_texts.append("\n\n---\n\n".join(pages[c : c + 5]))
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "chunk_id": pa.array(chunk_ids, pa.int64()),
                "chunk_text": pa.array(chunk_texts, pa.string()),
            }
        )

    return _read_documents(sf_dir).map_batches(fn, batch_format="pyarrow")


SQL_CHUNK_PAGES = _SQL_PAGES_CTE + """
SELECT doc_id,
  CAST(pno // 5 AS BIGINT) AS chunk_id,
  string_agg(ptext, chr(10) || chr(10) || '---' || chr(10) || chr(10)
             ORDER BY pno) AS chunk_text
FROM pages GROUP BY doc_id, pno // 5
"""


def q_longest_docs(sf_dir: str):
    """Global sort + limit (O2's global top-k shape): 20 longest docs."""
    ds = _read_documents(sf_dir)

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars": pc.cast(
                    pc.utf8_length(t["text"]), pa.int64()
                ),
            }
        )

    return (
        ds.map_batches(project, batch_format="pyarrow")
        .sort(["n_chars", "doc_id"], descending=[True, False])
        .limit(20)
    )


SQL_LONGEST_DOCS = """
SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars
FROM documents ORDER BY n_chars DESC, doc_id ASC LIMIT 20
"""


def q_size_class_counts(sf_dir: str):
    """Grouped metrics by payload size class (skew bucketing evidence).
    The SQL oracle reconstructs every payload's EXACT byte length from
    documents.text alone — HTML templates rebuilt as strings, PDF
    container arithmetic (object wrappers, xref, trailer, per-line
    content-stream ops) mirrored term by term, zlib streams at stored-
    block level 0 so Flate lengths are the closed form
    len + 11 + 5*(len // 65535) (pdfgen.ZLIB_LEVEL)."""
    docs = synthesize_docs(sf_dir)
    ds = docs.map_batches(
        make_sniffer(DEFAULT_CONFIG), batch_format="pyarrow", batch_size=None
    )
    return ds.groupby("size_class").aggregate(
        Count(alias_name="n_docs"), Sum("n_bytes", alias_name="total_bytes")
    )


def _size_oracle_sql() -> str:
    """SQL_SIZE_CLASS_COUNTS body: per-doc payload byte lengths
    reconstructed from documents.text alone, then bucketed and grouped.

    HTML classes rebuild the escaped text and add template constants;
    PDF classes mirror build_pdf's container arithmetic exactly —
    per-line content-stream op lengths (split/TJ/simple by line parity
    and word count), stored-block zlib framing (len + 11 + 5*(len //
    65535)), object wrappers, kids list, xref rows, trailer — every
    constant measured from the live templates in
    _size_oracle_constants(). The stale re-crawl rows of cls 2 are
    included like synthesize_batch emits them."""
    c = _size_oracle_constants()
    cfg = DEFAULT_CONFIG
    wpp, wpl = c["WORDS_PER_PAGE"], c["WORDS_PER_LINE"]
    return f"""
WITH base AS (
  SELECT doc_id, text, doc_id % 10 AS cls FROM documents
), esc AS (
  SELECT doc_id, cls,
    strlen(replace(replace(replace(replace(replace(t,
      '&','&amp;'), '<','&lt;'), '>','&gt;'), '"','&quot;'),
      chr(39), '&#x27;')) AS esc_len,
    length(CAST(doc_id AS VARCHAR)) AS idd
  FROM (
    SELECT doc_id, cls, text AS t FROM base WHERE cls <= 5
    UNION ALL
    SELECT doc_id, cls, 'stale draft of ' || text FROM base WHERE cls = 2
  )
), html_bytes AS (
  SELECT doc_id,
    CAST(CASE WHEN cls <= 2 THEN {c['HTML_SIMPLE_BASE']} + idd + esc_len
              WHEN cls <= 4 THEN {c['HTML_BOILER_BASE']} + idd + esc_len
              ELSE {c['HTML_MALFORMED_BASE']} + esc_len END AS BIGINT)
      AS n_bytes
  FROM esc
), junk_bytes AS (
  SELECT doc_id, CAST({c['JUNK_LEN']} AS BIGINT) AS n_bytes
  FROM base WHERE cls = 9
), pdocs AS (
  SELECT doc_id, cls, string_split(text, ' ') AS w, len(string_split(text, ' ')) AS nw
  FROM base WHERE cls IN (6, 7, 8)
), pp AS (
  SELECT doc_id, cls, nw, w,
    unnest(range(0, (nw + {wpp - 1}) // {wpp})) AS p
  FROM pdocs
), pages AS (
  SELECT doc_id, cls, p,
    array_to_string(
      list_slice(w, p * {wpp} + 1, least((p + 1) * {wpp}, nw)), ' ') AS ptext
  FROM pp
), pinfo AS (
  SELECT doc_id, cls, p, strlen(ptext) AS pb,
    strlen(ptext) + length(regexp_extract_all(ptext, '[\\\\()]')) AS eb,
    CASE WHEN ptext = '' THEN 0
         ELSE len(string_split(ptext, ' ')) END AS npw
  FROM pages
), ptl AS (
  SELECT doc_id, cls, p, pb,
    CASE WHEN npw = 0 THEN 0 ELSE (npw + {wpl - 1}) // {wpl} END AS nlines,
    npw, eb
  FROM pinfo
), pops AS (
  -- per-page text-layer length from line structure: f full lines of
  -- {wpl} words (even index -> split pair, odd -> TJ), last line by
  -- its own parity/word count; sum of escaped line bytes telescopes
  -- to eb - (nlines - 1)
  SELECT doc_id, cls, p, pb, nlines,
    CASE WHEN npw = 0 THEN {c['TL_EMPTY']}
         ELSE {c['TL_FIXED']}
           + {c['OP_SPLIT']} * ((nlines - 1 + 1) // 2)
           + {c['OP_TJ']} * ((nlines - 1) // 2)
           + CASE WHEN (nlines - 1) % 2 = 0
                  THEN CASE WHEN npw - {wpl} * (nlines - 1) >= 4
                            THEN {c['OP_SPLIT']} ELSE {c['OP_SIMPLE']} END
                  ELSE CASE WHEN npw - {wpl} * (nlines - 1) >= 2
                            THEN {c['OP_TJ']} ELSE {c['OP_SIMPLE']} END END
           + (eb - (nlines - 1))
           + (3 + 2 * ((nlines - 1 + 1) // 2) + ((nlines - 1) // 2)
              + CASE WHEN (nlines - 1) % 2 = 0
                          AND npw - {wpl} * (nlines - 1) >= 4
                     THEN 2 ELSE 1 END) - 1
         END AS tl_len
  FROM ptl
), pstreams AS (
  SELECT doc_id, cls, p, pb, tl_len,
    CASE WHEN cls = 8 THEN {c['IMG_OPS']}
         ELSE tl_len + 1 + {c['IMG_OPS']} END AS L
  FROM pops
), pobjs AS (
  SELECT doc_id, cls, p,
    4 + 3 * p AS pid,
    CASE WHEN cls = 7
         THEN {c['FLATE_STREAM_BASE']}
              + length(CAST(L + 11 + 5 * (L // 65535) AS VARCHAR))
              + L + 11 + 5 * (L // 65535)
         ELSE {c['RAW_STREAM_BASE']} + length(CAST(L AS VARCHAR)) + L
    END AS content_obj,
    {c['IMG_OBJ_BASE']}
      + length(CAST({c['OCR_MAGIC']} + pb + 11
                    + 5 * (({c['OCR_MAGIC']} + pb) // 65535) AS VARCHAR))
      + {c['OCR_MAGIC']} + pb + 11 + 5 * (({c['OCR_MAGIC']} + pb) // 65535)
      AS img_obj,
    {c['PAGE_OBJ_BASE']}
      + length(CAST(4 + 3 * p + 1 AS VARCHAR))
      + length(CAST(4 + 3 * p + 2 AS VARCHAR)) AS page_obj
  FROM pstreams
), pdoc AS (
  SELECT doc_id,
    count(*) AS n_pages,
    sum(page_obj + content_obj + img_obj
        + 3 * ({c['WRAP_PRE']} + {c['WRAP_POST']})
        + length(CAST(pid AS VARCHAR)) + length(CAST(pid + 1 AS VARCHAR))
        + length(CAST(pid + 2 AS VARCHAR))) AS pages_bytes,
    sum({c['KID_BASE']} + length(CAST(pid AS VARCHAR))) AS kids_refs
  FROM pobjs GROUP BY doc_id
), pdf_bytes AS (
  SELECT doc_id,
    CAST(
      {c['HEADER']}
      + 3 * ({c['WRAP_PRE']} + {c['WRAP_POST']} + 1)
      + {c['OBJ1']} + {c['OBJ3']}
      + {c['OBJ2_BASE']} + kids_refs + (n_pages - 1)
        + length(CAST(n_pages AS VARCHAR))
      + pages_bytes
      + {c['XREF_BASE']} + length(CAST(4 + 3 * n_pages AS VARCHAR))
      + {c['XREF_ROW']} * (4 + 3 * n_pages)
      + {c['TRAILER_BASE']} + length(CAST(4 + 3 * n_pages AS VARCHAR))
      + length(CAST(
          {c['HEADER']} + 3 * ({c['WRAP_PRE']} + {c['WRAP_POST']} + 1)
          + {c['OBJ1']} + {c['OBJ3']}
          + {c['OBJ2_BASE']} + kids_refs + (n_pages - 1)
          + length(CAST(n_pages AS VARCHAR))
          + pages_bytes AS VARCHAR))
    AS BIGINT) AS n_bytes
  FROM pdoc
), all_bytes AS (
  SELECT n_bytes FROM html_bytes
  UNION ALL SELECT n_bytes FROM junk_bytes
  UNION ALL SELECT n_bytes FROM pdf_bytes
)
SELECT
  CASE WHEN n_bytes < {cfg.size_small} THEN 's'
       WHEN n_bytes < {cfg.size_medium} THEN 'm'
       WHEN n_bytes < {cfg.size_large} THEN 'l'
       ELSE 'xl' END AS size_class,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n_bytes) AS BIGINT) AS total_bytes
FROM all_bytes GROUP BY 1
"""


def _size_oracle_constants() -> dict:
    """Every fixed byte count in SQL_SIZE_CLASS_COUNTS, derived from
    the ACTUAL synth/pdfgen templates at import time — the oracle can't
    drift from the generators. Digit-bearing fields are measured with
    known-width placeholders and the placeholder widths subtracted."""
    from .. import pdfgen
    from ..sources import synth

    c: dict[str, int] = {}
    # --- html/junk ---
    c["HTML_SIMPLE_BASE"] = len(synth.make_html_simple(1, "")) - 1
    c["HTML_BOILER_BASE"] = len(synth.make_html_boiler(1, "")) - 1
    c["HTML_MALFORMED_BASE"] = len(synth.make_html_malformed(1, ""))
    # malformed template must not embed doc_id (no digit term in SQL)
    assert len(synth.make_html_malformed(1, "")) == len(
        synth.make_html_malformed(123456, "")
    )
    c["JUNK_LEN"] = len(synth.make_junk(0))
    # --- pdf: per-line content-stream op bases (empty escaped text,
    # y always 3 digits: <=8 lines/page at 60 words -> y >= 662) ---
    assert pdfgen.TOP_Y - pdfgen.LEADING * 7 >= 100
    y = pdfgen.TOP_Y
    c["OP_SIMPLE"] = len(f"1 0 0 1 {pdfgen.LEFT_X} {y} Tm () Tj")
    c["OP_SPLIT"] = len(f"1 0 0 1 {pdfgen.MID_X} {y} Tm () Tj") + len(
        f"1 0 0 1 {pdfgen.LEFT_X} {y} Tm () Tj"
    )
    c["OP_TJ"] = len(f"1 0 0 1 {pdfgen.LEFT_X} {y} Tm [() -28 ()] TJ")
    # BT + /F1 12 Tf + ET (joined lengths; separators counted via n_ops)
    c["TL_FIXED"] = len(b"BT") + len(b"/F1 12 Tf") + len(b"ET")
    c["TL_EMPTY"] = len(pdfgen._text_layer_ops(""))
    c["IMG_OPS"] = len(pdfgen._image_ops())
    c["OCR_MAGIC"] = len(pdfgen.OCR_MAGIC)
    # --- pdf: object bodies (digit fields measured with 1-digit
    # placeholders, then subtracted) ---
    c["RAW_STREAM_BASE"] = (
        len(b"<< /Length %d >>\nstream\n" % 0) + len(b"\nendstream") - 1
    )
    c["FLATE_STREAM_BASE"] = (
        len(b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % 0)
        + len(b"\nendstream")
        - 1
    )
    c["IMG_OBJ_BASE"] = (
        len(
            b"<< /Type /XObject /Subtype /Image /Width %d /Height %d "
            b"/ColorSpace /DeviceGray /BitsPerComponent 8 "
            b"/Filter /FlateDecode /Length %d >>\nstream\n"
            % (pdfgen.PAGE_W, pdfgen.PAGE_H, 0)
        )
        + len(b"\nendstream")
        - 1
    )
    page_obj = (
        f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {pdfgen.PAGE_W} "
        f"{pdfgen.PAGE_H}] /Resources << /Font << /F1 3 0 R >> "
        f"/XObject << /Im0 1 0 R >> >> /Contents 1 0 R >>"
    )
    c["PAGE_OBJ_BASE"] = len(page_obj) - 2  # minus cid+iid placeholder digits
    c["OBJ1"] = len(b"<< /Type /Catalog /Pages 2 0 R >>")
    c["OBJ2_BASE"] = len("<< /Type /Pages /Kids [] /Count  >>")
    c["KID_BASE"] = len(" 0 R")  # + digits(pid); ' ' separators via n-1
    c["OBJ3"] = len(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    c["WRAP_PRE"] = len(b" 0 obj\n")  # + digits(num)
    c["WRAP_POST"] = len(b"\nendobj\n")
    c["HEADER"] = len(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    c["XREF_BASE"] = len(b"xref\n0 \n")  # + digits(size)
    c["XREF_ROW"] = len(b"0000000000 65535 f \n")
    c["TRAILER_BASE"] = (
        len(b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n" % (0, 0))
        - 2
    )
    c["WORDS_PER_PAGE"] = WORDS_PER_PAGE
    c["WORDS_PER_LINE"] = pdfgen.WORDS_PER_LINE
    assert pdfgen.ZLIB_LEVEL == 0, "oracle requires stored-block streams"
    return c


SQL_SIZE_CLASS_COUNTS = _size_oracle_sql()


# --------------------------------------------------- sentence pipeline

def q_sentence_split(sf_dir: str):
    """Deterministic sentence splitter (reference: 5_NLP
    sentence_splitter.py fallback). Sentences joined by US char so the
    schema stays flat for the SQL oracle."""

    def fn(t: pa.Table) -> pa.Table:
        n, joined = scalar.sentence_split_batch(t["text"].combine_chunks())
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_sentences": n,
                "sentences": joined,
            }
        )

    return _read_documents(sf_dir).map_batches(fn, batch_format="pyarrow")


# RE2 (DuckDB) has no lookbehind: mark boundaries, then split.
# Edge alignment with the engine's str.strip() semantics (caught by
# tests/test_differential.py): strip ALL leading/trailing whitespace
# (DuckDB trim() removes spaces only, not tabs/newlines) and emit ''
# (not NULL) for sentence-less docs.
SQL_SENTENCE_SPLIT = f"""
WITH marked AS (
  SELECT doc_id,
    list_filter(
      string_split(
        regexp_replace(
          regexp_replace(regexp_replace(text, '^\\s+', ''), '\\s+$', ''),
          '([.!?])\\s+', '\\1{_US}', 'g'),
        '{_US}'),
      s -> s <> '') AS sents
  FROM documents
)
SELECT doc_id,
  CAST(length(sents) AS BIGINT) AS n_sentences,
  coalesce(list_aggregate(sents, 'string_agg', '{_US}'), '') AS sentences
FROM marked
"""


def q_prepare_text(sf_dir: str):
    """normalize ∘ clean ∘ split composition (5_NLP/nlp/prepare.py:7-20)
    — chained map_batches stages fused by the streaming planner."""
    ds = _read_documents(sf_dir)

    def norm(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "text": scalar.normalize_text_batch(
                    t["text"].combine_chunks()
                ),
            }
        )

    def clean(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "text": scalar.clean_text_batch(t["text"].combine_chunks()),
            }
        )

    def split(t: pa.Table) -> pa.Table:
        n, _joined = scalar.sentence_split_batch(t["text"].combine_chunks())
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "clean_text": t["text"],
                "n_sentences": n,
            }
        )

    return (
        ds.map_batches(norm, batch_format="pyarrow")
        .map_batches(clean, batch_format="pyarrow")
        .map_batches(split, batch_format="pyarrow")
    )


_SQL_NORM_EXPR = """
  trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
    lower(text), '-\\s*\\n\\s*', '', 'g'), '\\n\\s*\\n+', chr(10), 'g'),
    '[•◦·▪▶►✓✔~]', '', 'g'), '\\s+', ' ', 'g'))
"""

SQL_PREPARE_TEXT = f"""
WITH n AS (
  SELECT doc_id, {_SQL_NORM_EXPR} AS text FROM documents
), c AS (
  SELECT doc_id,
    trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
         regexp_replace(regexp_replace(text,
      '[^\\x00-\\x7F]+', ' ', 'g'),
      'http\\S+|www\\S+', '', 'g'),
      '\\S+@\\S+', '', 'g'),
      '([!?.,]){{2,}}', '\\1', 'g'),
      '[^a-zA-Z0-9\\s\\.\\?\\!]', ' ', 'g'),
      '\\s+', ' ', 'g')) AS clean_text
  FROM n
)
SELECT doc_id, clean_text,
  CAST(CASE WHEN trim(clean_text) = '' THEN 0
       ELSE length(list_filter(
         string_split(regexp_replace(trim(clean_text),
           '([.!?])\\s+', '\\1{_US}', 'g'), '{_US}'),
         s -> s <> '')) END AS BIGINT) AS n_sentences
FROM c
"""


# ------------------------------------- markdown / slides / blueprints

def q_markdown_structure(sf_dir: str):
    """M16: markdown text -> typed structure rows (heading levels,
    two-level bullets, image-prompt tags, slide assignment). Markdown
    is synthesized deterministically from each document's words so the
    oracle reconstructs the expected parse from the same arithmetic."""
    from ..stages.markdown import markdown_structure_batch

    return _read_documents(sf_dir).map_batches(
        markdown_structure_batch, batch_format="pyarrow"
    )


_SQL_MD_LINES = """
WITH words AS (
  SELECT doc_id,
         unnest(regexp_extract_all(text, '\\S+')) AS word,
         generate_subscripts(regexp_extract_all(text, '\\S+'), 1) AS ord
  FROM documents
), lines AS (
  SELECT doc_id, CAST((ord - 1) // 10 AS BIGINT) AS c,
         string_agg(word, ' ' ORDER BY ord) AS line,
         arg_min(word, ord) AS first_word
  FROM words GROUP BY doc_id, (ord - 1) // 10
)
"""

SQL_MARKDOWN_STRUCTURE = _SQL_MD_LINES + """
, content_rows AS (
  SELECT doc_id,
    CAST(7 * (c // 6) + (c % 6) + 1 AS BIGINT) AS line_no,
    CAST(c // 6 AS BIGINT) AS slide_no,
    CASE c % 6 WHEN 4 THEN 'image'
               WHEN 2 THEN 'bullet' WHEN 5 THEN 'bullet'
               ELSE 'para' END AS kind,
    CAST(CASE c % 6 WHEN 5 THEN 1 ELSE 0 END AS BIGINT) AS level,
    CASE c % 6 WHEN 4 THEN first_word ELSE line END AS content
  FROM lines
), heading_rows AS (
  SELECT doc_id,
    CAST(7 * s AS BIGINT) AS line_no,
    CAST(s AS BIGINT) AS slide_no,
    'h' || CAST(s % 3 + 1 AS VARCHAR) AS kind,
    CAST(s % 3 + 1 AS BIGINT) AS level,
    'Section ' || CAST(s + 1 AS VARCHAR) AS content
  FROM (SELECT DISTINCT doc_id, c // 6 AS s FROM lines)
)
SELECT * FROM content_rows UNION ALL SELECT * FROM heading_rows
"""


def q_slide_windows(sf_dir: str):
    """O3: fixed 12-line slide windows over the document's plain lines
    (gemini_processing.py:95-108; trailing partial kept, title
    'Content')."""
    from ..stages.markdown import slide_windows_batch

    return _read_documents(sf_dir).map_batches(
        slide_windows_batch, batch_format="pyarrow"
    )


SQL_SLIDE_WINDOWS = _SQL_MD_LINES + """
SELECT doc_id,
  CAST(c // 12 AS BIGINT) AS slide_no,
  'Content' AS title,
  CAST(count(*) AS BIGINT) AS n_lines,
  string_agg(line, chr(31) ORDER BY c) AS slide_text
FROM lines GROUP BY doc_id, c // 12
"""


def q_markdown_report(sf_dir: str):
    """S13: the assembled per-document markdown report string (what
    create_markdown_report utf-8 encodes) + its byte length."""
    from ..stages.markdown import markdown_report_batch

    return _read_documents(sf_dir).map_batches(
        markdown_report_batch, batch_format="pyarrow"
    )


SQL_MARKDOWN_REPORT = _SQL_MD_LINES + """
, md AS (
  SELECT doc_id,
    CAST(7 * (c // 6) + (c % 6) + 1 AS BIGINT) AS line_no,
    CASE c % 6
      WHEN 4 THEN '[Image of ' || first_word || ']'
      WHEN 2 THEN '* ' || line
      WHEN 5 THEN '** ' || line
      ELSE line END AS mdline
  FROM lines
  UNION ALL
  SELECT doc_id, CAST(7 * s AS BIGINT) AS line_no,
         repeat('#', CAST(s % 3 + 1 AS INTEGER)) || ' Section '
           || CAST(s + 1 AS VARCHAR) AS mdline
  FROM (SELECT DISTINCT doc_id, c // 6 AS s FROM lines)
), agg AS (
  SELECT doc_id, string_agg(mdline, chr(10) ORDER BY line_no) AS report
  FROM md GROUP BY doc_id
)
SELECT d.doc_id, COALESCE(a.report, '') AS report,
       CAST(strlen(COALESCE(a.report, '')) AS BIGINT) AS n_bytes
FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
"""


def q_blueprint_validate(sf_dir: str):
    """M17: slide-blueprint JSON validate + pretty-print round-trip
    (ui.py:180-187). Docs with doc_id % 13 == 0 get a corrupted
    blueprint to exercise the invalid path."""
    from ..stages.markdown import validate_blueprint_batch

    ds = _read_documents(sf_dir).map_batches(
        validate_blueprint_batch, batch_format="pyarrow"
    )
    # pretty_bytes is pytest-pinned (json.dumps layout, not SQL);
    # the oracle checks validity + structure counts
    return ds.select_columns(
        ["doc_id", "valid", "n_slides", "n_content_lines"]
    )


SQL_BLUEPRINT_VALIDATE = """
WITH n AS (
  SELECT doc_id,
    length(regexp_extract_all(text, '\\S+')) AS n_words
  FROM documents
), c AS (
  SELECT doc_id,
    CAST(ceil(n_words / 10.0) AS BIGINT) AS n_lines
  FROM n
)
SELECT doc_id,
  (doc_id % 13 <> 0) AS valid,
  CAST(CASE WHEN doc_id % 13 = 0 THEN 0
            ELSE ceil(n_lines / 6.0) END AS BIGINT) AS n_slides,
  CAST(CASE WHEN doc_id % 13 = 0 THEN 0 ELSE n_lines END AS BIGINT)
    AS n_content_lines
FROM c
"""


def q_blueprint_generate(sf_dir: str):
    """Blueprint GENERATION + UPDATE stand-in
    (core_document_generator.py:264-321 generate_initial_structure,
    :323-366 update_structure — the LLM calls quarantined per SURVEY
    §7.7, closed deterministically the same way M11 was): markdown
    structure -> initial [{"title", "content": [...]}] JSON, then the
    fixed update instruction "append a summary slide" applied to the
    structure. The SQL oracle rebuilds both exact JSON strings."""
    from ..stages.markdown import generate_blueprint_batch

    return _read_documents(sf_dir).map_batches(
        generate_blueprint_batch, batch_format="pyarrow"
    )


SQL_BLUEPRINT_GENERATE = _SQL_MD_LINES + r"""
, vals AS (
  SELECT doc_id, c, c // 6 AS s,
    replace(replace(CASE c % 6 WHEN 4 THEN first_word ELSE line END,
                    '\', '\\'), '"', '\"') AS v
  FROM lines
), slides AS (
  SELECT doc_id, s,
    '{"title": "Section ' || CAST(s + 1 AS VARCHAR) || '", "content": ['
      || COALESCE(string_agg('"' || v || '"', ', ' ORDER BY c), '')
      || ']}' AS slide_json
  FROM vals GROUP BY doc_id, s
), perdoc AS (
  SELECT doc_id,
    '[' || string_agg(slide_json, ', ' ORDER BY s) || ']' AS blueprint,
    CAST(count(*) AS BIGINT) AS n_slides
  FROM slides GROUP BY doc_id
)
SELECT d.doc_id,
  COALESCE(p.blueprint, '[]') AS blueprint,
  CASE WHEN p.doc_id IS NULL
       THEN '[{"title": "Summary", "content": ["Sections: 0"]}]'
       ELSE substr(p.blueprint, 1, length(p.blueprint) - 1)
            || ', {"title": "Summary", "content": ["Sections: '
            || CAST(p.n_slides AS VARCHAR) || '"]}]' END
    AS blueprint_updated,
  CAST(COALESCE(p.n_slides, 0) AS BIGINT) AS n_slides,
  CAST(strlen(COALESCE(p.blueprint, '[]')) AS BIGINT) AS n_bytes
FROM documents d LEFT JOIN perdoc p ON p.doc_id = d.doc_id
"""


def q_render_pptx_styled(sf_dir: str):
    """Themed + charted PPTX render (pptx_designer.py:14-51 themes,
    :131-175 chart insertion, :177-370 create_pptx_with_style): theme
    keyed by doc_id, one synthetic [CHART: ...] line appended to the
    markdown; every chart becomes a real c:chartSpace part wired via a
    graphicFrame. Package bytes are pytest-validated (container, chart
    XML, theme colors); the SQL oracle checks the structural counts."""
    from ..sinks.render import render_pptx_styled_batch

    ds = _read_documents(sf_dir).map_batches(
        render_pptx_styled_batch, batch_format="pyarrow", batch_size=64
    )
    return ds.select_columns(
        ["doc_id", "theme", "n_slides", "n_charts", "n_chart_points"]
    )


SQL_RENDER_PPTX_STYLED = """
WITH n AS (
  SELECT doc_id,
    length(regexp_extract_all(text, '\\S+')) AS n_words
  FROM documents
), s AS (
  SELECT doc_id,
    CASE WHEN n_words = 0 THEN 0
         ELSE ((n_words + 9) // 10 + 5) // 6 END AS n_sections
  FROM n
)
SELECT doc_id,
  CASE doc_id % 3 WHEN 0 THEN 'default'
                  WHEN 1 THEN 'dark'
                  ELSE 'corporate' END AS theme,
  CAST(CASE WHEN n_sections = 0 THEN 1 ELSE n_sections END AS BIGINT)
    AS n_slides,
  CAST(CASE WHEN n_sections = 0 THEN 0 ELSE 1 END AS BIGINT) AS n_charts,
  CAST(CASE WHEN n_sections = 0 THEN 0 ELSE 3 END AS BIGINT)
    AS n_chart_points
FROM s
"""


def q_chart_parse(sf_dir: str):
    """Chart-string grammar parse (pptx_designer.py:131-153): one row
    per parsed data point, junk values -> 0.0, no-colon parts
    skipped."""
    from ..stages.markdown import chart_parse_batch

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(chart_parse_batch, batch_format="pyarrow")


SQL_CHART_PARSE = """
SELECT doc_id,
  'Revenue ' || CAST(doc_id AS VARCHAR) AS chart_title,
  'Series A' AS series_name,
  p.category,
  p.value
FROM documents,
LATERAL (VALUES
  ('Q1', CAST((doc_id * 7) % 1000 AS DOUBLE) + 0.5),
  ('Q2', CAST((doc_id * 13) % 500 AS DOUBLE)),
  ('Bad', 0.0)
) AS p(category, value)
"""


def q_funnel_conversion(sf_dir: str):
    """Signup -> purchase funnel per user (ordered-sequence analytics):
    for every user who signed up, the first signup time and the first
    purchase AT OR AFTER it. Users hash into bounded partitions
    (relational.NUM_EVENT_PARTITIONS) and both funnel stages compute
    vectorized within each — no per-user pandas groups; timestamps
    emitted as µs ints (exact cross-engine compare)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    ).map_batches(
        # only the two funnel stages reach the shuffle — the other
        # event types (~60% of rows) are dropped map-side
        lambda t: t.filter(
            pc.is_in(
                t["event_type"],
                value_set=pa.array(["signup", "purchase"]),
            )
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
    return relational.funnel_conversion(ds)


SQL_FUNNEL_CONVERSION = """
WITH s AS (
  SELECT user_id, CAST(epoch_us(min(ts)) AS BIGINT) AS signup_ts_us
  FROM events WHERE event_type = 'signup' GROUP BY user_id
), p AS (
  SELECT s.user_id, CAST(epoch_us(min(e.ts)) AS BIGINT) AS purchase_ts_us
  FROM s JOIN events e
    ON e.user_id = s.user_id AND e.event_type = 'purchase'
   AND CAST(epoch_us(e.ts) AS BIGINT) >= s.signup_ts_us
  GROUP BY s.user_id
)
SELECT s.user_id, s.signup_ts_us, p.purchase_ts_us,
       p.purchase_ts_us IS NOT NULL AS converted
FROM s LEFT JOIN p ON p.user_id = s.user_id
"""


def q_event_props(sf_dir: str):
    """Semi-structured extraction: parse the props JSON column
    (json.loads per event — a real parse, not a regex) and aggregate
    per event_type with map-side combining; money in integer cents."""
    import json as _json

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value", "props"]
    )

    def partial(t: pa.Table) -> pa.Table:
        ks = pa.array(
            [int(_json.loads(p)["k"]) for p in t["props"].to_pylist()],
            pa.int64(),
        )
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(t["value"], pa.scalar(100.0)), pa.scalar(0.5))), pa.int64()
        )
        flat = pa.table(
            {"event_type": t["event_type"], "k": ks, "cents": cents}
        )
        g = pa.TableGroupBy(flat, "event_type").aggregate(
            [("k", "sum"), ("cents", "sum"), ("k", "count")]
        )
        # by-name selection (not positional rename): key/agg column
        # order is a pyarrow-version convention
        return pa.table(
            {
                "event_type": g["event_type"],
                "sum_k": g["k_sum"],
                "sum_value_cents": g["cents_sum"],
                "n": g["k_count"],
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("event_type")
        .aggregate(
            Sum("sum_k", alias_name="sum_k"),
            Sum("sum_value_cents", alias_name="sum_value_cents"),
            Sum("n", alias_name="n_events"),
        )
    )


SQL_EVENT_PROPS = """
SELECT event_type,
  CAST(sum(CAST(regexp_extract(props, '"k":\\s*(-?\\d+)', 1) AS BIGINT)) AS BIGINT)
    AS sum_k,
  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_cents,
  CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY event_type
"""


# ----------------------------------------------- corpus-prep additions

def q_train_val_split(sf_dir: str):
    """Deterministic md5-hash train/val split (90/10) — stable under
    any parallelism and rerun, the standard corpus-split op."""
    from ..stages.corpus import train_val_split_batch

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(train_val_split_batch, batch_format="pyarrow")


# first 8 md5 hex digits of str(doc_id) as an integer, mod 100
SQL_TRAIN_VAL_SPLIT = """
WITH h AS (
  SELECT doc_id,
    sum(CAST(strpos('0123456789abcdef',
                    substr(md5(CAST(doc_id AS VARCHAR)), k + 1, 1)) - 1
             AS BIGINT)
        * CAST(CASE k WHEN 0 THEN 268435456 WHEN 1 THEN 16777216
               WHEN 2 THEN 1048576 WHEN 3 THEN 65536 WHEN 4 THEN 4096
               WHEN 5 THEN 256 WHEN 6 THEN 16 ELSE 1 END AS BIGINT)) AS hv
  FROM documents, generate_series(0, 7) AS g(k)
  GROUP BY doc_id
)
SELECT doc_id,
  CASE WHEN hv % 100 < 90 THEN 'train' ELSE 'val' END AS split
FROM h
"""


def q_dsir_resample(sf_dir: str):
    """DSIR importance RESAMPLING — the apply step over
    ``dsir_weights``: accept doc i iff hash_fraction(i) <
    sigmoid(log_weight_i). The acceptance test is integer-exact on
    both sides (md5-nibble hash mod 1e6 vs the 6-digit-scaled rounded
    sigmoid), so parallel Ray and serial SQL keep the identical
    sample. Model fit is one counting pass; the ratio table broadcasts
    once; accept/reject is map-only — no shuffle anywhere."""
    import hashlib
    import math

    from ..stages.textstats import dsir_model, make_dsir_scorer

    model = dsir_model(
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["text", "lang"]
        ),
        target_lang="en",
    )
    model_ref = ray.put(model)
    scored = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    ).map_batches(make_dsir_scorer(model_ref), batch_format="pyarrow")

    def accept(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        lws = t["log_weight"].to_pylist()
        keep = []
        for did, lw in zip(ids, lws):
            hv = _docid_hash32(did) % 1_000_000
            thr = round(1_000_000.0 / (1.0 + math.exp(-lw)))
            keep.append(hv < thr)
        mask = pa.array(keep, pa.bool_())
        return pa.table(
            {
                "doc_id": t["doc_id"].filter(mask),
                "lang": t["lang"].filter(mask),
                "log_weight": t["log_weight"].filter(mask),
            }
        )

    return scored.map_batches(accept, batch_format="pyarrow")


# SQL_DSIR_RESAMPLE is defined next to SQL_DSIR_WEIGHTS below (it
# inlines that query as a CTE, so it must follow its definition).


def q_group_sample(sf_dir: str):
    """Uniform k-per-group sample (k=5 docs per language), seed-free:
    order each group by the md5-nibble hash of doc_id and keep the k
    smallest — a deterministic stand-in for random sampling that any
    engine reproduces bit-exactly. Same bounded shape as
    ``top_docs_per_lang``: map-side partial top-k per group, one
    bounded groupby(lang) final cut."""
    import pandas as pd

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )

    def with_hash(t: pa.Table) -> pa.Table:
        hv = [_docid_hash32(d) for d in t["doc_id"].to_pylist()]
        return t.append_column("hv", pa.array(hv, pa.int64()))

    def topk(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values(
            ["lang", "hv", "doc_id"], kind="mergesort"
        )
        out = df.groupby("lang", sort=False).head(5).copy()
        out["rank"] = out.groupby("lang", sort=False).cumcount() + 1
        return out

    return (
        ds.map_batches(with_hash, batch_format="pyarrow")
        .map_batches(
            lambda df: topk(df).drop(columns=["rank"]),
            batch_format="pandas",
        )
        .groupby("lang")
        .map_groups(
            lambda df: topk(df).drop(columns=["hv"]),
            batch_format="pandas",
        )
    )


SQL_GROUP_SAMPLE = f"""
WITH hh AS ({_HH_SQL})
SELECT doc_id, lang, CAST(rank AS BIGINT) AS rank FROM (
  SELECT d.doc_id, d.lang,
    row_number() OVER (PARTITION BY d.lang
                       ORDER BY hh.hv, d.doc_id) AS rank
  FROM documents d JOIN hh USING (doc_id))
WHERE rank <= 5
"""  # noqa: E501


def q_top_docs_per_lang(sf_dir: str):
    """Per-group top-k (k=3 longest docs per language): map-side
    partial top-3 per lang inside every batch, one bounded
    groupby(lang) final top-3 — only ~k x langs x blocks skinny rows
    ever shuffle. Total order (n_chars DESC, doc_id ASC) makes the
    cut deterministic."""
    import pandas as pd

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "lang", "n_chars"],
    )

    def topk(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values(
            ["lang", "n_chars", "doc_id"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        out = df.groupby("lang", sort=False).head(3).copy()
        out["rank"] = out.groupby("lang", sort=False).cumcount() + 1
        return out

    return (
        ds.map_batches(
            lambda df: topk(df).drop(columns=["rank"]),
            batch_format="pandas",
        )
        .groupby("lang")
        .map_groups(topk, batch_format="pandas")
    )


SQL_TOP_DOCS_PER_LANG = """
SELECT doc_id, lang, n_chars, CAST(rank AS BIGINT) AS rank FROM (
  SELECT doc_id, lang, n_chars,
    row_number() OVER (PARTITION BY lang
                       ORDER BY n_chars DESC, doc_id) AS rank
  FROM documents)
WHERE rank <= 3
"""


def q_line_dedup(sf_dir: str):
    """Sub-document (line-level) exact dedup, CCNet/RefinedWeb-style:
    documents explode to 10-word lines, lines dedup globally by md5
    with keep-first (min doc_id, then min line_no) — removes boilerplate
    repeated ACROSS documents, which whole-doc dedup can't see.
    Map-side explode+hash, one groupby(hash) exchange of skinny rows."""
    from ..functions.hashing import md5_hex
    from ..stages.markdown import text_lines

    # packed sort key: lexicographic (doc_id, line_no) == numeric min
    # of doc_id*2^24 + line_no, so keep-first is ONE vectorized Min
    # aggregate instead of a pandas group per line hash (line hashes
    # are mostly unique — per-group Python would crawl at corpus
    # scale). uint64 with a 24-bit line field covers doc_id < 2^40
    # (~10^12 docs, the north-star corpus) and 16.7M lines/doc;
    # violations raise instead of silently corrupting the key.
    _LINE_BITS = 24

    def explode(t: pa.Table) -> pa.Table:
        keys, hashes = [], []
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            if did >= 1 << (64 - _LINE_BITS):
                raise ValueError(f"doc_id {did} overflows the packed key")
            for lno, line in enumerate(text_lines(text)):
                if lno >= 1 << _LINE_BITS:
                    raise ValueError(
                        f"doc {did}: line_no {lno} overflows the packed key"
                    )
                keys.append((did << _LINE_BITS) | lno)
                hashes.append(md5_hex(line))
        return pa.table(
            {
                "line_hash": pa.array(hashes, pa.string()),
                "key": pa.array(keys, pa.uint64()),
            }
        )

    def decode(t: pa.Table) -> pa.Table:
        key = t["first_key"]
        return pa.table(
            {
                "line_hash": t["line_hash"],
                "doc_id": pc.cast(pc.shift_right(key, _LINE_BITS), pa.int64()),
                "line_no": pc.cast(
                    pc.bit_wise_and(key, pa.scalar((1 << _LINE_BITS) - 1, pa.uint64())),
                    pa.int64(),
                ),
                "n_copies": t["n_copies"],
            }
        )

    return (
        _read_documents(sf_dir)
        .map_batches(explode, batch_format="pyarrow")
        .groupby("line_hash")
        .aggregate(
            Min("key", alias_name="first_key"),
            Count(alias_name="n_copies"),
        )
        .map_batches(decode, batch_format="pyarrow")
    )


SQL_LINE_DEDUP = """
WITH words AS (
  SELECT doc_id,
         unnest(regexp_extract_all(text, '\\S+')) AS word,
         generate_subscripts(regexp_extract_all(text, '\\S+'), 1) AS ord
  FROM documents
), lines AS (
  SELECT doc_id, CAST((ord - 1) // 10 AS BIGINT) AS line_no,
         string_agg(word, ' ' ORDER BY ord) AS line
  FROM words GROUP BY doc_id, (ord - 1) // 10
), hashed AS (
  SELECT md5(line) AS line_hash, doc_id, line_no FROM lines
)
SELECT line_hash, doc_id, line_no, n_copies FROM (
  SELECT line_hash, doc_id, line_no,
    row_number() OVER (PARTITION BY line_hash
                       ORDER BY doc_id, line_no) AS rn,
    CAST(count(*) OVER (PARTITION BY line_hash) AS BIGINT) AS n_copies
  FROM hashed
) WHERE rn = 1
"""


def q_stratified_sample(sf_dir: str):
    """Corpus balancing: keep 50% of the dominant language (en), 100%
    of the tail, by a deterministic per-doc hash draw — reruns and
    resumes keep the identical sample (never random)."""
    from ..stages.corpus import stratified_sample_batch

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    ).map_batches(stratified_sample_batch, batch_format="pyarrow")


SQL_STRATIFIED_SAMPLE = """
WITH h AS (
  SELECT doc_id, lang,
    sum(CAST(strpos('0123456789abcdef',
                    substr(md5(CAST(doc_id AS VARCHAR) || ':sample'),
                           k + 1, 1)) - 1 AS BIGINT)
        * CAST(CASE k WHEN 0 THEN 268435456 WHEN 1 THEN 16777216
               WHEN 2 THEN 1048576 WHEN 3 THEN 65536 WHEN 4 THEN 4096
               WHEN 5 THEN 256 WHEN 6 THEN 16 ELSE 1 END AS BIGINT)) AS hv
  FROM documents, generate_series(0, 7) AS g(k)
  GROUP BY doc_id, lang
)
SELECT doc_id, lang FROM h
WHERE hv % 100 < CASE lang WHEN 'en' THEN 50 ELSE 100 END
"""


def q_pii_redact(sf_dir: str):
    """PII redaction (emails / IPv4s / phone numbers -> typed
    placeholders) with per-doc match counts. The synthetic corpus has
    no PII, so a deterministic per-doc_id PII suffix is injected first
    (construction-oracle pattern); the SQL rebuilds injection and
    redaction with the same regexes."""
    from ..stages.corpus import pii_redact_batch

    return _read_documents(sf_dir).map_batches(
        pii_redact_batch, batch_format="pyarrow"
    )


SQL_PII_REDACT = r"""
WITH injected AS (
  SELECT doc_id,
    text || ' user' || CAST(doc_id AS VARCHAR) || '@example.com 10.0.'
      || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST(doc_id % 100 AS VARCHAR)
      || ' +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
      || CASE WHEN doc_id % 7 = 0
              THEN ' alt' || CAST(doc_id AS VARCHAR) || '@mail.test'
              ELSE '' END AS t
  FROM documents
), s1 AS (
  SELECT doc_id,
    CAST(length(regexp_extract_all(t,
      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
    regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                   '[EMAIL]', 'g') AS t
  FROM injected
), s2 AS (
  SELECT doc_id, n_emails,
    CAST(length(regexp_extract_all(t,
      '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS BIGINT) AS n_ips,
    regexp_replace(t, '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '[IP]', 'g') AS t
  FROM s1
)
SELECT doc_id,
  regexp_replace(t,
    '(?:\+?1[-. ])?(?:\([0-9]{3}\) ?|\b[0-9]{3}[-. ])[0-9]{3}[-. ][0-9]{4}\b|\+1-[0-9]{3}-[0-9]{4}\b',
    '[PHONE]', 'g') AS redacted,
  n_emails, n_ips,
  CAST(length(regexp_extract_all(t,
    '(?:\+?1[-. ])?(?:\([0-9]{3}\) ?|\b[0-9]{3}[-. ])[0-9]{3}[-. ][0-9]{4}\b|\+1-[0-9]{3}-[0-9]{4}\b'))
    AS BIGINT) AS n_phones
FROM s2
"""


def q_repetition_stats(sf_dir: str):
    """Gopher/C4-style repetition quality gates: duplicate-word
    fraction and most-common-2-gram fraction, raw int/int IEEE
    divisions, plus the conjunction keep flag."""
    from ..stages.corpus import repetition_batch

    return _read_documents(sf_dir).map_batches(
        repetition_batch, batch_format="pyarrow"
    )


SQL_REPETITION_STATS = r"""
WITH w AS (
  SELECT doc_id,
         unnest(regexp_extract_all(text, '\S+')) AS word,
         generate_subscripts(regexp_extract_all(text, '\S+'), 1) AS ord
  FROM documents
), per AS (
  SELECT doc_id, count(*) AS n, count(DISTINCT word) AS nd
  FROM w GROUP BY doc_id
), bgc AS (
  SELECT a.doc_id, a.word || chr(1) || b.word AS bg, count(*) AS c
  FROM w a JOIN w b ON b.doc_id = a.doc_id AND b.ord = a.ord + 1
  GROUP BY a.doc_id, a.word || chr(1) || b.word
), top AS (
  SELECT doc_id, max(c) AS topc, sum(c) AS nb FROM bgc GROUP BY doc_id
)
SELECT d.doc_id,
  CASE WHEN COALESCE(p.n, 0) > 0 THEN (p.n - p.nd) / p.n ELSE 0.0 END
    AS dup_word_frac,
  CASE WHEN COALESCE(t.nb, 0) > 0 THEN t.topc / t.nb ELSE 0.0 END
    AS top_bigram_frac,
  (CASE WHEN COALESCE(p.n, 0) > 0 THEN (p.n - p.nd) / p.n ELSE 0.0 END) <= 0.9
    AND (CASE WHEN COALESCE(t.nb, 0) > 0 THEN t.topc / t.nb ELSE 0.0 END) <= 0.18
    AS keep
FROM documents d
LEFT JOIN per p ON p.doc_id = d.doc_id
LEFT JOIN top t ON t.doc_id = d.doc_id
"""


WINDOW_TOKENS = 50
WINDOW_STRIDE = 25


def q_text_windows(sf_dir: str):
    """Sliding token windows (50 tokens, stride 25) — the LLM
    context-prep chunker: every window start s = 0, 25, ... < n_tokens,
    trailing partial window kept."""

    def fn(t: pa.Table) -> pa.Table:
        import re as _re

        ids, wids, ntoks, texts = [], [], [], []
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            toks = _re.findall(r"\S+", text)
            for w, s in enumerate(range(0, max(len(toks), 1), WINDOW_STRIDE)):
                window = toks[s : s + WINDOW_TOKENS]
                if not window:
                    break
                ids.append(did)
                wids.append(w)
                ntoks.append(len(window))
                texts.append(" ".join(window))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "window_id": pa.array(wids, pa.int64()),
                "n_tokens": pa.array(ntoks, pa.int64()),
                "window_text": pa.array(texts, pa.string()),
            }
        )

    return _read_documents(sf_dir).map_batches(fn, batch_format="pyarrow")


SQL_TEXT_WINDOWS = """
WITH w AS (
  SELECT doc_id,
         unnest(regexp_extract_all(text, '\\S+')) AS word,
         generate_subscripts(regexp_extract_all(text, '\\S+'), 1) AS ord
  FROM documents
), starts AS (
  -- a window starts wherever a word sits at ord = s+1 with s % 25 = 0
  -- (equivalently: every start < n_tokens, partial tail kept)
  SELECT doc_id, CAST((ord - 1) // 25 AS BIGINT) AS w_id, ord - 1 AS s
  FROM w WHERE (ord - 1) % 25 = 0
)
SELECT s.doc_id, s.w_id AS window_id,
  CAST(count(*) AS BIGINT) AS n_tokens,
  string_agg(w.word, ' ' ORDER BY w.ord) AS window_text
FROM starts s
JOIN w ON w.doc_id = s.doc_id AND w.ord > s.s AND w.ord <= s.s + 50
GROUP BY s.doc_id, s.w_id
"""


# ------------------------------------------------------- output sinks

def q_render_outputs(sf_dir: str):
    """S9-S12: render each document's markdown report to real PDF /
    DOCX / PPTX bytes (pure-stdlib writers — sinks/render.py; reference
    semantics final_output_generator.py:11-74 +
    core_document_processing.py:299-415) and emit the structural
    counts the renderers observed. Container validity + byte
    determinism are pinned by tests/test_render.py; the structure by
    the SQL oracle below (same construction-oracle arithmetic as the
    markdown ops)."""
    from ..sinks.render import render_outputs_batch

    return (
        _read_documents(sf_dir)
        .map_batches(render_outputs_batch, batch_format="pyarrow")
        .select_columns(
            [
                "doc_id",
                "docx_paragraphs",
                "docx_headings",
                "docx_bullets",
                "pptx_slides",
                "pptx_image_prompts",
                "pdf_pages",
            ]
        )
    )


SQL_RENDER_OUTPUTS = _SQL_MD_LINES + """
, per_doc AS (
  SELECT doc_id,
    count(*) AS n_lines,
    count(DISTINCT c // 6) AS n_sections,
    sum(CASE WHEN c % 6 IN (2, 5) THEN 1 ELSE 0 END) AS n_bullets,
    sum(CASE WHEN c % 6 = 4 THEN 1 ELSE 0 END) AS n_images
  FROM lines GROUP BY doc_id
)
SELECT d.doc_id,
  CAST(COALESCE(p.n_lines + p.n_sections, 0) AS BIGINT) AS docx_paragraphs,
  CAST(COALESCE(p.n_sections, 0) AS BIGINT) AS docx_headings,
  CAST(COALESCE(p.n_bullets, 0) AS BIGINT) AS docx_bullets,
  CAST(COALESCE(p.n_sections, 0) AS BIGINT) AS pptx_slides,
  CAST(COALESCE(p.n_images, 0) AS BIGINT) AS pptx_image_prompts,
  CAST(ceil(COALESCE(p.n_lines + p.n_sections, 1) / 54.0) AS BIGINT)
    AS pdf_pages
FROM documents d LEFT JOIN per_doc p ON p.doc_id = d.doc_id
"""


# ---------------------------------------------------------- multimodal

def _with_media(sf_dir: str, maker):
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def synth(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "media": pa.array([maker(i) for i in ids], pa.binary()),
            }
        )

    return ds.map_batches(synth, batch_format="pyarrow")


def q_image_decode(sf_dir: str):
    """Opaque binary image column -> typed metadata via the actor-pool
    decoder (engine pinned per actor; stub in-sandbox)."""
    return _with_media(sf_dir, multimodal.make_image).map_batches(
        multimodal.ImageDecoder,
        fn_constructor_kwargs={"engine": "stub"},
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=2,
    )


SQL_IMAGE_DECODE = """
SELECT doc_id,
  CAST(64 + (doc_id * 31) % 960 AS INTEGER) AS width,
  CAST(64 + (doc_id * 17) % 960 AS INTEGER) AS height,
  CAST(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 3 END AS INTEGER) AS channels,
  TRUE AS decode_ok
FROM documents
"""


def q_image_resize(sf_dir: str):
    ds = _with_media(sf_dir, multimodal.make_image).map_batches(
        multimodal.ImageResizer,
        fn_constructor_kwargs={"max_w": 256, "max_h": 256, "engine": "stub"},
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=2,
    )
    return ds.select_columns(["doc_id", "resized_w", "resized_h"])


SQL_IMAGE_RESIZE = """
WITH dims AS (
  SELECT doc_id,
    CAST(64 + (doc_id * 31) % 960 AS DOUBLE) AS w,
    CAST(64 + (doc_id * 17) % 960 AS DOUBLE) AS h
  FROM documents
)
SELECT doc_id,
  CAST(greatest(1, floor(w * least(1.0, 256.0 / w, 256.0 / h))) AS INTEGER)
    AS resized_w,
  CAST(greatest(1, floor(h * least(1.0, 256.0 / w, 256.0 / h))) AS INTEGER)
    AS resized_h
FROM dims
"""


def q_video_frame_sample(sf_dir: str):
    """Video rows exploded to sampled frames (stride 10) — the
    page-explode pattern applied to media."""
    return _with_media(sf_dir, multimodal.make_video).map_batches(
        multimodal.FrameSampler,
        fn_constructor_kwargs={"stride": 10, "engine": "stub"},
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=2,
    )


SQL_VIDEO_FRAME_SAMPLE = """
WITH v AS (
  SELECT doc_id,
    (CASE doc_id % 3 WHEN 0 THEN 10 WHEN 1 THEN 24 ELSE 30 END) AS fps,
    10 + (doc_id * 13) % 290 AS n_frames
  FROM documents
)
, frames AS (
  SELECT doc_id, fps, unnest(range(0, n_frames, 10)) AS f FROM v
)
SELECT doc_id,
  CAST(f AS INTEGER) AS frame_no,
  CAST(f AS DOUBLE) / fps AS ts_sec
FROM frames
"""


def q_media_features(sf_dir: str):
    """Batched 'model inference' stand-in: deterministic 64-d float32
    embedding per media payload (actor pool decodes the binary
    container; engine pinned per actor). The embedding list explodes
    to flat (doc_id, i, feat) rows so the md5-expansion arithmetic is
    checkable in SQL (feat values widen float32->float64 exactly)."""
    ds = _with_media(sf_dir, multimodal.make_image).map_batches(
        multimodal.MediaFeatureExtractor,
        fn_constructor_kwargs={"engine": "stub"},
        batch_format="pyarrow",
        batch_size=512,
        concurrency=2,
    )

    def explode(t: pa.Table) -> pa.Table:
        import numpy as np

        col = t["embedding"].combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        dim = multimodal.EMBED_DIM
        n = len(col)
        return pa.table(
            {
                "doc_id": pa.array(
                    np.repeat(t["doc_id"].to_numpy(), dim), pa.int64()
                ),
                "i": pa.array(np.tile(np.arange(dim), n), pa.int64()),
                "feat": pa.array(flat, pa.float64()),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")


# The stub feature extractor md5-expands "IMGSTUB1:{seed}:{base}" (seed
# = doc_id % 2^31, base = 4-aligned feature index) and reads 4-byte
# little-endian ints from the digest; feat = float32(v / 2^31 - 1).
# Every step is exact-then-one-rounding, so SQL reproduces it bitwise:
# hex-pair -> byte via strpos, the division/subtraction are exact in
# float64, and CAST AS REAL applies the same IEEE narrowing.
SQL_MEDIA_FEATURES = """
WITH idx AS (
  SELECT unnest(range(0, 64)) AS i
), raw AS (
  SELECT d.doc_id, idx.i,
    md5('IMGSTUB1:' || CAST(d.doc_id % 2147483648 AS VARCHAR) || ':'
        || CAST((idx.i // 4) * 4 AS VARCHAR)) AS h,
    (idx.i % 4) * 4 AS off
  FROM documents d CROSS JOIN idx
), bytes AS (
  SELECT doc_id, i,
    (strpos('0123456789abcdef', substr(h, 2*(off+0)+1, 1)) - 1) * 16
      + (strpos('0123456789abcdef', substr(h, 2*(off+0)+2, 1)) - 1) AS b0,
    (strpos('0123456789abcdef', substr(h, 2*(off+1)+1, 1)) - 1) * 16
      + (strpos('0123456789abcdef', substr(h, 2*(off+1)+2, 1)) - 1) AS b1,
    (strpos('0123456789abcdef', substr(h, 2*(off+2)+1, 1)) - 1) * 16
      + (strpos('0123456789abcdef', substr(h, 2*(off+2)+2, 1)) - 1) AS b2,
    (strpos('0123456789abcdef', substr(h, 2*(off+3)+1, 1)) - 1) * 16
      + (strpos('0123456789abcdef', substr(h, 2*(off+3)+2, 1)) - 1) AS b3
  FROM raw
)
SELECT doc_id, i,
  CAST(CAST((b0 + b1*256 + b2*65536 + b3*16777216) / 2147483648.0 - 1.0
            AS REAL) AS DOUBLE) AS feat
FROM bytes
"""


# ------------------------------------------- embedding-cosine near-dup

# All-pairs embedding scoring is O(corpus) driver memory and O(n²)
# compute BY CONSTRUCTION — it exists as the small-scale oracle twin of
# the LSH-bucketed path. The guard keeps a user from pointing it at a
# real corpus by accident.
EMBEDDING_ALL_PAIRS_MAX_ROWS = 100_000


def q_embedding_near_dups(sf_dir: str):
    """All candidate pairs with cosine >= 0.1 (blocked matmul per batch
    against the broadcast candidate matrix). This is the ORACLE TWIN of
    the scale path: it broadcasts the full normalized matrix and scores
    n² pairs, so it refuses inputs beyond
    EMBEDDING_ALL_PAIRS_MAX_ROWS — use ``embedding_near_dups_lsh``
    (per-bucket matmul, compute = Σ|bucket|²) for real corpora."""
    n_rows = pq.ParquetFile(f"{sf_dir}/embeddings.parquet").metadata.num_rows
    if n_rows > EMBEDDING_ALL_PAIRS_MAX_ROWS:
        raise ValueError(
            f"embedding_near_dups is the all-pairs oracle twin "
            f"(O(n²) compute, full-matrix broadcast) and refuses "
            f"{n_rows} rows (> {EMBEDDING_ALL_PAIRS_MAX_ROWS}); use "
            f"embedding_near_dups_lsh — the LSH-bucketed scale path "
            f"with the same threshold and rounding."
        )
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    import numpy as np

    ids = np.array(t["vec_id"].to_pylist(), dtype=np.int64)
    m = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    cand_ref = ray.put((ids, m))

    def score(batch: pa.Table) -> pa.Table:
        import numpy as _np

        cids, cm = ray.get(cand_ref)
        bm = _np.array(batch["embedding"].to_pylist(), dtype=_np.float64)
        bm = bm / _np.linalg.norm(bm, axis=1, keepdims=True)
        bids = _np.array(batch["vec_id"].to_pylist(), dtype=_np.int64)
        sims = bm @ cm.T
        # one 2-D mask + nonzero — no per-row Python loop; only the
        # surviving pairs (bounded) are touched in Python for the
        # decimal round that matches DuckDB's round()
        mask = (sims >= 0.1) & (cids[None, :] > bids[:, None])
        ii, jj = _np.nonzero(mask)
        return pa.table(
            {
                "vec_a": pa.array(bids[ii], pa.int64()),
                "vec_b": pa.array(cids[jj], pa.int64()),
                "sim": pa.array(
                    [_round6(float(x)) for x in sims[ii, jj]], pa.float64()
                ),
            }
        )

    return ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(score, batch_format="pyarrow", batch_size=512)


SQL_EMBEDDING_NEAR_DUPS = """
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
  round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                               CAST(b.embedding AS DOUBLE[])), 6) AS sim
FROM embeddings a JOIN embeddings b ON b.vec_id > a.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= 0.1
"""


def q_embedding_near_dups_lsh(sf_dir: str):
    """The SCALE path for embedding near-dedup: pairs scored only
    within an LSH bucket (groupby(bucket) exchange, per-bucket matmul)
    — compute is sum of |bucket|², never corpus². Same threshold and
    rounding as the all-pairs oracle variant; recall < 1 by design."""
    from ..stages.similarity import embedding_near_dups_lsh

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return embedding_near_dups_lsh(ds, dim=64, threshold=0.1, n_planes=4)


SQL_EMBEDDING_NEAR_DUPS_LSH = f"""
WITH planes(i, p0, p1, p2, p3) AS (VALUES {_lsh_planes_values()}),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
proj AS (
  SELECT vec_id,
    sum(e[i + 1] * p0) AS s0, sum(e[i + 1] * p1) AS s1,
    sum(e[i + 1] * p2) AS s2, sum(e[i + 1] * p3) AS s3
  FROM e, planes GROUP BY vec_id
), buck AS (
  SELECT vec_id,
    (CASE WHEN s0 >= 0 THEN 1 ELSE 0 END)
    + (CASE WHEN s1 >= 0 THEN 2 ELSE 0 END)
    + (CASE WHEN s2 >= 0 THEN 4 ELSE 0 END)
    + (CASE WHEN s3 >= 0 THEN 8 ELSE 0 END) AS bucket
  FROM proj
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
  round(list_cosine_similarity(ea.e, eb.e), 6) AS sim
FROM buck a
JOIN buck b ON b.bucket = a.bucket AND b.vec_id > a.vec_id
JOIN e ea ON ea.vec_id = a.vec_id
JOIN e eb ON eb.vec_id = b.vec_id
WHERE list_cosine_similarity(ea.e, eb.e) >= 0.1
"""


def q_semantic_dedup(sf_dir: str):
    """SemDeDup-shape semantic dedup (Abbas et al. 2023): LSH-bucketed
    embedding similarity pairs -> distributed connected components ->
    keep each cluster's min-vec_id representative. Loser ids apply via
    relational.anti_filter (budgeted broadcast with a ``left_anti``
    join fallback); the embedding table never shuffles. The 0.1
    similarity threshold is a parameter — the synthetic embeddings
    have no high-similarity near-dups, so the demo exercises coarse
    clusters; a production run sets ~0.9+."""
    pairs = q_embedding_near_dups_lsh(sf_dir).map_batches(
        lambda t: pa.table(
            {"doc_a": t["vec_a"], "doc_b": t["vec_b"]}
        ),
        batch_format="pyarrow",
    )
    clusters = relational.cluster_pairs_distributed(pairs)

    def losers(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vec_id": t.filter(
                    pc.not_equal(t["doc_id"], t["cluster_id"])
                )["doc_id"]
            }
        )

    drop = clusters.map_batches(losers, batch_format="pyarrow")
    vecs = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id"]
    )
    return relational.anti_filter(vecs, drop, "vec_id")


SQL_SEMANTIC_DEDUP = f"""
WITH RECURSIVE pairs AS ({SQL_EMBEDDING_NEAR_DUPS_LSH}),
edges AS (
  SELECT vec_a AS src, vec_b AS dst FROM pairs
  UNION ALL SELECT vec_b, vec_a FROM pairs
), reach(node, label) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node
), clusters AS (
  SELECT CAST(node AS BIGINT) AS vec_id,
         CAST(min(label) AS BIGINT) AS cluster_id
  FROM reach GROUP BY node
)
SELECT v.vec_id
FROM embeddings v LEFT JOIN clusters c USING (vec_id)
WHERE c.vec_id IS NULL OR c.cluster_id = v.vec_id
"""


# ---------------------------------------------------------- registries

# Registry ORDER is load-bearing: the driver correctness gate samples
# the FIRST 50 entries, so the newest (least-proven) queries sit in the
# checked prefix and the tail holds only long-stable entries that were
# driver-green in round 2 (CORRECTNESS_r02.json) AND are pytest-covered.
def q_decontaminate(sf_dir: str):
    """Benchmark decontamination (GPT-3 appendix-C style): flag every
    training document containing a verbatim 13-word probe n-gram from
    the benchmark set (deterministic corpus sample, doc_id % 97 == 0).

    Scale shape: probe extraction is a map-side filter whose output is
    benchmark-sized (corpus / 97 rows — ``take_all`` is bounded by the
    benchmark, not the corpus); the scan broadcasts the probe list once
    (``ray.put`` + per-worker cache) and runs P vectorized Arrow
    substring passes per batch — map-only, no shuffle."""
    from ..stages.corpus import make_contamination_scanner, probe_batch

    probes = sorted(
        {
            r["probe"]
            for r in _read_documents(sf_dir)
            .map_batches(probe_batch, batch_format="pyarrow")
            .take_all()
        }
    )
    ref = ray.put(probes)
    return _read_documents(sf_dir).map_batches(
        make_contamination_scanner(ref), batch_format="pyarrow"
    )


SQL_DECONTAMINATE = r"""
WITH toks AS (
  SELECT doc_id, text, regexp_extract_all(text, '\S+') AS w
  FROM documents
), bench AS (
  SELECT DISTINCT array_to_string(list_slice(w, 1, 13), ' ') AS probe
  FROM toks WHERE doc_id % 97 = 0 AND len(w) >= 13
)
SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_hits
FROM documents d JOIN bench b ON contains(d.text, b.probe)
GROUP BY d.doc_id
"""


def q_pack_sequences(sf_dir: str):
    """Concat-then-chunk sequence packing (token-budget bins per lang
    stream) — the distributed exclusive prefix sum in
    stages/packing.py; see its module docstring for the two-level
    scan and the bounded-partition fill."""
    from ..stages.packing import pack_sequences

    return pack_sequences(
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet",
            columns=["doc_id", "lang", "text"],
        )
    )


SQL_PACK_SEQUENCES = r"""
WITH t AS (
  SELECT doc_id, lang,
         CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
  FROM documents
), s AS (
  SELECT doc_id, lang, n_tokens,
    CAST(COALESCE(SUM(n_tokens) OVER (
      PARTITION BY lang ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      AS start_tok
  FROM t
)
SELECT doc_id, lang, n_tokens, start_tok,
  start_tok // 512 AS bin_id,
  CASE WHEN n_tokens = 0 THEN CAST(1 AS BIGINT)
       ELSE (start_tok + n_tokens - 1) // 512 - start_tok // 512 + 1
  END AS n_bins
FROM s
"""


def q_temperature_mix(sf_dir: str):
    """Multilingual temperature resampling (mT5/XLM-R-style, alpha=0.5):
    per-language keep-rates proportional to sqrt(n_l)/n_l flatten the
    language distribution toward the tail, targeting a corpus//2
    sample. Two-phase: a tiny lang-count groupby lands on the driver,
    exact-integer thresholds (stages/corpus.py:mix_thresholds) ship in
    the task closure, then one map-only hash-draw filter."""
    from ..stages.corpus import (
        MIX_TARGET_DEN,
        make_mix_filter,
        mix_thresholds,
    )

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )
    counts = {
        r["lang"]: r["n_docs"]
        for r in ds.groupby("lang")
        .aggregate(Count(alias_name="n_docs"))
        .take_all()  # lang-cardinality rows only
    }
    thr = mix_thresholds(counts, sum(counts.values()) // MIX_TARGET_DEN)
    return ds.map_batches(make_mix_filter(thr), batch_format="pyarrow")


SQL_TEMPERATURE_MIX = """
WITH counts AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY lang
), w AS (
  SELECT lang, n, CAST(floor(sqrt(n)) AS BIGINT) AS wl FROM counts
), tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS total_n, CAST(sum(wl) AS BIGINT) AS total_w
  FROM w
), thr AS (
  SELECT lang,
    LEAST(CAST(10000 AS BIGINT),
          (10000 * ((SELECT total_n FROM tot) // 2) * wl)
            // ((SELECT total_w FROM tot) * n)) AS threshold
  FROM w
), h AS (
  SELECT doc_id, lang,
    sum(CAST(strpos('0123456789abcdef',
                    substr(md5(CAST(doc_id AS VARCHAR) || ':mix'), k + 1, 1)) - 1
             AS BIGINT)
        * CAST(CASE k WHEN 0 THEN 268435456 WHEN 1 THEN 16777216
               WHEN 2 THEN 1048576 WHEN 3 THEN 65536 WHEN 4 THEN 4096
               WHEN 5 THEN 256 WHEN 6 THEN 16 ELSE 1 END AS BIGINT)) AS hv
  FROM documents, generate_series(0, 7) AS g(k)
  GROUP BY doc_id, lang
)
SELECT h.doc_id, h.lang
FROM h JOIN thr ON h.lang = thr.lang
WHERE h.hv % 10000 < thr.threshold
"""


def q_crawl_delta(sf_dir: str):
    """Incremental-crawl snapshot diff: classify every url as added /
    updated / unchanged relative to the snapshot boundary T = midpoint
    of the crawl-timestamp range. The wide step exchanges ONE skinny
    flag row per crawl key (url, two 0/1 flags, ts) — payloads never
    move; the boundary comes from a tiny min/max aggregate."""
    from .extract import synthesize_keys

    mm = synthesize_keys(sf_dir).aggregate(
        Min("ts_us", alias_name="mn"), Max("ts_us", alias_name="mx")
    )
    boundary = (mm["mn"] + mm["mx"]) // 2

    def flags(t: pa.Table) -> pa.Table:
        old = pc.less(t["ts_us"], boundary)
        return pa.table(
            {
                "url": t["url"],
                "is_old": pc.cast(old, pa.int64()),
                "is_new": pc.cast(pc.invert(old), pa.int64()),
                "ts_us": t["ts_us"],
            }
        )

    def classify(t: pa.Table) -> pa.Table:
        n_old = pc.cast(t["n_old"], pa.int64())
        n_new = pc.cast(t["n_new"], pa.int64())
        status = pc.if_else(
            pc.and_(pc.greater(n_old, 0), pc.greater(n_new, 0)),
            pa.scalar("updated"),
            pc.if_else(
                pc.greater(n_new, 0),
                pa.scalar("added"),
                pa.scalar("unchanged"),
            ),
        )
        return pa.table(
            {
                "url": t["url"],
                "n_old": n_old,
                "n_new": n_new,
                "latest_ts_us": pc.cast(t["latest_ts_us"], pa.int64()),
                "status": status,
            }
        )

    return (
        synthesize_keys(sf_dir)
        .map_batches(flags, batch_format="pyarrow")
        .groupby("url")
        .aggregate(
            Sum("is_old", alias_name="n_old"),
            Sum("is_new", alias_name="n_new"),
            Max("ts_us", alias_name="latest_ts_us"),
        )
        .map_batches(classify, batch_format="pyarrow")
    )


# crawl-key reconstruction mirrors sources/synth.py:131-151 (url_for,
# ts_for=EPOCH+doc_id sec, plus a 1-day-earlier re-crawl for cls 2)
SQL_CRAWL_DELTA = """
WITH crawls AS (
  SELECT 'https://site-' || CAST(doc_id % 20 AS VARCHAR)
           || '.example/doc/' || CAST(doc_id AS VARCHAR) AS url,
         CAST(epoch_us(TIMESTAMP '2026-01-01'
                       + to_seconds(CAST(doc_id AS BIGINT))) AS BIGINT)
           AS ts_us
  FROM documents
  UNION ALL
  SELECT 'https://site-' || CAST(doc_id % 20 AS VARCHAR)
           || '.example/doc/' || CAST(doc_id AS VARCHAR) AS url,
         CAST(epoch_us(TIMESTAMP '2026-01-01'
                       + to_seconds(CAST(doc_id AS BIGINT))
                       - INTERVAL 1 DAY) AS BIGINT) AS ts_us
  FROM documents WHERE doc_id % 10 = 2
), bnd AS (
  SELECT (min(ts_us) + max(ts_us)) // 2 AS t FROM crawls
), agg AS (
  SELECT url,
    CAST(sum(CASE WHEN ts_us < (SELECT t FROM bnd) THEN 1 ELSE 0 END)
         AS BIGINT) AS n_old,
    CAST(sum(CASE WHEN ts_us >= (SELECT t FROM bnd) THEN 1 ELSE 0 END)
         AS BIGINT) AS n_new,
    CAST(max(ts_us) AS BIGINT) AS latest_ts_us
  FROM crawls GROUP BY url
)
SELECT url, n_old, n_new, latest_ts_us,
  CASE WHEN n_old > 0 AND n_new > 0 THEN 'updated'
       WHEN n_new > 0 THEN 'added'
       ELSE 'unchanged' END AS status
FROM agg
"""


def q_topic_classify(sf_dir: str):
    """Keyword-list topic tagging (mixing-weight precursor): whole-word
    keyword counts per topic, argmax with lexicographic tie-break —
    a fixed number of vectorized Arrow regex passes, map-only."""
    from ..stages.textstats import topic_classify_batch

    return _read_documents(sf_dir).map_batches(
        topic_classify_batch, batch_format="pyarrow"
    )


def _topic_sql() -> str:
    from ..stages.textstats import TOPICS

    topics = sorted(TOPICS)
    scores = ",\n    ".join(
        "CAST("
        + " + ".join(
            f"len(regexp_extract_all(text, '\\b{kw}\\b'))"
            for kw in TOPICS[t]
        )
        + f" AS BIGINT) AS s_{t}"
        for t in topics
    )
    unions = "\n  UNION ALL\n  ".join(
        f"SELECT doc_id, '{t}' AS topic, s_{t} AS score FROM scores"
        for t in topics
    )
    return f"""
WITH scores AS (
  SELECT doc_id,
    {scores}
  FROM documents
), long AS (
  {unions}
)
SELECT doc_id, topic, score FROM (
  SELECT doc_id, topic, score,
    row_number() OVER (PARTITION BY doc_id
                       ORDER BY score DESC, topic) AS rn
  FROM long
) WHERE rn = 1
"""


SQL_TOPIC_CLASSIFY = _topic_sql()


def q_url_canonicalize(sf_dir: str):
    """URL canonicalization (functions/urlnorm.py): the normalization
    pass that precedes any url-keyed dedup/join on a web corpus —
    map-only, per-row string surgery, no shuffle."""
    from ..functions.urlnorm import url_canonicalize_batch

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(url_canonicalize_batch, batch_format="pyarrow")


# generic canonicalization in SQL (not a per-class answer table): the
# oracle re-implements rules 1-5 of functions/urlnorm.py with DuckDB
# string/list kernels over the same decorated inputs.
SQL_URL_CANONICALIZE = """
WITH base AS (
  SELECT doc_id,
    'https://site-' || CAST(doc_id % 20 AS VARCHAR)
      || '.example/doc/' || CAST(doc_id AS VARCHAR) AS b
  FROM documents
), raw AS (
  SELECT doc_id,
    CASE doc_id % 5
      WHEN 1 THEN 'https://'
        || upper(split_part(split_part(b, '://', 2), '/', 1))
        || substr(split_part(b, '://', 2),
                  len(split_part(split_part(b, '://', 2), '/', 1)) + 1)
        || '#section2'
      WHEN 2 THEN b || '?utm_source=feed&z=9&a=1'
      WHEN 3 THEN replace(b, '.example/', '.example:443/') || '/'
      WHEN 4 THEN b || '?b=2&utm_campaign=x'
      ELSE b END AS raw_url
  FROM base
), parts AS (
  SELECT doc_id, raw_url,
    lower(split_part(raw_url, '://', 1)) AS scheme,
    split_part(split_part(raw_url, '#', 1), '://', 2) AS rest
  FROM raw
), split1 AS (
  SELECT *,
    split_part(rest, '?', 1) AS authpath,
    CASE WHEN strpos(rest, '?') > 0
         THEN substr(rest, strpos(rest, '?') + 1) ELSE '' END AS query
  FROM parts
), split2 AS (
  SELECT *,
    split_part(authpath, '/', 1) AS auth,
    substr(authpath, len(split_part(authpath, '/', 1)) + 1) AS path
  FROM split1
), norm AS (
  SELECT doc_id, raw_url, scheme, query,
    lower(split_part(auth, ':', 1))
      || CASE WHEN split_part(auth, ':', 2) = '' THEN ''
              WHEN scheme = 'https' AND split_part(auth, ':', 2) = '443' THEN ''
              WHEN scheme = 'http' AND split_part(auth, ':', 2) = '80' THEN ''
              ELSE ':' || split_part(auth, ':', 2) END AS host,
    CASE WHEN path LIKE '%/' AND path <> '/'
         THEN substr(path, 1, len(path) - 1) ELSE path END AS path
  FROM split2
), q AS (
  SELECT doc_id, raw_url, scheme, host, path,
    list_sort(list_filter(string_split(query, '&'),
      p -> p <> '' AND NOT starts_with(p, 'utm_')
           AND NOT starts_with(p, 'fbclid=')
           AND NOT starts_with(p, 'gclid='))) AS params
  FROM norm
)
SELECT doc_id, raw_url,
  scheme || '://' || host || path
    || CASE WHEN len(params) > 0
            THEN '?' || array_to_string(params, '&') ELSE '' END AS canon_url
FROM q
"""


def q_html_metadata(sf_dir: str):
    """Structured-field extraction alongside main content: <title> and
    anchor-link count per crawl, gated on the byte-sniffer (only
    payloads that sniff as HTML are searched, so PDF streams / junk
    bytes that happen to contain ``<a `` never miscount). Map-only
    over the raw crawl — runs BEFORE dedup, so stale re-crawls appear
    (cls 2 urls yield two rows)."""
    import re as _re

    from ..stages.sniff import sniff_payload

    _TITLE = _re.compile(rb"<title>(.*?)</title>", _re.S)

    def meta(t: pa.Table) -> pa.Table:
        urls = t["url"].to_pylist()
        tss = t["warc_ts"].to_pylist()
        payloads = t["html"].to_pylist()
        doc_types, titles, n_links = [], [], []
        for payload in payloads:
            dt = sniff_payload(payload)
            doc_types.append(dt)
            if dt == "html":
                m = _TITLE.search(payload)
                titles.append(
                    m.group(1).decode("utf-8", "replace") if m else None
                )
                n_links.append(payload.count(b"<a "))
            else:
                titles.append(None)
                n_links.append(0)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "ts_us": pa.array(
                    [
                        int(ts.timestamp() * 1_000_000)
                        if hasattr(ts, "timestamp")
                        else int(ts)
                        for ts in tss
                    ],
                    pa.int64(),
                ),
                "doc_type": pa.array(doc_types, pa.string()),
                "title": pa.array(titles, pa.string()),
                "n_links": pa.array(n_links, pa.int64()),
            }
        )

    return synthesize_docs(sf_dir).map_batches(
        meta, batch_format="pyarrow"
    )


def _html_meta_sql() -> str:
    # link counts inlined from the payload builders' fixed boilerplate
    # (sources/synth.py) — the oracle stays in lockstep with the
    # constants because they're COUNTED here, not hand-copied
    from ..sources import synth

    def links(s: str) -> int:
        return s.count("<a ")

    n_simple = links(synth._NAV) + links(synth._SIDEBAR_LINKS) + links(
        synth._FOOTER
    )
    n_boiler = 3 * links(synth._SIDEBAR_LINKS)
    n_malformed = links(synth._SIDEBAR_LINKS)
    return f"""
WITH crawl AS (
  SELECT doc_id, doc_id % 10 AS cls, 0 AS stale FROM documents
  UNION ALL
  SELECT doc_id, doc_id % 10 AS cls, 1 AS stale
  FROM documents WHERE doc_id % 10 = 2
)
SELECT
  'https://site-' || CAST(doc_id % 20 AS VARCHAR)
    || '.example/doc/' || CAST(doc_id AS VARCHAR) AS url,
  CAST(epoch_us(TIMESTAMP '2026-01-01'
                + to_seconds(CAST(doc_id AS BIGINT))
                - stale * INTERVAL 1 DAY) AS BIGINT) AS ts_us,
  CASE WHEN cls <= 5 THEN 'html'
       WHEN cls <= 8 THEN 'pdf'
       ELSE 'unknown' END AS doc_type,
  CASE WHEN cls <= 2 THEN 'Document ' || CAST(doc_id AS VARCHAR)
       WHEN cls <= 4 THEN 'Doc ' || CAST(doc_id AS VARCHAR)
       ELSE NULL END AS title,
  CAST(CASE WHEN cls <= 2 THEN {n_simple}
            WHEN cls <= 4 THEN {n_boiler}
            WHEN cls = 5 THEN {n_malformed}
            ELSE 0 END AS BIGINT) AS n_links
FROM crawl
"""


SQL_HTML_METADATA = _html_meta_sql()


def q_gopher_quality(sf_dir: str):
    """Published Gopher corpus-filter rules (Rae et al. 2021, Table A1)
    as a map-only gate over ``documents`` — the standard hard-filter
    pass a web corpus runs before training. Signals + conjunctive
    ``passes`` flag per doc; thresholds in stages/textstats.py."""
    return _read_documents(sf_dir).map_batches(
        textstats.gopher_quality_batch, batch_format="pyarrow"
    )


def _gopher_sql() -> str:
    stop_sql = ", ".join(f"'{w}'" for w in textstats.GOPHER_STOP)
    return f"""
WITH t AS (
  SELECT doc_id, text,
    regexp_extract_all(text, '\\S+') AS toks,
    string_split(text, chr(10)) AS lines,
    list_distinct(list_filter(regexp_extract_all(lower(text), '[a-z]+'),
                              w -> w IN ({stop_sql}))) AS stops
  FROM documents
), s AS (
  SELECT doc_id,
    CAST(length(toks) AS BIGINT) AS n_words,
    CASE WHEN length(toks) = 0 THEN 0.0
         ELSE CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT)
              / CAST(length(toks) AS BIGINT) END AS mean_word_len,
    CASE WHEN length(toks) = 0 THEN 0.0
         ELSE CAST((length(text) - length(replace(text, '#', ''))
                    + (length(text) - length(replace(text, '...', ''))) // 3)
                   AS BIGINT)
              / CAST(length(toks) AS BIGINT) END AS symbol_ratio,
    CAST(length(list_filter(lines, l ->
           starts_with(ltrim(l), '- ') OR starts_with(ltrim(l), '* ')
           OR starts_with(ltrim(l), '• '))) AS BIGINT)
      / CAST(length(lines) AS BIGINT) AS bullet_frac,
    CAST(length(list_filter(lines, l -> rtrim(l) LIKE '%...')) AS BIGINT)
      / CAST(length(lines) AS BIGINT) AS ellipsis_frac,
    CASE WHEN length(toks) = 0 THEN 0.0
         ELSE CAST(length(list_filter(toks,
                x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT)
              / CAST(length(toks) AS BIGINT) END AS alpha_word_frac,
    CAST(length(stops) AS BIGINT) AS stop_hits
  FROM t
)
SELECT *,
  (n_words BETWEEN {textstats.GOPHER_MIN_WORDS}
               AND {textstats.GOPHER_MAX_WORDS}
   AND mean_word_len BETWEEN {textstats.GOPHER_MIN_MEAN_WL}
                         AND {textstats.GOPHER_MAX_MEAN_WL}
   AND symbol_ratio < {textstats.GOPHER_MAX_SYMBOL_RATIO}
   AND bullet_frac < {textstats.GOPHER_MAX_BULLET_FRAC}
   AND ellipsis_frac < {textstats.GOPHER_MAX_ELLIPSIS_FRAC}
   AND alpha_word_frac > {textstats.GOPHER_MIN_ALPHA_FRAC}
   AND stop_hits >= {textstats.GOPHER_MIN_STOP_HITS}) AS passes
FROM s
"""


SQL_GOPHER_QUALITY = _gopher_sql()


def q_boilerplate_lines(sf_dir: str):
    """CCNet-style boilerplate removal by global line doc-frequency:
    pass 1 reduces the corpus to a small droplist of lines seen in
    >= 2 distinct docs (map-side partials, budgeted driver merge with
    distributed-groupby fallback — stages/corpus.py), pass 2 is a
    map-only filter with the droplist broadcast once via ray.put.
    Unlike line_dedup (keep-first), no copy of a repeated line
    survives: repeats are template chrome, not content."""
    from ..stages import corpus

    docs = _read_documents(sf_dir)
    drop = corpus.boilerplate_droplist(
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["text"]
        )
    )
    drop_ref = ray.put(drop)
    return docs.map_batches(
        corpus.make_boiler_filter(drop_ref), batch_format="pyarrow"
    )


SQL_BOILERPLATE_LINES = """
WITH words AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS word,
         generate_subscripts(regexp_extract_all(text, '\\S+'), 1) AS ord
  FROM documents
), lines AS (
  SELECT doc_id, CAST((ord - 1) // 10 AS BIGINT) AS line_no,
         string_agg(word, ' ' ORDER BY ord) AS line
  FROM words GROUP BY doc_id, (ord - 1) // 10
), df AS (
  SELECT line, count(DISTINCT doc_id) AS ndocs FROM lines GROUP BY line
), kept AS (
  SELECT l.doc_id, l.line_no, l.line
  FROM lines l JOIN df USING (line) WHERE df.ndocs < 2
), agg AS (
  SELECT doc_id, string_agg(line, ' ' ORDER BY line_no) AS clean_text,
         CAST(count(*) AS BIGINT) AS n_kept
  FROM kept GROUP BY doc_id
), tot AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines
  FROM lines GROUP BY doc_id
)
SELECT d.doc_id,
  coalesce(a.clean_text, '') AS clean_text,
  CAST(coalesce(t.n_lines, 0) - coalesce(a.n_kept, 0) AS BIGINT)
    AS n_removed
FROM documents d
LEFT JOIN agg a USING (doc_id)
LEFT JOIN tot t USING (doc_id)
"""


def q_unigram_logprob(sf_dir: str):
    """CCNet-style LM quality proxy: fit a unigram model on the corpus
    (pass 1 → bounded vocab, driver merge), broadcast it once, score
    every doc map-side (pass 2). avg ln-prob per doc, 6-dp rounded."""
    from ..stages.textstats import make_unigram_scorer, unigram_model

    model = unigram_model(
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["text"]
        )
    )
    model_ref = ray.put(model)
    return _read_documents(sf_dir).map_batches(
        make_unigram_scorer(model_ref), batch_format="pyarrow"
    )


SQL_UNIGRAM_LOGPROB = """
WITH words AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
  FROM documents
), vocab AS (
  SELECT w, CAST(count(*) AS BIGINT) AS c FROM words GROUP BY w
), tot AS (
  SELECT sum(c) AS n FROM vocab
), scored AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
         round(avg(ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))), 6)
           AS avg_logprob
  FROM words JOIN vocab USING (w) CROSS JOIN tot
  GROUP BY doc_id
)
SELECT d.doc_id,
  coalesce(s.n_words, 0) AS n_words,
  coalesce(s.avg_logprob, 0.0) AS avg_logprob
FROM documents d LEFT JOIN scored s USING (doc_id)
"""


def q_tfidf_terms(sf_dir: str):
    """Per-doc keyword extraction: top-3 terms by tf x micro-idf
    (integer scoring — no float decides an ordering). Two passes:
    df-vocab reduce + broadcast, then map-side scoring."""
    from ..stages.textstats import idf_table, make_tfidf_scorer

    texts = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text"]
    )
    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    idf_ref = ray.put(idf_table(texts, n_docs))
    return _read_documents(sf_dir).map_batches(
        make_tfidf_scorer(idf_ref), batch_format="pyarrow"
    )


SQL_TFIDF_TERMS = """
WITH words AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
  FROM documents
), tf AS (
  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
  FROM words GROUP BY doc_id, w
), df AS (
  SELECT w, count(DISTINCT doc_id) AS df FROM words GROUP BY w
), n AS (
  SELECT count(*) AS n_docs FROM documents
), scored AS (
  SELECT doc_id, w AS term, tf,
    tf * CAST(round(ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE))
                    * 1000000) AS BIGINT) AS score
  FROM tf JOIN df USING (w) CROSS JOIN n
), ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rnk
  FROM scored
)
SELECT doc_id, term, tf, score, CAST(rnk AS BIGINT) AS rank
FROM ranked WHERE rnk <= 3
"""


def q_ivf_topk(sf_dir: str):
    """IVF-bucketed ANN (the coarse-quantizer scale path next to
    lsh_topk): 8 deterministic centroids partition the candidates
    into lists; each query probes its 2 nearest lists. Fused
    assign+probe+score inside map_batches — no shuffle."""
    from ..stages.similarity import ivf_topk

    queries_ref = ray.put(_query_vectors(sf_dir, 5))
    emb = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    cands = emb.filter(pc.greater_equal(emb["vec_id"], pa.scalar(5)))
    cent_t = cands.sort_by("vec_id").slice(0, 8)
    centroids = {
        int(i): v
        for i, v in zip(
            cent_t["vec_id"].to_pylist(), cent_t["embedding"].to_pylist()
        )
    }
    centroids_ref = ray.put(centroids)
    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(
        lambda t: t.filter(pc.greater_equal(t["vec_id"], pa.scalar(5))),
        batch_format="pyarrow",
    )
    return ivf_topk(ds, queries_ref, centroids_ref, k=10, nprobe=2)


SQL_IVF_TOPK = """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings WHERE vec_id < 5
), c AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
  FROM embeddings WHERE vec_id >= 5
), cent AS (
  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS ce
  FROM embeddings WHERE vec_id >= 5 ORDER BY vec_id LIMIT 8
), assign AS (
  SELECT vec_id, e, cid FROM (
    SELECT c.vec_id, c.e, cent.cid,
      row_number() OVER (PARTITION BY c.vec_id
        ORDER BY list_cosine_similarity(c.e, cent.ce) DESC, cent.cid
      ) AS rn
    FROM c CROSS JOIN cent) WHERE rn = 1
), probe AS (
  SELECT query_id, qe, cid FROM (
    SELECT q.query_id, q.qe, cent.cid,
      row_number() OVER (PARTITION BY q.query_id
        ORDER BY list_cosine_similarity(q.qe, cent.ce) DESC, cent.cid
      ) AS rn
    FROM q CROSS JOIN cent) WHERE rn <= 2
), scored AS (
  SELECT p.query_id, a.vec_id,
    round(list_cosine_similarity(p.qe, a.e), 6) AS sim,
    row_number() OVER (PARTITION BY p.query_id
      ORDER BY list_cosine_similarity(p.qe, a.e) DESC, a.vec_id
    ) AS rank
  FROM probe p JOIN assign a ON a.cid = p.cid
)
SELECT query_id, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM scored WHERE rank <= 10
"""


def q_ccnet_buckets(sf_dir: str):
    """CCNet head/middle/tail bucketing: per-language terciles of the
    unigram-LM score, computed as an EXACT distributed grouped ntile
    with bounded driver state (stages/ranking.py — score-histogram
    merge + boundary-tie resolution; no global sort, no shuffle).
    tile 3 = highest logprob = 'head' (CCNet keeps the head)."""
    from ..stages.ranking import ntile_by_group
    from ..stages.textstats import make_unigram_scorer, unigram_model

    model_ref = ray.put(
        unigram_model(
            ray.data.read_parquet(
                f"{sf_dir}/documents.parquet", columns=["text"]
            )
        )
    )
    scorer = make_unigram_scorer(model_ref)

    def score(batch: pa.Table) -> pa.Table:
        out = scorer(batch)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "group": batch["lang"],
                "score": out["avg_logprob"],
            }
        )

    scored = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    ).map_batches(score, batch_format="pyarrow")
    tiled = ntile_by_group(scored, 3)

    def label(batch: pa.Table) -> pa.Table:
        tiles = batch["tile"]
        names = pa.array(
            [
                "tail" if t == 1 else ("middle" if t == 2 else "head")
                for t in tiles.to_pylist()
            ],
            pa.string(),
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang": batch["group"],
                "avg_logprob": batch["score"],
                "tile": tiles,
                "bucket": names,
            }
        )

    return tiled.map_batches(label, batch_format="pyarrow")


SQL_CCNET_BUCKETS = """
WITH words AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
  FROM documents
), vocab AS (
  SELECT w, CAST(count(*) AS BIGINT) AS c FROM words GROUP BY w
), tot AS (
  SELECT sum(c) AS n FROM vocab
), scored AS (
  SELECT doc_id,
         round(avg(ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))), 6)
           AS avg_logprob
  FROM words JOIN vocab USING (w) CROSS JOIN tot
  GROUP BY doc_id
), filled AS (
  SELECT d.doc_id, d.lang, coalesce(s.avg_logprob, 0.0) AS avg_logprob
  FROM documents d LEFT JOIN scored s USING (doc_id)
), tiled AS (
  SELECT *, ntile(3) OVER (
    PARTITION BY lang ORDER BY avg_logprob, doc_id) AS tile
  FROM filled
)
SELECT doc_id, lang, avg_logprob, CAST(tile AS BIGINT) AS tile,
  CASE tile WHEN 1 THEN 'tail' WHEN 2 THEN 'middle'
       ELSE 'head' END AS bucket
FROM tiled
"""


def q_fuzzy_dedup(sf_dir: str):
    """End-to-end fuzzy dedup (the RefinedWeb/FineWeb MinHash stage as
    one op): verified near-dup pairs -> distributed connected
    components -> keep each cluster's min-doc_id representative, drop
    the rest. The loser-id set reduces off-driver, then
    relational.anti_filter applies it: broadcast while it fits the
    byte budget, hash-partitioned ``left_anti`` join past it (the
    duplicate-saturated-corpus regime) — either way the corpus itself
    never shuffles more than skinny id rows."""
    clusters = q_dup_clusters(sf_dir)

    def losers(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.not_equal(t["doc_id"], t["cluster_id"])
        ).select(["doc_id"])

    drop = clusters.map_batches(losers, batch_format="pyarrow")
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )
    return relational.anti_filter(docs, drop, "doc_id")


def _gopher_subset_mask(g: pa.Table):
    """Gopher rule conjunction MINUS the stopword-hit rule, shared by
    the funnel and corpus-export gates (see q_filter_funnel's
    docstring for why the stopword rule is omitted there). One
    definition on each side of the oracle — the SQL twin is
    :func:`_gopher_subset_sql`."""
    return pc.and_(
        pc.and_(
            pc.and_(
                pc.greater_equal(g["n_words"], textstats.GOPHER_MIN_WORDS),
                pc.less_equal(g["n_words"], textstats.GOPHER_MAX_WORDS),
            ),
            pc.and_(
                pc.greater_equal(
                    g["mean_word_len"], textstats.GOPHER_MIN_MEAN_WL
                ),
                pc.less_equal(
                    g["mean_word_len"], textstats.GOPHER_MAX_MEAN_WL
                ),
            ),
        ),
        pc.and_(
            pc.and_(
                pc.less(g["symbol_ratio"], textstats.GOPHER_MAX_SYMBOL_RATIO),
                pc.less(g["bullet_frac"], textstats.GOPHER_MAX_BULLET_FRAC),
            ),
            pc.and_(
                pc.less(
                    g["ellipsis_frac"], textstats.GOPHER_MAX_ELLIPSIS_FRAC
                ),
                pc.greater(
                    g["alpha_word_frac"], textstats.GOPHER_MIN_ALPHA_FRAC
                ),
            ),
        ),
    )


def _gopher_subset_sql() -> str:
    """SQL twin of :func:`_gopher_subset_mask`: (doc_id, passes)."""
    return f"""
  SELECT doc_id,
         (n_words BETWEEN {textstats.GOPHER_MIN_WORDS}
                      AND {textstats.GOPHER_MAX_WORDS}
          AND mean_word_len BETWEEN {textstats.GOPHER_MIN_MEAN_WL}
                                AND {textstats.GOPHER_MAX_MEAN_WL}
          AND symbol_ratio < {textstats.GOPHER_MAX_SYMBOL_RATIO}
          AND bullet_frac < {textstats.GOPHER_MAX_BULLET_FRAC}
          AND ellipsis_frac < {textstats.GOPHER_MAX_ELLIPSIS_FRAC}
          AND alpha_word_frac > {textstats.GOPHER_MIN_ALPHA_FRAC}) AS passes
  FROM ({_gopher_sql()})
"""


def q_corpus_export(sf_dir: str):
    """End-to-end training-corpus build — the composition a real
    curation run ships: gate docs (lang -> Gopher subset ->
    repetition, all map-only cumulative flags), exact-dedup the
    survivors (skinny md5 groupby -> the duplicated-hash keeper map
    broadcasts, the stale-droplist shape — text never shuffles), then
    pack the surviving stream into 512-token training bins via the
    distributed exclusive prefix sum (stages/packing.py). Output is
    the bin layout per surviving doc: what a trainer's data loader
    consumes."""
    from ..functions.broadcast import cached_get
    from ..stages import corpus
    from ..stages.dedup import add_md5_batch
    from ..stages.packing import pack_sequences

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )

    def gates(t: pa.Table) -> pa.Table:
        body = t.select(["doc_id", "text"])
        g = textstats.gopher_quality_batch(body)
        r = corpus.repetition_batch(body)
        g_ok = _gopher_subset_mask(g)
        keep = pc.and_(pc.and_(pc.equal(t["lang"], "en"), g_ok), r["keep"])
        return t.filter(keep)

    # hashed ONCE, materialized ONCE: the md5 column serves both the
    # dedup groupby and the loser filter, and pack_sequences consumes
    # its input twice (partials pass + fill pass) — without the
    # materialize every consumer would replay the gates + hashing
    hashed = (
        docs.map_batches(gates, batch_format="pyarrow")
        .map_batches(add_md5_batch, batch_format="pyarrow")
        .materialize()
    )
    ded = hashed.groupby("md5_hash").aggregate(
        Min("doc_id", alias_name="doc_id"),
        Count(alias_name="n_copies"),
    )

    def dup_keepers(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(t["n_copies"], 1)).select(
            ["md5_hash", "doc_id"]
        )

    # budget guard (the stale_droplist precedent): the keeper map is
    # proportional to DUPLICATED hashes only, but a duplicate-saturated
    # corpus could still bust a broadcast — refs stream one at a time
    # and the guard trips BEFORE the driver accumulates past the
    # budget, failing loud with the escape hatch rather than silently
    # shipping gigabytes to every worker
    keeper_map = {}
    total_bytes = 0
    for ref in (
        ded.map_batches(dup_keepers, batch_format="pyarrow").to_arrow_refs()
    ):
        t = ray.get(ref)
        if not t.num_rows:
            continue
        total_bytes += t.nbytes
        if total_bytes > relational.ANTI_FILTER_BUDGET_BYTES:
            raise RuntimeError(
                "corpus_export keeper map exceeds the broadcast budget; "
                "dedup via relational.anti_filter(hashed, losers, "
                "'doc_id') with the left_anti join regime instead"
            )
        keeper_map.update(
            zip(t["md5_hash"].to_pylist(), t["doc_id"].to_pylist())
        )
    keeper_ref = ray.put(keeper_map)

    def drop_losers(t: pa.Table) -> pa.Table:
        keepers = cached_get(keeper_ref)
        if not keepers:
            return t.drop_columns(["md5_hash"])
        keep = [
            h not in keepers or i == keepers[h]
            for h, i in zip(
                t["md5_hash"].to_pylist(), t["doc_id"].to_pylist()
            )
        ]
        return t.filter(pa.array(keep, pa.bool_())).drop_columns(
            ["md5_hash"]
        )

    unique_docs = hashed.map_batches(drop_losers, batch_format="pyarrow")
    return pack_sequences(unique_docs)


def q_token_shard_export(sf_dir: str):
    """Tokenized-shard export (sinks/tokshard.py): the fixed-size
    .bin/.idx mmap layout a trainer's loader consumes, one step past
    corpus_export's bin plan. The registry entry runs the full
    distributed assembly (map-side md5-nibble tokenization -> packing
    chunk-offset scan -> per-shard segmenting -> bounded-partition
    shard assembly) WITHOUT file I/O and returns per-shard metadata
    derived from the assembled BYTES (count / sum / first / last token
    id) — the oracle recomputes the same from SQL nibble arithmetic,
    so a byte mis-assembly (wrong order, wrong split, wrong id) breaks
    the hash. File writing + resume are pinned by
    tests/test_tokshard.py."""
    from ..sinks.tokshard import export_token_shards

    return export_token_shards(
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet",
            columns=["doc_id", "lang", "text"],
        )
    )


def _token_shard_sql() -> str:
    from ..sinks.tokshard import SHARD_TOKENS

    return rf"""
WITH t AS (
  SELECT doc_id, lang,
         regexp_extract_all(text, '{_ASCII_TOK_PAT}') AS toks
  FROM documents),
s AS (
  SELECT doc_id, lang, toks,
    CAST(COALESCE(SUM(len(toks)) OVER (PARTITION BY lang ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      AS start
  FROM t),
u AS (
  SELECT lang,
         start + CAST(unnest(range(len(toks))) AS BIGINT) AS pos,
         md5(unnest(toks)) AS hh
  FROM s),
ids AS (
  SELECT lang, pos, pos // {SHARD_TOKENS} AS shard_id,
    (strpos('0123456789abcdef', substr(hh, 1, 1)) - 1) * 4096
    + (strpos('0123456789abcdef', substr(hh, 2, 1)) - 1) * 256
    + (strpos('0123456789abcdef', substr(hh, 3, 1)) - 1) * 16
    + (strpos('0123456789abcdef', substr(hh, 4, 1)) - 1) AS tid
  FROM u)
SELECT lang, CAST(shard_id AS BIGINT) AS shard_id,
  CAST(count(*) AS BIGINT) AS n_tokens,
  CAST(sum(tid) AS BIGINT) AS tok_sum,
  CAST(arg_min(tid, pos) AS BIGINT) AS first_tok,
  CAST(arg_max(tid, pos) AS BIGINT) AS last_tok
FROM ids GROUP BY lang, shard_id
"""


def _corpus_export_sql() -> str:
    return f"""
WITH g AS ({_gopher_subset_sql()}
), rep AS (
  SELECT doc_id, keep FROM ({SQL_REPETITION_STATS})
), s3 AS (
  SELECT d.doc_id, d.lang, d.text
  FROM documents d
  JOIN g USING (doc_id) JOIN rep USING (doc_id)
  WHERE d.lang = 'en' AND g.passes AND rep.keep
), ded AS (
  SELECT doc_id, lang, text FROM (
    SELECT s3.*, min(doc_id) OVER (PARTITION BY text) AS keeper FROM s3
  ) WHERE doc_id = keeper
), t AS (
  SELECT doc_id, lang,
         CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens
  FROM ded
), s AS (
  SELECT doc_id, lang, n_tokens,
    CAST(COALESCE(SUM(n_tokens) OVER (
      PARTITION BY lang ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      AS start_tok
  FROM t
)
SELECT doc_id, lang, n_tokens, start_tok,
  start_tok // 512 AS bin_id,
  CASE WHEN n_tokens = 0 THEN CAST(1 AS BIGINT)
       ELSE (start_tok + n_tokens - 1) // 512 - start_tok // 512 + 1
  END AS n_bins
FROM s
"""


# UT1-style blocklist: the host set a curation pass drops (CCNet /
# RefinedWeb gate crawls against the UT1 adult/malware lists). Here a
# deterministic 25% of the synthetic hosts stands in for the list.
BLOCKED_HOSTS = tuple(f"site-{k}.example" for k in range(5))


def q_domain_blocklist(sf_dir: str):
    """URL-curation gate: drop every crawl whose host is on a blocklist
    (UT1-style, the standard pre-download filter in CCNet/RefinedWeb).
    The list broadcasts as a value set; the pass is map-only and fully
    vectorized (one Arrow regex + one ``is_in`` per batch) — at crawl
    scale this runs against the URL INDEX before any payload is
    fetched, which is the whole point of the stage."""
    from ..sources.synth import url_for

    ids = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    )
    blocked = pa.array(list(BLOCKED_HOSTS), pa.string())

    def gate(t: pa.Table) -> pa.Table:
        urls = pa.array(
            [url_for(i) for i in t["doc_id"].to_pylist()], pa.string()
        )
        host = pc.fill_null(
            pc.struct_field(
                pc.extract_regex(urls, r"https://(?P<host>[^/]+)/"), "host"
            ),
            "",
        )
        keep = pc.invert(pc.is_in(host, value_set=blocked))
        return pa.table(
            {"doc_id": t["doc_id"], "url": urls, "host": host}
        ).filter(keep)

    return ids.map_batches(gate, batch_format="pyarrow")


SQL_DOMAIN_BLOCKLIST = f"""
WITH urls AS (
  SELECT doc_id,
         'https://site-' || CAST(doc_id % 20 AS VARCHAR)
           || '.example/doc/' || CAST(doc_id AS VARCHAR) AS url
  FROM documents
), t AS (
  SELECT doc_id, url,
         regexp_extract(url, 'https://([^/]+)/', 1) AS host
  FROM urls
)
SELECT doc_id, url, host FROM t
WHERE host NOT IN ({", ".join(f"'{h}'" for h in BLOCKED_HOSTS)})
"""


def q_filter_funnel(sf_dir: str):
    """FineWeb-style curation funnel with per-stage attrition: lang
    gate -> Gopher quality gate -> repetition gate -> exact dedup,
    reporting (stage, n_in, n_kept) for each stage. One map-only pass
    computes CUMULATIVE pass flags per doc (reusing the exact gate
    batch fns the individual queries run); counts reduce via one tiny
    flag aggregate, and the dedup stage counts distinct survivor
    hashes with a skinny md5-only shuffle — document text never moves.
    The per-stage counts are what a curation run reports as its
    attrition table (FineWeb ablation-style).

    The quality stage uses the Gopher rule set MINUS the stopword-hit
    rule: the synthetic corpus vocabulary contains no English
    stopwords, so the full conjunction (the standalone
    ``gopher_quality`` op, which stays faithful to Rae et al. Table
    A1) would zero the funnel at stage 2 and exercise nothing
    downstream."""
    from ..functions.hashing import md5_hex
    from ..stages import corpus

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )

    def flags(t: pa.Table) -> pa.Table:
        body = t.select(["doc_id", "text"])
        g = textstats.gopher_quality_batch(body)
        r = corpus.repetition_batch(body)
        g_ok = _gopher_subset_mask(g)
        p1 = pc.equal(t["lang"], "en")
        p2 = pc.and_(p1, g_ok)
        p3 = pc.and_(p2, r["keep"])
        surv = p3.to_pylist()
        md5s = [
            md5_hex(x) if ok else ""
            for x, ok in zip(t["text"].to_pylist(), surv)
        ]
        return pa.table(
            {
                "p1": pc.cast(p1, pa.int64()),
                "p2": pc.cast(p2, pa.int64()),
                "p3": pc.cast(p3, pa.int64()),
                "md5": pa.array(md5s, pa.string()),
            }
        )

    flagged = docs.map_batches(flags, batch_format="pyarrow").materialize()
    agg = flagged.aggregate(
        Count(alias_name="n0"),
        Sum("p1", alias_name="n1"),
        Sum("p2", alias_name="n2"),
        Sum("p3", alias_name="n3"),
    )
    n4 = (
        flagged.map_batches(
            lambda t: t.filter(pc.not_equal(t["md5"], "")).select(["md5"]),
            batch_format="pyarrow",
        )
        .groupby("md5")
        .count()
        .count()
    )
    n0, n1, n2, n3 = (int(agg[k]) for k in ("n0", "n1", "n2", "n3"))
    stages = [
        (1, "lang", n0, n1),
        (2, "gopher", n1, n2),
        (3, "repetition", n2, n3),
        (4, "exact_dedup", n3, int(n4)),
    ]
    return pa.table(
        {
            "stage_no": pa.array([s[0] for s in stages], pa.int64()),
            "stage": pa.array([s[1] for s in stages], pa.string()),
            "n_in": pa.array([s[2] for s in stages], pa.int64()),
            "n_kept": pa.array([s[3] for s in stages], pa.int64()),
        }
    )


def _filter_funnel_sql() -> str:
    return f"""
WITH g AS ({_gopher_subset_sql()}
), rep AS (
  SELECT doc_id, keep FROM ({SQL_REPETITION_STATS})
), s1 AS (
  SELECT d.doc_id, d.text FROM documents d WHERE d.lang = 'en'
), s2 AS (
  SELECT s1.* FROM s1 JOIN g USING (doc_id) WHERE g.passes
), s3 AS (
  SELECT s2.* FROM s2 JOIN rep USING (doc_id) WHERE rep.keep
), n AS (
  SELECT (SELECT count(*) FROM documents) AS n0,
         (SELECT count(*) FROM s1) AS n1,
         (SELECT count(*) FROM s2) AS n2,
         (SELECT count(*) FROM s3) AS n3,
         (SELECT count(DISTINCT text) FROM s3) AS n4
)
SELECT CAST(stage_no AS BIGINT) AS stage_no, stage,
       CAST(n_in AS BIGINT) AS n_in, CAST(n_kept AS BIGINT) AS n_kept
FROM (
  SELECT 1 AS stage_no, 'lang' AS stage, n0 AS n_in, n1 AS n_kept FROM n
  UNION ALL SELECT 2, 'gopher', n1, n2 FROM n
  UNION ALL SELECT 3, 'repetition', n2, n3 FROM n
  UNION ALL SELECT 4, 'exact_dedup', n3, n4 FROM n
)
"""


def q_term_postings(sf_dir: str):
    """Distributed inverted-index build: term -> sorted posting list
    of doc_ids (+ df). Map-side distinct (term, doc_id) pairs, then
    terms hash into BOUNDED partitions (never one group per term —
    the per-group-overhead cliff) and each partition assembles its
    postings vectorized: one pyarrow sort + one grouped list-agg, with
    only the final join-to-string loop at vocab/partition granularity.
    At 100 TB each partition writes its postings shard independently —
    a hash-partitioned index artifact, resumable per partition."""
    from ..functions.hashing import stable_u64

    num_parts = 32

    def pairs(t: pa.Table) -> pa.Table:
        import re as _re

        words_col, ids_col, parts_col = [], [], []
        for did, text in zip(
            t["doc_id"].to_pylist(), t["text"].to_pylist()
        ):
            for w in set(_re.findall(r"[a-z]+", text.lower())):
                words_col.append(w)
                ids_col.append(did)
                parts_col.append(stable_u64(w) % num_parts)
        return pa.table(
            {
                "term": pa.array(words_col, pa.string()),
                "doc_id": pa.array(ids_col, pa.int64()),
                "part": pa.array(parts_col, pa.int32()),
            }
        )

    def assemble(df):
        t = pa.Table.from_pandas(df, preserve_index=False)
        t = t.sort_by([("term", "ascending"), ("doc_id", "ascending")])
        g = pa.TableGroupBy(t, "term", use_threads=False).aggregate(
            [("doc_id", "list"), ("doc_id", "count")]
        )
        postings = [
            ",".join(str(i) for i in lst)
            for lst in g["doc_id_list"].to_pylist()
        ]
        return pa.table(
            {
                "term": g["term"],
                "df": pc.cast(g["doc_id_count"], pa.int64()),
                "postings": pa.array(postings, pa.string()),
            }
        ).to_pandas()

    return (
        _read_documents(sf_dir)
        .map_batches(pairs, batch_format="pyarrow")
        .groupby("part")
        .map_groups(assemble, batch_format="pandas")
    )


SQL_TERM_POSTINGS = """
WITH words AS (
  SELECT DISTINCT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
  FROM documents
)
SELECT term, CAST(count(*) AS BIGINT) AS df,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
FROM words GROUP BY term
"""


def q_bigram_logprob(sf_dir: str):
    """Bigram-LM quality proxy (one step closer to CCNet's KenLM
    filter than unigram_logprob): Laplace-smoothed p(w2|w1) fit on the
    corpus in one distributed counting pass, broadcast once, scored
    map-side. avg bigram ln-prob per doc, 6-dp rounded."""
    from ..stages.textstats import bigram_model, make_bigram_scorer

    model = bigram_model(
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["text"]
        )
    )
    model_ref = ray.put(model)
    return _read_documents(sf_dir).map_batches(
        make_bigram_scorer(model_ref), batch_format="pyarrow"
    )


SQL_BIGRAM_LOGPROB = """
WITH words AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w,
         generate_subscripts(regexp_extract_all(lower(text), '[a-z]+'), 1)
           AS ord
  FROM documents
), pairs AS (
  SELECT doc_id, lag(w) OVER (PARTITION BY doc_id ORDER BY ord) AS w1,
         w AS w2
  FROM words
  QUALIFY w1 IS NOT NULL
), uni AS (
  SELECT w, CAST(count(*) AS BIGINT) AS c1 FROM words GROUP BY w
), v AS (
  SELECT count(*) AS v FROM uni
), big AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
  FROM pairs GROUP BY w1, w2
), scored AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         round(avg(ln((CAST(c12 AS DOUBLE) + 1)
                      / CAST(c1 + v AS DOUBLE))), 6) AS avg_logprob
  FROM pairs
  JOIN big USING (w1, w2)
  JOIN uni ON uni.w = pairs.w1
  CROSS JOIN v
  GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(s.n_bigrams, 0) AS n_bigrams,
       coalesce(s.avg_logprob, 0.0) AS avg_logprob
FROM documents d LEFT JOIN scored s USING (doc_id)
"""


def q_bloom_new_urls(sf_dir: str):
    """Dolma-style Bloom seen-set: build a Bloom filter over the
    previous crawl's urls (crawl A = doc_id %% 4 < 2) with a
    distributed OR-merge of per-block bit arrays, broadcast it once
    (128 KiB regardless of key count), and keep only the current
    crawl's (crawl B = even doc_ids) urls that are guaranteed new.
    No false negatives by construction; the FP rate at these filter
    parameters is < 1e-12, and the pytest pins zero-FP equality with
    the exact anti-join at test scale. Oracle: the exact anti-join."""
    from ..sources.synth import url_for
    from ..stages.dedup import bloom_build, make_bloom_probe

    ids = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    )

    def with_url(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "url": pa.array(
                    [url_for(i) for i in t["doc_id"].to_pylist()], pa.string()
                ),
            }
        )

    def crawl_a_rows(t: pa.Table) -> pa.Table:
        return t.filter(pc.less(pc.bit_wise_and(t["doc_id"], 3), 2))

    def crawl_b_rows(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(pc.bit_wise_and(t["doc_id"], 1), 0))

    # materialized: the url table is consumed twice (bloom build, then
    # the crawl-B probe) — without this the parquet read + python url
    # synthesis would re-execute for the second consumer
    urls = ids.map_batches(with_url, batch_format="pyarrow").materialize()
    bits_ref = ray.put(
        bloom_build(
            urls.map_batches(crawl_a_rows, batch_format="pyarrow"),
            key_col="url",
        )
    )
    return (
        urls.map_batches(crawl_b_rows, batch_format="pyarrow")
        .map_batches(
            make_bloom_probe(bits_ref, key_col="url"), batch_format="pyarrow"
        )
    )


SQL_BLOOM_NEW_URLS = """
WITH urls AS (
  SELECT doc_id,
         'https://site-' || CAST(doc_id % 20 AS VARCHAR)
           || '.example/doc/' || CAST(doc_id AS VARCHAR) AS url
  FROM documents
), a AS (
  SELECT url FROM urls WHERE doc_id % 4 < 2
), b AS (
  SELECT doc_id, url FROM urls WHERE doc_id % 2 = 0
)
SELECT doc_id, url FROM b
WHERE url NOT IN (SELECT url FROM a)
"""


def _within_edit1(a: str, b: str) -> bool:
    """Levenshtein(a, b) <= 1, branch-exact with DuckDB levenshtein:
    equal strings, one substitution, or one insertion/deletion."""
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(1 for x, y in zip(a, b) if x != y) <= 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1 :]


def q_fuzzy_url_join(sf_dir: str):
    """Approximate string self-join (record linkage): all url pairs
    within edit distance 1, via SymSpell deletion-neighborhood
    blocking (Garbe's symmetric-delete algorithm) — each url emits itself plus every single-character
    deletion as candidate keys (COMPLETE for distance <= 1: a
    substitution shares the both-deleted key, an insertion's deletion
    IS the other string), keys hash into 64 bounded partitions,
    candidate pairs verify with an exact distance check inside the
    partition, and only the verified near-dup pairs (tiny by
    construction) reach the final distinct. Never quadratic: compute
    = sum of squares of per-key bucket sizes, not corpus^2."""
    import itertools

    import numpy as np

    from ..functions.hashing import deletion_hashes64
    from ..sources.synth import url_for

    ids = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    )

    def keyed(t: pa.Table) -> pa.Table:
        # shuffle (key-HASH u64, doc_id) — 16 bytes/row instead of two
        # ~40-char strings; urls are rebuilt from doc_id inside the
        # verify partition. Deletion-key hashes come from ONE
        # prefix-hash pass per url (polynomial hashes compose under
        # concatenation — no per-key hashlib). A hash collision can
        # only ADD a candidate pair, which the exact verify rejects —
        # blocking stays complete (equal keys always hash equal).
        ks, ds_ = [], []
        for did in t["doc_id"].to_pylist():
            h = np.unique(deletion_hashes64(url_for(did)))
            ks.append(h)
            ds_.append(np.full(len(h), did, dtype=np.int64))
        hs = (
            np.concatenate(ks)
            if ks
            else np.empty(0, dtype=np.uint64)
        )
        dd = (
            np.concatenate(ds_)
            if ds_
            else np.empty(0, dtype=np.int64)
        )
        return pa.table(
            {
                "k": pa.array(
                    (hs >> np.uint64(1)).astype(np.int64), pa.int64()
                ),
                "doc_id": pa.array(dd, pa.int64()),
                "part": pa.array(
                    (hs & np.uint64(63)).astype(np.int32), pa.int32()
                ),
            }
        )

    def bucket_pairs(df):
        import pandas as pd

        k = df["k"].to_numpy()
        d = df["doc_id"].to_numpy()
        order = np.lexsort((d, k))
        k, d = k[order], d[order]
        bounds = np.flatnonzero(np.diff(k)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(k)]))
        out_a, out_b = [], []
        seen: set = set()
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            dids = sorted(set(d[s:e].tolist()))
            if len(dids) < 2:
                continue
            urls = sorted(url_for(x) for x in dids)
            for a, b in itertools.combinations(urls, 2):
                if (a, b) in seen:
                    continue
                seen.add((a, b))
                if _within_edit1(a, b):
                    out_a.append(a)
                    out_b.append(b)
        return pd.DataFrame({"url_a": out_a, "url_b": out_b})

    def pair_part(t: pa.Table) -> pa.Table:
        import zlib

        part = [
            zlib.crc32(f"{a}\x1f{b}".encode()) % 64
            for a, b in zip(t["url_a"].to_pylist(), t["url_b"].to_pylist())
        ]
        return t.append_column("pp", pa.array(part, pa.int32()))

    return (
        ids.map_batches(keyed, batch_format="pyarrow")
        .groupby("part")
        .map_groups(bucket_pairs, batch_format="pandas")
        # a pair is re-found under every shared key: distinct in
        # bounded hash partitions with ONE vectorized drop_duplicates
        # per partition (a per-pair groupby would pay Ray's
        # multi-column-aggregate cliff; same key → same partition, so
        # the distinct is still global)
        .map_batches(pair_part, batch_format="pyarrow")
        .groupby("pp")
        .map_groups(
            lambda df: df.drop_duplicates(["url_a", "url_b"])[
                ["url_a", "url_b"]
            ],
            batch_format="pandas",
        )
    )


SQL_FUZZY_URL_JOIN = """
WITH urls AS (
  SELECT 'https://site-' || CAST(doc_id % 20 AS VARCHAR)
         || '.example/doc/' || CAST(doc_id AS VARCHAR) AS url
  FROM documents
), keys AS (
  SELECT DISTINCT url,
    unnest([url] || list_transform(range(1, length(url) + 1),
      i -> substr(url, 1, i - 1) || substr(url, i + 1))) AS k
  FROM urls
), cand AS (
  SELECT DISTINCT a.url AS url_a, b.url AS url_b
  FROM keys a JOIN keys b ON a.k = b.k AND a.url < b.url
)
SELECT url_a, url_b FROM cand WHERE levenshtein(url_a, url_b) <= 1
"""


def q_dsir_weights(sf_dir: str):
    """DSIR importance weighting (Xie et al. 2023): per-doc
    length-normalized log-likelihood ratio of a target-domain (lang
    'en') unigram model vs the whole-corpus model, Laplace-smoothed
    over the joint vocab. One counting pass feeds both models; the
    ratio table broadcasts once; scoring is map-only."""
    from ..stages.textstats import dsir_model, make_dsir_scorer

    model = dsir_model(
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["text", "lang"]
        ),
        target_lang="en",
    )
    model_ref = ray.put(model)
    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    ).map_batches(make_dsir_scorer(model_ref), batch_format="pyarrow")


SQL_DSIR_WEIGHTS = """
WITH words AS (
  SELECT doc_id, lang,
         unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
  FROM documents
), vocab AS (
  SELECT w, CAST(count(*) AS BIGINT) AS cs,
         CAST(count(*) FILTER (WHERE lang = 'en') AS BIGINT) AS ct
  FROM words GROUP BY w
), tot AS (
  SELECT sum(cs) AS s, sum(ct) AS t, count(*) AS v FROM vocab
), scored AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
         round(avg(
           ln((CAST(ct AS DOUBLE) + 1) / CAST(t + v AS DOUBLE))
           - ln((CAST(cs AS DOUBLE) + 1) / CAST(s + v AS DOUBLE))
         ), 6) AS log_weight
  FROM words JOIN vocab USING (w) CROSS JOIN tot
  GROUP BY doc_id
)
SELECT d.doc_id, d.lang,
       coalesce(s.n_words, 0) AS n_words,
       coalesce(s.log_weight, 0.0) AS log_weight
FROM documents d LEFT JOIN scored s USING (doc_id)
"""


SQL_DSIR_RESAMPLE = f"""
WITH dw AS ({SQL_DSIR_WEIGHTS}),
hh AS ({_HH_SQL})
SELECT d.doc_id, d.lang, d.log_weight
FROM dw d JOIN hh USING (doc_id)
WHERE hh.hv % 1000000
      < CAST(round(1000000.0 / (1.0 + exp(-d.log_weight))) AS BIGINT)
"""


def q_dup_ngram_spans(sf_dir: str):
    """Exact-substring duplication proxy (Lee et al. 2021 / RefinedWeb
    exact-substring stage): word 5-grams occurring in >= 2 distinct
    docs mark duplicated spans; per doc emit total 5-gram positions,
    duplicated positions, and the duplicated fraction. Two passes:
    bounded-budget df droplist over hashed n-grams (stages/corpus.py),
    then a map-only scoring pass with the droplist broadcast once."""
    from ..stages import corpus

    docs = _read_documents(sf_dir)
    dup = corpus.dup_ngram_set(
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    )
    dup_ref = ray.put(dup)
    return docs.map_batches(
        corpus.make_ngram_span_counter(dup_ref), batch_format="pyarrow"
    )


SQL_DUP_NGRAM_SPANS = """
WITH words AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS w,
         generate_subscripts(regexp_extract_all(text, '\\S+'), 1) AS ord
  FROM documents
), grams AS (
  SELECT doc_id,
         w || ' ' || lead(w, 1) OVER win || ' ' || lead(w, 2) OVER win
           || ' ' || lead(w, 3) OVER win || ' ' || lead(w, 4) OVER win AS g
  FROM words WINDOW win AS (PARTITION BY doc_id ORDER BY ord)
  QUALIFY lead(w, 4) OVER win IS NOT NULL
), dup AS (
  SELECT g FROM grams GROUP BY g HAVING count(DISTINCT doc_id) >= 2
), per_doc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         CAST(count(*) FILTER (WHERE g IN (SELECT g FROM dup)) AS BIGINT)
           AS n_dup
  FROM grams GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(p.n_grams, 0) AS n_grams,
       COALESCE(p.n_dup, 0) AS n_dup,
       CASE WHEN p.n_grams IS NULL THEN NULL
            ELSE p.n_dup / p.n_grams END AS dup_frac
FROM documents d LEFT JOIN per_doc p USING (doc_id)
"""


# Survivor set = every document that is not a non-representative
# member of a near-dup cluster; clusters come from the same recursive
# closure as SQL_DUP_CLUSTERS over the inlined MinHash pair SQL.
SQL_FUZZY_DEDUP = f"""
WITH RECURSIVE pairs AS ({SQL_MINHASH_NEAR_DUPS}),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs
), reach(node, label) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node
), clusters AS (
  SELECT CAST(node AS BIGINT) AS doc_id,
         CAST(min(label) AS BIGINT) AS cluster_id
  FROM reach GROUP BY node
)
SELECT d.doc_id, d.n_chars
FROM documents d LEFT JOIN clusters c USING (doc_id)
WHERE c.doc_id IS NULL OR c.cluster_id = d.doc_id
"""


# ------------------------------------------------ round-4 additions


def q_markov_transitions(sf_dir: str):
    """Event-type transition matrix (first-order Markov counts): for
    every user, count consecutive (prev_type -> type) pairs in (ts,
    event_id) order. Scale shape: users hash into bounded partitions
    (relational.markov_transitions), each partition reduces to at most
    type-vocab^2 partial rows, and the final merge is one single-block
    pass over 64 tiny partials — the event stream itself never
    shuffles by pair key."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"],
    )
    return relational.markov_transitions(ds)


SQL_MARKOV_TRANSITIONS = """
WITH s AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
)
SELECT prev_type AS from_type, event_type AS to_type,
       CAST(count(*) AS BIGINT) AS n
FROM s WHERE prev_type IS NOT NULL GROUP BY 1, 2
"""


def q_interval_coverage(sf_dir: str):
    """Per-user interval-union coverage: every event opens a 15-minute
    [ts, ts+W) activity window; overlapping/touching windows merge and
    the total covered microseconds per user is summed (the
    gaps-and-islands shape). Bounded user-hash partitions, all-int64
    arithmetic — exact against the SQL islands formulation."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )
    return relational.interval_coverage(ds)


SQL_INTERVAL_COVERAGE = """
WITH iv AS (
  SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + 900000000 AS e
  FROM events
), m AS (
  SELECT user_id, s, e,
         max(e) OVER (PARTITION BY user_id ORDER BY s
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS prev_max_e
  FROM iv
), isl AS (
  SELECT user_id, s, e,
         CASE WHEN prev_max_e IS NULL OR s > prev_max_e
              THEN 1 ELSE 0 END AS brk
  FROM m
), grp AS (
  SELECT user_id, s, e,
         sum(brk) OVER (PARTITION BY user_id ORDER BY s
           ROWS UNBOUNDED PRECEDING) AS island_id
  FROM isl
)
SELECT user_id, CAST(sum(mx - mn) AS BIGINT) AS covered_us FROM (
  SELECT user_id, island_id, min(s) AS mn, max(e) AS mx
  FROM grp GROUP BY user_id, island_id
) GROUP BY user_id
"""


def q_running_distinct(sf_dir: str):
    """Per-event running DISTINCT-type count per user (inclusive) —
    the windowed count(DISTINCT) SQL window functions cannot express;
    the oracle is the correlated-subquery definition. Bounded
    user-hash partitions; within each, one duplicated() pass marks
    first occurrences and a boundary-rebased cumsum counts them."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"],
    )
    return relational.running_distinct(ds)


SQL_RUNNING_DISTINCT = """
SELECT e.event_id,
  (SELECT CAST(count(DISTINCT e2.event_type) AS BIGINT) FROM events e2
    WHERE e2.user_id = e.user_id
      AND (e2.ts < e.ts
           OR (e2.ts = e.ts AND e2.event_id <= e.event_id))
  ) AS n_distinct_types
FROM events e
"""


def q_skyline(sf_dir: str):
    """Pareto frontier (skyline) of lineitem on (quantity max,
    discount max): rows no other row dominates. Scale shape: skyline
    is union-compatible — skyline(A ∪ B) = skyline(skyline(A) ∪
    skyline(B)) — so every block prunes LOCALLY first (an O(n log n)
    suffix-max pass, relational.pareto_keep) and only the tiny
    per-block frontiers reach the final single-block prune; the table
    never shuffles and nothing corpus-sized is centralized. Values
    quantized to exact ints (cents / basis points) so dominance
    ties are bit-identical to the SQL formulation."""
    import numpy as np

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_quantity", "l_discount"],
    )

    def prune(t: pa.Table) -> pa.Table:
        qty_c = np.floor(
            t["l_quantity"].to_numpy() * 100.0 + 0.5
        ).astype(np.int64)
        disc_bp = np.floor(
            t["l_discount"].to_numpy() * 10000.0 + 0.5
        ).astype(np.int64)
        keep = relational.pareto_keep(qty_c, disc_bp)
        return pa.table(
            {
                "l_orderkey": pa.array(
                    t["l_orderkey"].to_numpy()[keep], pa.int64()
                ),
                "l_linenumber": pa.array(
                    t["l_linenumber"].to_numpy()[keep].astype(np.int32),
                    pa.int32(),
                ),
                "qty_c": pa.array(qty_c[keep], pa.int64()),
                "disc_bp": pa.array(disc_bp[keep], pa.int64()),
            }
        )

    def prune_final(t: pa.Table) -> pa.Table:
        keep = relational.pareto_keep(
            t["qty_c"].to_numpy(), t["disc_bp"].to_numpy()
        )
        return t.filter(pa.array(keep))

    return (
        ds.map_batches(prune, batch_format="pyarrow")
        .repartition(1)
        .map_batches(prune_final, batch_format="pyarrow", batch_size=None)
    )


# mirror of the engine algorithm (per-coordinate strict-suffix maxima),
# not a quadratic NOT EXISTS: dominated iff some strictly-greater qty
# group reaches its disc, or some strictly-greater disc group reaches
# its qty. Both quantities are non-negative, so -1 is a safe floor.
SQL_SKYLINE = """
WITH t AS (
  SELECT l_orderkey, l_linenumber,
         CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS qty_c,
         CAST(floor(l_discount * 10000 + 0.5) AS BIGINT) AS disc_bp
  FROM lineitem
), s1 AS (
  SELECT qty_c, max(md) OVER (ORDER BY qty_c DESC
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mx_disc_gt
  FROM (SELECT qty_c, max(disc_bp) AS md FROM t GROUP BY qty_c)
), s2 AS (
  SELECT disc_bp, max(mq) OVER (ORDER BY disc_bp DESC
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mx_qty_gt
  FROM (SELECT disc_bp, max(qty_c) AS mq FROM t GROUP BY disc_bp)
)
SELECT t.l_orderkey, t.l_linenumber, t.qty_c, t.disc_bp
FROM t JOIN s1 USING (qty_c) JOIN s2 USING (disc_bp)
WHERE coalesce(s1.mx_disc_gt, -1) < t.disc_bp
  AND coalesce(s2.mx_qty_gt, -1) < t.qty_c
"""


def q_lang_regression(sf_dir: str):
    """Per-language OLS fit of whitespace-token count on n_chars —
    the grouped-regression shape: ONE map pass reduces each batch to
    five exact integer moments PER LANG (n, sx, sy, sxx, sxy), the
    lang-keyed partials (a handful of rows per block) merge on the
    driver, and slope/intercept derive from the same explicit float
    expression on both sides (6-dp rounded). Nothing corpus-sized
    moves."""
    import numpy as np
    import pandas as pd

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "text", "n_chars"]
    )

    def moments(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "lang": t["lang"].to_pylist(),
                "x": t["n_chars"].to_numpy().astype(object),
                "y": np.array(
                    [
                        len(textstats._RE_TOKEN.findall(s))
                        for s in t["text"].to_pylist()
                    ],
                    dtype=object,
                ),
            }
        )
        df["xx"] = df["x"] * df["x"]
        df["xy"] = df["x"] * df["y"]
        g = df.groupby("lang", sort=False)
        agg = g.agg(
            n=("x", "size"), sx=("x", "sum"), sy=("y", "sum"),
            sxx=("xx", "sum"), sxy=("xy", "sum"),
        ).reset_index()
        return pa.table(
            {
                "lang": pa.array(agg["lang"], pa.string()),
                **{
                    c: pa.array(
                        [int(v) for v in agg[c]], pa.int64()
                    )
                    for c in ("n", "sx", "sy", "sxx", "sxy")
                },
            }
        )

    m = (
        ds.map_batches(moments, batch_format="pyarrow")
        .to_pandas()
        .groupby("lang", sort=True)
        .sum()
    )
    langs, slopes, intercepts, ns = [], [], [], []
    for lang, r in m.iterrows():
        n, sx, sy, sxx, sxy = (
            int(r["n"]), int(r["sx"]), int(r["sy"]),
            int(r["sxx"]), int(r["sxy"]),
        )
        den = n * sxx - sx * sx
        langs.append(lang)
        ns.append(n)
        if den > 0:
            slopes.append(_round6((n * sxy - sx * sy) / den))
            intercepts.append(_round6((sy * sxx - sx * sxy) / den))
        else:
            slopes.append(None)
            intercepts.append(None)
    return pa.table(
        {
            "lang": pa.array(langs, pa.string()),
            "n_docs": pa.array(ns, pa.int64()),
            "slope": pa.array(slopes, pa.float64()),
            "intercept": pa.array(intercepts, pa.float64()),
        }
    )


SQL_LANG_REGRESSION = r"""
WITH m AS (
  SELECT lang, count(*) AS n,
    CAST(sum(n_chars) AS BIGINT) AS sx,
    CAST(sum(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS sy,
    CAST(sum(n_chars * n_chars) AS BIGINT) AS sxx,
    CAST(sum(n_chars * len(regexp_extract_all(text, '\S+')))
         AS BIGINT) AS sxy
  FROM documents GROUP BY lang
)
SELECT lang, CAST(n AS BIGINT) AS n_docs,
  CASE WHEN n * sxx - sx * sx > 0
       THEN round(CAST(n * sxy - sx * sy AS DOUBLE)
                  / CAST(n * sxx - sx * sx AS DOUBLE), 6)
       ELSE NULL END AS slope,
  CASE WHEN n * sxx - sx * sx > 0
       THEN round(CAST(sy * sxx - sx * sxy AS DOUBLE)
                  / CAST(n * sxx - sx * sx AS DOUBLE), 6)
       ELSE NULL END AS intercept
FROM m
"""


def q_embedding_quantize(sf_dir: str):
    """Per-vector int8 symmetric quantization (the
    embedding-compression step before an ANN index ships): scale each
    vector by 127/max|x| and round half-up; all-zero vectors quantize
    to zeros. Pure map — embarrassingly parallel, one pass, exploded
    to (vec_id, dim, q) rows map-side. Exactness: |x| and max are
    rounding-free in both engines, and both sides evaluate the SAME
    double expression floor(x*127/m + 0.5), so quantized codes are
    bit-identical."""
    import numpy as np

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def quant(t: pa.Table) -> pa.Table:
        emb = t["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        flat = emb.flatten().to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        offs = emb.offsets.to_numpy()
        lens = np.diff(offs)
        vec_id = np.repeat(t["vec_id"].to_numpy(), lens)
        dim = np.arange(len(flat), dtype=np.int64) - np.repeat(
            offs[:-1], lens
        )
        m = np.zeros(len(lens), dtype=np.float64)
        np.maximum.at(
            m, np.repeat(np.arange(len(lens)), lens), np.abs(flat)
        )
        mrep = np.repeat(m, lens)
        q = np.zeros(len(flat), dtype=np.int64)
        nz = mrep > 0.0
        q[nz] = np.floor(flat[nz] * 127.0 / mrep[nz] + 0.5).astype(
            np.int64
        )
        return pa.table(
            {
                "vec_id": pa.array(vec_id, pa.int64()),
                "dim": pa.array(dim, pa.int64()),
                "q": pa.array(q, pa.int64()),
            }
        )

    return ds.map_batches(quant, batch_format="pyarrow")


SQL_EMBEDDING_QUANTIZE = """
WITH m AS (
  SELECT vec_id, embedding,
         list_max(list_transform(embedding, y -> abs(y))) AS mx
  FROM embeddings
)
SELECT vec_id,
       CAST(generate_subscripts(embedding, 1) AS BIGINT) - 1 AS dim,
       CASE WHEN mx = 0 THEN 0
            ELSE CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 127.0
                            / CAST(mx AS DOUBLE) + 0.5) AS BIGINT)
       END AS q
FROM m
"""


def q_rollup_revenue(sf_dir: str):
    """Hierarchical ROLLUP (region, nation) of order revenue in ONE
    scan: the customer→nation→region dimension chain collapses into a
    broadcast custkey lookup (the q_revenue_by_region pattern), each
    orders block reduces map-side to ≤|nation| name-keyed partial rows,
    and ALL THREE rollup levels (leaf / region subtotal / grand total)
    derive from the same merged nation-grained partials on the driver —
    no second scan, no fact-table shuffle, rollup cost O(|nation|).
    ``lvl`` = GROUPING(r_name)·2 + GROUPING(n_name) (0 leaf, 1 region
    subtotal, 3 grand total), matching DuckDB GROUP BY ROLLUP."""
    import numpy as np
    import pandas as pd

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet",
        columns=["n_nationkey", "n_name", "n_regionkey"],
    )
    region = pq.read_table(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    )
    r2n = dict(
        zip(region["r_regionkey"].to_pylist(), region["r_name"].to_pylist())
    )
    nk2names = {
        nk: (r2n[rk], nn)
        for nk, nn, rk in zip(
            nation["n_nationkey"].to_pylist(),
            nation["n_name"].to_pylist(),
            nation["n_regionkey"].to_pylist(),
        )
    }
    custkeys = np.asarray(cust["c_custkey"].to_pylist(), dtype=np.int64)
    order_idx = np.argsort(custkeys, kind="stable")
    sorted_keys = custkeys[order_idx]
    nks = cust["c_nationkey"].to_pylist()
    sorted_nk = np.asarray(nks, dtype=np.int64)[order_idx]
    lookup_ref = ray.put((sorted_keys, sorted_nk))

    def partial(t: pa.Table) -> pa.Table:
        import numpy as _np

        from ..functions.broadcast import cached_get

        keys, nk = cached_get(lookup_ref)
        ck = t["o_custkey"].to_numpy()
        cents = pc.cast(
            pc.floor(
                pc.add(
                    pc.multiply(t["o_totalprice"], pa.scalar(100.0)),
                    pa.scalar(0.5),
                )
            ),
            pa.int64(),
        ).to_numpy()
        if len(keys) == 0:
            return pa.table(
                {
                    "nk": pa.array([], pa.int64()),
                    "cents": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        pos = _np.minimum(_np.searchsorted(keys, ck), len(keys) - 1)
        found = keys[pos] == ck
        g_nk = nk[pos[found]]
        g_cents = cents[found]
        # dense int64 partial via add.at (bincount's float64 weights
        # would round above 2^53; cents stay EXACT integers)
        size = int(nk.max()) + 1 if len(nk) else 1
        sums = _np.zeros(size, dtype=_np.int64)
        _np.add.at(sums, g_nk, g_cents)
        cnts = _np.bincount(g_nk, minlength=size)
        nz = _np.nonzero(cnts)[0]
        return pa.table(
            {
                "nk": pa.array(nz, pa.int64()),
                "cents": pa.array(sums[nz], pa.int64()),
                "n": pa.array(cnts[nz].astype(np.int64), pa.int64()),
            }
        )

    parts = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    if "nk" not in parts.columns:  # empty input loses the schema
        parts = pd.DataFrame({"nk": [], "cents": [], "n": []})
    m = parts.groupby("nk", sort=True).sum()
    rows: list[tuple] = []
    by_region: dict[str, list[int]] = {}
    tot_c = tot_n = 0
    for nk, r in m.iterrows():
        rn, nn = nk2names[int(nk)]
        c, n = int(r["cents"]), int(r["n"])
        rows.append((rn, nn, c, n, 0))
        acc = by_region.setdefault(rn, [0, 0])
        acc[0] += c
        acc[1] += n
        tot_c += c
        tot_n += n
    for rn in sorted(by_region):
        c, n = by_region[rn]
        rows.append((rn, None, c, n, 1))
    # SQL ROLLUP always emits the () grouping-set row — on empty input
    # it is (count 0, NULL sum), so emit it unconditionally
    rows.append((None, None, tot_c if tot_n else None, tot_n, 3))
    return pa.table(
        {
            "r_name": pa.array([r[0] for r in rows], pa.string()),
            "n_name": pa.array([r[1] for r in rows], pa.string()),
            "revenue_cents": pa.array([r[2] for r in rows], pa.int64()),
            "n_orders": pa.array([r[3] for r in rows], pa.int64()),
            "lvl": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


SQL_ROLLUP_REVENUE = """
SELECT r_name, n_name,
  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
    AS revenue_cents,
  CAST(count(*) AS BIGINT) AS n_orders,
  CAST(grouping(r_name) * 2 + grouping(n_name) AS BIGINT) AS lvl
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


def q_cube_revenue(sf_dir: str):
    """GROUP BY CUBE (region, order-priority) revenue — the
    two-dimensional rollup twin of q_rollup_revenue: orders reduce
    map-side to a DENSE |region|×|priority| integer cell grid per
    block (region via the broadcast custkey chain, priority via a
    fixed small vocabulary), and ALL FOUR cube levels (cell / row
    margin / column margin / grand total) derive from the same merged
    grid on the driver. ``lvl`` = GROUPING(r_name)·2 +
    GROUPING(o_orderpriority), matching DuckDB GROUP BY CUBE."""
    import numpy as np
    import pandas as pd

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"]
    )
    region = pq.read_table(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    )
    n2r = dict(
        zip(nation["n_nationkey"].to_pylist(), nation["n_regionkey"].to_pylist())
    )
    rkeys = region["r_regionkey"].to_pylist()
    rnames = region["r_name"].to_pylist()
    rk2idx = {rk: i for i, rk in enumerate(rkeys)}
    custkeys = np.asarray(cust["c_custkey"].to_pylist(), dtype=np.int64)
    order_idx = np.argsort(custkeys, kind="stable")
    sorted_keys = custkeys[order_idx]
    ridx = np.asarray(
        [rk2idx[n2r[n]] for n in cust["c_nationkey"].to_pylist()],
        dtype=np.int64,
    )[order_idx]
    n_regions = len(rkeys)
    # priority vocabulary: bounded by design; one column-pruned pass,
    # per-block unique, driver union (vocab × blocks rows)
    prio_names = sorted(
        {
            v
            for t in ray.get(
                ray.data.read_parquet(
                    f"{sf_dir}/orders.parquet", columns=["o_orderpriority"]
                )
                .map_batches(
                    lambda t: pa.table(
                        {"p": pc.unique(t["o_orderpriority"])}
                    ),
                    batch_format="pyarrow",
                )
                .to_arrow_refs()
            )
            # empty input can yield raw-schema blocks (the map fn
            # never runs); they contribute no priorities
            for v in (
                t["p"].to_pylist() if "p" in t.column_names else []
            )
        }
    )
    p2i = {p: i for i, p in enumerate(prio_names)}
    n_prios = len(p2i)
    lookup_ref = ray.put((sorted_keys, ridx, p2i))

    def partial(t: pa.Table) -> pa.Table:
        import numpy as _np

        from ..functions.broadcast import cached_get

        keys, reg, pmap = cached_get(lookup_ref)
        ck = t["o_custkey"].to_numpy()
        cents = pc.cast(
            pc.floor(
                pc.add(
                    pc.multiply(t["o_totalprice"], pa.scalar(100.0)),
                    pa.scalar(0.5),
                )
            ),
            pa.int64(),
        ).to_numpy()
        prio = _np.array(
            [pmap[s] for s in t["o_orderpriority"].to_pylist()],
            dtype=np.int64,
        )
        if len(keys) == 0:
            found = _np.zeros(len(ck), dtype=bool)
            pos = _np.zeros(len(ck), dtype=np.int64)
        else:
            pos = _np.minimum(_np.searchsorted(keys, ck), len(keys) - 1)
            found = keys[pos] == ck
        n_p = len(pmap)
        cell = reg[pos[found]] * n_p + prio[found]
        size = n_regions * n_p
        # int64 add.at, not bincount weights (float64 rounds > 2^53)
        sums = _np.zeros(size, dtype=_np.int64)
        _np.add.at(sums, cell, cents[found])
        cnts = _np.bincount(cell, minlength=size)
        nz = _np.nonzero(cnts)[0]
        return pa.table(
            {
                "cell": pa.array(nz, pa.int64()),
                "cents": pa.array(sums[nz], pa.int64()),
                "n": pa.array(cnts[nz].astype(np.int64), pa.int64()),
            }
        )

    parts = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_custkey", "o_totalprice", "o_orderpriority"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    if "cell" not in parts.columns:  # empty input loses the schema
        parts = pd.DataFrame({"cell": [], "cents": [], "n": []})
    m = parts.groupby("cell", sort=True).sum()
    grid_c = np.zeros((n_regions, n_prios), dtype=np.int64)
    grid_n = np.zeros((n_regions, n_prios), dtype=np.int64)
    for cell, r in m.iterrows():
        grid_c[cell // n_prios, cell % n_prios] = int(r["cents"])
        grid_n[cell // n_prios, cell % n_prios] = int(r["n"])
    rows = []
    for i in range(n_regions):
        for j in range(n_prios):
            if grid_n[i, j]:
                rows.append(
                    (rnames[i], prio_names[j], grid_c[i, j], grid_n[i, j], 0)
                )
    for i in range(n_regions):
        if grid_n[i].sum():
            rows.append(
                (rnames[i], None, int(grid_c[i].sum()),
                 int(grid_n[i].sum()), 1)
            )
    for j in range(n_prios):
        if grid_n[:, j].sum():
            rows.append(
                (None, prio_names[j], int(grid_c[:, j].sum()),
                 int(grid_n[:, j].sum()), 2)
            )
    # SQL CUBE always emits the () grouping-set row — on empty input
    # it is (count 0, NULL sum), so emit it unconditionally
    tot = int(grid_n.sum())
    rows.append((None, None, int(grid_c.sum()) if tot else None, tot, 3))
    return pa.table(
        {
            "r_name": pa.array([r[0] for r in rows], pa.string()),
            "o_orderpriority": pa.array([r[1] for r in rows], pa.string()),
            "revenue_cents": pa.array([r[2] for r in rows], pa.int64()),
            "n_orders": pa.array([r[3] for r in rows], pa.int64()),
            "lvl": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


SQL_CUBE_REVENUE = """
SELECT r_name, o_orderpriority,
  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
    AS revenue_cents,
  CAST(count(*) AS BIGINT) AS n_orders,
  CAST(grouping(r_name) * 2 + grouping(o_orderpriority) AS BIGINT) AS lvl
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY CUBE (r_name, o_orderpriority)
"""


def q_order_priority_semi(sf_dir: str, key_budget_bytes: int = 64 * 2**20):
    """SEMI-join (EXISTS — the TPC-H Q4 shape): orders per priority
    having at least one deep-discount line (≥9% after half-up cents
    rounding). The qualifying-key set reduces map-side (filter +
    per-batch unique l_orderkey, bounded by |orders| not |lineitem|)
    and verification is regime-gated by MEASURED bytes (the
    minhash/PageRank budget pattern): under ``key_budget_bytes`` the
    sorted key array broadcasts and orders filter map-side — neither
    big table shuffles; beyond it, a distributed distinct + hash inner
    join on o_orderkey. Regimes pinned identical by
    tests/test_relational.py::test_order_priority_semi_regimes."""
    import numpy as np

    qualifying = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_discount"]
        )
        .map_batches(
            lambda t: pa.table(
                {
                    "o_orderkey": pc.unique(
                        t.filter(
                            pc.greater_equal(
                                pc.cast(
                                    pc.floor(
                                        pc.add(
                                            pc.multiply(
                                                t["l_discount"],
                                                pa.scalar(100.0),
                                            ),
                                            pa.scalar(0.5),
                                        )
                                    ),
                                    pa.int64(),
                                ),
                                pa.scalar(9),
                            )
                        )["l_orderkey"]
                    )
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )
    if qualifying.size_bytes() > key_budget_bytes:
        # beyond-budget regime: distinct keys stay distributed and the
        # semi-join realizes as a hash inner join (distinct ⇒ no fanout)
        distinct = qualifying.groupby("o_orderkey").aggregate(
            Count(alias_name="_n")
        )
        joined = orders.join(
            distinct.select_columns(["o_orderkey"]),
            join_type="inner",
            num_partitions=16,
            on=("o_orderkey",),
        )
        return joined.groupby("o_orderpriority").aggregate(
            Count(alias_name="n_orders")
        )
    matched = np.unique(
        np.concatenate(
            [
                t["o_orderkey"].to_numpy()
                for t in ray.get(qualifying.to_arrow_refs())
            ]
            or [np.empty(0, np.int64)]
        )
    )
    matched_ref = ray.put(matched)

    def semi(t: pa.Table) -> pa.Table:
        import numpy as _np

        from ..functions.broadcast import cached_get

        keys = cached_get(matched_ref)
        ok = t["o_orderkey"].to_numpy()
        if len(keys) == 0:
            keep = _np.zeros(len(ok), dtype=bool)
        else:
            pos = _np.minimum(_np.searchsorted(keys, ok), len(keys) - 1)
            keep = keys[pos] == ok
        return t.filter(pa.array(keep, pa.bool_()))

    return (
        orders.map_batches(semi, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Count(alias_name="n_orders"))
    )


SQL_ORDER_PRIORITY_SEMI = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey
    AND CAST(floor(l_discount * 100 + 0.5) AS BIGINT) >= 9)
GROUP BY o_orderpriority
"""


def _lang_length_hist(sf_dir: str):
    """(lang, n_chars) -> count histogram: per-block np.unique partial
    (bounded by the value grid, not the corpus) + one tiny groupby.
    Shared by the exact-percentile and NTILE ops — the histogram IS
    the scale story: distributed work is O(distinct lengths × langs),
    never a corpus sort."""
    import numpy as np
    import pandas as pd

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    )

    def hist_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"lang": t["lang"].to_pylist(), "n_chars": t["n_chars"].to_numpy()}
        )
        g = df.groupby(["lang", "n_chars"], sort=False).size().reset_index(name="n")
        return pa.table(
            {
                "lang": pa.array(g["lang"], pa.string()),
                "n_chars": pa.array(g["n_chars"].to_numpy(), pa.int64()),
                "n": pa.array(g["n"].to_numpy(), pa.int64()),
            }
        )

    hist = (
        ds.map_batches(hist_partial, batch_format="pyarrow")
        .groupby(["lang", "n_chars"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values(["lang", "n_chars"])
    )
    return ds, hist


def q_lang_percentiles(sf_dir: str):
    """EXACT per-language length percentiles (p25/p50/p75/p90) without
    a distributed sort: the corpus reduces to a (lang, n_chars)
    histogram (bounded by the value grid), and each percentile reads
    off the per-lang CDF on the driver. DuckDB ``quantile_disc``
    selects the element at 0-based index ceil(p·n)−1 (the standard
    percentile_disc rule — probed empirically across sizes and pinned
    by the differential fuzz); the engine replays the identical index
    arithmetic in the same double precision."""
    import numpy as np

    _, hist = _lang_length_hist(sf_dir)
    out: dict[str, list] = {"lang": [], "p25": [], "p50": [], "p75": [], "p90": []}
    for lang, g in hist.groupby("lang", sort=True):
        vals = g["n_chars"].to_numpy()
        cum = np.cumsum(g["n"].to_numpy())
        n = int(cum[-1])
        out["lang"].append(lang)
        for p, col in ((0.25, "p25"), (0.5, "p50"), (0.75, "p75"), (0.9, "p90")):
            idx = int(np.ceil(p * n)) - 1  # 0-based percentile_disc rule
            out[col].append(int(vals[np.searchsorted(cum, idx + 1)]))
    return pa.table(
        {
            "lang": pa.array(out["lang"], pa.string()),
            **{
                c: pa.array(out[c], pa.int64())
                for c in ("p25", "p50", "p75", "p90")
            },
        }
    )


SQL_LANG_PERCENTILES = """
SELECT lang,
  CAST(quantile_disc(n_chars, 0.25) AS BIGINT) AS p25,
  CAST(quantile_disc(n_chars, 0.50) AS BIGINT) AS p50,
  CAST(quantile_disc(n_chars, 0.75) AS BIGINT) AS p75,
  CAST(quantile_disc(n_chars, 0.90) AS BIGINT) AS p90
FROM documents GROUP BY lang
"""


def q_ntile_quartiles(sf_dir: str):
    """Per-language NTILE(4) by (n_chars, doc_id) WITHOUT a per-lang
    sort of the corpus: the (lang, n_chars) histogram gives every
    (lang, length) its base rank and each lang its total on the driver
    (tiny), docs partition by length (all rows of one (lang, length)
    land together), and each bounded partition derives rank = base +
    within-run offset, then the exact NTILE bucket from (rank, n) —
    first n%4 buckets take ceil(n/4) rows, matching the SQL window
    NTILE. Nothing corpus-sized sorts globally."""
    import numpy as np

    ds, hist = _lang_length_hist(sf_dir)
    base: dict[tuple, int] = {}
    totals: dict[str, int] = {}
    for lang, g in hist.groupby("lang", sort=True):
        cum = np.concatenate(([0], np.cumsum(g["n"].to_numpy())[:-1]))
        for length, b in zip(g["n_chars"].to_numpy(), cum):
            base[(lang, int(length))] = int(b)
        totals[lang] = int(g["n"].sum())
    base_ref = ray.put((base, totals))

    def add_part(t: pa.Table) -> pa.Table:
        part = pc.cast(
            pc.bit_wise_and(t["n_chars"], pa.scalar(63, pa.int64())),
            pa.int32(),
        )
        return t.append_column("part", part)

    def ntile_partition(df):
        from ..functions.broadcast import cached_get

        b, tot = cached_get(base_ref)
        df = df.sort_values(
            ["lang", "n_chars", "doc_id"], kind="mergesort"
        ).reset_index(drop=True)
        n = len(df)
        if not n:
            return df.assign(quartile=np.array([], dtype=np.int64))[
                ["doc_id", "lang", "quartile"]
            ]
        lens = df["n_chars"].to_numpy()
        langs = df["lang"].to_numpy()
        new_run = np.empty(n, dtype=bool)
        new_run[0] = True
        new_run[1:] = (lens[1:] != lens[:-1]) | (langs[1:] != langs[:-1])
        starts = np.flatnonzero(new_run)
        run_id = np.cumsum(new_run) - 1
        offset = np.arange(n) - starts[run_id]
        rank = (
            np.array(
                [b[(langs[i], int(lens[i]))] for i in starts], dtype=np.int64
            )[run_id]
            + offset
        )  # 0-based within lang
        n_l = np.array([tot[langs[i]] for i in starts], dtype=np.int64)[run_id]
        size, rem = n_l // 4, n_l % 4
        big = size + 1
        in_big = rank < rem * big
        q = np.where(
            in_big,
            rank // np.maximum(big, 1) + 1,
            rem + np.where(size > 0, (rank - rem * big) // np.maximum(size, 1), 0) + 1,
        )
        df["quartile"] = q.astype(np.int64)
        return df[["doc_id", "lang", "quartile"]]

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(ntile_partition, batch_format="pandas")
    )


SQL_NTILE_QUARTILES = """
SELECT doc_id, lang,
  CAST(ntile(4) OVER (PARTITION BY lang ORDER BY n_chars, doc_id)
       AS BIGINT) AS quartile
FROM documents
"""


def q_cume_dist_lengths(sf_dir: str):
    """Per-language empirical CDF of doc length (the distinct
    (lang, n_chars) grid with its cume_dist) — read directly off the
    shared histogram: cume = cum_count / n as one exact int/int IEEE
    division per grid point, identical to the SQL window. Distributed
    work is the histogram pass only."""
    import numpy as np

    _, hist = _lang_length_hist(sf_dir)
    langs, lens, cds = [], [], []
    for lang, g in hist.groupby("lang", sort=True):
        cum = np.cumsum(g["n"].to_numpy())
        n = int(cum[-1])
        for length, c in zip(g["n_chars"].to_numpy(), cum):
            langs.append(lang)
            lens.append(int(length))
            cds.append(int(c) / n)
    return pa.table(
        {
            "lang": pa.array(langs, pa.string()),
            "n_chars": pa.array(lens, pa.int64()),
            "cd": pa.array(cds, pa.float64()),
        }
    )


SQL_CUME_DIST_LENGTHS = """
SELECT DISTINCT lang, n_chars,
  cume_dist() OVER (PARTITION BY lang ORDER BY n_chars) AS cd
FROM documents
"""


def q_mad_lengths(sf_dir: str):
    """Per-language median absolute deviation of doc length from ONE
    distributed pass: the |x − median| histogram folds out of the
    value histogram on the driver (mirror the below-median mass onto
    the deviation axis), so the second 'pass' the textbook two-pass
    MAD needs is free. Median/MAD both use the quantile_disc
    ceil(p·n)−1 rule the oracle replays."""
    import numpy as np

    _, hist = _lang_length_hist(sf_dir)
    out: dict[str, list] = {"lang": [], "median": [], "mad": []}
    for lang, g in hist.groupby("lang", sort=True):
        vals = g["n_chars"].to_numpy()
        cnts = g["n"].to_numpy()
        cum = np.cumsum(cnts)
        n = int(cum[-1])
        med = int(vals[np.searchsorted(cum, int(np.ceil(0.5 * n)) - 1 + 1)])
        # fold: histogram of |x - med| (merge equal deviations)
        dev = np.abs(vals - med)
        order = np.argsort(dev, kind="stable")
        dev_s, cnt_s = dev[order], cnts[order]
        uniq, inv = np.unique(dev_s, return_inverse=True)
        dcnt = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(dcnt, inv, cnt_s)
        dcum = np.cumsum(dcnt)
        mad = int(uniq[np.searchsorted(dcum, int(np.ceil(0.5 * n)))])
        out["lang"].append(lang)
        out["median"].append(med)
        out["mad"].append(mad)
    return pa.table(
        {
            "lang": pa.array(out["lang"], pa.string()),
            "median": pa.array(out["median"], pa.int64()),
            "mad": pa.array(out["mad"], pa.int64()),
        }
    )


SQL_MAD_LENGTHS = """
WITH med AS (
  SELECT lang, quantile_disc(n_chars, 0.5) AS m
  FROM documents GROUP BY lang
)
SELECT d.lang,
  CAST(any_value(med.m) AS BIGINT) AS median,
  CAST(quantile_disc(abs(d.n_chars - med.m), 0.5) AS BIGINT) AS mad
FROM documents d JOIN med ON d.lang = med.lang
GROUP BY d.lang
"""


# GPT-2-style pre-tokenizer, restricted to the RE2 ∩ Python-re common
# subset: no lookarounds (RE2 has none), explicit ASCII whitespace
# class (Python's \s is Unicode, RE2's is ASCII — the one semantic
# trap), leftmost-first alternation (both engines). Contractions
# split off first, then letter runs, digit runs, punctuation runs,
# whitespace runs — each optionally absorbing one leading space.
_BPE_PAT = (
    r"'(?:[sdmt]|ll|re|ve)| ?[A-Za-z]+| ?[0-9]+"
    r"| ?[^ \t\n\r\f\vA-Za-z0-9]+|[ \t\n\r\f\v]+"
)
import re as _re  # noqa: E402

_BPE_RX = _re.compile(_BPE_PAT)


def q_bpe_token_count(sf_dir: str):
    """Tokenizer-budget estimation: per-document count of GPT-2-style
    pre-tokens (the unit BPE merges start from — the standard proxy
    for LLM token cost before a real tokenizer runs). Pure map over
    text with a once-per-process compiled pattern; the oracle runs the
    IDENTICAL pattern through DuckDB's RE2 (differentially probed:
    0 mismatches over the corpus + adversarial synthetics)."""

    def count(t: pa.Table) -> pa.Table:
        n = [
            len(_BPE_RX.findall(s)) for s in t["text"].to_pylist()
        ]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_bpe": pa.array(n, pa.int64()),
            }
        )

    return _read_documents(sf_dir).map_batches(count, batch_format="pyarrow")


_SQL_BPE_PAT = _BPE_PAT.replace("'", "''")
SQL_BPE_TOKEN_COUNT = f"""
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '{_SQL_BPE_PAT}')) AS BIGINT)
    AS n_bpe
FROM documents
"""


def q_pmi_top_pairs(sf_dir: str):
    """Top-50 PMI word pairs (co-occurrence mining over a bounded
    vocabulary — the collocation / phrase-detection shape): pass 1
    reduces the corpus to global word counts (map-side Counter
    partials + one small groupby) and takes the top-100 vocab; pass 2
    broadcasts word→index and reduces EACH BLOCK to one dense 100×100
    upper-triangle co-occurrence matrix + a 100-vector of doc
    frequencies (the kmeans dense-partial pattern — per-block output
    is O(vocab²), independent of corpus size); the driver merges
    num_blocks tiny matrices and computes pmi = ln(n_docs·c_ab /
    (c_a·c_b)) over exact integer counts, identically to the SQL."""
    import math

    import numpy as np

    ds = _read_documents(sf_dir)

    def wc_partial(t: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for text in t["text"].to_pylist():
            c.update(set(_PMI_RX.findall(text.lower())))
        return pa.table(
            {
                "word": pa.array(list(c.keys()), pa.string()),
                "n": pa.array(list(c.values()), pa.int64()),
            }
        )

    vocab_tbl = (
        ds.map_batches(wc_partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
        .sort(["n", "word"], descending=[True, False])
        .limit(100)
        .take_all()
    )
    vocab = [r["word"] for r in vocab_tbl]
    w2i = {w: i for i, w in enumerate(vocab)}
    v = len(vocab)
    w2i_ref = ray.put(w2i)

    def cooc_partial(t: pa.Table) -> pa.Table:
        import numpy as _np

        from ..functions.broadcast import cached_get

        lut = cached_get(w2i_ref)
        k = len(lut)
        mat = _np.zeros((k, k), dtype=np.int64)
        df = _np.zeros(k, dtype=np.int64)
        n_docs = 0
        for text in t["text"].to_pylist():
            n_docs += 1
            idx = sorted(
                {
                    lut[w]
                    for w in set(_PMI_RX.findall(text.lower()))
                    if w in lut
                }
            )
            if not idx:
                continue
            a = _np.asarray(idx, dtype=_np.int64)
            df[a] += 1
            if len(a) > 1:
                ii, jj = _np.triu_indices(len(a), 1)
                _np.add.at(mat, (a[ii], a[jj]), 1)
        ii, jj = _np.nonzero(mat)
        # packed single-key cells (i+1, j+1 shift the -1 sentinels to
        # 0): the global reduce is ONE single-column groupby over a
        # vocab²-bounded key space — never a multi-column aggregate,
        # and the driver reads ≤ (vocab+1)² rows however many blocks
        # the corpus has
        i_all = _np.concatenate((ii, _np.arange(k), [-1])) + 1
        j_all = _np.concatenate((jj, _np.full(k, -1), [-1])) + 1
        c_all = _np.concatenate((mat[ii, jj], df, [n_docs]))
        return pa.table(
            {
                "cell": pa.array(i_all * 1024 + j_all, pa.int64()),
                "c": pa.array(c_all, pa.int64()),
            }
        )

    merged = (
        ds.map_batches(cooc_partial, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    n_docs = 0
    dfreq = np.zeros(v, dtype=np.int64)
    pair_counts: dict[tuple, int] = {}
    for cell, c in zip(merged["cell"], merged["c"]):
        i, j = int(cell) // 1024 - 1, int(cell) % 1024 - 1
        if i == -1:
            n_docs = int(c)
        elif j == -1:
            dfreq[i] = int(c)
        else:
            pair_counts[(i, j)] = int(c)
    rows = []
    for (i, j), c_ab in pair_counts.items():
        if c_ab < 5:
            continue
        pmi = round(
            math.log((n_docs * c_ab) / (dfreq[i] * dfreq[j])), 6
        )
        w1, w2 = sorted((vocab[i], vocab[j]))
        rows.append((pmi, w1, w2, c_ab))
    rows.sort(key=lambda r: (-r[0], r[1], r[2]))
    rows = rows[:50]
    return pa.table(
        {
            "w1": pa.array([r[1] for r in rows], pa.string()),
            "w2": pa.array([r[2] for r in rows], pa.string()),
            "c_ab": pa.array([r[3] for r in rows], pa.int64()),
            "pmi": pa.array([r[0] for r in rows], pa.float64()),
        }
    )


_PMI_RX = _re.compile(r"[a-z]{4,}")

SQL_PMI_TOP_PAIRS = """
WITH tok AS (
  SELECT DISTINCT doc_id,
    unnest(regexp_extract_all(lower(text), '[a-z]{4,}')) AS w
  FROM documents
), vocab AS (
  SELECT w FROM tok GROUP BY w
  ORDER BY count(*) DESC, w ASC LIMIT 100
), vt AS (
  SELECT doc_id, w FROM tok WHERE w IN (SELECT w FROM vocab)
), n AS (SELECT count(*) AS n_docs FROM documents),
df AS (SELECT w, count(*) AS c FROM vt GROUP BY w),
pairs AS (
  SELECT a.w AS w1, b.w AS w2, count(*) AS c_ab
  FROM vt a JOIN vt b ON a.doc_id = b.doc_id AND a.w < b.w
  GROUP BY a.w, b.w HAVING count(*) >= 5
)
SELECT p.w1, p.w2, CAST(p.c_ab AS BIGINT) AS c_ab,
  round(ln((n.n_docs * p.c_ab) / (d1.c * d2.c)), 6) AS pmi
FROM pairs p, n, df d1, df d2
WHERE d1.w = p.w1 AND d2.w = p.w2
ORDER BY pmi DESC, p.w1, p.w2 LIMIT 50
"""


def q_weighted_sample(sf_dir: str, k: int = 30):
    """Distributed weighted sampling WITHOUT replacement (Efraimidis–
    Spirakis A-Res, IPL 2006): each doc draws a deterministic uniform
    u from the md5-nibble hash and takes priority u^(1/w) (w = doc
    length); the global top-k by priority IS the weighted sample. Each
    block reduces map-side to its own top-k (tie-broken identically to
    the global order), so the driver merges ≤ k·num_blocks skinny rows
    — the corpus never sorts. Zero-weight docs are never sampled
    (standard A-Res). Both engines evaluate the same double pow on the
    same exact u, so selection is bit-identical."""
    import numpy as np

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )

    def partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        w = t["n_chars"].to_numpy()
        m = w > 0
        ids, w = ids[m], w[m]
        hv = np.array([_docid_hash32(int(i)) for i in ids], np.float64)
        u = (hv + 1.0) / 4294967296.0
        key = u ** (1.0 / w)
        order = np.lexsort((ids, -key))[:k]
        return pa.table(
            {
                "doc_id": pa.array(ids[order], pa.int64()),
                "n_chars": pa.array(w[order], pa.int64()),
                "key": pa.array(key[order], pa.float64()),
            }
        )

    rows = sorted(
        (
            r
            for t in ray.get(
                ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
            )
            for r in t.to_pylist()
        ),
        key=lambda r: (-r["key"], r["doc_id"]),
    )[:k]
    return pa.table(
        {
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
            "n_chars": pa.array([r["n_chars"] for r in rows], pa.int64()),
            "priority": pa.array(
                [_round6(r["key"]) for r in rows], pa.float64()
            ),
        }
    )


SQL_WEIGHTED_SAMPLE = f"""
WITH h AS ({_HH_SQL}),
w AS (
  SELECT d.doc_id, d.n_chars, (h.hv + 1) / 4294967296.0 AS u
  FROM documents d JOIN h ON d.doc_id = h.doc_id
  WHERE d.n_chars > 0
)
SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
       round(pow(u, 1.0 / n_chars), 6) AS priority
FROM w ORDER BY pow(u, 1.0 / n_chars) DESC, doc_id LIMIT 30
"""


def q_large_orders(sf_dir: str, key_budget_bytes: int = 64 * 2**20):
    """HAVING-filtered aggregate feeding a join (the TPC-H Q18 shape):
    orders whose lineitem quantity total exceeds 250. The per-order
    quantity sums reduce map-side (per-batch groupby, bounded by
    |orders| not |lineitem|) into one small groupby; the HAVING filter
    shrinks the survivor set to ~1% of orders, which broadcasts as a
    sorted (key, sum) lookup so the orders table joins map-side —
    neither big table shuffles. Beyond ``key_budget_bytes`` of
    survivors the join realizes as a distributed hash join instead
    (the measured-budget regime pattern of order_priority_semi)."""
    import numpy as np

    def qty_partial(t: pa.Table) -> pa.Table:
        import numpy as _np

        ok = t["l_orderkey"].to_numpy()
        qty = pc.cast(t["l_quantity"], pa.int64()).to_numpy()
        keys, inv = _np.unique(ok, return_inverse=True)
        sums = _np.zeros(len(keys), dtype=_np.int64)
        _np.add.at(sums, inv, qty)
        return pa.table(
            {
                "l_orderkey": pa.array(keys, pa.int64()),
                "q": pa.array(sums, pa.int64()),
                "part": pa.array(
                    (keys & (relational.NUM_EVENT_PARTITIONS - 1)).astype(
                        _np.int32
                    ),
                    pa.int32(),
                ),
            }
        )

    def having_partition(df) -> pa.Table:
        import numpy as _np

        keys, inv = _np.unique(df["l_orderkey"].to_numpy(), return_inverse=True)
        sums = _np.zeros(len(keys), dtype=_np.int64)
        _np.add.at(sums, inv, df["q"].to_numpy())
        keep = sums > 250
        return pa.table(
            {
                "l_orderkey": pa.array(keys[keep], pa.int64()),
                "sum_qty": pa.array(sums[keep], pa.int64()),
            }
        )

    # per-order sums reduce through bounded key-hash partitions (the
    # packed-key map_groups reduce — Ray's groupby.aggregate on a
    # 100k+-key fact table costs a full shuffle generation more)
    survivors = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"]
        )
        .map_batches(qty_partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(having_partition, batch_format="pandas")
        .materialize()
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )
    if survivors.size_bytes() > key_budget_bytes:
        joined = orders.join(
            survivors,
            join_type="inner",
            num_partitions=16,
            on=("o_orderkey",),
            right_on=("l_orderkey",),
        )
        return joined.map_batches(
            lambda t: pa.table(
                {
                    "o_orderkey": t["o_orderkey"],
                    "sum_qty": t["sum_qty"],
                    "total_cents": pc.cast(
                        pc.floor(
                            pc.add(
                                pc.multiply(
                                    t["o_totalprice"], pa.scalar(100.0)
                                ),
                                pa.scalar(0.5),
                            )
                        ),
                        pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
    surv_blocks = [
        t.select(["l_orderkey", "sum_qty"])
        for t in ray.get(survivors.to_arrow_refs())
        if t.num_rows
    ]
    if surv_blocks:
        surv = pa.concat_tables(surv_blocks)
        skeys = surv["l_orderkey"].to_numpy()
        ssums = surv["sum_qty"].to_numpy()
    else:
        skeys = np.empty(0, np.int64)
        ssums = np.empty(0, np.int64)
    order = np.argsort(skeys, kind="stable")
    lookup_ref = ray.put((skeys[order], ssums[order]))

    def bjoin(t: pa.Table) -> pa.Table:
        import numpy as _np

        from ..functions.broadcast import cached_get

        keys, sums = cached_get(lookup_ref)
        ok = t["o_orderkey"].to_numpy()
        if len(keys) == 0:
            keep = _np.zeros(len(ok), dtype=bool)
            pos = _np.zeros(len(ok), dtype=_np.int64)
        else:
            pos = _np.minimum(_np.searchsorted(keys, ok), len(keys) - 1)
            keep = keys[pos] == ok
        sub = _np.nonzero(keep)[0]
        cents = pc.cast(
            pc.floor(
                pc.add(
                    pc.multiply(t["o_totalprice"], pa.scalar(100.0)),
                    pa.scalar(0.5),
                )
            ),
            pa.int64(),
        ).to_numpy()
        return pa.table(
            {
                "o_orderkey": pa.array(ok[sub], pa.int64()),
                "sum_qty": pa.array(sums[pos[sub]], pa.int64()),
                "total_cents": pa.array(cents[sub], pa.int64()),
            }
        )

    return orders.map_batches(bjoin, batch_format="pyarrow")


SQL_LARGE_ORDERS = """
SELECT o_orderkey,
       q.sum_qty,
       CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS total_cents
FROM orders
JOIN (SELECT l_orderkey,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(CAST(l_quantity AS BIGINT)) > 250) q
  ON o_orderkey = q.l_orderkey
"""


def q_idle_customers(sf_dir: str, key_budget_bytes: int = 64 * 2**20):
    """Scalar-subquery threshold + ANTI-join (the TPC-H Q22 shape):
    above-average-balance customers with no order since 2000-09-01,
    grouped by market segment. The global positive-balance average is
    never materialized as a float — the filter cross-multiplies exact
    integers (bal_cents × n_pos > sum_cents), so the threshold is
    bit-identical to the oracle's. Pass 1 reduces (sum_cents, n_pos)
    map-side to one tiny row per block (driver-merged, bounded by
    block count); pass 2 reduces recent-orderer custkeys map-side
    (bounded by |customer|) and broadcasts sorted for a map-side
    anti-join — orders, the large side, never shuffles. Beyond
    ``key_budget_bytes`` the distinct set stays distributed and the
    anti realizes as a left join + null filter."""
    import numpy as np

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_acctbal", "c_mktsegment"],
    )

    def bal_partial(t: pa.Table) -> pa.Table:
        pos = t.filter(pc.greater(t["c_acctbal"], pa.scalar(0.0)))
        cents = pc.cast(
            pc.floor(
                pc.add(
                    pc.multiply(pos["c_acctbal"], pa.scalar(100.0)),
                    pa.scalar(0.5),
                )
            ),
            pa.int64(),
        )
        return pa.table(
            {
                "s": pa.array([pc.sum(cents).as_py() or 0], pa.int64()),
                "n": pa.array([pos.num_rows], pa.int64()),
            }
        )

    # one tiny (s, n) row per block — the driver merge is bounded by
    # block count, never by |customer|
    parts = ray.get(
        cust.map_batches(bal_partial, batch_format="pyarrow").to_arrow_refs()
    )
    sum_cents = int(sum(t["s"].to_numpy().sum() for t in parts if t.num_rows))
    n_pos = int(sum(t["n"].to_numpy().sum() for t in parts if t.num_rows))

    _CUTOFF_US = 967_766_400_000_000  # 2000-09-01 µs

    recent = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
        )
        .map_batches(
            lambda t: pa.table(
                {
                    "o_custkey": pc.unique(
                        t.filter(
                            pc.greater_equal(
                                pc.cast(t["o_orderdate"], pa.int64()),
                                pa.scalar(_CUTOFF_US),
                            )
                        )["o_custkey"]
                    )
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )

    def rich_filter(t: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.floor(
                pc.add(
                    pc.multiply(t["c_acctbal"], pa.scalar(100.0)),
                    pa.scalar(0.5),
                )
            ),
            pa.int64(),
        )
        t = t.append_column("bal_cents", cents)
        return t.filter(
            pc.greater(
                pc.multiply(t["bal_cents"], pa.scalar(n_pos)),
                pa.scalar(sum_cents),
            )
        )

    rich = cust.map_batches(rich_filter, batch_format="pyarrow")

    if recent.size_bytes() > key_budget_bytes:
        # the right key column may be coalesced away by the join, so a
        # dedicated _hit marker carries the match indicator
        marked = (
            recent.groupby("o_custkey")
            .aggregate(Count(alias_name="_hit"))
        )
        joined = rich.join(
            marked,
            join_type="left_outer",
            num_partitions=16,
            on=("c_custkey",),
            right_on=("o_custkey",),
        )
        idle = joined.map_batches(
            lambda t: t.filter(pc.is_null(t["_hit"])).select(
                ["c_custkey", "c_acctbal", "c_mktsegment", "bal_cents"]
            ),
            batch_format="pyarrow",
        )
    else:
        matched = np.unique(
            np.concatenate(
                [t["o_custkey"].to_numpy() for t in ray.get(recent.to_arrow_refs())]
                or [np.empty(0, np.int64)]
            )
        )
        matched_ref = ray.put(matched)

        def anti(t: pa.Table) -> pa.Table:
            import numpy as _np

            from ..functions.broadcast import cached_get

            keys = cached_get(matched_ref)
            ck = t["c_custkey"].to_numpy()
            if len(keys) == 0:
                keep = _np.ones(len(ck), dtype=bool)
            else:
                pos = _np.minimum(_np.searchsorted(keys, ck), len(keys) - 1)
                keep = keys[pos] != ck
            return t.filter(pa.array(keep, pa.bool_()))

        idle = rich.map_batches(anti, batch_format="pyarrow")

    return idle.groupby("c_mktsegment").aggregate(
        Count(alias_name="n_cust"),
        Sum("bal_cents", alias_name="bal_cents"),
    )


SQL_IDLE_CUSTOMERS = """
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_cust,
       CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS bal_cents
FROM customer
WHERE CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
      * (SELECT count(*) FROM customer WHERE c_acctbal > 0.0)
      > (SELECT sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT))
         FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-09-01')
GROUP BY c_mktsegment
"""


# Single source of truth for the heavy-hitter threshold: the engine
# default AND the SQL oracle template BOTH read this constant, so a
# changed k cannot silently desync the two sides.
_HEAVY_HITTER_K = 200


def q_heavy_hitter_words(sf_dir: str, k: int = _HEAVY_HITTER_K):
    """Frequent-items (heavy hitters): words with global frequency
    strictly above 1/k of all tokens, with EXACT final counts. Pass 1
    emits per-block candidates — words with local count × k > block
    tokens (the Misra–Gries guarantee by pigeonhole: a global heavy
    hitter must be a local one in ≥1 block, and each block yields
    < k candidates, so the candidate set is bounded by blocks × k,
    never by the vocabulary) — plus one NULL-word marker row carrying
    the block's token total. Pass 2 broadcasts the candidate set and
    recounts ONLY those words map-side; a small groupby-sum and the
    exact threshold filter finish. The full-vocabulary groupby that a
    naive word count would shuffle never happens."""
    import numpy as np

    ds = _read_documents(sf_dir)

    def candidates_partial(t: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for text in t["text"].to_pylist():
            c.update(w for w in text.lower().split(" ") if w)
        total = sum(c.values())
        words = [w for w, n in c.items() if n * k > total]
        return pa.table(
            {
                "word": pa.array(words + [None], pa.string()),
                "block_tokens": pa.array(
                    [0] * len(words) + [total], pa.int64()
                ),
            }
        )

    parts = [
        t
        for t in ray.get(
            ds.map_batches(candidates_partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    total_tokens = int(
        sum(t["block_tokens"].to_numpy(zero_copy_only=False).sum() for t in parts)
    )
    cand = sorted(
        {
            w
            for t in parts
            for w in t["word"].to_pylist()
            if w is not None
        }
    )
    cand_ref = ray.put(cand)

    def recount(t: pa.Table) -> pa.Table:
        from collections import Counter

        from ..functions.broadcast import cached_get

        want = set(cached_get(cand_ref))
        c: Counter = Counter()
        for text in t["text"].to_pylist():
            c.update(w for w in text.lower().split(" ") if w in want)
        return pa.table(
            {
                "word": pa.array(list(c.keys()), pa.string()),
                "n": pa.array(list(c.values()), pa.int64()),
            }
        )

    return (
        ds.map_batches(recount, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(
            lambda t: t.filter(
                pc.greater(
                    pc.multiply(t["n"], pa.scalar(k)),
                    pa.scalar(total_tokens),
                )
            ),
            batch_format="pyarrow",
        )
    )


SQL_HEAVY_HITTER_WORDS = f"""
WITH w AS (
  SELECT t.w AS word
  FROM (SELECT unnest(string_split(lower(text), ' ')) AS w
        FROM documents) t
  WHERE t.w <> ''
)
SELECT word, CAST(count(*) AS BIGINT) AS n
FROM w
GROUP BY word
HAVING count(*) * {_HEAVY_HITTER_K} > (SELECT count(*) FROM w)
"""


def q_events_ewma(sf_dir: str):
    """Order-dependent window fold: final exponential moving average
    (alpha=1/2) of value per user over (ts, event_id) order. The
    sequential recurrence unrolls to a weighted sum with exact dyadic
    0.5**k weights, computed vectorized inside bounded user-hash
    partitions (relational.ewma) — no per-user Python fold, no global
    sort. 6-dp rounded (summation order differs from the oracle)."""
    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "value"],
    )
    return relational.ewma(events)


SQL_EVENTS_EWMA = """
SELECT user_id,
       round(sum(value * CASE WHEN rn = 1 THEN pow(0.5, cnt - 1)
                              ELSE pow(0.5, cnt - rn + 1) END), 6) AS ewma
FROM (SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn,
             count(*) OVER (PARTITION BY user_id) AS cnt
      FROM events) t
GROUP BY user_id
"""


def q_last_event_value(sf_dir: str):
    """LAST_VALUE window (distributed argmax by event time) per user:
    one sort within bounded user-hash partitions, last row of each
    user run. Selection, not arithmetic — output floats are exact."""
    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "value"],
    )
    return relational.last_value(events)


SQL_LAST_EVENT_VALUE = """
SELECT user_id, value AS last_value
FROM (SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) t
WHERE rn = 1
"""


def q_user_degree_hist(sf_dir: str):
    """Two-level distinct aggregation: distinct active DAYS per user,
    then the histogram over that degree. The (user, day) pair space
    dedups map-side per batch (bounded by users × days, not by
    |events|), packs into one int64 key for a single bounded-partition
    distinct (the packed-key reduce — never a multi-column groupby on
    a fact table), and both the per-user count and the final histogram
    are tiny groupbys over already-reduced rows."""
    import numpy as np

    _DAY_US = 86_400_000_000

    def pair_partial(t: pa.Table) -> pa.Table:
        import numpy as _np

        uid = t["user_id"].to_numpy()
        day = _np.floor_divide(
            pc.cast(t["ts"], pa.int64()).to_numpy(), _DAY_US
        )
        # pack (user, day): day fits 21 bits past-epoch for millennia;
        # user ids must stay under 2^41 for the packed key
        _guard_pack(uid, day, 21, "user_degree_hist (user,day)")
        key = _np.unique(uid * (1 << 21) + day)
        return pa.table(
            {
                "key": pa.array(key, pa.int64()),
                # partition by USER (key >> 21), never by packed key —
                # one user's days must co-locate for the degree count
                "part": pa.array(
                    (
                        (key >> 21)
                        & (relational.NUM_EVENT_PARTITIONS - 1)
                    ).astype(_np.int32),
                    pa.int32(),
                ),
            }
        )

    def degree_partition(df) -> pa.Table:
        import numpy as _np

        keys = _np.unique(df["key"].to_numpy())
        users, counts = _np.unique(keys >> 21, return_counts=True)
        deg, n_users = _np.unique(counts, return_counts=True)
        return pa.table(
            {
                "deg": pa.array(deg.astype(_np.int64), pa.int64()),
                "n": pa.array(n_users.astype(_np.int64), pa.int64()),
            }
        )

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )
    return (
        events.map_batches(pair_partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(degree_partition, batch_format="pandas")
        .groupby("deg")
        .aggregate(Sum("n", alias_name="n_users"))
    )


SQL_USER_DEGREE_HIST = """
SELECT deg, CAST(count(*) AS BIGINT) AS n_users
FROM (SELECT user_id,
             CAST(count(DISTINCT date_trunc('day', ts)) AS BIGINT) AS deg
      FROM events GROUP BY user_id) t
GROUP BY deg
"""


def q_above_avg_docs(sf_dir: str):
    """Correlated scalar subquery, decorrelated: docs longer than
    their OWN language's average length, counted per language. The
    per-lang (sum, count) moments fold out of the shared (lang,
    n_chars) histogram (no second corpus scan beyond the histogram
    partials), broadcast as a tiny dict, and the comparison
    cross-multiplies exact integers (n_chars × cnt > sum) — the float
    average never exists on either side."""
    import numpy as np

    ds, hist = _lang_length_hist(sf_dir)
    moments = {
        lang: (
            int((g["n_chars"].to_numpy() * g["n"].to_numpy()).sum()),
            int(g["n"].sum()),
        )
        for lang, g in hist.groupby("lang", sort=False)
    }
    mom_ref = ray.put(moments)

    def count_partial(t: pa.Table) -> pa.Table:
        import numpy as _np

        from ..functions.broadcast import cached_get

        mom = cached_get(mom_ref)
        langs = t["lang"].to_pylist()
        nc = t["n_chars"].to_numpy()
        sums = _np.array([mom[l][0] for l in langs], dtype=_np.int64)
        cnts = _np.array([mom[l][1] for l in langs], dtype=_np.int64)
        above = nc * cnts > sums
        ul, inv = _np.unique(_np.asarray(langs, dtype=object), return_inverse=True)
        n_above = _np.zeros(len(ul), dtype=_np.int64)
        _np.add.at(n_above, inv, above.astype(_np.int64))
        keep = n_above > 0
        return pa.table(
            {
                "lang": pa.array(list(ul[keep]), pa.string()),
                "n": pa.array(n_above[keep], pa.int64()),
            }
        )

    return _with_schema(
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["lang", "n_chars"]
        )
        .map_batches(count_partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("n", alias_name="n_above")),
        lang=pa.string(),
        n_above=pa.int64(),
    )


SQL_ABOVE_AVG_DOCS = """
SELECT lang, CAST(count(*) AS BIGINT) AS n_above
FROM documents d
WHERE CAST(n_chars AS BIGINT)
      * (SELECT count(*) FROM documents WHERE lang = d.lang)
      > (SELECT sum(CAST(n_chars AS BIGINT)) FROM documents
         WHERE lang = d.lang)
GROUP BY lang
"""


def q_lang_quantile_cont(sf_dir: str):
    """INTERPOLATED per-language percentiles (quantile_cont / SQL
    percentile_cont): same zero-sort histogram reduce as the _disc
    variant, but the driver read-off applies the linear-interpolation
    rule h = p·(n−1), v = v_lo + (h−⌊h⌋)·(v_hi − v_lo). 6-dp rounded
    (interpolation arithmetic, not a selection)."""
    import numpy as np

    _, hist = _lang_length_hist(sf_dir)
    out: dict[str, list] = {"lang": [], "p25": [], "p50": [], "p90": []}
    for lang, g in hist.groupby("lang", sort=True):
        vals = g["n_chars"].to_numpy().astype(np.float64)
        cum = np.cumsum(g["n"].to_numpy())
        n = int(cum[-1])

        def at(i: int) -> float:
            return float(vals[np.searchsorted(cum, i + 1)])

        out["lang"].append(lang)
        for p, col in ((0.25, "p25"), (0.5, "p50"), (0.9, "p90")):
            h = p * (n - 1)
            lo = int(np.floor(h))
            frac = h - lo
            v = at(lo) if frac == 0.0 else at(lo) + frac * (at(lo + 1) - at(lo))
            out[col].append(_round6(v))
    return pa.table(
        {
            "lang": pa.array(out["lang"], pa.string()),
            **{
                c: pa.array(out[c], pa.float64())
                for c in ("p25", "p50", "p90")
            },
        }
    )


SQL_LANG_QUANTILE_CONT = """
SELECT lang,
  round(quantile_cont(n_chars, 0.25), 6) AS p25,
  round(quantile_cont(n_chars, 0.50), 6) AS p50,
  round(quantile_cont(n_chars, 0.90), 6) AS p90
FROM documents GROUP BY lang
"""


# (order, supplier) packed-key bit budget: suppkey in the low 20 bits,
# orderkey above — holds to ~4M suppliers / 2^43 orders; beyond that
# widen to two int64 columns + a tuple sort (same reduce shape).
_SUPP_BITS = 20
_SUPP_MASK = (1 << _SUPP_BITS) - 1


def q_supplier_wait_blame(sf_dir: str):
    """EXISTS / NOT-EXISTS composite over one fact table (the TPC-H
    Q21 shape, restated for this schema's columns): on every order
    with >=2 distinct suppliers, blame the supplier whose latest line
    ships STRICTLY after every other supplier's lines; count blames
    per supplier. Per-(order,supplier) ship-date maxima reduce
    map-side (bounded by order x supplier pairs, not |lineitem|),
    pack into one int64 key, and the blame selection is a single
    lexsort + run-boundary compare inside bounded order-hash
    partitions — lineitem never shuffles raw, and both EXISTS checks
    collapse into the run-length / strict-max test. Supplier names
    join via a broadcast dict (dimension table)."""
    import numpy as np

    def max_partial(t: pa.Table) -> pa.Table:
        import numpy as _np

        ok = t["l_orderkey"].to_numpy()
        sk = t["l_suppkey"].to_numpy()
        ship = pc.cast(t["l_shipdate"], pa.int64()).to_numpy()
        _guard_pack(ok, sk, _SUPP_BITS, "supplier_wait_blame (order,supp)")
        key, inv = _np.unique(ok * (1 << _SUPP_BITS) + sk, return_inverse=True)
        m = _np.full(len(key), _np.iinfo(_np.int64).min, dtype=_np.int64)
        _np.maximum.at(m, inv, ship)
        return pa.table(
            {
                "key": pa.array(key, pa.int64()),
                "m": pa.array(m, pa.int64()),
                # partition by ORDER (key >> bits) — one order's
                # suppliers must co-locate for the strict-max compare
                "part": pa.array(
                    (
                        (key >> _SUPP_BITS)
                        & (relational.NUM_EVENT_PARTITIONS - 1)
                    ).astype(_np.int32),
                    pa.int32(),
                ),
            }
        )

    def blame_partition(df) -> pa.Table:
        import numpy as _np

        key = df["key"].to_numpy()
        mv = df["m"].to_numpy()
        uk, inv = _np.unique(key, return_inverse=True)
        mm = _np.full(len(uk), _np.iinfo(_np.int64).min, dtype=_np.int64)
        _np.maximum.at(mm, inv, mv)
        orders = uk >> _SUPP_BITS
        sup = uk & _SUPP_MASK
        idx = _np.lexsort((sup, mm, orders))
        o2, m2, s2 = orders[idx], mm[idx], sup[idx]
        starts = _np.r_[0, _np.nonzero(_np.diff(o2))[0] + 1]
        ends = _np.r_[starts[1:], len(o2)] - 1
        multi = ends > starts  # >=2 suppliers on the order
        strict = _np.zeros(len(starts), dtype=bool)
        strict[multi] = m2[ends[multi]] > m2[ends[multi] - 1]
        blamed = s2[ends[strict]]
        sups, cnt = _np.unique(blamed, return_counts=True)
        return pa.table(
            {
                "s_suppkey": pa.array(sups.astype(_np.int64), pa.int64()),
                "n": pa.array(cnt.astype(_np.int64), pa.int64()),
            }
        )

    supp = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    )
    name_ref = ray.put(
        dict(zip(supp["s_suppkey"].to_pylist(), supp["s_name"].to_pylist()))
    )

    def add_name(t: pa.Table) -> pa.Table:
        from ..functions.broadcast import cached_get

        names = cached_get(name_ref)
        return pa.table(
            {
                "s_suppkey": t["s_suppkey"],
                "s_name": pa.array(
                    [names[k] for k in t["s_suppkey"].to_pylist()],
                    pa.string(),
                ),
                "numwait": t["numwait"],
            }
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_suppkey", "l_shipdate"],
        )
        .map_batches(max_partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(blame_partition, batch_format="pandas")
        .groupby("s_suppkey")
        .aggregate(Sum("n", alias_name="numwait"))
        .map_batches(add_name, batch_format="pyarrow")
    )


SQL_SUPPLIER_WAIT_BLAME = """
WITH sm AS (
  SELECT l_orderkey, l_suppkey, max(l_shipdate) AS m
  FROM lineitem GROUP BY l_orderkey, l_suppkey)
SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) AS numwait
FROM supplier JOIN (
  SELECT l_orderkey, l_suppkey FROM sm s1
  WHERE EXISTS (SELECT 1 FROM sm s2
                WHERE s2.l_orderkey = s1.l_orderkey
                  AND s2.l_suppkey <> s1.l_suppkey)
    AND NOT EXISTS (SELECT 1 FROM sm s3
                    WHERE s3.l_orderkey = s1.l_orderkey
                      AND s3.l_suppkey <> s1.l_suppkey
                      AND s3.m >= s1.m)
) b ON b.l_suppkey = s_suppkey
GROUP BY s_suppkey, s_name
"""


def q_nation_pair_volume(sf_dir: str, key_budget_bytes: int = 64 * 2**20):
    """Fact-fact join folded to a broadcast (the TPC-H Q7 shape):
    revenue between (supplier nation, customer nation) pairs by ship
    year. The supplier and customer dimension chains collapse into
    nation-code lookups; the orders->customer-nation map (one int8
    per order) broadcasts when the parquet METADATA row count says it
    fits ``key_budget_bytes`` (no data read on the gate), else
    lineitem partials join it distributed (Dataset.join) — the
    measured-budget regime pattern of q_large_orders. Either way the
    group key packs (supp_nation, cust_nation, year) into one small
    int so the final aggregate is a tiny single-column groupby.
    Revenue follows the repo's exact-integer recipe: cents x
    (10000 - discount_bp), no float sums."""
    import numpy as np

    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    nk2name = dict(
        zip(nation["n_nationkey"].to_pylist(), nation["n_name"].to_pylist())
    )
    supp = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    sk = np.asarray(supp["s_suppkey"].to_pylist(), dtype=np.int64)
    s_order = np.argsort(sk, kind="stable")
    supp_keys = sk[s_order]
    supp_nat = np.asarray(supp["s_nationkey"].to_pylist(), dtype=np.int16)[
        s_order
    ]
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    c2n = dict(
        zip(cust["c_custkey"].to_pylist(), cust["c_nationkey"].to_pylist())
    )

    n_orders = pq.read_metadata(f"{sf_dir}/orders.parquet").num_rows
    broadcast_orders = n_orders * 10 <= key_budget_bytes

    def order_nat_partial(t: pa.Table) -> pa.Table:
        import numpy as _np

        from ..functions.broadcast import cached_get

        cmap = cached_get(cust_ref)
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "cnat": pa.array(
                    _np.asarray(
                        [cmap[c] for c in t["o_custkey"].to_pylist()],
                        dtype=_np.int16,
                    ),
                    pa.int16(),
                ),
            }
        )

    cust_ref = ray.put(c2n)
    _YEAR0 = 1970

    def line_partial(t: pa.Table, okeys, onat) -> pa.Table:
        """Reduce a lineitem batch to packed (snat,cnat,year)->revenue
        partials; `okeys`/`onat` is the sorted order->nation lookup
        (None on the distributed-join path, where cnat is a column)."""
        import numpy as _np

        from ..functions.broadcast import cached_get

        skeys, snat = cached_get(supp_ref)
        lsk = t["l_suppkey"].to_numpy()
        pos = _np.searchsorted(skeys, lsk)
        pos = _np.minimum(pos, len(skeys) - 1)
        sn = snat[pos].astype(_np.int64)
        if okeys is not None:
            ok = t["l_orderkey"].to_numpy()
            cpos = _np.searchsorted(okeys, ok)
            cpos = _np.minimum(cpos, len(okeys) - 1)
            cn = onat[cpos].astype(_np.int64)
        else:
            cn = t["cnat"].to_numpy().astype(_np.int64)
        year = pc.year(t["l_shipdate"]).to_numpy().astype(_np.int64)
        cents = pc.cast(
            pc.floor(
                pc.add(
                    pc.multiply(t["l_extendedprice"], pa.scalar(100.0)),
                    pa.scalar(0.5),
                )
            ),
            pa.int64(),
        ).to_numpy()
        bp = pc.cast(
            pc.floor(
                pc.add(
                    pc.multiply(t["l_discount"], pa.scalar(10000.0)),
                    pa.scalar(0.5),
                )
            ),
            pa.int64(),
        ).to_numpy()
        rev = cents * (10000 - bp)
        k = (sn << 20) | (cn << 8) | (year - _YEAR0)
        uk, inv = _np.unique(k, return_inverse=True)
        sums = _np.zeros(len(uk), dtype=_np.int64)
        _np.add.at(sums, inv, rev)
        return pa.table(
            {
                "k": pa.array(uk, pa.int64()),
                "rev": pa.array(sums, pa.int64()),
            }
        )

    supp_ref = ray.put((supp_keys, supp_nat))
    line_cols = [
        "l_orderkey",
        "l_suppkey",
        "l_shipdate",
        "l_extendedprice",
        "l_discount",
    ]
    if broadcast_orders:
        orders = pq.read_table(
            f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
        )
        okeys = np.asarray(orders["o_orderkey"].to_pylist(), dtype=np.int64)
        o_order = np.argsort(okeys, kind="stable")
        okeys = okeys[o_order]
        onat = np.asarray(
            [c2n[c] for c in orders["o_custkey"].to_pylist()],
            dtype=np.int16,
        )[o_order]
        lut_ref = ray.put((okeys, onat))

        def partial_bcast(t: pa.Table) -> pa.Table:
            from ..functions.broadcast import cached_get

            ok, on = cached_get(lut_ref)
            return line_partial(t, ok, on)

        reduced = ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=line_cols
        ).map_batches(partial_bcast, batch_format="pyarrow")
    else:
        ord_nat = ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
        ).map_batches(order_nat_partial, batch_format="pyarrow")
        joined = ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=line_cols
        ).join(
            ord_nat,
            join_type="inner",
            num_partitions=16,
            on=("l_orderkey",),
            right_on=("o_orderkey",),
        )
        reduced = joined.map_batches(
            lambda t: line_partial(t, None, None), batch_format="pyarrow"
        )

    rows = (
        reduced.groupby("k")
        .aggregate(Sum("rev", alias_name="revenue_cbp"))
        .take_all()  # bounded: nations^2 x years distinct keys
    )
    return pa.table(
        {
            "supp_nation": pa.array(
                [nk2name[r["k"] >> 20] for r in rows], pa.string()
            ),
            "cust_nation": pa.array(
                [nk2name[(r["k"] >> 8) & 0xFFF] for r in rows], pa.string()
            ),
            "yr": pa.array(
                [(r["k"] & 0xFF) + _YEAR0 for r in rows], pa.int64()
            ),
            "revenue_cbp": pa.array(
                [r["revenue_cbp"] for r in rows], pa.int64()
            ),
        }
    )


SQL_NATION_PAIR_VOLUME = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
  CAST(year(l_shipdate) AS BIGINT) AS yr,
  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
           * (10000 - CAST(floor(l_discount * 10000 + 0.5) AS BIGINT)))
       AS BIGINT) AS revenue_cbp
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation n1 ON n1.n_nationkey = s_nationkey
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n2 ON n2.n_nationkey = c_nationkey
GROUP BY 1, 2, 3
"""


def q_event_paths(sf_dir: str):
    """Ordered string aggregation per key (SQL string_agg ... ORDER
    BY): each user's first 8 event-type initials in (ts, event_id)
    order, histogrammed over the resulting path strings. Events
    shuffle ONCE as skinny columns (user, ts_us, event_id, one uint32
    initial — no strings) into bounded user-hash partitions; within a
    partition one lexsort + run-rank keeps rank<8, a dense (user x 8)
    byte matrix assembles the paths, and only the tiny (path, count)
    histogram leaves the partition."""
    import numpy as np

    def partial(t: pa.Table) -> pa.Table:
        import numpy as _np

        first = (
            t["event_type"]
            .to_numpy(zero_copy_only=False)
            .astype("U1")
            .view(_np.uint32)
        )
        uid = t["user_id"].to_numpy()
        return pa.table(
            {
                "u": pa.array(uid, pa.int64()),
                "part": pa.array(
                    (uid & (relational.NUM_EVENT_PARTITIONS - 1)).astype(
                        _np.int32
                    ),
                    pa.int32(),
                ),
                "ts_us": pa.array(
                    pc.cast(t["ts"], pa.int64()).to_numpy(), pa.int64()
                ),
                "eid": pa.array(t["event_id"], pa.int64()),
                "c": pa.array(first, pa.uint32()),
            }
        )

    def paths_partition(df) -> pa.Table:
        import numpy as _np

        u = df["u"].to_numpy()
        idx = _np.lexsort(
            (df["eid"].to_numpy(), df["ts_us"].to_numpy(), u)
        )
        u2 = u[idx]
        c2 = df["c"].to_numpy()[idx].astype(_np.uint8)
        new = _np.r_[True, u2[1:] != u2[:-1]]
        gidx = _np.cumsum(new) - 1
        starts = _np.nonzero(new)[0]
        rank = _np.arange(len(u2)) - starts[gidx]
        keep = rank < 8
        n_users = len(starts)
        mat = _np.zeros((n_users, 8), dtype=_np.uint8)
        mat[gidx[keep], rank[keep]] = c2[keep]
        lens = _np.minimum(_np.bincount(gidx, minlength=n_users), 8)
        raw = mat.tobytes()
        # loop over USERS (reduced cardinality), not events
        paths = _np.array(
            [
                raw[i * 8 : i * 8 + lens[i]].decode("ascii")
                for i in range(n_users)
            ],
            dtype=object,
        )
        up, cnt = _np.unique(paths, return_counts=True)
        return pa.table(
            {
                "path": pa.array(list(up), pa.string()),
                "n": pa.array(cnt.astype(_np.int64), pa.int64()),
            }
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "ts", "event_id", "event_type"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(paths_partition, batch_format="pandas")
        .groupby("path")
        .aggregate(Sum("n", alias_name="n_users"))
    )


SQL_EVENT_PATHS = """
WITH ranked AS (
  SELECT user_id, substr(event_type, 1, 1) AS c,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events),
paths AS (
  SELECT user_id, string_agg(c, '' ORDER BY rn) AS path
  FROM ranked WHERE rn <= 8 GROUP BY user_id)
SELECT path, CAST(count(*) AS BIGINT) AS n_users
FROM paths GROUP BY path
"""


def q_lang_source_chi2(sf_dir: str):
    """Chi-square independence statistic between two categorical
    columns (lang x source): per-batch contingency partials (cell
    cardinality langs x sources, not |docs|) reduce through one tiny
    groupby; the driver folds marginals out of the cell table and
    evaluates sum((obs-exp)^2/exp) in float64 with the same
    expression the oracle uses, 6-dp rounded. Single-row output."""
    import numpy as np

    def cell_partial(t: pa.Table) -> pa.Table:
        import numpy as _np

        langs = t["lang"].to_numpy(zero_copy_only=False)
        srcs = t["source"].to_numpy(zero_copy_only=False)
        cells = _np.char.add(
            _np.char.add(langs.astype(str), "\x1f"), srcs.astype(str)
        )
        uc, cnt = _np.unique(cells, return_counts=True)
        return pa.table(
            {
                "cell": pa.array(list(uc), pa.string()),
                "n": pa.array(cnt.astype(_np.int64), pa.int64()),
            }
        )

    rows = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["lang", "source"]
        )
        .map_batches(cell_partial, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(Sum("n", alias_name="n"))
        .take_all()  # bounded: langs x sources cells
    )
    langs: dict[str, float] = {}
    srcs: dict[str, float] = {}
    tot = 0.0
    obs = []
    for r in rows:
        l, s = r["cell"].split("\x1f", 1)
        n = float(r["n"])
        obs.append((l, s, n))
        langs[l] = langs.get(l, 0.0) + n
        srcs[s] = srcs.get(s, 0.0) + n
        tot += n
    chi2 = 0.0
    for l, s, n in obs:
        exp = langs[l] * srcs[s] / tot
        chi2 += (n - exp) ** 2 / exp
    dof = (len(langs) - 1) * (len(srcs) - 1)
    return pa.table(
        {
            "chi2": pa.array([_round6(chi2)], pa.float64()),
            "dof": pa.array([dof], pa.int64()),
        }
    )


SQL_LANG_SOURCE_CHI2 = """
WITH c AS (
  SELECT lang, source, CAST(count(*) AS DOUBLE) AS n
  FROM documents GROUP BY lang, source),
r AS (SELECT lang, sum(n) AS rn FROM c GROUP BY lang),
co AS (SELECT source, sum(n) AS cn FROM c GROUP BY source),
t AS (SELECT sum(n) AS tot FROM c)
SELECT
  round(sum(pow(c.n - r.rn * co.cn / t.tot, 2)
            / (r.rn * co.cn / t.tot)), 6) AS chi2,
  CAST((SELECT count(DISTINCT lang) - 1 FROM documents)
       * (SELECT count(DISTINCT source) - 1 FROM documents)
       AS BIGINT) AS dof
FROM c, r, co, t
WHERE c.lang = r.lang AND c.source = co.source
"""


def q_click_except_high_value(sf_dir: str):
    """Set EXCEPT between two derived distinct sets (clickers minus
    users with any click valued > 200), as a bitmask OR-reduce: each
    batch folds its events into per-user presence bits (bounded by
    users in the batch, not events), bits OR-merge inside bounded
    user-hash partitions, and the EXCEPT is a bit test — no
    distinct-shuffle of either operand and no join."""
    import numpy as np

    def bits_partial(t: pa.Table) -> pa.Table:
        import numpy as _np

        et = t["event_type"].to_numpy(zero_copy_only=False)
        mask = et == "click"
        uid = t["user_id"].to_numpy()[mask]
        b = _np.where(
            t["value"].to_numpy()[mask] > 200.0, 3, 1
        ).astype(_np.int64)
        users, inv = _np.unique(uid, return_inverse=True)
        bits = _np.zeros(len(users), dtype=_np.int64)
        _np.bitwise_or.at(bits, inv, b)
        return pa.table(
            {
                "u": pa.array(users, pa.int64()),
                "bits": pa.array(bits, pa.int64()),
                "part": pa.array(
                    (users & (relational.NUM_EVENT_PARTITIONS - 1)).astype(
                        _np.int32
                    ),
                    pa.int32(),
                ),
            }
        )

    def except_partition(df) -> pa.Table:
        import numpy as _np

        users, inv = _np.unique(df["u"].to_numpy(), return_inverse=True)
        bits = _np.zeros(len(users), dtype=_np.int64)
        _np.bitwise_or.at(bits, inv, df["bits"].to_numpy())
        keep = bits == 1  # clicked, never above the value bar
        return pa.table({"user_id": pa.array(users[keep], pa.int64())})

    return (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "event_type", "value"],
        )
        .map_batches(bits_partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(except_partition, batch_format="pandas")
    )


SQL_CLICK_EXCEPT_HIGH_VALUE = """
SELECT CAST(user_id AS BIGINT) AS user_id
FROM events WHERE event_type = 'click'
EXCEPT
SELECT CAST(user_id AS BIGINT) AS user_id
FROM events WHERE event_type = 'click' AND value > 200
"""


def q_winsorized_mean(sf_dir: str):
    """Winsorized (p05/p95-clamped) mean length per language — a
    robust-statistics gate. The ENTIRE statistic folds out of the
    shared (lang, n_chars) histogram: the clamp bounds read off the
    CDF (quantile_disc rule) and the clamped sum is an exact integer
    dot product over histogram cells — no second corpus scan, no
    sort. One float division per lang, 6-dp, mirrored by the
    oracle."""
    import numpy as np

    _, hist = _lang_length_hist(sf_dir)
    out: dict[str, list] = {"lang": [], "wmean": []}
    for lang, g in hist.groupby("lang", sort=True):
        vals = g["n_chars"].to_numpy()
        cnts = g["n"].to_numpy()
        cum = np.cumsum(cnts)
        n = int(cum[-1])

        def disc(p: float) -> int:
            idx = int(np.ceil(p * n)) - 1  # 0-based percentile_disc rule
            return int(vals[np.searchsorted(cum, idx + 1)])

        lo, hi = disc(0.05), disc(0.95)
        clipped = np.clip(vals, lo, hi)
        s = int((clipped * cnts).sum())
        out["lang"].append(lang)
        out["wmean"].append(_round6(s / n))
    return pa.table(
        {
            "lang": pa.array(out["lang"], pa.string()),
            "wmean": pa.array(out["wmean"], pa.float64()),
        }
    )


SQL_WINSORIZED_MEAN = """
WITH q AS (
  SELECT lang,
         CAST(quantile_disc(n_chars, 0.05) AS BIGINT) AS lo,
         CAST(quantile_disc(n_chars, 0.95) AS BIGINT) AS hi
  FROM documents GROUP BY lang)
SELECT d.lang,
  round(CAST(sum(greatest(q.lo, least(q.hi, CAST(d.n_chars AS BIGINT))))
             AS DOUBLE) / count(*), 6) AS wmean
FROM documents d JOIN q ON d.lang = q.lang
GROUP BY d.lang
"""


def q_region_price_quantiles(sf_dir: str):
    """Quantiles over a JOINED fact table (order totalprice p50/p90
    per region) with neither a shuffle join nor a sort: the
    customer->nation->region dimension chain collapses to one
    broadcast custkey->region-index lookup (the q_revenue_by_region
    pattern), orders reduce map-side to (region_idx, cents, n)
    histogram partials, ONE bounded groupby on the int32 region index
    co-locates each region's histogram (o_totalprice is near-unique,
    so a multi-column (r_name, cents) Ray groupby would run at
    fact-table cardinality — the measured ~750x cliff — and a driver
    to_pandas would centralize ~|orders| rows), and the quantile_disc
    read-off runs INSIDE each region's map_groups. The driver only
    sees |region| final rows. Output in exact integer cents (a
    selection, no arithmetic)."""
    import numpy as np

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"]
    )
    region = pq.read_table(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    )
    n2r = dict(
        zip(nation["n_nationkey"].to_pylist(), nation["n_regionkey"].to_pylist())
    )
    rkeys = region["r_regionkey"].to_pylist()
    rnames = region["r_name"].to_pylist()
    rk2idx = {rk: i for i, rk in enumerate(rkeys)}
    custkeys = np.asarray(cust["c_custkey"].to_pylist(), dtype=np.int64)
    order_idx = np.argsort(custkeys, kind="stable")
    sorted_keys = custkeys[order_idx]
    ridx = np.asarray(
        [rk2idx[n2r[n]] for n in cust["c_nationkey"].to_pylist()],
        dtype=np.int64,
    )[order_idx]
    lookup_ref = ray.put((sorted_keys, ridx))

    def hist_partial(t: pa.Table) -> pa.Table:
        import numpy as _np

        from ..functions.broadcast import cached_get

        keys, reg = cached_get(lookup_ref)
        ck = t["o_custkey"].to_numpy()
        cents = pc.cast(
            pc.floor(
                pc.add(
                    pc.multiply(t["o_totalprice"], pa.scalar(100.0)),
                    pa.scalar(0.5),
                )
            ),
            pa.int64(),
        ).to_numpy()
        if len(keys) == 0:
            found = _np.zeros(len(ck), dtype=bool)
            pos = _np.zeros(len(ck), dtype=_np.int64)
        else:
            pos = _np.minimum(_np.searchsorted(keys, ck), len(keys) - 1)
            found = keys[pos] == ck
        r = reg[pos[found]]
        c = cents[found]
        # map-side (region, cents) dedup via one packed int64 key
        _guard_pack(r, c, 40, "region_price_quantiles (region,cents)")
        key, cnt = _np.unique(r * (1 << 40) + c, return_counts=True)
        return pa.table(
            {
                "part": pa.array(
                    (key >> 40).astype(_np.int32), pa.int32()
                ),
                "cents": pa.array(
                    key & ((1 << 40) - 1), pa.int64()
                ),
                "n": pa.array(cnt.astype(_np.int64), pa.int64()),
            }
        )

    def quantile_partition(df) -> pa.Table:
        import numpy as _np

        vals, inv = _np.unique(df["cents"].to_numpy(), return_inverse=True)
        cnts = _np.zeros(len(vals), dtype=_np.int64)
        _np.add.at(cnts, inv, df["n"].to_numpy())
        cum = _np.cumsum(cnts)
        n = int(cum[-1])
        picks = [
            int(vals[_np.searchsorted(cum, int(_np.ceil(p * n)) - 1 + 1)])
            for p in (0.5, 0.9)
        ]
        return pa.table(
            {
                "ridx": pa.array(
                    [int(df["part"].iloc[0])], pa.int64()
                ),
                "p50_cents": pa.array([picks[0]], pa.int64()),
                "p90_cents": pa.array([picks[1]], pa.int64()),
            }
        )

    idx2name = list(rnames)  # tiny (|region|) — closure-captured

    def add_name(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "r_name": pa.array(
                    [idx2name[i] for i in t["ridx"].to_pylist()],
                    pa.string(),
                ),
                "p50_cents": t["p50_cents"],
                "p90_cents": t["p90_cents"],
            }
        )

    return _with_schema(
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
        )
        .map_batches(hist_partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(quantile_partition, batch_format="pandas")
        .map_batches(add_name, batch_format="pyarrow"),
        r_name=pa.string(),
        p50_cents=pa.int64(),
        p90_cents=pa.int64(),
    )


SQL_REGION_PRICE_QUANTILES = """
WITH oc AS (
  SELECT r_name,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey)
SELECT r_name,
  CAST(quantile_disc(cents, 0.5) AS BIGINT) AS p50_cents,
  CAST(quantile_disc(cents, 0.9) AS BIGINT) AS p90_cents
FROM oc GROUP BY r_name
"""


# Exact-integer Spearman moment budget: sxx <= 4n^3 must fit int64,
# so the exact regime holds to ~1.3M docs; beyond it the moment
# partials switch to float64 (the standard large-n practice — ranks
# are already ties-averaged half-integers x2).
_SPEARMAN_EXACT_MAX = 1 << 20

# Explicit ASCII-whitespace token pattern shared by the Spearman
# engine and its oracle (the q_bpe_token_count contract): Python re
# \S+ is Unicode-aware while DuckDB/RE2 \S+ is ASCII-only, so text
# containing NBSP or other Unicode whitespace would diverge — an
# explicit character class is identical under both engines.
_ASCII_TOK_PAT = r"[^ \t\n\r\f]+"
_ASCII_TOK_RX = re.compile(_ASCII_TOK_PAT)


def q_spearman_len_tokens(sf_dir: str):
    """Spearman rank correlation between doc length and token count
    WITHOUT a global sort: one scan reduces the corpus to a joint
    (n_chars, n_tokens) histogram (packed int64 key, bounded
    key-hash partitions); the tiny marginal CDFs become
    ties-averaged rank maps (doubled to stay integer: R2 = 2*less +
    cnt + 1); a second pass over the HISTOGRAM (never the corpus)
    accumulates exact integer moments, and the final Pearson-on-ranks
    expression is the same float64 arithmetic the oracle runs."""
    import numpy as np

    _TOK_BITS = 25  # token counts < 2^25; lengths < 2^38 above them

    def joint_partial(t: pa.Table) -> pa.Table:
        import numpy as _np

        x = t["n_chars"].to_numpy()
        y = _np.array(
            [
                len(_ASCII_TOK_RX.findall(s))
                for s in t["text"].to_pylist()
            ],
            dtype=_np.int64,
        )
        _guard_pack(x, y, _TOK_BITS, "spearman_len_tokens (chars,tokens)")
        key, cnt = _np.unique(x * (1 << _TOK_BITS) + y, return_counts=True)
        return pa.table(
            {
                "k": pa.array(key, pa.int64()),
                "n": pa.array(cnt.astype(_np.int64), pa.int64()),
                "part": pa.array(
                    (key & (relational.NUM_EVENT_PARTITIONS - 1)).astype(
                        _np.int32
                    ),
                    pa.int32(),
                ),
            }
        )

    def merge_partition(df) -> pa.Table:
        import numpy as _np

        keys, inv = _np.unique(df["k"].to_numpy(), return_inverse=True)
        sums = _np.zeros(len(keys), dtype=_np.int64)
        _np.add.at(sums, inv, df["n"].to_numpy())
        return pa.table(
            {
                "k": pa.array(keys, pa.int64()),
                "n": pa.array(sums, pa.int64()),
            }
        )

    joint = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["text", "n_chars"]
        )
        .map_batches(joint_partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(merge_partition, batch_format="pandas")
        .materialize()
    )

    def marginal(shift: bool) -> tuple[np.ndarray, np.ndarray]:
        def m_partial(t: pa.Table) -> pa.Table:
            import numpy as _np

            k = t["k"].to_numpy()
            v = (k >> _TOK_BITS) if shift else (k & ((1 << _TOK_BITS) - 1))
            uv, inv = _np.unique(v, return_inverse=True)
            s = _np.zeros(len(uv), dtype=_np.int64)
            _np.add.at(s, inv, t["n"].to_numpy())
            return pa.table(
                {"v": pa.array(uv, pa.int64()), "n": pa.array(s, pa.int64())}
            )

        rows = (
            joint.map_batches(m_partial, batch_format="pyarrow")
            .groupby("v")
            .aggregate(Sum("n", alias_name="n"))
            .take_all()  # bounded: the value grid, not the corpus
        )
        rows.sort(key=lambda r: r["v"])
        vals = np.array([r["v"] for r in rows], dtype=np.int64)
        cnts = np.array([r["n"] for r in rows], dtype=np.int64)
        less = np.concatenate(([0], np.cumsum(cnts)[:-1]))
        r2 = 2 * less + cnts + 1  # doubled ties-averaged rank
        return vals, r2

    xv, xr2 = marginal(True)
    yv, yr2 = marginal(False)
    n_total = int(
        pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    )
    exact = n_total <= _SPEARMAN_EXACT_MAX
    rank_ref = ray.put((xv, xr2, yv, yr2))

    def moments(t: pa.Table) -> pa.Table:
        import numpy as _np

        from ..functions.broadcast import cached_get

        xvv, xr, yvv, yr = cached_get(rank_ref)
        k = t["k"].to_numpy()
        cnt = t["n"].to_numpy()
        rx = xr[_np.searchsorted(xvv, k >> _TOK_BITS)]
        ry = yr[_np.searchsorted(yvv, k & ((1 << _TOK_BITS) - 1))]
        if exact:
            rxo = rx.astype(object)
            ryo = ry.astype(object)
            co = cnt.astype(object)
            vals = [
                int(sum(co)),
                int(sum(rxo * co)),
                int(sum(ryo * co)),
                int(sum(rxo * rxo * co)),
                int(sum(ryo * ryo * co)),
                int(sum(rxo * ryo * co)),
            ]
            typ = pa.int64()
        else:
            rxf = rx.astype(_np.float64)
            ryf = ry.astype(_np.float64)
            cf = cnt.astype(_np.float64)
            vals = [
                float(cf.sum()),
                float((rxf * cf).sum()),
                float((ryf * cf).sum()),
                float((rxf * rxf * cf).sum()),
                float((ryf * ryf * cf).sum()),
                float((rxf * ryf * cf).sum()),
            ]
            typ = pa.float64()
        return pa.table(
            {
                c: pa.array([v], typ)
                for c, v in zip(("n", "sx", "sy", "sxx", "syy", "sxy"), vals)
            }
        )

    parts = joint.map_batches(moments, batch_format="pyarrow").take_all()
    n = sum(int(r["n"]) for r in parts)
    sx = sum(int(r["sx"]) for r in parts)
    sy = sum(int(r["sy"]) for r in parts)
    sxx = sum(int(r["sxx"]) for r in parts)
    syy = sum(int(r["syy"]) for r in parts)
    sxy = sum(int(r["sxy"]) for r in parts)
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    sp = (
        _round6(float(n * sxy - sx * sy) / (vx**0.5 * vy**0.5))
        if vx > 0 and vy > 0
        else None
    )
    return pa.table(
        {
            "n_docs": pa.array([n], pa.int64()),
            "spearman": pa.array([sp], pa.float64()),
        }
    )


SQL_SPEARMAN_LEN_TOKENS = rf"""
WITH t AS (
  SELECT CAST(n_chars AS BIGINT) AS x,
         CAST(len(regexp_extract_all(text, '{_ASCII_TOK_PAT}')) AS BIGINT)
           AS y
  FROM documents),
r AS (
  SELECT
    2 * rank() OVER (ORDER BY x) + count(*) OVER (PARTITION BY x) - 1
      AS rx,
    2 * rank() OVER (ORDER BY y) + count(*) OVER (PARTITION BY y) - 1
      AS ry
  FROM t),
m AS (
  SELECT count(*) AS n, sum(rx) AS sx, sum(ry) AS sy,
         sum(rx * rx) AS sxx, sum(ry * ry) AS syy,
         sum(rx * ry) AS sxy
  FROM r)
SELECT CAST(n AS BIGINT) AS n_docs,
  CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
       THEN round(CAST(n * sxy - sx * sy AS DOUBLE)
                  / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                     * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
       ELSE NULL END AS spearman
FROM m
"""


_DAY_US_CONST = 86_400_000_000


def q_activity_union(sf_dir: str):
    """Multi-source harmonization (UNION ALL of differently-shaped
    tables): daily activity counts by stream, merging events (ts) and
    orders (o_orderdate) into one schema. Each source reduces
    map-side to (day, n) partials BEFORE the Dataset.union, so the
    union carries day-cardinality rows, and the final multi-column
    groupby runs over the already-reduced tiny table (never a fact
    table — the packed-key rule's safe case). Day buckets use exact
    int64 epoch-microsecond floor-division, matching the oracles'
    integer `//`."""

    def day_partial(col: str, stream: str):
        def fn(t: pa.Table) -> pa.Table:
            import numpy as _np

            day = _np.floor_divide(
                pc.cast(t[col], pa.int64()).to_numpy(), _DAY_US_CONST
            )
            ud, cnt = _np.unique(day, return_counts=True)
            return pa.table(
                {
                    "day": pa.array(ud, pa.int64()),
                    "stream": pa.array([stream] * len(ud), pa.string()),
                    "n": pa.array(cnt.astype(_np.int64), pa.int64()),
                }
            )

        return fn

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts"]
    ).map_batches(day_partial("ts", "events"), batch_format="pyarrow")
    od = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate"]
    ).map_batches(
        day_partial("o_orderdate", "orders"), batch_format="pyarrow"
    )
    return (
        ev.union(od)
        .groupby(["day", "stream"])
        .aggregate(Sum("n", alias_name="n"))
    )


SQL_ACTIVITY_UNION = """
WITH a AS (
  SELECT epoch_us(ts) // 86400000000 AS day, 'events' AS stream
  FROM events
  UNION ALL
  SELECT epoch_us(o_orderdate) // 86400000000 AS day, 'orders' AS stream
  FROM orders)
SELECT CAST(day AS BIGINT) AS day, stream,
       CAST(count(*) AS BIGINT) AS n
FROM a GROUP BY day, stream
"""


def q_time_to_purchase(sf_dir: str):
    """Conditional aggregate with NULL semantics: per user, the
    microseconds from their first event to their first purchase —
    NULL when they never purchased. Per-batch partials carry two
    sentinel-coded minima per user (bounded by users in the batch),
    min-merge inside bounded user-hash partitions, and the output is
    an Arrow int64-with-nulls column (the registry's nullable-int
    contract — never a pandas masked dtype)."""
    import numpy as np

    _SENT = np.iinfo(np.int64).max

    def min_partial(t: pa.Table) -> pa.Table:
        import numpy as _np

        uid = t["user_id"].to_numpy()
        ts = pc.cast(t["ts"], pa.int64()).to_numpy()
        is_p = t["event_type"].to_numpy(zero_copy_only=False) == "purchase"
        users, inv = _np.unique(uid, return_inverse=True)
        m_all = _np.full(len(users), _SENT, dtype=_np.int64)
        _np.minimum.at(m_all, inv, ts)
        m_p = _np.full(len(users), _SENT, dtype=_np.int64)
        _np.minimum.at(m_p, inv[is_p], ts[is_p])
        return pa.table(
            {
                "u": pa.array(users, pa.int64()),
                "m_all": pa.array(m_all, pa.int64()),
                "m_p": pa.array(m_p, pa.int64()),
                "part": pa.array(
                    (users & (relational.NUM_EVENT_PARTITIONS - 1)).astype(
                        _np.int32
                    ),
                    pa.int32(),
                ),
            }
        )

    def merge_partition(df) -> pa.Table:
        import numpy as _np

        users, inv = _np.unique(df["u"].to_numpy(), return_inverse=True)
        m_all = _np.full(len(users), _SENT, dtype=_np.int64)
        _np.minimum.at(m_all, inv, df["m_all"].to_numpy())
        m_p = _np.full(len(users), _SENT, dtype=_np.int64)
        _np.minimum.at(m_p, inv, df["m_p"].to_numpy())
        never = m_p == _SENT
        delta = _np.where(never, 0, m_p - m_all)
        return pa.table(
            {
                "user_id": pa.array(users, pa.int64()),
                "delta_us": pa.array(delta, pa.int64(), mask=never),
            }
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "ts", "event_type"],
        )
        .map_batches(min_partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(merge_partition, batch_format="pandas")
    )


SQL_TIME_TO_PURCHASE = """
SELECT CAST(user_id AS BIGINT) AS user_id,
  CAST(epoch_us(min(CASE WHEN event_type = 'purchase' THEN ts END))
       - epoch_us(min(ts)) AS BIGINT) AS delta_us
FROM events GROUP BY user_id
"""


def q_all_type_users(sf_dir: str):
    """Set INTERSECT across five derived distinct sets (users who
    performed EVERY event type), as the same presence-bit OR-reduce
    as the EXCEPT op: one bit per event type folds per batch, bits
    OR-merge in bounded user-hash partitions, and the five-way
    INTERSECT is `bits == 0b11111` — no distinct-shuffles, no
    joins."""
    import numpy as np

    _TYPES = np.array(
        ["click", "error", "purchase", "signup", "view"], dtype=object
    )

    def bits_partial(t: pa.Table) -> pa.Table:
        import numpy as _np

        et = t["event_type"].to_numpy(zero_copy_only=False)
        code = _np.searchsorted(_TYPES, et)
        uid = t["user_id"].to_numpy()
        users, inv = _np.unique(uid, return_inverse=True)
        bits = _np.zeros(len(users), dtype=_np.int64)
        _np.bitwise_or.at(bits, inv, _np.int64(1) << code)
        return pa.table(
            {
                "u": pa.array(users, pa.int64()),
                "bits": pa.array(bits, pa.int64()),
                "part": pa.array(
                    (users & (relational.NUM_EVENT_PARTITIONS - 1)).astype(
                        _np.int32
                    ),
                    pa.int32(),
                ),
            }
        )

    def intersect_partition(df) -> pa.Table:
        import numpy as _np

        users, inv = _np.unique(df["u"].to_numpy(), return_inverse=True)
        bits = _np.zeros(len(users), dtype=_np.int64)
        _np.bitwise_or.at(bits, inv, df["bits"].to_numpy())
        return pa.table(
            {"user_id": pa.array(users[bits == 0b11111], pa.int64())}
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
        )
        .map_batches(bits_partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(intersect_partition, batch_format="pandas")
    )


SQL_ALL_TYPE_USERS = """
SELECT CAST(user_id AS BIGINT) AS user_id
FROM events WHERE event_type = 'click'
INTERSECT SELECT CAST(user_id AS BIGINT) FROM events
  WHERE event_type = 'error'
INTERSECT SELECT CAST(user_id AS BIGINT) FROM events
  WHERE event_type = 'purchase'
INTERSECT SELECT CAST(user_id AS BIGINT) FROM events
  WHERE event_type = 'signup'
INTERSECT SELECT CAST(user_id AS BIGINT) FROM events
  WHERE event_type = 'view'
"""


def q_cheapest_supplier_per_part(sf_dir: str):
    """Correlated-MIN join-back (the TPC-H Q2 shape on this schema):
    per part, the minimum line price and how many lines hit it.
    Partials carry (part, batch-min, count-at-batch-min); the
    partition merge keeps counts only from partials whose min equals
    the true min (one lexsort + segment sum — the classic argmin
    re-join without a join). Bounded part-hash partitions; lineitem
    never shuffles raw."""
    import numpy as np

    def min_partial(t: pa.Table) -> pa.Table:
        import numpy as _np

        pk = t["l_partkey"].to_numpy()
        cents = pc.cast(
            pc.floor(
                pc.add(
                    pc.multiply(t["l_extendedprice"], pa.scalar(100.0)),
                    pa.scalar(0.5),
                )
            ),
            pa.int64(),
        ).to_numpy()
        parts, inv = _np.unique(pk, return_inverse=True)
        m = _np.full(len(parts), _np.iinfo(_np.int64).max, dtype=_np.int64)
        _np.minimum.at(m, inv, cents)
        at_min = cents == m[inv]
        c = _np.zeros(len(parts), dtype=_np.int64)
        _np.add.at(c, inv[at_min], 1)
        return pa.table(
            {
                "p": pa.array(parts, pa.int64()),
                "m": pa.array(m, pa.int64()),
                "c": pa.array(c, pa.int64()),
                "part": pa.array(
                    (parts & (relational.NUM_EVENT_PARTITIONS - 1)).astype(
                        _np.int32
                    ),
                    pa.int32(),
                ),
            }
        )

    def merge_partition(df) -> pa.Table:
        import numpy as _np

        p = df["p"].to_numpy()
        m = df["m"].to_numpy()
        c = df["c"].to_numpy()
        idx = _np.lexsort((m, p))
        p2, m2, c2 = p[idx], m[idx], c[idx]
        new = _np.r_[True, p2[1:] != p2[:-1]]
        gidx = _np.cumsum(new) - 1
        run_min = m2[_np.nonzero(new)[0]]
        at_min = m2 == run_min[gidx]
        n_parts = int(gidx[-1]) + 1 if len(p2) else 0
        sums = _np.zeros(n_parts, dtype=_np.int64)
        _np.add.at(sums, gidx[at_min], c2[at_min])
        return pa.table(
            {
                "l_partkey": pa.array(p2[new], pa.int64()),
                "min_cents": pa.array(run_min, pa.int64()),
                "n_at_min": pa.array(sums, pa.int64()),
            }
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_extendedprice"],
        )
        .map_batches(min_partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(merge_partition, batch_format="pandas")
    )


SQL_CHEAPEST_SUPPLIER_PER_PART = """
WITH lc AS (
  SELECT l_partkey,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
  FROM lineitem),
w AS (
  SELECT l_partkey, cents,
         min(cents) OVER (PARTITION BY l_partkey) AS m
  FROM lc)
SELECT CAST(l_partkey AS BIGINT) AS l_partkey,
       CAST(m AS BIGINT) AS min_cents,
       CAST(count(*) AS BIGINT) AS n_at_min
FROM w WHERE cents = m GROUP BY l_partkey, m
"""


def q_char_budget_curation(sf_dir: str):
    """Token-budget corpus curation: per language, keep the longest
    docs (n_chars DESC, doc_id ASC) until 10% of that language's
    total characters — the grouped ordered running-sum cutoff, WITHOUT
    a distributed sort. The shared (lang, n_chars) histogram yields
    both the budget (exact integer total // 10) and the cutoff walk
    (how many docs of each length fit); only the single boundary
    length per language needs doc_id tie-breaking, resolved by one
    tiny filtered pass (docs AT the cutoff length only), and the
    final keep-filter is a broadcast rule — the corpus is scanned,
    never sorted, never shuffled."""
    import numpy as np

    ds, hist = _lang_length_hist(sf_dir)
    cut_len: dict[str, int] = {}  # keep all docs strictly longer
    cut_k: dict[str, int] = {}  # docs to keep AT the cutoff length
    for lang, g in hist.groupby("lang", sort=False):
        g = g.sort_values("n_chars", ascending=False)
        lens = g["n_chars"].to_numpy()
        cnts = g["n"].to_numpy()
        budget = int((lens * cnts).sum()) // 10
        cum = 0
        cl, ck = -1, 0
        for L, m in zip(lens, cnts):
            L, m = int(L), int(m)
            fit = m if L == 0 else min(m, max(0, (budget - cum) // L))
            if fit < m:
                cl, ck = L, fit
                break
            cum += L * m
        else:
            cl, ck = -1, 0  # budget swallows everything
        cut_len[lang] = cl
        cut_k[lang] = ck

    cut_ref = ray.put((cut_len, cut_k))

    def boundary_docs(t: pa.Table) -> pa.Table:
        import numpy as _np

        from ..functions.broadcast import cached_get

        cl, _ = cached_get(cut_ref)
        langs = t["lang"].to_numpy(zero_copy_only=False)
        nc = t["n_chars"].to_numpy()
        ul, inv = _np.unique(langs, return_inverse=True)
        cuts = _np.array([cl.get(l, -2) for l in ul], dtype=_np.int64)
        keep = _np.nonzero(nc == cuts[inv])[0]
        return t.take(pa.array(keep, pa.int64()))

    # tiny pass: only docs AT a cutoff length (histogram-cell sized)
    boundary = (
        ds.map_batches(boundary_docs, batch_format="pyarrow")
        .select_columns(["doc_id", "lang"])
        .take_all()
    )
    by_lang: dict[str, list[int]] = {}
    for r in boundary:
        by_lang.setdefault(r["lang"], []).append(r["doc_id"])
    keep_at_cut = {
        lang: frozenset(sorted(ids)[: cut_k[lang]])
        for lang, ids in by_lang.items()
    }
    keep_ref = ray.put((cut_len, keep_at_cut))

    def keep_filter(t: pa.Table) -> pa.Table:
        import numpy as _np

        from ..functions.broadcast import cached_get

        cl, ks = cached_get(keep_ref)
        langs = t["lang"].to_numpy(zero_copy_only=False)
        nc = t["n_chars"].to_numpy()
        ids = t["doc_id"].to_numpy()
        ul, inv = _np.unique(langs, return_inverse=True)
        cuts = _np.array([cl.get(l, -2) for l in ul], dtype=_np.int64)
        cut_row = cuts[inv]
        mask = (cut_row == -1) | (nc > cut_row)
        # tie-break only at the (rare) cutoff cells — loop over THOSE
        at_cut = _np.nonzero(nc == cut_row)[0]
        for i in at_cut:
            if ids[i] in ks.get(langs[i], frozenset()):
                mask[i] = True
        sub = t.take(pa.array(_np.nonzero(mask)[0], pa.int64()))
        return pa.table(
            {"doc_id": sub["doc_id"], "lang": sub["lang"]}
        )

    return ds.map_batches(keep_filter, batch_format="pyarrow")


SQL_CHAR_BUDGET_CURATION = """
WITH tot AS (
  SELECT lang,
         CAST(sum(CAST(n_chars AS BIGINT)) // 10 AS BIGINT) AS b
  FROM documents GROUP BY lang),
r AS (
  SELECT lang, doc_id,
         sum(CAST(n_chars AS BIGINT)) OVER (
           PARTITION BY lang ORDER BY n_chars DESC, doc_id ASC
           ROWS UNBOUNDED PRECEDING) AS run
  FROM documents)
SELECT CAST(r.doc_id AS BIGINT) AS doc_id, r.lang
FROM r JOIN tot ON r.lang = tot.lang
WHERE r.run <= tot.b
"""


def q_lineitem_profile(sf_dir: str):
    """One-pass multi-column table profiling (count / min / max /
    mean / stddev_pop for four numeric columns) with EXACT integer
    moments: each batch reduces to one 4-row partial in the integer
    domain (qty, cents, bp); sums of squares exceed int64 at fact
    scale, so each partial splits them hi/lo at 2^62 (the oracle's
    HUGEINT path mirrored with Python ints) and the driver merges the
    tiny partials. Mean and std are the same float64 expressions the
    oracle evaluates, 6-dp."""
    import math

    import numpy as np

    _COLS = (
        ("qty", "l_quantity", 1.0),
        ("price_cents", "l_extendedprice", 100.0),
        ("discount_bp", "l_discount", 10000.0),
        ("tax_bp", "l_tax", 10000.0),
    )
    _HI = 1 << 62

    def profile_partial(t: pa.Table) -> pa.Table:
        import numpy as _np

        out = {
            "col": [],
            "n": [],
            "mn": [],
            "mx": [],
            "sx": [],
            "sxx_hi": [],
            "sxx_lo": [],
        }
        for name, src, scale in _COLS:
            v = pc.cast(
                pc.floor(
                    pc.add(
                        pc.multiply(t[src], pa.scalar(scale)), pa.scalar(0.5)
                    )
                ),
                pa.int64(),
            ).to_numpy()
            vo = v.astype(object)
            sxx = int((vo * vo).sum())
            hi, lo = divmod(sxx, _HI)
            out["col"].append(name)
            out["n"].append(len(v))
            out["mn"].append(int(v.min()) if len(v) else 0)
            out["mx"].append(int(v.max()) if len(v) else 0)
            out["sx"].append(int(v.sum()))
            out["sxx_hi"].append(hi)
            out["sxx_lo"].append(lo)
        return pa.table(
            {
                "col": pa.array(out["col"], pa.string()),
                "n": pa.array(out["n"], pa.int64()),
                "mn": pa.array(out["mn"], pa.int64()),
                "mx": pa.array(out["mx"], pa.int64()),
                "sx": pa.array(out["sx"], pa.int64()),
                "sxx_hi": pa.array(out["sxx_hi"], pa.int64()),
                "sxx_lo": pa.array(out["sxx_lo"], pa.int64()),
            }
        )

    parts = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=[src for _, src, _ in _COLS],
        )
        .map_batches(profile_partial, batch_format="pyarrow")
        .take_all()  # bounded: 4 rows per block
    )
    agg: dict[str, list] = {}
    for r in parts:
        if r["n"] == 0:  # empty-batch partial: its 0/0 min/max is void
            continue
        a = agg.setdefault(
            r["col"], [0, None, None, 0, 0]
        )  # n, mn, mx, sx, sxx
        a[0] += r["n"]
        a[1] = r["mn"] if a[1] is None else min(a[1], r["mn"])
        a[2] = r["mx"] if a[2] is None else max(a[2], r["mx"])
        a[3] += r["sx"]
        a[4] += r["sxx_hi"] * _HI + r["sxx_lo"]
    out = {"col": [], "n": [], "vmin": [], "vmax": [], "mean": [], "std": []}
    for name, _, _ in _COLS:
        n, mn, mx, sx, sxx = agg[name]
        out["col"].append(name)
        out["n"].append(n)
        out["vmin"].append(mn)
        out["vmax"].append(mx)
        out["mean"].append(_round6(sx / n))
        out["std"].append(_round6(math.sqrt(float(n * sxx - sx * sx)) / n))
    return pa.table(
        {
            "col": pa.array(out["col"], pa.string()),
            "n": pa.array(out["n"], pa.int64()),
            "vmin": pa.array(out["vmin"], pa.int64()),
            "vmax": pa.array(out["vmax"], pa.int64()),
            "mean": pa.array(out["mean"], pa.float64()),
            "std": pa.array(out["std"], pa.float64()),
        }
    )


SQL_LINEITEM_PROFILE = """
WITH c AS (
  SELECT CAST(floor(l_quantity * 1 + 0.5) AS BIGINT) AS qty,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
         CAST(floor(l_discount * 10000 + 0.5) AS BIGINT) AS dbp,
         CAST(floor(l_tax * 10000 + 0.5) AS BIGINT) AS tbp
  FROM lineitem),
m AS (
  SELECT 'qty' AS col, count(*) AS n, min(qty) AS mn, max(qty) AS mx,
         sum(qty) AS sx, sum(qty * qty) AS sxx FROM c
  UNION ALL
  SELECT 'price_cents', count(*), min(cents), max(cents),
         sum(cents), sum(cents * cents) FROM c
  UNION ALL
  SELECT 'discount_bp', count(*), min(dbp), max(dbp),
         sum(dbp), sum(dbp * dbp) FROM c
  UNION ALL
  SELECT 'tax_bp', count(*), min(tbp), max(tbp),
         sum(tbp), sum(tbp * tbp) FROM c)
SELECT col, CAST(n AS BIGINT) AS n,
       CAST(mn AS BIGINT) AS vmin, CAST(mx AS BIGINT) AS vmax,
       round(CAST(sx AS DOUBLE) / n, 6) AS mean,
       round(sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) / n, 6) AS std
FROM m
"""


def q_nation_revenue_share(sf_dir: str):
    """Percent-of-total at mixed granularity (window-over-aggregate:
    each nation's share of its region's order revenue). The customer
    dimension chain collapses to a broadcast custkey→(region,nation)
    lookup, orders reduce map-side to exact integer cents per
    (region, nation) — a tiny groupby — and the share is ONE float
    division per row computed after a driver-side region fold,
    mirroring the oracle's sum() OVER (PARTITION BY region)."""
    import numpy as np

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet",
        columns=["n_nationkey", "n_name", "n_regionkey"],
    )
    region = pq.read_table(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    )
    nk2name = dict(
        zip(nation["n_nationkey"].to_pylist(), nation["n_name"].to_pylist())
    )
    nk2r = dict(
        zip(
            nation["n_nationkey"].to_pylist(),
            nation["n_regionkey"].to_pylist(),
        )
    )
    r2n = dict(
        zip(region["r_regionkey"].to_pylist(), region["r_name"].to_pylist())
    )
    custkeys = np.asarray(cust["c_custkey"].to_pylist(), dtype=np.int64)
    order_idx = np.argsort(custkeys, kind="stable")
    sorted_keys = custkeys[order_idx]
    natkeys = np.asarray(cust["c_nationkey"].to_pylist(), dtype=np.int64)[
        order_idx
    ]
    lut_ref = ray.put((sorted_keys, natkeys))

    def cents_partial(t: pa.Table) -> pa.Table:
        import numpy as _np

        from ..functions.broadcast import cached_get

        keys, nats = cached_get(lut_ref)
        ck = t["o_custkey"].to_numpy()
        pos = _np.minimum(_np.searchsorted(keys, ck), len(keys) - 1)
        found = keys[pos] == ck
        cents = pc.cast(
            pc.floor(
                pc.add(
                    pc.multiply(t["o_totalprice"], pa.scalar(100.0)),
                    pa.scalar(0.5),
                )
            ),
            pa.int64(),
        ).to_numpy()
        nk = nats[pos][found]
        cc = cents[found]
        un, inv = _np.unique(nk, return_inverse=True)
        sums = _np.zeros(len(un), dtype=_np.int64)
        _np.add.at(sums, inv, cc)
        return pa.table(
            {
                "nk": pa.array(un, pa.int64()),
                "cents": pa.array(sums, pa.int64()),
            }
        )

    rows = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
        )
        .map_batches(cents_partial, batch_format="pyarrow")
        .groupby("nk")
        .aggregate(Sum("cents", alias_name="cents"))
        .take_all()  # bounded: one row per nation
    )
    region_tot: dict[int, int] = {}
    for r in rows:
        rk = nk2r[r["nk"]]
        region_tot[rk] = region_tot.get(rk, 0) + r["cents"]
    return pa.table(
        {
            "r_name": pa.array(
                [r2n[nk2r[r["nk"]]] for r in rows], pa.string()
            ),
            "n_name": pa.array([nk2name[r["nk"]] for r in rows], pa.string()),
            "revenue_cents": pa.array([r["cents"] for r in rows], pa.int64()),
            "share": pa.array(
                [
                    _round6(r["cents"] / region_tot[nk2r[r["nk"]]])
                    for r in rows
                ],
                pa.float64(),
            ),
        }
    )


SQL_NATION_REVENUE_SHARE = """
WITH nr AS (
  SELECT r_name, n_name,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS revenue_cents
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY r_name, n_name)
SELECT r_name, n_name, revenue_cents,
  round(CAST(revenue_cents AS DOUBLE)
        / sum(revenue_cents) OVER (PARTITION BY r_name), 6) AS share
FROM nr
"""


def q_top_docs_with_ties(sf_dir: str):
    """Per-group top-k WITH ties (RANK, not ROW_NUMBER): all docs
    whose length is beaten by fewer than 3 docs in their language.
    The rank threshold per language reads off the shared length
    histogram's descending CDF (keep lengths where the strictly-
    longer count <= 2), broadcasts as a tiny floor dict, and the keep
    is a map-side filter — no per-group sort, no shuffle, and tied
    boundary docs come along exactly as RANK semantics require."""
    import numpy as np

    ds, hist = _lang_length_hist(sf_dir)
    floor_len: dict[str, int] = {}
    for lang, g in hist.groupby("lang", sort=False):
        g = g.sort_values("n_chars", ascending=False)
        lens = g["n_chars"].to_numpy()
        cnts = g["n"].to_numpy()
        longer = np.concatenate(([0], np.cumsum(cnts)[:-1]))
        keep = lens[longer <= 2]
        floor_len[lang] = int(keep[-1]) if len(keep) else int(lens[0]) + 1
    floor_ref = ray.put(floor_len)

    def keep_filter(t: pa.Table) -> pa.Table:
        import numpy as _np

        from ..functions.broadcast import cached_get

        fl = cached_get(floor_ref)
        langs = t["lang"].to_numpy(zero_copy_only=False)
        nc = t["n_chars"].to_numpy()
        ul, inv = _np.unique(langs, return_inverse=True)
        floors = _np.array([fl[l] for l in ul], dtype=_np.int64)
        keep = _np.nonzero(nc >= floors[inv])[0]
        sub = t.take(pa.array(keep, pa.int64()))
        return pa.table(
            {
                "doc_id": sub["doc_id"],
                "lang": sub["lang"],
                "n_chars": sub["n_chars"],
            }
        )

    return ds.map_batches(keep_filter, batch_format="pyarrow")


SQL_TOP_DOCS_WITH_TIES = """
SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
       CAST(n_chars AS BIGINT) AS n_chars
FROM (
  SELECT doc_id, lang, n_chars,
         rank() OVER (PARTITION BY lang ORDER BY n_chars DESC) AS rk
  FROM documents) t
WHERE rk <= 3
"""


def q_gini_by_priority(sf_dir: str):
    """Gini inequality coefficient of order value per priority class,
    EXACTLY, from a histogram — no sort: per-(priority, cents)
    partials reduce map-side, ONE bounded groupby on a deterministic
    priority-hash partition id co-locates each priority's histogram
    (cents is near-unique, so keying the exchange on (prio, cents)
    would run at fact-table cardinality), and the rank-sum numerator
    Σ(2·rn − n − 1)·x folds over histogram cells in closed form
    INSIDE the partition (a cell of m equal values starting after c
    rows contributes x·(2·(m·c + m(m+1)/2) − m(n+1)) — exact
    integers; tie order cannot matter because tied values are equal).
    One float division, 6-dp, the same expression as the oracle's
    row_number window; only |priorities| rows reach the driver."""
    import numpy as np
    import pandas as pd

    def hist_partial(t: pa.Table) -> pa.Table:
        import zlib

        cents = pc.cast(
            pc.floor(
                pc.add(
                    pc.multiply(t["o_totalprice"], pa.scalar(100.0)),
                    pa.scalar(0.5),
                )
            ),
            pa.int64(),
        ).to_numpy()
        df = pd.DataFrame(
            {"prio": t["o_orderpriority"].to_pylist(), "cents": cents}
        )
        g = (
            df.groupby(["prio", "cents"], sort=False)
            .size()
            .reset_index(name="n")
        )
        # bounded partition id from a deterministic string hash — the
        # exchange key is NEVER the near-unique (prio, cents) pair (a
        # multi-column Ray groupby there runs at fact-table
        # cardinality, the measured ~750x cliff)
        part = [
            zlib.crc32(p.encode()) & (relational.NUM_EVENT_PARTITIONS - 1)
            for p in g["prio"]
        ]
        return pa.table(
            {
                "prio": pa.array(g["prio"], pa.string()),
                "cents": pa.array(g["cents"].to_numpy(), pa.int64()),
                "n": pa.array(g["n"].to_numpy(), pa.int64()),
                "part": pa.array(np.asarray(part, dtype=np.int32), pa.int32()),
            }
        )

    def gini_partition(df) -> pa.Table:
        # one bounded partition holds every (cents, n) cell for its
        # priorities; the exact-integer rank-sum fold (Python ints —
        # the numerator exceeds int64 at scale) runs HERE, not on the
        # driver, and only |priorities| final rows leave
        out_p: list[str] = []
        out_g: list[float | None] = []
        for prio, g in df.groupby("prio", sort=False):
            gg = g.groupby("cents", sort=True)["n"].sum()
            x = [int(v) for v in gg.index]
            m = [int(v) for v in gg.to_numpy()]
            n = sum(m)
            total = sum(a * b for a, b in zip(x, m))
            num = 0
            c = 0
            for xi, mi in zip(x, m):
                num += xi * (
                    2 * (mi * c + mi * (mi + 1) // 2) - mi * (n + 1)
                )
                c += mi
            out_p.append(prio)
            out_g.append(_round6(num / (n * total)) if total else None)
        return pa.table(
            {
                "o_orderpriority": pa.array(out_p, pa.string()),
                "gini": pa.array(out_g, pa.float64()),
            }
        )

    return _with_schema(
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderpriority", "o_totalprice"],
        )
        .map_batches(hist_partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(gini_partition, batch_format="pandas"),
        o_orderpriority=pa.string(),
        gini=pa.float64(),
    )


SQL_GINI_BY_PRIORITY = """
WITH c AS (
  SELECT o_orderpriority,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders),
r AS (
  SELECT o_orderpriority, cents,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY cents) AS rn,
         count(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM c)
SELECT o_orderpriority,
  round(CAST(sum((2 * rn - n - 1) * cents) AS DOUBLE)
        / (n * sum(cents)), 6) AS gini
FROM r GROUP BY o_orderpriority, n
"""


def q_cohort_retention(sf_dir: str):
    """Cohort retention matrix (signup-cohort week x active week →
    distinct users) in ONE pass over events: bounded user-hash
    partitions hold each user's whole history, so the per-partition
    reduce derives the user's cohort week (min event week) AND their
    distinct active weeks together — no self-join of the fact table,
    and only (cohort, week, count) cells leave the partition."""
    import numpy as np

    _WEEK_US = 7 * 86_400_000_000

    def week_partial(t: pa.Table) -> pa.Table:
        import numpy as _np

        uid = t["user_id"].to_numpy()
        wk = _np.floor_divide(
            pc.cast(t["ts"], pa.int64()).to_numpy(), _WEEK_US
        )
        # dedup (user, week) map-side; weeks fit 21 bits for millennia
        _guard_pack(uid, wk, 21, "cohort_retention (user,week)")
        key = _np.unique(uid * (1 << 21) + wk)
        return pa.table(
            {
                "key": pa.array(key, pa.int64()),
                "part": pa.array(
                    (
                        (key >> 21)
                        & (relational.NUM_EVENT_PARTITIONS - 1)
                    ).astype(_np.int32),
                    pa.int32(),
                ),
            }
        )

    def cohort_partition(df) -> pa.Table:
        import numpy as _np

        keys = _np.unique(df["key"].to_numpy())
        users = keys >> 21
        weeks = keys & ((1 << 21) - 1)
        # keys sorted => first row per user run is their min week
        new = _np.r_[True, users[1:] != users[:-1]]
        gidx = _np.cumsum(new) - 1
        cohort = weeks[new][gidx]
        cell, cnt = _np.unique(
            cohort * (1 << 21) + weeks, return_counts=True
        )
        return pa.table(
            {
                "cohort_week": pa.array(
                    (cell >> 21).astype(_np.int64), pa.int64()
                ),
                "week": pa.array(
                    (cell & ((1 << 21) - 1)).astype(_np.int64), pa.int64()
                ),
                "n": pa.array(cnt.astype(_np.int64), pa.int64()),
            }
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
        )
        .map_batches(week_partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(cohort_partition, batch_format="pandas")
        .groupby(["cohort_week", "week"])
        .aggregate(Sum("n", alias_name="n_users"))
    )


SQL_COHORT_RETENTION = """
WITH uw AS (
  SELECT DISTINCT CAST(user_id AS BIGINT) AS u,
         epoch_us(ts) // 604800000000 AS wk
  FROM events),
first_wk AS (
  SELECT u, min(wk) AS cohort FROM uw GROUP BY u)
SELECT CAST(f.cohort AS BIGINT) AS cohort_week,
       CAST(uw.wk AS BIGINT) AS week,
       CAST(count(*) AS BIGINT) AS n_users
FROM uw JOIN first_wk f ON uw.u = f.u
GROUP BY f.cohort, uw.wk
"""


# ------------------------------------- round-5 additions (batch 2)

_DAY_US = 86_400_000_000


def q_promo_revenue(sf_dir: str):
    """Promo revenue share per ship-month (the TPC-H Q14 shape): part
    is a DIMENSION, so it broadcasts once as a sorted
    partkey→is_promo lookup (`ray.put`, per-worker LRU) and lineitem
    enriches map-side — the fact table never shuffles. Revenue folds
    per batch into one row per distinct ship-month (np.unique +
    add.at), so the only groupby runs at O(months), not |lineitem|.
    The share column is the raw int/int IEEE division (bit-identical
    to DuckDB BIGINT/BIGINT → DOUBLE)."""
    import numpy as np

    part_t = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
    )
    keys = np.asarray(part_t["p_partkey"].to_pylist(), dtype=np.int64)
    promo = np.asarray(
        [x == "PROMO" for x in part_t["p_type"].to_pylist()], dtype=np.int64
    )
    order = np.argsort(keys, kind="stable")
    lookup_ref = ray.put((keys[order], promo[order]))

    def partial(t: pa.Table) -> pa.Table:
        import numpy as _np

        from ..functions.broadcast import cached_get

        keys_s, promo_s = cached_get(lookup_ref)
        pk = t["l_partkey"].to_numpy()
        if len(keys_s) == 0:
            found = _np.zeros(len(pk), dtype=bool)
            pos = _np.zeros(len(pk), dtype=_np.int64)
        else:
            pos = _np.minimum(
                _np.searchsorted(keys_s, pk), len(keys_s) - 1
            )
            found = keys_s[pos] == pk
        ep = t["l_extendedprice"].to_numpy()
        disc = t["l_discount"].to_numpy()
        cents = _np.floor(ep * (1.0 - disc) * 100.0 + 0.5).astype(_np.int64)
        month = (
            pc.cast(t["l_shipdate"], pa.int64())
            .to_numpy()
            .astype("datetime64[us]")
            .astype("datetime64[M]")
            .astype(_np.int64)
        )
        is_promo = _np.zeros(len(pk), dtype=_np.int64)
        is_promo[found] = promo_s[pos[found]]
        um, inv = _np.unique(month[found], return_inverse=True)
        p_c = _np.zeros(len(um), dtype=_np.int64)
        t_c = _np.zeros(len(um), dtype=_np.int64)
        cf = cents[found]
        _np.add.at(p_c, inv, cf * is_promo[found])
        _np.add.at(t_c, inv, cf)
        return pa.table(
            {
                "ship_month": pa.array(
                    _np.datetime_as_string(um.astype("datetime64[M]")),
                    pa.string(),
                ),
                "promo_cents": pa.array(p_c, pa.int64()),
                "total_cents": pa.array(t_c, pa.int64()),
            }
        )

    def add_share(t: pa.Table) -> pa.Table:
        import numpy as _np

        p = t["promo_cents"].to_numpy()
        tot = t["total_cents"].to_numpy()
        safe = _np.where(tot == 0, 1, tot)
        share = p / safe
        return t.append_column(
            "promo_share",
            pa.array(share, pa.float64(), mask=(tot == 0)),
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=[
                "l_partkey",
                "l_extendedprice",
                "l_discount",
                "l_shipdate",
            ],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("ship_month")
        .aggregate(
            Sum("promo_cents", alias_name="promo_cents"),
            Sum("total_cents", alias_name="total_cents"),
        )
        .map_batches(add_share, batch_format="pyarrow")
    )


SQL_PROMO_REVENUE = """
WITH j AS (
  SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
         CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
              AS BIGINT) AS cents,
         p_type
  FROM lineitem JOIN part ON l_partkey = p_partkey)
SELECT ship_month,
       CAST(sum(CASE WHEN p_type = 'PROMO' THEN cents ELSE 0 END)
            AS BIGINT) AS promo_cents,
       CAST(sum(cents) AS BIGINT) AS total_cents,
       CAST(sum(CASE WHEN p_type = 'PROMO' THEN cents ELSE 0 END)
            AS BIGINT)
         / CAST(sum(cents) AS BIGINT) AS promo_share
FROM j GROUP BY ship_month
"""


# OR-of-ANDs predicate clauses: (brand, max p_size, qty lo, qty hi).
# Brand#1/2/3 exist in both the sf testdata and the fuzz warehouse.
_DISJ_CLAUSES = (
    ("Brand#1", 15, 1.0, 11.0),
    ("Brand#2", 25, 10.0, 20.0),
    ("Brand#3", 35, 20.0, 30.0),
)


def q_disjunctive_revenue(sf_dir: str):
    """Disjunctive multi-predicate join (the TPC-H Q19 shape): the
    part-side half of each OR clause (brand + size range) precomputes
    into a per-part 3-bit clause mask that broadcasts with the sorted
    partkey lookup; lineitem evaluates the remaining quantity ranges
    map-side with pure numpy boolean algebra and folds to ONE
    (n, cents) row per batch — no shuffle anywhere, final fold is
    O(#batches). Empty-match semantics mirror SQL's ungrouped
    aggregate: one row, n_lines 0, revenue_cents NULL."""
    import numpy as np

    part_t = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_size"]
    )
    keys = np.asarray(part_t["p_partkey"].to_pylist(), dtype=np.int64)
    brands = part_t["p_brand"].to_pylist()
    sizes = np.asarray(part_t["p_size"].to_pylist(), dtype=np.int64)
    mask3 = np.zeros(len(keys), dtype=np.uint8)
    for bit, (brand, size_hi, _, _) in enumerate(_DISJ_CLAUSES):
        hit = np.asarray(
            [b == brand for b in brands], dtype=bool
        ) & (sizes >= 1) & (sizes <= size_hi)
        mask3[hit] |= 1 << bit
    order = np.argsort(keys, kind="stable")
    lookup_ref = ray.put((keys[order], mask3[order]))

    def partial(t: pa.Table) -> pa.Table:
        import numpy as _np

        from ..functions.broadcast import cached_get

        keys_s, mask_s = cached_get(lookup_ref)
        pk = t["l_partkey"].to_numpy()
        if len(keys_s) == 0:
            m = _np.zeros(len(pk), dtype=_np.uint8)
        else:
            pos = _np.minimum(
                _np.searchsorted(keys_s, pk), len(keys_s) - 1
            )
            m = _np.where(keys_s[pos] == pk, mask_s[pos], 0).astype(
                _np.uint8
            )
        qty = t["l_quantity"].to_numpy()
        ok = _np.zeros(len(pk), dtype=bool)
        for bit, (_, _, qlo, qhi) in enumerate(_DISJ_CLAUSES):
            ok |= ((m >> bit) & 1).astype(bool) & (qty >= qlo) & (
                qty <= qhi
            )
        ep = t["l_extendedprice"].to_numpy()
        disc = t["l_discount"].to_numpy()
        cents = _np.floor(ep * (1.0 - disc) * 100.0 + 0.5).astype(
            _np.int64
        )
        return pa.table(
            {
                "g": pa.array([0], pa.int32()),
                "n": pa.array([int(ok.sum())], pa.int64()),
                "cents": pa.array([int(cents[ok].sum())], pa.int64()),
            }
        )

    def finalize(df) -> pa.Table:
        n = int(df["n"].sum())
        c = int(df["cents"].sum())
        return pa.table(
            {
                "n_lines": pa.array([n], pa.int64()),
                "revenue_cents": pa.array(
                    [c if n else None], pa.int64()
                ),
            }
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=[
                "l_partkey",
                "l_quantity",
                "l_extendedprice",
                "l_discount",
            ],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("g")
        .map_groups(finalize, batch_format="pandas")
    )


SQL_DISJUNCTIVE_REVENUE = """
SELECT CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                     AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 30)
"""

_HIGH_PRIORITIES = ("1-URGENT", "2-HIGH")


def q_late_shipment_priority(sf_dir: str, key_budget_bytes: int = 64 * 2**20):
    """CASE-bucketed counts over a fact⋈fact join (the TPC-H Q12
    shape, restated for this schema): lines shipped >90 days after
    their order date, counted per return flag split by order-priority
    class. The orders side reduces to a skinny (orderkey, date_us,
    is_high) table — |orders| rows, not |lineitem| — and the regime
    is gated by MEASURED bytes (the order_priority_semi pattern):
    under ``key_budget_bytes`` it broadcasts as a sorted lookup and
    lineitem folds map-side into per-(flag) partial counts; beyond it
    the two skinny column sets meet in a distributed hash join.
    Regimes pinned identical by tests/test_relational.py."""
    import numpy as np

    def orders_skinny(t: pa.Table) -> pa.Table:
        import numpy as _np

        pr = t["o_orderpriority"].to_pylist()
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "od_us": pc.cast(t["o_orderdate"], pa.int64()),
                "is_high": pa.array(
                    _np.asarray(
                        [p in _HIGH_PRIORITIES for p in pr], dtype=_np.int64
                    ),
                    pa.int64(),
                ),
            }
        )

    orders_red = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
        )
        .map_batches(orders_skinny, batch_format="pyarrow")
        .materialize()
    )
    line = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_shipdate", "l_returnflag"],
    )

    def count_partial(
        flags, late: "np.ndarray", high: "np.ndarray"
    ) -> pa.Table:
        import numpy as _np

        f = _np.asarray(flags, dtype=object)[late]
        h = high[late]
        uf, inv = _np.unique(f, return_inverse=True)
        hi = _np.zeros(len(uf), dtype=_np.int64)
        lo = _np.zeros(len(uf), dtype=_np.int64)
        _np.add.at(hi, inv, h)
        _np.add.at(lo, inv, 1 - h)
        return pa.table(
            {
                "l_returnflag": pa.array(list(uf), pa.string()),
                "high_n": pa.array(hi, pa.int64()),
                "low_n": pa.array(lo, pa.int64()),
            }
        )

    if orders_red.size_bytes() > key_budget_bytes:
        joined = line.join(
            orders_red,
            join_type="inner",
            num_partitions=16,
            on=("l_orderkey",),
            right_on=("o_orderkey",),
        )

        def fold_joined(t: pa.Table) -> pa.Table:
            ship = pc.cast(t["l_shipdate"], pa.int64()).to_numpy()
            late = ship > t["od_us"].to_numpy() + 90 * _DAY_US
            return count_partial(
                t["l_returnflag"].to_pylist(),
                late,
                t["is_high"].to_numpy(),
            )

        folded = joined.map_batches(fold_joined, batch_format="pyarrow")
    else:
        blocks = [
            (
                b["o_orderkey"].to_numpy(),
                b["od_us"].to_numpy(),
                b["is_high"].to_numpy(),
            )
            for b in ray.get(orders_red.to_arrow_refs())
            if b.num_rows
        ]
        ok = np.concatenate(
            [b[0] for b in blocks] or [np.empty(0, np.int64)]
        )
        od = np.concatenate(
            [b[1] for b in blocks] or [np.empty(0, np.int64)]
        )
        hi = np.concatenate(
            [b[2] for b in blocks] or [np.empty(0, np.int64)]
        )
        order = np.argsort(ok, kind="stable")
        lookup_ref = ray.put((ok[order], od[order], hi[order]))

        def fold_bcast(t: pa.Table) -> pa.Table:
            import numpy as _np

            from ..functions.broadcast import cached_get

            keys_s, od_s, hi_s = cached_get(lookup_ref)
            lk = t["l_orderkey"].to_numpy()
            ship = pc.cast(t["l_shipdate"], pa.int64()).to_numpy()
            if len(keys_s) == 0:
                late = _np.zeros(len(lk), dtype=bool)
                high = _np.zeros(len(lk), dtype=_np.int64)
            else:
                pos = _np.minimum(
                    _np.searchsorted(keys_s, lk), len(keys_s) - 1
                )
                found = keys_s[pos] == lk
                late = found & (ship > od_s[pos] + 90 * _DAY_US)
                high = hi_s[pos]
            return count_partial(
                t["l_returnflag"].to_pylist(), late, high
            )

        folded = line.map_batches(fold_bcast, batch_format="pyarrow")

    return folded.groupby("l_returnflag").aggregate(
        Sum("high_n", alias_name="high_line_count"),
        Sum("low_n", alias_name="low_line_count"),
    )


SQL_LATE_SHIPMENT_PRIORITY = """
SELECT l_returnflag,
       CAST(coalesce(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                              THEN 1 ELSE 0 END), 0) AS BIGINT)
         AS high_line_count,
       CAST(coalesce(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                              THEN 0 ELSE 1 END), 0) AS BIGINT)
         AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
GROUP BY l_returnflag
"""


def q_vocab_profile(sf_dir: str):
    """Per-language vocabulary profile: token count, distinct-word
    count, hapax-legomena count and the type-token ratio. (lang, word)
    counts reduce through bounded crc32(word) hash partitions — a word
    lives wholly in ONE partition, so distinct/hapax partials add
    across partitions and the vocabulary never meets a global
    sort-aggregate; the final groupby folds 64 partials per lang.
    Tokenization is the oracle's string_split(lower(text), ' ')
    byte-for-byte (the top_words contract)."""
    import zlib

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "text"]
    )

    def partial(t: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for lang, text in zip(t["lang"].to_pylist(), t["text"].to_pylist()):
            c.update(
                (lang, w) for w in text.lower().split(" ") if w
            )
        langs = [k[0] for k in c]
        words = [k[1] for k in c]
        return pa.table(
            {
                "lang": pa.array(langs, pa.string()),
                "word": pa.array(words, pa.string()),
                "n": pa.array(list(c.values()), pa.int64()),
                "part": pa.array(
                    [zlib.crc32(w.encode("utf-8")) & 63 for w in words],
                    pa.int32(),
                ),
            }
        )

    def stats_partition(df) -> pa.Table:
        g = df.groupby(["lang", "word"], sort=False, as_index=False)[
            "n"
        ].sum()
        s = g.groupby("lang", sort=False).agg(
            n_tokens=("n", "sum"),
            n_distinct=("n", "size"),
            n_hapax=("n", lambda x: int((x == 1).sum())),
        )
        s = s.reset_index()
        return pa.table(
            {
                "lang": pa.array(s["lang"], pa.string()),
                "n_tokens": pa.array(s["n_tokens"], pa.int64()),
                "n_distinct": pa.array(s["n_distinct"], pa.int64()),
                "n_hapax": pa.array(s["n_hapax"], pa.int64()),
            }
        )

    def add_ttr(t: pa.Table) -> pa.Table:
        d = t["n_distinct"].to_numpy()
        n = t["n_tokens"].to_numpy()
        import numpy as _np

        safe = _np.where(n == 0, 1, n)
        return t.append_column(
            "type_token_ratio",
            pa.array(d / safe, pa.float64(), mask=(n == 0)),
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(stats_partition, batch_format="pandas")
        .groupby("lang")
        .aggregate(
            Sum("n_tokens", alias_name="n_tokens"),
            Sum("n_distinct", alias_name="n_distinct"),
            Sum("n_hapax", alias_name="n_hapax"),
        )
        .map_batches(add_ttr, batch_format="pyarrow")
    )


SQL_VOCAB_PROFILE = """
WITH w AS (
  SELECT lang, word, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT lang, unnest(string_split(lower(text), ' ')) AS word
        FROM documents)
  WHERE word <> ''
  GROUP BY lang, word)
SELECT lang,
       CAST(sum(c) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_distinct,
       CAST(count(*) FILTER (WHERE c = 1) AS BIGINT) AS n_hapax,
       CAST(count(*) AS BIGINT) / CAST(sum(c) AS BIGINT)
         AS type_token_ratio
FROM w GROUP BY lang
"""


def q_lang_entropy(sf_dir: str):
    """Shannon entropy (bits/token) of each language's word
    distribution. Exact to the last integer: (lang, word) counts
    reduce in bounded crc32(word) hash partitions (a word lives
    wholly in one partition), each partition emits its LOCAL
    count-of-counts histogram (lang, c, m), and those integer
    histograms ADD — so the only float work is the final fold over
    O(distinct counts) rows per lang, computed as
    log2(N) - sum(m*c*log2 c)/N with the sum taken in ascending-c
    order and 6-dp canonicalized (the repo's DuckDB round contract).
    The vocabulary never meets a global sort, and the multi-column
    groupby runs at O(langs x distinct counts) — the packed-key
    rule's safe case."""
    import zlib

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "text"]
    )

    def partial(t: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for lang, text in zip(t["lang"].to_pylist(), t["text"].to_pylist()):
            c.update((lang, w) for w in text.lower().split(" ") if w)
        langs = [k[0] for k in c]
        words = [k[1] for k in c]
        return pa.table(
            {
                "lang": pa.array(langs, pa.string()),
                "word": pa.array(words, pa.string()),
                "n": pa.array(list(c.values()), pa.int64()),
                "part": pa.array(
                    [zlib.crc32(w.encode("utf-8")) & 63 for w in words],
                    pa.int32(),
                ),
            }
        )

    def hist_partition(df) -> pa.Table:
        g = df.groupby(["lang", "word"], sort=False, as_index=False)[
            "n"
        ].sum()
        h = (
            g.groupby(["lang", "n"], sort=False)
            .size()
            .reset_index(name="m")
        )
        return pa.table(
            {
                "lang": pa.array(h["lang"], pa.string()),
                "c": pa.array(h["n"], pa.int64()),
                "m": pa.array(h["m"], pa.int64()),
            }
        )

    def entropy_final(df) -> pa.Table:
        import numpy as _np

        lang = df["lang"].iloc[0]
        c = df["c"].to_numpy()
        m = df["m"].to_numpy()
        order = _np.argsort(c, kind="stable")
        c, m = c[order], m[order]
        n_tokens = int((c * m).sum())
        s2 = float((m * c * _np.log2(c.astype(_np.float64))).sum())
        ent = _round6(_np.log2(_np.float64(n_tokens)) - s2 / n_tokens)
        return pa.table(
            {
                "lang": pa.array([lang], pa.string()),
                "n_tokens": pa.array([n_tokens], pa.int64()),
                "entropy": pa.array([ent], pa.float64()),
            }
        )

    return _with_schema(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(hist_partition, batch_format="pandas")
        .groupby(["lang", "c"])
        .aggregate(Sum("m", alias_name="m"))
        .groupby("lang")
        .map_groups(entropy_final, batch_format="pandas"),
        lang=pa.string(),
        n_tokens=pa.int64(),
        entropy=pa.float64(),
    )


SQL_LANG_ENTROPY = """
WITH w AS (
  SELECT lang, word, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT lang, unnest(string_split(lower(text), ' ')) AS word
        FROM documents)
  WHERE word <> ''
  GROUP BY lang, word),
h AS (
  SELECT lang, c, CAST(count(*) AS BIGINT) AS m
  FROM w GROUP BY lang, c),
s AS (
  SELECT lang, CAST(sum(c * m) AS BIGINT) AS n_tokens,
         sum(CAST(m AS DOUBLE) * c * log2(CAST(c AS DOUBLE))) AS s2
  FROM h GROUP BY lang)
SELECT lang, n_tokens,
       round(log2(CAST(n_tokens AS DOUBLE))
             - s2 / CAST(n_tokens AS DOUBLE), 6) AS entropy
FROM s
"""


def q_mode_source_per_lang(sf_dir: str):
    """Categorical mode per group: the most frequent source per
    language (ties → lexicographically smallest source). Per-batch
    value_counts over the joined (lang␟source) key folds map-side
    (Arrow kernel, zero Python row loops), the groupby runs at
    O(langs × sources) — never corpus cardinality — and the per-lang
    argmax is one tiny map_groups."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "source"]
    )

    def partial(t: pa.Table) -> pa.Table:
        joined = pc.binary_join_element_wise(
            t["lang"], t["source"], _US
        )
        vc = pc.value_counts(joined)
        pairs = [v.split(_US, 1) for v in vc.field("values").to_pylist()]
        return pa.table(
            {
                "lang": pa.array([p[0] for p in pairs], pa.string()),
                "source": pa.array([p[1] for p in pairs], pa.string()),
                "n": pa.array(
                    vc.field("counts").to_numpy().astype("int64"),
                    pa.int64(),
                ),
            }
        )

    def top1(df) -> pa.Table:
        df = df.sort_values(
            ["n", "source"], ascending=[False, True], kind="mergesort"
        ).head(1)
        return pa.table(
            {
                "lang": pa.array(df["lang"], pa.string()),
                "mode_source": pa.array(df["source"], pa.string()),
                "n": pa.array(df["n"], pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "source"])
        .aggregate(Sum("n", alias_name="n"))
        .groupby("lang")
        .map_groups(top1, batch_format="pandas")
    )


SQL_MODE_SOURCE_PER_LANG = """
SELECT lang, source AS mode_source, n FROM (
  SELECT lang, source, CAST(count(*) AS BIGINT) AS n,
         row_number() OVER (PARTITION BY lang
                            ORDER BY count(*) DESC, source) AS rn
  FROM documents GROUP BY lang, source)
WHERE rn = 1
"""


def q_orders_mom_delta(sf_dir: str):
    """LAG over an aggregated series: monthly order counts with the
    previous month's count and the month-over-month relative change.
    Months fold map-side per batch (np.unique — the groupby runs at
    O(months), never |orders|); the LAG itself is one vectorized pass
    over the tiny month series in a single group. prev_n is NULL on
    the first month and the change is the raw int/int IEEE division."""
    import numpy as np

    def partial(t: pa.Table) -> pa.Table:
        import numpy as _np

        month = (
            pc.cast(t["o_orderdate"], pa.int64())
            .to_numpy()
            .astype("datetime64[us]")
            .astype("datetime64[M]")
            .astype(_np.int64)
        )
        um, cnt = _np.unique(month, return_counts=True)
        return pa.table(
            {
                "month": pa.array(
                    _np.datetime_as_string(um.astype("datetime64[M]")),
                    pa.string(),
                ),
                "n": pa.array(cnt.astype(_np.int64), pa.int64()),
                "g": pa.array(_np.zeros(len(um), _np.int32), pa.int32()),
            }
        )

    def lag_fold(df) -> pa.Table:
        import numpy as _np

        agg = df.groupby("month", sort=True, as_index=False)["n"].sum()
        n = agg["n"].to_numpy().astype(_np.int64)
        prev = _np.roll(n, 1)
        has_prev = _np.arange(len(n)) > 0
        safe_prev = _np.where(has_prev, prev, 1)
        change = (n - safe_prev) / safe_prev
        return pa.table(
            {
                "month": pa.array(agg["month"], pa.string()),
                "n_orders": pa.array(n, pa.int64()),
                "prev_n": pa.array(prev, pa.int64(), mask=~has_prev),
                "mom_change": pa.array(
                    change, pa.float64(), mask=~has_prev
                ),
            }
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_orderdate"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("g")
        .map_groups(lag_fold, batch_format="pandas")
    )


SQL_ORDERS_MOM_DELTA = """
WITH m AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS month,
         CAST(count(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1)
SELECT month, n_orders,
       lag(n_orders) OVER (ORDER BY month) AS prev_n,
       (n_orders - lag(n_orders) OVER (ORDER BY month))
         / lag(n_orders) OVER (ORDER BY month) AS mom_change
FROM m
"""

_BULK_QTY_THRESHOLD = 100


def q_bulk_suppliers(sf_dir: str):
    """Nested semi-join against a grouped HAVING (the TPC-H Q20
    shape, restated): suppliers with at least one part whose total
    shipped quantity exceeds the threshold. Per-(part,supplier)
    quantity sums reduce map-side into packed int64 keys inside
    bounded key-hash partitions (|part×supp| rows, not |lineitem|);
    the surviving supplier-key set is a tiny distinct that broadcasts
    to filter the supplier DIMENSION map-side — lineitem never
    shuffles raw and no join materializes."""
    import numpy as np

    def qty_partial(t: pa.Table) -> pa.Table:
        import numpy as _np

        pk = t["l_partkey"].to_numpy()
        sk = t["l_suppkey"].to_numpy()
        qty = pc.cast(t["l_quantity"], pa.int64()).to_numpy()
        _guard_pack(pk, sk, _SUPP_BITS, "bulk_suppliers (part,supp)")
        key, inv = _np.unique(
            pk * (1 << _SUPP_BITS) + sk, return_inverse=True
        )
        sums = _np.zeros(len(key), dtype=_np.int64)
        _np.add.at(sums, inv, qty)
        return pa.table(
            {
                "key": pa.array(key, pa.int64()),
                "q": pa.array(sums, pa.int64()),
                "part": pa.array(
                    (key & (relational.NUM_EVENT_PARTITIONS - 1)).astype(
                        _np.int32
                    ),
                    pa.int32(),
                ),
            }
        )

    def survivors_partition(df) -> pa.Table:
        import numpy as _np

        key = df["key"].to_numpy()
        uk, inv = _np.unique(key, return_inverse=True)
        sums = _np.zeros(len(uk), dtype=_np.int64)
        _np.add.at(sums, inv, df["q"].to_numpy())
        supp = _np.unique(uk[sums > _BULK_QTY_THRESHOLD] & _SUPP_MASK)
        return pa.table({"s_suppkey": pa.array(supp, pa.int64())})

    survivors = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_suppkey", "l_quantity"],
        )
        .map_batches(qty_partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(survivors_partition, batch_format="pandas")
    )
    keys = np.unique(
        np.concatenate(
            [
                b["s_suppkey"].to_numpy()
                for b in ray.get(survivors.to_arrow_refs())
                if b.num_rows
            ]
            or [np.empty(0, np.int64)]
        )
    )
    keys_ref = ray.put(keys)

    def filter_dim(t: pa.Table) -> pa.Table:
        import numpy as _np

        from ..functions.broadcast import cached_get

        ks = cached_get(keys_ref)
        sk = t["s_suppkey"].to_numpy()
        if len(ks) == 0:
            keep = _np.zeros(len(sk), dtype=bool)
        else:
            pos = _np.minimum(_np.searchsorted(ks, sk), len(ks) - 1)
            keep = ks[pos] == sk
        return t.filter(pa.array(keep, pa.bool_()))

    return (
        ray.data.read_parquet(
            f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
        )
        .map_batches(filter_dim, batch_format="pyarrow")
    )


SQL_BULK_SUPPLIERS = f"""
WITH sp AS (
  SELECT l_suppkey, l_partkey,
         sum(CAST(l_quantity AS BIGINT)) AS q
  FROM lineitem GROUP BY l_suppkey, l_partkey)
SELECT s_suppkey, s_name FROM supplier
WHERE s_suppkey IN (SELECT l_suppkey FROM sp
                    WHERE q > {_BULK_QTY_THRESHOLD})
"""


def q_session_stats(sf_dir: str):
    """Aggregate over a windowed derivation: global session-count,
    events-per-session and duration statistics over the 30-min-gap
    sessions of relational.sessionize. Per-session rows fold per
    batch into ONE (k, Σevents, Σduration, max duration) partial —
    the final reduce is O(#batches); averages are raw int/int IEEE
    divisions. Empty-events semantics mirror SQL's ungrouped
    aggregate (one row, zero count, NULL stats)."""
    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )
    sessions = relational.sessionize(events)

    def partial(t: pa.Table) -> pa.Table:
        import numpy as _np

        ne = t["n_events"].to_numpy()
        dur = (
            pc.cast(t["end_ts"], pa.int64()).to_numpy()
            - pc.cast(t["start_ts"], pa.int64()).to_numpy()
        )
        return pa.table(
            {
                "g": pa.array([0], pa.int32()),
                "k": pa.array([len(ne)], pa.int64()),
                "se": pa.array([int(ne.sum())], pa.int64()),
                "sd": pa.array([int(dur.sum())], pa.int64()),
                "md": pa.array(
                    [int(dur.max()) if len(dur) else None], pa.int64()
                ),
            }
        )

    def finalize(df) -> pa.Table:
        k = int(df["k"].sum())
        se = int(df["se"].sum())
        sd = int(df["sd"].sum())
        md = df["md"].dropna()
        return pa.table(
            {
                "n_sessions": pa.array([k], pa.int64()),
                "avg_events": pa.array(
                    [se / k if k else None], pa.float64()
                ),
                "avg_duration_us": pa.array(
                    [sd / k if k else None], pa.float64()
                ),
                "max_duration_us": pa.array(
                    [int(md.max()) if len(md) else None], pa.int64()
                ),
            }
        )

    return (
        sessions.map_batches(partial, batch_format="pyarrow")
        .groupby("g")
        .map_groups(finalize, batch_format="pandas")
    )


SQL_SESSION_STATS = """
WITH x AS (
  SELECT user_id, event_id, ts,
    CASE WHEN lag(ts) OVER w IS NULL
           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
         THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), y AS (
  SELECT user_id, ts,
    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) - 1 AS session_id
  FROM x
), s AS (
  SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS ne,
         epoch_us(max(ts)) - epoch_us(min(ts)) AS dur
  FROM y GROUP BY user_id, session_id
)
SELECT CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(ne) AS BIGINT) / CAST(count(*) AS BIGINT) AS avg_events,
       CAST(sum(dur) AS BIGINT) / CAST(count(*) AS BIGINT)
         AS avg_duration_us,
       CAST(max(dur) AS BIGINT) AS max_duration_us
FROM s
"""


def q_daily_anomaly(sf_dir: str):
    """Anomaly gate over an aggregated series: days whose event count
    exceeds mean + 2σ (population) of the daily series. Day counts
    fold map-side (np.unique — O(days) rows ever shuffle); the
    mean/σ are exact integer moments (k, Σn, Σn²) folded in one tiny
    aggregate, and the threshold float expression is written
    identically on both sides (IEEE sqrt is correctly rounded, so the
    comparison is bit-stable; variance clamps at 0 on both sides)."""
    import numpy as np

    def partial(t: pa.Table) -> pa.Table:
        import numpy as _np

        day = _np.floor_divide(
            pc.cast(t["ts"], pa.int64()).to_numpy(), _DAY_US
        )
        ud, cnt = _np.unique(day, return_counts=True)
        return pa.table(
            {
                "day": pa.array(ud, pa.int64()),
                "n": pa.array(cnt.astype(_np.int64), pa.int64()),
            }
        )

    daily = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("n", alias_name="n"))
        .materialize()
    )
    stats = daily.map_batches(
        lambda t: pa.table(
            {
                "k": pa.array([t.num_rows], pa.int64()),
                "s1": pa.array(
                    [int(t["n"].to_numpy().sum())], pa.int64()
                ),
                "s2": pa.array(
                    [int((t["n"].to_numpy() ** 2).sum())], pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    ).aggregate(
        Sum("k", alias_name="k"),
        Sum("s1", alias_name="s1"),
        Sum("s2", alias_name="s2"),
    )
    k = stats["k"] or 0
    if not k:
        return daily  # empty day series: no anomalies, schema (day, n)
    s1, s2 = stats["s1"], stats["s2"]
    mean = float(s1) / float(k)
    var = max(
        0.0, (float(s2) - float(s1) * float(s1) / float(k)) / float(k)
    )
    import math

    thresh = mean + 2.0 * math.sqrt(var)

    def gate(t: pa.Table) -> pa.Table:
        import numpy as _np

        keep = t["n"].to_numpy().astype(_np.float64) > thresh
        return t.filter(pa.array(keep, pa.bool_()))

    return daily.map_batches(gate, batch_format="pyarrow")


SQL_DAILY_ANOMALY = """
WITH d AS (
  SELECT epoch_us(ts) // 86400000000 AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS k,
         CAST(sum(n) AS BIGINT) AS s1,
         CAST(sum(n * n) AS BIGINT) AS s2
  FROM d)
SELECT CAST(day AS BIGINT) AS day, n
FROM d, s
WHERE CAST(n AS DOUBLE) >
      CAST(s1 AS DOUBLE) / CAST(k AS DOUBLE)
      + 2.0 * sqrt(greatest(0.0,
          (CAST(s2 AS DOUBLE)
           - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(k AS DOUBLE))
          / CAST(k AS DOUBLE)))
"""

# half-year ship window covering both the sf testdata (1995–2001) and
# the fuzz warehouse (1997–1999) so the result is non-degenerate on both
_TOP_SUPP_WINDOW_US = (852_076_800_000_000, 867_715_200_000_000)


def q_top_revenue_supplier(sf_dir: str):
    """Max-of-aggregate with ties (the TPC-H Q15 shape): the
    supplier(s) with the highest discounted revenue inside a fixed
    ship-date window. Per-supplier cents reduce map-side into bounded
    supplier-hash partitions (|suppliers| rows, never |lineitem|);
    the global max folds with ONE distributed Max aggregate (a
    scalar — the supplier table never reaches the driver), the
    tie-preserving filter is map-side equality, and names join via
    the broadcast dimension."""
    import numpy as np

    lo, hi = _TOP_SUPP_WINDOW_US

    def cents_partial(t: pa.Table) -> pa.Table:
        import numpy as _np

        ship = pc.cast(t["l_shipdate"], pa.int64()).to_numpy()
        m = (ship >= lo) & (ship < hi)
        sk = t["l_suppkey"].to_numpy()[m]
        ep = t["l_extendedprice"].to_numpy()[m]
        disc = t["l_discount"].to_numpy()[m]
        cents = _np.floor(ep * (1.0 - disc) * 100.0 + 0.5).astype(
            _np.int64
        )
        keys, inv = _np.unique(sk, return_inverse=True)
        sums = _np.zeros(len(keys), dtype=_np.int64)
        _np.add.at(sums, inv, cents)
        return pa.table(
            {
                "s_suppkey": pa.array(keys, pa.int64()),
                "c": pa.array(sums, pa.int64()),
                "part": pa.array(
                    (keys & (relational.NUM_EVENT_PARTITIONS - 1)).astype(
                        _np.int32
                    ),
                    pa.int32(),
                ),
            }
        )

    def merge_partition(df) -> pa.Table:
        import numpy as _np

        keys, inv = _np.unique(df["s_suppkey"].to_numpy(), return_inverse=True)
        sums = _np.zeros(len(keys), dtype=_np.int64)
        _np.add.at(sums, inv, df["c"].to_numpy())
        return pa.table(
            {
                "s_suppkey": pa.array(keys, pa.int64()),
                "total_cents": pa.array(sums, pa.int64()),
            }
        )

    totals = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=[
                "l_suppkey",
                "l_shipdate",
                "l_extendedprice",
                "l_discount",
            ],
        )
        .map_batches(cents_partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(merge_partition, batch_format="pandas")
        .materialize()
    )
    agg = totals.aggregate(Max("total_cents", alias_name="m"))
    best = agg["m"] if agg else None
    supp = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    )
    name_ref = ray.put(
        dict(
            zip(supp["s_suppkey"].to_pylist(), supp["s_name"].to_pylist())
        )
    )

    def winners(t: pa.Table) -> pa.Table:
        from ..functions.broadcast import cached_get

        if best is None:
            return pa.table(
                {
                    "s_suppkey": pa.array([], pa.int64()),
                    "s_name": pa.array([], pa.string()),
                    "total_cents": pa.array([], pa.int64()),
                }
            )
        sub = t.filter(pc.equal(t["total_cents"], pa.scalar(best)))
        names = cached_get(name_ref)
        return pa.table(
            {
                "s_suppkey": sub["s_suppkey"],
                "s_name": pa.array(
                    [names.get(k) for k in sub["s_suppkey"].to_pylist()],
                    pa.string(),
                ),
                "total_cents": sub["total_cents"],
            }
        )

    return totals.map_batches(winners, batch_format="pyarrow")


SQL_TOP_REVENUE_SUPPLIER = """
WITH r AS (
  SELECT l_suppkey,
         CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                       AS BIGINT)) AS BIGINT) AS total_cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1997-07-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_cents
FROM supplier JOIN r ON s_suppkey = l_suppkey
WHERE total_cents = (SELECT max(total_cents) FROM r)
"""


def q_grouping_sets_counts(sf_dir: str):
    """GROUP BY GROUPING SETS ((lang), (source)): two independent
    marginal count vectors from ONE map pass — each batch emits both
    (dim, key, n) partials via np.unique, the groupby runs at
    O(langs + sources), and the NULL filler column materializes only
    in the final tiny projection (SQL grouping-sets layout)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "source"]
    )

    def partial(t: pa.Table) -> pa.Table:
        import numpy as _np

        out_dim, out_key, out_n = [], [], []
        for dim, col in ((0, "lang"), (1, "source")):
            vals = _np.asarray(t[col].to_pylist(), dtype=object)
            uk, cnt = _np.unique(vals, return_counts=True)
            out_dim.extend([dim] * len(uk))
            out_key.extend(list(uk))
            out_n.extend(cnt.astype(_np.int64).tolist())
        return pa.table(
            {
                "dim": pa.array(out_dim, pa.int32()),
                "key": pa.array(out_key, pa.string()),
                "n": pa.array(out_n, pa.int64()),
            }
        )

    def project(t: pa.Table) -> pa.Table:
        import numpy as _np

        dim = t["dim"].to_numpy()
        key = t["key"].to_pylist()
        return pa.table(
            {
                "lang": pa.array(
                    [k if d == 0 else None for d, k in zip(dim, key)],
                    pa.string(),
                ),
                "source": pa.array(
                    [k if d == 1 else None for d, k in zip(dim, key)],
                    pa.string(),
                ),
                "n": t["n"],
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["dim", "key"])
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(project, batch_format="pyarrow")
        .select_columns(["lang", "source", "n"])
    )


SQL_GROUPING_SETS_COUNTS = """
SELECT lang, source, CAST(count(*) AS BIGINT) AS n
FROM documents GROUP BY GROUPING SETS ((lang), (source))
"""


# ------------------------------------------------- fact-fact orderkey joins
#
# Q8/Q9/Q10 all join lineitem to orders — BOTH fact tables, so neither
# side may broadcast at 100 TB. The shared shape: each side reduces
# map-side to skinny int partials tagged with part = orderkey &
# (NUM_EVENT_PARTITIONS - 1), the two Datasets union, and the join runs
# inside bounded order-hash partitions (one order's rows co-locate by
# construction; partition population is |orders|/64, not |lineitem|).
# Dimension sides (customer/supplier/nation/region/part) broadcast once
# via ray.put + per-worker LRU, exactly like promo_revenue.

_ORD_PART_MASK = relational.NUM_EVENT_PARTITIONS - 1


def _year_from_us(ts_int64_us):
    """Exact o_orderdate year: int64 epoch-us -> calendar year, matching
    DuckDB year() (BIGINT) without float round-trips."""
    import numpy as _np

    return (
        ts_int64_us.astype("datetime64[us]")
        .astype("datetime64[Y]")
        .astype(_np.int64)
        + 1970
    )


def q_market_share(sf_dir: str):
    """National market share per order-year (the TPC-H Q8 shape):
    among lineitems belonging to orders placed by ASIA customers, the
    revenue fraction supplied by the lexicographically-first nation's
    suppliers. customer/nation/
    region fold into ONE sorted in-region custkey array and supplier/
    nation into a suppkey->is_target vector (dimensions — broadcast
    once, ray.put + LRU). Orders emit skinny (orderkey, year) rows for
    in-region customers; lineitem folds per-orderkey (total, target)
    cent partials map-side; the only exchange is the bounded
    order-hash partition join, whose population is order-cardinality.
    The share is the raw BIGINT/BIGINT IEEE division (bit-identical to
    DuckDB)."""
    import numpy as np

    region_t = pq.read_table(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    )
    rkeys = {
        n: k
        for k, n in zip(
            region_t["r_regionkey"].to_pylist(), region_t["r_name"].to_pylist()
        )
    }
    target_rk = rkeys.get("ASIA", -1)
    nation_t = pq.read_table(
        f"{sf_dir}/nation.parquet",
        columns=["n_nationkey", "n_name", "n_regionkey"],
    )
    nat_region = dict(
        zip(
            nation_t["n_nationkey"].to_pylist(),
            nation_t["n_regionkey"].to_pylist(),
        )
    )
    # target nation = lexicographic min of n_name: a deterministic,
    # data-derived constant that is non-vacuous on ANY warehouse (the
    # differential-fuzz names differ from the sf testdata's)
    all_names = nation_t["n_name"].to_pylist()
    target_nation = min(all_names) if all_names else ""
    target_nations = {
        k
        for k, n in zip(nation_t["n_nationkey"].to_pylist(), all_names)
        if n == target_nation
    }
    cust_t = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    ck = np.asarray(cust_t["c_custkey"].to_pylist(), dtype=np.int64)
    c_in = np.asarray(
        [nat_region.get(nk, -1) == target_rk
         for nk in cust_t["c_nationkey"].to_pylist()],
        dtype=bool,
    )
    in_region_ck = np.sort(ck[c_in])
    supp_t = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    sk = np.asarray(supp_t["s_suppkey"].to_pylist(), dtype=np.int64)
    s_is = np.asarray(
        [nk in target_nations for nk in supp_t["s_nationkey"].to_pylist()],
        dtype=np.int64,
    )
    s_order = np.argsort(sk, kind="stable")
    lookup_ref = ray.put((in_region_ck, sk[s_order], s_is[s_order]))

    def orders_side(t: pa.Table) -> pa.Table:
        import numpy as _np

        from ..functions.broadcast import cached_get

        ck_s, _, _ = cached_get(lookup_ref)
        ok = t["o_orderkey"].to_numpy()
        cust = t["o_custkey"].to_numpy()
        pos = _np.searchsorted(ck_s, cust)
        pos = _np.minimum(pos, max(len(ck_s) - 1, 0))
        keep = (
            (ck_s[pos] == cust) if len(ck_s) else _np.zeros(len(cust), bool)
        )
        year = _year_from_us(pc.cast(t["o_orderdate"], pa.int64()).to_numpy())
        ok, year = ok[keep], year[keep]
        return pa.table(
            {
                "part": pa.array(
                    (ok & _ORD_PART_MASK).astype(_np.int32), pa.int32()
                ),
                "okey": pa.array(ok, pa.int64()),
                "o_year": pa.array(year, pa.int64()),
                "tot": pa.array(_np.zeros(len(ok), _np.int64), pa.int64()),
                "nat": pa.array(_np.zeros(len(ok), _np.int64), pa.int64()),
            }
        )

    def line_side(t: pa.Table) -> pa.Table:
        import numpy as _np

        from ..functions.broadcast import cached_get

        _, sk_s, s_is_s = cached_get(lookup_ref)
        ok = t["l_orderkey"].to_numpy()
        supp = t["l_suppkey"].to_numpy()
        ep = t["l_extendedprice"].to_numpy()
        disc = t["l_discount"].to_numpy()
        cents = _np.floor(ep * (1.0 - disc) * 100.0 + 0.5).astype(_np.int64)
        if len(sk_s):
            pos = _np.minimum(_np.searchsorted(sk_s, supp), len(sk_s) - 1)
            is_t = _np.where(sk_s[pos] == supp, s_is_s[pos], 0)
        else:
            is_t = _np.zeros(len(supp), _np.int64)
        uo, inv = _np.unique(ok, return_inverse=True)
        tot = _np.zeros(len(uo), _np.int64)
        nat = _np.zeros(len(uo), _np.int64)
        _np.add.at(tot, inv, cents)
        _np.add.at(nat, inv, cents * is_t)
        return pa.table(
            {
                "part": pa.array(
                    (uo & _ORD_PART_MASK).astype(_np.int32), pa.int32()
                ),
                "okey": pa.array(uo, pa.int64()),
                "o_year": pa.array(
                    _np.full(len(uo), -1, _np.int64), pa.int64()
                ),
                "tot": pa.array(tot, pa.int64()),
                "nat": pa.array(nat, pa.int64()),
            }
        )

    def join_partition(df) -> pa.Table:
        import numpy as _np

        okey = df["okey"].to_numpy()
        year = df["o_year"].to_numpy()
        is_ord = year >= 0
        o_keys = okey[is_ord]
        o_years = year[is_ord]
        o_sorted = _np.argsort(o_keys, kind="stable")
        o_keys, o_years = o_keys[o_sorted], o_years[o_sorted]
        l_keys = okey[~is_ord]
        tot = df["tot"].to_numpy()[~is_ord]
        nat = df["nat"].to_numpy()[~is_ord]
        if len(o_keys) == 0 or len(l_keys) == 0:
            return pa.table(
                {
                    "o_year": pa.array([], pa.int64()),
                    "nation_cents": pa.array([], pa.int64()),
                    "total_cents": pa.array([], pa.int64()),
                }
            )
        pos = _np.minimum(_np.searchsorted(o_keys, l_keys), len(o_keys) - 1)
        found = o_keys[pos] == l_keys
        yr = o_years[pos[found]]
        uy, inv = _np.unique(yr, return_inverse=True)
        tc = _np.zeros(len(uy), _np.int64)
        nc = _np.zeros(len(uy), _np.int64)
        _np.add.at(tc, inv, tot[found])
        _np.add.at(nc, inv, nat[found])
        return pa.table(
            {
                "o_year": pa.array(uy, pa.int64()),
                "nation_cents": pa.array(nc, pa.int64()),
                "total_cents": pa.array(tc, pa.int64()),
            }
        )

    def add_share(t: pa.Table) -> pa.Table:
        import numpy as _np

        n = t["nation_cents"].to_numpy()
        tot = t["total_cents"].to_numpy()
        safe = _np.where(tot == 0, 1, tot)
        return t.append_column(
            "mkt_share", pa.array(n / safe, pa.float64(), mask=(tot == 0))
        )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(orders_side, batch_format="pyarrow")
    lines = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(line_side, batch_format="pyarrow")
    return _with_schema(
        orders.union(lines)
        .groupby("part")
        .map_groups(join_partition, batch_format="pandas")
        .groupby("o_year")
        .aggregate(
            Sum("nation_cents", alias_name="nation_cents"),
            Sum("total_cents", alias_name="total_cents"),
        )
        .map_batches(add_share, batch_format="pyarrow"),
        o_year=pa.int64(),
        nation_cents=pa.int64(),
        total_cents=pa.int64(),
        mkt_share=pa.float64(),
    )


SQL_MARKET_SHARE = """
WITH rc AS (
  SELECT c_custkey FROM customer
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'),
o AS (
  SELECT o_orderkey, CAST(year(o_orderdate) AS BIGINT) AS o_year
  FROM orders JOIN rc ON o_custkey = c_custkey),
l AS (
  SELECT l_orderkey,
         CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
              AS BIGINT) AS cents,
         CASE WHEN n_name = (SELECT min(n_name) FROM nation)
              THEN 1 ELSE 0 END AS is_nat
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey)
SELECT o_year,
       CAST(sum(cents * is_nat) AS BIGINT) AS nation_cents,
       CAST(sum(cents) AS BIGINT) AS total_cents,
       CAST(sum(cents * is_nat) AS BIGINT)
         / CAST(sum(cents) AS BIGINT) AS mkt_share
FROM l JOIN o ON l_orderkey = o_orderkey
GROUP BY o_year
"""


_NAT_BITS = 6  # nationkey < 64 packs into the low bits of (orderkey, nation)


def q_nation_profit(sf_dir: str):
    """Profit by supplier nation x order year over the '%widget%'
    part-name subset (the TPC-H Q9 shape, minus partsupp which this
    schema lacks).
    part filters to a sorted partkey membership array and supplier to
    a suppkey->nationkey vector (broadcast dimensions); lineitem folds
    per (orderkey, nationkey) packed-int64 cents partials map-side
    (guarded pack, nationkey < 64); orders contribute skinny
    (orderkey, year) rows; the bounded order-hash partition join
    attaches years and folds straight to (nation, year) — so the final
    groupby runs at |nations x years|, never fact cardinality."""
    import numpy as np

    part_t = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"]
    )
    pk = np.asarray(part_t["p_partkey"].to_pylist(), dtype=np.int64)
    hit = np.asarray(
        ["widget" in n for n in part_t["p_name"].to_pylist()], dtype=bool
    )
    red_parts = np.sort(pk[hit])
    supp_t = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    sk = np.asarray(supp_t["s_suppkey"].to_pylist(), dtype=np.int64)
    snat = np.asarray(supp_t["s_nationkey"].to_pylist(), dtype=np.int64)
    s_order = np.argsort(sk, kind="stable")
    nation_t = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    nat_names = dict(
        zip(
            nation_t["n_nationkey"].to_pylist(),
            nation_t["n_name"].to_pylist(),
        )
    )
    lookup_ref = ray.put((red_parts, sk[s_order], snat[s_order]))
    names_ref = ray.put(nat_names)

    def orders_side(t: pa.Table) -> pa.Table:
        import numpy as _np

        ok = t["o_orderkey"].to_numpy()
        year = _year_from_us(pc.cast(t["o_orderdate"], pa.int64()).to_numpy())
        return pa.table(
            {
                "part": pa.array(
                    (ok & _ORD_PART_MASK).astype(_np.int32), pa.int32()
                ),
                "okey": pa.array(ok, pa.int64()),
                "nat": pa.array(_np.full(len(ok), -1, _np.int64), pa.int64()),
                "cents": pa.array(_np.zeros(len(ok), _np.int64), pa.int64()),
                "o_year": pa.array(year, pa.int64()),
            }
        )

    def line_side(t: pa.Table) -> pa.Table:
        import numpy as _np

        from ..functions.broadcast import cached_get

        red_s, sk_s, snat_s = cached_get(lookup_ref)
        lp = t["l_partkey"].to_numpy()
        if len(red_s):
            pos = _np.minimum(_np.searchsorted(red_s, lp), len(red_s) - 1)
            keep = red_s[pos] == lp
        else:
            keep = _np.zeros(len(lp), bool)
        ok = t["l_orderkey"].to_numpy()[keep]
        supp = t["l_suppkey"].to_numpy()[keep]
        ep = t["l_extendedprice"].to_numpy()[keep]
        disc = t["l_discount"].to_numpy()[keep]
        cents = _np.floor(ep * (1.0 - disc) * 100.0 + 0.5).astype(_np.int64)
        if len(sk_s):
            spos = _np.minimum(_np.searchsorted(sk_s, supp), len(sk_s) - 1)
            nat = _np.where(sk_s[spos] == supp, snat_s[spos], 0).astype(
                _np.int64
            )
        else:
            nat = _np.zeros(len(supp), _np.int64)
        _guard_pack(ok, nat, _NAT_BITS, "nation_profit (order,nation)")
        key, inv = _np.unique(ok * (1 << _NAT_BITS) + nat, return_inverse=True)
        c = _np.zeros(len(key), _np.int64)
        _np.add.at(c, inv, cents)
        uo = key >> _NAT_BITS
        return pa.table(
            {
                "part": pa.array(
                    (uo & _ORD_PART_MASK).astype(_np.int32), pa.int32()
                ),
                "okey": pa.array(uo, pa.int64()),
                "nat": pa.array(key & ((1 << _NAT_BITS) - 1), pa.int64()),
                "cents": pa.array(c, pa.int64()),
                "o_year": pa.array(
                    _np.full(len(key), -1, _np.int64), pa.int64()
                ),
            }
        )

    def join_partition(df) -> pa.Table:
        import numpy as _np

        okey = df["okey"].to_numpy()
        year = df["o_year"].to_numpy()
        is_ord = year >= 0
        o_keys = okey[is_ord]
        o_years = year[is_ord]
        srt = _np.argsort(o_keys, kind="stable")
        o_keys, o_years = o_keys[srt], o_years[srt]
        l_keys = okey[~is_ord]
        nat = df["nat"].to_numpy()[~is_ord]
        cents = df["cents"].to_numpy()[~is_ord]
        if len(o_keys) == 0 or len(l_keys) == 0:
            return pa.table(
                {
                    "nat": pa.array([], pa.int64()),
                    "o_year": pa.array([], pa.int64()),
                    "profit_cents": pa.array([], pa.int64()),
                }
            )
        pos = _np.minimum(_np.searchsorted(o_keys, l_keys), len(o_keys) - 1)
        found = o_keys[pos] == l_keys
        yr = o_years[pos[found]]
        natf = nat[found]
        key, inv = _np.unique(
            natf * 8192 + (yr - 1970), return_inverse=True
        )
        c = _np.zeros(len(key), _np.int64)
        _np.add.at(c, inv, cents[found])
        return pa.table(
            {
                "nat": pa.array(key // 8192, pa.int64()),
                "o_year": pa.array(key % 8192 + 1970, pa.int64()),
                "profit_cents": pa.array(c, pa.int64()),
            }
        )

    def add_name(t: pa.Table) -> pa.Table:
        from ..functions.broadcast import cached_get

        names = cached_get(names_ref)
        return pa.table(
            {
                "nation": pa.array(
                    [names.get(k, "") for k in t["nat"].to_pylist()],
                    pa.string(),
                ),
                "o_year": t["o_year"],
                "profit_cents": t["profit_cents"],
            }
        )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    ).map_batches(orders_side, batch_format="pyarrow")
    lines = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_orderkey",
            "l_partkey",
            "l_suppkey",
            "l_extendedprice",
            "l_discount",
        ],
    ).map_batches(line_side, batch_format="pyarrow")
    return _with_schema(
        orders.union(lines)
        .groupby("part")
        .map_groups(join_partition, batch_format="pandas")
        .groupby(["nat", "o_year"])
        .aggregate(Sum("profit_cents", alias_name="profit_cents"))
        .map_batches(add_name, batch_format="pyarrow"),
        nation=pa.string(),
        o_year=pa.int64(),
        profit_cents=pa.int64(),
    )


SQL_NATION_PROFIT = """
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                     AS BIGINT)) AS BIGINT) AS profit_cents
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, year(o_orderdate)
"""


def q_returned_revenue(sf_dir: str):
    """Top-20 customers by returned-merchandise revenue in a one-
    quarter order window (the TPC-H Q10 shape). Orders emit skinny
    (orderkey, custkey) rows for the window; lineitem folds per-
    orderkey cents of R-flagged lines map-side; the bounded order-hash
    partition join re-keys cents to custkey and pre-folds per
    partition, so the custkey groupby carries customer-cardinality
    skinny rows. The top-20 is a per-block partial merged in ONE final
    fold (no global sort); ties break custkey-ascending on both
    sides. Names attach from broadcast dimension dicts at the end."""
    import numpy as np

    _WIN_LO = np.datetime64("1997-02-01").astype("datetime64[us]").astype(
        np.int64
    )
    _WIN_HI = np.datetime64("1997-05-01").astype("datetime64[us]").astype(
        np.int64
    )

    cust_t = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name", "c_nationkey"]
    )
    nation_t = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    nat_names = dict(
        zip(
            nation_t["n_nationkey"].to_pylist(),
            nation_t["n_name"].to_pylist(),
        )
    )
    cust_info = {
        k: (nm, nat_names.get(nk, ""))
        for k, nm, nk in zip(
            cust_t["c_custkey"].to_pylist(),
            cust_t["c_name"].to_pylist(),
            cust_t["c_nationkey"].to_pylist(),
        )
    }
    info_ref = ray.put(cust_info)

    def orders_side(t: pa.Table) -> pa.Table:
        import numpy as _np

        ts = pc.cast(t["o_orderdate"], pa.int64()).to_numpy()
        keep = (ts >= _WIN_LO) & (ts < _WIN_HI)
        ok = t["o_orderkey"].to_numpy()[keep]
        cust = t["o_custkey"].to_numpy()[keep]
        return pa.table(
            {
                "part": pa.array(
                    (ok & _ORD_PART_MASK).astype(_np.int32), pa.int32()
                ),
                "okey": pa.array(ok, pa.int64()),
                "cust": pa.array(cust, pa.int64()),
                "cents": pa.array(_np.zeros(len(ok), _np.int64), pa.int64()),
            }
        )

    def line_side(t: pa.Table) -> pa.Table:
        import numpy as _np

        keep = pc.equal(t["l_returnflag"], "R").to_numpy(zero_copy_only=False)
        ok = t["l_orderkey"].to_numpy()[keep]
        ep = t["l_extendedprice"].to_numpy()[keep]
        disc = t["l_discount"].to_numpy()[keep]
        cents = _np.floor(ep * (1.0 - disc) * 100.0 + 0.5).astype(_np.int64)
        uo, inv = _np.unique(ok, return_inverse=True)
        c = _np.zeros(len(uo), _np.int64)
        _np.add.at(c, inv, cents)
        return pa.table(
            {
                "part": pa.array(
                    (uo & _ORD_PART_MASK).astype(_np.int32), pa.int32()
                ),
                "okey": pa.array(uo, pa.int64()),
                "cust": pa.array(_np.full(len(uo), -1, _np.int64), pa.int64()),
                "cents": pa.array(c, pa.int64()),
            }
        )

    def join_partition(df) -> pa.Table:
        import numpy as _np

        okey = df["okey"].to_numpy()
        cust = df["cust"].to_numpy()
        cents = df["cents"].to_numpy()
        is_ord = cust >= 0
        o_keys, o_cust = okey[is_ord], cust[is_ord]
        srt = _np.argsort(o_keys, kind="stable")
        o_keys, o_cust = o_keys[srt], o_cust[srt]
        l_keys, l_cents = okey[~is_ord], cents[~is_ord]
        if len(o_keys) == 0 or len(l_keys) == 0:
            return pa.table(
                {
                    "c_custkey": pa.array([], pa.int64()),
                    "revenue_cents": pa.array([], pa.int64()),
                }
            )
        pos = _np.minimum(_np.searchsorted(o_keys, l_keys), len(o_keys) - 1)
        found = o_keys[pos] == l_keys
        cks = o_cust[pos[found]]
        uc, inv = _np.unique(cks, return_inverse=True)
        c = _np.zeros(len(uc), _np.int64)
        _np.add.at(c, inv, l_cents[found])
        return pa.table(
            {
                "c_custkey": pa.array(uc, pa.int64()),
                "revenue_cents": pa.array(c, pa.int64()),
            }
        )

    def topk_partial(t: pa.Table) -> pa.Table:
        import numpy as _np

        ck = t["c_custkey"].to_numpy()
        rv = t["revenue_cents"].to_numpy()
        idx = _np.lexsort((ck, -rv))[:20]
        return pa.table(
            {
                "g": pa.array(_np.zeros(len(idx), _np.int32), pa.int32()),
                "c_custkey": pa.array(ck[idx], pa.int64()),
                "revenue_cents": pa.array(rv[idx], pa.int64()),
            }
        )

    def topk_final(df) -> pa.Table:
        import numpy as _np

        from ..functions.broadcast import cached_get

        info = cached_get(info_ref)
        ck = df["c_custkey"].to_numpy()
        rv = df["revenue_cents"].to_numpy()
        idx = _np.lexsort((ck, -rv))[:20]
        ck, rv = ck[idx], rv[idx]
        names = [info.get(int(k), ("", ""))[0] for k in ck]
        nats = [info.get(int(k), ("", ""))[1] for k in ck]
        return pa.table(
            {
                "c_custkey": pa.array(ck, pa.int64()),
                "c_name": pa.array(names, pa.string()),
                "nation": pa.array(nats, pa.string()),
                "revenue_cents": pa.array(rv, pa.int64()),
            }
        )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(orders_side, batch_format="pyarrow")
    lines = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_orderkey",
            "l_returnflag",
            "l_extendedprice",
            "l_discount",
        ],
    ).map_batches(line_side, batch_format="pyarrow")
    return _with_schema(
        orders.union(lines)
        .groupby("part")
        .map_groups(join_partition, batch_format="pandas")
        .groupby("c_custkey")
        .aggregate(Sum("revenue_cents", alias_name="revenue_cents"))
        .map_batches(topk_partial, batch_format="pyarrow")
        .groupby("g")
        .map_groups(topk_final, batch_format="pandas"),
        c_custkey=pa.int64(),
        c_name=pa.string(),
        nation=pa.string(),
        revenue_cents=pa.int64(),
    )


SQL_RETURNED_REVENUE = """
WITH o AS (
  SELECT o_orderkey, o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '1997-02-01'
    AND o_orderdate < TIMESTAMP '1997-05-01'),
l AS (
  SELECT l_orderkey,
         CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
              AS BIGINT) AS cents
  FROM lineitem WHERE l_returnflag = 'R')
SELECT c_custkey, c_name, n_name AS nation,
       CAST(sum(cents) AS BIGINT) AS revenue_cents
FROM l
JOIN o ON l.l_orderkey = o.o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue_cents DESC, c_custkey ASC
LIMIT 20
"""


def q_cust_order_dist(sf_dir: str):
    """Customer order-count distribution (the TPC-H Q13 shape: LEFT
    JOIN with an ON-clause filter, then count-of-counts — customers
    with only urgent orders land in the 0 bucket). Orders fold to
    per-custkey counts map-side (membership-checked against the
    broadcast customer key array, preserving the left join's
    customer-side domain), merge inside bounded custkey-hash
    partitions, and each partition emits its LOCAL count histogram —
    so the final groupby carries O(distinct counts) rows. The zero
    bucket is total customers (parquet metadata, a dimension) minus
    the represented custkeys, folded in the single-histogram-row
    finalize."""
    import numpy as np

    cust_meta = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    )
    ck_all = np.sort(
        np.asarray(cust_meta["c_custkey"].to_pylist(), dtype=np.int64)
    )
    n_customers = len(ck_all)
    ck_ref = ray.put(ck_all)

    def count_partial(t: pa.Table) -> pa.Table:
        import numpy as _np

        from ..functions.broadcast import cached_get

        ck_s = cached_get(ck_ref)
        pri = t["o_orderpriority"].to_numpy(zero_copy_only=False)
        cust = t["o_custkey"].to_numpy()
        keep = pri != "1-URGENT"
        cust = cust[keep]
        if len(ck_s):
            pos = _np.minimum(_np.searchsorted(ck_s, cust), len(ck_s) - 1)
            cust = cust[ck_s[pos] == cust]
        else:
            cust = cust[:0]
        uc, cnt = _np.unique(cust, return_counts=True)
        return pa.table(
            {
                "part": pa.array(
                    (uc & _ORD_PART_MASK).astype(_np.int32), pa.int32()
                ),
                "cust": pa.array(uc, pa.int64()),
                "n": pa.array(cnt.astype(_np.int64), pa.int64()),
            }
        )

    def hist_partition(df) -> pa.Table:
        import numpy as _np

        cust = df["cust"].to_numpy()
        n = df["n"].to_numpy()
        uc, inv = _np.unique(cust, return_inverse=True)
        tot = _np.zeros(len(uc), _np.int64)
        _np.add.at(tot, inv, n)
        counts, freq = _np.unique(tot, return_counts=True)
        return pa.table(
            {
                "g": pa.array(_np.zeros(len(counts), _np.int32), pa.int32()),
                "c_count": pa.array(counts, pa.int64()),
                "custdist": pa.array(freq.astype(_np.int64), pa.int64()),
                "n_cust": pa.array(
                    _np.full(len(counts), len(uc), _np.int64), pa.int64()
                ),
            }
        )

    def finalize(df) -> pa.Table:
        import numpy as _np

        cc = df["c_count"].to_numpy()
        cd = df["custdist"].to_numpy()
        # n_cust repeats per partition's rows; sum of one value per
        # distinct (partition) requires dedup — instead recount: the
        # represented-customer total is the sum of custdist itself.
        represented = int(cd.sum())
        zero = n_customers - represented
        key, inv = _np.unique(cc, return_inverse=True)
        tot = _np.zeros(len(key), _np.int64)
        _np.add.at(tot, inv, cd)
        if zero > 0:
            if 0 in key:
                tot[_np.searchsorted(key, 0)] += zero
            else:
                key = _np.r_[0, key]
                tot = _np.r_[zero, tot]
        return pa.table(
            {
                "c_count": pa.array(key, pa.int64()),
                "custdist": pa.array(tot, pa.int64()),
            }
        )

    return _with_schema(
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_custkey", "o_orderpriority"],
        )
        .map_batches(count_partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(hist_partition, batch_format="pandas")
        .groupby("g")
        .map_groups(finalize, batch_format="pandas")
        .select_columns(["c_count", "custdist"]),
        c_count=pa.int64(),
        custdist=pa.int64(),
    )


SQL_CUST_ORDER_DIST = """
WITH co AS (
  SELECT c_custkey, count(o_custkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey)
SELECT CAST(c_count AS BIGINT) AS c_count,
       CAST(count(*) AS BIGINT) AS custdist
FROM co GROUP BY c_count
"""


_QTY_BITS = 6  # l_quantity is integral 1..50; guarded below


def q_small_qty_revenue(sf_dir: str):
    """Correlated per-part average threshold (the TPC-H Q17 shape):
    yearly-averaged revenue of brand lineitems whose quantity is under
    0.2x that part's mean quantity. Because l_quantity is integral,
    per-(partkey, quantity) packed partials carry the ENTIRE
    distribution losslessly (sum/count per qty level), so one pass
    over lineitem + a bounded partkey-hash partition reduce computes
    both the per-part mean and the under-threshold revenue with no
    join-back second pass. The threshold compare reproduces DuckDB's
    float semantics exactly: integral sums are exact in float64, so
    0.2 * (sum/count) is bit-identical on both sides."""
    import numpy as np

    part_t = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
    )
    pk = np.asarray(part_t["p_partkey"].to_pylist(), dtype=np.int64)
    hit = np.asarray(
        [b == "Brand#1" for b in part_t["p_brand"].to_pylist()], dtype=bool
    )
    brand_parts = np.sort(pk[hit])
    parts_ref = ray.put(brand_parts)

    def qty_partial(t: pa.Table) -> pa.Table:
        import numpy as _np

        from ..functions.broadcast import cached_get

        bp = cached_get(parts_ref)
        lp = t["l_partkey"].to_numpy()
        if len(bp):
            pos = _np.minimum(_np.searchsorted(bp, lp), len(bp) - 1)
            keep = bp[pos] == lp
        else:
            keep = _np.zeros(len(lp), bool)
        lp = lp[keep]
        qty_f = t["l_quantity"].to_numpy()[keep]
        qty = qty_f.astype(_np.int64)
        if not (qty == qty_f).all():
            raise ValueError(
                "small_qty_revenue: non-integral l_quantity breaks the "
                "lossless per-(part,qty) distribution fold"
            )
        ep = t["l_extendedprice"].to_numpy()[keep]
        cents = _np.floor(ep * 100.0 + 0.5).astype(_np.int64)
        _guard_pack(lp, qty, _QTY_BITS, "small_qty_revenue (part,qty)")
        key, inv = _np.unique(lp * (1 << _QTY_BITS) + qty, return_inverse=True)
        c = _np.zeros(len(key), _np.int64)
        n = _np.zeros(len(key), _np.int64)
        _np.add.at(c, inv, cents)
        _np.add.at(n, inv, 1)
        return pa.table(
            {
                "part": pa.array(
                    ((key >> _QTY_BITS) & _ORD_PART_MASK).astype(_np.int32),
                    pa.int32(),
                ),
                "key": pa.array(key, pa.int64()),
                "cents": pa.array(c, pa.int64()),
                "n": pa.array(n, pa.int64()),
            }
        )

    def threshold_partition(df) -> pa.Table:
        import numpy as _np

        key = df["key"].to_numpy()
        cents = df["cents"].to_numpy()
        n = df["n"].to_numpy()
        uk, inv = _np.unique(key, return_inverse=True)
        c = _np.zeros(len(uk), _np.int64)
        m = _np.zeros(len(uk), _np.int64)
        _np.add.at(c, inv, cents)
        _np.add.at(m, inv, n)
        parts = uk >> _QTY_BITS
        qty = (uk & ((1 << _QTY_BITS) - 1)).astype(_np.float64)
        up, pinv = _np.unique(parts, return_inverse=True)
        sum_q = _np.zeros(len(up), _np.float64)
        cnt_q = _np.zeros(len(up), _np.float64)
        _np.add.at(sum_q, pinv, qty * m)
        _np.add.at(cnt_q, pinv, m.astype(_np.float64))
        thr = 0.2 * (sum_q / cnt_q)
        under = qty < thr[pinv]
        return pa.table(
            {
                "g": pa.array([0], pa.int32()),
                "cents": pa.array([int(c[under].sum())], pa.int64()),
                "n": pa.array([int(m[under].sum())], pa.int64()),
            }
        )

    def finalize(df) -> pa.Table:
        import numpy as _np

        n = int(df["n"].sum())
        c = int(df["cents"].sum())
        avg = _np.float64(c) / 700.0 if n else None
        return pa.table(
            {
                "avg_yearly": pa.array([avg], pa.float64()),
                "n_lines": pa.array([n], pa.int64()),
            }
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_quantity", "l_extendedprice"],
        )
        .map_batches(qty_partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(threshold_partition, batch_format="pandas")
        .groupby("g")
        .map_groups(finalize, batch_format="pandas")
        .select_columns(["avg_yearly", "n_lines"])
    )


SQL_SMALL_QTY_REVENUE = """
WITH l AS (
  SELECT l_partkey, l_quantity,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#1'),
a AS (
  SELECT l_partkey AS pk, 0.2 * avg(l_quantity) AS thr
  FROM l GROUP BY l_partkey)
SELECT CAST(sum(cents) AS DOUBLE) / 700.0 AS avg_yearly,
       CAST(count(*) AS BIGINT) AS n_lines
FROM l JOIN a ON l_partkey = pk
WHERE l_quantity < thr
"""


_GID_BITS = 11  # (brand, size) combo id — dimension-bounded, guarded


def q_supplier_part_counts(sf_dir: str):
    """Grouped COUNT(DISTINCT supplier) with anti-filters (the TPC-H
    Q16 shape, lineitem's (partkey, suppkey) pairs standing in for
    partsupp): distinct suppliers per (brand, size), excluding one
    brand and low-balance suppliers. Distinct-supplier counts are NOT
    additive across part partitions (one supplier serves many parts
    of a group), so the partition key is the SUPPLIER: partkey maps
    to a dimension-bounded (brand,size) group id map-side, (suppkey,
    gid) packs into a guarded int64, and inside bounded supplier-hash
    partitions each distinct key is exactly one (supplier, group)
    incidence — local folds are exact and ADD. The final multi-column
    groupby runs at O(brands x sizes), the packed-key rule's safe
    case. Both anti-filters are broadcast sorted-array lookups;
    lineitem never shuffles raw."""
    import numpy as np

    part_t = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_size"]
    )
    pk = np.asarray(part_t["p_partkey"].to_pylist(), dtype=np.int64)
    brands = part_t["p_brand"].to_pylist()
    sizes = np.asarray(part_t["p_size"].to_pylist(), dtype=np.int64)
    keep = np.asarray([b != "Brand#3" for b in brands], dtype=bool)
    order = np.argsort(pk[keep], kind="stable")
    kept_pk = pk[keep][order]
    kept_brand = [brands[i] for i in np.nonzero(keep)[0][order]]
    kept_size = sizes[keep][order]
    combos = sorted({(b, int(s)) for b, s in zip(kept_brand, kept_size)})
    if len(combos) >= (1 << _GID_BITS):
        raise ValueError(
            "supplier_part_counts: (brand,size) combos overflow the "
            f"{_GID_BITS}-bit group-id pack"
        )
    gid_of = {c: i for i, c in enumerate(combos)}
    part_gid = np.asarray(
        [gid_of[(b, int(s))] for b, s in zip(kept_brand, kept_size)],
        dtype=np.int64,
    )
    supp_t = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_acctbal"]
    )
    sk = np.asarray(supp_t["s_suppkey"].to_pylist(), dtype=np.int64)
    bal = np.asarray(supp_t["s_acctbal"].to_pylist(), dtype=np.float64)
    excl = np.sort(sk[bal < 1000.0])
    lookup_ref = ray.put((kept_pk, part_gid, excl, combos))

    def pair_partial(t: pa.Table) -> pa.Table:
        import numpy as _np

        from ..functions.broadcast import cached_get

        kp, gid, ex, _ = cached_get(lookup_ref)
        lp = t["l_partkey"].to_numpy()
        ls = t["l_suppkey"].to_numpy()
        if len(kp):
            pos = _np.minimum(_np.searchsorted(kp, lp), len(kp) - 1)
            m = kp[pos] == lp
        else:
            pos = _np.zeros(len(lp), _np.int64)
            m = _np.zeros(len(lp), bool)
        if len(ex):
            epos = _np.minimum(_np.searchsorted(ex, ls), len(ex) - 1)
            m &= ex[epos] != ls
        ls = ls[m]
        g = gid[pos[m]] if len(kp) else _np.zeros(0, _np.int64)
        _guard_pack(ls, g, _GID_BITS, "supplier_part_counts (supp,gid)")
        key = _np.unique(ls * (1 << _GID_BITS) + g)
        return pa.table(
            {
                "part": pa.array(
                    ((key >> _GID_BITS) & _ORD_PART_MASK).astype(_np.int32),
                    pa.int32(),
                ),
                "key": pa.array(key, pa.int64()),
            }
        )

    def count_partition(df) -> pa.Table:
        import numpy as _np

        key = _np.unique(df["key"].to_numpy())
        g = key & ((1 << _GID_BITS) - 1)
        ug, cnt = _np.unique(g, return_counts=True)
        return pa.table(
            {
                "gid": pa.array(ug, pa.int64()),
                "supplier_cnt": pa.array(cnt.astype(_np.int64), pa.int64()),
            }
        )

    def project(t: pa.Table) -> pa.Table:
        from ..functions.broadcast import cached_get

        _, _, _, combos_s = cached_get(lookup_ref)
        gids = t["gid"].to_pylist()
        return pa.table(
            {
                "p_brand": pa.array(
                    [combos_s[g][0] for g in gids], pa.string()
                ),
                "p_size": pa.array(
                    [combos_s[g][1] for g in gids], pa.int64()
                ),
                "supplier_cnt": t["supplier_cnt"],
            }
        )

    return _with_schema(
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
        )
        .map_batches(pair_partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(count_partition, batch_format="pandas")
        .groupby("gid")
        .aggregate(Sum("supplier_cnt", alias_name="supplier_cnt"))
        .map_batches(project, batch_format="pyarrow")
        .select_columns(["p_brand", "p_size", "supplier_cnt"]),
        p_brand=pa.string(),
        p_size=pa.int64(),
        supplier_cnt=pa.int64(),
    )


SQL_SUPPLIER_PART_COUNTS = """
WITH ps AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p_brand, CAST(p_size AS BIGINT) AS p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM ps JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#3'
  AND l_suppkey NOT IN
      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
GROUP BY p_brand, p_size
"""


QUERIES = {
    # --- flagship first: the north-star extraction path must sit in
    # whatever prefix the driver gate samples ---
    "extract_e2e": q_extract_e2e,
    # --- round-5 addition (newest, least proven — sampled prefix) ---
    "token_shard_export": q_token_shard_export,
    # --- r5 front-rotation: the only 3 registry rows without a green
    # driver CORRECTNESS row in any round (embedding_quantize never
    # sampled; size_class_counts / media_features only have pre-oracle
    # r1/r2 `no_oracle` rows) — they MUST land in the sampled prefix ---
    "embedding_quantize": q_embedding_quantize,
    "size_class_counts": q_size_class_counts,
    "media_features": q_media_features,
    # --- round-5 batch 3 (newest, least proven — sampled prefix):
    # fact-fact orderkey joins + correlated threshold + count-of-counts ---
    "market_share": q_market_share,
    "nation_profit": q_nation_profit,
    "returned_revenue": q_returned_revenue,
    "cust_order_dist": q_cust_order_dist,
    "small_qty_revenue": q_small_qty_revenue,
    "lang_entropy": q_lang_entropy,
    "supplier_part_counts": q_supplier_part_counts,
    # --- round-5 batch 2 (newest, least proven — sampled prefix) ---
    "promo_revenue": q_promo_revenue,
    "disjunctive_revenue": q_disjunctive_revenue,
    "late_shipment_priority": q_late_shipment_priority,
    "vocab_profile": q_vocab_profile,
    "mode_source_per_lang": q_mode_source_per_lang,
    "orders_mom_delta": q_orders_mom_delta,
    "bulk_suppliers": q_bulk_suppliers,
    "session_stats": q_session_stats,
    "daily_anomaly": q_daily_anomaly,
    "top_revenue_supplier": q_top_revenue_supplier,
    "grouping_sets_counts": q_grouping_sets_counts,
    # --- round-4 late batch: newest, least-proven — keep in the
    # sampled prefix ---
    "large_orders": q_large_orders,
    "idle_customers": q_idle_customers,
    "heavy_hitter_words": q_heavy_hitter_words,
    "events_ewma": q_events_ewma,
    "last_event_value": q_last_event_value,
    "user_degree_hist": q_user_degree_hist,
    "above_avg_docs": q_above_avg_docs,
    "lang_quantile_cont": q_lang_quantile_cont,
    "supplier_wait_blame": q_supplier_wait_blame,
    "nation_pair_volume": q_nation_pair_volume,
    "event_paths": q_event_paths,
    "lang_source_chi2": q_lang_source_chi2,
    "click_except_high_value": q_click_except_high_value,
    "winsorized_mean": q_winsorized_mean,
    "region_price_quantiles": q_region_price_quantiles,
    "spearman_len_tokens": q_spearman_len_tokens,
    "activity_union": q_activity_union,
    "time_to_purchase": q_time_to_purchase,
    "all_type_users": q_all_type_users,
    "cheapest_supplier_per_part": q_cheapest_supplier_per_part,
    "char_budget_curation": q_char_budget_curation,
    "lineitem_profile": q_lineitem_profile,
    "nation_revenue_share": q_nation_revenue_share,
    "top_docs_with_ties": q_top_docs_with_ties,
    "gini_by_priority": q_gini_by_priority,
    "cohort_retention": q_cohort_retention,
    # --- r4 front-rotation: the 7 queries never sampled by any
    # driver gate (r1-r3), plus the one r3 red row (events_time_delta,
    # fixed: Arrow int64-with-nulls) — these MUST land in the sampled
    # prefix this round ---
    "events_time_delta": q_events_time_delta,
    "blueprint_generate": q_blueprint_generate,
    "pii_redact": q_pii_redact,
    "render_pptx_styled": q_render_pptx_styled,
    "repetition_stats": q_repetition_stats,
    "stratified_sample": q_stratified_sample,
    "text_windows": q_text_windows,
    "train_val_split": q_train_val_split,
    # --- round-4 additions (newest least-proven ops, also in the
    # sampled prefix) ---
    "rollup_revenue": q_rollup_revenue,
    "cube_revenue": q_cube_revenue,
    "order_priority_semi": q_order_priority_semi,
    "lang_percentiles": q_lang_percentiles,
    "ntile_quartiles": q_ntile_quartiles,
    "cume_dist_lengths": q_cume_dist_lengths,
    "mad_lengths": q_mad_lengths,
    "bpe_token_count": q_bpe_token_count,
    "pmi_top_pairs": q_pmi_top_pairs,
    "weighted_sample": q_weighted_sample,
    "markov_transitions": q_markov_transitions,
    "interval_coverage": q_interval_coverage,
    "running_distinct": q_running_distinct,
    "skyline": q_skyline,
    "lang_regression": q_lang_regression,
    # --- round-3 additions next (newest least-proven ops) ---
    "events_range_join": q_events_range_join,
    "hll_distinct": q_hll_distinct,
    "bm25_topk": q_bm25_topk,
    "kmeans_clusters": q_kmeans_clusters,
    "events_running_total": q_events_running_total,
    "pagerank": q_pagerank,
    "domain_quality_gate": q_domain_quality_gate,
    "dsir_resample": q_dsir_resample,
    "top_docs_per_lang": q_top_docs_per_lang,
    "group_sample": q_group_sample,
    "fuzzy_url_join": q_fuzzy_url_join,
    "events_pivot": q_events_pivot,
    "embedding_gram": q_embedding_gram,
    "doclen_zscore": q_doclen_zscore,
    "global_rank": q_global_rank,
    "len_token_corr": q_len_token_corr,
    "weighted_avg_discount": q_weighted_avg_discount,
    "top_word_per_lang": q_top_word_per_lang,
    "lang_vocab_overlap": q_lang_vocab_overlap,
    "events_gap_fill": q_events_gap_fill,
    "events_rolling_sum": q_events_rolling_sum,
    "warc_extract": q_warc_extract,
    "wet_roundtrip": q_wet_roundtrip,
    "fuzzy_dedup": q_fuzzy_dedup,
    "dup_ngram_spans": q_dup_ngram_spans,
    "dsir_weights": q_dsir_weights,
    "bloom_new_urls": q_bloom_new_urls,
    "bigram_logprob": q_bigram_logprob,
    "term_postings": q_term_postings,
    "filter_funnel": q_filter_funnel,
    "domain_blocklist": q_domain_blocklist,
    "corpus_export": q_corpus_export,
    "semantic_dedup": q_semantic_dedup,
    "ccnet_buckets": q_ccnet_buckets,
    "ivf_topk": q_ivf_topk,
    "tfidf_terms": q_tfidf_terms,
    "unigram_logprob": q_unigram_logprob,
    "gopher_quality": q_gopher_quality,
    "boilerplate_lines": q_boilerplate_lines,
    "html_metadata": q_html_metadata,
    "url_canonicalize": q_url_canonicalize,
    "decontaminate": q_decontaminate,
    "pack_sequences": q_pack_sequences,
    "temperature_mix": q_temperature_mix,
    "crawl_delta": q_crawl_delta,
    "topic_classify": q_topic_classify,
    # --- newest additions first (unchecked by the r02 driver gate) ---
    "line_dedup": q_line_dedup,
    "embedding_near_dups_lsh": q_embedding_near_dups_lsh,
    "embedding_near_dups": q_embedding_near_dups,
    "image_decode": q_image_decode,
    "image_resize": q_image_resize,
    "video_frame_sample": q_video_frame_sample,
    # --- extraction path (flagship extract_e2e leads the registry) ---
    "extraction_metrics": q_extraction_metrics,
    "domain_stats": q_domain_stats,
    "sniff_doc_types": q_sniff_doc_types,
    "route_counts": q_route_counts,
    "combine_pages_ref": q_combine_pages_ref,
    # --- dedup family ---
    "dedup_exact": q_dedup_exact,
    "minhash_near_dups": q_minhash_near_dups,
    "simhash_near_dups": q_simhash_near_dups,
    "ngram_jaccard": q_ngram_jaccard,
    "dup_clusters": q_dup_clusters,
    # --- text analysis / corpus prep ---
    "token_stats": q_token_stats,
    "quality": q_quality,
    "lang_id": q_lang_id,
    "lang_confusion": q_lang_confusion,
    "longest_doc_per_lang": q_longest_doc_per_lang,
    "fingerprint": q_fingerprint,
    "summarize": q_summarize,
    "training_corpus": q_training_corpus,
    "doclen_quantiles": q_doclen_quantiles,
    # --- similarity search ---
    "ann_cosine_topk": q_ann_cosine_topk,
    "lsh_topk": q_lsh_topk,
    # --- events / windows ---
    "events_hourly": q_events_hourly,
    "events_sliding": q_events_sliding,
    "events_sessionize": q_events_sessionize,
    "events_asof_orders": q_events_asof_orders,
    "funnel_conversion": q_funnel_conversion,
    "event_props": q_event_props,
    # --- relational ---
    "join_orders_segment": q_join_orders_segment,
    "revenue_by_region": q_revenue_by_region,
    "pricing_summary": q_pricing_summary,
    # --- markdown / render ---
    "markdown_structure": q_markdown_structure,
    "slide_windows": q_slide_windows,
    "render_outputs": q_render_outputs,
    # ---- tail: long-stable (r02 driver-green + pytest-covered) ----
    "join_orders_segment_bcast": q_join_orders_segment_bcast,
    "parts_no_early_shipment": q_parts_no_early_shipment,
    "supplier_revenue": q_supplier_revenue,
    "normalize_text": q_normalize_text,
    "clean_text": q_clean_text,
    "ocr_whitelist": q_ocr_whitelist,
    "combine_pages_lex": q_combine_pages_lex,
    "top_words": q_top_words,
    "sentence_split": q_sentence_split,
    "prepare_text": q_prepare_text,
    "chunk_pages": q_chunk_pages,
    "longest_docs": q_longest_docs,
    "markdown_report": q_markdown_report,
    "blueprint_validate": q_blueprint_validate,
    "chart_parse": q_chart_parse,
}

ORACLE_SQL = {
    "market_share": SQL_MARKET_SHARE,
    "nation_profit": SQL_NATION_PROFIT,
    "returned_revenue": SQL_RETURNED_REVENUE,
    "cust_order_dist": SQL_CUST_ORDER_DIST,
    "small_qty_revenue": SQL_SMALL_QTY_REVENUE,
    "lang_entropy": SQL_LANG_ENTROPY,
    "supplier_part_counts": SQL_SUPPLIER_PART_COUNTS,
    "promo_revenue": SQL_PROMO_REVENUE,
    "disjunctive_revenue": SQL_DISJUNCTIVE_REVENUE,
    "late_shipment_priority": SQL_LATE_SHIPMENT_PRIORITY,
    "vocab_profile": SQL_VOCAB_PROFILE,
    "mode_source_per_lang": SQL_MODE_SOURCE_PER_LANG,
    "orders_mom_delta": SQL_ORDERS_MOM_DELTA,
    "bulk_suppliers": SQL_BULK_SUPPLIERS,
    "session_stats": SQL_SESSION_STATS,
    "daily_anomaly": SQL_DAILY_ANOMALY,
    "top_revenue_supplier": SQL_TOP_REVENUE_SUPPLIER,
    "grouping_sets_counts": SQL_GROUPING_SETS_COUNTS,
    "large_orders": SQL_LARGE_ORDERS,
    "idle_customers": SQL_IDLE_CUSTOMERS,
    "heavy_hitter_words": SQL_HEAVY_HITTER_WORDS,
    "events_ewma": SQL_EVENTS_EWMA,
    "last_event_value": SQL_LAST_EVENT_VALUE,
    "user_degree_hist": SQL_USER_DEGREE_HIST,
    "above_avg_docs": SQL_ABOVE_AVG_DOCS,
    "lang_quantile_cont": SQL_LANG_QUANTILE_CONT,
    "supplier_wait_blame": SQL_SUPPLIER_WAIT_BLAME,
    "nation_pair_volume": SQL_NATION_PAIR_VOLUME,
    "event_paths": SQL_EVENT_PATHS,
    "lang_source_chi2": SQL_LANG_SOURCE_CHI2,
    "click_except_high_value": SQL_CLICK_EXCEPT_HIGH_VALUE,
    "winsorized_mean": SQL_WINSORIZED_MEAN,
    "region_price_quantiles": SQL_REGION_PRICE_QUANTILES,
    "spearman_len_tokens": SQL_SPEARMAN_LEN_TOKENS,
    "activity_union": SQL_ACTIVITY_UNION,
    "time_to_purchase": SQL_TIME_TO_PURCHASE,
    "all_type_users": SQL_ALL_TYPE_USERS,
    "cheapest_supplier_per_part": SQL_CHEAPEST_SUPPLIER_PER_PART,
    "char_budget_curation": SQL_CHAR_BUDGET_CURATION,
    "lineitem_profile": SQL_LINEITEM_PROFILE,
    "nation_revenue_share": SQL_NATION_REVENUE_SHARE,
    "top_docs_with_ties": SQL_TOP_DOCS_WITH_TIES,
    "gini_by_priority": SQL_GINI_BY_PRIORITY,
    "cohort_retention": SQL_COHORT_RETENTION,
    "rollup_revenue": SQL_ROLLUP_REVENUE,
    "cube_revenue": SQL_CUBE_REVENUE,
    "order_priority_semi": SQL_ORDER_PRIORITY_SEMI,
    "lang_percentiles": SQL_LANG_PERCENTILES,
    "ntile_quartiles": SQL_NTILE_QUARTILES,
    "cume_dist_lengths": SQL_CUME_DIST_LENGTHS,
    "mad_lengths": SQL_MAD_LENGTHS,
    "bpe_token_count": SQL_BPE_TOKEN_COUNT,
    "pmi_top_pairs": SQL_PMI_TOP_PAIRS,
    "weighted_sample": SQL_WEIGHTED_SAMPLE,
    "markov_transitions": SQL_MARKOV_TRANSITIONS,
    "interval_coverage": SQL_INTERVAL_COVERAGE,
    "running_distinct": SQL_RUNNING_DISTINCT,
    "skyline": SQL_SKYLINE,
    "lang_regression": SQL_LANG_REGRESSION,
    "embedding_quantize": SQL_EMBEDDING_QUANTIZE,
    "warc_extract": SQL_WARC_EXTRACT,
    "wet_roundtrip": SQL_WET_ROUNDTRIP,
    "fuzzy_dedup": SQL_FUZZY_DEDUP,
    "dup_ngram_spans": SQL_DUP_NGRAM_SPANS,
    "dsir_weights": SQL_DSIR_WEIGHTS,
    "bloom_new_urls": SQL_BLOOM_NEW_URLS,
    "bigram_logprob": SQL_BIGRAM_LOGPROB,
    "term_postings": SQL_TERM_POSTINGS,
    "filter_funnel": _filter_funnel_sql(),
    "domain_blocklist": SQL_DOMAIN_BLOCKLIST,
    "corpus_export": _corpus_export_sql(),
    "token_shard_export": _token_shard_sql(),
    "semantic_dedup": SQL_SEMANTIC_DEDUP,
    "ccnet_buckets": SQL_CCNET_BUCKETS,
    "ivf_topk": SQL_IVF_TOPK,
    "tfidf_terms": SQL_TFIDF_TERMS,
    "unigram_logprob": SQL_UNIGRAM_LOGPROB,
    "gopher_quality": SQL_GOPHER_QUALITY,
    "boilerplate_lines": SQL_BOILERPLATE_LINES,
    "html_metadata": SQL_HTML_METADATA,
    "url_canonicalize": SQL_URL_CANONICALIZE,
    "decontaminate": SQL_DECONTAMINATE,
    "pack_sequences": SQL_PACK_SEQUENCES,
    "temperature_mix": SQL_TEMPERATURE_MIX,
    "crawl_delta": SQL_CRAWL_DELTA,
    "topic_classify": SQL_TOPIC_CLASSIFY,
    "extract_e2e": SQL_EXTRACT_E2E,
    "extraction_metrics": SQL_EXTRACTION_METRICS,
    "domain_stats": SQL_DOMAIN_STATS,
    "sniff_doc_types": SQL_SNIFF_DOC_TYPES,
    "route_counts": SQL_ROUTE_COUNTS,
    "normalize_text": SQL_NORMALIZE_TEXT,
    "clean_text": SQL_CLEAN_TEXT,
    "ocr_whitelist": SQL_OCR_WHITELIST,
    "combine_pages_ref": SQL_COMBINE_PAGES_REF,
    "combine_pages_lex": SQL_COMBINE_PAGES_LEX,
    "dedup_exact": SQL_DEDUP_EXACT,
    "token_stats": SQL_TOKEN_STATS,
    "quality": SQL_QUALITY,
    "lang_id": SQL_LANG_ID,
    "lang_confusion": SQL_LANG_CONFUSION,
    "longest_doc_per_lang": SQL_LONGEST_DOC_PER_LANG,
    "fingerprint": SQL_FINGERPRINT,
    "ann_cosine_topk": SQL_ANN_TOPK,
    "lsh_topk": SQL_LSH_TOPK,
    "events_hourly": SQL_EVENTS_HOURLY,
    "events_sliding": SQL_EVENTS_SLIDING,
    "summarize": SQL_SUMMARIZE,
    "ngram_jaccard": SQL_NGRAM_JACCARD,
    "simhash_near_dups": SQL_SIMHASH_NEAR_DUPS,
    "minhash_near_dups": SQL_MINHASH_NEAR_DUPS,
    "dup_clusters": SQL_DUP_CLUSTERS,
    "media_features": SQL_MEDIA_FEATURES,
    "training_corpus": SQL_TRAINING_CORPUS,
    "doclen_quantiles": SQL_DOCLEN_QUANTILES,
    "top_words": SQL_TOP_WORDS,
    "join_orders_segment": SQL_JOIN_ORDERS_SEGMENT,
    "join_orders_segment_bcast": SQL_JOIN_ORDERS_SEGMENT,
    "revenue_by_region": SQL_REVENUE_BY_REGION,
    "pricing_summary": SQL_PRICING_SUMMARY,
    "parts_no_early_shipment": SQL_PARTS_NO_EARLY_SHIPMENT,
    "supplier_revenue": SQL_SUPPLIER_REVENUE,
    "events_sessionize": SQL_EVENTS_SESSIONIZE,
    "events_asof_orders": SQL_EVENTS_ASOF_ORDERS,
    "events_range_join": SQL_EVENTS_RANGE_JOIN,
    "events_running_total": SQL_EVENTS_RUNNING_TOTAL,
    "pagerank": SQL_PAGERANK,
    "domain_quality_gate": SQL_DOMAIN_QUALITY_GATE,
    "dsir_resample": SQL_DSIR_RESAMPLE,
    "top_docs_per_lang": SQL_TOP_DOCS_PER_LANG,
    "group_sample": SQL_GROUP_SAMPLE,
    "fuzzy_url_join": SQL_FUZZY_URL_JOIN,
    "events_pivot": SQL_EVENTS_PIVOT,
    "embedding_gram": SQL_EMBEDDING_GRAM,
    "doclen_zscore": SQL_DOCLEN_ZSCORE,
    "global_rank": SQL_GLOBAL_RANK,
    "len_token_corr": SQL_LEN_TOKEN_CORR,
    "weighted_avg_discount": SQL_WEIGHTED_AVG_DISCOUNT,
    "top_word_per_lang": SQL_TOP_WORD_PER_LANG,
    "lang_vocab_overlap": SQL_LANG_VOCAB_OVERLAP,
    "events_gap_fill": SQL_EVENTS_GAP_FILL,
    "events_rolling_sum": SQL_EVENTS_ROLLING_SUM,
    "events_time_delta": SQL_EVENTS_TIME_DELTA,
    "hll_distinct": SQL_HLL_DISTINCT,
    "bm25_topk": SQL_BM25_TOPK,
    "kmeans_clusters": SQL_KMEANS_CLUSTERS,
    "funnel_conversion": SQL_FUNNEL_CONVERSION,
    "event_props": SQL_EVENT_PROPS,
    "size_class_counts": SQL_SIZE_CLASS_COUNTS,
    "chunk_pages": SQL_CHUNK_PAGES,
    "longest_docs": SQL_LONGEST_DOCS,
    "sentence_split": SQL_SENTENCE_SPLIT,
    "prepare_text": SQL_PREPARE_TEXT,
    "markdown_structure": SQL_MARKDOWN_STRUCTURE,
    "slide_windows": SQL_SLIDE_WINDOWS,
    "markdown_report": SQL_MARKDOWN_REPORT,
    "blueprint_validate": SQL_BLUEPRINT_VALIDATE,
    "blueprint_generate": SQL_BLUEPRINT_GENERATE,
    "render_pptx_styled": SQL_RENDER_PPTX_STYLED,
    "chart_parse": SQL_CHART_PARSE,
    "render_outputs": SQL_RENDER_OUTPUTS,
    "train_val_split": SQL_TRAIN_VAL_SPLIT,
    "stratified_sample": SQL_STRATIFIED_SAMPLE,
    "line_dedup": SQL_LINE_DEDUP,
    "pii_redact": SQL_PII_REDACT,
    "repetition_stats": SQL_REPETITION_STATS,
    "text_windows": SQL_TEXT_WINDOWS,
    "image_decode": SQL_IMAGE_DECODE,
    "image_resize": SQL_IMAGE_RESIZE,
    "video_frame_sample": SQL_VIDEO_FRAME_SAMPLE,
    "embedding_near_dups": SQL_EMBEDDING_NEAR_DUPS,
    "embedding_near_dups_lsh": SQL_EMBEDDING_NEAR_DUPS_LSH,
}
