"""Training-corpus preparation operators beyond cleaning/dedup:
deterministic train/val splitting, PII redaction, and Gopher-style
repetition statistics. These extend the reference's corpus-prep
surface (its cleaning chain ends at normalize/clean,
core_document_processing.py:236-292) with the ops a large-scale
training-data pipeline needs; each is a pure per-row function inside
``map_batches`` (no shuffle) with a DuckDB construction oracle.

* train/val split — the standard md5-hash split (stable under any
  parallelism and across reruns; never random so resuming a corpus
  build can't re-deal documents).
* PII redaction — emails / IPv4s / US-style phone numbers to typed
  placeholders, with per-doc match counts. The synthetic corpus has
  no PII, so the op injects a deterministic PII suffix per doc_id
  (same construction-oracle pattern as the markdown ops) and the SQL
  oracle rebuilds both the injection and the redaction.
* repetition stats — duplicate-word fraction and most-common-2-gram
  fraction (the Gopher/C4 repetition quality gates), emitted as raw
  int/int IEEE divisions so DuckDB matches bit-for-bit.
"""

from __future__ import annotations

import hashlib
import re
from collections import Counter

import pyarrow as pa

TRAIN_PCT = 90

_RE_EMAIL = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
_RE_IP = re.compile(r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b")
# NANP coverage: 10-digit forms with -/./space separators, optional
# +1/1 prefix, optional (NPA) parens — plus the short +1-NNN-NNNN form
# the construction oracle injects. Leftmost-first alternation semantics
# are identical in Python re and DuckDB's RE2, so the SQL oracle
# (SQL_PII_REDACT) carries the same pattern verbatim.
_PHONE_PATTERN = (
    r"(?:\+?1[-. ])?(?:\([0-9]{3}\) ?|\b[0-9]{3}[-. ])"
    r"[0-9]{3}[-. ][0-9]{4}\b"
    r"|\+1-[0-9]{3}-[0-9]{4}\b"
)
_RE_PHONE = re.compile(_PHONE_PATTERN)
_RE_WORD = re.compile(r"\S+")


def split_of(doc_id: int, train_pct: int = TRAIN_PCT) -> str:
    """'train'/'val' by the first 8 md5 hex digits of str(doc_id) mod
    100 — deterministic, parallelism- and rerun-invariant."""
    h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
    return "train" if h % 100 < train_pct else "val"


def train_val_split_batch(batch: pa.Table) -> pa.Table:
    ids = batch["doc_id"].to_pylist()
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "split": pa.array([split_of(i) for i in ids], pa.string()),
        }
    )


def inject_pii(doc_id: int, text: str) -> str:
    """Deterministic PII suffix (the synthetic corpus contains none):
    one email, one IPv4 and one phone per doc, plus a second email on
    doc_id % 7 == 0 to vary the counts."""
    extra = f" user{doc_id}@example.com 10.0.{doc_id % 256}.{doc_id % 100} +1-555-{doc_id % 10000:04d}"
    if doc_id % 7 == 0:
        extra += f" alt{doc_id}@mail.test"
    return text + extra


def redact_pii(text: str) -> tuple[str, int, int, int]:
    """-> (redacted, n_emails, n_ips, n_phones). Order matters: emails
    first (an IP-like substring can't survive inside one), then IPs,
    then phones."""
    red, n_email = _RE_EMAIL.subn("[EMAIL]", text)
    red, n_ip = _RE_IP.subn("[IP]", red)
    red, n_phone = _RE_PHONE.subn("[PHONE]", red)
    return red, n_email, n_ip, n_phone


def pii_redact_batch(batch: pa.Table) -> pa.Table:
    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    reds, ne, ni, np_ = [], [], [], []
    for did, text in zip(ids, texts):
        red, e, i, p = redact_pii(inject_pii(did, text))
        reds.append(red)
        ne.append(e)
        ni.append(i)
        np_.append(p)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "redacted": pa.array(reds, pa.string()),
            "n_emails": pa.array(ne, pa.int64()),
            "n_ips": pa.array(ni, pa.int64()),
            "n_phones": pa.array(np_, pa.int64()),
        }
    )


def repetition_stats(text: str) -> tuple[int, int, int, int]:
    """-> (n_words, n_distinct_words, n_bigrams, top_bigram_count)."""
    words = _RE_WORD.findall(text)
    n = len(words)
    if n < 2:
        return n, len(set(words)), 0, 0
    bigrams = Counter(zip(words, words[1:]))
    return n, len(set(words)), n - 1, max(bigrams.values())


def repetition_batch(batch: pa.Table, max_dup_frac: float = 0.9,
                     max_top_bigram_frac: float = 0.18) -> pa.Table:
    """Gopher-style repetition gates. Fractions are emitted as the raw
    int/int division (IEEE-identical to the SQL oracle); ``keep`` is
    the conjunction of both gates."""
    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    dup_fr, big_fr, keeps = [], [], []
    for text in texts:
        n, nd, nb, top = repetition_stats(text)
        d = (n - nd) / n if n else 0.0
        b = top / nb if nb else 0.0
        dup_fr.append(d)
        big_fr.append(b)
        keeps.append(d <= max_dup_frac and b <= max_top_bigram_frac)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "dup_word_frac": pa.array(dup_fr, pa.float64()),
            "top_bigram_frac": pa.array(big_fr, pa.float64()),
            "keep": pa.array(keeps, pa.bool_()),
        }
    )


# ------------------------------------------------- stratified sampling

# pct of each stratum kept (default 100): the corpus-balancing op —
# e.g. downsample the dominant language while keeping the tail whole.
DEFAULT_SAMPLE_RATES = {"en": 50}


def sample_hash(doc_id: int) -> int:
    """Deterministic 0..99 draw per doc, independent of split_of's
    stream (different salt)."""
    return int(
        hashlib.md5(f"{doc_id}:sample".encode()).hexdigest()[:8], 16
    ) % 100


def stratified_sample_batch(
    batch: pa.Table, rates: dict[str, int] | None = None
) -> pa.Table:
    """Keep each row iff its deterministic draw < its stratum's rate.
    Never random: reruns and resumes keep the identical sample."""
    if rates is None:
        rates = DEFAULT_SAMPLE_RATES
    ids = batch["doc_id"].to_pylist()
    langs = batch["lang"].to_pylist()
    keep = [
        sample_hash(i) < rates.get(lang, 100) for i, lang in zip(ids, langs)
    ]
    return batch.filter(pa.array(keep, pa.bool_()))


# ------------------------------------------------- decontamination

# Benchmark/eval decontamination (the GPT-3 appendix-C / PaLM-style
# n-gram overlap check): every training document containing a verbatim
# probe n-gram from the held-out benchmark is flagged. The benchmark
# here is a deterministic sample of the corpus itself (doc_id % 97)
# so the DuckDB oracle can rebuild the probe set exactly.
PROBE_MOD = 97
PROBE_WORDS = 13


def probe_of(text: str) -> str | None:
    """First PROBE_WORDS whitespace tokens, space-joined — None when
    the document is too short to yield a full probe."""
    words = _RE_WORD.findall(text)[:PROBE_WORDS]
    if len(words) < PROBE_WORDS:
        return None
    return " ".join(words)


def probe_batch(batch: pa.Table) -> pa.Table:
    """Map-side probe extraction: benchmark rows only leave the task."""
    bench = batch.filter(
        pa.array(batch["doc_id"].to_numpy() % PROBE_MOD == 0, pa.bool_())
    )
    probes = [
        p
        for p in (probe_of(t) for t in bench["text"].to_pylist())
        if p is not None
    ]
    return pa.table({"probe": pa.array(probes, pa.string())})


def make_contamination_scanner(probes_ref):
    """Batch scanner: P vectorized literal-substring passes (Arrow
    SIMD ``match_substring``) per batch against the broadcast probe
    list — O(P × corpus) with a fixed benchmark, no shuffle. Emits
    only contaminated rows (doc_id, n_hits = distinct probes found)."""
    import numpy as np
    import pyarrow.compute as pc

    from ..functions.broadcast import cached_get

    def scan(batch: pa.Table) -> pa.Table:
        probes = cached_get(probes_ref)
        hits = np.zeros(batch.num_rows, dtype=np.int64)
        text = batch["text"]
        for p in probes:
            hits += pc.match_substring(text, p).to_numpy(
                zero_copy_only=False
            )
        mask = hits > 0
        return pa.table(
            {
                "doc_id": batch["doc_id"].filter(
                    pa.array(mask, pa.bool_())
                ),
                "n_hits": pa.array(hits[mask], pa.int64()),
            }
        )

    return scan


# ------------------------------------------- temperature resampling

# Multilingual corpus mixing (the mT5/XLM-R temperature-sampling op):
# stratum l is kept at a rate proportional to (n_l)^alpha / n_l with
# alpha = 0.5, flattening the language distribution toward the tail.
# All arithmetic is INTEGER so the DuckDB oracle matches bit-for-bit:
# weights are isqrt(n_l) (== floor(sqrt(n_l)) exactly for n < 2^52),
# thresholds are exact integer floors out of MIX_MOD, and the per-doc
# draw is the house md5 pattern under a dedicated salt.
MIX_MOD = 10_000
MIX_TARGET_DEN = 2  # sample budget = corpus size // 2


def mix_hash(doc_id: int) -> int:
    """Deterministic 0..MIX_MOD-1 draw (salt 'mix' — independent of
    the split and sample streams)."""
    return int(
        hashlib.md5(f"{doc_id}:mix".encode()).hexdigest()[:8], 16
    ) % MIX_MOD


def mix_thresholds(
    lang_counts: dict[str, int], target_total: int
) -> dict[str, int]:
    """Per-language keep-threshold out of MIX_MOD: rate_l =
    min(1, S * w_l / (W * n_l)) with w_l = isqrt(n_l), W = sum(w)."""
    import math

    w = {lang: math.isqrt(n) for lang, n in lang_counts.items()}
    W = sum(w.values())
    return {
        lang: min(
            MIX_MOD, (MIX_MOD * target_total * w[lang]) // (W * n)
        )
        for lang, n in lang_counts.items()
    }


def make_mix_filter(thresholds: dict[str, int]):
    """Map-only filter: keep a row iff its draw clears its language's
    threshold. ``thresholds`` is lang-cardinality-sized (tiny) and
    ships in the task closure."""

    def mix_batch(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        langs = batch["lang"].to_pylist()
        keep = [
            mix_hash(i) < thresholds.get(lang, 0)
            for i, lang in zip(ids, langs)
        ]
        return batch.filter(pa.array(keep, pa.bool_()))

    return mix_batch


# ------------------------------------------- boilerplate-line removal
# CCNet-style sub-document boilerplate removal by GLOBAL line
# document-frequency: a line appearing in >= BOILER_MIN_DOCS distinct
# documents is template/boilerplate text and is stripped from every
# document. Two passes over the corpus (the CCNet shape): a count pass
# that reduces to a small droplist, then a map-only filter pass.
# Differs from line_dedup (keep-FIRST occurrence): here no copy
# survives — repeated lines are navigation chrome, not content.
BOILER_MIN_DOCS = 2
# Same driver-merge byte budget rationale as extract.stale_droplist:
# partial (hash, n) rows merge driver-side with one multithreaded
# pyarrow group-by while they fit; past the budget the merge degrades
# to a distributed Ray groupby that reduces to boilerplate hashes
# (df >= min_docs, a tiny fraction of all lines) before anything
# reaches the driver.
BOILER_BUDGET_BYTES = 256 << 20


def boiler_partials(batch: pa.Table) -> pa.Table:
    """Per-block partial doc-frequencies: one vote per (doc, line)."""
    from ..functions.hashing import md5_hex
    from .markdown import text_lines

    c: Counter = Counter()
    for text in batch["text"].to_pylist():
        for h in {md5_hex(line) for line in text_lines(text)}:
            c[h] += 1
    return pa.table(
        {
            "line_hash": pa.array(list(c.keys()), pa.string()),
            "n": pa.array(list(c.values()), pa.int64()),
        }
    )


def df_droplist(
    ds,
    partial_fn,
    key: str,
    min_docs: int = BOILER_MIN_DOCS,
    byte_budget: int = BOILER_BUDGET_BYTES,
) -> frozenset:
    """Generic document-frequency droplist: ``key`` values with
    df >= min_docs, where ``partial_fn`` emits per-block partial
    (key, n) vote counts (one vote per distinct key per doc).

    Exact because every document lives in one row: each doc votes once
    per distinct key inside its own block, so partial counts sum to
    the true distinct-doc count. Driver merge is byte-budgeted with a
    distributed-groupby fallback (the stale_droplist shape).
    """
    import pyarrow.compute as pc

    import ray

    partials = ds.map_batches(
        partial_fn, batch_format="pyarrow", batch_size=None
    ).materialize()
    tables, total = [], 0
    for ref in partials.to_arrow_refs():
        t = ray.get(ref)
        if not t.num_rows:
            continue
        tables.append(t)
        total += t.nbytes
        if total > byte_budget:
            return _df_droplist_shuffled(partials, min_docs, key)
    if not tables:
        return frozenset()
    merged = (
        pa.TableGroupBy(
            pa.concat_tables(tables).combine_chunks(), key
        )
        .aggregate([("n", "sum")])
    )
    keep = merged.filter(pc.greater_equal(merged["n_sum"], min_docs))
    return frozenset(keep[key].to_pylist())


def boilerplate_droplist(
    ds,
    min_docs: int = BOILER_MIN_DOCS,
    byte_budget: int = BOILER_BUDGET_BYTES,
) -> frozenset:
    """line_hash set with document-frequency >= min_docs."""
    return df_droplist(ds, boiler_partials, "line_hash", min_docs, byte_budget)


def _df_droplist_shuffled(partials, min_docs: int, key: str) -> frozenset:
    """Distributed merge: reduce to df >= min_docs keys off-driver."""
    import pyarrow.compute as pc

    import ray
    from ray.data.aggregate import Sum

    merged = partials.groupby(key).aggregate(
        Sum("n", alias_name="df")
    )

    def only_dup(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["df"], min_docs)).select([key])

    out: set = set()
    for ref in (
        merged.map_batches(only_dup, batch_format="pyarrow")
        .to_arrow_refs()
    ):
        out.update(ray.get(ref)[key].to_pylist())
    return frozenset(out)


def make_boiler_filter(drop_ref):
    """Map-only filter pass: rebuild each doc from its non-boilerplate
    lines. The droplist is a ray.put frozenset fetched once per worker
    (functions/broadcast.py), never re-shipped per batch."""
    from ..functions.broadcast import cached_get
    from ..functions.hashing import md5_hex
    from .markdown import text_lines

    def clean(batch: pa.Table) -> pa.Table:
        drop = cached_get(drop_ref)
        ids = batch["doc_id"]
        cleaned, n_removed = [], []
        for text in batch["text"].to_pylist():
            lines = text_lines(text)
            kept = [l for l in lines if md5_hex(l) not in drop]
            cleaned.append(" ".join(kept))
            n_removed.append(len(lines) - len(kept))
        return pa.table(
            {
                "doc_id": ids,
                "clean_text": pa.array(cleaned, pa.string()),
                "n_removed": pa.array(n_removed, pa.int64()),
            }
        )

    return clean


# ----------------------------------- duplicated n-gram span detection
# Exact-substring duplication proxy (Lee et al. 2021 "Deduplicating
# Training Data Makes Language Models Better"; RefinedWeb's exact-
# substring stage): a word n-gram occurring in >= 2 distinct documents
# marks a duplicated span. Instead of a cross-node suffix array, the
# engine reuses the CCNet two-pass df shape over word n-grams — a
# droplist pass that reduces the corpus to the (small) set of
# cross-document n-grams, then a map-only pass scoring each document's
# duplicated-span fraction. At 100 TB the droplist pass is the same
# bounded-budget merge as the boilerplate droplist; n-gram keys travel
# as md5 hashes (16 B amortized), never raw strings.
NGRAM_SPAN_N = 5


def _word_ngrams(text: str, n: int = NGRAM_SPAN_N) -> list:
    words = text.split()
    return [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]


def ngram_partials(batch: pa.Table) -> pa.Table:
    """Per-block partial doc-frequencies: one vote per (doc, distinct
    n-gram)."""
    from ..functions.hashing import md5_hex

    c: Counter = Counter()
    for text in batch["text"].to_pylist():
        for h in {md5_hex(g) for g in _word_ngrams(text)}:
            c[h] += 1
    return pa.table(
        {
            "gram_hash": pa.array(list(c.keys()), pa.string()),
            "n": pa.array(list(c.values()), pa.int64()),
        }
    )


def dup_ngram_set(
    ds,
    min_docs: int = BOILER_MIN_DOCS,
    byte_budget: int = BOILER_BUDGET_BYTES,
) -> frozenset:
    """Hashes of word n-grams that appear in >= min_docs documents."""
    return df_droplist(ds, ngram_partials, "gram_hash", min_docs, byte_budget)


def make_ngram_span_counter(dup_ref):
    """Map-only scoring pass: per doc, total n-gram positions, how many
    sit inside a cross-document duplicated span, and the duplicated
    fraction (int/int IEEE division; NULL when the doc has < n words)."""
    from ..functions.broadcast import cached_get
    from ..functions.hashing import md5_hex

    def score(batch: pa.Table) -> pa.Table:
        dup = cached_get(dup_ref)
        n_grams, n_dup, frac = [], [], []
        for text in batch["text"].to_pylist():
            grams = _word_ngrams(text)
            nd = sum(1 for g in grams if md5_hex(g) in dup)
            n_grams.append(len(grams))
            n_dup.append(nd)
            frac.append(nd / len(grams) if grams else None)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_grams": pa.array(n_grams, pa.int64()),
                "n_dup": pa.array(n_dup, pa.int64()),
                "dup_frac": pa.array(frac, pa.float64()),
            }
        )

    return score
