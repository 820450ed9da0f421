"""Text analysis operators for large-scale training-data pipelines:
token counting, quality scoring, language ID, fingerprinting.

All are stateless vectorized ``map_batches`` bodies over the
``documents`` table; scoring constants are module-level frozen so the
same numbers come out under any parallelism, and each op has a DuckDB
SQL equivalent (see pipelines/queries.py) used as the correctness
oracle.
"""

from __future__ import annotations

import re

import pyarrow as pa

from ..functions.hashing import md5_hex, simhash64, winnow_fingerprint
from ..functions.rounding import round6

_RE_TOKEN = re.compile(r"\S+")
_RE_WORD = re.compile(r"[a-z]+")
_RE_PUNCT = re.compile(r"[.!?,;:]")
# ASCII letters only — the same [A-Za-z] class the DuckDB oracle counts
# (str.isalpha() counts all Unicode letters and silently diverges on any
# non-ASCII corpus).
_RE_ALPHA = re.compile(r"[A-Za-z]")
# BPE-ish subword pre-tokenizer (GPT-2 style, simplified): word pieces,
# numbers, or single non-space symbols.
_RE_BPE = re.compile(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]")

# Small fixed stopword set shared verbatim with the SQL oracle.
STOP_SMALL = (
    "the", "and", "of", "a", "to", "in", "is", "it", "that", "for",
    "on", "with", "as", "at", "by", "an", "be", "this", "are", "or",
)
_STOP_SET = frozenset(STOP_SMALL)

# Disjoint marker-word sets per language (deterministic tie-break
# priority: en > de > fr > es). Disjointness keeps the SQL oracle exact.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "that", "with", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "fr": ("le", "la", "les", "est", "une", "dans", "pour", "que"),
    "es": ("el", "los", "las", "es", "una", "por", "para", "como"),
}
_LANG_ORDER = ("en", "de", "fr", "es")
_LANG_SETS = {k: frozenset(v) for k, v in LANG_MARKERS.items()}


def token_stats_batch(batch: pa.Table) -> pa.Table:
    """(doc_id) + n_tokens (\\S+ runs), n_bpe_tokens (BPE-ish regex),
    n_punct."""
    texts = batch["text"].to_pylist()
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(
                [len(_RE_TOKEN.findall(t)) for t in texts], pa.int64()
            ),
            "n_bpe_tokens": pa.array(
                [len(_RE_BPE.findall(t)) for t in texts], pa.int64()
            ),
            "n_punct": pa.array(
                [len(_RE_PUNCT.findall(t)) for t in texts], pa.int64()
            ),
        }
    )


def quality_batch(batch: pa.Table) -> pa.Table:
    """Quality-signal columns: length, token count, mean word length,
    stopword ratio, alpha ratio. Ratios are raw int/int IEEE divisions
    — bit-identical to the DuckDB oracle's divisions."""
    texts = batch["text"].to_pylist()
    n_chars, n_tokens, mean_wl, stop_ratio, alpha_ratio = [], [], [], [], []
    for t in texts:
        toks = _RE_TOKEN.findall(t)
        words = _RE_WORD.findall(t.lower())
        nt = len(toks)
        n_chars.append(len(t))
        n_tokens.append(nt)
        mean_wl.append(sum(map(len, toks)) / nt if nt else 0.0)
        stop_ratio.append(
            sum(w in _STOP_SET for w in words) / len(words) if words else 0.0
        )
        alpha_ratio.append(
            len(_RE_ALPHA.findall(t)) / len(t) if t else 0.0
        )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_chars": pa.array(n_chars, pa.int64()),
            "n_tokens": pa.array(n_tokens, pa.int64()),
            "mean_word_len": pa.array(mean_wl, pa.float64()),
            "stop_ratio": pa.array(stop_ratio, pa.float64()),
            "alpha_ratio": pa.array(alpha_ratio, pa.float64()),
        }
    )


def lang_id_batch(batch: pa.Table) -> pa.Table:
    """Marker-word language ID with fixed priority tie-break."""
    texts = batch["text"].to_pylist()
    preds, scores = [], []
    for t in texts:
        words = _RE_WORD.findall(t.lower())
        counts = {
            lang: sum(w in s for w in words) for lang, s in _LANG_SETS.items()
        }
        best = max(_LANG_ORDER, key=lambda l: (counts[l], -_LANG_ORDER.index(l)))
        preds.append(best)
        scores.append(counts[best])
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "pred_lang": pa.array(preds, pa.string()),
            "marker_hits": pa.array(scores, pa.int64()),
        }
    )


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Content hashes: md5 (SQL-checkable) + SimHash + winnowing sketch
    size (rolling-hash fingerprint, Schleimer et al. SIGMOD'03)."""
    texts = batch["text"].to_pylist()
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "md5_hash": pa.array([md5_hex(t) for t in texts], pa.string()),
            "simhash": pa.array(
                [int(simhash64(t)) for t in texts], pa.uint64()
            ),
            "n_winnow": pa.array(
                [len(winnow_fingerprint(t)) for t in texts], pa.int64()
            ),
        }
    )


# ---------------------------------------------- topic classification

# Keyword-list topic scoring (the mixing-weight / domain-tagging op a
# corpus pipeline runs before choosing sampling ratios): score(topic) =
# total occurrences of the topic's keywords as whole words; argmax with
# lexicographic tie-break. Fixed keyword lists -> a handful of
# vectorized Arrow regex passes per batch, map-only; the SQL oracle
# inlines the same lists (functions/queries house pattern).
TOPICS: dict[str, list[str]] = {
    "business": ["customer", "order", "part", "value", "query"],
    "relational": ["join", "hash", "sort", "merge", "filter", "agg"],
    "storage": ["row", "column", "vector", "table", "scan"],
    "streaming": ["stream", "batch", "window", "spark"],
}
_TOPIC_ORDER = sorted(TOPICS)  # lexicographic: argmax tie-break order


def topic_classify_batch(batch: pa.Table) -> pa.Table:
    import numpy as np
    import pyarrow.compute as pc

    text = batch["text"]
    score_mat = np.zeros((batch.num_rows, len(_TOPIC_ORDER)), np.int64)
    for j, topic in enumerate(_TOPIC_ORDER):
        for kw in TOPICS[topic]:
            score_mat[:, j] += pc.count_substring_regex(
                text, rf"\b{kw}\b"
            ).to_numpy()
    best = score_mat.argmax(axis=1)  # first max == lexicographic tie-break
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "topic": pa.array(
                [_TOPIC_ORDER[j] for j in best], pa.string()
            ),
            "score": pa.array(
                score_mat[np.arange(len(best)), best], pa.int64()
            ),
        }
    )


# ------------------------------------------------ Gopher quality rules
# The published Gopher corpus-filter heuristics (Rae et al. 2021,
# "Scaling Language Models: ... Gopher", Table A1): hard per-document
# gates a web corpus is run through before training. Thresholds are
# the paper's; every signal is recomputed by the DuckDB oracle with
# identical int/int IEEE divisions so `passes` is bit-checkable.
GOPHER_STOP = ("the", "be", "to", "of", "and", "that", "have", "with")
_GOPHER_STOP_SET = frozenset(GOPHER_STOP)
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WL = 3.0
GOPHER_MAX_MEAN_WL = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MAX_BULLET_FRAC = 0.9
GOPHER_MAX_ELLIPSIS_FRAC = 0.3
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_MIN_STOP_HITS = 2

_BULLETS = ("- ", "* ", "• ")


def gopher_quality_batch(batch: pa.Table) -> pa.Table:
    """Per-doc Gopher rule signals + the conjunctive ``passes`` gate.

    Map-only, stateless; ratios are raw int/int divisions. Line-based
    rules (bullet / ellipsis fractions) split on newlines — on a
    corpus with no newlines they are exactly 0, matching the oracle.
    """
    texts = batch["text"].to_pylist()
    n_words_c, mean_wl_c, sym_c, bullet_c, ell_c, alpha_c, stop_c, pass_c = (
        [], [], [], [], [], [], [], []
    )
    for t in texts:
        toks = _RE_TOKEN.findall(t)
        nt = len(toks)
        lines = t.split("\n")
        nl = len(lines)
        mean_wl = sum(map(len, toks)) / nt if nt else 0.0
        n_sym = t.count("#") + t.count("...")
        sym_ratio = n_sym / nt if nt else 0.0
        n_bullet = sum(l.lstrip().startswith(_BULLETS) for l in lines)
        n_ell = sum(l.rstrip().endswith("...") for l in lines)
        bullet_frac = n_bullet / nl
        ell_frac = n_ell / nl
        n_alpha = sum(1 for w in toks if _RE_ALPHA.search(w))
        alpha_frac = n_alpha / nt if nt else 0.0
        stop_hits = len(_GOPHER_STOP_SET.intersection(
            _RE_WORD.findall(t.lower())
        ))
        n_words_c.append(nt)
        mean_wl_c.append(mean_wl)
        sym_c.append(sym_ratio)
        bullet_c.append(bullet_frac)
        ell_c.append(ell_frac)
        alpha_c.append(alpha_frac)
        stop_c.append(stop_hits)
        pass_c.append(
            GOPHER_MIN_WORDS <= nt <= GOPHER_MAX_WORDS
            and GOPHER_MIN_MEAN_WL <= mean_wl <= GOPHER_MAX_MEAN_WL
            and sym_ratio < GOPHER_MAX_SYMBOL_RATIO
            and bullet_frac < GOPHER_MAX_BULLET_FRAC
            and ell_frac < GOPHER_MAX_ELLIPSIS_FRAC
            and alpha_frac > GOPHER_MIN_ALPHA_FRAC
            and stop_hits >= GOPHER_MIN_STOP_HITS
        )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_words": pa.array(n_words_c, pa.int64()),
            "mean_word_len": pa.array(mean_wl_c, pa.float64()),
            "symbol_ratio": pa.array(sym_c, pa.float64()),
            "bullet_frac": pa.array(bullet_c, pa.float64()),
            "ellipsis_frac": pa.array(ell_c, pa.float64()),
            "alpha_word_frac": pa.array(alpha_c, pa.float64()),
            "stop_hits": pa.array(stop_c, pa.int64()),
            "passes": pa.array(pass_c, pa.bool_()),
        }
    )


# ------------------------------------------ unigram LM quality score
# CCNet-style language-model quality proxy (Wenzek et al. 2020 score
# documents with a small LM and keep by perplexity band): here the LM
# is a unigram model fit on the corpus itself — two passes, exactly
# the boilerplate-droplist shape. Pass 1 reduces to a (word, count)
# vocabulary (map-side partials, driver pyarrow merge — the vocab is
# the bounded object, not the corpus; a production run would prune
# rare words to a floor probability before broadcast). Pass 2 scores
# each doc map-side with the broadcast model: avg over its words of
# ln(count(w)/total), rounded to 6 dp (the cosine-similarity rounding
# convention — DuckDB's ln/avg agree with numpy's well past 6 dp).

def unigram_partials(batch: pa.Table) -> pa.Table:
    from collections import Counter

    c: Counter = Counter()
    for t in batch["text"].to_pylist():
        c.update(_RE_WORD.findall(t.lower()))
    return pa.table(
        {
            "word": pa.array(list(c.keys()), pa.string()),
            "n": pa.array(list(c.values()), pa.int64()),
        }
    )


def unigram_model(ds) -> dict[str, float]:
    """word -> ln(count/total) over the corpus' [a-z]+ words."""
    import math

    import ray

    tables = [
        t
        for t in ray.get(
            ds.map_batches(
                unigram_partials, batch_format="pyarrow", batch_size=None
            ).to_arrow_refs()
        )
        if t.num_rows
    ]
    if not tables:
        return {}
    merged = pa.TableGroupBy(
        pa.concat_tables(tables).combine_chunks(), "word"
    ).aggregate([("n", "sum")])
    total = sum(merged["n_sum"].to_pylist())
    return {
        w: math.log(n / total)
        for w, n in zip(
            merged["word"].to_pylist(), merged["n_sum"].to_pylist()
        )
    }


def make_unigram_scorer(model_ref):
    """Map-only scoring pass; the model dict is fetched once per
    worker from the local object store."""
    from ..functions.broadcast import cached_get

    def score(batch: pa.Table) -> pa.Table:
        model = cached_get(model_ref)
        n_words, lps = [], []
        for t in batch["text"].to_pylist():
            words = _RE_WORD.findall(t.lower())
            n_words.append(len(words))
            lps.append(
                round6(sum(model[w] for w in words) / len(words))
                if words
                else 0.0
            )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_words": pa.array(n_words, pa.int64()),
                "avg_logprob": pa.array(lps, pa.float64()),
            }
        )

    return score


# ------------------------------------------------- tf-idf top terms
# Per-doc keyword extraction: top-K terms by tf * idf. Ranking must be
# bit-identical between numpy and DuckDB, so idf is quantized to an
# integer micro-idf = floor(ln(N/df) * 1e6 + 0.5) (DuckDB round()
# semantics: half away from zero; ln(N/df) >= 0) and scores are pure
# int64 products — float comparisons never decide an ordering.
# df-counts reuse the exact-distinct trick: every doc's words live in
# one row, so per-block distinct-doc partials sum to the true df.
TFIDF_TOP_K = 3


def df_partials(batch: pa.Table) -> pa.Table:
    from collections import Counter

    c: Counter = Counter()
    for t in batch["text"].to_pylist():
        c.update(set(_RE_WORD.findall(t.lower())))
    return pa.table(
        {
            "word": pa.array(list(c.keys()), pa.string()),
            "n": pa.array(list(c.values()), pa.int64()),
        }
    )


def idf_table(ds, n_docs: int) -> dict[str, int]:
    """word -> micro-idf over the corpus (driver merge of per-block
    distinct-doc partials; the vocab is the bounded object)."""
    import math

    import ray

    tables = [
        t
        for t in ray.get(
            ds.map_batches(
                df_partials, batch_format="pyarrow", batch_size=None
            ).to_arrow_refs()
        )
        if t.num_rows
    ]
    if not tables:
        return {}
    merged = pa.TableGroupBy(
        pa.concat_tables(tables).combine_chunks(), "word"
    ).aggregate([("n", "sum")])
    return {
        w: int(math.floor(math.log(n_docs / df) * 1_000_000 + 0.5))
        for w, df in zip(
            merged["word"].to_pylist(), merged["n_sum"].to_pylist()
        )
    }


def make_tfidf_scorer(idf_ref, top_k: int = TFIDF_TOP_K):
    """Map-only pass 2: per-doc tf counts x broadcast micro-idf,
    integer sort, emit the top_k (score DESC, term ASC) rows."""
    from collections import Counter

    from ..functions.broadcast import cached_get

    def score(batch: pa.Table) -> pa.Table:
        idf = cached_get(idf_ref)
        ids, terms, tfs, scores, ranks = [], [], [], [], []
        for did, t in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            counts = Counter(_RE_WORD.findall(t.lower()))
            top = sorted(
                ((w, tf, tf * idf[w]) for w, tf in counts.items()),
                key=lambda x: (-x[2], x[0]),
            )[:top_k]
            for r, (w, tf, s) in enumerate(top, 1):
                ids.append(did)
                terms.append(w)
                tfs.append(tf)
                scores.append(s)
                ranks.append(r)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "term": pa.array(terms, pa.string()),
                "tf": pa.array(tfs, pa.int64()),
                "score": pa.array(scores, pa.int64()),
                "rank": pa.array(ranks, pa.int64()),
            }
        )

    return score


# --------------------------------------- DSIR importance weighting
# Data Selection via Importance Resampling (Xie et al. 2023): score
# every document by the log-likelihood ratio of a target-domain
# unigram model vs the source (whole-corpus) model, both Laplace-
# smoothed over the joint vocabulary. Documents that look like the
# target domain get high weights; resampling by these weights selects
# pretraining data matched to the target. DSIR proper uses hashed
# n-gram buckets so the model is fixed-size; here the vocab-keyed
# model keeps the SQL oracle exact, and the broadcast/merge shape
# (bounded partials -> driver merge -> ray.put once) is identical
# either way.


def dsir_partials_factory(target_lang: str):
    def dsir_partials(batch: pa.Table) -> pa.Table:
        from collections import Counter

        cs: Counter = Counter()
        ct: Counter = Counter()
        for t, lg in zip(
            batch["text"].to_pylist(), batch["lang"].to_pylist()
        ):
            words = _RE_WORD.findall(t.lower())
            cs.update(words)
            if lg == target_lang:
                ct.update(words)
        keys = list(cs.keys())
        return pa.table(
            {
                "word": pa.array(keys, pa.string()),
                "n_source": pa.array([cs[k] for k in keys], pa.int64()),
                "n_target": pa.array([ct.get(k, 0) for k in keys], pa.int64()),
            }
        )

    return dsir_partials


def dsir_model(ds, target_lang: str = "en") -> dict:
    """word -> ln(p_target(w)) - ln(p_source(w)), Laplace-smoothed over
    the joint vocab. One counting pass serves both models."""
    import math

    import ray

    tables = [
        t
        for t in ray.get(
            ds.map_batches(
                dsir_partials_factory(target_lang),
                batch_format="pyarrow",
                batch_size=None,
            ).to_arrow_refs()
        )
        if t.num_rows
    ]
    if not tables:
        return {}
    merged = pa.TableGroupBy(
        pa.concat_tables(tables).combine_chunks(), "word"
    ).aggregate([("n_source", "sum"), ("n_target", "sum")])
    cs = merged["n_source_sum"].to_pylist()
    ct = merged["n_target_sum"].to_pylist()
    s, t, v = sum(cs), sum(ct), merged.num_rows
    return {
        w: math.log((nt + 1) / (t + v)) - math.log((ns + 1) / (s + v))
        for w, ns, nt in zip(merged["word"].to_pylist(), cs, ct)
    }


def make_dsir_scorer(model_ref):
    """Map-only pass: per doc, the length-normalized log importance
    weight (6-dp rounded; 0.0 for wordless docs)."""
    from ..functions.broadcast import cached_get

    def score(batch: pa.Table) -> pa.Table:
        model = cached_get(model_ref)
        n_words, lws = [], []
        for t in batch["text"].to_pylist():
            words = _RE_WORD.findall(t.lower())
            n_words.append(len(words))
            lws.append(
                round6(sum(model[w] for w in words) / len(words))
                if words
                else 0.0
            )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang": batch["lang"],
                "n_words": pa.array(n_words, pa.int64()),
                "log_weight": pa.array(lws, pa.float64()),
            }
        )

    return score


# ------------------------------------------- bigram LM scoring
# One step closer to CCNet's KenLM perplexity filter than the unigram
# proxy: a Laplace-smoothed bigram model fit on the corpus itself.
# Same scale shape as the unigram op — one distributed counting pass
# (bigram + unigram partials together), a broadcast model table, then
# a map-only scoring pass. The model is vocab-bounded, not
# corpus-bounded; at web scale you'd cap the vocab by frequency (or
# hash it) exactly as CCNet's LM does, which changes the constants,
# not the shape.


def bigram_partials(batch: pa.Table) -> pa.Table:
    """Unified partial: one tokenization pass emits BOTH unigram rows
    (w2 = NULL) and bigram rows, so the model needs a single scan of
    the corpus."""
    from collections import Counter

    uni: Counter = Counter()
    big: Counter = Counter()
    for t in batch["text"].to_pylist():
        words = _RE_WORD.findall(t.lower())
        uni.update(words)
        big.update(zip(words, words[1:]))
    w1 = list(uni.keys()) + [k[0] for k in big]
    w2 = [None] * len(uni) + [k[1] for k in big]
    n = list(uni.values()) + list(big.values())
    return pa.table(
        {
            "w1": pa.array(w1, pa.string()),
            "w2": pa.array(w2, pa.string()),
            "n": pa.array(n, pa.int64()),
        }
    )


def bigram_model(ds) -> dict:
    """(w1, w2) -> ln p(w2 | w1), Laplace-smoothed over the unigram
    vocab: p = (c12 + 1) / (c1 + V). ONE distributed counting pass
    emits unigram and bigram partials together (unigram rows carry
    w2 = NULL)."""
    import math

    import pyarrow.compute as pc

    import ray

    tables = [
        t
        for t in ray.get(
            ds.map_batches(
                bigram_partials, batch_format="pyarrow", batch_size=None
            ).to_arrow_refs()
        )
        if t.num_rows
    ]
    if not tables:
        return {}
    merged = pa.TableGroupBy(
        pa.concat_tables(tables).combine_chunks(), ["w1", "w2"]
    ).aggregate([("n", "sum")])
    is_uni = pc.is_null(merged["w2"])
    uni = merged.filter(is_uni)
    big = merged.filter(pc.invert(is_uni))
    c1 = dict(zip(uni["w1"].to_pylist(), uni["n_sum"].to_pylist()))
    v = len(c1)
    if not v:
        return {}
    return {
        (a, b): math.log((n + 1) / (c1[a] + v))
        for a, b, n in zip(
            big["w1"].to_pylist(),
            big["w2"].to_pylist(),
            big["n_sum"].to_pylist(),
        )
    }


def make_bigram_scorer(model_ref):
    """Map-only pass: per doc, bigram count and average bigram ln-prob
    (6-dp rounded; 0.0 for docs with < 2 words)."""
    from ..functions.broadcast import cached_get

    def score(batch: pa.Table) -> pa.Table:
        model = cached_get(model_ref)
        n_big, lps = [], []
        for t in batch["text"].to_pylist():
            words = _RE_WORD.findall(t.lower())
            pairs = list(zip(words, words[1:]))
            n_big.append(len(pairs))
            lps.append(
                round6(sum(model[p] for p in pairs) / len(pairs))
                if pairs
                else 0.0
            )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_bigrams": pa.array(n_big, pa.int64()),
                "avg_logprob": pa.array(lps, pa.float64()),
            }
        )

    return score


# ---------------------------------------------------------- HyperLogLog

# 256 registers (p = 8): register = h % 256, rank source = h >> 8
# (56 bits). Rank rho = 1 + trailing zeros of those bits (57 when they
# are all zero) — trailing instead of the textbook leading zeros, which
# is an equivalent uniform-bit geometric under the fmix64-finalized
# hash and is EXACTLY reproducible in SQL via bit_count((v & -v) - 1),
# with no float log anywhere near the rank.
HLL_REGISTERS = 256
HLL_MAX_RHO = 57
# alpha_m * m^2 * 2^57: the numerator of the raw estimate over the
# integer-scaled denominator sum(2^(57 - rho_j)) — kept as an exact
# dyadic product so engine and SQL compute bit-identical doubles.
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_REGISTERS)
_HLL_NUM = _HLL_ALPHA * 65536.0 * float(1 << HLL_MAX_RHO)


def hll_rho(v):
    """rho per element of uint64 array v (the non-register hash bits):
    1 + trailing zeros, HLL_MAX_RHO when v == 0. The lowest set bit is
    isolated with v & -v; its exponent is read EXACTLY via frexp
    (powers of two are exact in float64; frexp(2^k) = (0.5, k+1), so
    the exponent IS 1 + trailing zeros — no correctly-rounded-log
    assumption)."""
    import numpy as np

    lowest = v & (~v + np.uint64(1))
    _, exp = np.frexp(lowest.astype(np.float64))
    rho = exp.astype(np.int64)
    rho[v == np.uint64(0)] = HLL_MAX_RHO
    return rho


def make_hll_partials():
    """documents batch -> per-(source, register) PARTIAL max-rho rows.
    Registers max-merge per batch first, so at most
    sources x 256 rows leave each batch regardless of batch size —
    the mergeable-sketch shape: the global merge is a tiny
    groupby(source, reg).max, never a vocabulary shuffle."""
    import numpy as np

    from ..functions.hashing import token_hashes64

    def partials(batch: pa.Table) -> pa.Table:
        per_source: dict[str, set] = {}
        for s, text in zip(
            batch["source"].to_pylist(), batch["text"].to_pylist()
        ):
            per_source.setdefault(s, set()).update(
                t for t in re.findall(r"\w+", text.lower())
            )
        out_s: list[str] = []
        out_r: list[int] = []
        out_rho: list[int] = []
        for s, words in per_source.items():
            h = token_hashes64(list(words))
            if not len(h):
                continue
            reg = (h % np.uint64(HLL_REGISTERS)).astype(np.int64)
            rho = hll_rho(h >> np.uint64(8))
            m = np.zeros(HLL_REGISTERS, np.int64)
            np.maximum.at(m, reg, rho)
            nz = np.nonzero(m)[0]
            out_s.extend([s] * len(nz))
            out_r.extend(int(i) for i in nz)
            out_rho.extend(int(x) for x in m[nz])
        return pa.table(
            {
                "source": pa.array(out_s, pa.string()),
                "reg": pa.array(out_r, pa.int64()),
                "rho": pa.array(out_rho, pa.int64()),
            }
        )

    return partials


def hll_estimate(rhos) -> float:
    """Final estimate from a source's 256 max-rho values (0 = empty
    register): raw = alpha*m^2 / sum(2^-rho) with the sum carried as
    the EXACT integer sum(2^(57-rho)) — float summation order can
    round differently across engines, exact integers can't — and the
    standard small-range linear-counting correction below 2.5m."""
    import math

    den = 0
    zeros = 0
    for r in rhos:
        den += 1 << (HLL_MAX_RHO - int(r))
        zeros += 1 if r == 0 else 0
    e_raw = _HLL_NUM / float(den)
    if zeros > 0 and e_raw <= 2.5 * HLL_REGISTERS:
        return HLL_REGISTERS * math.log(HLL_REGISTERS / zeros)
    return e_raw
