"""Byte-exact scalar text operators.

Each function reproduces one reference transform (file:line cites into
/root/reference/). All regexes are compiled at module import so a Ray
worker pays the compile cost once per process, not per batch. The
functions are pure — same input bytes, same output bytes, under any
parallelism — which is what makes the whole pipeline deterministic
(SURVEY.md §7 hard part 1).
"""

from __future__ import annotations

import re
import unicodedata

# --- normalize_text (5_NLP/nlp/normalize.py:6-26) ---
_RE_HYPHEN_BREAK = re.compile(r"-\s*\n\s*")
_RE_MULTI_NEWLINE = re.compile(r"\n\s*\n+")
_RE_OCR_GLYPHS = re.compile(r"[•◦·▪▶►✓✔~]")
_RE_WS = re.compile(r"\s+")


def normalize_text(text: str) -> str:
    """NFKC → lowercase → join hyphen-linebreak splits → collapse blank
    lines → strip OCR bullet glyphs → collapse whitespace → trim.

    Reference: 5_NLP/nlp/normalize.py:6-26 (byte-exact port).
    """
    text = unicodedata.normalize("NFKC", text)
    text = text.lower()
    text = _RE_HYPHEN_BREAK.sub("", text)
    text = _RE_MULTI_NEWLINE.sub("\n", text)
    text = _RE_OCR_GLYPHS.sub("", text)
    text = _RE_WS.sub(" ", text)
    return text.strip()


# --- clean_text (5_NLP/nlp/cleaning.py:9-34) ---
_RE_NON_ASCII = re.compile(r"[^\x00-\x7F]+")
_RE_URL = re.compile(r"http\S+|www\S+")
_RE_EMAIL = re.compile(r"\S+@\S+")
_RE_MULTI_PUNCT = re.compile(r"([!?.,]){2,}")
_RE_SPECIAL = re.compile(r"[^a-zA-Z0-9\s\.\?\!]")

# Frozen English stopword set (NLTK's english list, public); the reference
# loads it from nltk at module level (cleaning.py:7). Kept as a constant so
# the sandbox needs no nltk download and the op stays deterministic.
STOPWORDS = frozenset(
    """a about above after again against ain all am an and any are aren aren't as at be
because been before being below between both but by can couldn couldn't d did didn
didn't do does doesn doesn't doing don don't down during each few for from further
had hadn hadn't has hasn hasn't have haven haven't having he her here hers herself
him himself his how i if in into is isn isn't it it's its itself just ll m ma me
mightn mightn't more most mustn mustn't my myself needn needn't no nor not now o of
off on once only or other our ours ourselves out over own re s same shan shan't she
she's should should've shouldn shouldn't so some such t than that that'll the their
theirs them themselves then there these they this those through to too under until
up ve very was wasn wasn't we were weren weren't what when where which while who
whom why will with won won't wouldn wouldn't y you you'd you'll you're you've your
yours yourself yourselves""".split()
)


def clean_text(text: str, remove_stopwords: bool = False) -> str:
    """Strip non-ASCII, URLs, emails; collapse repeated punctuation;
    whitelist ``[a-zA-Z0-9\\s.?!]``; optional stopword removal; collapse
    spaces.

    Reference: 5_NLP/nlp/cleaning.py:9-34 (byte-exact port).
    """
    text = _RE_NON_ASCII.sub(" ", text)
    text = _RE_URL.sub("", text)
    text = _RE_EMAIL.sub("", text)
    text = _RE_MULTI_PUNCT.sub(r"\1", text)
    text = _RE_SPECIAL.sub(" ", text)
    if remove_stopwords:
        tokens = [t for t in text.split() if t not in STOPWORDS]
        text = " ".join(tokens)
    return _RE_WS.sub(" ", text).strip()


# --- _clean_raw_text (2_OpenCV_OCR/core_document_processing.py:185-194) ---
_RE_3PLUS_NEWLINES = re.compile(r"\n\s*\n\s*\n+")


def clean_raw_text(text: str) -> str:
    """Collapse ≥3 newlines to 2 and strip each line.

    Reference: core_document_processing.py:185-194.
    """
    text = _RE_3PLUS_NEWLINES.sub("\n\n", text)
    return "\n".join(line.strip() for line in text.split("\n"))


# --- Tesseract post-OCR whitelist (2_OpenCV_OCR/ocr_engine.py:30) ---
_RE_OCR_WHITELIST = re.compile(r"[^A-Za-z0-9.,!?;:\'\"\\\-\s]")


def ocr_whitelist_clean(text: str) -> str:
    """Drop every char outside the Tesseract whitelist, then strip.

    Reference: ocr_engine.py:30-33 — this regex's fingerprint is visible
    in the committed goldens (parens stripped in
    3_Extracted_Texts/Synopsis/page_10.txt).
    """
    return _RE_OCR_WHITELIST.sub("", text).strip()


# --- meaningful-length probe (core_document_processing.py:73) ---
def meaningful_length(text: str) -> int:
    """Whitespace-stripped character count used by the 250-char router."""
    return len(_RE_WS.sub("", text))


def collapse_whitespace(text: str) -> str:
    """``re.sub(r'\\s+', ' ', t).strip()`` — shared tail of normalize/clean."""
    return _RE_WS.sub(" ", text).strip()


# --- sentence splitter (5_NLP/nlp/sentence_splitter.py:12-17) ---
# The reference uses spaCy if present else nltk.sent_tokenize; neither is in
# the sandbox, so this is the deterministic fallback: split on ., !, ?
# followed by whitespace, keeping the punctuation.
_RE_SENT = re.compile(r"(?<=[.!?])\s+")


def split_into_sentences(text: str) -> list[str]:
    text = text.strip()
    if not text:
        return []
    return [s for s in _RE_SENT.split(text) if s]


# ---------------------------------------------------------------------------
# Vectorized batch twins (pyarrow.compute / RE2 kernels)
#
# The per-row Python functions above are the semantic source of truth;
# these run the same transform chains as Arrow kernels over whole
# columns. RE2 and Python `re` agree ONLY on ASCII input (`\s` is
# Unicode in Python, ASCII in RE2; NFKC is a no-op on ASCII), so each
# batch twin runs the Arrow chain for every row and then REDOES the
# non-ASCII rows through the per-row Python function — byte-exact
# equality on arbitrary input, Arrow speed on the (dominant) ASCII
# bulk. clean_text is the exception: its FIRST step replaces every
# non-ASCII run with a space under identical Python/RE2 semantics
# (explicit \x00-\x7F class over codepoints), so the whole chain is
# RE2-exact with no fallback. Equality is pinned by
# tests/test_differential.py on adversarial Unicode corpora.
# ---------------------------------------------------------------------------

def _pc():
    import pyarrow.compute as pc

    return pc


# Python's ASCII whitespace set, spelled out: RE2's \s is [\t\n\f\r ]
# and EXCLUDES \v (vertical tab), so even on pure-ASCII rows a literal
# \s in an Arrow pattern would diverge from the Python row functions.
_WS_CLS = " \\t\\n\\r\\f\\v"


def _ascii_fixup(col, arrow_out, row_fn):
    """Overwrite ``arrow_out`` rows whose INPUT is non-ASCII with the
    per-row Python result. Zero Python-level work on all-ASCII batches
    beyond one vectorized mask reduction."""
    import pyarrow as pa

    pc = _pc()
    mask = pc.equal(pc.binary_length(col), pc.utf8_length(col))
    if pc.min(mask).as_py() in (True, None):  # all ASCII (or empty)
        return arrow_out
    out = arrow_out.to_pylist()
    src = col.to_pylist()
    for i, ok in enumerate(mask.to_pylist()):
        if not ok:
            out[i] = row_fn(src[i])
    return pa.array(out, pa.string())


def normalize_text_batch(col):
    """Column twin of normalize_text: Arrow kernel chain (NFKC is
    identity on the ASCII rows the chain is valid for; non-ASCII rows
    fall back to the Python row function)."""
    pc = _pc()
    x = pc.utf8_lower(col)
    x = pc.replace_substring_regex(
        x, pattern=rf"-[{_WS_CLS}]*\n[{_WS_CLS}]*", replacement=""
    )
    x = pc.replace_substring_regex(
        x, pattern=rf"\n[{_WS_CLS}]*\n+", replacement="\n"
    )
    x = pc.replace_substring_regex(
        x, pattern=r"[•◦·▪▶►✓✔~]", replacement=""
    )
    x = pc.replace_substring_regex(
        x, pattern=rf"[{_WS_CLS}]+", replacement=" "
    )
    x = pc.utf8_trim(x, characters=" \t\n\r\f\v")
    return _ascii_fixup(col, x, normalize_text)


def clean_text_batch(col):
    """Column twin of clean_text (remove_stopwords=False). RE2-exact
    for ALL input: step 1 maps every non-ASCII codepoint run to one
    space (identical under Python re and RE2), so the later \\s / \\S
    classes only ever see ASCII."""
    pc = _pc()
    nws = rf"[^{_WS_CLS}]"  # Python \S over the post-step-1 ASCII text
    x = pc.replace_substring_regex(
        col, pattern=r"[^\x00-\x7F]+", replacement=" "
    )
    x = pc.replace_substring_regex(
        x, pattern=rf"http{nws}+|www{nws}+", replacement=""
    )
    x = pc.replace_substring_regex(
        x, pattern=rf"{nws}+@{nws}+", replacement=""
    )
    x = pc.replace_substring_regex(
        x, pattern=r"([!?.,]){2,}", replacement="\\1"
    )
    x = pc.replace_substring_regex(
        x, pattern=rf"[^a-zA-Z0-9{_WS_CLS}.?!]", replacement=" "
    )
    x = pc.replace_substring_regex(
        x, pattern=rf"[{_WS_CLS}]+", replacement=" "
    )
    return pc.utf8_trim(x, characters=" \t\n\r\f\v")


def ocr_whitelist_clean_batch(col):
    """Column twin of ocr_whitelist_clean (ASCII fast path + Python
    fallback for rows where Unicode \\s membership could differ)."""
    pc = _pc()
    x = pc.replace_substring_regex(
        col,
        pattern=rf"[^A-Za-z0-9.,!?;:\'\"\\\-{_WS_CLS}]",
        replacement="",
    )
    x = pc.utf8_trim(x, characters=" \t\n\r\f\v")
    return _ascii_fixup(col, x, ocr_whitelist_clean)


def sentence_split_batch(col):
    """Column twin of split_into_sentences, returning
    (n_sentences int64 array, US-joined sentences string array).
    Marking `([.!?])\\s+` -> `\\1\\x1f` after a strip produces exactly
    the filtered-split segments (no empty segment can occur: a
    separator match cannot start where the previous one ended, and the
    strip removes edge whitespace), so the joined string IS the
    replaced string and the count is #US + (1 if non-empty)."""
    import pyarrow as pa

    pc = _pc()
    stripped = pc.utf8_trim(col, characters=" \t\n\r\f\v")
    joined = pc.replace_substring_regex(
        stripped, pattern=rf"([.!?])[{_WS_CLS}]+", replacement="\\1\x1f"
    )
    joined = _ascii_fixup(
        col, joined, lambda s: "\x1f".join(split_into_sentences(s))
    )
    n = pc.add(
        pc.cast(pc.count_substring(joined, "\x1f"), pa.int64()),
        pc.cast(pc.not_equal(joined, ""), pa.int64()),
    )
    return n, joined
