"""Unit tests for the byte-exact scalar text operators (FIXTURES.md F3),
including the reference's own smoke input (5_NLP/test_cleaning.py:3-11)."""

from pdf_to_text_ray.functions import scalar

REFERENCE_SAMPLE = """
This is   a sample document!!

It contains multiple     spaces, broken
words like exam-
ple, and some useless symbols • ✔ ~.

Contact: john@example.com
Visit: https://example.com
"""


def test_normalize_reference_sample():
    out = scalar.normalize_text(REFERENCE_SAMPLE)
    assert "example," in out  # hyphen-linebreak joined ("exam-\nple")
    assert "•" not in out and "✔" not in out and "~" not in out
    assert "  " not in out
    assert out == out.strip()
    assert out.islower() or not any(c.isalpha() and c.isupper() for c in out)


def test_normalize_hyphen_break():
    assert scalar.normalize_text("adopt-\ning") == "adopting"
    assert scalar.normalize_text("adopt- \n ing") == "adopting"


def test_normalize_empty():
    assert scalar.normalize_text("") == ""


def test_clean_text_urls_emails_punct():
    out = scalar.clean_text(
        "See https://example.com or www.foo.bar!! mail john@example.com..."
    )
    assert "http" not in out and "www" not in out and "@" not in out
    assert "!!" not in out and "..." not in out


def test_clean_text_non_ascii_and_whitelist():
    assert scalar.clean_text("héllo wörld") == "h llo w rld"
    assert scalar.clean_text("a&b (c)") == "a b c"


def test_clean_text_stopwords():
    out = scalar.clean_text("the cat and the hat", remove_stopwords=True)
    assert out == "cat hat"


def test_clean_raw_text():
    assert scalar.clean_raw_text("a\n\n\n\nb") == "a\n\nb"
    assert scalar.clean_raw_text("  a  \n b ") == "a\nb"


def test_ocr_whitelist_reference_fingerprint():
    # parens/ampersands stripped — the fingerprint visible in
    # 3_Extracted_Texts/Synopsis/page_10.txt ("Named Entity Recognition NER")
    assert (
        scalar.ocr_whitelist_clean("Named Entity Recognition (NER)")
        == "Named Entity Recognition NER"
    )
    assert scalar.ocr_whitelist_clean("R&D @ 100%") == "RD  100"
    assert scalar.ocr_whitelist_clean("keep .,!?;:'\"- these") == "keep .,!?;:'\"- these"


def test_meaningful_length_router_probe():
    # core_document_processing.py:73: len(re.sub(r'\s+','',text))
    assert scalar.meaningful_length("a b\nc\t d") == 4
    assert scalar.meaningful_length("   ") == 0


def test_split_into_sentences():
    assert scalar.split_into_sentences("A b. C d! E?") == ["A b.", "C d!", "E?"]
    assert scalar.split_into_sentences("") == []
    assert scalar.split_into_sentences("no terminator") == ["no terminator"]


# ---------------------------------------------- url canonicalization

def test_canonicalize_url_rules():
    from pdf_to_text_ray.functions.urlnorm import canonicalize_url as c

    assert c("https://Ex.COM/a#frag") == "https://ex.com/a"
    assert c("HTTPS://ex.com:443/a") == "https://ex.com/a"
    assert c("http://ex.com:80/a") == "http://ex.com/a"
    assert c("http://ex.com:8080/a") == "http://ex.com:8080/a"  # kept
    assert c("https://ex.com/a/") == "https://ex.com/a"
    assert c("https://ex.com/") == "https://ex.com/"  # root slash kept
    assert (
        c("https://ex.com/p?utm_source=x&b=2&a=1&gclid=g")
        == "https://ex.com/p?a=1&b=2"
    )
    assert c("https://ex.com/p?utm_source=x") == "https://ex.com/p"
    # idempotent
    assert c(c("https://EX.com:443/a/?z=1&utm_x=1#f")) == c(
        "https://EX.com:443/a/?z=1&utm_x=1#f"
    )


def test_decorate_then_canonicalize_recovers_base():
    from pdf_to_text_ray.functions.urlnorm import (
        canonicalize_url,
        decorate_url,
    )

    base = "https://site-7.example/doc/42"
    expect = {
        0: base,
        1: base,
        2: base + "?a=1&z=9",
        3: base,
        4: base + "?b=2",
    }
    for v in range(5):
        assert canonicalize_url(decorate_url(v, base)) == expect[v]


# ------------------------- vectorized batch twins (Arrow/RE2 kernels)

def test_batch_twins_match_row_functions_on_adversarial_unicode():
    """The Arrow-kernel batch twins must be byte-identical to the
    per-row Python source of truth on EVERY input — including the
    characters where RE2 and Python `re` disagree (\\x0b vertical tab,
    NBSP/em/ogham/ideographic spaces, U+2028/29 separators, NEL,
    zero-width space, NFKC-relevant ligature/case-fold codepoints)."""
    import random

    import pyarrow as pa

    rng = random.Random(7)
    alphabet = list("abcXYZ 019.?!,;:-\t\n\r\f\v@/'\"\\~") + [
        "•", "◦", "·", "▪", "▶", "►",
        "✓", "✔",
        " ", " ", " ", " ", " ", " ",
        "", "​", "　",
        "café", "ü", "ﬁ", "İ", "…",
        "http://", "www.", "a@b",
    ]
    cases = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 80)))
        for _ in range(800)
    ] + ["", "   ", "a-\n b", "x\n\n\ny", "multi?!.. chains!!!"]
    col = pa.array(cases, pa.string())
    for batch, row in [
        (scalar.normalize_text_batch, scalar.normalize_text),
        (scalar.clean_text_batch, scalar.clean_text),
        (scalar.ocr_whitelist_clean_batch, scalar.ocr_whitelist_clean),
    ]:
        got = batch(col).to_pylist()
        for s, g in zip(cases, got):
            assert g == row(s), (batch.__name__, repr(s))
    n, joined = scalar.sentence_split_batch(col)
    for s, nn, jj in zip(cases, n.to_pylist(), joined.to_pylist()):
        sents = scalar.split_into_sentences(s)
        assert nn == len(sents), repr(s)
        assert jj == "\x1f".join(sents), repr(s)
