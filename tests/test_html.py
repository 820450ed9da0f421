"""HTML main-content extraction: happy path, link-density boilerplate,
malformed markup, multi-paragraph articles."""

from pdf_to_text_ray.sources.synth import (
    make_html_boiler,
    make_html_malformed,
    make_html_simple,
)
from pdf_to_text_ray.stages.html_extract import extract_main_content

TEXT = "the quick brown fox jumps over the lazy dog again and again today"


def test_simple_round_trip():
    got, ok = extract_main_content(make_html_simple(1, TEXT))
    assert ok and got == TEXT


def test_boiler_round_trip():
    got, ok = extract_main_content(make_html_boiler(1, TEXT))
    assert ok and got == TEXT


def test_malformed_round_trip():
    got, ok = extract_main_content(make_html_malformed(1, TEXT))
    assert ok and got == TEXT


def test_short_content_still_beats_boilerplate():
    short = "tiny page"
    for maker in (make_html_simple, make_html_boiler, make_html_malformed):
        got, ok = extract_main_content(maker(2, short))
        assert ok and got == short, maker.__name__


def test_multi_paragraph_article():
    html = (
        b"<html><body><nav><a href='/'>Home</a></nav>"
        b"<article><p>first paragraph of content here</p>"
        b"<p>second paragraph with more words in it</p></article>"
        b"<footer><a href='/x'>links</a></footer></body></html>"
    )
    got, ok = extract_main_content(html)
    assert ok
    assert got == (
        "first paragraph of content here\n\n"
        "second paragraph with more words in it"
    )


def test_entities_unescaped():
    html = b"<html><body><p>fish &amp; chips &lt;3</p></body></html>"
    got, ok = extract_main_content(html)
    assert ok and got == "fish & chips <3"


def test_script_style_dropped():
    html = (
        b"<html><head><style>p{color:red}</style></head><body>"
        b"<script>var x = 'not content at all really';</script>"
        b"<p>real content sentence with several words</p></body></html>"
    )
    got, ok = extract_main_content(html)
    assert ok and got == "real content sentence with several words"


def test_link_dense_block_loses():
    html = (
        b"<html><body><div><a>one</a> <a>two</a> <a>three</a> <a>four</a>"
        b"<a>five</a> <a>six seven eight nine ten eleven twelve</a></div>"
        b"<div>plain content text</div></body></html>"
    )
    got, ok = extract_main_content(html)
    assert ok and got == "plain content text"


def test_empty_and_boilerplate_only():
    got, ok = extract_main_content(b"<html><body></body></html>")
    assert not ok and got == ""
    got, ok = extract_main_content(
        b"<html><body><nav><a>x</a></nav></body></html>"
    )
    assert not ok and got == ""
