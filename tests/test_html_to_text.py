"""HTML→text extraction: byte-identity invariant + unit behaviours."""

import numpy as np

from gliner_cpp_ray.sources.pages import make_expected_batch, make_page_batch
from gliner_cpp_ray.stages.html_to_text import extract_text, html_to_docs, normalize_text


def test_basic_extraction():
    html = (
        "<html><head><title>T</title><script>var x = '<p>no</p>';</script></head>"
        "<body><nav>Home | About</nav><main><h1>Title</h1>"
        "<p>Hello <b>world</b>.</p><p>Caf&eacute; &amp; more.</p></main>"
        "<footer>&copy; 2024</footer></body></html>"
    )
    assert extract_text(html) == "Title\nHello world.\nCafé & more."


def test_comments_and_malformed():
    html = "<body><!-- hidden <p>x</p> --><p>a<p>b<br>c</body>"
    assert extract_text(html) == "a\nb\nc"


def test_normalize_idempotent():
    s = "  a  \n\n\n b\n"
    assert normalize_text(s) == "a\nb"
    assert normalize_text(normalize_text(s)) == normalize_text(s)


def test_generator_byte_identity_500_pages():
    """The pipeline invariant: extract_text(html) == text per url, byte-for-byte."""
    idx = np.arange(500, dtype=np.int64)
    pages = make_page_batch(idx, seed=7)
    docs = html_to_docs(pages)
    for expected, got in zip(
        pages.column("text").to_pylist(), docs.column("text").to_pylist()
    ):
        assert got == expected
        assert got.encode("utf-8") == expected.encode("utf-8")


def test_generator_determinism_and_skew():
    idx = np.arange(400, dtype=np.int64)
    a = make_page_batch(idx, seed=7)
    b = make_page_batch(idx, seed=7)
    assert a.equals(b)
    c = make_page_batch(idx, seed=8)
    assert not a.equals(c)
    sizes = np.array([len(h) for h in a.column("html").to_pylist()])
    assert sizes.max() > 50 * np.median(sizes)  # long-tail skew present


def test_expected_triples_only_en():
    idx = np.arange(300, dtype=np.int64)
    exp = make_expected_batch(idx, seed=7)
    assert exp.num_rows > 0
    pages = make_page_batch(idx, seed=7)
    lang_by_url = dict(
        zip(pages.column("url").to_pylist(), pages.column("lang").to_pylist())
    )
    for u in exp.column("url").to_pylist():
        assert lang_by_url[u] == "en"
