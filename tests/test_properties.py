"""Property-based tests (hypothesis) for the parity-critical invariants."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from gliner_cpp_ray.core.decoder import Span, greedy_search
from gliner_cpp_ray.core.splitter import WordSplitter
from gliner_cpp_ray.stages.dedup import char_shingles, jaccard
from tests.oracle_decoder import OSpan, greedy_search_oracle

_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=200
)


@settings(max_examples=200, deadline=None)
@given(_text)
def test_splitter_offsets_always_slice_back(text):
    s, e, w = WordSplitter()(text)
    raw = text.encode("utf-8")
    for a, b, tok in zip(s.tolist(), e.tolist(), w):
        assert raw[a:b].decode("utf-8") == tok
    # offsets are strictly increasing and non-overlapping
    assert all(x < y for x, y in zip(s.tolist(), e.tolist()))
    assert all(e.tolist()[i] <= s.tolist()[i + 1] for i in range(len(w) - 1))


@settings(max_examples=100, deadline=None)
@given(_text)
def test_splitter_covers_every_non_space_char(text):
    s, e, w = WordSplitter()(text)
    raw = text.encode("utf-8")
    covered = np.zeros(len(raw), dtype=bool)
    for a, b in zip(s.tolist(), e.tolist()):
        covered[a:b] = True
    # every byte outside tokens decodes to whitespace
    rest = bytes(raw[i] for i in range(len(raw)) if not covered[i])
    assert rest.decode("utf-8", "ignore").strip() == ""


_span = st.builds(
    lambda s, w, p: (s, s + w, p),
    st.integers(0, 30),
    st.integers(0, 10),
    st.floats(0.5, 1.0, allow_nan=False),
)


@settings(max_examples=300, deadline=None)
@given(st.lists(_span, max_size=12), st.booleans(), st.booleans())
def test_greedy_matches_oracle_on_any_span_sequence(spans, flat, multi):
    ours = [Span(a, b, "t", "x", p) for a, b, p in spans]
    theirs = [OSpan(a, b, "t", "x", p) for a, b, p in spans]
    got = greedy_search(ours, flat, multi)
    want = greedy_search_oracle(theirs, flat, multi)
    assert [(s.start, s.end, s.prob) for s in got] == [
        (s.start, s.end, s.prob) for s in want
    ]


@settings(max_examples=50, deadline=None)
@given(st.text(alphabet="ab cd", min_size=0, max_size=300))
def test_shingles_deterministic_and_set_semantics(text):
    a = char_shingles(text)
    b = char_shingles(text)
    assert np.array_equal(a, b)
    assert len(np.unique(a)) == len(a)  # deduplicated


def test_jaccard_bounds():
    x = {"a", "b", "c"}
    y = {"b", "c", "d"}
    assert 0.0 <= jaccard(x, y) <= 1.0
    assert jaccard(x, x) == 1.0
