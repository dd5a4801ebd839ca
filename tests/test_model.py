"""GlinerModel facade E2E with the deterministic gazetteer scorer.

Mirrors the reference golden E2E (/root/reference/tests/test.cpp:80-114)
— same text, labels, expected byte spans and ~0.9 prob — with the
deterministic stand-in scorer instead of the (unavailable) ONNX weights.
"""

import warnings

import pytest

from gliner_cpp_ray.config import GlinerConfig, TOKEN_LEVEL
from gliner_cpp_ray.core.model import GazetteerScoringModel, GlinerModel

GAZ = {
    "city": ["Kyiv", "Paris", "New York"],
    "country": ["Ukraine", "France"],
    "person": ["Marie Curie"],
}


@pytest.fixture
def model():
    return GlinerModel(GazetteerScoringModel(GAZ), GlinerConfig(max_width=12))


def test_kyiv_golden(model):
    out = model.inference(
        ["Kyiv is the capital of Ukraine."],
        ["city", "country", "river", "person", "car"],
    )
    spans = [(s.start, s.end, s.text, s.label) for s in out[0]]
    assert spans == [(0, 4, "Kyiv", "city"), (23, 30, "Ukraine", "country")]
    for s in out[0]:
        assert abs(s.prob - 0.9) < 0.1


def test_multiword_surface(model):
    out = model.inference(["Marie Curie was born in Paris ."], ["person", "city"])
    spans = [(s.text, s.label) for s in out[0]]
    assert ("Marie Curie", "person") in spans
    assert ("Paris", "city") in spans


def test_empty_inputs_warn_and_return_empty(model):
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert model.inference([], ["city"]) == []
        assert model.inference(["x"], []) == []
    assert len(w) == 2


def test_token_level_path():
    m = GlinerModel(
        GazetteerScoringModel(GAZ),
        GlinerConfig(max_width=12, model_type=TOKEN_LEVEL),
    )
    out = m.inference(["Kyiv is the capital of Ukraine."], ["city", "country"])
    spans = [(s.start, s.end, s.text, s.label) for s in out[0]]
    assert (0, 4, "Kyiv", "city") in spans
    assert (23, 30, "Ukraine", "country") in spans


def test_unicode_byte_offsets_e2e():
    m = GlinerModel(GazetteerScoringModel({"city": ["Київ"]}), GlinerConfig())
    text = "Столиця — Київ ."
    out = m.inference([text], ["city"])
    (s,) = out[0]
    assert s.text == "Київ"
    assert text.encode("utf-8")[s.start : s.end].decode("utf-8") == "Київ"


def test_lean_and_full_prep_paths_agree():
    """Skipping ONNX tensor assembly for the stub scorer must not change
    decoded spans (the decode depends only on tokens + logits)."""

    class FullPathGazetteer(GazetteerScoringModel):
        needs_encoding = True
        needs_span_grid = True

    texts = [
        "Kyiv is the capital of Ukraine.",
        "Marie Curie was born in Warsaw.",
        "nothing to see here",
    ]
    labels = ["city", "country", "person"]
    lean = GlinerModel(GazetteerScoringModel(GAZ), GlinerConfig())
    full = GlinerModel(FullPathGazetteer(GAZ), GlinerConfig())
    a = lean.inference(texts, labels)
    b = full.inference(texts, labels)
    assert [
        [(s.start, s.end, s.text, s.label, round(s.prob, 6)) for s in doc]
        for doc in a
    ] == [
        [(s.start, s.end, s.text, s.label, round(s.prob, 6)) for s in doc]
        for doc in b
    ]
