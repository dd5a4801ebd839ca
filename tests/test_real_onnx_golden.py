"""Guarded real-ONNX-weights golden E2E (reference tests/test.cpp:80-114).

The sandbox ships neither the ``onnxruntime`` wheel nor the
``gliner_small-v2.1`` model files, so this module SKIPS there — but the
day an ONNX-capable environment appears, pointing

    GLINER_ONNX_MODEL=/path/to/gliner_small-v2.1/onnx/model.onnx
    GLINER_TOKENIZER_JSON=/path/to/gliner_small-v2.1/tokenizer.json

at real weights runs the exact Kyiv/Ukraine golden of the reference:
``"Kyiv is the capital of Ukraine."`` x labels {city, country, river,
person, car} must yield precisely ``{0,4,"Kyiv","city",~0.9}`` and
``{23,30,"Ukraine","country",~0.9}`` with the reference's 0.1 prob
tolerance (tests/test.cpp:70-78).  Until then A10's real-weights
numeric parity stays honestly unexecuted; the feed contract itself is
covered wheel-free in tests/test_onnx_path.py.
"""

import os

import pytest

MODEL_PATH = os.environ.get("GLINER_ONNX_MODEL", "")
TOKENIZER_PATH = os.environ.get("GLINER_TOKENIZER_JSON", "") or (
    # HF layout: tokenizer.json sits two levels above onnx/model.onnx
    os.path.join(os.path.dirname(os.path.dirname(MODEL_PATH)), "tokenizer.json")
    if MODEL_PATH
    else ""
)

try:  # pragma: no cover - wheel absent in sandbox
    import onnxruntime  # noqa: F401

    HAVE_ORT = True
except ImportError:
    HAVE_ORT = False

requires_real_weights = pytest.mark.skipif(
    not (
        HAVE_ORT
        and MODEL_PATH
        and os.path.exists(MODEL_PATH)
        and os.path.exists(TOKENIZER_PATH)
    ),
    reason=(
        "real-weights golden needs the onnxruntime wheel plus "
        "GLINER_ONNX_MODEL / GLINER_TOKENIZER_JSON pointing at "
        "gliner_small-v2.1 files (absent in this sandbox)"
    ),
)

# Golden expectations, verbatim from /root/reference/tests/test.cpp:81-85
GOLDEN = [
    (0, 4, "Kyiv", "city", 0.9),
    (23, 30, "Ukraine", "country", 0.9),
]
TEXT = "Kyiv is the capital of Ukraine."
LABELS = ["city", "country", "river", "person", "car"]
PROB_TOL = 0.1  # test.cpp:76


@requires_real_weights
def test_kyiv_ukraine_golden_real_weights():  # pragma: no cover - needs wheel
    from gliner_cpp_ray.config import GlinerConfig
    from gliner_cpp_ray.core.model import GlinerModel, OnnxScoringModel
    from gliner_cpp_ray.core.subword import HFSubwordTokenizer

    model = GlinerModel(
        OnnxScoringModel(model_path=MODEL_PATH),
        GlinerConfig(max_width=12, max_length=512),  # test.cpp:86
        HFSubwordTokenizer(TOKENIZER_PATH),
    )
    (spans,) = model.inference([TEXT], LABELS)
    assert len(spans) == len(GOLDEN)
    for span, (start, end, text, label, prob) in zip(spans, GOLDEN):
        assert span.start == start
        assert span.end == end
        assert span.text == text
        assert span.label == label
        assert abs(span.prob - prob) < PROB_TOL


@requires_real_weights
def test_kyiv_golden_through_ner_actor_pool(
    ray_session, tmp_path
):  # pragma: no cover - needs wheel
    """Same golden through the distributed surface: the Ray actor-pool
    NER stage with a real ORT session must emit the two golden mentions
    as rows."""
    import pandas as pd
    import ray.data as rd

    from gliner_cpp_ray.stages.ner import GlinerNERStage

    ds = rd.from_pandas(
        pd.DataFrame({"doc_id": ["d1"], "url": ["u1"], "text": [TEXT]})
    )
    out = (
        ds.map_batches(
            GlinerNERStage,
            fn_constructor_kwargs={
                "labels": LABELS,
                "max_width": 12,
                "tokenizer_json": TOKENIZER_PATH,
                "onnx_path": MODEL_PATH,
            },
            batch_format="pyarrow",
            concurrency=1,
        )
        .to_pandas()
        .sort_values("start")
        .reset_index(drop=True)
    )
    assert len(out) == len(GOLDEN)
    for i, (start, end, text, label, prob) in enumerate(GOLDEN):
        row = out.iloc[i]
        assert (row["start"], row["end"], row["text"], row["label"]) == (
            start,
            end,
            text,
            label,
        )
        assert abs(row["prob"] - prob) < PROB_TOL


# ---------------------------------------------------------------------
# Fixture-replay path: runs WITHOUT wheels once tests/fixtures/ holds the
# outputs of tools/generate_goldens.py (produced in any onnxruntime-
# capable environment and committed).  Pins A6-A13 on REAL logits.

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
KYIV_NPZ = os.path.join(FIXTURES, "kyiv_logits.npz")
TOKENIZER_GOLDEN = os.path.join(FIXTURES, "tokenizer_golden.json")

requires_fixture = pytest.mark.skipif(
    not (os.path.exists(KYIV_NPZ) and os.path.exists(TOKENIZER_GOLDEN)),
    reason=(
        "kyiv_logits.npz fixture absent — generate with "
        "tools/generate_goldens.py in an onnxruntime-capable environment "
        "and commit tests/fixtures/"
    ),
)


@requires_fixture
def test_kyiv_golden_replayed_from_fixture():
    """Wheel-free weights-level parity: (a) our processor + pure-Python
    tokenizer must rebuild the recorded ONNX feeds bit-for-bit, and
    (b) the recorded REAL logits replayed through decode_span_batch must
    yield the reference golden spans (tests/test.cpp:80-114)."""
    import numpy as np

    from gliner_cpp_ray.config import GlinerConfig
    from gliner_cpp_ray.core.decoder import decode_span_batch
    from gliner_cpp_ray.core.processor import GlinerProcessor
    from gliner_cpp_ray.core.subword import HFSubwordTokenizer

    rec = np.load(KYIV_NPZ)
    cfg = GlinerConfig(max_width=12, max_length=512)
    proc = GlinerProcessor(cfg, HFSubwordTokenizer(TOKENIZER_GOLDEN))
    batch = proc.prepare_batch([TEXT], LABELS)

    for name, ours in [
        ("input_ids", batch.input_ids),
        ("attention_mask", batch.attention_mask),
        ("words_mask", batch.words_mask),
        ("text_lengths", batch.text_lengths),
        ("span_idx", batch.span_idx),
        ("span_mask", batch.span_mask),
    ]:
        np.testing.assert_array_equal(
            np.asarray(ours), rec[name], err_msg=f"feed {name} diverged"
        )

    (spans,) = decode_span_batch(
        batch, [TEXT], LABELS, rec["logits"], flat_ner=True, threshold=0.5
    )
    assert len(spans) == len(GOLDEN)
    for span, (start, end, text, label, prob) in zip(spans, GOLDEN):
        assert (span.start, span.end, span.text, span.label) == (
            start, end, text, label,
        )
        assert abs(span.prob - prob) < PROB_TOL
