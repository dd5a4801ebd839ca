#!/usr/bin/env python
"""Generate checked-in weights-level golden fixtures (run OUTSIDE the
sandbox, in any environment with the ``tokenizers`` and ``onnxruntime``
wheels plus the gliner_small-v2.1 files, then commit the outputs).

Two fixtures land under tests/fixtures/:

1. ``tokenizer_parity.json`` — real rust-``tokenizers`` encodings for a
   broad multilingual probe corpus against a given tokenizer.json (which
   is copied alongside as ``tokenizer_golden.json``).  Consumed by
   tests/test_subword_json.py::test_parity_against_checked_in_goldens,
   which asserts the pure-Python subword encoder reproduces every id
   sequence WITHOUT the wheel.

2. ``kyiv_logits.npz`` — the exact ONNX feed tensors our processor
   builds for the reference golden sentence (tests/test.cpp:80-114 in
   GLiNER.cpp: "Kyiv is the capital of Ukraine." x {city, country,
   river, person, car}) plus the raw logits a real
   gliner_small-v2.1 session returns for them.  Consumed by
   tests/test_real_onnx_golden.py::test_kyiv_golden_replayed_from_fixture,
   which (a) rebuilds the feeds wheel-free and asserts bit-identity,
   then (b) replays the recorded logits through decode_span_batch and
   asserts the reference's golden spans — pinning the full A6-A13 chain
   on real numbers without onnxruntime.

Usage:
    python tools/generate_goldens.py \
        --model /path/to/gliner_small-v2.1/onnx/model.onnx \
        --tokenizer /path/to/gliner_small-v2.1/tokenizer.json
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "fixtures",
)

# Broad probe corpus for tokenizer parity: scripts, diacritics, digits,
# punctuation runs, whitespace shapes, long compounds, byte-fallback
# candidates.  Deterministic — the fixture records (text, ids) pairs.
PROBE_TEXTS = [
    "Kyiv is the capital of Ukraine.",
    "unaffable antidisestablishmentarianism",
    "naïve café entrepôt Zürich São Paulo",
    "Die Donaudampfschifffahrtsgesellschaft wurde 1829 gegründet.",
    "価格は1,234円です。東京都渋谷区。",
    "Привет, мир! Это проверка кириллицы.",
    "مرحبا بالعالم هذا اختبار",
    "हिन्दी में एक परीक्षण वाक्य",
    "한국어 토큰화 테스트 문장입니다",
    "C'est l'été — où étais-tu ?",
    "e=mc^2; f(x)=3.14*x**2 // O(n log n)",
    "https://example.com/p/00001234?q=a&b=2#frag",
    "snake_case camelCase kebab-case PascalCase",
    "    leading spaces\tand\ttabs\nand newlines  ",
    "emoji 🙂 test 🚀🔥 sequence",
    "ﬁligree ﬂoral ﬀ ligatures",  # compatibility-normalization probes
    "１２３ fullwidth ＡＢＣ digits",
    "a" * 300,  # long single-word
    "word " * 200,  # long many-word
    "Mixed язык 言語 لغة language वाक्य 文",
]

TEXT = "Kyiv is the capital of Ukraine."
LABELS = ["city", "country", "river", "person", "car"]


def gen_tokenizer_parity(tokenizer_json: str) -> None:
    from tokenizers import Tokenizer

    tok = Tokenizer.from_file(tokenizer_json)
    rows = [
        {
            "text": t,
            "ids": list(tok.encode(t, add_special_tokens=False).ids),
        }
        for t in PROBE_TEXTS
    ]
    os.makedirs(FIXTURES, exist_ok=True)
    shutil.copyfile(
        tokenizer_json, os.path.join(FIXTURES, "tokenizer_golden.json")
    )
    with open(os.path.join(FIXTURES, "tokenizer_parity.json"), "w") as f:
        json.dump({"source": os.path.basename(tokenizer_json), "rows": rows}, f)
    print(f"wrote tokenizer_parity.json ({len(rows)} probes)")


def gen_kyiv_logits(model_path: str, tokenizer_json: str) -> None:
    import onnxruntime as ort

    from gliner_cpp_ray.config import GlinerConfig
    from gliner_cpp_ray.core.processor import GlinerProcessor
    from gliner_cpp_ray.core.subword import HFSubwordTokenizer

    cfg = GlinerConfig(max_width=12, max_length=512)  # test.cpp:86
    proc = GlinerProcessor(cfg, HFSubwordTokenizer(tokenizer_json))
    batch = proc.prepare_batch([TEXT], LABELS)

    feeds = {
        "input_ids": batch.input_ids,
        "attention_mask": batch.attention_mask,
        "words_mask": batch.words_mask,
        "text_lengths": batch.text_lengths,
        "span_idx": batch.span_idx,
        "span_mask": batch.span_mask,
    }
    sess = ort.InferenceSession(model_path, providers=["CPUExecutionProvider"])
    (logits,) = sess.run(["logits"], feeds)

    os.makedirs(FIXTURES, exist_ok=True)
    np.savez_compressed(
        os.path.join(FIXTURES, "kyiv_logits.npz"),
        logits=np.asarray(logits, dtype=np.float32).ravel(),
        **{k: np.asarray(v) for k, v in feeds.items()},
    )
    print(f"wrote kyiv_logits.npz (logits size {np.asarray(logits).size})")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True, help="gliner onnx model path")
    ap.add_argument("--tokenizer", required=True, help="tokenizer.json path")
    args = ap.parse_args()
    gen_tokenizer_parity(args.tokenizer)
    gen_kyiv_logits(args.model, args.tokenizer)


if __name__ == "__main__":
    main()
