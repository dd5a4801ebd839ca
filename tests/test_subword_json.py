"""A2/A3 without the wheel: pure-Python tokenizer.json encode.

Goldens are hand-derived from the PUBLIC algorithms the format names:
BERT WordPiece greedy longest-match, GPT-2 byte-level BPE merge loop,
SentencePiece Unigram Viterbi.  If the ``tokenizers`` wheel is present
(not in this sandbox), a parity test cross-checks against it.
"""

import json
import os

import pytest

from gliner_cpp_ray.core.subword import HFSubwordTokenizer
from gliner_cpp_ray.core.subword_json import PureSubwordTokenizer


def _write(tmp_path, spec):
    p = tmp_path / "tokenizer.json"
    p.write_text(json.dumps(spec))
    return str(p)


# --- WordPiece -----------------------------------------------------------

def _wordpiece_spec():
    vocab = {
        "[UNK]": 0, "[CLS]": 1, "[SEP]": 2,
        "un": 3, "##aff": 4, "##able": 5, "##ab": 6, "##le": 7,
        "kyiv": 8, "city": 9, "##s": 10, "a": 11,
    }
    return {
        "normalizer": {"type": "Lowercase"},
        "pre_tokenizer": {"type": "Whitespace"},
        "model": {
            "type": "WordPiece",
            "unk_token": "[UNK]",
            "continuing_subword_prefix": "##",
            "max_input_chars_per_word": 100,
            "vocab": vocab,
        },
    }


def test_wordpiece_greedy_longest_match(tmp_path):
    tok = PureSubwordTokenizer(_write(tmp_path, _wordpiece_spec()))
    # greedy longest-match: un + ##aff + ##able (not ##ab + ##le)
    assert tok.encode("unaffable") == [3, 4, 5]
    assert tok.encode("Kyiv") == [8]          # Lowercase normalizer
    assert tok.encode("citys") == [9, 10]
    assert tok.encode("zzz") == [0]            # whole-word UNK on any gap
    assert tok.encode("a") == [11]


def test_wordpiece_via_hf_wrapper_fallback(tmp_path):
    tok = HFSubwordTokenizer(_write(tmp_path, _wordpiece_spec()))
    assert tok.encode("unaffable") == [3, 4, 5]
    assert tok.encode("unaffable") == [3, 4, 5]  # memo path


# --- BPE -----------------------------------------------------------------

def test_bpe_merge_ranks(tmp_path):
    # vocab over chars + merged pieces; merges applied in rank order
    vocab = {"l": 0, "o": 1, "w": 2, "lo": 3, "low": 4, "e": 5, "r": 6, "er": 7}
    spec = {
        "model": {
            "type": "BPE",
            "vocab": vocab,
            "merges": ["l o", "lo w", "e r"],
        }
    }
    tok = PureSubwordTokenizer(_write(tmp_path, spec))
    assert tok.encode("low") == [4]        # l+o -> lo, lo+w -> low
    assert tok.encode("lower") == [4, 7]   # low + er
    assert tok.encode("wole") == [2, 1, 0, 5]  # no merges apply


def test_bpe_byte_level_prefix_space(tmp_path):
    # GPT-2 style: ByteLevel maps ' ' -> 'Ġ' (U+0120) with prefix space
    vocab = {"Ġ": 0, "a": 1, "b": 2, "Ġa": 3, "ab": 4}
    spec = {
        "pre_tokenizer": {"type": "ByteLevel", "add_prefix_space": True},
        "model": {"type": "BPE", "vocab": vocab, "merges": ["Ġ a", "a b"]},
    }
    tok = PureSubwordTokenizer(_write(tmp_path, spec))
    # " ab" -> bytes Ġ,a,b -> merge rank 0 (Ġ+a) first -> [Ġa, b]
    assert tok.encode("ab") == [3, 2]


# --- Unigram -------------------------------------------------------------

def _unigram_spec():
    # metaspace pre-tokenizer like DeBERTa/SentencePiece
    return {
        "pre_tokenizer": {
            "type": "Metaspace", "replacement": "▁", "prepend_scheme": "always",
        },
        "model": {
            "type": "Unigram",
            "unk_id": 0,
            "vocab": [
                ["<unk>", -10.0],
                ["▁", -2.0],
                ["▁hello", -5.0],
                ["▁hell", -4.0],
                ["o", -1.5],
                ["hel", -3.0],
                ["lo", -3.0],
            ],
        },
    }


def test_unigram_viterbi_max_likelihood(tmp_path):
    tok = PureSubwordTokenizer(_write(tmp_path, _unigram_spec()))
    # candidates for "▁hello":
    #   ▁hello            = -5.0
    #   ▁hell + o         = -4.0 + -1.5 = -5.5
    #   ▁ + hel + lo      = -2.0 + -3.0 + -3.0 = -8.0
    # Viterbi picks the single-piece segmentation
    assert tok.encode("hello") == [2]
    # "hell" -> ▁hell (-4.0) beats ▁+hel+l(unk)
    assert tok.encode("hell") == [3]


def test_unigram_unk_fusion(tmp_path):
    tok = PureSubwordTokenizer(_write(tmp_path, _unigram_spec()))
    # "▁xy": ▁ then two unknown chars -> ONE fused unk (SentencePiece
    # consecutive-unk fusion), not two
    assert tok.encode("xy") == [1, 0]


def test_unigram_byte_fallback(tmp_path):
    spec = _unigram_spec()
    spec["model"]["byte_fallback"] = True
    base = len(spec["model"]["vocab"])
    spec["model"]["vocab"] += [[f"<0x{b:02X}>", -12.0] for b in range(256)]
    tok = PureSubwordTokenizer(_write(tmp_path, spec))
    # the fused unknown segment "xy" becomes its UTF-8 byte tokens,
    # not a single <unk>
    assert tok.encode("xy") == [1, base + ord("x"), base + ord("y")]
    # multi-byte char: é = 0xC3 0xA9
    assert tok.encode("é") == [1, base + 0xC3, base + 0xA9]


def test_unigram_byte_fallback_missing_byte_token(tmp_path):
    spec = _unigram_spec()
    spec["model"]["byte_fallback"] = True  # but no <0xXX> vocab entries
    tok = PureSubwordTokenizer(_write(tmp_path, spec))
    # byte tokens absent from vocab -> falls back to the fused unk id
    assert tok.encode("xy") == [1, 0]


def test_normalizer_sequence_and_replace(tmp_path):
    spec = _wordpiece_spec()
    spec["normalizer"] = {
        "type": "Sequence",
        "normalizers": [
            {"type": "Lowercase"},
            {"type": "Replace", "pattern": {"String": "-"}, "content": ""},
        ],
    }
    tok = PureSubwordTokenizer(_write(tmp_path, spec))
    assert tok.encode("KY-IV") == [8]


def test_unsupported_model_type_raises(tmp_path):
    with pytest.raises(ValueError):
        PureSubwordTokenizer(_write(tmp_path, {"model": {"type": "WordLevel"}}))


def test_parity_with_hf_wheel_if_present(tmp_path):
    try:
        from tokenizers import Tokenizer  # noqa: F401
    except ImportError:
        pytest.skip("tokenizers wheel absent (expected in sandbox)")
    path = _write(tmp_path, _wordpiece_spec())
    hf = Tokenizer.from_file(path)
    pure = PureSubwordTokenizer(path)
    for w in ["unaffable", "Kyiv", "citys", "zzz", "a"]:
        assert pure.encode(w) == list(hf.encode(w, add_special_tokens=False).ids)


# ---------------------------------------------------------------------
# Checked-in-golden parity: broad-corpus encodings generated by the REAL
# rust-tokenizers wheel (tools/generate_goldens.py, run in a capable
# environment and committed) replayed against the pure-Python encoder.

_FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
_PARITY_JSON = os.path.join(_FIXTURES, "tokenizer_parity.json")
_TOKENIZER_GOLDEN = os.path.join(_FIXTURES, "tokenizer_golden.json")


@pytest.mark.skipif(
    not (os.path.exists(_PARITY_JSON) and os.path.exists(_TOKENIZER_GOLDEN)),
    reason=(
        "tokenizer_parity.json fixture absent — generate with "
        "tools/generate_goldens.py and commit tests/fixtures/"
    ),
)
def test_parity_against_checked_in_goldens():
    import json as _json

    with open(_PARITY_JSON) as f:
        fixture = _json.load(f)
    pure = PureSubwordTokenizer(_TOKENIZER_GOLDEN)
    for row in fixture["rows"]:
        assert pure.encode(row["text"]) == row["ids"], (
            f"divergence on probe {row['text']!r}"
        )
