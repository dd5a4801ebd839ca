"""SentencePiece Precompiled charsmap: builder↔interpreter roundtrip and
the grapheme-segmented transduction semantics (HF spm_precompiled, the
path tokenizers-cpp runs for the reference's Unigram tokenizers)."""

import base64

import pytest

from gliner_cpp_ray.core.charsmap import (
    Precompiled,
    build_precompiled,
    precompiled_from_b64,
)


def _cm(mappings):
    return Precompiled(build_precompiled(mappings))


def test_common_prefix_search_all_prefixes():
    cm = _cm({"ab": "1", "abc": "2", "b": "3"})
    hits = cm.common_prefix_search(b"abcd")
    lengths = [l for l, _ in hits]
    assert lengths == [2, 3]
    assert cm._replacement(hits[0][1]) == "1"
    assert cm._replacement(hits[1][1]) == "2"
    assert cm.common_prefix_search(b"zzz") == []


def test_exact_transduce_requires_full_match():
    cm = _cm({"ab": "X"})
    assert cm.transduce("ab") == "X"
    assert cm.transduce("a") is None      # prefix of a key, not a key
    assert cm.transduce("abc") is None    # key is a strict prefix


def test_normalize_fullwidth_and_ligatures():
    cm = _cm({"Ａ": "A", "ﬁ": "fi", "…": "...", "℡": "TEL"})
    assert cm.normalize("Ａﬁx…℡") == "Afix...TEL"
    # unmapped text passes through byte-identically
    assert cm.normalize("hello, 世界") == "hello, 世界"
    assert cm.normalize("") == ""


def test_small_grapheme_matches_whole_cluster_first():
    # e + COMBINING ACUTE is one 3-byte grapheme (< 6): the whole-cluster
    # entry must win over the per-char entry for "e".
    cm = _cm({"é": "E", "e": "X"})
    assert cm.normalize("é") == "E"
    assert cm.normalize("e") == "X"


def test_large_grapheme_falls_back_to_per_char():
    # 3-byte base + two combining marks = 7 UTF-8 bytes >= 6: the cluster
    # is transduced char by char, so only the base char maps.
    g = "あ́̂"
    assert len(g.encode("utf-8")) >= 6
    cm = _cm({"あ": "A", g: "WHOLE"})
    assert cm.normalize(g) == "Á̂"


def test_multibyte_keys_and_pool_offsets():
    # many keys exercise first-fit slot placement and pool indexing
    mappings = {chr(0xFF21 + i): chr(ord("A") + i) for i in range(26)}
    mappings["　"] = " "  # ideographic space
    cm = _cm(mappings)
    assert cm.normalize("ＡＢＣ　ＺZ") == "ABC ZZ"


def test_b64_cache_and_normalizer_integration():
    blob = build_precompiled({"Ｑ": "Q"})
    b64 = base64.b64encode(blob).decode("ascii")
    assert precompiled_from_b64(b64) is precompiled_from_b64(b64)

    from gliner_cpp_ray.core.subword_json import _apply_normalizer

    spec = {"type": "Precompiled", "precompiled_charsmap": b64}
    assert _apply_normalizer(spec, "Ｑx") == "Qx"
    seq = {"type": "Sequence", "normalizers": [spec, {"type": "Lowercase"}]}
    assert _apply_normalizer(seq, "ＱX") == "qx"


def test_malformed_blob_rejected():
    with pytest.raises(ValueError):
        Precompiled(b"\x01")
    with pytest.raises(ValueError):
        Precompiled(b"\xff\xff\xff\x7f" + b"0000")
