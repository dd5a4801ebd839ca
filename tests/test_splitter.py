"""Word-splitter goldens from /root/reference/tests/test.cpp:17-39,116-148."""

from gliner_cpp_ray.core.splitter import WordSplitter


def _split(text):
    s, e, w = WordSplitter()(text)
    return list(zip(s.tolist(), e.tolist(), w))


def test_golden_ascii():
    assert _split("Hello world_this-is a_test!") == [
        (0, 5, "Hello"),
        (6, 19, "world_this-is"),
        (20, 26, "a_test"),
        (26, 27, "!"),
    ]


def test_golden_unicode_byte_offsets():
    text = "你好 (Chinese), नमस्ते (Hindi), مرحبا (Arabic)"
    assert _split(text) == [
        (0, 6, "你好"),
        (7, 8, "("),
        (8, 15, "Chinese"),
        (15, 16, ")"),
        (16, 17, ","),
        (18, 36, "नमस्ते"),
        (37, 38, "("),
        (38, 43, "Hindi"),
        (43, 44, ")"),
        (44, 45, ","),
        (46, 56, "مرحبا"),
        (57, 58, "("),
        (58, 64, "Arabic"),
        (64, 65, ")"),
    ]


def test_empty_and_whitespace():
    assert _split("") == []
    assert _split("   \n\t ") == []


def test_offsets_are_bytes_and_sliceable():
    text = "naïve café — ok"
    for s, e, w in _split(text):
        assert text.encode("utf-8")[s:e].decode("utf-8") == w
