"""gliner_cpp_ray — a Ray-Data-native knowledge-graph construction engine.

Extraction core reproduces GLiNER.cpp's zero-shot span-NER semantics
(word splitting, prompt encoding, span enumeration, sigmoid scoring,
greedy non-overlap decoding — see ``gliner_cpp_ray.core``), embedded in a
web-scale Ray Data pipeline: HTML→text → NER → relation extraction →
entity linking → canonicalization → edge/node Parquet materialization.

Reference: Knowledgator/GLiNER.cpp (public, surveyed in SURVEY.md).
All distributed machinery is Ray-Data-first, not a port.
"""

from gliner_cpp_ray.config import GlinerConfig, SPAN_LEVEL, TOKEN_LEVEL

__all__ = ["GlinerConfig", "SPAN_LEVEL", "TOKEN_LEVEL"]
__version__ = "0.1.0"
