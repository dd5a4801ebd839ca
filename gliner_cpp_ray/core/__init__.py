"""Parity core: word splitting, prompt encoding, decoding, model facade.

Pure Python/NumPy — no Ray imports here.  These functions run *inside*
Ray Data ``map_batches`` actors (see ``gliner_cpp_ray.stages.ner``); the
heavy state (compiled regex, subword vocab, scoring model) is built once
per actor and reused across batches, exactly like the reference keeps it
in the ``Model`` object for its lifetime
(/root/reference/src/model.cpp:7-34).
"""

from gliner_cpp_ray.core.splitter import WordSplitter
from gliner_cpp_ray.core.processor import GlinerProcessor, EncodedBatch
from gliner_cpp_ray.core.decoder import (
    Span,
    sigmoid,
    greedy_search,
    decode_span_batch,
    decode_token_batch,
)
from gliner_cpp_ray.core.model import GlinerModel, GazetteerScoringModel

__all__ = [
    "WordSplitter",
    "GlinerProcessor",
    "EncodedBatch",
    "Span",
    "sigmoid",
    "greedy_search",
    "decode_span_batch",
    "decode_token_batch",
    "GlinerModel",
    "GazetteerScoringModel",
]
