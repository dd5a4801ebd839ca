"""Literal Python transcription of /root/reference/src/decoder.cpp.

This is the parity ORACLE: a straight, unvectorized re-statement of the
C++ flat-index scans and the sequential greedy pass, used by
tests/test_decoder.py to cross-check the production (vectorized)
decoder on synthetic and randomized logits.  Keep it dumb and literal.

Out-of-range guard: the C++ token path indexes ``tokens[batch_id]``
without bounds checks (UB on padded positions; real models score padding
under threshold).  Both oracle and production code skip out-of-range
positions — identical behaviour for any in-contract model output.
"""

from __future__ import annotations

import math
from dataclasses import dataclass


@dataclass
class OSpan:
    start: int
    end: int
    text: str
    label: str
    prob: float


def _sig(x: float) -> float:
    return 1.0 / (1.0 + math.exp(-x))


def _is_nested(s1, s2):  # decoder.cpp:11-13
    return (s1.start <= s2.start and s2.end <= s1.end) or (
        s2.start <= s1.start and s1.end <= s2.end
    )


def _has_overlapping(s1, s2, multi_label):  # decoder.cpp:16-24
    if s1.start == s2.start and s1.end == s2.end:
        return not multi_label
    if s1.start > s2.end or s2.start > s1.end:
        return False
    return True


def _has_overlapping_nested(s1, s2, multi_label):  # decoder.cpp:27-29
    return _has_overlapping(s1, s2, multi_label) or _is_nested(s1, s2)


def greedy_search_oracle(spans, flat_ner, multi_label):  # decoder.cpp:31-61
    if not spans:
        return []
    has_ov = _has_overlapping if flat_ner else _has_overlapping_nested
    new_list = []
    prev, nxt = 0, 1
    while nxt < len(spans):
        if not has_ov(spans[prev], spans[nxt], multi_label):
            new_list.append(spans[prev])
            prev = nxt
        else:
            if spans[prev].prob < spans[nxt].prob:
                prev = nxt
        nxt += 1
    new_list.append(spans[prev])
    return new_list


def span_decode_oracle(
    model_output,  # flat list/array of floats
    texts,  # list[str]
    entities,  # list[str]
    batch_tokens,  # per doc: list of (byte_start, byte_end) pairs
    num_words,  # batch->numWords
    max_width,  # batch->width() for SpanBatch
    flat_ner=True,
    threshold=0.5,
    multi_label=False,
):
    """SpanDecoder::decode, decoder.cpp:76-121 — literal flat scan."""
    batch_size = len(texts)
    num_entities = len(entities)
    start_token_padding = max_width * num_entities
    batch_padding = num_words * start_token_padding
    end_token_padding = num_entities

    spans = [[] for _ in range(batch_size)]
    for idx in range(len(model_output)):
        value = model_output[idx]
        batch_id = idx // batch_padding
        start_token = (idx // start_token_padding) % num_words
        end_token = start_token + (idx // end_token_padding) % max_width
        entity = idx % num_entities
        prob = _sig(float(value))
        if (
            prob >= threshold
            and batch_id < batch_size
            and start_token < len(batch_tokens[batch_id])
            and end_token < len(batch_tokens[batch_id])
        ):
            s = batch_tokens[batch_id][start_token][0]
            e = batch_tokens[batch_id][end_token][1]
            text = texts[batch_id].encode("utf-8")[s:e].decode("utf-8")
            spans[batch_id].append(OSpan(s, e, text, entities[entity], prob))
    return [greedy_search_oracle(sp, flat_ner, multi_label) for sp in spans]


def token_decode_oracle(
    model_output,
    texts,
    entities,
    batch_tokens,
    num_words,
    flat_ner=True,
    threshold=0.5,
    multi_label=False,
):
    """TokenDecoder::decode, decoder.cpp:123-181 — literal scan with the
    reference's end_id arithmetic and continue/break asymmetry."""
    batch_size = len(texts)
    num_entities = len(entities)
    batch_padding = num_words * num_entities
    position_padding = batch_size * batch_padding
    token_padding = num_entities

    spans = [[] for _ in range(batch_size)]
    for start_id in range(position_padding):
        if _sig(float(model_output[start_id])) < threshold:
            continue
        batch_id = (start_id // batch_padding) % batch_size
        start_token = (start_id // token_padding) % num_words
        entity = start_id % num_entities
        if start_token >= len(batch_tokens[batch_id]):
            continue  # guard (see module docstring)
        score_sum = 0.0
        n = 0
        end_token = start_token
        end_id = start_id + position_padding
        while (
            ((end_id // batch_padding) % batch_size) == batch_id
            and end_id < 2 * position_padding
        ):
            if end_token >= len(batch_tokens[batch_id]):
                break  # guard
            score = _sig(float(model_output[end_id + position_padding]))
            if _sig(float(model_output[end_id])) < threshold:
                end_token += 1
                end_id += token_padding
                continue
            if score < threshold:
                break
            score_sum += score
            n += 1
            s = batch_tokens[batch_id][start_token][0]
            e = batch_tokens[batch_id][end_token][1]
            text = texts[batch_id].encode("utf-8")[s:e].decode("utf-8")
            spans[batch_id].append(
                OSpan(s, e, text, entities[entity], score_sum / n)
            )
            end_token += 1
            end_id += token_padding
    return [greedy_search_oracle(sp, flat_ner, multi_label) for sp in spans]
