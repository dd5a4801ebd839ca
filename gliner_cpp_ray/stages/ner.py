"""NER stage: GLiNER span extraction as a Ray Data actor pool (B5).

Usage::

    mentions = docs.map_batches(
        GlinerNERStage, batch_format="pyarrow", batch_size=256,
        concurrency=(2, 8), num_cpus=1,
        fn_constructor_kwargs={...},
    )

All heavyweight state — subword vocab, compiled word-split regex, the
scoring model (ONNX session or gazetteer stub) — is built once per actor
in ``__init__`` and reused per batch, mirroring the reference's
``Model`` object lifetime (/root/reference/src/model.cpp:7-34).

Scale behaviour:
* docs inside each Arrow batch are sorted by byte length and grouped
  into micro-batches capped by estimated word count, so one huge page
  doesn't inflate padding for the whole model batch (the reference pads
  every batch to its longest text, src/processor.cpp:60,80 — a cost we
  control without changing per-doc results: batch membership does not
  affect GLiNER decoding, only padding);
* output rows carry ``gap_next`` / ``next_*`` columns — the byte gap to
  the next mention in the same doc — so downstream relation extraction
  is a stateless per-row map with NO doc-text join (SURVEY.md B6).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from gliner_cpp_ray.config import GlinerConfig, SPAN_LEVEL
from gliner_cpp_ray.core.model import (
    EncodedGazetteerScoringModel,
    GazetteerScoringModel,
    GlinerModel,
    OnnxScoringModel,
)
from gliner_cpp_ray.core.subword import HashSubwordTokenizer, HFSubwordTokenizer
from gliner_cpp_ray.sources import world

MENTIONS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("url", pa.string()),
        ("start", pa.int64()),
        ("end", pa.int64()),
        ("text", pa.string()),
        ("label", pa.string()),
        ("prob", pa.float32()),
        # adjacency context for join-free relation extraction
        ("gap_next", pa.string()),
        ("next_text", pa.string()),
        ("next_label", pa.string()),
        ("next_prob", pa.float32()),
    ]
)

_GAP_CAP_BYTES = 48  # longest relation connective is far below this


class GlinerNERStage:
    def __init__(
        self,
        labels: list[str] | None = None,
        gazetteer: dict | None = None,
        threshold: float = 0.5,
        flat_ner: bool = True,
        multi_label: bool = False,
        max_width: int = 12,
        model_type: str = SPAN_LEVEL,
        # smaller micro-batches keep the padded tensors cache-resident;
        # measured: +20% per-core throughput at 24 parallel actors on a
        # 32-core node vs 16/8192, at no single-actor cost
        docs_per_model_batch: int = 8,
        max_words_per_model_batch: int = 2048,
        onnx_path: str | None = None,
        tokenizer_json: str | None = None,
        # device selection for the ONNX path (model.cpp:71-77): >= 0
        # selects the CUDA provider on that device; at cluster scale
        # pair with map_batches(num_gpus=...) so Ray schedules the
        # actor onto a GPU node
        device_id: int = -1,
        # "gazetteer": lean stub reading token texts (default bench path);
        # "encoded": stub that assembles AND consumes the dense ONNX
        # tensors (words_mask/span grid validated by consumption — the
        # fidelity path, ~the real model's prep cost without weights)
        scorer: str = "gazetteer",
        # test seam for the ONNX path without the onnxruntime wheel: a
        # zero-arg callable building the session INSIDE the actor (a
        # live Ort session must never be pickled across processes)
        session_factory=None,
    ):
        self.labels = labels or list(world.NER_LABELS)
        self.threshold = threshold
        self.flat_ner = flat_ner
        self.multi_label = multi_label
        self.docs_per_model_batch = docs_per_model_batch
        self.max_words_per_model_batch = max_words_per_model_batch
        cfg = GlinerConfig(max_width=max_width, model_type=model_type)
        if session_factory is not None:
            scoring = OnnxScoringModel(
                model_type=model_type, session=session_factory()
            )
            subword = HFSubwordTokenizer(tokenizer_json)
        elif onnx_path is not None:
            scoring = OnnxScoringModel(onnx_path, model_type, device_id=device_id)
            subword = HFSubwordTokenizer(tokenizer_json)
        else:
            cls = (
                EncodedGazetteerScoringModel
                if scorer == "encoded"
                else GazetteerScoringModel
            )
            scoring = cls(gazetteer or world.ner_gazetteer())
            subword = HashSubwordTokenizer()
        self.model = GlinerModel(scoring, cfg, subword)

    def _micro_batches(self, order: np.ndarray, lengths: np.ndarray):
        """Group length-sorted doc indices into bounded micro-batches."""
        group: list[int] = []
        words = 0
        for j in map(int, order):
            est = max(1, int(lengths[j]) // 5)  # ~5 bytes/word heuristic
            if group and (
                len(group) >= self.docs_per_model_batch
                or words + est > self.max_words_per_model_batch
            ):
                yield group
                group, words = [], 0
            group.append(j)
            words += est
        if group:
            yield group

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts: list[str] = batch.column("text").to_pylist()
        doc_ids: list[str] = batch.column("doc_id").to_pylist()
        urls: list[str] = batch.column("url").to_pylist()

        lengths = np.array([len(t) for t in texts], dtype=np.int64)
        order = np.argsort(-lengths, kind="stable")  # longest first
        spans_by_doc: list[list] = [[] for _ in texts]
        for group in self._micro_batches(order, lengths):
            sub = [texts[j] for j in group]
            decoded = self.model.inference(
                sub, self.labels, self.flat_ner, self.threshold, self.multi_label
            )
            for j, spans in zip(group, decoded):
                spans_by_doc[j] = spans

        cols: dict[str, list] = {name: [] for name in MENTIONS_SCHEMA.names}
        for j, spans in enumerate(spans_by_doc):
            if not spans:
                continue
            spans = sorted(spans, key=lambda s: (s.start, s.end))
            tb = texts[j].encode("utf-8")
            did, u = doc_ids[j], urls[j]
            for k, s in enumerate(spans):
                cols["doc_id"].append(did)
                cols["url"].append(u)
                cols["start"].append(s.start)
                cols["end"].append(s.end)
                cols["text"].append(s.text)
                cols["label"].append(s.label)
                cols["prob"].append(s.prob)
                if k + 1 < len(spans):
                    nxt = spans[k + 1]
                    gap_len = nxt.start - s.end
                    gap = (
                        tb[s.end : nxt.start].decode("utf-8")
                        if 0 <= gap_len <= _GAP_CAP_BYTES
                        else ""
                    )
                    cols["gap_next"].append(gap)
                    cols["next_text"].append(nxt.text)
                    cols["next_label"].append(nxt.label)
                    cols["next_prob"].append(nxt.prob)
                else:
                    cols["gap_next"].append("")
                    cols["next_text"].append("")
                    cols["next_label"].append("")
                    cols["next_prob"].append(0.0)
        return pa.table(cols, schema=MENTIONS_SCHEMA)
