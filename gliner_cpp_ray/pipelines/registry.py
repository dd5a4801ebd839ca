"""User-extension surface: named stages + config-driven pipelines.

The reference library has no plugin surface (its public API is the
``Model`` ctor family + ``inference()``, model.hpp:30-47); this engine
adds one, as SURVEY.md §2 specifies: a pipeline is an ordered list of
named stages, each a ``(callable | actor class, map_batches kwargs)``
pair; custom stages register via ``register_stage``.

A pipeline config is JSON-able::

    [{"stage": "html_to_docs"},
     {"stage": "ner", "batch_size": 64, "concurrency": [2, 8]},
     {"stage": "relations"}]

``build_pipeline(ds, config)`` folds the stages over a Dataset with
``map_batches``, applying per-stage overrides on top of registered
defaults.
"""

from __future__ import annotations

import inspect
from dataclasses import dataclass, field
from typing import Any, Callable

from gliner_cpp_ray.stages.sizing import default_concurrency


@dataclass
class StageSpec:
    fn: Callable | type
    defaults: dict[str, Any] = field(default_factory=dict)

    @property
    def is_class(self) -> bool:
        return inspect.isclass(self.fn)


_REGISTRY: dict[str, StageSpec] = {}


def register_stage(name: str, fn: Callable | type, **defaults: Any) -> None:
    if name in _REGISTRY:
        raise ValueError(f"stage {name!r} already registered")
    _REGISTRY[name] = StageSpec(fn, defaults)


def get_stage(name: str) -> StageSpec:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown stage {name!r}; registered: {sorted(_REGISTRY)}"
        ) from None


def registered_stages() -> list[str]:
    return sorted(_REGISTRY)


def build_pipeline(ds, config: list[dict]):
    """Fold config stages over a Dataset via map_batches."""
    for entry in config:
        entry = dict(entry)
        spec = get_stage(entry.pop("stage"))
        kwargs = {**spec.defaults, **entry}
        if "concurrency" in kwargs and isinstance(kwargs["concurrency"], list):
            kwargs["concurrency"] = tuple(kwargs["concurrency"])
        ds = ds.map_batches(spec.fn, **kwargs)
    return ds


def _register_builtins() -> None:
    from gliner_cpp_ray.stages.dedup import MinHashSigner, add_content_hash, add_simhash
    from gliner_cpp_ray.stages.html_to_text import html_to_docs
    from gliner_cpp_ray.stages.linking import link_triples
    from gliner_cpp_ray.stages.multimodal import FrameSampleStage, MediaFeatureStage
    from gliner_cpp_ray.stages.ner import GlinerNERStage
    from gliner_cpp_ray.stages.relations import extract_relations
    from gliner_cpp_ray.stages.text_analysis import (
        LangId,
        fingerprints,
        quality_counts,
        token_counts,
    )

    register_stage("html_to_docs", html_to_docs, batch_format="pyarrow")
    register_stage(
        "ner",
        GlinerNERStage,
        batch_format="pyarrow",
        batch_size=128,
        concurrency=(2, 8),
    )
    register_stage("relations", extract_relations, batch_format="pyarrow")
    register_stage("link", link_triples, batch_format="pyarrow")
    register_stage("content_hash", add_content_hash, batch_format="pyarrow")
    register_stage("simhash", add_simhash, batch_format="pyarrow")
    register_stage(
        "minhash_sign",
        MinHashSigner,
        batch_format="pyarrow",
        concurrency=default_concurrency(),
    )
    from gliner_cpp_ray.stages.cooccur import doc_canon_partial

    # caller supplies fn_kwargs={"canon_map": ...} (the pipeline's
    # persisted canonicalization map) as a per-stage override
    register_stage("doc_canon_mentions", doc_canon_partial, batch_format="pyarrow")
    from gliner_cpp_ray.stages.windows import add_time_bucket

    register_stage("time_bucket", add_time_bucket, batch_format="pyarrow")
    register_stage("token_counts", token_counts, batch_format="pyarrow")
    register_stage("quality_counts", quality_counts, batch_format="pyarrow")
    register_stage("fingerprints", fingerprints, batch_format="pyarrow")
    register_stage("lang_id", LangId, batch_format="pyarrow", concurrency=default_concurrency())
    from gliner_cpp_ray.stages.multimodal import byte_stats
    from gliner_cpp_ray.stages.similarity import LshBucketer

    register_stage("media_byte_stats", byte_stats, batch_format="pyarrow",
                   batch_size=64)
    register_stage(
        "media_features",
        MediaFeatureStage,
        batch_format="pyarrow",
        batch_size=32,
        concurrency=default_concurrency(),
    )
    register_stage(
        "lsh_code",
        LshBucketer,
        batch_format="pyarrow",
        concurrency=default_concurrency(),
        fn_constructor_kwargs={"dim": 64},
    )
    register_stage(
        "frame_sample",
        FrameSampleStage,
        batch_format="pyarrow",
        batch_size=32,
        concurrency=default_concurrency(),
    )
    from gliner_cpp_ray.stages.sketches import HistogramPartial, KmvPartial
    from gliner_cpp_ray.stages.text_analysis import term_doc_frequency_partial

    register_stage(
        "kmv_partial", KmvPartial, batch_format="pyarrow", concurrency=default_concurrency(),
        fn_constructor_kwargs={"col": "doc_id"},
    )
    register_stage(
        "histogram_partial", HistogramPartial, batch_format="pyarrow",
        concurrency=default_concurrency(),
        fn_constructor_kwargs={"col": "value", "lo": 0.0, "hi": 1.0,
                               "n_bins": 64},
    )
    register_stage(
        "term_df_partial", term_doc_frequency_partial, batch_format="pyarrow",
    )
    from gliner_cpp_ray.stages.linkgraph import (
        extract_anchor_texts,
        extract_page_links,
    )
    from gliner_cpp_ray.stages.text_analysis import pii_redact, repetition_stats

    register_stage("page_links", extract_page_links, batch_format="pyarrow")
    register_stage("anchor_texts", extract_anchor_texts, batch_format="pyarrow")
    register_stage("pii_redact", pii_redact, batch_format="pyarrow")
    register_stage("repetition_stats", repetition_stats, batch_format="pyarrow")


_register_builtins()
