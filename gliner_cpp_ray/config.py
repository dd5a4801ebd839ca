"""GLiNER model configuration.

Mirrors the reference ``gliner::Config`` struct
(/root/reference/include/GLiNER/gliner_config.hpp:9-13): ``maxWidth``,
``maxLength``, ``modelType`` (SPAN_LEVEL default). Canonical values are
``{12, 512}`` (/root/reference/examples/inference.cpp:9,
/root/reference/tests/test.cpp:86).

``max_length`` is declared but never read anywhere in the reference's
``src/`` — no truncation is implemented there.  We keep the same default
behaviour (no truncation) for byte parity, but expose an optional
``truncate_words`` guard for web-scale inputs; enabling it is a
documented divergence.
"""

from __future__ import annotations

from dataclasses import dataclass

SPAN_LEVEL = "span_level"
TOKEN_LEVEL = "token_level"


@dataclass(frozen=True)
class GlinerConfig:
    max_width: int = 12
    max_length: int = 512  # parity field; unused by the reference engine
    model_type: str = SPAN_LEVEL
    # Divergence guard (off by default = reference behaviour): cap the
    # number of words fed to the encoder per document.  At 100 TB scale a
    # single multi-MB document would otherwise inflate a whole model batch.
    truncate_words: int | None = None

    def __post_init__(self) -> None:
        if self.model_type not in (SPAN_LEVEL, TOKEN_LEVEL):
            raise ValueError(f"unknown model_type: {self.model_type!r}")
        if self.max_width <= 0:
            raise ValueError("max_width must be positive")
