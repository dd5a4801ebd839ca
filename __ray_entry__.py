"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Implementations live in ``gliner_cpp_ray.pipelines.queries``; this
module stays a thin adapter.  No ``ray.init``/``ray.shutdown`` here or
in anything these call.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: full KG construction (HTML→text → GLiNER-style
    NER → relations → linking → canonicalization → edges) over the
    deterministic synthetic Common-Crawl corpus sized for sf0.001.
    Returns the edges table (subject-sorted knowledge-graph edges)."""
    from gliner_cpp_ray.pipelines.queries import _run_kg, _read_out

    _, out = _run_kg("/root/testdata/sf0.001")
    return _read_out(out, "edges").to_pandas()


def queries() -> dict[str, Callable[[str], Any]]:
    from gliner_cpp_ray.pipelines.queries import queries as _queries

    return _queries()


def oracle_sql() -> dict[str, str]:
    from gliner_cpp_ray.pipelines.queries import oracle_sql as _oracle

    return _oracle()
