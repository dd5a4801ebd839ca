"""Typed field extraction from semi-structured (JSON-ish) string columns.

Web-scale event/page tables routinely carry a free-form ``props`` /
``metadata`` column of small JSON objects.  Parsing every row with a
Python JSON decoder is per-row interpreter work — the wrong shape for a
hot ``map_batches`` stage.  For flat scalar fields, extraction compiles
to ONE vectorized RE2 kernel (``pyarrow.compute.extract_regex``) over
the whole column; DuckDB's ``regexp_extract`` compiles the identical
RE2 pattern, so the driver oracle checks the extraction itself, not a
lookalike.

Scope note (documented, not hidden): the RE2 fast path reads flat
``"field": <int>`` pairs — the dominant telemetry shape.  Nested
objects or string escapes need a real parser; that variant belongs in
an actor-pool stage with a per-actor decoder, not here.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def int_field_pattern(field: str) -> str:
    """RE2 pattern for a flat integer JSON field, shared verbatim with
    the SQL oracle (named group for pyarrow; DuckDB uses group 1)."""
    return f'"{field}"\\s*:\\s*(-?[0-9]+)'


def extract_int_field(batch: pa.Table, field: str = "k",
                      props_col: str = "props") -> pa.Table:
    """Add ``<field>`` (int64, null when absent) extracted from the
    JSON-ish ``props_col`` — one RE2 kernel, no Python per row."""
    pat = f'"{field}"\\s*:\\s*(?P<v>-?[0-9]+)'
    m = pc.extract_regex(batch.column(props_col), pat)
    vals = pc.struct_field(m, "v").cast(pa.int64())
    return batch.append_column(field, vals)


def props_field_stats(ds, field: str = "k", props_col: str = "props",
                      group_col: str = "event_type"):
    """Per-group stats of an extracted integer field: row count,
    rows-with-field count, and the field's sum — the standard first
    probe of a semi-structured column (fill rate + magnitude) before
    promoting it to a typed column.

    Movement: pure streaming map (zero shuffle) + one combinable
    groupby over ``group_col`` (output bounded by group cardinality)."""
    from ray.data.aggregate import Count, Sum

    def prep(t: pa.Table) -> pa.Table:
        t = extract_int_field(t, field, props_col)
        v = t.column(field)
        return pa.table(
            {
                group_col: t.column(group_col),
                "has": pc.is_valid(v).cast(pa.int64()),
                "val": pc.fill_null(v, 0),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(group_col)
        .aggregate(
            Count(alias_name="n_rows"),
            Sum("has", alias_name=f"n_{field}"),
            Sum("val", alias_name=f"sum_{field}"),
        )
    )
