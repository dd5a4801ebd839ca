"""Data-contract audit — the validation gate of a training-data
pipeline, as a streaming Ray Data stage.

A contract is a list of named, vectorized predicates over a batch
(null checks, range checks, domain membership, referential shape).
``contract_audit`` evaluates every rule map-side on zero-copy Arrow
batches and emits ONE partial row per (rule) per batch — (rule,
n_checked, n_violations) — so the exchange carries rules × tasks rows
regardless of corpus size; a tiny grouped sum finishes.  Violating
rows are never collected (at 100 TB a violation dump is itself a
corpus); pair the audit with an ordinary ``filter`` stage to quarantine
them when needed.

Each rule is ``(name, fn)`` where ``fn(batch: pa.Table) ->
pa.BooleanArray`` is True where the row VIOLATES the rule.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def contract_audit(ds, rules):
    """-> Dataset(rule, n_checked, n_violations): per-rule violation
    counts over the whole dataset, one bounded grouped sum."""
    from ray.data.aggregate import Sum

    names = [n for n, _ in rules]

    def audit(t: pa.Table) -> pa.Table:
        checked, bad = [], []
        for _name, fn in rules:
            v = fn(t)
            checked.append(t.num_rows)
            bad.append(int(pc.sum(pc.cast(v, pa.int64())).as_py() or 0))
        return pa.table(
            {
                "rule": pa.array(names, pa.string()),
                "n_checked": pa.array(checked, pa.int64()),
                "n_violations": pa.array(bad, pa.int64()),
            }
        )

    return (
        ds.map_batches(audit, batch_format="pyarrow")
        .groupby("rule")
        .aggregate(
            Sum("n_checked", alias_name="n_checked"),
            Sum("n_violations", alias_name="n_violations"),
        )
    )
