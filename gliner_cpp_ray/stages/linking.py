"""Entity linking: alias-dictionary candidates (B7) + cosine re-rank (B8).

A stateful actor-pool stage: the alias dictionary and the candidate
embedding matrix live in actor memory, built once in ``__init__`` — a
map-side broadcast lookup, never a shuffle join (the dictionary is small
by construction; at cluster scale pass it via ``ray.put`` and hand the
object ref to ``fn_constructor_kwargs``).

Resolution per mention: candidates = dict[(norm_surface, label)].
* 0 candidates → NIL (empty qid);
* 1 candidate → linked, score 1.0;
* >1 candidates → cosine re-rank of candidate entity embeddings against
  a context vector (for triples: the resolved entity on the other side
  of the relation — e.g. "Victoria is located in Canada" ranks the
  Canadian Victoria above the Australian one).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from gliner_cpp_ray.sources import world

LINKED_EXTRA = [
    ("subj_qid", pa.string()),
    ("obj_qid", pa.string()),
    ("link_score", pa.float32()),
]

_DEFAULT_LINKER = None


def default_linker() -> "EntityLinker":
    """Per-process lazy singleton for the default (world) alias dict.

    The dictionary is tiny and builds in ~4 ms, so plain Ray TASKS with
    this cached instance beat an actor pool (no pool spin-up); a custom
    alias dict at real scale should use ``ray.put`` + an actor pool via
    the ``EntityLinker`` class directly."""
    global _DEFAULT_LINKER
    if _DEFAULT_LINKER is None:
        _DEFAULT_LINKER = EntityLinker()
    return _DEFAULT_LINKER


def link_triples(batch: pa.Table) -> pa.Table:
    """Stateless-task wrapper over the default linker."""
    return default_linker()(batch)


class EntityLinker:
    def __init__(self, alias_rows: list[dict] | None = None, dim: int = 32):
        rows = alias_rows if alias_rows is not None else world.alias_rows()
        self.dim = dim
        self._cands: dict[tuple[str, str], list[str]] = {}
        for r in rows:
            self._cands.setdefault((r["alias_norm"], r["label"]), []).append(r["qid"])
        for key in self._cands:
            self._cands[key] = sorted(set(self._cands[key]))
        qids = sorted({q for lst in self._cands.values() for q in lst})
        self._emb = {q: world.entity_embedding(q, dim) for q in qids}

    # -- single-mention resolution ------------------------------------
    def candidates(self, surface: str, label: str) -> list[str]:
        return self._cands.get((world.normalize_surface(surface), label), [])

    def resolve(
        self, surface: str, label: str, context_vec: np.ndarray | None
    ) -> tuple[str, float]:
        """-> (qid or "", link_score)."""
        cands = self.candidates(surface, label)
        if not cands:
            return "", 0.0
        if len(cands) == 1:
            return cands[0], 1.0
        if context_vec is None:
            return cands[0], 0.5  # deterministic fallback, flagged by score
        sims = [float(np.dot(self._emb[q], context_vec)) for q in cands]
        best = int(np.argmax(sims))
        return cands[best], sims[best]

    def embedding(self, qid: str) -> np.ndarray | None:
        return self._emb.get(qid)

    def _resolve_unambiguous(self, batch: pa.Table, s_col: str, l_col: str):
        """Per-row qid for the easy cases; None marks an ambiguous
        surface.  Integer-coded: dictionary lookups run once per batch-
        DISTINCT (surface, label) key — web text repeats surfaces
        heavily, so the per-row path is a NumPy gather."""
        import pyarrow.compute as pc

        sdict = pc.dictionary_encode(batch.column(s_col).combine_chunks())
        ldict = pc.dictionary_encode(batch.column(l_col).combine_chunks())
        si = np.asarray(sdict.indices, dtype=np.int64)
        li = np.asarray(ldict.indices, dtype=np.int64)
        sd = sdict.dictionary.to_pylist()
        ld = ldict.dictionary.to_pylist()
        combined = si * len(ld) + li
        uniq, inverse = np.unique(combined, return_inverse=True)
        vals = np.empty(len(uniq), dtype=object)
        for k, code in enumerate(uniq):
            s, l = sd[int(code) // len(ld)], ld[int(code) % len(ld)]
            c = self.candidates(s, l)
            vals[k] = "" if not c else (c[0] if len(c) == 1 else None)
        return list(vals[inverse])

    # -- triples batch: link subj & obj with cross-context -------------
    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            out = batch.append_column("subj_qid", pa.array([], pa.string()))
            out = out.append_column("obj_qid", pa.array([], pa.string()))
            return out.append_column("link_score", pa.array([], pa.float32()))
        subj = batch.column("subj").to_pylist()
        obj = batch.column("obj").to_pylist()
        sl = batch.column("subj_label").to_pylist()
        ol = batch.column("obj_label").to_pylist()
        subj_qid = self._resolve_unambiguous(batch, "subj", "subj_label")
        obj_qid = self._resolve_unambiguous(batch, "obj", "obj_label")
        score = np.ones(n, dtype=np.float32)
        # slow path only for rows touching an ambiguous surface:
        # resolve the unambiguous side first, use it as re-rank context
        for i in range(n):
            s_amb, o_amb = subj_qid[i] is None, obj_qid[i] is None
            if not s_amb and not o_amb:
                continue
            if not s_amb:  # obj ambiguous
                ctx = self._emb.get(subj_qid[i]) if subj_qid[i] else None
                obj_qid[i], score[i] = self.resolve(obj[i], ol[i], ctx)
            else:  # subj ambiguous (or both; obj first as context)
                if o_amb:
                    obj_qid[i], _ = self.resolve(obj[i], ol[i], None)
                ctx = self._emb.get(obj_qid[i]) if obj_qid[i] else None
                subj_qid[i], score[i] = self.resolve(subj[i], sl[i], ctx)
        out = batch.append_column("subj_qid", pa.array(subj_qid, pa.string()))
        out = out.append_column("obj_qid", pa.array(obj_qid, pa.string()))
        out = out.append_column("link_score", pa.array(score, pa.float32()))
        return out
