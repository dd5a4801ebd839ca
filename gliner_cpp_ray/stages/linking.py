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

    # -- triples batch: link subj & obj with cross-context -------------
    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        subj = batch.column("subj").to_pylist()
        obj = batch.column("obj").to_pylist()
        sl = batch.column("subj_label").to_pylist()
        ol = batch.column("obj_label").to_pylist()
        subj_qid = [""] * n
        obj_qid = [""] * n
        score = np.ones(n, dtype=np.float32)
        for i in range(n):
            sc = self.candidates(subj[i], sl[i])
            oc = self.candidates(obj[i], ol[i])
            # resolve the unambiguous side first, use it as context
            if len(sc) <= 1 and len(oc) <= 1:
                subj_qid[i] = sc[0] if sc else ""
                obj_qid[i] = oc[0] if oc else ""
            elif len(sc) <= 1:  # obj ambiguous
                subj_qid[i] = sc[0] if sc else ""
                ctx = self._emb.get(subj_qid[i]) if subj_qid[i] else None
                obj_qid[i], s = self.resolve(obj[i], ol[i], ctx)
                score[i] = s
            else:  # subj ambiguous (or both; obj first as context)
                obj_qid[i] = oc[0] if oc else ""
                ctx = self._emb.get(obj_qid[i]) if obj_qid[i] else None
                subj_qid[i], s = self.resolve(subj[i], sl[i], ctx)
                score[i] = s
        out = batch.append_column("subj_qid", pa.array(subj_qid, pa.string()))
        out = out.append_column("obj_qid", pa.array(obj_qid, pa.string()))
        out = out.append_column("link_score", pa.array(score, pa.float32()))
        return out
