"""Union-find for canonicalization connected components (B10).

The driver-side union-find runs over the REDUCED edge list — distinct
``(norm_surface, qid)`` pairs after a Ray-side distinct/pre-aggregation —
never over raw mention rows.  The reduced list is bounded by the surface
vocabulary (≈ entity count × alias count), which stays small even at
10^12 documents, so a single-process pass is the right tool (cf.
PAPERS.md: BTS ICDE'24 reserves distributed union-find for edge lists
that do NOT reduce; ours does).

For a non-reducing workload (pair lists that outgrow driver memory),
``stages/graph.py:cc_label_propagation`` is the distributed min-label
path with the same ``node -> min component id`` contract, pinned equal
to this class in tests/test_graph.py.
"""

from __future__ import annotations


class UnionFind:
    """Path-halving union-find over arbitrary hashable nodes."""

    def __init__(self):
        self.parent: dict = {}

    def find(self, x):
        p = self.parent.setdefault(x, x)
        while p != x:
            gp = self.parent[p]
            self.parent[x] = gp
            x, p = gp, self.parent.get(gp, gp)
        return x

    def union(self, a, b) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # deterministic: smaller representative wins.  Compare the
            # values DIRECTLY so int keys order numerically — repr()
            # ordering would make the root of {9, 10} be 10, breaking
            # the "cluster_id = min member" contract of the dedup
            # clusterers.  Fall back to repr only for keys that aren't
            # mutually orderable (never the case for homogeneous int or
            # tuple-of-str node sets).
            try:
                lo, hi = (ra, rb) if ra <= rb else (rb, ra)
            except TypeError:
                lo, hi = (ra, rb) if repr(ra) <= repr(rb) else (rb, ra)
            self.parent[hi] = lo

    def components(self) -> dict:
        """node -> component root (fully resolved)."""
        return {x: self.find(x) for x in list(self.parent)}


def connected_components(edges) -> dict:
    """edges: iterable of (a, b) pairs → node -> root mapping."""
    uf = UnionFind()
    for a, b in edges:
        uf.union(a, b)
    return uf.components()
