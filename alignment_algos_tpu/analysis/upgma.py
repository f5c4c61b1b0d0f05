"""UPGMA agglomerative clustering (UPGMA_Clusterer.{h,cpp},
UPGMA_Tree.{h,cpp}).

Average-linkage merging over a triangular distance matrix with the
reference's weighted-average update d(new,i) = (w0*d(i,0)+w1*d(i,1))/(w0+w1)
and its quirky avg_leaf_dist recurrence (weighted sum divided by 2,
UPGMA_Tree.cpp:66-70).  Ties in find_closest_pair resolve to the first pair
in (i ascending, j<i ascending) scan order.  The O(n^3) matrix rebuilds of
the reference collapse to numpy row updates.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

F32 = np.float32


@dataclass
class UPGMANode:
    index: int
    left: "UPGMANode | None" = None
    right: "UPGMANode | None" = None
    l_dist: float = -1.0
    r_dist: float = -1.0
    weight: int = 1
    avg_leaf_dist: float = 0.0

    def is_leaf(self) -> bool:
        return self.left is None and self.right is None

    def leaves(self) -> list["UPGMANode"]:
        if self.is_leaf():
            return [self]
        return self.left.leaves() + self.right.leaves()


def _make_parent(left: UPGMANode, right: UPGMANode, min_dist: float,
                 index: int) -> UPGMANode:
    ld = F32(F32(min_dist) / F32(2.0) - F32(left.avg_leaf_dist))
    rd = F32(F32(min_dist) / F32(2.0) - F32(right.avg_leaf_dist))
    node = UPGMANode(index, left, right, float(ld), float(rd))
    node.weight = left.weight + right.weight
    # quirky reference recurrence: weighted sum over children divided by 2
    node.avg_leaf_dist = float(F32(
        (F32(left.weight) * F32(F32(ld) + F32(left.avg_leaf_dist))
         + F32(right.weight) * F32(F32(rd) + F32(right.avg_leaf_dist)))
        / F32(2.0)))
    return node


class UPGMAClusterer:
    def __init__(self, distance: np.ndarray) -> None:
        """distance: (n, n) symmetric (or lower-triangular) matrix."""
        d = np.asarray(distance, dtype=np.float32)
        n = d.shape[0]
        self.n = n
        self.D = np.tril(d) + np.tril(d, -1).T  # symmetrize from lower tri
        self.root: UPGMANode | None = None
        self.clusters: list[list[UPGMANode]] = []

    def cluster(self) -> UPGMANode:
        n = self.n
        D = self.D.copy()
        w = np.ones(n, dtype=np.int64)
        nodes = [UPGMANode(i) for i in range(n)]
        active = list(range(n))
        next_index = n

        while len(active) > 2:
            # find closest active pair, first in (i asc, j<i asc) order
            best = (np.float32(np.inf), -1, -1)
            for ai in range(1, len(active)):
                for aj in range(ai):
                    i, j = active[ai], active[aj]
                    dij = D[max(i, j), min(i, j)] if False else D[i, j]
                    if dij < best[0]:
                        best = (dij, ai, aj)
            _, ai, aj = best
            # the reference moves (smaller index first) to the front; merge
            a_small, a_big = min(ai, aj), max(ai, aj)
            i, j = active[a_small], active[a_big]
            md = float(D[i, j])
            parent = _make_parent(nodes[i], nodes[j], md, next_index)
            nodes.append(parent)

            # weighted-average distance update into slot i
            others = [a for a in active if a != i and a != j]
            if others:
                newd = ((w[i] * D[i, others] + w[j] * D[j, others])
                        / np.float32(w[i] + w[j])).astype(np.float32)
                D[i, others] = newd
                D[others, i] = newd
            w_new = w[i] + w[j]
            w = np.append(w, 0)
            w[i] = w_new
            # reuse slot i for the parent
            nodes[i] = parent
            active.remove(j)
            next_index += 1

        i, j = active[0], active[1]
        self.root = _make_parent(nodes[i], nodes[j], float(D[i, j]), next_index)
        return self.root

    def find_clusters_under_threshold(self, thresh: float) -> list[list[int]]:
        self.clusters = []

        def walk(node: UPGMANode):
            if node.is_leaf():
                self.clusters.append([node])
                return
            if node.avg_leaf_dist < thresh:
                self.clusters.append(node.leaves())
            else:
                walk(node.left)
                walk(node.right)

        walk(self.root)
        return [[leaf.index for leaf in c] for c in self.clusters]


def upgma_linkage_matrix_jax(distance):
    """Batched-linear-algebra UPGMA on device: returns the merge order and
    heights (argmin reductions over the masked distance matrix).  Used by
    the parallel screen path where K is large; the host class above is the
    semantics reference."""
    import jax
    import jax.numpy as jnp

    d = jnp.asarray(distance, dtype=jnp.float32)
    n = d.shape[0]
    big = jnp.float32(3e38)
    D = jnp.where(jnp.eye(n, dtype=bool), big, d)

    def step(carry, _):
        D, w, alive = carry
        masked = jnp.where(alive[:, None] & alive[None, :], D, big)
        flat = jnp.argmin(masked)
        i, j = flat // n, flat % n
        i2, j2 = jnp.minimum(i, j), jnp.maximum(i, j)
        md = masked[i2, j2]
        wi, wj = w[i2], w[j2]
        newrow = (wi * D[i2] + wj * D[j2]) / (wi + wj)
        D = D.at[i2, :].set(newrow).at[:, i2].set(newrow)
        D = D.at[i2, i2].set(big)
        alive = alive.at[j2].set(False)
        w = w.at[i2].set(wi + wj)
        return (D, w, alive), (i2, j2, md)

    w0 = jnp.ones(n, jnp.float32)
    alive0 = jnp.ones(n, dtype=bool)
    _, merges = jax.lax.scan(step, (D, w0, alive0), None, length=n - 1)
    return merges
