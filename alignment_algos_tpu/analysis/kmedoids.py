"""K-medoids clustering with simulated annealing over the cluster count
(kmedoidclusterer.{h,cpp}, clusterset.{h,cpp}).

The reference anneals with merge-two/split-one moves (Metropolis accept,
kT *= 0.9 cooling), grows the cluster count until the per-cluster variance
constraint passes, then shrinks it keeping the smallest k whose clusters all
pass (variance <= max_var and member distance^2 <= 1.6*max_var).

The reference seeds rand() with time() (non-deterministic run to run); this
implementation takes an explicit seed.
"""

from __future__ import annotations

import numpy as np


class ClusterSet:
    """Triangular distance + squared-distance store (clusterset.h)."""

    def __init__(self, distance: np.ndarray) -> None:
        d = np.asarray(distance, dtype=np.float32)
        self.D = np.tril(d) + np.tril(d, -1).T
        self.D2 = (self.D ** 2).astype(np.float32)
        self.n = d.shape[0]

    def dist(self, i: int, j: int) -> float:
        return float(self.D[i, j])

    def dist_sq(self, i: int, j: int) -> float:
        return float(self.D2[i, j])


class _Cluster:
    __slots__ = ("members", "centroid", "variance")

    def __init__(self, centroid: int = -1) -> None:
        self.members: list[int] = []
        self.centroid = centroid
        self.variance = 0.0

    def copy(self) -> "_Cluster":
        c = _Cluster(self.centroid)
        c.members = list(self.members)
        c.variance = self.variance
        return c


class KMedoidClusterer:
    def __init__(self, points: ClusterSet, k_max: int, seed: int = 0) -> None:
        self.points = points
        self.num_points = points.n
        self.k_max = k_max
        self.rng = np.random.default_rng(seed)
        self.kT = 1.0

    # ---- core k-medoids ----------------------------------------------
    def _update_centroid(self, c: _Cluster) -> None:
        m = np.array(c.members)
        sub = self.points.D2[np.ix_(m, m)]
        totals = sub.sum(axis=1)
        best = int(np.argmin(totals))
        c.centroid = int(m[best])
        c.variance = float(totals[best] / len(m))

    def _assign_all(self, vc: list[_Cluster]) -> None:
        cents = np.array([c.centroid for c in vc])
        d2 = self.points.D2[:, cents]
        nearest = np.argmin(d2, axis=1)
        for c in vc:
            c.members = []
            c.variance = 0.0
        for p in range(self.num_points):
            c = vc[int(nearest[p])]
            md = float(d2[p, nearest[p]])
            c.variance += (md - c.variance) / (len(c.members) + 1)
            c.members.append(p)

    def cluster(self, vc: list[_Cluster]) -> float:
        prev = None
        cur = sorted(c.centroid for c in vc)
        while prev != cur:
            prev = cur
            for c in vc:
                if c.members:
                    self._update_centroid(c)
            self._assign_all(vc)
            cur = sorted(c.centroid for c in vc)
        return self._total_variance(vc)

    def _total_variance(self, vc: list[_Cluster]) -> float:
        tot = sum(c.variance * len(c.members) for c in vc)
        return float(tot / self.num_points)

    def _below_max_var(self, vc: list[_Cluster], max_var: float) -> bool:
        for c in vc:
            if c.variance > max_var:
                return False
        for c in vc:
            for m in c.members:
                if self.points.dist_sq(m, c.centroid) > 1.6 * max_var:
                    return False
        return True

    # ---- annealing moves ---------------------------------------------
    def _random_cluster(self, vc):
        return vc[int(self.rng.integers(0, len(vc)))]

    def _merge_two(self, vc: list[_Cluster]) -> None:
        # Metropolis-biased pick of two clusters, else nearest pair
        pick = None
        for _ in range(10 * len(vc)):
            c1 = self._random_cluster(vc)
            c2 = c1
            while c2 is c1:
                c2 = self._random_cluster(vc)
            d2 = self.points.dist_sq(c1.centroid, c2.centroid)
            if np.exp(min(d2 / max(self.kT, 1e-9), 50.0)) >= self.rng.uniform():
                pick = (c1, c2)
                break
        if pick is None:
            best = (np.inf, None, None)
            for i in range(len(vc) - 1):
                for j in range(i + 1, len(vc)):
                    d = self.points.dist(vc[i].centroid, vc[j].centroid)
                    if d < best[0]:
                        best = (d, vc[i], vc[j])
            pick = (best[1], best[2])
        c1, c2 = pick
        merged = _Cluster()
        merged.members = c1.members + c2.members
        self._update_centroid(merged)
        vc.remove(c1)
        vc.remove(c2)
        vc.append(merged)

    def _split_one(self, vc: list[_Cluster]) -> None:
        total = self._total_variance(vc)
        cand = None
        for _ in range(2 * len(vc)):
            c = self._random_cluster(vc)
            if total > 0 and (c.variance / total) > self.rng.uniform() \
                    and len(c.members) > 1:
                cand = c
                break
        if cand is None:
            # broadest cluster with >1 member
            best = (-1.0, None)
            for c in vc:
                if len(c.members) > 1 and c.variance > best[0]:
                    best = (c.variance, c)
            cand = best[1]
        if cand is None:
            return
        m = np.array(cand.members)
        sub = self.points.D[np.ix_(m, m)]
        far = np.unravel_index(np.argmax(sub), sub.shape)
        a, b = int(m[far[0]]), int(m[far[1]])
        ca, cb = _Cluster(a), _Cluster(b)
        for p in cand.members:
            if self.points.dist_sq(p, a) <= self.points.dist_sq(p, b):
                ca.variance += (self.points.dist_sq(p, a) - ca.variance) / (len(ca.members) + 1)
                ca.members.append(p)
            else:
                cb.variance += (self.points.dist_sq(p, b) - cb.variance) / (len(cb.members) + 1)
                cb.members.append(p)
        vc.remove(cand)
        vc.append(ca)
        vc.append(cb)

    # ---- public API ---------------------------------------------------
    def find_good_clustering(self, n: int) -> list[list[int]]:
        """n random restarts of plain k-medoids at k_max; returns the best
        state as [centroid, members...] lists."""
        best_state, best_var = None, np.inf
        for _ in range(n + 1):
            vc = [_Cluster() for _ in range(self.k_max)]
            for i, c in enumerate(vc):
                c.members.append(i)
            for p in range(self.k_max, self.num_points):
                self._random_cluster(vc).members.append(p)
            for c in vc:
                self._update_centroid(c)
            var = self.cluster(vc)
            if var < best_var:
                best_var = var
                best_state = [c.copy() for c in vc]
        return self._output(best_state)

    def simulated_annealing(self, max_var: float) -> list[list[int]]:
        vc = [_Cluster() for _ in range(self.k_max)]
        for i, c in enumerate(vc):
            c.members.append(i)
        for p in range(self.k_max, self.num_points):
            self._random_cluster(vc).members.append(p)
        for c in vc:
            self._update_centroid(c)
        e = self.cluster(vc)
        self.kT = max(e, 1e-6)

        # grow until the variance constraint passes
        guard = 0
        while not self._below_max_var(vc, max_var) and guard < 200:
            guard += 1
            if self.kT < 1:
                self.kT = e * 10
                for _ in range(10):
                    if len(vc) < self.num_points:
                        self._split_one(vc)
            for _ in range(100):
                nxt = [c.copy() for c in vc]
                self._merge_two(nxt)
                self._split_one(nxt)
                e_next = self.cluster(nxt)
                if self._below_max_var(nxt, max_var):
                    vc = nxt
                    break
                if np.exp(-(e_next - e) / max(self.kT, 1e-9)) > self.rng.uniform():
                    vc = nxt
                    e = e_next
            else:
                self.kT *= 0.9
                continue
            break

        # shrink keeping the smallest k that still passes
        e = self.cluster(vc)
        self.kT = max(e, 1.5)
        final = [c.copy() for c in vc]
        e_best = e
        best = [c.copy() for c in vc]
        while self.kT > 1.0:
            for _ in range(len(vc) * len(vc)):
                nxt = [c.copy() for c in vc]
                self._merge_two(nxt)
                self._split_one(nxt)
                e_next = self.cluster(nxt)
                if e_next < e_best:
                    best = [c.copy() for c in nxt]
                    e_best = e_next
                if self._below_max_var(nxt, max_var):
                    final = [c.copy() for c in nxt]
                    if len(nxt) > 1:
                        self._merge_two(nxt)
                        e = self.cluster(nxt)
                        best = [c.copy() for c in nxt]
                        e_best = e
                        vc = nxt
                        self.kT = e_best * 100
                    break
                if np.exp(-(e_next - e) / max(self.kT, 1e-9)) > self.rng.uniform():
                    vc = nxt
                    e = e_next
            self.kT *= 0.9
        return self._output(final)

    @staticmethod
    def _output(vc: list[_Cluster]) -> list[list[int]]:
        out = []
        for c in vc:
            row = [c.centroid] + [m for m in c.members if m != c.centroid]
            out.append(row)
        return out
