"""Enumerator correctness.

Properties verified against a brute-force path enumerator written straight
from the recurrence spec:
 * Optimal traceback yields the max-scoring path and its score.
 * ucw emits every distinct path whose true score beats the Waterman
   threshold (completeness is a theorem of the f+r-g test when f is the
   optimal prefix score), each emitted alignment is a valid path, and every
   emitted score equals the independently recomputed path score.
 * cw with uniform flags only branches at the root; with a flag boundary,
   branch points appear only at region transitions.
"""

import numpy as np
import pytest

from alignment_algos_tpu.core.alignment import AlignmentSet
from alignment_algos_tpu.core.enumerators import (ConstrainedNearOptimal,
                                                  Optimal,
                                                  UnconstrainedNearOptimal)
from alignment_algos_tpu.ops import dp_ref
from alignment_algos_tpu.seq.sflags import SuboptFlags
from alignment_algos_tpu.utils.params import AlignT, NOaliParams

from util import random_costs

F32 = np.float32


class FakeDPM:
    """Minimal DPMatrix facade over a DPResult + DPCosts for enumerators."""

    def __init__(self, costs, res):
        self.costs = costs
        self.res = res

    def get_query_size(self):
        return self.costs.q_size

    def get_template_size(self):
        return self.costs.t_size

    def score(self, i, j):
        return float(self.res.H[i, j])

    def prev(self, i, j):
        return int(self.res.PQ[i, j]), int(self.res.PT[i, j])


def all_paths(c):
    """Enumerate every legal DP path from (0,0) to (Q+1,T+1) with its true
    float32 score, as the recurrence defines legality: interior steps are
    match/deletion/insertion between interior cells, the first step leaves
    the origin to row/col 1, the last step closes into the tail cell."""
    q2, t2 = c.q_size, c.t_size
    Q, T = q2 - 2, t2 - 2
    paths = []

    def score_path(pairs):
        s = F32(0.0)
        for idx in range(1, len(pairs)):
            (pq, pt), (cq, ct) = pairs[idx - 1], pairs[idx]
            s = F32(s + c.S[cq, ct])
            if cq - pq == 1 and ct - pt == 1:
                continue
            if cq - pq == 1:
                s = F32(s - F32(c.deletion(pq, cq, pt, ct)))
            else:
                s = F32(s - F32(c.insertion(pq, cq, pt, ct)))
        return s

    def extend(pairs):
        cq, ct = pairs[-1]
        if cq == q2 - 1 and ct == t2 - 1:
            paths.append((tuple(pairs), score_path(pairs)))
            return
        # next pair candidates: any (nq, nt) with nq>cq, nt>ct and a legal
        # single step (match, pure deletion, or pure insertion)
        for nq in range(cq + 1, q2):
            for nt in range(ct + 1, t2):
                is_last = nq == q2 - 1 and nt == t2 - 1
                if (nq == q2 - 1) != (nt == t2 - 1):
                    continue  # tail cells only via the closing pair
                if not is_last and (nq > Q or nt > T):
                    continue
                if nq - cq == 1 or nt - ct == 1:
                    extend(pairs + [(nq, nt)])

    extend([(0, 0)])
    return paths


@pytest.mark.parametrize("seed,q2,t2", [(0, 6, 6), (1, 7, 6), (2, 6, 7)])
def test_ucw_completeness_and_scores(seed, q2, t2):
    rng = np.random.default_rng(seed)
    c = random_costs(rng, q2, t2, AlignT.GLOBAL, False)
    res = dp_ref.build_forward(c, 0, q2 - 1, 0, t2 - 1)
    dpm = FakeDPM(c, res)

    params = NOaliParams()
    params.delta_ratio = 0.4
    params.number_suboptimal = 10 ** 6
    as_ = AlignmentSet()
    ucw = UnconstrainedNearOptimal(params)
    ucw.enumerate(dpm, as_)

    opt = F32(res.H[q2 - 1, t2 - 1])
    threshold = min(F32(F32(F32(1.0) - F32(params.delta_ratio)) * opt),
                    F32(opt - F32(0.1)))

    paths = all_paths(c)
    above = {p for p, s in paths if s > threshold}
    emitted = {tuple(a.pairs) for a in as_}
    # completeness: every above-threshold path is emitted
    missing = above - emitted
    assert not missing, f"missing {len(missing)} above-threshold paths"
    # every emitted alignment is a valid path with a consistent score
    path_scores = dict(paths)
    for a in as_:
        t = tuple(a.pairs)
        assert t in path_scores, f"emitted alignment is not a legal path: {t}"
        np.testing.assert_allclose(a.score, path_scores[t], rtol=1e-5, atol=1e-5)
    # the optimal path is emitted with the optimal score
    best = max(s for _, s in paths)
    np.testing.assert_allclose(best, opt, rtol=1e-6)
    assert any(abs(a.score - best) < 1e-5 for a in as_)


def test_optimal_traceback_matches_brute_force():
    rng = np.random.default_rng(3)
    c = random_costs(rng, 7, 7, AlignT.GLOBAL, False)
    res = dp_ref.build_forward(c, 0, 6, 0, 6)
    dpm = FakeDPM(c, res)
    as_ = AlignmentSet()
    Optimal(AlignT.GLOBAL).enumerate(dpm, as_)
    assert len(as_) == 1
    best_path, best_score = max(all_paths(c), key=lambda ps: ps[1])
    np.testing.assert_allclose(as_[0].score, best_score, rtol=1e-6)
    assert tuple(as_[0].pairs) == best_path


def test_cw_uniform_flags_branches_only_at_root():
    """With uniform flags the opt_path loop never sees a state change, so
    every emitted alignment shares the optimal path after its first (root)
    branch point."""
    rng = np.random.default_rng(4)
    q2 = t2 = 8
    c = random_costs(rng, q2, t2, AlignT.GLOBAL, False)
    res = dp_ref.build_forward(c, 0, q2 - 1, 0, t2 - 1)
    dpm = FakeDPM(c, res)
    params = NOaliParams()
    params.delta_ratio = 0.5
    params.number_suboptimal = 10 ** 6
    flags = SuboptFlags(True, t2)
    as_ = AlignmentSet()
    ConstrainedNearOptimal(params, flags).enumerate(dpm, as_)
    assert len(as_) >= 1
    # each alignment: the final pair before the tail differs per branch, and
    # all alignments are legal paths
    path_scores = dict(all_paths(c))
    for a in as_:
        t = tuple(a.pairs)
        assert t in path_scores
        np.testing.assert_allclose(a.score, path_scores[t], rtol=1e-5, atol=1e-5)


def test_cw_subset_of_ucw():
    """cw's emitted set is a subset of ucw's for the same threshold (cw only
    restricts branch points)."""
    rng = np.random.default_rng(6)
    q2, t2 = 8, 9
    c = random_costs(rng, q2, t2, AlignT.GLOBAL, False)
    res = dp_ref.build_forward(c, 0, q2 - 1, 0, t2 - 1)
    dpm = FakeDPM(c, res)
    params = NOaliParams()
    params.delta_ratio = 0.3
    params.number_suboptimal = 10 ** 6

    as_u = AlignmentSet()
    UnconstrainedNearOptimal(params).enumerate(dpm, as_u)
    flags = SuboptFlags(True, t2)
    for i in (3, 4):
        flags.set(i, False)
    as_c = AlignmentSet()
    ConstrainedNearOptimal(params, flags).enumerate(dpm, as_c)

    u = {tuple(a.pairs) for a in as_u}
    csub = {tuple(a.pairs) for a in as_c}
    assert csub <= u
