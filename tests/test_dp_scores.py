"""Batched exact general-gap scores kernel: bit parity vs the numpy
oracle engine (Pallas interpreter on the CPU test backend; real-chip
Mosaic parity at production sizes is covered by test_tpu_hardware.py)."""

import numpy as np
import pytest

from alignment_algos_tpu.ops import dp_ref, dp_scores
from alignment_algos_tpu.scoring.base import DPCosts
from alignment_algos_tpu.utils.params import AlignT

from util import random_costs

CASES = [
    (8, 9, AlignT.GLOBAL, False, False),
    (9, 7, AlignT.SEMI_LOCAL, True, False),
    (10, 10, AlignT.GLOBAL, False, True),
    (14, 11, AlignT.GLOBAL_LOCAL, True, False),
]


def _refs(costs, local=False):
    return np.array([dp_ref.build_forward(
        c, 0, c.q_size - 1, 0, c.t_size - 1, local=local).H[-1, -1]
        for c in costs], np.float32)


@pytest.mark.parametrize("q2,t2,atype,zf,local", CASES)
def test_scores_match_oracle(q2, t2, atype, zf, local):
    rng = np.random.default_rng(q2 * 1000 + t2)
    c = random_costs(rng, q2, t2, atype, zf)
    got = dp_scores.forward_scores_batch([c], local=local, interpret=True)
    np.testing.assert_array_equal(got, _refs([c], local))


def test_scores_batched_cross_group():
    """More pairs than one group (B=8): exercises the per-group DMA path
    and the padding lanes."""
    rng = np.random.default_rng(42)
    costs = [random_costs(rng, 12, 15, AlignT.GLOBAL, False)
             for _ in range(10)]
    got = dp_scores.forward_scores_batch(costs, interpret=True)
    np.testing.assert_array_equal(got, _refs(costs))


def test_scores_with_c_column_and_offset():
    """gn2-style generalized insertion: extra C[j] term and dist offset."""
    rng = np.random.default_rng(7)
    c = random_costs(rng, 13, 12, AlignT.GLOBAL, False)
    c2 = DPCosts(S=c.S, D=c.D, A=c.A, B=c.B,
                 ins_zero_head_q=False, ins_zero_tail_q=False,
                 C=rng.normal(0, 1, c.t_size).astype(np.float32),
                 ins_dist_offset=1)
    got = dp_scores.forward_scores_batch([c2], interpret=True)
    np.testing.assert_array_equal(got, _refs([c2]))
