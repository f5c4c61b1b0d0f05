"""Exact general-gap Pallas kernel: bit parity vs the numpy oracle engine
(runs the Pallas interpreter on the CPU test backend; on TPU the same kernel
compiles to Mosaic)."""

import os

import numpy as np
import pytest

from alignment_algos_tpu.ops import dp_pallas, dp_ref
from alignment_algos_tpu.scoring.base import DPCosts
from alignment_algos_tpu.utils.params import AlignT

from util import random_costs

CASES = [
    (8, 9, AlignT.GLOBAL, False, False),
    (9, 7, AlignT.SEMI_LOCAL, True, False),
    (10, 10, AlignT.GLOBAL, False, True),
    (14, 11, AlignT.GLOBAL_LOCAL, True, False),
    (7, 13, AlignT.LOCAL, True, True),
    (33, 18, AlignT.GLOBAL, False, False),
]


@pytest.mark.parametrize("q2,t2,atype,zf,local", CASES)
def test_pallas_matches_oracle(q2, t2, atype, zf, local):
    rng = np.random.default_rng(q2 * 1000 + t2)
    c = random_costs(rng, q2, t2, atype, zf)
    ref = dp_ref.build_forward(c, 0, q2 - 1, 0, t2 - 1, local=local)
    H = dp_pallas.forward_h_batched([c], local=local, interpret=True)[0]
    np.testing.assert_array_equal(H, ref.H)


def test_pallas_batched_matches_each():
    rng = np.random.default_rng(42)
    costs = [random_costs(rng, 12, 15, AlignT.GLOBAL, False)
             for _ in range(5)]
    Hs = dp_pallas.forward_h_batched(costs, interpret=True)
    for c, H in zip(costs, Hs):
        ref = dp_ref.build_forward(c, 0, 11, 0, 14)
        np.testing.assert_array_equal(H, ref.H)


def test_pallas_with_c_column_and_offset():
    """gn2-style generalized insertion: extra C[j] term and dist offset."""
    rng = np.random.default_rng(7)
    c = random_costs(rng, 13, 12, AlignT.GLOBAL, False)
    c2 = DPCosts(S=c.S, D=c.D, A=c.A, B=c.B,
                 ins_zero_head_q=False, ins_zero_tail_q=False,
                 C=rng.uniform(0.0, 1.0, 12).astype(np.float32),
                 ins_dist_offset=1)
    ref = dp_ref.build_forward(c2, 0, 12, 0, 11)
    H = dp_pallas.forward_h_batched([c2], interpret=True)[0]
    np.testing.assert_array_equal(H, ref.H)


def test_pallas_hmap_cost_model_scores():
    """Flagship path: HMAP profile-profile cost models through the kernel,
    scores bit-equal to the full DPMatrix build."""
    from alignment_algos_tpu.core.dp import DPMatrix
    from alignment_algos_tpu.scoring.hmap_eval import HMAPaliEval
    from alignment_algos_tpu.seq.hmap import HMAPSequence
    from alignment_algos_tpu.utils.params import HMAPaliParams

    data = os.path.join(os.path.dirname(__file__), "golden", "inputs")
    query = HMAPSequence.from_file(os.path.join(data, "qA.prof"))
    templ = HMAPSequence.from_file(os.path.join(data, "tA.prof"))
    params = HMAPaliParams()
    ev = HMAPaliEval(params)
    c = ev.build_costs(query, templ)
    dpm = DPMatrix(query, templ, HMAPaliEval(params), "fwd",
                   params.align_type)
    H = dp_pallas.forward_h_batched([c], interpret=True)[0]
    np.testing.assert_array_equal(H, dpm.res.H)


def test_tiny_shapes_fall_back():
    rng = np.random.default_rng(3)
    c = random_costs(rng, 3, 3, AlignT.GLOBAL, False)
    ref = dp_ref.build_forward(c, 0, 2, 0, 2)
    H = dp_pallas.forward_h_batched([c], interpret=True)[0]
    np.testing.assert_array_equal(H, ref.H)
