"""DP engine correctness: numpy oracle vs brute force vs JAX engine."""

import numpy as np
import pytest

from alignment_algos_tpu.ops import dp_engine, dp_ref
from alignment_algos_tpu.utils.params import AlignT

from util import brute_force_dp, random_costs


CASES = [
    # (q2, t2, align_type, zero_flags, local)
    (8, 9, AlignT.GLOBAL, False, False),
    (9, 7, AlignT.SEMI_LOCAL, True, False),
    (10, 10, AlignT.GLOBAL, False, True),
    (14, 11, AlignT.GLOBAL_LOCAL, True, False),
    (7, 13, AlignT.LOCAL, True, True),
]


@pytest.mark.parametrize("q2,t2,atype,zf,local", CASES)
def test_ref_matches_brute_force(q2, t2, atype, zf, local):
    rng = np.random.default_rng(q2 * 100 + t2)
    c = random_costs(rng, q2, t2, atype, zf)
    res = dp_ref.build_forward(c, 0, q2 - 1, 0, t2 - 1, local=local)
    H, PQ, PT = brute_force_dp(c, 0, q2 - 1, 0, t2 - 1, local=local)
    np.testing.assert_array_equal(res.H, H)
    np.testing.assert_array_equal(res.PQ, PQ)
    np.testing.assert_array_equal(res.PT, PT)


@pytest.mark.parametrize("q2,t2,atype,zf,local", CASES)
def test_jax_matches_ref_forward(q2, t2, atype, zf, local):
    rng = np.random.default_rng(q2 * 100 + t2)
    c = random_costs(rng, q2, t2, atype, zf)
    ref = dp_ref.build_forward(c, 0, q2 - 1, 0, t2 - 1, local=local)
    jx = dp_engine.build_forward_jax(c, 0, q2 - 1, 0, t2 - 1, local=local)
    np.testing.assert_allclose(jx.H, ref.H, rtol=0, atol=0)
    np.testing.assert_array_equal(jx.PQ, ref.PQ)
    np.testing.assert_array_equal(jx.PT, ref.PT)


@pytest.mark.parametrize("q2,t2,atype,zf,local", CASES)
def test_jax_matches_ref_reverse(q2, t2, atype, zf, local):
    rng = np.random.default_rng(q2 * 7 + t2)
    c = random_costs(rng, q2, t2, atype, zf)
    ref = dp_ref.build_reverse(c, 0, q2 - 1, 0, t2 - 1, local=local)
    jx = dp_engine.build_reverse_jax(c, 0, q2 - 1, 0, t2 - 1, local=local)
    np.testing.assert_allclose(jx.H, ref.H, rtol=0, atol=0)
    np.testing.assert_array_equal(jx.PQ, ref.PQ)
    np.testing.assert_array_equal(jx.PT, ref.PT)


def test_subdpm_anchored():
    """Sub-rectangle builds (build_subdpm) agree between oracle and engine."""
    rng = np.random.default_rng(0)
    c = random_costs(rng, 16, 15, AlignT.GLOBAL, False)
    for (q0, t0, q1, t1) in [(2, 3, 10, 12), (1, 1, 14, 13), (4, 2, 7, 9)]:
        ref = dp_ref.build_forward(c, q0, q1, t0, t1)
        jx = dp_engine.build_forward_jax(c, q0, q1, t0, t1)
        np.testing.assert_array_equal(jx.H, ref.H)
        np.testing.assert_array_equal(jx.PQ, ref.PQ)
        np.testing.assert_array_equal(jx.PT, ref.PT)


def test_forced_single_row_cases():
    rng = np.random.default_rng(1)
    c = random_costs(rng, 8, 8, AlignT.GLOBAL, False)
    r1 = dp_ref.build_forward(c, 2, 3, 1, 6)   # q1 == q0+1 forces deletion
    assert r1.PQ[3, 6] == 2 and r1.PT[3, 6] == 1
    r2 = dp_ref.build_forward(c, 1, 6, 2, 3)   # t1 == t0+1 forces insertion
    assert r2.PQ[6, 3] == 1 and r2.PT[6, 3] == 2


def test_rev_bug_compat_flag():
    """The dpmatrix.h:868 defect: reverse non-local closing-cell insertion
    winner records prev_template = t1-1."""
    rng = np.random.default_rng(5)
    # craft costs where an insertion wins the closing scan: make the
    # boundary column extremely attractive
    c = random_costs(rng, 10, 10, AlignT.GLOBAL, False)
    c.S[1:-1, -2] += np.float32(50.0)  # reverse boundary col j = t1-1
    ref_bug = dp_ref.build_reverse(c, 0, 9, 0, 9, bug_compat=True)
    ref_fix = dp_ref.build_reverse(c, 0, 9, 0, 9, bug_compat=False)
    jx_bug = dp_engine.build_reverse_jax(c, 0, 9, 0, 9, bug_compat=True)
    np.testing.assert_array_equal(jx_bug.PT, ref_bug.PT)
    if ref_bug.PQ[0, 0] > 1:  # insertion won: fixed build differs
        assert ref_fix.PT[0, 0] == 1
        assert ref_bug.PT[0, 0] == 8
