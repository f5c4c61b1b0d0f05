"""Byte parity of the O(Q*T) affine fast path (ops/dp_affine) vs the
general candidate-scan oracle (ops/dp_ref) — full H/PQ/PT equality,
every alignment mode, global and local, plus the DPMatrix routing."""

from __future__ import annotations

import numpy as np
import pytest

from alignment_algos_tpu.ops import dp_affine, dp_ref
from alignment_algos_tpu.scoring.base import (DPCosts,
                                              affine_deletion_table,
                                              ins_zero_flags)
from alignment_algos_tpu.utils.params import AlignT


def _affine_costs(rng, q2, t2, gi, ge, at, smax=11):
    S = rng.integers(-4, smax + 1, (q2, t2)).astype(np.float32)
    S[0, :] = S[-1, :] = 0.0
    S[:, 0] = S[:, -1] = 0.0
    gi_v = np.full(t2, gi, np.float32)
    ge_v = np.full(t2, ge, np.float32)
    D = affine_deletion_table(
        np.minimum(gi_v[:, None], gi_v[None, :]),
        np.minimum(ge_v[:, None], ge_v[None, :]), at)
    zh, zt = ins_zero_flags(at)
    return DPCosts(S=S, D=D, A=gi_v.copy(), B=ge_v.copy(),
                   ins_zero_head_q=zh, ins_zero_tail_q=zt,
                   del_gi_vec=gi_v, del_ge_vec=ge_v, del_align=at)


MODES = [AlignT.GLOBAL, AlignT.SEMI_LOCAL, AlignT.LOCAL,
         AlignT.LOCAL_GLOBAL, AlignT.GLOBAL_LOCAL]


@pytest.mark.parametrize("at", MODES)
@pytest.mark.parametrize("shape", [(12, 17), (33, 21), (64, 64)])
def test_affine_equals_ref(at, shape):
    rng = np.random.default_rng(shape[0] * 100 + int(at))
    q2, t2 = shape
    for gi, ge in ((11.0, 1.0), (5.0, 2.0), (3.0, 3.0), (2.0, 4.0)):
        c = _affine_costs(rng, q2, t2, gi, ge, at)
        aff = dp_affine.affine_consts(c)
        assert aff is not None
        for local in (False, True):
            ref = dp_ref.build_forward(c, 0, q2 - 1, 0, t2 - 1, local=local)
            got = dp_affine.build_forward_affine(
                c, 0, q2 - 1, 0, t2 - 1, aff[0], aff[1], local=local)
            assert np.array_equal(got.H, ref.H), (at, gi, ge, local)
            assert np.array_equal(got.PQ, ref.PQ), (at, gi, ge, local)
            assert np.array_equal(got.PT, ref.PT), (at, gi, ge, local)


def test_tie_rich_costs():
    """Constant similarity forces maximal ties — the argmax-first and
    strict-improvement rules must survive the prefix reformulation."""
    rng = np.random.default_rng(0)
    for at in (AlignT.GLOBAL, AlignT.LOCAL):
        q2 = t2 = 24
        c = _affine_costs(rng, q2, t2, 4.0, 1.0, at)
        c.S[1:-1, 1:-1] = 2.0  # every match equal
        aff = dp_affine.affine_consts(c)
        for local in (False, True):
            ref = dp_ref.build_forward(c, 0, q2 - 1, 0, t2 - 1, local=local)
            got = dp_affine.build_forward_affine(
                c, 0, q2 - 1, 0, t2 - 1, aff[0], aff[1], local=local)
            assert np.array_equal(got.H, ref.H)
            assert np.array_equal(got.PQ, ref.PQ)
            assert np.array_equal(got.PT, ref.PT)


def test_gate_rejects_nonaffine():
    rng = np.random.default_rng(1)
    c = _affine_costs(rng, 10, 10, 11.0, 1.0, AlignT.GLOBAL)
    c.S[3, 4] = np.float32(0.1)  # non-dyadic similarity
    assert dp_affine.affine_consts(c) is None
    c2 = _affine_costs(rng, 10, 10, 11.0, 1.0, AlignT.GLOBAL)
    c2.del_gi_vec[3] = 7.0  # position-specific gap
    assert dp_affine.affine_consts(c2) is None
    # the reference's fractional default penalties (4.73/0.34) are not
    # dyadic: candidate-order rounding is load-bearing there
    c3 = _affine_costs(rng, 10, 10, np.float32(4.73), np.float32(0.34),
                       AlignT.GLOBAL)
    assert dp_affine.affine_consts(c3) is None


def test_dyadic_costs_accepted_and_match():
    """Multiples of 2^-8 are order-free in f32 below 2^14 — the gate's
    second tier; byte parity must hold."""
    rng = np.random.default_rng(4)
    for at in (AlignT.GLOBAL, AlignT.LOCAL):
        q2 = t2 = 30
        c = _affine_costs(rng, q2, t2, 10.5, 0.25, at)
        c.S[1:-1, 1:-1] = (rng.integers(-16, 49, (q2 - 2, t2 - 2))
                           .astype(np.float32) * np.float32(0.25))
        aff = dp_affine.affine_consts(c)
        assert aff is not None
        for local in (False, True):
            ref = dp_ref.build_forward(c, 0, q2 - 1, 0, t2 - 1, local=local)
            got = dp_affine.build_forward_affine(
                c, 0, q2 - 1, 0, t2 - 1, aff[0], aff[1], local=local)
            assert np.array_equal(got.H, ref.H)
            assert np.array_equal(got.PQ, ref.PQ)
            assert np.array_equal(got.PT, ref.PT)


def test_dpmatrix_routes_and_matches():
    from alignment_algos_tpu.core.dp import DPMatrix, set_backend
    from alignment_algos_tpu.scoring.aasub import AASubstitutionEval
    from alignment_algos_tpu.scoring.submatrix import BlosumMatrix
    from alignment_algos_tpu.seq.sequence import AASequence
    from alignment_algos_tpu.utils.params import AliParams
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    bl = BlosumMatrix(os.path.join(root, "tests", "data", "BLOSUM62"))
    rng = np.random.default_rng(2)
    alpha = "ARNDCQEGHILKMFPSTWYV"

    def mkseq(n):
        s = AASequence()
        s.append("".join(alpha[i] for i in rng.integers(0, 20, n)))
        return s

    for align_type in (0, 1, 2):
        ap = AliParams()
        ap.align_type = align_type
        ev = AASubstitutionEval(ap, bl)
        q, t = mkseq(40), mkseq(52)
        dpm = DPMatrix(q, t, ev, "fwd", ap.align_type)
        # reference result via the forced oracle path
        os.environ["AAT_AFFINE_FAST"] = "0"
        try:
            dpm_ref = DPMatrix(q, t, ev, "fwd", ap.align_type)
        finally:
            os.environ.pop("AAT_AFFINE_FAST", None)
        assert np.array_equal(dpm.res.H, dpm_ref.res.H)
        assert np.array_equal(dpm.res.PQ, dpm_ref.res.PQ)
        assert np.array_equal(dpm.res.PT, dpm_ref.res.PT)
