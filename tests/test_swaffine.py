"""Batched affine SW kernel correctness (runs in Pallas interpret mode on
the CPU test backend; on TPU the same code compiles to Mosaic)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from alignment_algos_tpu.ops import swaffine


def _interp(monkeypatch_on: bool = True):
    from jax.experimental.pallas import tpu as pltpu
    return pltpu.force_tpu_interpret_mode()


def test_skew_layout():
    rng = np.random.default_rng(0)
    s = rng.standard_normal((2, 5, 7)).astype(np.float32)
    sd = np.asarray(swaffine.skew_similarity(jnp.asarray(s)))
    assert sd.shape == (11, 8, 128)
    for bi in range(2):
        for i in range(5):
            for j in range(7):
                assert sd[i + j, i, bi] == s[bi, i, j]


@pytest.mark.parametrize("q,t,seed", [(8, 8, 0), (13, 10, 1)])
def test_sw_scores_match_gotoh_oracle(q, t, seed):
    rng = np.random.default_rng(seed)
    b = 4
    s = rng.integers(-4, 12, size=(b, q, t)).astype(np.float32)
    gi, ge = 11.0, 1.0
    ref = swaffine.sw_affine_reference(s, gi, ge)

    sd = swaffine.skew_similarity(jnp.asarray(s))
    gap = jnp.array([[gi, ge]], dtype=jnp.float32)
    with _interp():
        scores = swaffine.sw_affine_scores_from_skewed(sd, gap, q=q, t=t)
    np.testing.assert_allclose(np.asarray(scores)[:b], ref, rtol=0, atol=0)
    # the pure-XLA engine must agree exactly as well
    xla = swaffine.sw_affine_scores_xla(sd, gap, q=q, t=t)
    np.testing.assert_allclose(np.asarray(xla)[:b], ref, rtol=0, atol=0)


def test_sw_matches_general_dp_local():
    """Gotoh optimum equals the reference general-gap local DP optimum for
    affine costs."""
    from alignment_algos_tpu.ops import dp_ref
    from alignment_algos_tpu.scoring.base import DPCosts, affine_deletion_table
    from alignment_algos_tpu.utils.params import AlignT
    from alignment_algos_tpu.core.enumerators.optimal import Optimal

    rng = np.random.default_rng(3)
    q, t = 12, 14
    sim = rng.integers(-4, 10, size=(q, t)).astype(np.float32)
    gi, ge = 5.0, 0.5
    ref = swaffine.sw_affine_reference(sim[None], gi, ge)[0]

    # wrap sim into sentinel-bordered costs with LOCAL overhang rules
    S = np.zeros((q + 2, t + 2), np.float32)
    S[1:-1, 1:-1] = sim
    givec = np.full((t + 2, t + 2), np.float32(gi))
    gevec = np.full((t + 2, t + 2), np.float32(ge))
    D = affine_deletion_table(givec, gevec, AlignT.LOCAL)
    A = np.full(t + 2, np.float32(gi))
    B = np.full(t + 2, np.float32(ge))
    c = DPCosts(S=S, D=D, A=A, B=B, ins_zero_head_q=True, ins_zero_tail_q=True)
    res = dp_ref.build_forward(c, 0, q + 1, 0, t + 1, local=True)

    class FakeDPM:
        def __init__(self):
            self.res = res

        def get_query_size(self):
            return q + 2

        def get_template_size(self):
            return t + 2

        def score(self, i, j):
            return float(res.H[i, j])

        def prev(self, i, j):
            return int(res.PQ[i, j]), int(res.PT[i, j])

    qm, tm, local_max = Optimal._find_max(FakeDPM())
    np.testing.assert_allclose(local_max, ref, rtol=1e-6)
