"""Native exact-DP engine (native/dpref.cpp) vs the numpy dp_ref:
bit-identical scores AND tracebacks on fuzzed cost models, all directions,
boundary modes, sub-rectangles, and the bug-compat reverse closing scan."""

import numpy as np
import pytest

from alignment_algos_tpu.ops import dp_ref
from alignment_algos_tpu.scoring.base import DPCosts


def random_costs(rng, q2, t2, with_c=False, off=2, zh=False, zt=False):
    S = np.zeros((q2, t2), np.float32)
    S[1:-1, 1:-1] = rng.standard_normal((q2 - 2, t2 - 2)).astype(np.float32)
    D = np.zeros((t2, t2), np.float32)
    k = np.arange(t2)
    dist = k[None, :] - k[:, None]
    gi = rng.uniform(1, 6)
    ge = rng.uniform(0.05, 0.8)
    D[:] = np.where(dist >= 2, (gi + ge * (dist - 2)), 0.0).astype(np.float32)
    A = rng.uniform(1, 6, t2).astype(np.float32)
    B = rng.uniform(0.05, 0.8, t2).astype(np.float32)
    C = rng.uniform(0, 0.5, t2).astype(np.float32) if with_c else None
    return DPCosts(S=S, D=D, A=A, B=B, ins_zero_head_q=zh,
                   ins_zero_tail_q=zt, C=C, ins_dist_offset=off)


def assert_same(a: dp_ref.DPResult, b: dp_ref.DPResult):
    np.testing.assert_array_equal(a.H, b.H)
    np.testing.assert_array_equal(a.PQ, b.PQ)
    np.testing.assert_array_equal(a.PT, b.PT)


@pytest.mark.skipif(dp_ref._load_native() is None, reason="no C++ toolchain")
@pytest.mark.parametrize("direction", ["fwd", "rev"])
@pytest.mark.parametrize("local", [False, True])
def test_native_matches_python_fuzz(direction, local):
    rng = np.random.default_rng(hash((direction, local)) % 2**32)
    for trial in range(6):
        q2 = int(rng.integers(4, 28))
        t2 = int(rng.integers(4, 28))
        c = random_costs(rng, q2, t2,
                         with_c=bool(rng.integers(0, 2)),
                         off=int(rng.integers(1, 3)),
                         zh=bool(rng.integers(0, 2)),
                         zt=bool(rng.integers(0, 2)))
        for bounds in [(0, q2 - 1, 0, t2 - 1)] + (
                [(1, q2 - 2, 1, t2 - 2)] if q2 > 4 and t2 > 4 else []):
            q0, q1, t0, t1 = bounds
            if direction == "fwd":
                nat = dp_ref.build_forward(c, q0, q1, t0, t1, local=local)
                ref = dp_ref._build_forward_py(c, q0, q1, t0, t1, local=local)
                assert_same(nat, ref)
            else:
                for bc in (True, False):
                    nat = dp_ref.build_reverse(c, q0, q1, t0, t1,
                                               local=local, bug_compat=bc)
                    ref = dp_ref._build_reverse_py(c, q0, q1, t0, t1,
                                                   local=local, bug_compat=bc)
                    assert_same(nat, ref)


@pytest.mark.skipif(dp_ref._load_native() is None, reason="no C++ toolchain")
def test_forced_single_step_cases():
    rng = np.random.default_rng(9)
    c = random_costs(rng, 8, 8)
    for q0, q1, t0, t1 in [(2, 3, 1, 6), (1, 6, 2, 3)]:
        nat = dp_ref.build_forward(c, q0, q1, t0, t1)
        ref = dp_ref._build_forward_py(c, q0, q1, t0, t1)
        assert_same(nat, ref)
        nat = dp_ref.build_reverse(c, q0, q1, t0, t1)
        ref = dp_ref._build_reverse_py(c, q0, q1, t0, t1)
        assert_same(nat, ref)


def test_python_backend_forced(monkeypatch):
    monkeypatch.setenv("AAT_DPREF_BACKEND", "python")
    # reset the cached loader decision for this test
    monkeypatch.setattr(dp_ref, "_nlib", None)
    monkeypatch.setattr(dp_ref, "_ntried", False)
    rng = np.random.default_rng(2)
    c = random_costs(rng, 10, 12)
    out = dp_ref.build_forward(c, 0, 9, 0, 11)
    ref = dp_ref._build_forward_py(c, 0, 9, 0, 11)
    assert_same(out, ref)
