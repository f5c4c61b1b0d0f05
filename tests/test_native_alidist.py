"""Native ali-dist engine (native/alidist.cpp) vs the pure-Python AliDist:
bit-identical float32 areas on fuzzed alignment polylines."""

import numpy as np
import pytest

from alignment_algos_tpu.analysis.ali_dist import (AliDist, ResPair,
                                                   _load_native, area_matrix,
                                                   area_one_to_many)


def random_vrp(rng, t_end: int, q_end: int) -> list:
    """Monotone polyline from (0,0) to (t_end, q_end) — the shape of a real
    matched-pair list with sentinel head/tail pairs."""
    n = int(rng.integers(2, 12))
    ts = np.sort(rng.choice(np.arange(1, t_end), size=n, replace=False))
    qs = np.sort(rng.choice(np.arange(1, q_end), size=n, replace=False))
    pts = [ResPair(0, 0)]
    pts += [ResPair(int(t), int(q)) for t, q in zip(ts, qs)]
    pts.append(ResPair(t_end, q_end))
    return pts


def python_area_matrix(vrps):
    k = len(vrps)
    out = np.zeros((k, k), dtype=np.float32)
    X = AliDist()
    for i in range(k):
        X.load_main_vrp(vrps[i])
        for j in range(i):
            X.load_test_vrp(vrps[j])
            out[i, j] = out[j, i] = np.float32(
                X.get_area_between_main_and_test())
    return out


@pytest.mark.skipif(_load_native() is None, reason="no C++ toolchain")
def test_native_matches_python_bitexact():
    rng = np.random.default_rng(11)
    for trial in range(6):
        t_end = int(rng.integers(20, 60))
        q_end = int(rng.integers(20, 60))
        vrps = [random_vrp(rng, t_end, q_end) for _ in range(8)]
        native = area_matrix(vrps)
        ref = python_area_matrix(vrps)
        np.testing.assert_array_equal(native, ref)


@pytest.mark.skipif(_load_native() is None, reason="no C++ toolchain")
def test_one_to_many_matches_matrix_row():
    rng = np.random.default_rng(3)
    vrps = [random_vrp(rng, 40, 50) for _ in range(6)]
    full = area_matrix(vrps)
    row = area_one_to_many(vrps[-1], vrps[:-1])
    np.testing.assert_array_equal(row, full[-1, :-1])


def test_python_fallback_used_when_forced(monkeypatch):
    monkeypatch.setenv("AAT_ALIDIST_BACKEND", "python")
    rng = np.random.default_rng(5)
    vrps = [random_vrp(rng, 30, 30) for _ in range(4)]
    out = area_matrix(vrps)
    np.testing.assert_array_equal(out, python_area_matrix(vrps))
