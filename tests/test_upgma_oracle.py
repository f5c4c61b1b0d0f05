"""UPGMA parity vs the compiled reference clusterer (oracle_upgma driver
over UPGMA_Clusterer.cpp / UPGMA_Tree.cpp), including tie-rich matrices
where the reference's slot-swap mechanics drive the merge order."""

import os
import subprocess

import numpy as np
import pytest

from alignment_algos_tpu.analysis.upgma import UPGMAClusterer

ORACLE = "/tmp/refbuild/oracle_upgma"

pytestmark = pytest.mark.skipif(
    not os.path.exists(ORACLE),
    reason="reference oracle not built (run tools/build_reference.py)")


def _run_oracle(d: np.ndarray, thresholds):
    n = d.shape[0]
    path = "/tmp/upgma_case.txt"
    with open(path, "w") as f:
        f.write(f"{n}\n")
        for row in d:
            f.write(" ".join(f"{x:.8g}" for x in row) + "\n")
    r = subprocess.run([ORACLE, path] + [f"{t:.8g}" for t in thresholds],
                       capture_output=True, text=True, timeout=60)
    assert r.returncode == 0, r.stderr[-500:]
    out = {}
    cur = None
    for line in r.stdout.splitlines():
        if line.startswith("threshold "):
            cur = float(line.split()[1])
            out[cur] = []
        elif line.startswith("cluster "):
            out[cur].append([int(x) for x in line.split(":")[1].split()])
    merge_dists = []
    for line in r.stderr.splitlines():
        if "curr_min_dist:" in line:
            merge_dists.append(float(line.split("curr_min_dist:")[1]))
    # stderr repeats per threshold run; keep the first n-2 merges
    return out, merge_dists[: n - 2]


def _case(d: np.ndarray, thresholds):
    d = d.astype(np.float32)
    oracle_clusters, oracle_merges = _run_oracle(d, thresholds)
    for t in thresholds:
        c = UPGMAClusterer(d)
        c.cluster()
        ours = c.find_clusters_under_threshold(t)
        assert ours == oracle_clusters[float(f"{t:.8g}")], (
            f"thresh {t}: {ours} != {oracle_clusters[float(f'{t:.8g}')]}")
    c = UPGMAClusterer(d)
    c.cluster()
    np.testing.assert_allclose(c.merge_dists[: len(oracle_merges)],
                               oracle_merges, rtol=2e-5, atol=1e-6)


@pytest.mark.parametrize("n,seed", [(5, 0), (8, 1), (12, 2), (20, 3)])
def test_random_matrices(n, seed):
    rng = np.random.default_rng(seed)
    d = rng.uniform(0.05, 2.0, (n, n)).astype(np.float32)
    d = ((d + d.T) / 2).astype(np.float32)
    np.fill_diagonal(d, 0.0)
    _case(d, [0.2, 0.5, 0.8, 1.2, 3.0])


@pytest.mark.parametrize("n,seed", [(7, 10), (10, 11), (16, 12)])
def test_tie_rich_matrices(n, seed):
    """Quantized distances create many exact ties; the merge order then
    depends entirely on the reference's slot-swap scan order."""
    rng = np.random.default_rng(seed)
    vals = np.array([0.25, 0.5, 0.75, 1.0], np.float32)
    d = vals[rng.integers(0, len(vals), (n, n))]
    d = np.maximum(d, d.T)
    np.fill_diagonal(d, 0.0)
    _case(d, [0.3, 0.6, 0.9, 2.0])


def test_all_equal_distances():
    n = 9
    d = np.full((n, n), 0.5, np.float32)
    np.fill_diagonal(d, 0.0)
    _case(d, [0.1, 0.4, 0.6])
