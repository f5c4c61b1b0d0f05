"""Analysis layer: ali_dist parity vs the compiled get_area_diffs oracle,
UPGMA/k-medoids properties, shift metric sanity."""

import io
import os
import subprocess
import sys

import numpy as np
import pytest

from alignment_algos_tpu.analysis.ali_dist import AliDist
from alignment_algos_tpu.analysis.kmedoids import ClusterSet, KMedoidClusterer
from alignment_algos_tpu.analysis.upgma import UPGMAClusterer
from alignment_algos_tpu.core.alignment import Alignment

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ORACLE = "/tmp/refbuild/get_area_diffs"


def _make_fixture(tmp_path):
    """Native 2-record gapped FASTA + a PIR batch of perturbed alignments."""
    templ = "^" + "ACDEFGHIKLMNPQRSTVWY" * 2 + "$"
    natq = "^" + "ACDEFGHIKL--MNPQRSTVWYACDEFGHIKLMNPQ--RSTVWY"[:40] + "$"
    # pad query to same length as templ
    natq = natq[: len(templ) - 1] + "$"
    nat = tmp_path / "native.fa"
    nat.write_text(f"> t\n{templ}\n> q\n{natq}\n")

    piece = []
    quers = [
        "-ACDEFGHIKLMNPQRSTVWYACDEFGHIKLMNPQRSTVW-Y",
        "A-CDEFGHIKLMNPQRSTVWYACDEFGHIKLMNPQRSTVWY-",
        "-ACDEFGHIKLMNPQRSTV--WYACDEFGHIKLMNPQRSTVWY",
    ]
    for q in quers:
        t = templ.replace("^", "-").replace("$", "-")
        # equalize lengths by padding with gaps on the template side
        if len(q) > len(t):
            t = t + "-" * (len(q) - len(t))
        else:
            q = q + "-" * (len(t) - len(q))
        piece.append("#start\n\n>P1;t\nstructureN:t::::\n" + t +
                     "*\n\n>P1;q\nsequence:q::::\n" + q + "*\n\n#end\n")
    pir = tmp_path / "batch.pir"
    pir.write_text("".join(piece))
    return str(pir), str(nat)


@pytest.mark.skipif(not os.path.exists(ORACLE), reason="oracle not built")
def test_ali_dist_oracle_parity(tmp_path):
    pir, nat = _make_fixture(tmp_path)
    ref = subprocess.run([ORACLE, pir, nat], capture_output=True, text=True)
    assert ref.returncode == 0, ref.stderr[-500:]

    x = AliDist()
    x.load_main_fasta(nat)
    x.batch_compare_to_main_ali(pir)
    buf = io.StringIO()
    x.print_batch_dists(buf)
    mine = buf.getvalue()

    ml, rl = mine.splitlines(), ref.stdout.splitlines()
    assert len(ml) == len(rl)
    for a, b in zip(ml, rl):
        if a == b:
            continue
        # numeric comparison with tolerance
        at, bt = a.split("\t"), b.split("\t")
        assert len(at) == len(bt), (a, b)
        for u, v in zip(at, bt):
            try:
                fu, fv = float(u), float(v)
                assert abs(fu - fv) <= 1e-4 * max(1.0, abs(fv)), (a, b)
            except ValueError:
                assert u == v, (a, b)


def test_area_diff_symmetric_zero():
    a = Alignment()
    a.read_from("^ABCDE$", "^ABCDE$")
    b = Alignment()
    b.read_from("^ABCDE$", "^ABCDE$")
    assert a.get_area_diff(b) == 0.0


def test_area_diff_known_value():
    # identical except one pair shifted by 1 -> two unit triangles = 1.0
    a = Alignment()
    for p in [(0, 0), (1, 1), (2, 2), (3, 3), (4, 4)]:
        a.append(*p)
    b = Alignment()
    for p in [(0, 0), (1, 1), (3, 2), (4, 3), (5, 4)]:
        b.append(*p)
    d = a.get_area_diff(b)
    assert d > 0


def test_upgma_basic():
    # two tight groups far apart
    d = np.array([
        [0, 1, 1, 9, 9],
        [1, 0, 1, 9, 9],
        [1, 1, 0, 9, 9],
        [9, 9, 9, 0, 1],
        [9, 9, 9, 1, 0],
    ], dtype=np.float32)
    cl = UPGMAClusterer(np.tril(d))
    root = cl.cluster()
    assert root.weight == 5
    clusters = cl.find_clusters_under_threshold(3.0)
    sets = sorted(tuple(sorted(c)) for c in clusters)
    assert sets == [(0, 1, 2), (3, 4)]


def test_upgma_jax_merge_order():
    from alignment_algos_tpu.analysis.upgma import upgma_linkage_matrix_jax
    d = np.array([
        [0, 1, 4, 4],
        [1, 0, 4, 4],
        [4, 4, 0, 2],
        [4, 4, 2, 0],
    ], dtype=np.float32)
    i, j, h = (np.asarray(v) for v in upgma_linkage_matrix_jax(d))
    assert (int(i[0]), int(j[0])) == (0, 1)
    assert (int(i[1]), int(j[1])) == (2, 3)
    assert h[0] == 1.0 and h[1] == 2.0


def test_kmedoids_two_groups():
    rng = np.random.default_rng(0)
    pts = np.concatenate([rng.normal(0, 0.3, (6, 2)), rng.normal(5, 0.3, (6, 2))])
    d = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1).astype(np.float32)
    cs = ClusterSet(np.tril(d))
    km = KMedoidClusterer(cs, 2, seed=1)
    clusters = km.find_good_clustering(5)
    assert len(clusters) == 2
    groups = sorted(tuple(sorted(c)) for c in clusters)
    assert groups == [tuple(range(6)), tuple(range(6, 12))]


def test_kmedoids_annealing_converges():
    rng = np.random.default_rng(2)
    pts = np.concatenate([rng.normal(0, 0.2, (5, 2)),
                          rng.normal(4, 0.2, (5, 2)),
                          rng.normal(8, 0.2, (5, 2))])
    d = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1).astype(np.float32)
    cs = ClusterSet(np.tril(d))
    km = KMedoidClusterer(cs, 2, seed=3)
    clusters = km.simulated_annealing(max_var=1.0)
    # all 15 points accounted for
    members = sorted(m for c in clusters for m in c)
    assert members == list(range(15))
    assert len(clusters) >= 3  # needs >= 3 clusters to satisfy max_var


def test_get_shift_zero_for_identical():
    from alignment_algos_tpu.analysis.shift import get_shift
    from alignment_algos_tpu.seq.sflags import SuboptFlags
    a = Alignment()
    a.read_from("^ABCDE$", "^ABCDE$")
    core = SuboptFlags(True, 7)
    shift, ali_len = get_shift(a, a, "^ABCDE$", core)
    assert shift == 0
    assert ali_len == 5
