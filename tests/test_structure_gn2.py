"""Structure pipeline + gn2/hmap2/gnoali evaluators (property tests — the
reference's structure layer depends on the unshipped trollbase library, so
there is no binary oracle; invariants and end-to-end behavior are verified
instead)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from alignment_algos_tpu.core.alignment import AlignmentSet
from alignment_algos_tpu.core.dp import DPMatrix
from alignment_algos_tpu.core.enumerators import (CRConstrainedNearOptimal,
                                                  Optimal)
from alignment_algos_tpu.scoring.gn2_eval import Gn2Eval, Gn2Params
from alignment_algos_tpu.scoring.gnoali_eval import GnoaliEval, GnoaliParams
from alignment_algos_tpu.scoring.hmap2_eval import Hmap2Eval
from alignment_algos_tpu.seq.hmap import HMAPSequence
from alignment_algos_tpu.seq.sflags import SuboptFlags
from alignment_algos_tpu.structure.smap import SMAPSequence

DATA = os.path.join(os.path.dirname(__file__), "data")


@pytest.fixture(scope="module")
def smap():
    return SMAPSequence.from_file(os.path.join(DATA, "templ_smap.prof"),
                                  gn2=True)


@pytest.fixture(scope="module")
def smap_full():
    return SMAPSequence.from_file(os.path.join(DATA, "templ_smap.prof"),
                                  gn2=False)


@pytest.fixture(scope="module")
def query():
    return HMAPSequence.from_file(os.path.join(DATA, "query30.prof"))


def test_smap_basic_properties(smap):
    n = smap.seq_length
    assert n == 30
    assert len(smap.chain) == 30
    # helix residues 2-11 (1-based), strands 15-20 and 24-29
    assert smap.sse_type[2] == 329 and smap.sse_type[11] == 329
    assert smap.sse_type[16] == 330 and smap.sse_type[25] == 330
    assert smap.isse[1] == -1  # leading coil
    # wcn non-negative, zero at sentinels
    wcn = smap.weighted_contact_number
    assert wcn[0] == 0 and wcn[n + 1] == 0
    assert (wcn >= 0).all()


def test_brokenhb_invariants(smap):
    """brokenhb[a][b] = bonds crossing the deleted window [b..a]; check
    against a direct recount from the H-bond table."""
    nr = smap.seq_length
    hb = np.zeros((nr, nr), dtype=np.int64)
    m = smap._hb_contact
    for i in range(1, nr + 1):
        for j in range(1, i):
            if m[i, j]:
                hb[i - 1, j - 1] = 1
                hb[j - 1, i - 1] = 1
    for a in range(nr):
        for b in range(a + 1):
            # bonds with exactly one endpoint inside [b..a]
            inside = np.zeros(nr, dtype=bool)
            inside[b : a + 1] = True
            crossing = int(hb[np.ix_(inside, ~inside)].sum())
            assert int(smap.brokenhb[a, b]) == crossing, (a, b)


def test_distance_sentinel_quirk(smap):
    """distance[.][0] measures to the zero-origin sentinel (the reference
    computes the table before the sentinel coordinate copy)."""
    d00 = smap.distance[0, 0]  # pair (0, 2): head sentinel at origin
    expected = np.linalg.norm(smap.cb_xyz[2])  # cb[0] was (0,0,0) then
    # after the build, cb_xyz[0] was overwritten with residue 1's cb, so
    # recompute what it was: the stored distance must equal |cb_2 - 0|
    assert abs(d00 - expected) < 1e-4


def test_gn2_costs_and_dp(query, smap):
    p = Gn2Params()
    ev = Gn2Eval(p)
    c = ev.build_costs(query, smap)
    assert np.isfinite(c.S).all()
    assert np.isfinite(c.D).all()
    # deletion inside one SSE is penalized at the SS level
    # (positions 16..19 are in the same strand)
    assert c.D[16, 19] > 90.0
    dpm = DPMatrix(query, smap, ev, "fwd")
    as_ = AlignmentSet(dpm, Optimal())
    assert len(as_) == 1
    assert as_[0].get_first_query_idx() == 0
    assert np.isfinite(as_[0].score)


def test_gn2_crcw_rounds(query, smap):
    """The gn2 -crcw iterative loop: enumerate -> update_core ->
    reevaluate -> re-enumerate works and changes the cost model."""
    p = Gn2Params()
    p.delta_ratio = 0.2
    p.number_suboptimal = 10
    ev = Gn2Eval(p)
    dpm = DPMatrix(query, smap, ev, "fwd")
    subopt = SuboptFlags(True, smap.size())
    from alignment_algos_tpu.cli.gn2 import make_subopt_regions
    make_subopt_regions(subopt, 5)

    crcno = CRConstrainedNearOptimal(p, subopt)
    rounds = AlignmentSet(dpm, Optimal())
    crcno.enumerate(dpm, rounds)
    assert len(rounds) >= 1
    wcn_before = smap.weighted_contact_number.copy()
    smap.update_core(rounds, 0.33)
    assert not np.array_equal(wcn_before, smap.weighted_contact_number)
    dpm.reevaluate()
    final = AlignmentSet(dpm, Optimal())
    assert np.isfinite(final[0].score)


def test_hmap2_and_gnoali_costs(query, smap, smap_full):
    p = Gn2Params()
    c = Hmap2Eval(p).build_costs(query, smap)
    assert np.isfinite(c.S).all() and np.isfinite(c.D).all()

    gp = GnoaliParams()
    c2 = GnoaliEval(gp).build_costs(query, smap_full)
    assert np.isfinite(c2.S).all() and np.isfinite(c2.D).all()
    assert (smap_full.accessibility[1:-1] >= 0).all()
    assert (smap_full.accessibility[1:-1] <= 1).all()
    dpm = DPMatrix(query, smap_full, GnoaliEval(gp), "fwd")
    as_ = AlignmentSet(dpm, Optimal())
    assert np.isfinite(as_[0].score)


def test_gn2_cli_end_to_end(tmp_path):
    env = dict(os.environ)
    env.setdefault("JAX_PLATFORMS", "cpu")
    env["HOME"] = "/tmp/nonexistent"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-m", "alignment_algos_tpu.cli.gn2",
         os.path.join(DATA, "query30.prof"),
         os.path.join(DATA, "templ_smap.prof"),
         "-crcw", "--ROUNDS", "2", "--NUM_SUBOPT", "5",
         "--DELTA_RATIO", "0.15"],
        capture_output=True, text=True, env=env, cwd=root)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "> q30_0" in r.stdout
    assert "FINAL ROUND" in r.stderr
