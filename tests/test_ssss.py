"""SSSS fragment-graph enumerator: construction invariants and end-to-end
enumeration on the synthetic structure fixtures (no binary oracle exists —
the reference's S4 tools require the unshipped trollbase)."""

import io
import os
import subprocess
import sys

import numpy as np
import pytest

from alignment_algos_tpu.core.alignment import AlignmentSet
from alignment_algos_tpu.core.dp import DPMatrix
from alignment_algos_tpu.core.enumerators import Optimal
from alignment_algos_tpu.scoring.gn2_eval import Gn2Eval, Gn2Params
from alignment_algos_tpu.scoring.hmap2_eval import Hmap2Eval
from alignment_algos_tpu.seq.hmap import HMAPSequence
from alignment_algos_tpu.ssss.engine import SSSS
from alignment_algos_tpu.structure.smap import SMAPSequence

DATA = os.path.join(os.path.dirname(__file__), "data")


@pytest.fixture(scope="module")
def setup():
    query = HMAPSequence.from_file(os.path.join(DATA, "query30.prof"))
    templ = SMAPSequence.from_file(os.path.join(DATA, "templ_smap.prof"),
                                   gn2=False)
    p = Gn2Params()
    ev = Hmap2Eval(p)
    dpm = DPMatrix(query, templ, ev, "fwd")
    return query, templ, p, ev, dpm


def make_ssss(setup, **kw):
    query, templ, p, ev, dpm = setup
    defaults = dict(num_alis_kept=20, max_alis=5000, min_cov=0.3,
                    min_CO=0.3, max_frag_shift=2, ali_mode=1,
                    max_cluster_shift=0.0)
    defaults.update(kw)
    return SSSS(p, ev, dpm, **defaults)


def test_ssss_construction(setup):
    s4 = make_ssss(setup)
    # three template SSEs from the fixture structure
    assert s4.Str.num_templ_sses == 3
    assert [s.beg_id for s in s4.Str.sses] == [2, 15, 24]
    # columns: N-cap + 3 SSEs + C-cap
    assert len(s4.All_Frags.Frag_Columns) == 5
    # each SSE column seeded with exactly one active frag
    for i in (1, 2, 3):
        assert s4.All_Frags.get_col(i).get_num_active_frags() == 1
    # TSR sanity: monotone, total equals SSE residue count
    total_sse_res = sum(s.end_id - s.beg_id + 1 for s in s4.Str.sses)
    assert s4.Str.tsr_to_n[-1] == total_sse_res
    assert (np.diff(s4.Str.tsr_to_n) >= 0).all()


def test_ssss_enumerate_end_to_end(setup):
    query, templ, p, ev, dpm = setup
    s4 = make_ssss(setup)
    as_ = AlignmentSet(dpm, Optimal())
    pir = io.StringIO()
    s4.enumerate(dpm, as_, pir_stream=pir)
    assert len(as_) >= 1
    # every alignment strictly increasing in q and t
    for a in as_:
        pairs = list(a.pairs)
        for (q1, t1), (q2, t2) in zip(pairs, pairs[1:]):
            assert q2 > q1 and t2 > t1
    text = pir.getvalue()
    assert text.count("#start") == len(as_)
    assert text.count("#end") == len(as_)
    assert ">P1;templ" in text
    # skeleton scores are sorted descending
    scores = [s.get_score() for s in s4.Returned_Skel_Alis]
    assert scores == sorted(scores, reverse=True)


def test_ssss_gn2_eval_variant(setup):
    query, templ, p, _, _ = setup
    templ_gn2 = SMAPSequence.from_file(os.path.join(DATA, "templ_smap.prof"),
                                       gn2=True)
    ev = Gn2Eval(p)
    dpm = DPMatrix(query, templ_gn2, ev, "fwd")
    s4 = SSSS(p, ev, dpm, num_alis_kept=10, max_alis=2000, min_cov=0.3,
              min_CO=0.2, max_frag_shift=2, ali_mode=0, max_cluster_shift=0.0)
    as_ = AlignmentSet()
    s4.enumerate(dpm, as_, pir_stream=io.StringIO())
    assert len(as_) >= 1


def test_s4_cli_end_to_end():
    env = dict(os.environ)
    env.setdefault("JAX_PLATFORMS", "cpu")
    env["HOME"] = "/tmp/nonexistent"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-m", "alignment_algos_tpu.cli.s4_align",
         os.path.join(DATA, "templ_smap.prof"),
         os.path.join(DATA, "query30.prof"),
         "--max_returned", "10", "--max_searched", "2000",
         "--min_cov", "0.3", "--min_CO", "0.3"],
        capture_output=True, text=True, env=env, cwd=root)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "#start" in r.stdout
    assert "mdl_1" in r.stdout


def test_cluster_alignments_reduces_and_sorts(setup):
    """Working version of the reference's dead cluster_alignments
    (skel_set.cpp:625-683): clustering keeps one representative per UPGMA
    cluster and re-sorts descending by score."""
    s4_plain = make_ssss(setup)
    as_plain = AlignmentSet()
    s4_plain.enumerate(setup[4], as_plain, pir_stream=io.StringIO())

    s4 = make_ssss(setup, max_cluster_shift=0.05, cluster=True)
    as_ = AlignmentSet()
    s4.enumerate(setup[4], as_, pir_stream=io.StringIO())

    assert 1 <= len(as_) <= len(as_plain)
    scores = [sk.get_score() for sk in s4.Returned_Skel_Alis]
    assert scores == sorted(scores, reverse=True)
    # huge threshold collapses everything into one cluster
    s4_one = make_ssss(setup, max_cluster_shift=1e9, cluster=True)
    as_one = AlignmentSet()
    s4_one.enumerate(setup[4], as_one, pir_stream=io.StringIO())
    assert len(s4_one.Returned_Skel_Alis) == 1


def test_cluster_flag_off_is_parity_neutral(setup):
    """cluster=False (default) must not change enumeration output even with
    a nonzero max_cluster_shift (the reference never calls the dead code)."""
    a = make_ssss(setup, max_cluster_shift=0.05)
    b = make_ssss(setup, max_cluster_shift=0.05, cluster=False)
    out_a, out_b = AlignmentSet(), AlignmentSet()
    sa, sb = io.StringIO(), io.StringIO()
    a.enumerate(setup[4], out_a, pir_stream=sa)
    b.enumerate(setup[4], out_b, pir_stream=sb)
    assert sa.getvalue() == sb.getvalue()


def test_native_search_matches_python_backend(setup, monkeypatch):
    """The C++ phase-2 engine (native/ssss_search.cpp) must produce
    byte-identical PIR output and identical skeleton stats vs the Python
    SkelSet search."""
    outs = {}
    skels = {}
    for backend in ("auto", "python"):
        monkeypatch.setenv("AAT_SSSS_BACKEND", backend)
        s4 = make_ssss(setup)
        as_ = AlignmentSet()
        sio = io.StringIO()
        s4.enumerate(setup[4], as_, pir_stream=sio)
        outs[backend] = sio.getvalue()
        skels[backend] = [(sk.get_score(), sk.get_num_aligned(),
                           sk.get_contact_order())
                          for sk in s4.Returned_Skel_Alis]
    assert outs["auto"] == outs["python"]
    assert skels["auto"] == skels["python"]
