"""aat_screen CLI: sharded library screen + UPGMA clustering of top hits
(net-new scale-out tool; BASELINE configs 2 and 5)."""

import io
import os
import sys

import numpy as np
import pytest

DATA = os.path.join(os.path.dirname(__file__), "data")
AA = "ARNDCQEGHILKMFPSTWYV"


@pytest.fixture(scope="module")
def fastas(tmp_path_factory):
    rng = np.random.default_rng(7)
    d = tmp_path_factory.mktemp("screen")

    def rseq(n):
        return "".join(AA[i] for i in rng.integers(0, 20, n))

    q = rseq(80)
    qfa = d / "query.fa"
    qfa.write_text(f">query1\n{q}\n")
    lfa = d / "lib.fa"
    lines = []
    homologs = []
    for i in range(30):
        n = int(rng.integers(50, 120))
        s = rseq(n)
        if i % 5 == 0 and n > 60:  # plant homologs
            s = s[:10] + q[10:60] + s[60:]
            homologs.append(f"tmpl_{i:02d}")
        lines.append(f">tmpl_{i:02d}\n{s}\n")
    lfa.write_text("".join(lines))
    return str(qfa), str(lfa), homologs


def _run(argv):
    from alignment_algos_tpu.cli import screen
    out, err = io.StringIO(), io.StringIO()
    old = sys.stdout, sys.stderr
    sys.stdout, sys.stderr = out, err
    try:
        rc = screen.main(argv)
    finally:
        sys.stdout, sys.stderr = old
    return rc, out.getvalue(), err.getvalue()


def _base_args(fastas, extra=()):
    qfa, lfa, _ = fastas
    return [qfa, lfa, "--SUB_MATRIX", os.path.join(DATA, "BLOSUM62"),
            *extra]


def test_screen_finds_planted_homologs(fastas):
    qfa, lfa, homologs = fastas
    rc, out, err = _run(_base_args(fastas, ["--top_k", "8"]))
    assert rc == 0, err
    rows = [l.split("\t") for l in out.splitlines()
            if l and not l.startswith("#") and "\t" in l]
    names = [r[3] for r in rows]
    scores = [float(r[1]) for r in rows]
    assert scores == sorted(scores, reverse=True)
    # every planted homolog outranks every random template
    assert set(names[: len(homologs)]) == set(homologs)
    # homologs share a cluster
    cluster_lines = [l for l in out.splitlines() if l.startswith("cluster ")]
    assert any(all(h in l for h in homologs) for l in cluster_lines)


def test_screen_matches_host_reference(fastas):
    """Sharded top-k equals the single-device host reference (order + ids)."""
    qfa, lfa, _ = fastas
    from alignment_algos_tpu.cli.screen import (encode_library, padded_table,
                                                read_fasta_plain)
    from alignment_algos_tpu.parallel.screen import (screen_library,
                                                     screen_library_host)
    from alignment_algos_tpu.scoring.submatrix import BlosumMatrix
    bl = BlosumMatrix(os.path.join(DATA, "BLOSUM62"))
    table, pad = padded_table(bl)
    index = {c: i for i, c in enumerate(bl.alphabet)}
    q = read_fasta_plain(qfa)[0][1]
    seqs = [s for _, s in read_fasta_plain(lfa)]
    q_codes = np.asarray([index[c] for c in q], dtype=np.int32)
    t_codes = encode_library(seqs, index, pad)
    s_sharded, i_sharded = screen_library(q_codes, t_codes, table,
                                          11.0, 1.0, k=10)
    s_host, i_host = screen_library_host(q_codes, t_codes, table,
                                         11.0, 1.0, k=10)
    np.testing.assert_array_equal(i_sharded, i_host)
    np.testing.assert_allclose(s_sharded, s_host, rtol=0, atol=0)


def test_screen_checkpoint_resume(fastas, tmp_path):
    """A checkpointed screen interrupted mid-way resumes to the same top-k."""
    qfa, lfa, _ = fastas
    ck = str(tmp_path / "state.npz")
    args = _base_args(fastas, ["--top_k", "5", "--ckpt", ck,
                               "--chunk_size", "7"])
    rc1, out_full, _ = _run(_base_args(fastas, ["--top_k", "5"]))
    rc2, out_ck, err = _run(args)
    assert rc1 == rc2 == 0
    rows = lambda o: [l for l in o.splitlines()
                      if l and not l.startswith("#") and "\t" in l]
    assert rows(out_ck) == rows(out_full)
    # rerun with an existing complete checkpoint: same output again
    rc3, out_again, _ = _run(args)
    assert rows(out_again) == rows(out_full)


def test_padding_wall_preserves_scores(fastas):
    """A template padded with the wall code scores identically to the same
    template screened at its native length."""
    from alignment_algos_tpu.cli.screen import padded_table
    from alignment_algos_tpu.parallel.screen import screen_library_host
    from alignment_algos_tpu.scoring.submatrix import BlosumMatrix
    rng = np.random.default_rng(3)
    bl = BlosumMatrix(os.path.join(DATA, "BLOSUM62"))
    table, pad = padded_table(bl)
    q = rng.integers(0, 20, 40).astype(np.int32)
    t = rng.integers(0, 20, 50).astype(np.int32)
    unpadded = screen_library_host(q, t[None, :], table, 11.0, 1.0, k=1)[0]
    t_pad = np.full((1, 90), pad, np.int32)
    t_pad[0, :50] = t
    padded = screen_library_host(q, t_pad, table, 11.0, 1.0, k=1)[0]
    np.testing.assert_array_equal(unpadded, padded)


def test_profiles_mode_matches_nalign_scores(tmp_path):
    """--profiles 1 ranks by the exact HMAP evaluator's optimal global
    score: cross-check each screened score against a direct DPMatrix build."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools"))
    from make_profiles import make_profile
    from alignment_algos_tpu.core.dp import DPMatrix
    from alignment_algos_tpu.scoring.hmap_eval import (HMAPaliEval,
                                                       HMAPaliParams)
    from alignment_algos_tpu.seq.hmap import HMAPSequence

    rng = np.random.default_rng(5)
    d = tmp_path / "lib"
    d.mkdir()
    qfn = tmp_path / "q.prof"
    qfn.write_text(make_profile(rng, "qry", 40))
    for i in range(4):
        (d / f"t{i}.prof").write_text(
            make_profile(rng, f"t{i}", int(rng.integers(30, 60))))

    rc, out, err = _run([str(qfn), str(d), "--profiles", "1", "--top_k", "4"])
    assert rc == 0, err
    rows = [l.split("\t") for l in out.splitlines()
            if l and not l.startswith("#") and "\t" in l]
    assert len(rows) == 4

    query = HMAPSequence.from_file(str(qfn))
    p = HMAPaliParams()
    for r in rows:
        templ = HMAPSequence.from_file(r[3])
        dpm = DPMatrix(query, templ, HMAPaliEval(p), "fwd")
        want = dpm.score(dpm.get_query_size() - 1,
                         dpm.get_template_size() - 1)
        assert abs(float(r[1]) - want) < 1e-3, (r, want)  # %g prints 6 sig figs


def test_smap_fold_recognition_mode(tmp_path):
    """--smap 1 ranks SMAP structure templates by the exact Gn2Eval optimal
    global score (fold recognition); cross-checked against direct builds."""
    from alignment_algos_tpu.core.dp import DPMatrix
    from alignment_algos_tpu.scoring.gn2_eval import Gn2Eval, Gn2Params
    from alignment_algos_tpu.seq.hmap import HMAPSequence
    from alignment_algos_tpu.structure.smap import SMAPSequence

    lst = tmp_path / "smaps.txt"
    files = [os.path.join(DATA, "templ_smap.prof"),
             os.path.join(DATA, "templ_big.prof")]
    lst.write_text("".join(f + "\n" for f in files))
    qfn = os.path.join(DATA, "query30.prof")
    rc, out, err = _run([qfn, str(lst), "--smap", "1", "--top_k", "2"])
    assert rc == 0, err
    rows = [l.split("\t") for l in out.splitlines()
            if l and not l.startswith("#") and "\t" in l]
    assert len(rows) == 2
    scores = [float(r[1]) for r in rows]
    assert scores == sorted(scores, reverse=True)

    query = HMAPSequence.from_file(qfn)
    p = Gn2Params()
    for r in rows:
        templ = SMAPSequence.from_file(r[3], gn2=True)
        dpm = DPMatrix(query, templ, Gn2Eval(p), "fwd")
        want = dpm.score(dpm.get_query_size() - 1,
                         dpm.get_template_size() - 1)
        assert abs(float(r[1]) - want) < 1e-3, (r, want)


def test_profiles_mode_honors_param_overrides(tmp_path):
    """--KEY overrides flow into the evaluator params (4-layer precedence)."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools"))
    from make_profiles import make_profile
    rng = np.random.default_rng(5)
    d = tmp_path / "lib"
    d.mkdir()
    qfn = tmp_path / "q.prof"
    qfn.write_text(make_profile(rng, "qry", 40))
    for i in range(3):
        (d / f"t{i}.prof").write_text(
            make_profile(rng, f"t{i}", 40))
    base = [str(qfn), str(d), "--profiles", "1", "--top_k", "3"]
    rc1, out1, _ = _run(base)
    rc2, out2, _ = _run(base + ["--CORE_MATCH_WEIGHT", "2.5"])
    assert rc1 == rc2 == 0
    rows = lambda o: [l for l in o.splitlines() if "\t" in l and
                      not l.startswith("#")]
    assert rows(out1) != rows(out2)
