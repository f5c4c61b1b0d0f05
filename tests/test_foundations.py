"""Config stack, BLOSUM parsing, FASTA/PIR round trips, aaa end-to-end."""

import io
import os
import subprocess
import sys

import numpy as np

from alignment_algos_tpu.core.alignment import Alignment
from alignment_algos_tpu.io.fasta import FastaReader
from alignment_algos_tpu.io.pir import read_pir
from alignment_algos_tpu.scoring.submatrix import BlosumMatrix
from alignment_algos_tpu.seq.sequence import AASequence
from alignment_algos_tpu.utils.params import (AliParams, AlignT, Argv,
                                              NOaliParams, ParamStore)

DATA = os.path.join(os.path.dirname(__file__), "data")


def test_param_store_layering():
    p = ParamStore()
    p.read_stream(io.StringIO("GAP_INIT_PENALTY: 7.5\nALIGN_MODE: 1\n# comment\n"))
    ali = AliParams()
    ali.read(p)
    assert ali.gap_init_penalty == 7.5
    assert ali.align_type == AlignT.GLOBAL

    args = Argv(["--GAP_EXTN_PENALTY", "0.9", "seqs.fa", "-opt"])
    ali.read(args)
    assert ali.gap_extn_penalty == 0.9
    assert args.get_switch("-opt") is True
    assert args.count() == 1 and args.get_arg(0) == "seqs.fa"


def test_noali_defaults_match_reference():
    p = NOaliParams()
    assert (p.number_suboptimal, p.delta_ratio, p.k_limit, p.sort_limit,
            p.user_limit, p.max_overlap, p.rounds) == (200, 0.01, 16, 100,
                                                       100000, 0.30, 4)


def test_blosum62():
    m = BlosumMatrix(os.path.join(DATA, "BLOSUM62"))
    assert m.score("A", "A") == 4
    assert m.score("W", "W") == 11
    assert m.score("A", "R") == -1
    assert m.score("R", "A") == -1
    assert m.has_letter("X") and not m.has_letter("J")


def test_fasta_reader_sentinels():
    f = io.StringIO("> seq1 desc\nACDE\nFGH\n> seq2\nWYV\n")
    r = FastaReader(f)
    s1 = AASequence()
    r.read_into(s1)
    assert s1.get_string() == "^ACDEFGH$"
    assert s1.seq_name == "seq1 desc"
    s2 = AASequence()
    r.read_into(s2)
    assert s2.get_string() == "^WYV$"


def test_alignment_read_from_and_render():
    a = Alignment()
    a.read_from("^AC-DE$", "^A-CDE$")
    assert list(a.pairs) == [(0, 0), (1, 1), (3, 3), (4, 4), (5, 5)]
    # zigzag render round trip
    q = a.get_query_string("^ACDE$")
    t = a.get_templ_string("^ACDE$")
    assert len(q) == len(t)


def test_pir_roundtrip():
    text = """#start

>P1;tmpl
structureN:tmpl::::
-ACDE-*

>P1;quer
sequence:quer::::
-AC-EF*

#end
"""
    a = read_pir(io.StringIO(text))
    assert len(a.pairs) >= 2


def test_aaa_end_to_end(tmp_path):
    fa = tmp_path / "seqs.fa"
    fa.write_text("> templ\nHEAGAWGHEE\n> query\nPAWHEAE\n")
    env = dict(os.environ)
    env.setdefault("JAX_PLATFORMS", "cpu")
    out = subprocess.run(
        [sys.executable, "-m", "alignment_algos_tpu.cli.aaa", str(fa),
         "--SUB_MATRIX", os.path.join(DATA, "BLOSUM62"),
         "--ALIGN_MODE", "1", "--NUM_SUBOPT", "5", "--DELTA_RATIO", "0.2"],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert out.returncode == 0, out.stderr
    assert "> templ" in out.stdout
    assert "time for alignment was" in out.stdout


def test_hmaprc_reference_param_file():
    """The reference's canonical production parameter file parses and
    applies with the same keys (HMAPRC_use_this_param_file)."""
    from alignment_algos_tpu.scoring.gn2_eval import Gn2Params
    from alignment_algos_tpu.utils.params import RCfile
    path = "/root/reference/HMAPRC_use_this_param_file"
    if not os.path.exists(path):
        import pytest
        pytest.skip("reference param file not mounted")
    rc = RCfile(path)
    p = Gn2Params()
    p.read(rc)
    assert p.number_suboptimal == 1000
    assert abs(p.delta_ratio - 0.20) < 1e-9
    assert abs(p.max_overlap - 0.05) < 1e-9
    assert abs(p.final_overlap - 0.30) < 1e-9
    assert p.rounds == 1
    assert p.align_type == 4  # semi_local
    assert abs(p.ss_weight - 2.2) < 1e-9
    assert abs(p.cn_weight - 3.4) < 1e-9
    assert abs(p.gap_init_ss - 100) < 1e-9
