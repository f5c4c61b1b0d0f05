"""Smoke tests for the remaining CLI tools (gnoali, cn_acc_analys, test_0,
get_shifts, get_area_diffs)."""

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(ROOT, "tests", "data")


def run_tool(module, args, check=True):
    env = dict(os.environ)
    env.setdefault("JAX_PLATFORMS", "cpu")
    env["HOME"] = "/tmp/nonexistent"
    r = subprocess.run([sys.executable, "-m", f"alignment_algos_tpu.cli.{module}"]
                      + args, capture_output=True, text=True, env=env, cwd=ROOT)
    if check:
        assert r.returncode == 0, r.stderr[-3000:]
    return r


def test_gnoali_end_to_end():
    r = run_tool("gnoali", [os.path.join(DATA, "query30.prof"),
                            os.path.join(DATA, "templ_smap.prof"),
                            "--DELTA_RATIO", "0.1", "--NUM_SUBOPT", "5"])
    assert "> q30_0" in r.stdout
    assert "GNOALI" in r.stderr


def test_test0_config_plumbing(tmp_path):
    r = run_tool("test_0", ["--GAP_INIT_PENALTY", "9.5", "-a", "x", "foo"])
    lines = r.stdout.splitlines()
    assert lines[0] == "9.5"
    assert lines[1] == "0.34"
    assert lines[2] == "C0 3"
    assert lines[3] == "x"
    assert lines[4] == "C1 1"
    assert lines[5] == "LEN=60"


def test_cn_acc_analys(tmp_path):
    # build an alignment file: template then query, gapped fasta
    from alignment_algos_tpu.structure.smap import SMAPSequence
    smap = SMAPSequence.from_file(os.path.join(DATA, "templ_smap.prof"),
                                  gn2=False)
    from alignment_algos_tpu.seq.hmap import HMAPSequence
    hmap = HMAPSequence.from_file(os.path.join(DATA, "query30.prof"))
    t = smap.get_string()[1:-1]  # the reader adds the sentinels itself
    q = hmap.get_string()[1:-1]
    # simple ungapped overlay (pad the shorter with gaps)
    width = max(len(t), len(q))
    t_g = t.ljust(width, "-")
    q_g = q.ljust(width, "-")
    fa = tmp_path / "ali.fa"
    fa.write_text(f"> t\n{t_g}\n> q\n{q_g}\n\n")
    r = run_tool("cn_acc_analys", [str(fa),
                                   os.path.join(DATA, "templ_smap.prof"),
                                   os.path.join(DATA, "query30.prof")])
    lines = [l for l in r.stdout.splitlines() if l]
    assert len(lines) >= 20
    assert lines[0].startswith("1\t")


def test_get_shifts_and_area_diffs(tmp_path):
    # produce a PIR batch + native alignment from the aaa path
    fa = tmp_path / "seqs.fa"
    fa.write_text("> templ\nHEAGAWGHEEHEAGAWGHEE\n> query\nPAWHEAEPAWHEAE\n\n")
    r = run_tool("aaa", [str(fa), "--SUB_MATRIX",
                         os.path.join(DATA, "BLOSUM62"),
                         "--ALIGN_MODE", "1", "--OUTPUT_FORMAT", "1",
                         "--DELTA_RATIO", "0.3", "--NUM_SUBOPT", "6"])
    pir_text = r.stdout.split("\n\n", 0)[0]
    start = pir_text.index("#start")
    end = pir_text.rindex("#end") + len("#end")
    pir = tmp_path / "batch.pir"
    pir.write_text(pir_text[start:end] + "\n")

    # native alignment: the first PIR block, as gapped FASTA
    from alignment_algos_tpu.io.pir import read_pir
    import io as _io
    with open(pir) as f:
        first = read_pir(f)
    t_str = first.get_templ_string("^" + "HEAGAWGHEEHEAGAWGHEE" + "$")[1:-1]
    q_str = first.get_query_string("^" + "PAWHEAEPAWHEAE" + "$")[1:-1]
    nat = tmp_path / "native.fa"
    nat.write_text(f"> t\n{t_str}\n> q\n{q_str}\n")

    r1 = run_tool("get_area_diffs", [str(pir), str(nat)])
    assert "Rank of closest:" in r1.stdout

    r2 = run_tool("get_shifts", [str(pir), str(nat)])
    assert "Running statistics" in r2.stdout
    assert "Cummulative statistics" in r2.stdout
    first_row = [l for l in r2.stdout.splitlines() if l.startswith("0\t")][0]
    cols = first_row.split("\t")
    assert len(cols) >= 9
