"""SSSS tracking-mode (`--str_ali`) parity against the compiled reference.

Tracking mode threads an Ali_Dist comparator through the whole SSSS
pipeline: per-SSE fragment-quality tables on stderr
(frag_matrix.cpp:778-869), and every culled skeleton measured against the
native alignment and dumped to track_low_coverage.txt / track_low_CO.txt /
track_bad_strands.txt / track_low_score.txt (skel_set.cpp:501-531,580-622).

The assertions here are byte-level:
  * PIR stdout unchanged and equal (tracking must not perturb enumeration),
  * the four track_*.txt files equal,
  * the tracked stderr sections (SSE INFO / SSE FRAG SET tables and the
    culled-skeleton narration) equal.  Only the tracked sections are
    compared because both sides also narrate untracked progress lines that
    are not part of the tracking contract.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

from alignment_algos_tpu.structure.smap import SMAPSequence

from smap_dump import make_dump

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(ROOT, "tests", "data")
ORACLE = "/tmp/refbuild/oracle_s4"

pytestmark = pytest.mark.skipif(not os.path.exists(ORACLE),
                                reason="s4 oracle not built")

FIXTURES = {
    "small": ("templ_smap.prof", "query30.prof"),
    "big": ("templ_big.prof", "query_big.prof"),
    # 222-res deposited-style pathological PDB + homologous 180-res query
    # (tools/make_smap_fixture.make_fixture_real; VERDICT r1 item 6)
    "real": ("templ_real.prof", "query_real.prof"),
}

CASES = [
    ("hmap2", []),
    ("hmap2", ["--max_returned", "10", "--min_cov", "0.2",
               "--min_CO", "0.5"]),
    ("gn2", []),
]

TRACK_FILES = ("track_low_coverage.txt", "track_low_CO.txt",
               "track_bad_strands.txt", "track_low_score.txt")

MARKERS = ("------SSE INFO----------", "------SSE FRAG SET----------")
CULL_HEADERS = ("Low_Coverage", "Low_SSE_CO", "Bad_Strands", "Low_Score")


@pytest.fixture(scope="module")
def dumps():
    out = {}
    for tag, (tfn, qfn) in FIXTURES.items():
        templ = SMAPSequence.from_file(os.path.join(DATA, tfn), gn2=True)
        out[tag] = make_dump(templ, os.path.join(DATA, qfn), ssss=True)
    return out


@pytest.fixture(scope="module")
def native_files(tmp_path_factory):
    """A native alignment per fixture: our own optimal Hmap2 alignment,
    rendered as the 2-record gapped FASTA that Ali_Dist::load_main
    (ali_dist.cpp:499-541) reads.  Both sides consume the same file."""
    from alignment_algos_tpu.core.dp import DPMatrix
    from alignment_algos_tpu.core.alignment import AlignmentSet
    from alignment_algos_tpu.core.enumerators.optimal import Optimal
    from alignment_algos_tpu.io.fasta import FastaWriter
    from alignment_algos_tpu.scoring.gn2_eval import Gn2Params
    from alignment_algos_tpu.scoring.hmap2_eval import Hmap2Eval
    from alignment_algos_tpu.seq.hmap import HMAPSequence

    root = tmp_path_factory.mktemp("native")
    out = {}
    for tag, (tfn, qfn) in FIXTURES.items():
        templ = SMAPSequence.from_file(os.path.join(DATA, tfn), gn2=True)
        query = HMAPSequence.from_file(os.path.join(DATA, qfn))
        dpm = DPMatrix(query, templ, Hmap2Eval(Gn2Params()), "fwd")
        as_ = AlignmentSet(dpm, Optimal())  # ctor enumerates
        fn = str(root / f"native_{tag}.fa")
        with open(fn, "w") as f:
            FastaWriter(f).write_set(as_)
        out[tag] = fn
    return out


def extract_tracked(stderr: str) -> str:
    """Keep only the tracking-contract stderr: the SSE INFO / SSE FRAG SET
    blocks and the culled-skeleton narration lines."""
    keep = []
    open_marker = None
    for line in stderr.splitlines(keepends=True):
        s = line.rstrip("\n")
        if s in MARKERS:
            keep.append(line)
            open_marker = None if open_marker == s else s
            continue
        if open_marker is not None:
            keep.append(line)
            continue
        if s in CULL_HEADERS or s.startswith("shift: "):
            keep.append(line)
    return "".join(keep)


def normalize_cap_zscores(text: str) -> str:
    """The reference never initializes the N-/C-cap fragments' z_score
    (ali_frag.cpp:10-54 ctors skip it; Frag_Set::initialize_all_zscores,
    frag_set.cpp:83-88, covers only the real SSE columns), so the cap
    blocks in the track files print uninitialized heap memory.  We print 0
    there (docs/DECISIONS.md).  Mask that one field in cap blocks on both
    sides; everything else stays byte-compared."""
    lines = text.splitlines(keepends=True)
    sse_ids = []
    for ln in lines:
        if ln.startswith("Frag: sse id: "):
            sse_ids.append(int(ln.split("sse id: ")[1].split(",")[0]))
    if not sse_ids:
        return text
    cap_ids = {0, max(sse_ids)}  # N-cap = 0, C-cap = num_sses+1 (largest)
    out, cur = [], None
    for ln in lines:
        if ln.startswith("Frag: sse id: "):
            cur = int(ln.split("sse id: ")[1].split(",")[0])
        if ln.startswith(" -- z-score: ") and cur in cap_ids:
            ln = " -- z-score: <cap>\n"
        out.append(ln)
    return "".join(out)


def run_reference(mode, extra, dump, cwd):
    r = subprocess.run([ORACLE, mode] + extra, input=dump,
                       capture_output=True, text=True, cwd=cwd,
                       env={**os.environ, "HOME": "/tmp/refbuild"},
                       timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    return r


def run_ours(mode, extra, fixture, cwd):
    module = ("alignment_algos_tpu.cli.s4_align_gn2" if mode == "gn2"
              else "alignment_algos_tpu.cli.s4_align")
    tfn, qfn = FIXTURES[fixture]
    env = dict(os.environ)
    env.setdefault("JAX_PLATFORMS", "cpu")
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, "-m", module,
         os.path.join(DATA, tfn),
         os.path.join(DATA, qfn)] + extra,
        capture_output=True, text=True, env=env, cwd=cwd, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    return r


@pytest.mark.parametrize("fixture", sorted(FIXTURES))
@pytest.mark.parametrize("mode,extra", CASES)
def test_s4_tracking_parity(mode, extra, fixture, dumps, native_files,
                            tmp_path):
    extra = extra + ["--str_ali", native_files[fixture]]
    ref_dir = tmp_path / "ref"
    our_dir = tmp_path / "ours"
    ref_dir.mkdir()
    our_dir.mkdir()

    ref = run_reference(mode, extra, dumps[fixture], str(ref_dir))
    ours = run_ours(mode, extra, fixture, str(our_dir))

    # enumeration output must be unchanged by tracking
    assert ref.stdout.strip(), "reference produced no alignments"
    assert ours.stdout == ref.stdout

    # tracked stderr sections byte-equal
    ref_tracked = extract_tracked(ref.stderr)
    assert ref_tracked.strip(), "tracking produced no stderr tables"
    assert extract_tracked(ours.stderr) == ref_tracked

    # culled-skeleton dump files byte-equal
    for fn in TRACK_FILES:
        rf = ref_dir / fn
        of = our_dir / fn
        assert rf.exists(), f"reference did not write {fn}"
        assert of.exists(), f"we did not write {fn}"
        assert (normalize_cap_zscores(of.read_text())
                == normalize_cap_zscores(rf.read_text())), fn
