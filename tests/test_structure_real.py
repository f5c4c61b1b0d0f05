"""Deposited-PDB robustness: the parser and the SMAP pipeline on a
realistic-scale structure carrying the pathologies real entries have.

The fixture (tests/data/real_struct.pdb, tools/make_pdb.write_pdb_real) is a
222-residue alpha/beta fold written the way the PDB deposits files: author
numbering starting past 1 with a +10 jump across a chain break, an
insertion-code residue, A/B altLoc conformer pairs plus a residue whose
atoms exist only as conformer B, selenomethionine as HETATM MSE, a residue
missing its backbone N and one missing CB, hydrogens, OXT, ANISOU records,
TER, a second chain, a ligand and waters, wrapped in MODEL/ENDMDL.

The reference behavior being matched is gn2lib_seq.cpp:96-201 (length check,
first-atom fallback when any of N/CA/C is absent, CB->CA fallback) on top of
the unshipped trollbase reader our structure/pdb.py replaces.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

from alignment_algos_tpu.structure.pdb import parse_pdb_chain
from alignment_algos_tpu.structure.smap import SMAPSequence

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(ROOT, "tests", "data")
TOOLS = os.path.join(ROOT, "tools")

N_RES = 222
# pathology positions baked by make_fixture_real(seed=23); regenerating the
# fixture reprints them (tools/make_smap_fixture.py __main__)
INS_AT, BREAK_AT = 74, 111
B_ONLY, MISSING_N, MISSING_CB, MSE_AT = 148, 92, 27, 29


@pytest.fixture(scope="module")
def chain():
    return parse_pdb_chain(os.path.join(DATA, "real_struct.pdb"), "A")


def test_residue_count_and_sses(chain):
    assert len(chain) == N_RES
    # 10 HELIX + 10 SHEET records survive the author-numbering mapping
    assert len(chain.sses) == 20


def test_altloc_first_wins_and_b_only_residue(chain):
    # a residue whose atoms exist only as conformer B must still parse
    assert set(chain.residues[B_ONLY].atoms) >= {"N", "CA", "C", "O"}
    # A/B pairs: exactly one coordinate set kept per atom (the first = A)
    r = chain.residues[11]
    assert len(r.atoms) == 5


def test_insertion_code_and_chain_break(chain):
    r_prev, r_ins = chain.residues[INS_AT - 1], chain.residues[INS_AT]
    assert r_ins.icode == "A" and r_ins.resseq == r_prev.resseq
    gap = chain.residues[BREAK_AT].resseq - chain.residues[BREAK_AT - 1].resseq
    assert gap == 10  # author numbering jumps across the break


def test_mse_is_methionine(chain):
    r = chain.residues[MSE_AT]
    assert r.name == "MSE" and r.olc == "M"
    assert "SE" in r.atoms  # selenium atom retained


def test_het_and_other_chain_excluded(chain):
    # waters, the SO4 ligand and chain B must not become residues
    assert all(r.name not in ("HOH", "SO4") for r in chain.residues)
    chb = parse_pdb_chain(os.path.join(DATA, "real_struct.pdb"), "B")
    assert len(chb) == 12 and chb.sequence() == "A" * 12


def test_smap_pipeline_fallbacks(capsys):
    smap = SMAPSequence.from_file(os.path.join(DATA, "templ_real.prof"),
                                  gn2=True, pdb_dir=DATA)
    assert smap.seq_length == N_RES
    err = capsys.readouterr().err
    assert "***missing atoms***" in err      # gn2lib_seq.cpp:165-169
    assert "CB missing" in err               # gn2lib_seq.cpp:173-176
    i = MISSING_N + 1  # 1-based
    # any of N/CA/C missing => all three take the residue's first atom
    assert np.array_equal(smap.n_xyz[i], smap.ca_xyz[i])
    assert np.array_equal(smap.c_xyz[i], smap.ca_xyz[i])
    j = MISSING_CB + 1
    assert np.array_equal(smap.cb_xyz[j], smap.ca_xyz[j])
    # derived features exist at full scale
    assert smap.weighted_contact_number is not None
    assert smap.distance.shape[0] == N_RES


def test_profile_length_mismatch_raises(tmp_path):
    # reference throws when profile and PDB lengths disagree
    # (gn2lib_seq.cpp:90-91); truncate the profile by dropping the last
    # residue's three rows
    src = open(os.path.join(DATA, "templ_real.prof")).read()
    lines = src.splitlines()
    lines = lines[:-4] + ["//"]
    lines[5] = f"LEN: {N_RES - 1}"
    fn = tmp_path / "short.prof"
    fn.write_text("\n".join(lines) + "\n")
    with pytest.raises(ValueError, match="do not match"):
        SMAPSequence.from_file(str(fn), gn2=True, pdb_dir=DATA)
