#!/usr/bin/env python3
"""Synthesize ideal-geometry protein structures (PDB format) for tests.

Builds backbone coordinates from standard bond lengths/angles and canonical
phi/psi dihedrals via sequential NeRF placement; ideal alpha-helices produce
the i+4->i backbone H-bond pattern, beta-hairpins the ladder pattern, so the
structure pipeline (H-bond detection, SSE assignment, WCN, brokenhb) has
realistic input without external data.
"""

from __future__ import annotations

import numpy as np

# standard backbone geometry (Engh-Huber-ish)
B_N_CA = 1.458
B_CA_C = 1.525
B_C_N = 1.329
B_C_O = 1.231
B_CA_CB = 1.521
A_N_CA_C = np.deg2rad(111.0)
A_CA_C_N = np.deg2rad(116.2)
A_C_N_CA = np.deg2rad(121.7)
A_CA_C_O = np.deg2rad(120.8)

PHI_PSI = {
    "H": (-57.0, -47.0),    # alpha helix
    "E": (-139.0, 135.0),   # beta strand
    "C": (-75.0, 145.0),    # PPII-ish coil
}


def _place(a, b, c, bond, angle, torsion):
    """NeRF: place atom d given three predecessors and internal coords."""
    bc = c - b
    bc /= np.linalg.norm(bc)
    n = np.cross(b - a, bc)
    n /= np.linalg.norm(n)
    m = np.cross(n, bc)
    d2 = np.array([-bond * np.cos(angle),
                   bond * np.sin(angle) * np.cos(torsion),
                   bond * np.sin(angle) * np.sin(torsion)])
    return c + d2[0] * bc + d2[1] * m + d2[2] * n


def build_backbone(ss_string: str, phi_psi=None):
    """ss_string of H/E/C per residue -> dict arrays N, CA, C, O, CB."""
    n = len(ss_string)
    phi_psi = phi_psi or PHI_PSI
    N = np.zeros((n, 3))
    CA = np.zeros((n, 3))
    C = np.zeros((n, 3))

    # seed first residue
    N[0] = [0.0, 0.0, 0.0]
    CA[0] = [B_N_CA, 0.0, 0.0]
    C[0] = CA[0] + [B_CA_C * np.cos(np.pi - A_N_CA_C),
                    B_CA_C * np.sin(np.pi - A_N_CA_C), 0.0]

    for i in range(1, n):
        phi_prev, psi_prev = phi_psi[ss_string[i - 1]]
        phi, _ = phi_psi[ss_string[i]]
        # N_i from (N,CA,C)_{i-1} with torsion psi_{i-1}
        N[i] = _place(N[i - 1], CA[i - 1], C[i - 1], B_C_N, A_CA_C_N,
                      np.deg2rad(psi_prev))
        # CA_i with omega = 180
        CA[i] = _place(CA[i - 1], C[i - 1], N[i], B_N_CA, A_C_N_CA,
                       np.deg2rad(180.0))
        # C_i with torsion phi_i
        C[i] = _place(C[i - 1], N[i], CA[i], B_CA_C, A_N_CA_C,
                      np.deg2rad(phi))

    O = np.zeros((n, 3))
    CB = np.zeros((n, 3))
    for i in range(n):
        if i + 1 < n:
            # O opposite the next N in the peptide plane
            O[i] = _place(N[i + 1] if False else CA[i], N[i + 1], C[i],
                          B_C_O, A_CA_C_O, np.deg2rad(0.0))
            # simpler: O placed anti to N_{i+1} around C_i in the CA-C plane
            co_dir = C[i] - (CA[i] + N[i + 1]) / 2.0
            O[i] = C[i] + co_dir / np.linalg.norm(co_dir) * B_C_O
        else:
            co_dir = C[i] - CA[i]
            O[i] = C[i] + co_dir / np.linalg.norm(co_dir) * B_C_O
        # CB via tetrahedral placement off N, C
        v1 = N[i] - CA[i]
        v2 = C[i] - CA[i]
        bis = v1 / np.linalg.norm(v1) + v2 / np.linalg.norm(v2)
        perp = np.cross(v1, v2)
        d = -bis / np.linalg.norm(bis) + 0.9 * perp / max(np.linalg.norm(perp), 1e-9)
        CB[i] = CA[i] + d / np.linalg.norm(d) * B_CA_CB
    return {"N": N, "CA": CA, "C": C, "O": O, "CB": CB}


def hairpin_coords(n_strand: int = 6, loop: int = 3):
    """Two antiparallel strands joined by a loop, paired by proximity."""
    ss = "E" * n_strand + "C" * loop + "E" * n_strand
    bb = build_backbone(ss)
    # reflect the second strand back alongside the first
    return ss, bb


def write_pdb(path: str, seq: str, bb: dict, chain: str = "A",
              helix_ranges=None, sheet_ranges=None) -> None:
    three = {"A": "ALA", "R": "ARG", "N": "ASN", "D": "ASP", "C": "CYS",
             "Q": "GLN", "E": "GLU", "G": "GLY", "H": "HIS", "I": "ILE",
             "L": "LEU", "K": "LYS", "M": "MET", "F": "PHE", "P": "PRO",
             "S": "SER", "T": "THR", "W": "TRP", "Y": "TYR", "V": "VAL"}
    lines = []
    for si, (a, b) in enumerate(helix_ranges or []):
        # exact PDB HELIX columns: chain col 20, init seq 22-25, end seq 34-37
        rec = (f"HELIX  {si+1:3d} {si+1:3d} "
               f"{three[seq[a]]:>3s} {chain} {a+1:4d}  "
               f"{three[seq[b]]:>3s} {chain} {b+1:4d}  1")
        lines.append(rec.ljust(71) + f"{b-a+1:5d}")
    for si, (a, b) in enumerate(sheet_ranges or []):
        # SHEET: sheet id 12-14, init chain col 22, init seq 23-26,
        # end chain col 33, end seq 34-37
        rec = (f"SHEET  {si+1:3d}   S 2 "
               f"{three[seq[a]]:>3s} {chain}{a+1:4d}  "
               f"{three[seq[b]]:>3s} {chain}{b+1:4d}  0")
        lines.append(rec)
    serial = 1
    for i, olc in enumerate(seq):
        resname = three.get(olc, "ALA")
        for name in ("N", "CA", "C", "O", "CB"):
            if olc == "G" and name == "CB":
                continue
            x, y, z = bb[name][i]
            el = name[0]
            lines.append(
                f"ATOM  {serial:5d}  {name:<3s} {resname:<3s} {chain}{i+1:4d}"
                f"    {x:8.3f}{y:8.3f}{z:8.3f}  1.00  0.00"
                f"          {el:>2s}")
            serial += 1
    lines.append("END")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def _atom_line(serial, name, altloc, resname, chain, resseq, icode, xyz,
               occ=1.00, bfac=0.00, element=None, het=False):
    rec = "HETATM" if het else "ATOM  "
    nm = name if len(name) >= 4 else f" {name:<3s}"
    el = element if element is not None else name[0]
    x, y, z = xyz
    return (f"{rec}{serial:5d} {nm}{altloc}{resname:>3s} {chain}"
            f"{resseq:4d}{icode}   {x:8.3f}{y:8.3f}{z:8.3f}"
            f"{occ:6.2f}{bfac:6.2f}          {el:>2s}")


def write_pdb_real(path: str, seq: str, bb: dict, chain: str = "A",
                   helix_ranges=None, sheet_ranges=None, seed: int = 0):
    """Write a structure in deposited-PDB style, with the pathologies real
    entries carry: author numbering that starts past 1 and jumps across a
    chain break, an insertion-code residue, A/B altLoc conformer pairs plus
    one residue whose atoms exist ONLY as conformer B, a selenomethionine
    written as HETATM MSE, a residue with a missing backbone N and one with
    a missing CB (disorder), hydrogens, OXT, ANISOU records, a TER, a
    second chain, waters and a ligand, all wrapped in MODEL/ENDMDL with
    header junk.  Ranges are 0-based inclusive.  Returns the author
    (resseq, icode) numbering so profiles/tests can address residues."""
    three = {"A": "ALA", "R": "ARG", "N": "ASN", "D": "ASP", "C": "CYS",
             "Q": "GLN", "E": "GLU", "G": "GLY", "H": "HIS", "I": "ILE",
             "L": "LEU", "K": "LYS", "M": "MET", "F": "PHE", "P": "PRO",
             "S": "SER", "T": "THR", "W": "TRP", "Y": "TYR", "V": "VAL"}
    rng = np.random.default_rng(seed)
    n = len(seq)

    # author numbering: starts at 3, +9 jump (chain break) midway, one
    # insertion-code residue at ~n/3 sharing its predecessor's resseq
    ins_at, break_at = n // 3, n // 2
    numbering = []
    resseq = 2
    for i in range(n):
        if i == ins_at:
            numbering.append((resseq, "A"))
            continue
        resseq += 1
        if i == break_at:
            resseq += 9
        numbering.append((resseq, " "))

    # pathological residue picks (disjoint, away from termini)
    cand = [i for i in range(4, n - 4) if i not in (ins_at, break_at)]
    picks = rng.choice(cand, size=9, replace=False)
    altpair = set(int(x) for x in picks[:4])
    b_only, missing_n, missing_cb, mse_at, hyd_at = (int(x)
                                                     for x in picks[4:])
    mse_at = mse_at if seq[mse_at] != "G" else mse_at + 1
    missing_cb = missing_cb if seq[missing_cb] != "G" else missing_cb - 1
    # selenomethionine IS methionine; the caller's profile must agree
    seq = seq[:mse_at] + "M" + seq[mse_at + 1:]

    lines = ["HEADER    SYNTHETIC FOLD                          01-JAN-00   9XXX",
             "REMARK   2 RESOLUTION.    1.80 ANGSTROMS.",
             "CRYST1  100.000  100.000  100.000  90.00  90.00  90.00 P 1"]
    for si, (a, b) in enumerate(helix_ranges or []):
        (rs_a, ic_a), (rs_b, ic_b) = numbering[a], numbering[b]
        rec = (f"HELIX  {si + 1:3d} {si + 1:3d} "
               f"{three[seq[a]]:>3s} {chain} {rs_a:4d}{ic_a} "
               f"{three[seq[b]]:>3s} {chain} {rs_b:4d}{ic_b} 1")
        lines.append(rec.ljust(71) + f"{b - a + 1:5d}")
    for si, (a, b) in enumerate(sheet_ranges or []):
        (rs_a, ic_a), (rs_b, ic_b) = numbering[a], numbering[b]
        lines.append(f"SHEET  {si + 1:3d}   S{len(sheet_ranges):2d} "
                     f"{three[seq[a]]:>3s} {chain}{rs_a:4d}{ic_a}"
                     f"{three[seq[b]]:>3s} {chain}{rs_b:4d}{ic_b}  0")
    lines.append("MODEL        1")

    serial = 1

    def emit(name, resname, i, xyz, altloc=" ", occ=1.00, element=None,
             het=False, anisou=False):
        nonlocal serial
        rs, ic = numbering[i]
        lines.append(_atom_line(serial, name, altloc, resname, chain, rs,
                                ic, xyz, occ=occ,
                                bfac=float(rng.uniform(5, 40)),
                                element=element, het=het))
        if anisou:
            lines.append(f"ANISOU{serial:5d} {name:<4s}{resname:>3s} "
                         f"{chain}{rs:4d}{ic}   2000   2000   2000      "
                         f"0      0      0       {element or name[0]:>2s}")
        serial += 1

    for i, olc in enumerate(seq):
        resname = "MSE" if i == mse_at else three.get(olc, "ALA")
        het = i == mse_at
        names = ["N", "CA", "C", "O", "CB"]
        if olc == "G" or i == missing_cb:
            names.remove("CB")
        if i == missing_n:
            names.remove("N")
        for name in names:
            xyz = bb[name][i]
            if i == b_only:
                emit(name, resname, i, xyz, altloc="B", het=het)
            elif i in altpair:
                emit(name, resname, i, xyz, altloc="A", occ=0.61, het=het,
                     anisou=(name == "CA"))
                emit(name, resname, i, xyz + rng.normal(0, 0.25, 3),
                     altloc="B", occ=0.39, het=het)
            else:
                emit(name, resname, i, xyz, het=het)
        if i == mse_at:
            ca, cb = bb["CA"][i], bb["CB"][i]
            d = cb - ca
            emit("SE", resname, i, cb + 1.8 * d / np.linalg.norm(d),
                 element="SE", het=True)
        if i == hyd_at:
            emit("H", resname, i, bb["N"][i] + [0.0, 0.0, 1.0], element="H")
        if i == n - 1:
            emit("OXT", resname, i, bb["O"][i] + [0.5, 0.5, 0.0])
    rs_last = numbering[-1][0]
    lines.append(f"TER   {serial:5d}      {three.get(seq[-1], 'ALA'):>3s} "
                 f"{chain}{rs_last:4d}")
    serial += 1

    # chain B: short poly-ALA helix far away
    bbB = build_backbone("H" * 12)
    for i in range(12):
        for name in ("N", "CA", "C", "O", "CB"):
            xyz = bbB[name][i] + 80.0
            lines.append(_atom_line(serial, name, " ", "ALA", "B", i + 1,
                                    " ", xyz))
            serial += 1
    lines.append(f"TER   {serial:5d}      ALA B  12")
    serial += 1

    # ligand + waters
    s_pos = np.array([50.0, 50.0, 50.0])
    lines.append(_atom_line(serial, "S", " ", "SO4", chain, 501, " ",
                            s_pos, het=True))
    serial += 1
    for k in range(4):
        lines.append(_atom_line(serial, f"O{k + 1}", " ", "SO4", chain,
                                501, " ", s_pos + rng.normal(0, 1.4, 3),
                                element="O", het=True))
        serial += 1
    for k in range(5):
        lines.append(_atom_line(serial, "O", " ", "HOH", chain, 601 + k,
                                " ", rng.uniform(0, 60, 3), het=True))
        serial += 1
    lines += ["ENDMDL", "MASTER", "END"]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return numbering, seq, {"ins_at": ins_at, "break_at": break_at,
                            "altpair": sorted(altpair), "b_only": b_only,
                            "missing_n": missing_n,
                            "missing_cb": missing_cb, "mse_at": mse_at,
                            "hyd_at": hyd_at}


def make_test_structure(path: str, seq: str | None = None):
    """Helix-loop-strand-loop-strand fold with SSE records; returns seq."""
    ss = "C" + "H" * 10 + "CCC" + "E" * 6 + "CCC" + "E" * 6 + "C"
    rng = np.random.default_rng(11)
    aa = "ARNDCQEGHILKMFPSTWYV"
    if seq is None:
        seq = "".join(aa[i] for i in rng.integers(0, 20, len(ss)))
    bb = build_backbone(ss)
    helix = [(1, 10)]
    sheets = [(14, 19), (23, 28)]
    write_pdb(path, seq, bb, helix_ranges=helix, sheet_ranges=sheets)
    return seq, ss


if __name__ == "__main__":
    import sys
    seq, ss = make_test_structure(sys.argv[1] if len(sys.argv) > 1 else "test.pdb")
    print(seq)
    print(ss)
