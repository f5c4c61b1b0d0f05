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
