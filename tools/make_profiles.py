#!/usr/bin/env python3
"""Synthesize deterministic HMAP .prof files (and flag files) for parity
tests, in the exact format hmapalib_seq.cpp:182-243 parses."""

from __future__ import annotations

import numpy as np

AA = "ARNDCQEGHILKMFPSTWYV"


def make_profile(rng: np.random.Generator, name: str, n: int,
                 evd=(20.0, 6.0)) -> str:
    lines = [
        f"ID : {name}",
        "DE : synthetic",
        "SR : none",
        f"EVD: {evd[0]:g} {evd[1]:g}",
        f"LEN: {n}",
    ]
    # secondary-structure segments: alternate helix / strand / coil blocks
    sse_state = []
    while len(sse_state) < n:
        kind = rng.integers(0, 3)
        length = int(rng.integers(3, 9))
        sse_state.extend([kind] * length)
    sse_state = sse_state[:n]

    for i in range(1, n + 1):
        olc = AA[int(rng.integers(0, 20))]
        prof = rng.dirichlet(np.ones(20) * 0.3) * 100.0
        # bias toward the chosen residue
        prof *= 0.4
        prof[AA.index(olc)] += 60.0
        prof_s = " ".join(f"{v:.2f}" for v in prof)
        lines.append(f"{i:4d} {olc} {prof_s}")
        gi = float(rng.uniform(2.0, 6.0))
        ge = float(rng.uniform(0.1, 0.6))
        lines.append(f"   -   {gi:.3f} {ge:.3f} 0.000 0.000 "
                     f"{rng.uniform(0, 1):.3f} {rng.uniform(0, 1):.3f}")
        kind = sse_state[i - 1]
        base = rng.dirichlet(np.ones(3)) * 0.3
        base[kind] += 0.7
        base /= base.sum()
        conf = float(rng.uniform(0.3, 0.99))
        lines.append(f"   *   {base[0]:.3f} {base[1]:.3f} {base[2]:.3f} "
                     f"{conf:.3f} {rng.uniform(0, 1):.3f} {rng.uniform(0, 1):.3f}")
    lines.append("//")
    return "\n".join(lines) + "\n"


def make_flag_file(rng: np.random.Generator, n: int) -> str:
    """FASTA-like flag file readable by FastaIn('Flags=suboptimal region')."""
    flags = "".join("1" if rng.uniform() < 0.6 else "0" for _ in range(n + 2))
    return f"> Flags=suboptimal region\n{flags}\n\n"


if __name__ == "__main__":
    import sys
    rng = np.random.default_rng(int(sys.argv[1]) if len(sys.argv) > 1 else 0)
    sys.stdout.write(make_profile(rng, "demo", 40))
