#!/usr/bin/env python3
"""Generate golden parity fixtures by running the reference oracle binaries
(built by tools/build_reference.py) over a deterministic config matrix.

Inputs land in tests/golden/inputs/, reference outputs in tests/golden/.
Timing lines are stripped.  FASTA inputs are written with a trailing blank
line to sidestep the reference FastaRead stale-buffer defect (the last line
of the final record is appended twice when the file ends without one —
fastaio.h:112-169's failed getline leaves buff unchanged).
"""

from __future__ import annotations

import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from make_profiles import AA, make_flag_file, make_profile  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLD = os.path.join(ROOT, "tests", "golden")
INP = os.path.join(GOLD, "inputs")
REFBIN = "/tmp/refbuild"
BLOSUM = os.path.join(ROOT, "tests", "data", "BLOSUM62")


def run_ref(tool: str, args: list[str]) -> str:
    env = dict(os.environ)
    env["HOME"] = "/tmp/refbuild"  # no ~/.hmaprc
    r = subprocess.run([os.path.join(REFBIN, tool)] + args,
                       capture_output=True, text=True, env=env)
    if r.returncode != 0:
        raise RuntimeError(f"{tool} {args} failed: {r.stderr[-2000:]}")
    lines = [l for l in r.stdout.splitlines()
             if not l.startswith("time for alignment")
             and not l.startswith("total cpu time")]
    return "\n".join(lines) + "\n"


def random_seq(rng, n):
    return "".join(AA[int(rng.integers(0, 20))] for _ in range(n))


def main() -> int:
    os.makedirs(INP, exist_ok=True)
    rng = np.random.default_rng(20250817)

    # ---- aaa fixtures: sequence pairs x align modes ----------------------
    pairs = [
        ("HEAGAWGHEE", "PAWHEAE"),
        (random_seq(rng, 40), random_seq(rng, 35)),
        (random_seq(rng, 80), random_seq(rng, 77)),
    ]
    # a homologous pair: mutate a copy
    base = random_seq(rng, 60)
    mut = list(base)
    for _ in range(12):
        mut[int(rng.integers(0, 60))] = AA[int(rng.integers(0, 20))]
    pairs.append((base, "".join(mut[:25]) + "".join(mut[30:])))

    for pi, (t, q) in enumerate(pairs):
        fa = os.path.join(INP, f"aaa_pair{pi}.fa")
        with open(fa, "w") as f:
            f.write(f"> templ\n{t}\n> query\n{q}\n\n")
        for mode in range(5):
            for extra, tag in (([], "cw"), (["-opt"], "opt")):
                name = f"aaa_p{pi}_m{mode}_{tag}"
                out = run_ref("aaa", [fa, "--SUB_MATRIX", BLOSUM,
                                      "--ALIGN_MODE", str(mode),
                                      "--DELTA_RATIO", "0.25",
                                      "--NUM_SUBOPT", "20"] + extra)
                with open(os.path.join(GOLD, name + ".out"), "w") as f:
                    f.write(out)

    # PIR output check
    out = run_ref("aaa", [os.path.join(INP, "aaa_pair1.fa"),
                          "--SUB_MATRIX", BLOSUM, "--ALIGN_MODE", "1",
                          "--OUTPUT_FORMAT", "1", "--NUM_SUBOPT", "5",
                          "--DELTA_RATIO", "0.15"])
    with open(os.path.join(GOLD, "aaa_pir.out"), "w") as f:
        f.write(out)

    # ---- nalign fixtures: synthetic profiles -----------------------------
    prng = np.random.default_rng(777)
    profs = {}
    for name, n in (("qA", 45), ("tA", 50), ("qB", 70), ("tB", 65)):
        p = os.path.join(INP, f"{name}.prof")
        with open(p, "w") as f:
            f.write(make_profile(prng, name, n))
        profs[name] = p
    flagf = os.path.join(INP, "tA.flag")
    with open(flagf, "w") as f:
        f.write(make_flag_file(prng, 50))

    nalign_cases = {
        "nalign_opt": [profs["qA"], profs["tA"], "-opt"],
        "nalign_cw_default": [profs["qA"], profs["tA"],
                              "--DELTA_RATIO", "0.1", "--NUM_SUBOPT", "30"],
        "nalign_cw_flags": [profs["qA"], profs["tA"], flagf,
                            "--DELTA_RATIO", "0.1", "--NUM_SUBOPT", "30"],
        "nalign_ucw": [profs["qA"], profs["tA"], "-ucw",
                       "--DELTA_RATIO", "0.05", "--NUM_SUBOPT", "30"],
        "nalign_B_opt": [profs["qB"], profs["tB"], "-opt"],
        "nalign_B_cw": [profs["qB"], profs["tB"],
                        "--DELTA_RATIO", "0.08", "--NUM_SUBOPT", "25"],
        "nalign_mode0": [profs["qA"], profs["tA"], "-opt", "--ALIGN_MODE", "0"],
        "nalign_mode1": [profs["qA"], profs["tA"], "-opt", "--ALIGN_MODE", "1"],
        "nalign_mode2": [profs["qA"], profs["tA"], "-opt", "--ALIGN_MODE", "2"],
        "nalign_pir": [profs["qA"], profs["tA"], "-opt", "--OUTPUT_FORMAT", "1"],
        "nalign_hmap": [profs["qA"], profs["tA"], "-opt", "--OUTPUT_FORMAT", "0",
                        "--SUB_MATRIX", BLOSUM],
    }
    for name, args in nalign_cases.items():
        out = run_ref("nalign", args)
        with open(os.path.join(GOLD, name + ".out"), "w") as f:
            f.write(out)

    print(f"golden fixtures written to {GOLD}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
