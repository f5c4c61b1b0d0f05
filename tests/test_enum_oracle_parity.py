"""Byte-level enumerator parity vs the compiled reference oracle
(tools/oracle_enum.cpp built by tools/build_reference.py).

Runs only when /tmp/refbuild/oracle_enum exists; the golden-generation
machinery rebuilds it.  Uses the numpy DP backend (bit-identical to the JAX
engine per test_dp_engine) to keep subprocess startup cheap.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
INP = os.path.join(ROOT, "tests", "golden", "inputs")
ORACLE = "/tmp/refbuild/oracle_enum"

pytestmark = pytest.mark.skipif(not os.path.exists(ORACLE),
                                reason="reference oracle not built")

FLAGS_A = "1" * 10 + "0" * 15 + "1" * 12 + "0" * 8 + "1" * 7  # len 52

CASES = [
    ("cw", "qA", "tA", []),
    ("cw", "qA", "tA", ["--DELTA_RATIO", "0.15"]),
    ("cw", "qA", "tA", [FLAGS_A, "--DELTA_RATIO", "0.12"]),
    ("cw", "qB", "tB", ["--DELTA_RATIO", "0.08"]),
    ("ucw", "qA", "tA", ["--DELTA_RATIO", "0.06"]),
    ("ucw", "qB", "tB", ["--DELTA_RATIO", "0.04"]),
    ("kscw", "qA", "tA", ["--DELTA_RATIO", "0.15", "--K_LIMIT", "8"]),
    ("kscw", "qA", "tA", [FLAGS_A, "--DELTA_RATIO", "0.2", "--K_LIMIT", "4"]),
    ("kscw", "qB", "tB", ["--DELTA_RATIO", "0.1"]),
    ("crcw", "qA", "tA", ["--DELTA_RATIO", "0.15"]),
    ("crcw", "qA", "tA", [FLAGS_A, "--DELTA_RATIO", "0.25",
                          "--MAX_OVERLAP", "0.5", "--SORT_LIMIT", "20"]),
    ("crcw", "qB", "tB", ["--DELTA_RATIO", "0.12", "--K_LIMIT", "8"]),
    ("cw", "qA", "tA", ["--ALIGN_MODE", "1", "--DELTA_RATIO", "0.1"]),
    ("kscw", "qA", "tA", ["--ALIGN_MODE", "0", "--DELTA_RATIO", "0.15"]),
    ("crcw", "qA", "tA", ["--ALIGN_MODE", "2", "--DELTA_RATIO", "0.15"]),
]


@pytest.mark.parametrize("mode,q,t,extra", CASES)
def test_enumerator_oracle_parity(mode, q, t, extra):
    args = [mode, os.path.join(INP, f"{q}.prof"), os.path.join(INP, f"{t}.prof")] + extra
    env = dict(os.environ)
    env["HOME"] = "/tmp/refbuild"
    ref = subprocess.run([ORACLE] + args, capture_output=True, text=True, env=env)
    assert ref.returncode == 0, ref.stderr[-1000:]

    env2 = dict(os.environ)
    env2["HOME"] = "/tmp/nonexistent"
    env2["AAT_DP_BACKEND"] = "numpy"
    env2.setdefault("JAX_PLATFORMS", "cpu")
    mine = subprocess.run([sys.executable, os.path.join(ROOT, "tools", "py_oracle_enum.py")]
                         + args, capture_output=True, text=True, env=env2, cwd=ROOT)
    assert mine.returncode == 0, mine.stderr[-2000:]
    assert mine.stdout == ref.stdout
