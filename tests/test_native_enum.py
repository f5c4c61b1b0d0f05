"""Native C++ enumeration engine: byte-identical to the Python enumerators
across all four modes, and faster."""

import os
import time

import numpy as np
import pytest

from alignment_algos_tpu.core.alignment import AlignmentSet
from alignment_algos_tpu.core.dp import DPMatrix
from alignment_algos_tpu.core.enumerators import (ConstrainedNearOptimal,
                                                  CRConstrainedNearOptimal,
                                                  KSConstrainedNearOptimal,
                                                  UnconstrainedNearOptimal)
from alignment_algos_tpu.core.enumerators import native
from alignment_algos_tpu.scoring.hmap_eval import HMAPaliEval
from alignment_algos_tpu.seq.hmap import HMAPSequence
from alignment_algos_tpu.seq.sflags import SuboptFlags
from alignment_algos_tpu.utils.params import HMAPaliParams

DATA = os.path.join(os.path.dirname(__file__), "golden", "inputs")

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ compiler available")


@pytest.fixture(scope="module")
def dpm_and_flags():
    query = HMAPSequence.from_file(os.path.join(DATA, "qA.prof"))
    templ = HMAPSequence.from_file(os.path.join(DATA, "tA.prof"))
    params = HMAPaliParams()
    ev = HMAPaliEval(params)
    dpm = DPMatrix(query, templ, ev, "fwd", params.align_type)
    flags = SuboptFlags(True, templ.size())
    templ.get_default_flags(flags)
    return dpm, flags, params


PY_ENUMS = {
    "cw": lambda p, f: ConstrainedNearOptimal(p, f),
    "ucw": lambda p, f: UnconstrainedNearOptimal(p),
    "kscw": lambda p, f: KSConstrainedNearOptimal(p, f),
    "crcw": lambda p, f: CRConstrainedNearOptimal(p, f),
}


@pytest.mark.parametrize("mode,delta", [("cw", 0.12), ("ucw", 0.06),
                                        ("kscw", 0.2), ("crcw", 0.25)])
def test_native_matches_python(dpm_and_flags, mode, delta):
    dpm, flags, params = dpm_and_flags
    import copy
    p = copy.deepcopy(params)
    p.delta_ratio = delta
    p.number_suboptimal = 50

    as_py = AlignmentSet()
    PY_ENUMS[mode](p, flags).enumerate(dpm, as_py)
    out_native = native.enumerate_native(mode, dpm, p, flags)

    assert len(out_native) == len(as_py)
    for a, b in zip(out_native, as_py):
        assert list(a.pairs) == list(b.pairs)
        assert np.float32(a.score) == np.float32(b.score)


def test_native_matches_python_large_output(dpm_and_flags):
    """Byte parity at a larger enumerated-set size than the parametrized
    cases above.  (This replaces a former wall-clock native-vs-python
    assertion: on this 51-residue fixture the native win is marginal and
    load-sensitive — per-call marshalling is O(Q*T) while enumeration is
    output-bound — so it flaked under parallel load.  Perf claims live in
    bench.py / docs/SCALING.md, measured at production budgets where the
    native engines win 50-500x.)"""
    dpm, flags, params = dpm_and_flags
    import copy
    p = copy.deepcopy(params)
    p.delta_ratio = 0.5
    p.number_suboptimal = 5000

    as_py = AlignmentSet()
    ConstrainedNearOptimal(p, flags).enumerate(dpm, as_py)
    out_native = native.enumerate_native("cw", dpm, p, flags)

    assert len(out_native) == len(as_py) and len(as_py) > 50
    for a, b in zip(out_native, as_py):
        assert list(a.pairs) == list(b.pairs)
        assert np.float32(a.score) == np.float32(b.score)
