"""Bit-parity check: row-scan prototype vs the Gotoh XLA twin (CPU)."""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, "/root/repo")

import numpy as np
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from alignment_algos_tpu.ops import swaffine
from r4_rowscan import sw_rowscan_screen

rng = np.random.default_rng(0)
for q, t, b in ((64, 64, 4), (40, 56, 3), (128, 96, 8)):
    qc = rng.integers(0, 20, q).astype(np.int32)
    tc = rng.integers(0, 20, (b, t)).astype(np.int32)
    table = rng.integers(-8, 12, (20, 20)).astype(np.float32)
    gi, ge = 11.0, 1.0
    ref = np.asarray(swaffine.sw_affine_batch_xla(
        jnp.broadcast_to(jnp.asarray(qc)[None, :], (b, q)),
        jnp.asarray(tc), jnp.asarray(table), gi, ge))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(sw_rowscan_screen(qc, tc, table, gi, ge,
                                           sim_dtype=jnp.float32))
    ok = np.array_equal(ref, got)
    print(f"q={q} t={t} b={b}: ref={ref[:4]} got={got[:4]} "
          f"{'BIT-EQUAL' if ok else 'MISMATCH'}")
    assert ok
print("all bit-equal")
