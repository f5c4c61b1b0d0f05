"""Round-4 TPU probe: row-scan prefix-max kernel vs the strip pipeline.

Honest methodology (CLAUDE.md): fold batches into ONE dispatch with
lax.scan over distinct inputs, thread the accumulator, difference two scan
lengths to cancel the ~5 ms fixed dispatch cost, best-of-N passes.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/r4_probe.py [dbl|nat] [B]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

import r4_rowscan as rs
from alignment_algos_tpu.ops import swstrip

STRATEGY = sys.argv[1] if len(sys.argv) > 1 else "dbl"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 512
Q = T = 512
GI, GE = 11.0, 1.0
ITERS, N_SHORT = 32, 8

print("device:", jax.devices()[0])
rng = np.random.default_rng(0)
qcs = jnp.asarray(rng.integers(0, 20, (ITERS, Q)), dtype=jnp.int32)
lib = jnp.asarray(rng.integers(0, 20, (B, T)), dtype=jnp.int32)
table = jnp.asarray(rng.integers(-8, 12, (20, 20)).astype(np.float32))
gap = jnp.array([[GI, GE]], dtype=jnp.float32)


def timed(fn, *args, passes=3):
    acc = jnp.float32(0.0)
    t0 = time.perf_counter()
    acc = fn(*args, acc)
    np.asarray(acc)
    print(f"  compile+warm {time.perf_counter()-t0:.1f}s", flush=True)
    best = float("inf")
    for _ in range(passes):
        t0 = time.perf_counter()
        acc = fn(*args, acc)
        total = float(np.asarray(acc))
        best = min(best, time.perf_counter() - t0)
        assert np.isfinite(total)
    return best


def diff_rate(fn, name):
    dt_long = timed(fn, qcs, lib, table, gap)
    dt_short = timed(fn, qcs[:N_SHORT], lib, table, gap)
    per = max((dt_long - dt_short) / (ITERS - N_SHORT), 1e-9)
    gcups = B * Q * T / per / 1e9
    print(f"{name}: per-batch {per*1e3:.3f} ms  -> {gcups:.1f} GCUPS "
          f"(long {dt_long:.3f}s short {dt_short:.3f}s)", flush=True)
    return per


# ---- correctness spot-check on device (vs strip engine) -------------------
sc_new = np.asarray(rs.sw_rowscan_screen(
    np.asarray(qcs[0]), np.asarray(lib[:256]), np.asarray(table), GI, GE,
    strategy=STRATEGY))
sc_old = np.asarray(swstrip.sw_affine_screen_striped(
    np.asarray(qcs[0]), np.asarray(lib[:256]), np.asarray(table), GI, GE))
eq = np.array_equal(sc_new, sc_old)
print("device bit-parity vs strip engine (256 templates):",
      "BIT-EQUAL" if eq else
      f"MISMATCH {np.abs(sc_new - sc_old).max()}", flush=True)

# ---- e2e row-scan (producer + kernel in one scan) -------------------------
@jax.jit
def run_rowscan(qrows, tcodes, tbl, gp, acc):
    def body(a, qc):
        sim = rs.rowscan_similarity_screen(qc, tcodes, tbl)
        sc = rs.sw_rowscan_scores(sim, gp, q=Q, t=T, strategy=STRATEGY)
        return a + jnp.sum(sc), None
    acc, _ = jax.lax.scan(body, acc, qrows)
    return acc


# ---- e2e strip pipeline (round-3 production path) -------------------------
@jax.jit
def run_strip(qrows, tcodes, tbl, gp, acc):
    def body(a, qc):
        sd = swstrip.strip_skewed_similarity_screen(qc, tcodes, tbl,
                                                    sim_dtype=jnp.int8)
        sc = swstrip.sw_affine_scores_striped(sd, gp, q=Q, t=T)
        return a + jnp.sum(sc), None
    acc, _ = jax.lax.scan(body, acc, qrows)
    return acc


# ---- kernel-only row-scan (pre-staged similarity) -------------------------
sims = jnp.stack([rs.rowscan_similarity_screen(qcs[i], lib, table)
                  for i in range(8)])
sims.block_until_ready()


@jax.jit
def run_kernel_only(sim_stack, tcodes, tbl, gp, acc):
    def body(a, sim):
        sc = rs.sw_rowscan_scores(sim, gp, q=Q, t=T, strategy=STRATEGY)
        return a + jnp.sum(sc), None
    acc, _ = jax.lax.scan(body, acc, sim_stack)
    return acc


def diff_rate_kernel():
    dt_long = timed(run_kernel_only, sims, lib, table, gap)
    dt_short = timed(run_kernel_only, sims[:2], lib, table, gap)
    per = max((dt_long - dt_short) / 6, 1e-9)
    print(f"rowscan kernel-only[{STRATEGY}]: per-batch {per*1e3:.3f} ms -> "
          f"{B*Q*T/per/1e9:.1f} GCUPS", flush=True)


diff_rate(run_rowscan, f"rowscan e2e[{STRATEGY}] B={B}")
diff_rate_kernel()
diff_rate(run_strip, "strip e2e (round-3)")
