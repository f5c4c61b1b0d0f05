#!/usr/bin/env python3
"""Round-3 probe: amortize the tunnel's fixed per-dispatch cost (~5 ms,
measured by tools/ablate_kernel.py: every variant costs the same wall time
regardless of FLOPs, bytes, kd, or grid steps) by folding N batches into
ONE dispatch with lax.scan.  Timing two different N isolates the true
per-batch device time:  t(N) = overhead + N * t_batch.

Usage: PYTHONPATH=.:/root/.axon_site python tools/r3_scan_bench.py
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np

Q = T = 512


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ns", type=int, nargs="+", default=[4, 32])
    args = ap.parse_args()
    import jax
    import jax.numpy as jnp
    from alignment_algos_tpu.ops import swaffine, swstrip

    print(f"device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)
    gap = jnp.array([[11.0, 1.0]], dtype=jnp.float32)
    table = jnp.asarray(rng.integers(-4, 12, (20, 20)).astype(np.float32))

    def timed_scan(step, b, n, label):
        """step(qc (B,Q), tc (B,T)) -> (B,) scores; scanned over n batches
        in ONE dispatch.  Returns wall seconds for the dispatch."""
        qc = jnp.asarray(rng.integers(0, 20, (n, b, Q)), jnp.int32)
        tc = jnp.asarray(rng.integers(0, 20, (n, b, T)), jnp.int32)

        @jax.jit
        def run(qcs, tcs):
            def body(acc, xs):
                return acc + jnp.sum(step(xs[0], xs[1])), None
            acc, _ = jax.lax.scan(body, jnp.float32(0.0), (qcs, tcs))
            return acc
        np.asarray(run(qc, tc))  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            total = float(np.asarray(run(qc, tc)))
            best = min(best, time.perf_counter() - t0)
            assert np.isfinite(total)
        cells = b * Q * T * n
        print(f"{label:40s} N={n:3d}  {best*1e3:8.2f} ms  "
              f"{cells/best/1e9:8.2f} GCUPS", flush=True)
        return best

    def mono_step(qc, tc):
        sd = swaffine.skewed_similarity_from_codes(qc, tc, table,
                                                   sim_dtype=jnp.int8)
        return swaffine.sw_affine_scores_from_skewed(sd, gap, q=Q, t=T,
                                                     kd=8, uf=4)

    def strip_step_factory(strip, kd, uf):
        def step(qc, tc):
            sd = swstrip.strip_skewed_similarity_from_codes(
                qc, tc, table, strip=strip, kd=kd, sim_dtype=jnp.int8)
            return swstrip.sw_affine_scores_striped(
                sd, gap, q=Q, t=T, strip=strip, kd=kd, uf=uf)
        return step

    variants = [
        ("mono B=512 kd8 uf4", mono_step, 512),
        ("strip B=512 S=64 kd16 uf4", strip_step_factory(64, 16, 4), 512),
        ("strip B=512 S=128 kd16 uf4", strip_step_factory(128, 16, 4), 512),
        ("strip B=1024 S=64 kd16 uf4", strip_step_factory(64, 16, 4), 1024),
        ("strip B=1024 S=128 kd16 uf4", strip_step_factory(128, 16, 4), 1024),
    ]
    for label, step, b in variants:
        try:
            ts = {}
            for n in args.ns:
                ts[n] = timed_scan(step, b, n, label)
            if len(args.ns) == 2:
                n0, n1 = args.ns
                per = (ts[n1] - ts[n0]) / (n1 - n0)
                gc = b * Q * T / per / 1e9 if per > 0 else float("inf")
                print(f"  -> device per-batch {per*1e3:.3f} ms  "
                      f"= {gc:.1f} GCUPS steady-state", flush=True)
        except Exception as e:
            msg = " ".join(str(e).split())[:200]
            print(f"{label}: FAILED {msg}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
