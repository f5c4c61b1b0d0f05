#!/usr/bin/env python3
"""Round-3 throughput probe: monolithic vs strip-mined SW kernel on the
real TPU.  Honest-measurement methodology per CLAUDE.md: distinct inputs
per iteration, device-side accumulator, single host pull.

Usage: env -u JAX_PLATFORMS python tools/r3_strip_bench.py [--iters N]
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
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()
    import jax
    import jax.numpy as jnp
    from alignment_algos_tpu.ops import swaffine, swstrip

    print(f"device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)
    gap = jnp.array([[11.0, 1.0]], dtype=jnp.float32)
    table = jnp.asarray(rng.integers(-4, 12, (20, 20)).astype(np.float32))

    def codes(b):
        return ([jnp.asarray(rng.integers(0, 20, (b, Q)), jnp.int32)
                 for _ in range(args.iters)],
                [jnp.asarray(rng.integers(0, 20, (b, T)), jnp.int32)
                 for _ in range(args.iters)])

    def timed(fn, inputs):
        acc = jnp.float32(0.0)
        np.asarray(fn(inputs[0], acc))
        best = float("inf")
        for _ in range(2):
            acc = jnp.float32(0.0)
            t0 = time.perf_counter()
            for x in inputs:
                acc = fn(x, acc)
            total = float(np.asarray(acc))
            best = min(best, time.perf_counter() - t0)
            assert np.isfinite(total)
        return best

    def report(label, b, dt):
        cells = b * Q * T * args.iters
        print(f"{label:42s} {cells / dt / 1e9:8.2f} GCUPS "
              f"({dt * 1e3 / args.iters:6.2f} ms/iter)", flush=True)

    results = {}

    # --- monolithic production config (round-2 adopted) ------------------
    b = 512
    qcs, tcs = codes(b)

    def mono_e2e(x, acc):
        sd = swaffine.skewed_similarity_from_codes(x[0], x[1], table,
                                                   sim_dtype=jnp.int8)
        sc = swaffine.sw_affine_scores_from_skewed(sd, gap, q=Q, t=T,
                                                   kd=8, uf=4)
        return acc + jnp.sum(sc)
    dt = timed(jax.jit(mono_e2e), list(zip(qcs, tcs)))
    report("mono e2e B=512 int8 kd8 uf4", b, dt)

    sds = [jax.block_until_ready(swaffine.skewed_similarity_from_codes(
        qcs[i], tcs[i], table, sim_dtype=jnp.int8))
        for i in range(args.iters)]

    def mono_k(sd, acc):
        sc = swaffine.sw_affine_scores_from_skewed(sd, gap, q=Q, t=T,
                                                   kd=8, uf=4)
        return acc + jnp.sum(sc)
    dt = timed(jax.jit(mono_k), sds)
    report("mono kernel B=512 int8 kd8 uf4", b, dt)
    del sds

    # --- strip variants ---------------------------------------------------
    for b, strip, kd, uf in [(512, 64, 16, 4), (512, 128, 16, 4),
                             (512, 64, 32, 4), (1024, 64, 16, 4),
                             (1024, 128, 16, 4), (2048, 64, 16, 4)]:
        try:
            qcs, tcs = codes(b)

            def strip_e2e(x, acc, strip=strip, kd=kd, uf=uf):
                sd = swstrip.strip_skewed_similarity_from_codes(
                    x[0], x[1], table, strip=strip, kd=kd,
                    sim_dtype=jnp.int8)
                sc = swstrip.sw_affine_scores_striped(
                    sd, gap, q=Q, t=T, strip=strip, kd=kd, uf=uf)
                return acc + jnp.sum(sc)
            dt = timed(jax.jit(strip_e2e), list(zip(qcs, tcs)))
            report(f"strip e2e B={b} S={strip} kd={kd} uf={uf}", b, dt)

            sds = [jax.block_until_ready(
                swstrip.strip_skewed_similarity_from_codes(
                    qcs[i], tcs[i], table, strip=strip, kd=kd,
                    sim_dtype=jnp.int8)) for i in range(args.iters)]

            def strip_k(sd, acc, strip=strip, kd=kd, uf=uf):
                sc = swstrip.sw_affine_scores_striped(
                    sd, gap, q=Q, t=T, strip=strip, kd=kd, uf=uf)
                return acc + jnp.sum(sc)
            dt = timed(jax.jit(strip_k), sds)
            report(f"strip kernel B={b} S={strip} kd={kd} uf={uf}", b, dt)
            del sds
        except Exception as e:
            msg = " ".join(str(e).split())[:160]
            print(f"strip B={b} S={strip} kd={kd}: FAILED {msg}", flush=True)

    # correctness spot-check on device: strip vs monolithic scores
    b = 512
    qc = jnp.asarray(rng.integers(0, 20, (b, Q)), jnp.int32)
    tc = jnp.asarray(rng.integers(0, 20, (b, T)), jnp.int32)
    sd_m = swaffine.skewed_similarity_from_codes(qc, tc, table,
                                                 sim_dtype=jnp.int8)
    ref = np.asarray(swaffine.sw_affine_scores_from_skewed(
        sd_m, gap, q=Q, t=T, kd=8, uf=4))[:b]
    sd_s = swstrip.strip_skewed_similarity_from_codes(qc, tc, table,
                                                      strip=64, kd=16,
                                                      sim_dtype=jnp.int8)
    got = np.asarray(swstrip.sw_affine_scores_striped(
        sd_s, gap, q=Q, t=T, strip=64, kd=16, uf=4))[:b]
    ok = bool(np.array_equal(ref, got))
    print(f"device bit-parity strip vs mono: {ok}", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
