#!/usr/bin/env python3
"""Autotune sweep for the batched SW wavefront kernel on the real TPU.

Each configuration runs in a supervised child process (the TPU tunnel can
wedge; a blocked device call is not interruptible in-process) using the
honest-measurement methodology from bench.py: distinct inputs per iteration,
a device-side accumulator chaining every execution, one host pull at the end.

Usage:
  python tools/kernel_sweep.py            # sweep the config table, print all
  python tools/kernel_sweep.py --one B DTYPE FUSED KD   # child: one config
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

Q = T = 512
ITERS = 8

CONFIGS = [
    # (batch, sim dtype, fused batch-last skew, kd override or 0=auto)
    (128, "float32", 0, 0),     # round-1 baseline shape
    (128, "float32", 1, 0),
    (256, "int8", 1, 0),
    (512, "bfloat16", 1, 0),
    (512, "int8", 0, 0),
    (512, "int8", 1, 0),
    (512, "int8", 1, 8),
    (1024, "bfloat16", 1, 0),
    (1024, "int8", 1, 0),
    (1024, "int8", 0, 0),
    (2048, "int8", 1, 0),
]


def run_one(b: int, dtype: str, fused: int, kd: int) -> dict:
    import numpy as np
    import jax
    import jax.numpy as jnp
    from alignment_algos_tpu.ops import swaffine

    sim_dtype = dict(float32=jnp.float32, bfloat16=jnp.bfloat16,
                     int8=jnp.int8)[dtype]
    rng = np.random.default_rng(0)
    qcs = [jnp.asarray(rng.integers(0, 20, (b, Q)), dtype=jnp.int32)
           for _ in range(ITERS)]
    tcs = [jnp.asarray(rng.integers(0, 20, (b, T)), dtype=jnp.int32)
           for _ in range(ITERS)]
    table = jnp.asarray(rng.integers(-4, 12, (20, 20)).astype(np.float32))
    gap = jnp.array([[11.0, 1.0]], dtype=jnp.float32)
    kd_arg = kd if kd else None

    @jax.jit
    def run(qc, tc, tbl, gp, acc):
        if fused:
            sd = swaffine.skewed_similarity_from_codes(qc, tc, tbl,
                                                       sim_dtype=sim_dtype)
        else:
            s = swaffine.similarity_from_codes(qc, tc, tbl,
                                               sim_dtype=sim_dtype)
            sd = swaffine.skew_similarity(s)
        scores = swaffine.sw_affine_scores_from_skewed(sd, gp, q=Q, t=T,
                                                       kd=kd_arg)
        return acc + jnp.sum(scores)

    acc = jnp.float32(0.0)
    np.asarray(run(qcs[0], tcs[0], table, gap, acc))  # compile + warm
    dt = float("inf")
    for _ in range(2):
        acc = jnp.float32(0.0)
        t0 = time.perf_counter()
        for i in range(ITERS):
            acc = run(qcs[i], tcs[i], table, gap, acc)
        total = float(np.asarray(acc))
        dt = min(dt, time.perf_counter() - t0)
        assert np.isfinite(total)
    cells = b * Q * T * ITERS
    eff_kd = kd or swaffine._auto_kd(
        swaffine._round_up(Q, 8), swaffine._round_up(b, 128),
        jnp.dtype(sim_dtype).itemsize)
    return {"b": b, "dtype": dtype, "fused": fused, "kd": eff_kd,
            "gcups": round(cells / dt / 1e9, 2), "sec": round(dt, 4)}


def main() -> int:
    if "--one" in sys.argv:
        i = sys.argv.index("--one")
        b, dtype, fused, kd = (int(sys.argv[i + 1]), sys.argv[i + 2],
                               int(sys.argv[i + 3]), int(sys.argv[i + 4]))
        print(json.dumps(run_one(b, dtype, fused, kd)))
        return 0

    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
    results = []
    for cfg in CONFIGS:
        args = [sys.executable, os.path.abspath(__file__), "--one",
                str(cfg[0]), cfg[1], str(cfg[2]), str(cfg[3])]
        try:
            r = subprocess.run(args, env=env, timeout=420,
                               capture_output=True, text=True)
        except subprocess.TimeoutExpired:
            print(f"{cfg}: TIMEOUT", flush=True)
            continue
        line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
        if r.returncode == 0 and line.startswith("{"):
            res = json.loads(line)
            results.append(res)
            print(json.dumps(res), flush=True)
        else:
            tail = (r.stderr or "").strip().splitlines()[-3:]
            print(f"{cfg}: FAILED rc={r.returncode} {' | '.join(tail)}",
                  flush=True)
    if results:
        best = max(results, key=lambda r: r["gcups"])
        print("BEST:", json.dumps(best))
    return 0


if __name__ == "__main__":
    sys.exit(main())
