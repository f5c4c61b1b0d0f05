#!/usr/bin/env python3
"""Round-3 sweep 6: e2e-level producer alternatives (no probe pollution —
the kernel consumes the full array, so nothing can be DCE'd).

Usage: PYTHONPATH=.:/root/.axon_site python tools/r3_sweep6.py
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np

Q = T = 512
N_SMALL, N_BIG = 4, 20
B, S, KD, UF = 512, 64, 16, 4


def main():
    import jax
    import jax.numpy as jnp
    from alignment_algos_tpu.ops import swstrip

    print(f"device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)
    gap = jnp.array([[11.0, 1.0]], dtype=jnp.float32)
    table = jnp.asarray(rng.integers(-4, 12, (20, 20)).astype(np.float32))
    lib = jnp.asarray(rng.integers(0, 20, (B, T)), jnp.int32)

    def measure(step, label):
        try:
            res = {}
            for n in (N_SMALL, N_BIG):
                qcs = jnp.asarray(rng.integers(0, 20, (n, Q)), jnp.int32)

                @jax.jit
                def run(qq):
                    def body(acc, qc):
                        return acc + step(qc), None
                    acc, _ = jax.lax.scan(body, jnp.float32(0.0), qq)
                    return acc
                np.asarray(run(qcs))
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    total = float(np.asarray(run(qcs)))
                    best = min(best, time.perf_counter() - t0)
                    assert np.isfinite(total)
                res[n] = best
                del qcs
                gc.collect()
            per = (res[N_BIG] - res[N_SMALL]) / (N_BIG - N_SMALL)
            gcups = B * Q * T / per / 1e9 if per > 0 else float("inf")
            print(f"{label:48s} per-batch {per*1e3:7.3f} ms = "
                  f"{gcups:7.1f} GCUPS", flush=True)
        except Exception as e:
            msg = " ".join(str(e).split())[:140]
            print(f"{label}: FAILED {msg}", flush=True)

    def e2e(sim_dtype, strip=S, kd=KD, uf=UF):
        def step(qc):
            sd = swstrip.strip_skewed_similarity_screen(
                qc, lib, table, strip=strip, kd=kd, sim_dtype=sim_dtype)
            return jnp.sum(swstrip.sw_affine_scores_striped(
                sd, gap, q=Q, t=T, strip=strip, kd=kd, uf=uf))
        return step

    measure(e2e(jnp.int8), "e2e screen int8 S64 kd16")
    measure(e2e(jnp.float32), "e2e screen f32 S64 kd16")
    measure(e2e(jnp.bfloat16), "e2e screen bf16 S64 kd16")
    measure(e2e(jnp.int8, kd=32, uf=8), "e2e screen int8 S64 kd32 uf8")
    measure(e2e(jnp.int8, strip=128), "e2e screen int8 S128 kd16")
    return 0


if __name__ == "__main__":
    sys.exit(main())
