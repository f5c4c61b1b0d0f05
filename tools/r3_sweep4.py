#!/usr/bin/env python3
"""Round-3 sweep 4: screen-shaped producer (one query x resident library,
single MXU matmul) + strip kernel at growing lane counts, on the real TPU.
Single-dispatch lax.scan over queries; staged arrays freed between configs.

Usage: PYTHONPATH=.:/root/.axon_site python tools/r3_sweep4.py
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
S, KD, UF = 64, 16, 4


def main():
    import jax
    import jax.numpy as jnp
    from alignment_algos_tpu.ops import swstrip

    print(f"device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)
    gap = jnp.array([[11.0, 1.0]], dtype=jnp.float32)
    table = jnp.asarray(rng.integers(-4, 12, (20, 20)).astype(np.float32))

    def measure(step, make_inputs, b, label):
        try:
            res = {}
            for n in (N_SMALL, N_BIG):
                xs = make_inputs(n)

                @jax.jit
                def run(*a):
                    def body(acc, x):
                        return acc + step(*x), None
                    acc, _ = jax.lax.scan(body, jnp.float32(0.0), a)
                    return acc
                np.asarray(run(*xs))
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    total = float(np.asarray(run(*xs)))
                    best = min(best, time.perf_counter() - t0)
                    assert np.isfinite(total)
                res[n] = best
                del xs
                gc.collect()
            per = (res[N_BIG] - res[N_SMALL]) / (N_BIG - N_SMALL)
            gcups = b * Q * T / per / 1e9 if per > 0 else float("inf")
            print(f"{label:52s} per-batch {per*1e3:7.3f} ms = "
                  f"{gcups:7.1f} GCUPS", flush=True)
        except Exception as e:
            msg = " ".join(str(e).split())[:140]
            print(f"{label}: FAILED {msg}", flush=True)

    def probe(sd):
        return jnp.float32(jnp.sum(sd[..., ::97, 0].astype(jnp.int32)))

    for b in (512, 1024, 2048):
        lib = jnp.asarray(rng.integers(0, 20, (b, T)), jnp.int32)

        def qrows(n):
            return (jnp.asarray(rng.integers(0, 20, (n, Q)), jnp.int32),)

        def prod(qc, lib=lib):
            return probe(swstrip.strip_skewed_similarity_screen(
                qc, lib, table, strip=S, kd=KD))
        measure(prod, qrows, b, f"screen producer B={b}")

        def e2e(qc, lib=lib):
            sd = swstrip.strip_skewed_similarity_screen(
                qc, lib, table, strip=S, kd=KD)
            return jnp.sum(swstrip.sw_affine_scores_striped(
                sd, gap, q=Q, t=T, strip=S, kd=KD, uf=UF))
        measure(e2e, qrows, b, f"screen e2e B={b}")

        def staged(n, lib=lib):
            sds = []
            for i in range(n):
                qc = jnp.asarray(rng.integers(0, 20, (Q,)), jnp.int32)
                sds.append(swstrip.strip_skewed_similarity_screen(
                    qc, lib, table, strip=S, kd=KD))
            out = jnp.stack(sds)
            out.block_until_ready()
            return (out,)

        if b <= 1024:
            def kern(sd):
                return jnp.sum(swstrip.sw_affine_scores_striped(
                    sd, gap, q=Q, t=T, strip=S, kd=KD, uf=UF))
            measure(kern, staged, b, f"kernel B={b}")
        del lib
        gc.collect()
    return 0


if __name__ == "__main__":
    sys.exit(main())
