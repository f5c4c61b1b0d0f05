#!/usr/bin/env python3
"""Round-3 sweep 2: decompose strip-kernel e2e into producer / kernel on
the real TPU with the single-dispatch lax.scan methodology (two N values
isolate fixed dispatch overhead).

Usage: PYTHONPATH=.:/root/.axon_site python tools/r3_sweep2.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np

Q = T = 512
NS_SMALL, NS_BIG = 4, 24


def main():
    import jax
    import jax.numpy as jnp
    from alignment_algos_tpu.ops import swstrip

    print(f"device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)
    gap = jnp.array([[11.0, 1.0]], dtype=jnp.float32)
    table = jnp.asarray(rng.integers(-4, 12, (20, 20)).astype(np.float32))

    def timed(run, args, cells_per_batch, label):
        np.asarray(run(*args))
        outs = {}
        for tag, a in args[0].items() if isinstance(args[0], dict) else ():
            pass
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            total = float(np.asarray(run(*args)))
            best = min(best, time.perf_counter() - t0)
            assert np.isfinite(total)
        return best

    def scan_over(step, xs_list):
        @jax.jit
        def run(*xs):
            def body(acc, x):
                return acc + step(*x if isinstance(x, tuple) else (x,)), None
            acc, _ = jax.lax.scan(body, jnp.float32(0.0), xs)
            return acc
        return run

    def measure(step, make_inputs, b, label):
        res = {}
        for n in (NS_SMALL, NS_BIG):
            xs = make_inputs(n, b)
            run = scan_over(step, xs)
            np.asarray(run(*xs) if isinstance(xs, tuple) else run(xs))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                total = float(np.asarray(run(*xs) if isinstance(xs, tuple)
                                         else run(xs)))
                best = min(best, time.perf_counter() - t0)
                assert np.isfinite(total)
            res[n] = best
        per = (res[NS_BIG] - res[NS_SMALL]) / (NS_BIG - NS_SMALL)
        gc = b * Q * T / per / 1e9 if per > 0 else float("inf")
        print(f"{label:44s} per-batch {per*1e3:7.3f} ms = {gc:7.1f} GCUPS",
              flush=True)
        return per

    def codes(n, b):
        return (jnp.asarray(rng.integers(0, 20, (n, b, Q)), jnp.int32),
                jnp.asarray(rng.integers(0, 20, (n, b, T)), jnp.int32))

    # ---- producer only ---------------------------------------------------
    for b, strip, kd in [(512, 64, 16)]:
        def prod(qc, tc, strip=strip, kd=kd):
            sd = swstrip.strip_skewed_similarity_from_codes(
                qc, tc, table, strip=strip, kd=kd, sim_dtype=jnp.int8)
            return jnp.float32(jnp.sum(sd[..., ::97, 0].astype(jnp.int32)))
        measure(prod, codes, b, f"producer B={b} S={strip}")

    # ---- kernel only (pre-staged strip-skewed inputs) --------------------
    def staged(n, b, strip, kd):
        sds = []
        for i in range(n):
            qc = jnp.asarray(rng.integers(0, 20, (b, Q)), jnp.int32)
            tc = jnp.asarray(rng.integers(0, 20, (b, T)), jnp.int32)
            sds.append(swstrip.strip_skewed_similarity_from_codes(
                qc, tc, table, strip=strip, kd=kd, sim_dtype=jnp.int8))
        out = jnp.stack(sds)
        out.block_until_ready()
        return out

    for b, strip, kd, uf in [(512, 64, 16, 4), (512, 64, 16, 8),
                             (512, 64, 16, 16), (512, 64, 32, 8),
                             (1024, 64, 16, 8), (512, 128, 16, 8)]:
        try:
            def kern(sd, strip=strip, kd=kd, uf=uf):
                return jnp.sum(swstrip.sw_affine_scores_striped(
                    sd, gap, q=Q, t=T, strip=strip, kd=kd, uf=uf))
            measure(kern,
                    lambda n, b, strip=strip, kd=kd: staged(n, b, strip, kd),
                    b, f"kernel B={b} S={strip} kd={kd} uf={uf}")
        except Exception as e:
            msg = " ".join(str(e).split())[:160]
            print(f"kernel B={b} S={strip} kd={kd} uf={uf}: FAILED {msg}",
                  flush=True)

    # ---- e2e best candidates ---------------------------------------------
    for b, strip, kd, uf in [(512, 64, 16, 8), (1024, 64, 16, 8)]:
        try:
            def e2e(qc, tc, strip=strip, kd=kd, uf=uf):
                sd = swstrip.strip_skewed_similarity_from_codes(
                    qc, tc, table, strip=strip, kd=kd, sim_dtype=jnp.int8)
                return jnp.sum(swstrip.sw_affine_scores_striped(
                    sd, gap, q=Q, t=T, strip=strip, kd=kd, uf=uf))
            measure(e2e, codes, b, f"e2e B={b} S={strip} kd={kd} uf={uf}")
        except Exception as e:
            msg = " ".join(str(e).split())[:160]
            print(f"e2e B={b} S={strip}: FAILED {msg}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
