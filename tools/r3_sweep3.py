#!/usr/bin/env python3
"""Round-3 sweep 3: producer variants (f32 vs int8 MXU path; transposed
row layout vs transpose-free qd layout) and the qd kernel's middle-axis
slice cost, on the real TPU.  Single-dispatch lax.scan methodology;
staged arrays are freed between configs (sweep 2 exhausted HBM).

Usage: PYTHONPATH=.:/root/.axon_site python tools/r3_sweep3.py
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

    def measure(step, make_inputs, label):
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
            gc_ = B * Q * T / per / 1e9 if per > 0 else float("inf")
            print(f"{label:52s} per-batch {per*1e3:7.3f} ms = "
                  f"{gc_:7.1f} GCUPS", flush=True)
        except Exception as e:
            msg = " ".join(str(e).split())[:140]
            print(f"{label}: FAILED {msg}", flush=True)

    def codes(n):
        return (jnp.asarray(rng.integers(0, 20, (n, B, Q)), jnp.int32),
                jnp.asarray(rng.integers(0, 20, (n, B, T)), jnp.int32))

    def probe(sd):
        return jnp.float32(jnp.sum(sd[..., ::97, 0].astype(jnp.int32)))

    # ---- producers -------------------------------------------------------
    measure(lambda qc, tc: probe(swstrip.strip_skewed_similarity_from_codes(
        qc, tc, table, strip=S, kd=KD)), codes, "producer row f32-mm")
    measure(lambda qc, tc: probe(swstrip.strip_skewed_similarity_from_codes(
        qc, tc, table, strip=S, kd=KD, int8_mm=True)), codes,
        "producer row int8-mm")
    measure(lambda qc, tc: probe(swstrip.strip_skewed_similarity_qd(
        qc, tc, table, strip=S, kd=KD)), codes, "producer qd f32-mm")
    measure(lambda qc, tc: probe(swstrip.strip_skewed_similarity_qd(
        qc, tc, table, strip=S, kd=KD, int8_mm=True)), codes,
        "producer qd int8-mm")

    # ---- kernels on pre-staged inputs -------------------------------------
    def staged(n, qd):
        sds = []
        for i in range(n):
            qc = jnp.asarray(rng.integers(0, 20, (B, Q)), jnp.int32)
            tc = jnp.asarray(rng.integers(0, 20, (B, T)), jnp.int32)
            f = (swstrip.strip_skewed_similarity_qd if qd
                 else swstrip.strip_skewed_similarity_from_codes)
            sds.append(f(qc, tc, table, strip=S, kd=KD))
        out = jnp.stack(sds)
        out.block_until_ready()
        return (out,)

    measure(lambda sd: jnp.sum(swstrip.sw_affine_scores_striped(
        sd, gap, q=Q, t=T, strip=S, kd=KD, uf=UF)),
        lambda n: staged(n, qd=False), "kernel row")
    gc.collect()
    measure(lambda sd: jnp.sum(swstrip.sw_affine_scores_striped_qd(
        sd, gap, q=Q, t=T, strip=S, kd=KD, uf=UF)),
        lambda n: staged(n, qd=True), "kernel qd")
    gc.collect()

    # ---- e2e combos --------------------------------------------------------
    def e2e_row(qc, tc):
        sd = swstrip.strip_skewed_similarity_from_codes(
            qc, tc, table, strip=S, kd=KD, int8_mm=True)
        return jnp.sum(swstrip.sw_affine_scores_striped(
            sd, gap, q=Q, t=T, strip=S, kd=KD, uf=UF))
    measure(e2e_row, codes, "e2e row int8-mm")

    def e2e_qd(qc, tc):
        sd = swstrip.strip_skewed_similarity_qd(
            qc, tc, table, strip=S, kd=KD, int8_mm=True)
        return jnp.sum(swstrip.sw_affine_scores_striped_qd(
            sd, gap, q=Q, t=T, strip=S, kd=KD, uf=UF))
    measure(e2e_qd, codes, "e2e qd int8-mm")

    # device parity of the full qd+int8 path vs the row path
    qc = jnp.asarray(rng.integers(0, 20, (B, Q)), jnp.int32)
    tc = jnp.asarray(rng.integers(0, 20, (B, T)), jnp.int32)
    a = np.asarray(swstrip.sw_affine_scores_striped(
        swstrip.strip_skewed_similarity_from_codes(qc, tc, table, strip=S,
                                                   kd=KD),
        gap, q=Q, t=T, strip=S, kd=KD, uf=UF))
    b_ = np.asarray(swstrip.sw_affine_scores_striped_qd(
        swstrip.strip_skewed_similarity_qd(qc, tc, table, strip=S, kd=KD,
                                           int8_mm=True),
        gap, q=Q, t=T, strip=S, kd=KD, uf=UF))
    print(f"device bit-parity qd+int8 vs row: {bool(np.array_equal(a, b_))}",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
