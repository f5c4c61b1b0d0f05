#!/usr/bin/env python3
"""Round-3 sweep 5: producer stage decomposition on the real TPU.
P0 einsum+convert only; P1 + strip-skew (row-major); P2 + transpose
(production).  Identical probe on every variant so stage costs come from
differences.  Also: int8 vs f32 transpose alternatives.

Usage: PYTHONPATH=.:/root/.axon_site python tools/r3_sweep5.py
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
B, S, KD = 512, 64, 16


def main():
    import jax
    import jax.numpy as jnp

    print(f"device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.integers(-4, 12, (20, 20)).astype(np.float32))
    lib = jnp.asarray(rng.integers(0, 20, (B, T)), jnp.int32)
    a = 20
    ns = Q // S
    ds = S + T - 1
    dsp = -(-ds // KD) * KD

    def probe(x):
        # cheap but unavoidable consumer: strided sum
        return jnp.float32(jnp.sum(x.reshape(-1)[::1009].astype(jnp.int32)))

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
            print(f"{label:46s} per-batch {per*1e3:7.3f} ms", flush=True)
        except Exception as e:
            msg = " ".join(str(e).split())[:140]
            print(f"{label}: FAILED {msg}", flush=True)

    def einsum_sim(qc, dtype=jnp.int8):
        qoh = jax.nn.one_hot(qc, a, dtype=jnp.float32)
        qt = jnp.dot(qoh, table, preferred_element_type=jnp.float32)
        toh = jax.nn.one_hot(lib.T, a, dtype=jnp.float32, axis=0)
        sim = jnp.dot(qt, toh.reshape(a, T * B),
                      preferred_element_type=jnp.float32)
        return sim.reshape(Q, T, B).astype(dtype)

    def skew_rowmajor(sim):
        sim = sim.reshape(ns, S, T, B)
        padded = jnp.pad(sim, ((0, 0), (0, 0), (0, S), (0, 0)))
        flat = padded.reshape(ns, S * (T + S), B)[:, : S * (T + S - 1)]
        sk = flat.reshape(ns, S, T + S - 1, B)
        return jnp.pad(sk, ((0, 0), (0, 0), (0, dsp - ds), (0, 0)))

    measure(lambda qc: probe(einsum_sim(qc)), "P0 einsum->int8")
    measure(lambda qc: probe(einsum_sim(qc, jnp.float32)), "P0f einsum f32")
    measure(lambda qc: probe(skew_rowmajor(einsum_sim(qc))),
            "P1 + strip-skew (row-major int8)")
    measure(lambda qc: probe(jnp.transpose(
        skew_rowmajor(einsum_sim(qc)), (0, 2, 1, 3))),
        "P2 + transpose int8 (production)")
    measure(lambda qc: probe(jnp.transpose(
        skew_rowmajor(einsum_sim(qc, jnp.float32)), (0, 2, 1, 3))
        .astype(jnp.int8)), "P2f f32 chain, convert last")
    # swap order: transpose the unskewed sim (Q,T,B)->(T,Q,B) is NOT the
    # needed permutation; instead try skew on (S, T) with T-major flatten
    measure(lambda qc: probe(jnp.swapaxes(
        skew_rowmajor(einsum_sim(qc)), 1, 2)),
        "P2s swapaxes variant")
    return 0


if __name__ == "__main__":
    sys.exit(main())
