#!/usr/bin/env python3
"""Breakdown probe for the wavefront pipeline on the real TPU: times
(a) a null dispatch, (b) similarity+skew alone, (c) the DP kernel alone on
a pre-skewed device-resident input, (d) the full pipeline — each with the
honest distinct-inputs + device-accumulator methodology."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

B = int(os.environ.get("PB", "512"))
Q = T = int(os.environ.get("PQ", "512"))
KD = int(os.environ.get("PKD", "8"))
DT = os.environ.get("PDT", "int8")
ITERS = 16


def main():
    import jax
    import jax.numpy as jnp
    from alignment_algos_tpu.ops import swaffine

    sim_dtype = dict(float32=jnp.float32, bfloat16=jnp.bfloat16,
                     int8=jnp.int8)[DT]
    rng = np.random.default_rng(0)
    qcs = [jnp.asarray(rng.integers(0, 20, (B, Q)), jnp.int32)
           for _ in range(ITERS)]
    tcs = [jnp.asarray(rng.integers(0, 20, (B, T)), jnp.int32)
           for _ in range(ITERS)]
    table = jnp.asarray(rng.integers(-4, 12, (20, 20)).astype(np.float32))
    gap = jnp.array([[11.0, 1.0]], dtype=jnp.float32)

    def bench(fn, inputs, label):
        acc = jnp.float32(0.0)
        np.asarray(fn(inputs[0], acc))
        best = float("inf")
        for _ in range(2):
            acc = jnp.float32(0.0)
            t0 = time.perf_counter()
            for x in inputs:
                acc = fn(x, acc)
            assert np.isfinite(float(np.asarray(acc)))
            best = min(best, time.perf_counter() - t0)
        per = best / len(inputs)
        print(f"{label:28s} {per*1e3:8.3f} ms/iter "
              f"({B*Q*T/per/1e9:7.2f} GCUPS-equiv)", flush=True)
        return per

    # (a) null dispatch: trivial compute on a distinct input each iter
    @jax.jit
    def null_fn(x, acc):
        return acc + jnp.float32(jnp.sum(x[:, :8]))
    bench(null_fn, qcs, "null dispatch")

    # (b) similarity + fused skew only
    @jax.jit
    def simskew(args, acc):
        qc, tc = args
        sd = swaffine.skewed_similarity_from_codes(qc, tc, table,
                                                   sim_dtype=sim_dtype)
        return acc + jnp.float32(jnp.sum(sd[Q // 2].astype(jnp.float32)))
    bench(simskew, list(zip(qcs, tcs)), "similarity+skew")

    # (b2) sim+skew alternates
    @jax.jit
    def simskew_b(args, acc):
        qc, tc = args
        s = swaffine.similarity_from_codes(qc, tc, table,
                                           sim_dtype=sim_dtype)
        sd = swaffine.skew_similarity(s)
        return acc + jnp.float32(jnp.sum(sd[Q // 2].astype(jnp.float32)))
    bench(simskew_b, list(zip(qcs, tcs)), "similarity+skew (B-first)")

    # (c) kernel only, pre-skewed device-resident inputs
    sds = [swaffine.skewed_similarity_from_codes(qcs[i], tcs[i], table,
                                                 sim_dtype=sim_dtype)
           for i in range(ITERS)]
    sds = [jax.block_until_ready(s) for s in sds]

    for kd, uf in [(4, 2), (8, 2), (8, 4), (8, 8), (16, 4), (16, 8),
                   (24, 8), (16, 16)]:
        def kern(sd, acc, kd=kd, uf=uf):
            sc = swaffine.sw_affine_scores_from_skewed(sd, gap, q=Q, t=T,
                                                       kd=kd, uf=uf)
            return acc + jnp.sum(sc)
        try:
            bench(jax.jit(kern), sds, f"DP kernel kd={kd} uf={uf}")
        except Exception as ex:
            print(f"DP kernel kd={kd} uf={uf}: FAILED "
                  f"{str(ex).splitlines()[0][:100]}", flush=True)

    # (d) full pipeline (best kernel config via env PKD/PUF)
    UF = int(os.environ.get("PUF", "2"))

    @jax.jit
    def full(args, acc):
        qc, tc = args
        sd = swaffine.skewed_similarity_from_codes(qc, tc, table,
                                                   sim_dtype=sim_dtype)
        sc = swaffine.sw_affine_scores_from_skewed(sd, gap, q=Q, t=T, kd=KD,
                                                   uf=UF)
        return acc + jnp.sum(sc)
    bench(full, list(zip(qcs, tcs)), "full pipeline")

    # (e) full pipeline, ITERS chained inside ONE dispatch via lax.scan
    # (distinct inputs per step; amortizes the fixed dispatch cost)
    qstack = jnp.stack(qcs)
    tstack = jnp.stack(tcs)

    @jax.jit
    def full_scan(args, acc):
        qs, ts = args

        def step(a, qt):
            qc, tc = qt
            sd = swaffine.skewed_similarity_from_codes(
                qc, tc, table, sim_dtype=sim_dtype)
            sc = swaffine.sw_affine_scores_from_skewed(sd, gap, q=Q, t=T,
                                                       kd=KD, uf=UF)
            return a + jnp.sum(sc), 0

        a, _ = jax.lax.scan(step, acc, (qs, ts))
        return a

    acc = jnp.float32(0.0)
    np.asarray(full_scan((qstack, tstack), acc))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        assert np.isfinite(float(np.asarray(
            full_scan((qstack, tstack), jnp.float32(0.0)))))
        best = min(best, time.perf_counter() - t0)
    per = best / ITERS
    print(f"{'full pipeline (scan-fused)':28s} {per*1e3:8.3f} ms/iter "
          f"({B*Q*T/per/1e9:7.2f} GCUPS-equiv)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
