#!/usr/bin/env python3
"""Profile the transpose-free qd-layout screen pipeline on the real TPU."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

B = int(os.environ.get("PB", "512"))
Q = T = int(os.environ.get("PQ", "512"))
DT = os.environ.get("PDT", "int8")
ITERS = 16

def main():
    import jax, jax.numpy as jnp
    from alignment_algos_tpu.ops import swaffine
    sim_dtype = dict(float32=jnp.float32, bfloat16=jnp.bfloat16,
                     int8=jnp.int8)[DT]
    rng = np.random.default_rng(0)
    qcs = [jnp.asarray(rng.integers(0, 20, (Q,)), jnp.int32)
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
        print(f"{label:32s} {per*1e3:8.3f} ms/iter "
              f"({B*Q*T/per/1e9:7.2f} GCUPS-equiv)", flush=True)

    @jax.jit
    def simonly(args, acc):
        qc, tc = args
        sd = swaffine.skewed_qd_similarity_screen(qc, tc, table,
                                                  sim_dtype=sim_dtype)
        return acc + jnp.float32(jnp.sum(sd[:, Q // 2, :].astype(jnp.float32)))
    bench(simonly, list(zip(qcs, tcs)), "qd sim+skew")

    sds = [jax.block_until_ready(swaffine.skewed_qd_similarity_screen(
        qcs[i], tcs[i], table, sim_dtype=sim_dtype)) for i in range(ITERS)]
    for kd, uf in [(4, 2), (8, 2), (8, 4), (4, 4)]:
        def kern(sd, acc, kd=kd, uf=uf):
            sc = swaffine.sw_affine_scores_from_skewed_qd(
                sd, gap, q=Q, t=T, kd=kd, uf=uf)
            return acc + jnp.sum(sc)
        try:
            bench(jax.jit(kern), sds, f"qd kernel kd={kd} uf={uf}")
        except Exception as ex:
            print(f"qd kernel kd={kd} uf={uf}: FAILED "
                  f"{str(ex).splitlines()[0][:90]}", flush=True)

    KD = int(os.environ.get("PKD", "8"))
    UF = int(os.environ.get("PUF", "4"))
    @jax.jit
    def full(args, acc):
        qc, tc = args
        sd = swaffine.skewed_qd_similarity_screen(qc, tc, table,
                                                  sim_dtype=sim_dtype)
        sc = swaffine.sw_affine_scores_from_skewed_qd(sd, gap, q=Q, t=T,
                                                      kd=KD, uf=UF)
        return acc + jnp.sum(sc)
    bench(full, list(zip(qcs, tcs)), f"qd full pipeline kd={KD} uf={UF}")
    return 0

if __name__ == "__main__":
    sys.exit(main())
