#!/usr/bin/env python3
"""Probe: explicit-f32-transpose sim recipe + (Q,D,B)-layout kernel retry."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

B = Q = T = 512
ITERS = 12

def main():
    import jax, jax.numpy as jnp
    from alignment_algos_tpu.ops import swaffine
    rng = np.random.default_rng(0)
    qcs = [jnp.asarray(rng.integers(0, 20, (B, Q)), jnp.int32) for _ in range(ITERS)]
    tcs = [jnp.asarray(rng.integers(0, 20, (B, T)), jnp.int32) for _ in range(ITERS)]
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
        print(f"{label:44s} {per*1e3:8.3f} ms/iter ({B*Q*T/per/1e9:6.2f} GCUPS)",
              flush=True)

    a = 20
    def simW(qc, tc):
        qoh = jax.nn.one_hot(qc, a, dtype=jnp.float32)
        toh = jax.nn.one_hot(tc, a, dtype=jnp.float32)
        qt = jnp.einsum("bqa,ac->bqc", qoh, table, preferred_element_type=jnp.float32)
        s = jnp.einsum("bqc,btc->bqt", qt, toh, preferred_element_type=jnp.float32)
        s = jnp.transpose(s, (1, 2, 0))          # f32: fuses into dot layout
        s = s.astype(jnp.int8)                   # (Q,T,B) int8
        w = Q + T
        padded = jnp.pad(s, ((0, 0), (0, Q), (0, 0)))
        flat = padded.reshape(Q * w, B)[: Q * (w - 1)]
        return flat.reshape(Q, w - 1, B)         # (Q, D, B) int8

    @jax.jit
    def simW_qdb(args, acc):
        qc, tc = args
        sd = simW(qc, tc)
        return acc + jnp.float32(jnp.sum(sd[Q // 2].astype(jnp.float32)))
    bench(simW_qdb, list(zip(qcs, tcs)), "simW: f32-T, cast, skew -> (Q,D,B)")

    @jax.jit
    def simW_dqb(args, acc):
        qc, tc = args
        sd = jnp.transpose(simW(qc, tc), (1, 0, 2))   # (D, Q, B) int8
        return acc + jnp.float32(jnp.sum(sd[Q // 2].astype(jnp.float32)))
    bench(simW_dqb, list(zip(qcs, tcs)), "simW + major-swap -> (D,Qp,B)")

    # full pipeline via simW + existing kernel
    @jax.jit
    def fullW(args, acc):
        qc, tc = args
        sd = jnp.transpose(simW(qc, tc), (1, 0, 2))
        sc = swaffine.sw_affine_scores_from_skewed(sd, gap, q=Q, t=T, kd=8, uf=4)
        return acc + jnp.sum(sc)
    bench(fullW, list(zip(qcs, tcs)), "FULL: simW + (D,Qp,B) kernel")

    # qd-layout kernel retry at kd=8 with real error
    sds = [jax.block_until_ready(jax.jit(simW)(qcs[i], tcs[i]))
           for i in range(ITERS)]
    for kd in (8, 16):
        def kern(sd, acc, kd=kd):
            sc = swaffine.sw_affine_scores_from_skewed_qd(sd, gap, q=Q, t=T,
                                                          kd=kd, uf=4)
            return acc + jnp.sum(sc)
        try:
            bench(jax.jit(kern), sds, f"qd kernel kd={kd} uf=4")
        except Exception as ex:
            msg = str(ex)
            key = [l for l in msg.splitlines() if "vmem" in l.lower() or
                   "Mosaic" in l or "NotImplemented" in l or "error:" in l][:2]
            print(f"qd kernel kd={kd}: FAILED {' | '.join(key)[:200]}", flush=True)

    @jax.jit
    def fullQD(args, acc):
        qc, tc = args
        sd = simW(qc, tc)
        sc = swaffine.sw_affine_scores_from_skewed_qd(sd, gap, q=Q, t=T,
                                                      kd=8, uf=4)
        return acc + jnp.sum(sc)
    try:
        bench(fullQD, list(zip(qcs, tcs)), "FULL: simW + (Q,D,B) kernel kd=8")
    except Exception as ex:
        print("fullQD FAILED", str(ex).splitlines()[0][:120], flush=True)
    return 0

if __name__ == "__main__":
    sys.exit(main())
