#!/usr/bin/env python3
"""Cost-model probe: per-diagonal cost vs slab shape, and sim+skew variants."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

ITERS = 12

def main():
    import jax, jax.numpy as jnp
    from alignment_algos_tpu.ops import swaffine

    def bench(fn, inputs, label, cells):
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
        print(f"{label:36s} {per*1e3:8.3f} ms/iter ({cells/per/1e9:7.2f} GCUPS)",
              flush=True)

    rng = np.random.default_rng(0)
    gap = jnp.array([[11.0, 1.0]], dtype=jnp.float32)

    # --- kernel-only across shapes at constant cells = B*Q*T = 134M -------
    for (b, q, t) in [(512, 512, 512), (512, 256, 1024), (512, 128, 2048),
                      (1024, 256, 512), (2048, 128, 512), (1024, 512, 256)]:
        cells = b * q * t
        sds = []
        for _ in range(ITERS):
            qc = jnp.asarray(rng.integers(0, 20, (b, q)), jnp.int32)
            tc = jnp.asarray(rng.integers(0, 20, (b, t)), jnp.int32)
            table = jnp.asarray(rng.integers(-4, 12, (20, 20)).astype(np.float32))
            sds.append(jax.block_until_ready(
                swaffine.skewed_similarity_from_codes(qc, tc, table,
                                                      sim_dtype=jnp.int8)))
        def kern(sd, acc, q=q, t=t):
            sc = swaffine.sw_affine_scores_from_skewed(sd, gap, q=q, t=t,
                                                       kd=8, uf=4)
            return acc + jnp.sum(sc)
        try:
            bench(jax.jit(kern), sds, f"kernel b={b} q={q} t={t}", cells)
        except Exception as ex:
            print(f"kernel b={b} q={q} t={t}: FAILED "
                  f"{str(ex).splitlines()[0][:80]}", flush=True)
        del sds

    # --- sim+skew variants at b=512 q=t=512 --------------------------------
    b = q = t = 512
    qcs = [jnp.asarray(rng.integers(0, 20, (b, q)), jnp.int32) for _ in range(ITERS)]
    tcs = [jnp.asarray(rng.integers(0, 20, (b, t)), jnp.int32) for _ in range(ITERS)]
    table = jnp.asarray(rng.integers(-4, 12, (20, 20)).astype(np.float32))
    cells = b * q * t

    @jax.jit
    def sim_current(args, acc):
        qc, tc = args
        sd = swaffine.skewed_similarity_from_codes(qc, tc, table,
                                                   sim_dtype=jnp.int8)
        return acc + jnp.float32(jnp.sum(sd[q // 2].astype(jnp.float32)))
    bench(sim_current, list(zip(qcs, tcs)), "sim: qtb-einsum (current)", cells)

    @jax.jit
    def sim_early(args, acc):
        qc, tc = args
        a = 20
        qoh = jax.nn.one_hot(qc, a, dtype=jnp.float32)
        toh = jax.nn.one_hot(tc, a, dtype=jnp.float32)
        qt = jnp.einsum("bqa,ac->bqc", qoh, table, preferred_element_type=jnp.float32)
        s = jnp.einsum("bqc,btc->bqt", qt, toh,
                       preferred_element_type=jnp.float32).astype(jnp.int8)
        s = jnp.transpose(s, (1, 2, 0))      # int8 relayout (Q,T,B)
        w = q + t
        padded = jnp.pad(s, ((0, 0), (0, q), (0, 0)))
        flat = padded.reshape(q * w, b)[: q * (w - 1)]
        sd = flat.reshape(q, w - 1, b)
        sd = jnp.transpose(sd, (1, 0, 2))
        return acc + jnp.float32(jnp.sum(sd[q // 2].astype(jnp.float32)))
    bench(sim_early, list(zip(qcs, tcs)), "sim: bqt-einsum cast-early", cells)

    @jax.jit
    def sim_early2(args, acc):
        qc, tc = args
        a = 20
        qoh = jax.nn.one_hot(qc, a, dtype=jnp.float32)
        toh = jax.nn.one_hot(tc, a, dtype=jnp.float32)
        qt = jnp.einsum("bqa,ac->bqc", qoh, table, preferred_element_type=jnp.float32)
        s = jnp.einsum("bqc,btc->bqt", qt, toh,
                       preferred_element_type=jnp.float32).astype(jnp.int8)
        # skew in (B,Q,T) int8, then one transpose to (D,Qp,B)
        w = q + t
        padded = jnp.pad(s, ((0, 0), (0, 0), (0, q)))
        flat = padded.reshape(b, q * w)[:, : q * (w - 1)]
        sk = flat.reshape(b, q, w - 1)
        sd = jnp.transpose(sk, (2, 1, 0))
        return acc + jnp.float32(jnp.sum(sd[q // 2].astype(jnp.float32)))
    bench(sim_early2, list(zip(qcs, tcs)), "sim: skew-in-bqt, 1 transpose", cells)

    # --- one-dispatch amortization: unrolled chain of 12 full iterations ---
    @jax.jit
    def full_unrolled(args, acc):
        qs, ts = args
        for i in range(ITERS):
            sd = swaffine.skewed_similarity_from_codes(qs[i], ts[i], table,
                                                       sim_dtype=jnp.int8)
            sc = swaffine.sw_affine_scores_from_skewed(sd, gap, q=q, t=t,
                                                       kd=8, uf=4)
            acc = acc + jnp.sum(sc)
        return acc
    qstack = jnp.stack(qcs); tstack = jnp.stack(tcs)
    np.asarray(full_unrolled((qstack, tstack), jnp.float32(0.0)))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        assert np.isfinite(float(np.asarray(full_unrolled((qstack, tstack),
                                                          jnp.float32(0.0)))))
        best = min(best, time.perf_counter() - t0)
    per = best / ITERS
    print(f"{'full unrolled-12 one dispatch':36s} {per*1e3:8.3f} ms/iter "
          f"({cells/per/1e9:7.2f} GCUPS)", flush=True)
    return 0

if __name__ == "__main__":
    sys.exit(main())
