#!/usr/bin/env python3
"""Granular sim+skew stage timing + transpose strategy variants."""
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
        print(f"{label:40s} {best/len(inputs)*1e3:8.3f} ms/iter", flush=True)

    def chk(x):
        return jnp.float32(jnp.sum(x[0].astype(jnp.float32)))

    a = 20
    @jax.jit
    def stage_mm(args, acc):
        qc, tc = args
        qoh = jax.nn.one_hot(qc, a, dtype=jnp.float32)
        toh = jax.nn.one_hot(tc, a, dtype=jnp.float32)
        qt = jnp.einsum("bqa,ac->bqc", qoh, table, preferred_element_type=jnp.float32)
        s = jnp.einsum("bqc,btc->bqt", qt, toh, preferred_element_type=jnp.float32)
        return acc + chk(s)
    bench(stage_mm, list(zip(qcs, tcs)), "einsum (B,Q,T) f32 only")

    @jax.jit
    def stage_mm8(args, acc):
        qc, tc = args
        qoh = jax.nn.one_hot(qc, a, dtype=jnp.float32)
        toh = jax.nn.one_hot(tc, a, dtype=jnp.float32)
        qt = jnp.einsum("bqa,ac->bqc", qoh, table, preferred_element_type=jnp.float32)
        s = jnp.einsum("bqc,btc->bqt", qt, toh,
                       preferred_element_type=jnp.float32).astype(jnp.int8)
        return acc + chk(s)
    bench(stage_mm8, list(zip(qcs, tcs)), "einsum + int8 cast (no transpose)")

    @jax.jit
    def stage_skew_bmajor(args, acc):
        qc, tc = args
        s = swaffine.similarity_from_codes(qc, tc, table, sim_dtype=jnp.int8)
        w = Q + T
        padded = jnp.pad(s, ((0, 0), (0, 0), (0, Q)))
        flat = padded.reshape(B, Q * w)[:, : Q * (w - 1)]
        sk = flat.reshape(B, Q, w - 1)
        return acc + chk(sk)
    bench(stage_skew_bmajor, list(zip(qcs, tcs)), "einsum+cast+skew b-major (no T)")

    @jax.jit
    def tr_f32(args, acc):
        qc, tc = args
        s = swaffine.similarity_from_codes(qc, tc, table)  # f32 (B,Q,T)
        sT = jnp.transpose(s, (1, 2, 0))                   # f32 relayout
        return acc + chk(sT)
    bench(tr_f32, list(zip(qcs, tcs)), "einsum + f32 transpose (1,2,0)")

    @jax.jit
    def tr_i32pack(args, acc):
        qc, tc = args
        s = swaffine.similarity_from_codes(qc, tc, table, sim_dtype=jnp.int8)
        w = Q + T
        padded = jnp.pad(s, ((0, 0), (0, 0), (0, Q)))
        flat = padded.reshape(B, Q * w)[:, : Q * (w - 1)]
        sk = flat.reshape(B, Q, w - 1)                     # (B,Q,D) int8
        skp = jnp.pad(sk, ((0, 0), (0, 0), (0, 1)))        # D+1 = 1024 % 4
        pk = jax.lax.bitcast_convert_type(
            skp.reshape(B, Q, 256, 4), jnp.int32)          # (B,Q,256)
        pt = jnp.transpose(pk, (2, 1, 0))                  # int32 relayout
        return acc + chk(pt)
    bench(tr_i32pack, list(zip(qcs, tcs)), "skew b-major + int32-packed transpose")
    return 0

if __name__ == "__main__":
    sys.exit(main())
