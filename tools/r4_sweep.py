"""Round-4 producer decomposition + MXU-transpose experiment (real TPU).

Stages of the strip producer (swstrip.strip_skewed_similarity_screen):
  A. one-hot matmul -> (Q, T*B) f32 -> int8 (Q, T, B)
  B. pad-flatten per-strip skew -> (NS, sp, DSp, B) row-major-skewed
  C. transpose (0,2,1,3) -> (NS, DSp, sp, B) diag-major  [suspected hog]
  C'. MXU alternative: einsum('nsdb,si->ndib') with an identity — a
      transpose executed as a matmul contraction.

Each stage is measured with the scan-differencing harness (distinct inputs
per step, threaded accumulator, one pull; two scan lengths differenced).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/r4_sweep.py
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

Q = T = 512
B = 512
SP, KD = 64, 16
ITERS, NS_SHORT = 24, 6


def _round_up(x, m):
    return (x + m - 1) // m * m


NS = -(-Q // SP)
DS = SP + T - 1
DSP = _round_up(DS, KD)

rng = np.random.default_rng(0)
qcs = jnp.asarray(rng.integers(0, 20, (ITERS, Q)), dtype=jnp.int32)
lib = jnp.asarray(rng.integers(0, 20, (B, T)), dtype=jnp.int32)
table = jnp.asarray(rng.integers(-8, 12, (20, 20)).astype(np.float32))


def stage_a(qc):
    qoh = jax.nn.one_hot(qc, 20, dtype=jnp.float32)
    qt = jnp.dot(qoh, table, preferred_element_type=jnp.float32)
    toh = jax.nn.one_hot(lib.T, 20, dtype=jnp.float32, axis=0)
    sim = jnp.dot(qt, toh.reshape(20, T * B),
                  preferred_element_type=jnp.float32)
    return sim.reshape(Q, T, B).astype(jnp.int8)


def stage_b(sim):
    sim = sim.reshape(NS, SP, T, B)
    w = DSP + 1
    padded = jnp.pad(sim, ((0, 0), (0, 0), (0, w - T), (0, 0)))
    flat = padded.reshape(NS, SP * w, B)[:, : SP * (w - 1)]
    return flat.reshape(NS, SP, DSP, B)


def stage_c(sk):
    return jnp.transpose(sk, (0, 2, 1, 3))


EYE8 = jnp.eye(SP, dtype=jnp.int8)


def stage_c_mxu(sk):
    # transpose as an MXU contraction: out[n,d,i,b] = sum_s sk[n,s,d,b]*I[s,i]
    out = jnp.einsum("nsdb,si->ndib", sk, EYE8,
                     preferred_element_type=jnp.int32)
    return out.astype(jnp.int8)


def measure(name, make_chain, reducer=lambda x: jnp.sum(x.astype(jnp.int32)
                                                        % 127)):
    @jax.jit
    def run(qrows, acc):
        def body(a, qc):
            out = make_chain(qc + (a % 3).astype(qc.dtype))
            return a + reducer(out), None
        acc, _ = jax.lax.scan(body, acc, qrows)
        return acc

    def timed(qr, acc):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            acc = run(qr, acc)
            v = float(np.asarray(acc))
            best = min(best, time.perf_counter() - t0)
            assert np.isfinite(v)
        return best, acc

    acc = jnp.int32(0)
    t0 = time.perf_counter()
    acc = run(qcs, acc)
    np.asarray(acc)
    print(f"  [{name}] compile {time.perf_counter()-t0:.1f}s", flush=True)
    tl, acc = timed(qcs, acc)
    ts, acc = timed(qcs[:NS_SHORT], acc)
    per = max((tl - ts) / (ITERS - NS_SHORT), 1e-9)
    print(f"{name}: {per*1e3:.3f} ms/step", flush=True)
    return per


print("device:", jax.devices()[0], flush=True)
pa = measure("A matmul->int8 (Q,T,B)", stage_a)
pb = measure("A+B +pad-flatten skew", lambda qc: stage_b(stage_a(qc)))
pc = measure("A+B+C +XLA transpose (current)",
             lambda qc: stage_c(stage_b(stage_a(qc))))
pm = measure("A+B+C' +MXU eye-transpose",
             lambda qc: stage_c_mxu(stage_b(stage_a(qc))))
print(f"split: A={pa*1e3:.2f} B={(pb-pa)*1e3:.2f} C={(pc-pb)*1e3:.2f} "
      f"C'={(pm-pb)*1e3:.2f} ms", flush=True)
