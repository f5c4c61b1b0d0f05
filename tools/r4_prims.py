"""Probe Mosaic relayout primitives on the real chip: which compile, and
what they cost.  Each probe is a trivial kernel over a stacked input run
inside one lax.scan dispatch; two scan lengths are differenced.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/r4_prims.py
"""
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SP, KD, B = 64, 16, 512
W = SP + KD


def run_probe(name, kernel, in_shape, out_shape, dtype=jnp.int8, reps=64):
    """kernel(v) -> out value; measure per-invocation time."""
    def pk(x_ref, o_ref):
        o_ref[...] = kernel(x_ref[...])

    call = pl.pallas_call(
        pk,
        out_shape=jax.ShapeDtypeStruct(out_shape, dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
    )

    rng = np.random.default_rng(0)
    stack = jnp.asarray(rng.integers(-8, 8, (reps,) + in_shape), dtype=dtype)

    @jax.jit
    def run(st, acc):
        def body(a, x):
            o = call(x + a.astype(dtype))
            return a + jnp.sum(o.astype(jnp.int32)) % 7, None
        acc, _ = jax.lax.scan(body, acc, st)
        return acc

    try:
        acc = jnp.int32(0)
        acc = run(stack, acc)
        np.asarray(acc)
    except Exception as e:
        msg = " ".join(str(e).split())[:180]
        print(f"{name}: FAILED {msg}", flush=True)
        return

    def timed(st, acc0):
        best = float("inf")
        acc = acc0
        for _ in range(3):
            t0 = time.perf_counter()
            acc = run(st, acc)
            float(np.asarray(acc))
            best = min(best, time.perf_counter() - t0)
        return best

    tl = timed(stack, acc)
    ts = timed(stack[: reps // 4], acc)
    per = max((tl - ts) / (reps - reps // 4), 1e-9)
    elems = int(np.prod(in_shape))
    print(f"{name}: {per*1e6:.1f} us/op  ({elems/per/1e9:.1f} Gelem/s)",
          flush=True)


def check_semantics():
    """Verify strided-roll semantics in interpret mode on a tiny case."""
    x = jnp.arange(4 * 8 * 1, dtype=jnp.int32).reshape(4, 8, 1)

    def k(x_ref, o_ref):
        o_ref[...] = pltpu.roll(x_ref[...], 0, 1, stride=1, stride_axis=0)

    with pltpu.force_tpu_interpret_mode():
        out = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((4, 8, 1), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)
    out = np.asarray(out)[:, :, 0]
    xs = np.asarray(x)[:, :, 0]
    # hypothesis: slice i along stride_axis rolled by shift + stride*i
    hyp = np.stack([np.roll(xs[i], i) for i in range(4)])
    print("strided-roll semantics (axis=1, stride_axis=0):",
          "roll-by-i" if np.array_equal(out, hyp) else f"OTHER:\n{out}",
          flush=True)


print("device:", jax.devices()[0], flush=True)
check_semantics()

# 1. leading<->sublane transpose of an (SP, KD, B) block
run_probe("transpose(sp,kd,B)->(kd,sp,B) int8",
          lambda v: jnp.transpose(v, (1, 0, 2)),
          (SP, KD, B), (KD, SP, B))

# 1b. same in f32
run_probe("transpose(sp,kd,B)->(kd,sp,B) f32",
          lambda v: jnp.transpose(v, (1, 0, 2)),
          (SP, KD, B), (KD, SP, B), dtype=jnp.float32)

# 2. sublane-axis roll with stride over leading axis: (SP, W, B)
run_probe("roll(axis=1(subl), stride over lead) int8",
          lambda v: pltpu.roll(v, 0, 1, stride=1, stride_axis=0),
          (SP, W, B), (SP, W, B))

# 3. leading-axis roll with stride over sublanes: (W, SP, B)
run_probe("roll(axis=0(lead), stride over subl) int8",
          lambda v: pltpu.roll(v, 0, 0, stride=1, stride_axis=1),
          (W, SP, B), (W, SP, B))

# 4. baseline: plain sublane roll on (SP, W, B)
run_probe("plain roll(axis=1) int8",
          lambda v: pltpu.roll(v, 3, 1),
          (SP, W, B), (SP, W, B))

# 5. baseline: elementwise add on same shape
run_probe("elementwise add int8",
          lambda v: v + jnp.int8(1),
          (SP, W, B), (SP, W, B))
