#!/usr/bin/env python3
"""Decompose the wavefront kernel's per-diagonal cost on the real TPU.

Round-1 finding: ~2.3 us/diagonal even with a minimal body -> ~14 GCUPS
ceiling at B=128, Q=T=512.  This tool times kernel VARIANTS that each
remove one ingredient, so the round-2 redesign attacks the real bottleneck:

  pipe       grid pipeline + similarity DMA only (body touches the block)
  state      + 5 scratch arrays round-tripped per diagonal (trivial update)
  rolls      + the 3 sublane rolls per diagonal (no masks)
  full       the shipping kernel body
  unroll4    full body, 4 diagonals per scratch round-trip
  wide       full body at B in {256, 512} (kd shrunk to fit VMEM)

Methodology per CLAUDE.md (axon tunnel dedups identical dispatches):
distinct inputs per iteration, device-side accumulator, one host pull.
"""

from __future__ import annotations

import argparse
import functools
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from alignment_algos_tpu.ops import swaffine

NEG = -3.0e38


def _variant_kernel(mode: str, q: int, t: int, qp: int, kd: int):
    def kernel(gap_ref, sd_ref, out_ref, hm1, hm2, e, f, m):
        blk = pl.program_id(0)
        nblk = pl.num_programs(0)
        gi = gap_ref[0, 0]
        ge = gap_ref[0, 1]

        @pl.when(blk == 0)
        def _():
            hm1[:] = jnp.zeros_like(hm1)
            hm2[:] = jnp.zeros_like(hm2)
            e[:] = jnp.full_like(e, NEG)
            f[:] = jnp.full_like(f, NEG)
            m[:] = jnp.zeros_like(m)

        ii = jax.lax.broadcasted_iota(jnp.int32, (qp, 1), 0)

        def shift_down(x):
            y = pltpu.roll(x, 1, axis=0)
            return jnp.where(ii == 0, jnp.float32(0.0), y)

        if mode == "pipe":
            # touch the streamed block so the DMA isn't elided; no DP work
            m[:] = m[:] + sd_ref[0].astype(jnp.float32)
            return

        if mode == "state":
            def body(k, _):
                s = sd_ref[2 * k].astype(jnp.float32)
                h1 = hm1[:]
                hA = jnp.maximum(hm2[:] + s, e[:])
                eA = e[:] + s
                fA = f[:] + s
                sB = sd_ref[2 * k + 1].astype(jnp.float32)
                hB = jnp.maximum(h1 + sB, eA)
                m[:] = jnp.maximum(m[:], hB)
                hm2[:] = hA
                hm1[:] = hB
                e[:] = eA
                f[:] = fA
                return 0
            jax.lax.fori_loop(0, kd // 2, body, 0, unroll=True)
        elif mode == "rolls":
            def body(k, _):
                s = sd_ref[2 * k].astype(jnp.float32)
                h1 = hm1[:]
                hA = jnp.maximum(shift_down(hm2[:]) + s,
                                 jnp.maximum(e[:], pltpu.roll(f[:], 1, 0)))
                eA = jnp.maximum(e[:] - ge, h1 - gi)
                fA = jnp.maximum(pltpu.roll(f[:], 1, 0) - ge,
                                 pltpu.roll(h1, 1, 0) - gi)
                sB = sd_ref[2 * k + 1].astype(jnp.float32)
                hB = jnp.maximum(shift_down(h1) + sB,
                                 jnp.maximum(eA, pltpu.roll(fA, 1, 0)))
                m[:] = jnp.maximum(m[:], jnp.maximum(hA, hB))
                hm2[:] = hA
                hm1[:] = hB
                e[:] = eA
                f[:] = fA
                return 0
            jax.lax.fori_loop(0, kd // 2, body, 0, unroll=True)
        elif mode in ("full", "unroll4"):
            def one_diag(d, s, h1, h2, eo, fo):
                jj = d - ii
                valid = (ii < q) & (jj >= 0) & (jj < t)
                e_new = jnp.maximum(eo - ge, h1 - gi)
                f_new = jnp.maximum(pltpu.roll(fo, 1, axis=0) - ge,
                                    pltpu.roll(h1, 1, axis=0) - gi)
                f_new = jnp.where(ii == 0, NEG, f_new)
                h_new = jnp.maximum(
                    jnp.maximum(shift_down(h2) + s, jnp.float32(0.0)),
                    jnp.maximum(e_new, f_new))
                h_new = jnp.where(valid, h_new, jnp.float32(0.0))
                return h_new, e_new, f_new

            per = 4 if mode == "unroll4" else 2

            def body(k, _):
                d0 = blk * kd + per * k
                h_prev2, h_prev1 = hm2[:], hm1[:]
                eo, fo = e[:], f[:]
                mx = m[:]
                for u in range(per):
                    s = sd_ref[per * k + u].astype(jnp.float32)
                    h_new, eo, fo = one_diag(d0 + u, s, h_prev1, h_prev2,
                                             eo, fo)
                    mx = jnp.maximum(mx, h_new)
                    h_prev2, h_prev1 = h_prev1, h_new
                m[:] = mx
                hm2[:] = h_prev2
                hm1[:] = h_prev1
                e[:] = eo
                f[:] = fo
                return 0
            jax.lax.fori_loop(0, kd // per, body, 0, unroll=True)
        else:
            raise ValueError(mode)

        @pl.when(blk == nblk - 1)
        def _():
            out_ref[0] = jnp.max(m[:], axis=0)
    return kernel


@functools.partial(jax.jit, static_argnames=("mode", "q", "t", "kd"))
def run_variant(sd, gap, *, mode: str, q: int, t: int, kd: int):
    nd, qp, b = sd.shape
    nblk = -(-nd // kd)
    if nblk * kd != nd:
        sd = jnp.pad(sd, ((0, nblk * kd - nd), (0, 0), (0, 0)))
    kernel = _variant_kernel(mode, q, t, qp, kd)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, b), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(nblk,),
            in_specs=[
                pl.BlockSpec((1, 2), lambda d: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((kd, qp, b), lambda d: (d, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, b), lambda d: (0, 0)),
            scratch_shapes=[pltpu.VMEM((qp, b), jnp.float32)
                            for _ in range(5)],
        ),
    )(gap, sd)
    return out[0]


def time_variant(fn, inputs, iters: int, passes: int = 2) -> float:
    """fn(x, acc) -> acc; returns best wall-clock seconds over passes."""
    acc = jnp.zeros((), jnp.float32)
    np.asarray(fn(inputs[0], acc))  # compile
    best = float("inf")
    for _ in range(passes):
        acc = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for x in inputs[:iters]:
            acc = fn(x, acc)
        total = float(np.asarray(acc))
        best = min(best, time.perf_counter() - t0)
        assert np.isfinite(total)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--q", type=int, default=512)
    ap.add_argument("--t", type=int, default=512)
    args = ap.parse_args()
    q, t = args.q, args.t
    print(f"device: {jax.devices()[0]}")

    rng = np.random.default_rng(0)

    def make_sd(b):
        """Distinct skewed-similarity inputs, materialized on device."""
        outs = []
        for _ in range(args.iters):
            qc = jnp.asarray(rng.integers(0, 20, (b, q)), dtype=jnp.int32)
            tc = jnp.asarray(rng.integers(0, 20, (b, t)), dtype=jnp.int32)
            tbl = jnp.asarray(rng.integers(-4, 11, (20, 20)).astype(np.float32))
            s = swaffine.similarity_from_codes(qc, tc, tbl,
                                               sim_dtype=jnp.bfloat16)
            outs.append(swaffine.skew_similarity(s))
        np.asarray(outs[-1][0, 0, 0])  # force
        return outs

    gap = jnp.array([[11.0, 1.0]], dtype=jnp.float32)
    nd = q + t - 1

    configs = [
        ("pipe", 128, 16), ("state", 128, 16), ("rolls", 128, 16),
        ("full", 128, 16), ("unroll4", 128, 16),
        ("full", 128, 32), ("full", 128, 64),
        ("full", 256, 16), ("full", 512, 8),
    ]
    sd_cache = {}
    for mode, b, kd in configs:
        if b not in sd_cache:
            sd_cache[b] = make_sd(b)
        sds = sd_cache[b]

        def fn(x, acc, mode=mode, kd=kd):
            return acc + jnp.sum(run_variant(x, gap, mode=mode, q=q, t=t,
                                             kd=kd))
        try:
            dt = time_variant(fn, sds, args.iters)
        except Exception as ex:  # noqa: BLE001
            print(f"{mode:8s} B={b:4d} kd={kd:3d}  FAILED: "
                  f"{str(ex).splitlines()[0][:100]}")
            continue
        cells = b * q * t * args.iters
        us_per_diag = dt / (args.iters * nd) * 1e6
        print(f"{mode:8s} B={b:4d} kd={kd:3d}  {dt*1e3/args.iters:8.2f} ms/it"
              f"  {us_per_diag:6.2f} us/diag  {cells/dt/1e9:7.2f} GCUPS")


if __name__ == "__main__":
    main()
