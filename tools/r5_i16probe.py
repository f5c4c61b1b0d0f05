#!/usr/bin/env python3
"""Round-5 probe: int16-state row-scan SW kernel vs the f32 production
kernel (verdict item 3: can 2x-density int16 slab arithmetic raise the
v5e ceiling?).

Integer-gated screens bound every H/F/E/u value by (T+2)*(max|s|+gap) —
< 2^13 at library shapes — so the whole DP state fits int16 with
NEG = -16384 (one penalty-add below a real value stays > -32768, and
every add applies to a real >= -2^13 value before a max restores range).
If Mosaic executes int16 adds/maxes/rolls at 2 elements per 32-bit lane,
the kernel's slab count halves.

Usage: python tools/r5_i16probe.py  (on the TPU host)
"""

from __future__ import annotations

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from alignment_algos_tpu.ops import swscan  # noqa: E402

NEG16 = -16384
CHUNK = swscan.CHUNK


def _i16_kernel(gap_ref, s_ref, out_ref, hprev, f, m, cons, csml, *,
                t: int, ku: int):
    i = pl.program_id(0)
    gi = gap_ref[0, 0]
    ge = gap_ref[0, 1]
    nc = t // CHUNK
    nlocal = int(np.log2(CHUNK))
    nsmall = max(int(np.ceil(np.log2(nc))), 0) if nc > 1 else 0
    i16 = jnp.int16

    @pl.when(i == 0)
    def _():
        hprev[:] = jnp.zeros_like(hprev)
        f[:] = jnp.full_like(f, i16(NEG16))
        m[:] = jnp.zeros_like(m)
        jji = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)
        jj = jji.astype(i16)
        cons[0] = ge.astype(i16) * jj - gi.astype(i16)
        cons[2] = jnp.where(jji == 0, i16(NEG16), i16(0)) \
            - ge.astype(i16) * (jj - i16(1))
        cons[3] = jnp.where(jji == 0, i16(0), i16(1))
        s = 1
        jmod = jji % CHUNK
        for k in range(nlocal):
            cons[4 + k] = jnp.where(jmod >= s, i16(0), i16(NEG16))
            s *= 2
        ncp = max(nc, 16)
        kki = jax.lax.broadcasted_iota(jnp.int32, (ncp, 1), 0)
        s = 1
        for k in range(nsmall):
            csml[k] = jnp.where(kki >= s, i16(0), i16(NEG16))
            s *= 2
        csml[nsmall] = jnp.where(kki == 0, i16(NEG16), i16(0))

    gvec_u = cons[0]
    e_adj = cons[2]
    d_fill = cons[3]

    for r in range(ku):
        s = s_ref[0, r].astype(jnp.int16)                    # (T, B)
        f[:] = jnp.maximum(f[:] - ge.astype(jnp.int16),
                           hprev[:] - gi.astype(jnp.int16))
        diag = pltpu.roll(hprev[:], 1, axis=0) * d_fill
        ht = jnp.maximum(jnp.maximum(diag + s, jnp.int16(0)), f[:])
        u = ht + gvec_u
        cm = u
        sh = 1
        for k in range(nlocal):
            cm = jnp.maximum(cm, pltpu.roll(cm, sh, axis=0) + cons[4 + k])
            sh *= 2
        # Mosaic has no int16 reductions: chunk-max via an elementwise
        # binary tree over the reshaped chunk axis
        ur = u.reshape(nc, CHUNK, u.shape[-1])
        w = CHUNK
        while w > 1:
            ur = jnp.maximum(ur[:, :w // 2], ur[:, w // 2:w])
            w //= 2
        bmax = ur[:, 0]
        sh = 1
        for k in range(nsmall):
            bmax = jnp.maximum(bmax, pltpu.roll(bmax, sh, axis=0)
                               + csml[k, 0:nc])
            sh *= 2
        carry = pltpu.roll(bmax, 1, axis=0) + csml[nsmall, 0:nc]
        carry_b = jnp.broadcast_to(
            carry[:, None, :], (nc, CHUNK, carry.shape[-1])
        ).reshape(t, carry.shape[-1])
        g = jnp.maximum(cm, carry_b)
        e = pltpu.roll(g, 1, axis=0) + e_adj
        hp_new = jnp.maximum(ht, e)
        hprev[:] = hp_new
        m[:] = jnp.maximum(m[:], hp_new)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[0] = jnp.max(m[:].astype(jnp.int32),
                             axis=0).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("q", "t", "ku"))
def sw_rowscan_scores_i16(sim, gap_i32, *, q: int, t: int, ku: int = 8):
    qp, tp, bp = sim.shape
    nsteps = int(np.ceil(np.log2(tp)))
    nc = tp // CHUNK
    kernel = functools.partial(_i16_kernel, t=tp, ku=ku)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, bp), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(qp // ku,),
            in_specs=[
                pl.BlockSpec((1, 2), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, ku, tp, bp), lambda i: (i, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, bp), lambda i: (0, 0)),
            scratch_shapes=[
                pltpu.VMEM((tp, bp), jnp.int16),          # H previous row
                pltpu.VMEM((tp, bp), jnp.int16),          # F
                pltpu.VMEM((tp, bp), jnp.int16),          # running max
                pltpu.VMEM((nsteps + 4, tp, 1), jnp.int16),
                pltpu.VMEM((nsteps + 1, max(nc, 16), 1), jnp.int16),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=swscan.VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=35 * qp * tp * bp,
            bytes_accessed=qp * tp * bp,
            transcendentals=0),
    )(gap_i32, sim.reshape(qp // ku, ku, tp, bp))
    return out[0]


def main():
    B, Q, T = 512, 512, 512
    GI, GE = 11, 1
    ITERS, NS = 24, 4
    rng = np.random.default_rng(0)
    import sys as _s
    from alignment_algos_tpu.scoring.submatrix import BlosumMatrix
    bl = BlosumMatrix(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "data", "BLOSUM62"))
    table = jnp.asarray(bl.matrix[:20, :20])
    qcs = jnp.asarray(rng.integers(0, 20, (ITERS, Q)), jnp.int32)
    lib = jnp.asarray(rng.integers(0, 20, (B, T)), jnp.int32)
    gap_f = jnp.array([[float(GI), float(GE)]], jnp.float32)
    gap_i = jnp.array([[GI, GE]], jnp.int32)

    # correctness: bit parity vs the f32 kernel on one batch
    sim = swscan.rowscan_similarity_screen(qcs[0], lib, table,
                                           sim_dtype=jnp.int8)
    ref = np.asarray(swscan.sw_rowscan_scores(sim, gap_f, q=Q, t=T))
    got = np.asarray(sw_rowscan_scores_i16(sim, gap_i, q=Q, t=T))
    ok = np.array_equal(ref, got)
    print("i16 parity vs f32 kernel:", ok, flush=True)
    if not ok:
        bad = np.where(ref != got)[0][:5]
        for b in bad:
            print("  lane", b, "ref", ref[b], "got", got[b])
        return 1

    # timing: kernel-only, resident similarity stack, differenced scans
    def stack(n):
        return jnp.stack([swscan.rowscan_similarity_screen(
            qcs[i % ITERS], lib, table, sim_dtype=jnp.int8)
            for i in range(n)])
    sds = stack(ITERS)
    sds.block_until_ready()

    def make_run(fn, gap):
        @jax.jit
        def run(sd_stack, acc):
            def body(a, sd):
                sc = fn(sd, gap, q=Q, t=T)
                return a + jnp.sum(sc), None
            acc, _ = jax.lax.scan(body, acc, sd_stack)
            return acc
        return run

    for name, fn, gap in (("f32", swscan.sw_rowscan_scores, gap_f),
                          ("i16", sw_rowscan_scores_i16, gap_i)):
        run = make_run(fn, gap)
        acc = jnp.float32(0.0)
        acc = run(sds, acc); np.asarray(acc)
        acc = run(sds[:NS], acc); np.asarray(acc)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            acc = run(sds, acc); np.asarray(acc)
            dl = time.perf_counter() - t0
            t0 = time.perf_counter()
            acc = run(sds[:NS], acc); np.asarray(acc)
            ds = time.perf_counter() - t0
            best = min(best, max((dl - ds) / (ITERS - NS), 1e-9))
        gcups = B * Q * T / best / 1e9
        print(f"{name}: {best*1e3:.3f} ms/batch = {gcups:.1f} GCUPS "
              f"kernel-only", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
