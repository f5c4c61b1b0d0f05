"""Round-4 prototype: row-scan prefix-max batched affine SW (Pallas TPU).

Formulation (replaces the anti-diagonal wavefront + skew producer):
process query rows sequentially; within a row the whole (T, B) slab is
data-parallel except the E (template-axis gap) recurrence, which unrolls to
a decayed prefix-max:

    E[i,j] = max_{k<=j-1} (H[i,k] - gi - ge*(j-1-k))
           = cummax_j(u)[j-1] - ge*(j-1),   u[k] = H[i,k] + ge*k - gi

and by the classic gi >= ge lemma H may be replaced by
Htilde = max(0, diag + s, F) inside u (E never feeds itself through H
because E - gi <= E - ge).  Exact in float32 for integer substitution and
gap tables (all values are integers << 2^24), so bit-identical to the
Gotoh/wavefront engines under the same integrality gate as int8 streaming.

The producer becomes ONE matmul emitting (Q, T, B) — no skew, no
transpose, no strip boundaries.  Kernel grid is (Q/ku,), each step
consuming (1, ku, T, B) int8 similarity rows with T on sublanes and the
batch on lanes.

cummax strategies (measured by tools/r4_probe.py):
  "dbl" — Hillis-Steele masked doubling, log2(T) x (roll+add+max)
  "nat" — jnp/lax cummax (whatever Mosaic lowers it to), if it compiles
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -3.0e38


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


import os as _os
CHUNK = int(_os.environ.get("AAT_RS_CHUNK", "16"))
KU = int(_os.environ.get("AAT_RS_KU", "8"))


def _rowscan_kernel(gap_ref, s_ref, out_ref, hprev, f, m, cons,
                    csml, *, q: int, t: int, ku: int, nsteps: int,
                    strategy: str):
    # cons layout (leading index): 0 = u bias (ge*j - gi), 1 = E un-bias
    # (ge*(j-1)), 2 = E j==0 fill (NEG at 0), 3 = diag j==0 fill (0 at 0,
    # else 1), 4+k = doubling penalty for shift 2^k — full-range for "dbl"
    # (NEG where j < 2^k), chunk-local for "lvl" (NEG where j%CHUNK < 2^k).
    # csml: (nsmall, nc, 1) penalties for the chunk-carry scan + its
    # exclusive shift fill at leading index nsmall.
    i = pl.program_id(0)
    gi = gap_ref[0, 0]
    ge = gap_ref[0, 1]
    nc = t // CHUNK
    nlocal = int(np.log2(CHUNK))
    nsmall = max(int(np.ceil(np.log2(nc))), 0)

    @pl.when(i == 0)
    def _():
        hprev[:] = jnp.zeros_like(hprev)
        f[:] = jnp.full_like(f, NEG)
        m[:] = jnp.zeros_like(m)
        jji = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)
        jj = jji.astype(jnp.float32)
        cons[0] = ge * jj - gi
        cons[1] = ge * (jj - 1.0)
        # fused E adjust: NEG fill at j==0 plus the -ge*(j-1) un-bias
        cons[2] = jnp.where(jji == 0, jnp.float32(NEG),
                            jnp.float32(0.0)) - (ge * (jj - 1.0))
        cons[3] = jnp.where(jji == 0, jnp.float32(0.0), jnp.float32(1.0))
        s = 1
        kmax = nlocal if strategy == "lvl" else nsteps
        jmod = jji % CHUNK if strategy == "lvl" else jji
        for k in range(kmax):
            cons[4 + k] = jnp.where(jmod >= s, jnp.float32(0.0),
                                    jnp.float32(NEG))
            s *= 2
        if strategy == "lvl":
            kki = jax.lax.broadcasted_iota(jnp.int32, (nc, 1), 0)
            s = 1
            for k in range(nsmall):
                csml[k] = jnp.where(kki >= s, jnp.float32(0.0),
                                    jnp.float32(NEG))
                s *= 2
            csml[nsmall] = jnp.where(kki == 0, jnp.float32(NEG),
                                     jnp.float32(0.0))

    gvec_u = cons[0]
    e_adj = cons[2]
    d_fill = cons[3]

    for r in range(ku):
        s = s_ref[0, r].astype(jnp.float32)                  # (T, B)
        f[:] = jnp.maximum(f[:] - ge, hprev[:] - gi)
        diag = pltpu.roll(hprev[:], 1, axis=0) * d_fill      # H[i-1, j-1]
        ht = jnp.maximum(jnp.maximum(diag + s, jnp.float32(0.0)), f[:])
        if strategy == "lvl":
            # two-level cummax: chunk-local doubling in parallel across
            # all chunks, then an exclusive carry scan over the CHUNK-max
            # reduction on an nc-row slab, element-repeated back
            u = ht + gvec_u
            cm = u
            sh = 1
            for k in range(nlocal):
                cm = jnp.maximum(cm, pltpu.roll(cm, sh, axis=0)
                                 + cons[4 + k])
                sh *= 2
            bmax = jnp.max(u.reshape(nc, CHUNK, u.shape[-1]), axis=1)
            sh = 1
            for k in range(nsmall):
                bmax = jnp.maximum(bmax, pltpu.roll(bmax, sh, axis=0)
                                   + csml[k])
                sh *= 2
            carry = pltpu.roll(bmax, 1, axis=0) + csml[nsmall]
            carry_b = jnp.broadcast_to(
                carry[:, None, :], (nc, CHUNK, carry.shape[-1])
            ).reshape(t, carry.shape[-1])
            g = jnp.maximum(cm, carry_b)
        elif strategy == "noe":
            g = None
        else:
            g = ht + gvec_u
            sh = 1
            for k in range(nsteps):
                g = jnp.maximum(g, pltpu.roll(g, sh, axis=0) + cons[4 + k])
                sh *= 2
        if g is None:
            hp_new = ht
        else:
            e = pltpu.roll(g, 1, axis=0) + e_adj
            hp_new = jnp.maximum(ht, e)
        hprev[:] = hp_new
        m[:] = jnp.maximum(m[:], hp_new)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[0] = jnp.max(m[:], axis=0)


@functools.partial(jax.jit, static_argnames=("q", "t", "ku", "strategy"))
def sw_rowscan_scores(sim: jax.Array, gap: jax.Array, *, q: int, t: int,
                      ku: int = KU, strategy: str = "dbl") -> jax.Array:
    """sim: (Qp, Tp, Bp) int8/f32 similarity, zero-padded (safe for local
    SW: a zero-similarity pad cell can only replicate, never exceed, an
    existing real H value).  gap: (1, 2) [gi, ge] with gi >= ge.
    Returns (Bp,) local SW scores."""
    qp, tp, bp = sim.shape
    assert qp % ku == 0
    nsteps = int(np.ceil(np.log2(tp)))
    kernel = functools.partial(_rowscan_kernel, q=q, t=tp, ku=ku,
                               nsteps=nsteps, strategy=strategy)
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
                pltpu.VMEM((tp, bp), jnp.float32),        # H previous row
                pltpu.VMEM((tp, bp), jnp.float32),        # F
                pltpu.VMEM((tp, bp), jnp.float32),        # running max
                pltpu.VMEM((nsteps + 4, tp, 1), jnp.float32),  # constants
                pltpu.VMEM((nsteps + 1, max(tp // CHUNK, 8), 1),
                           jnp.float32),                  # carry-scan consts
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=40 * qp * tp * bp,
            bytes_accessed=qp * tp * bp * sim.dtype.itemsize,
            transcendentals=0),
    )(gap, sim.reshape(qp // ku, ku, tp, bp))
    return out[0]


@functools.partial(jax.jit, static_argnames=("ku", "sim_dtype"))
def rowscan_similarity_screen(q_codes: jax.Array, t_codes: jax.Array,
                              table: jax.Array, ku: int = KU,
                              sim_dtype=jnp.int8) -> jax.Array:
    """ONE query (Q,) against B templates (B, T) -> (Qp, Tp, Bp) similarity
    in plain row-major layout: a single MXU matmul, no skew, no transpose."""
    (q,) = q_codes.shape
    b, t = t_codes.shape
    a = table.shape[0]
    qp = _round_up(q, ku)
    tp = _round_up(t, 8)
    bp = _round_up(b, 128)
    if sim_dtype == jnp.int8:
        qoh = jax.nn.one_hot(q_codes, a, dtype=jnp.int8)         # (Q, A)
        qt = jnp.dot(qoh, table.astype(jnp.int8),
                     preferred_element_type=jnp.int32).astype(jnp.int8)
        toh = jax.nn.one_hot(t_codes.T, a, dtype=jnp.int8, axis=0)
        sim = jnp.dot(qt, toh.reshape(a, t * b),
                      preferred_element_type=jnp.int32)          # (Q, T*B)
        sim = sim.reshape(q, t, b).astype(jnp.int8)
    else:
        qoh = jax.nn.one_hot(q_codes, a, dtype=jnp.float32)      # (Q, A)
        qt = jnp.dot(qoh, table.astype(jnp.float32),
                     preferred_element_type=jnp.float32)         # (Q, A)
        toh = jax.nn.one_hot(t_codes.T, a, dtype=jnp.float32, axis=0)
        sim = jnp.dot(qt, toh.reshape(a, t * b),
                      preferred_element_type=jnp.float32)        # (Q, T*B)
        sim = sim.reshape(q, t, b).astype(sim_dtype)
    return jnp.pad(sim, ((0, qp - q), (0, tp - t), (0, bp - b)))


def sw_rowscan_screen(q_codes, t_codes, table, gi: float, ge: float,
                      ku: int = KU, sim_dtype=jnp.int8, strategy: str = "dbl"):
    q_codes = jnp.asarray(q_codes)
    t_codes = jnp.asarray(t_codes)
    (q,) = q_codes.shape
    b, t = t_codes.shape
    sim = rowscan_similarity_screen(q_codes, t_codes, jnp.asarray(table),
                                    ku=ku, sim_dtype=sim_dtype)
    gap = jnp.array([[gi, ge]], dtype=jnp.float32)
    return sw_rowscan_scores(sim, gap, q=q, t=t, ku=ku,
                             strategy=strategy)[:b]
