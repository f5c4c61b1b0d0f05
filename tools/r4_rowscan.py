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


def _rowscan_kernel(gap_ref, s_ref, out_ref, hprev, f, m, cmbuf, cons, *, q: int,
                    t: int, ku: int, nsteps: int, strategy: str):
    # cons layout (leading index): 0 = u bias (ge*j - gi), 1 = E un-bias
    # (ge*(j-1)), 2 = E j==0 fill (NEG at 0), 3 = diag j==0 fill (0 at 0,
    # else 1), 4+k = doubling penalty for shift 2^k (NEG where j < 2^k)
    i = pl.program_id(0)
    gi = gap_ref[0, 0]
    ge = gap_ref[0, 1]

    @pl.when(i == 0)
    def _():
        hprev[:] = jnp.zeros_like(hprev)
        f[:] = jnp.full_like(f, NEG)
        m[:] = jnp.zeros_like(m)
        jji = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)
        jj = jji.astype(jnp.float32)
        cons[0] = ge * jj - gi
        cons[1] = ge * (jj - 1.0)
        cons[2] = jnp.where(jji == 0, jnp.float32(NEG), jnp.float32(0.0))
        cons[3] = jnp.where(jji == 0, jnp.float32(0.0), jnp.float32(1.0))
        s = 1
        for k in range(nsteps):
            cons[4 + k] = jnp.where(jji >= s, jnp.float32(0.0),
                                    jnp.float32(NEG))
            s *= 2

    gvec_u = cons[0]
    gvec_e = cons[1]
    e_fill = cons[2]
    d_fill = cons[3]

    for r in range(ku):
        s = s_ref[0, r].astype(jnp.float32)                  # (T, B)
        f[:] = jnp.maximum(f[:] - ge, hprev[:] - gi)
        diag = pltpu.roll(hprev[:], 1, axis=0) * d_fill      # H[i-1, j-1]
        ht = jnp.maximum(jnp.maximum(diag + s, jnp.float32(0.0)), f[:])
        if strategy == "nat":
            cmbuf[:] = jax.lax.cummax(ht + gvec_u, axis=0)
        else:
            cmbuf[:] = ht + gvec_u
            sh = 1
            for k in range(nsteps):
                cmbuf[:] = jnp.maximum(cmbuf[:],
                                       pltpu.roll(cmbuf[:], sh, axis=0)
                                       + cons[4 + k])
                sh *= 2
        e = (pltpu.roll(cmbuf[:], 1, axis=0) + e_fill) - gvec_e
        hp_new = jnp.maximum(ht, e)
        hprev[:] = hp_new
        m[:] = jnp.maximum(m[:], hp_new)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[0] = jnp.max(m[:], axis=0)


@functools.partial(jax.jit, static_argnames=("q", "t", "ku", "strategy"))
def sw_rowscan_scores(sim: jax.Array, gap: jax.Array, *, q: int, t: int,
                      ku: int = 8, strategy: str = "dbl") -> jax.Array:
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
                pltpu.VMEM((tp, bp), jnp.float32),        # cummax workspace
                pltpu.VMEM((nsteps + 4, tp, 1), jnp.float32),  # constants
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
                              table: jax.Array, ku: int = 8,
                              sim_dtype=jnp.int8) -> jax.Array:
    """ONE query (Q,) against B templates (B, T) -> (Qp, Tp, Bp) similarity
    in plain row-major layout: a single MXU matmul, no skew, no transpose."""
    (q,) = q_codes.shape
    b, t = t_codes.shape
    a = table.shape[0]
    qp = _round_up(q, ku)
    tp = _round_up(t, 8)
    bp = _round_up(b, 128)
    qoh = jax.nn.one_hot(q_codes, a, dtype=jnp.float32)          # (Q, A)
    qt = jnp.dot(qoh, table.astype(jnp.float32),
                 preferred_element_type=jnp.float32)             # (Q, A)
    toh = jax.nn.one_hot(t_codes.T, a, dtype=jnp.float32, axis=0)
    sim = jnp.dot(qt, toh.reshape(a, t * b),
                  preferred_element_type=jnp.float32)            # (Q, T*B)
    sim = sim.reshape(q, t, b).astype(sim_dtype)
    return jnp.pad(sim, ((0, qp - q), (0, tp - t), (0, bp - b)))


def sw_rowscan_screen(q_codes, t_codes, table, gi: float, ge: float,
                      ku: int = 8, sim_dtype=jnp.int8, strategy: str = "dbl"):
    q_codes = jnp.asarray(q_codes)
    t_codes = jnp.asarray(t_codes)
    (q,) = q_codes.shape
    b, t = t_codes.shape
    sim = rowscan_similarity_screen(q_codes, t_codes, jnp.asarray(table),
                                    ku=ku, sim_dtype=sim_dtype)
    gap = jnp.array([[gi, ge]], dtype=jnp.float32)
    return sw_rowscan_scores(sim, gap, q=q, t=t, ku=ku,
                             strategy=strategy)[:b]
