"""Row-scan prefix-max batched affine-gap SW (Pallas TPU kernel, round 4).

This replaces the anti-diagonal wavefront + skew producer (ops/swstrip)
as the production screen engine: the similarity tensor is consumed in its
natural matmul output layout (Q, T, B) — no diagonal skew, no transpose,
no strip boundary machinery — so the end-to-end rate equals the kernel
rate.  The producer is ONE int8 MXU contraction.

Formulation: query rows are processed sequentially; within a row the
whole (T, B) slab is data-parallel except the E (template-axis gap)
recurrence, which unrolls to a decayed prefix-max:

    E[i,j] = max_{k<=j-1} (H[i,k] - gi - ge*(j-1-k))
           = cummax_j(u)[j-1] - ge*(j-1),   u[k] = H[i,k] + ge*k - gi

By the classic gi >= ge lemma, H may be replaced inside u by
Htilde = max(0, diag + s, F): E never feeds itself back through H because
E - gi <= E - ge.  The cummax is two-level: chunk-local masked doubling
(log2(CHUNK) steps, parallel across all chunks of the slab) plus an
exclusive carry scan over the chunk-max reduction on a (T/CHUNK, B) slab,
element-broadcast back.  Mosaic notes: pltpu.repeat TILES (not np.repeat)
— the broadcast_to+reshape idiom is the element-repeat; value reshapes
follow numpy C-order; jax.lax.cummax has no Mosaic lowering.

Exactness gate: bit-identical to the Gotoh engines (swaffine/swstrip)
when the substitution table and gap costs are integers (every H/E/F value
is then an exact f32 integer, |.| << 2^24, and max() is order-free) and
gi >= ge.  `supported()` checks both; non-integral tables route to the
wavefront engines.

Replaces the reference's per-pair host loop (aa_ali.cpp via
dpmatrix.h:447-486) for batched local-alignment screens.  Measured on the
v5e (honest single-dispatch differenced methodology, tools/r4_probe.py):
~1.9 ms per 512x512xB=512 batch end-to-end vs 2.7 ms for the round-3
strip pipeline; the E-block ablation (strategy dropping E entirely runs
1.2 ms) bounds what any log-depth scan formulation can reach on this
chip — see docs/SCALING.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -3.0e38

CHUNK = 8           # two-level cummax chunk (round-5 sweep optimum on
                    # v5e with the cm-final-element chunk-max extraction:
                    # 8 -> 99.2, 16 -> 85.6, 32 -> 87.8 GCUPS kernel-only;
                    # fewer full-slab doubling steps beat a longer carry
                    # scan on the 1/8-size chunk-max slab)
KU = 8              # query rows per grid step
VMEM_BUDGET = 28 * 2**20
VMEM_LIMIT = 32 * 2**20


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _rowscan_kernel(gap_ref, s_ref, out_ref, hprev, f, m, cons, csml, *,
                    t: int, ku: int, strategy: str):
    # cons rows: 0 = u bias (ge*j - gi), 1 = (dbl spare), 2 = fused E
    # adjust (NEG at j==0, minus ge*(j-1)), 3 = diag j==0 zero fill,
    # 4+k = doubling penalty for shift 2^k (chunk-local for "lvl",
    # full-range for "dbl").  csml rows: carry-scan penalties + exclusive
    # shift fill last.
    i = pl.program_id(0)
    gi = gap_ref[0, 0]
    ge = gap_ref[0, 1]
    nc = t // CHUNK
    nlocal = int(np.log2(CHUNK))
    nsmall = max(int(np.ceil(np.log2(nc))), 0) if nc > 1 else 0
    nsteps = int(np.ceil(np.log2(t)))

    @pl.when(i == 0)
    def _():
        hprev[:] = jnp.zeros_like(hprev)
        f[:] = jnp.full_like(f, NEG)
        m[:] = jnp.zeros_like(m)
        jji = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)
        jj = jji.astype(jnp.float32)
        cons[0] = ge * jj - gi
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
            ncp = max(nc, 8)
            kki = jax.lax.broadcasted_iota(jnp.int32, (ncp, 1), 0)
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
            u = ht + gvec_u
            cm = u
            sh = 1
            for k in range(nlocal):
                cm = jnp.maximum(cm, pltpu.roll(cm, sh, axis=0)
                                 + cons[4 + k])
                sh *= 2
            # chunk max = the chunk-final element of the inclusive local
            # cummax — a strided extract instead of a fresh (nc, CHUNK, B)
            # reduction of u (round 5: -5% kernel wall, bit-identical)
            bmax = cm.reshape(nc, CHUNK, cm.shape[-1])[:, CHUNK - 1]
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
        else:
            g = ht + gvec_u
            sh = 1
            for k in range(nsteps):
                g = jnp.maximum(g, pltpu.roll(g, sh, axis=0) + cons[4 + k])
                sh *= 2
        e = pltpu.roll(g, 1, axis=0) + e_adj
        hp_new = jnp.maximum(ht, e)
        hprev[:] = hp_new
        m[:] = jnp.maximum(m[:], hp_new)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[0] = jnp.max(m[:], axis=0)


@functools.partial(jax.jit, static_argnames=("q", "t", "ku", "strategy"))
def sw_rowscan_scores(sim: jax.Array, gap: jax.Array, *, q: int, t: int,
                      ku: int = KU, strategy: str = "lvl") -> jax.Array:
    """sim: (Qp, Tp, Bp) int8/f32 similarity from the producers below,
    zero-padded (safe for local SW: a zero-similarity pad cell can only
    replicate, never exceed, an existing real H value).  gap: (1, 2)
    [gi, ge] with gi >= ge.  Returns (Bp,) local SW scores."""
    qp, tp, bp = sim.shape
    assert qp % ku == 0 and tp % CHUNK == 0
    nsteps = int(np.ceil(np.log2(tp)))
    nc = tp // CHUNK
    kernel = functools.partial(_rowscan_kernel, t=tp, ku=ku,
                               strategy=strategy)
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
                pltpu.VMEM((nsteps + 1, max(nc, 8), 1),
                           jnp.float32),                  # carry-scan consts
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=35 * qp * tp * bp,
            bytes_accessed=qp * tp * bp * sim.dtype.itemsize,
            transcendentals=0),
    )(gap, sim.reshape(qp // ku, ku, tp, bp))
    return out[0]


def _pad3(sim, qp, tp, bp, q, t, b):
    return jnp.pad(sim, ((0, qp - q), (0, tp - t), (0, bp - b)))


def library_onehot(t_codes: jax.Array, a: int,
                   sim_dtype=jnp.int8) -> jax.Array:
    """(B, T) codes -> (A, T*B) one-hot.  Loop-invariant when scanning
    many queries against one resident library — hoist it out of the scan
    and pass it as ``toh`` below (XLA does not LICM it out of lax.scan)."""
    return jax.nn.one_hot(t_codes.T, a,
                          dtype=sim_dtype, axis=0).reshape(a, -1)


@functools.partial(jax.jit, static_argnames=("ku", "sim_dtype"))
def _rowscan_sim_screen(q_codes, t_codes, table, toh, *, ku, sim_dtype):
    (q,) = q_codes.shape
    b, t = t_codes.shape
    a = table.shape[0]
    qp = _round_up(q, ku)
    tp = _round_up(t, CHUNK)
    bp = _round_up(b, 128)
    if sim_dtype == jnp.int8:
        qoh = jax.nn.one_hot(q_codes, a, dtype=jnp.int8)         # (Q, A)
        qt = jnp.dot(qoh, table.astype(jnp.int8),
                     preferred_element_type=jnp.int32).astype(jnp.int8)
        sim = jnp.dot(qt, toh,
                      preferred_element_type=jnp.int32)          # (Q, T*B)
        sim = sim.reshape(q, t, b).astype(jnp.int8)
    else:
        qoh = jax.nn.one_hot(q_codes, a, dtype=jnp.float32)      # (Q, A)
        qt = jnp.dot(qoh, table.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
        sim = jnp.dot(qt, toh.astype(jnp.float32),
                      preferred_element_type=jnp.float32)
        sim = sim.reshape(q, t, b).astype(sim_dtype)
    return _pad3(sim, qp, tp, bp, q, t, b)


def rowscan_similarity_screen(q_codes: jax.Array, t_codes: jax.Array,
                              table: jax.Array, ku: int = KU,
                              sim_dtype=jnp.int8,
                              toh: jax.Array | None = None) -> jax.Array:
    """ONE query (Q,) against B templates (B, T) -> (Qp, Tp, Bp)
    similarity in plain row-major layout.  For integer tables the whole
    producer is one int8 MXU contraction with the int8 conversion fused
    into the epilogue — no f32 (Q, T*B) intermediate round-trips HBM.
    Pass a prebuilt ``toh`` (library_onehot) when scanning many queries
    against one resident library."""
    a = table.shape[0]
    if toh is None:
        toh = library_onehot(t_codes, a, sim_dtype=sim_dtype)
    return _rowscan_sim_screen(q_codes, t_codes, table, toh, ku=ku,
                               sim_dtype=sim_dtype)


@functools.partial(jax.jit, static_argnames=("ku", "sim_dtype"))
def rowscan_similarity_from_codes(q_codes: jax.Array, t_codes: jax.Array,
                                  table: jax.Array, ku: int = KU,
                                  sim_dtype=jnp.int8) -> jax.Array:
    """Distinct pairs: (B, Q) x (B, T) int codes -> (Qp, Tp, Bp)
    similarity [i, j, b] = table[q_codes[b, i], t_codes[b, j]]."""
    b, q = q_codes.shape
    t = t_codes.shape[1]
    a = table.shape[0]
    qp = _round_up(q, ku)
    tp = _round_up(t, CHUNK)
    bp = _round_up(b, 128)
    if sim_dtype == jnp.int8:
        qoh = jax.nn.one_hot(q_codes, a, dtype=jnp.int8)     # (B, Q, A)
        toh = jax.nn.one_hot(t_codes, a, dtype=jnp.int8)     # (B, T, A)
        qt = jnp.einsum("bqa,ac->bqc", qoh, table.astype(jnp.int8),
                        preferred_element_type=jnp.int32).astype(jnp.int8)
        sim = jnp.einsum("bqc,btc->qtb", qt, toh,
                         preferred_element_type=jnp.int32).astype(jnp.int8)
    else:
        qoh = jax.nn.one_hot(q_codes, a, dtype=jnp.float32)
        toh = jax.nn.one_hot(t_codes, a, dtype=jnp.float32)
        qt = jnp.einsum("bqa,ac->bqc", qoh, table.astype(jnp.float32),
                        preferred_element_type=jnp.float32)
        sim = jnp.einsum("bqc,btc->qtb", qt, toh,
                         preferred_element_type=jnp.float32
                         ).astype(sim_dtype)
    return _pad3(sim, qp, tp, bp, q, t, b)


def supported(table, gi: float, ge: float, q: int, t: int,
              b: int) -> bool:
    """Exactness + capacity gate: integer costs (f32-exact DP), gi >= ge
    (prefix-max lemma), score magnitudes < 2^24, and VMEM fit."""
    tbl = np.asarray(table)
    if not (np.all(tbl == np.round(tbl)) and float(gi) == round(gi)
            and float(ge) == round(ge) and gi >= ge):
        return False
    if (max(q, t) + 2) * (np.abs(tbl).max() + max(gi, ge)) >= 2 ** 24:
        return False
    tp = _round_up(t, CHUNK)
    bp = _round_up(b, 128)
    vmem = 3 * tp * bp * 4 + 2 * KU * tp * bp + (tp + 64) * 128 * 4
    return vmem <= VMEM_BUDGET


def sw_rowscan_screen(q_codes, t_codes, table, gi: float, ge: float,
                      ku: int = KU, sim_dtype=jnp.int8,
                      strategy: str = "lvl"):
    """One query against a template library: codes -> one-matmul producer
    -> row-scan kernel -> (B,) scores."""
    q_codes = jnp.asarray(q_codes)
    t_codes = jnp.asarray(t_codes)
    (q,) = q_codes.shape
    b, t = t_codes.shape
    sim = rowscan_similarity_screen(q_codes, t_codes, jnp.asarray(table),
                                    ku=ku, sim_dtype=sim_dtype)
    gap = jnp.array([[gi, ge]], dtype=jnp.float32)
    return sw_rowscan_scores(sim, gap, q=q, t=t, ku=ku,
                             strategy=strategy)[:b]


def sw_rowscan_batch(q_codes, t_codes, table, gi: float, ge: float,
                     ku: int = KU, sim_dtype=jnp.int8,
                     strategy: str = "lvl"):
    """Distinct-pairs batched local SW through the row-scan kernel."""
    q_codes = jnp.asarray(q_codes)
    t_codes = jnp.asarray(t_codes)
    b, q = q_codes.shape
    t = t_codes.shape[1]
    sim = rowscan_similarity_from_codes(q_codes, t_codes,
                                        jnp.asarray(table), ku=ku,
                                        sim_dtype=sim_dtype)
    gap = jnp.array([[gi, ge]], dtype=jnp.float32)
    return sw_rowscan_scores(sim, gap, q=q, t=t, ku=ku,
                             strategy=strategy)[:b]
