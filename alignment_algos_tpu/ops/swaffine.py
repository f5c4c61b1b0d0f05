"""Batched affine-gap Smith-Waterman on TPU (Pallas wavefront kernel).

This is the throughput engine for library screens and the BASELINE benchmark
(batched pairwise SW, config 2): B sequence pairs aligned simultaneously
with the classic Gotoh 3-state recurrence.  For affine gap costs
(gi + ge*(len-1), aasubalib.h:27-77) the Gotoh optimum equals the
reference's general-gap local DP optimum, so scores cross-validate against
ops/dp_ref.

Design:
 * similarity matrices are produced on the MXU as one-hot matmuls
   (codes -> onehot(q) @ table @ onehot(t)^T), then skewed so that
   anti-diagonal d is a contiguous (Q, B) slab;
 * the kernel runs one grid step per anti-diagonal; Pallas's grid pipeline
   streams the next diagonal's similarity slab HBM->VMEM while the VPU
   updates the H/E/F wavefronts (batch on the 128-lane axis, query position
   on the sublane axis);
 * state (H at d-1/d-2, E, F, running max M) lives in VMEM scratch across
   grid steps; the per-pair score is the sublane-reduction of M at the last
   step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -3.0e38  # plain float: jnp scalars would be captured consts in pallas


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _sw_kernel(gap_ref, sd_ref, out_ref, hm1, hm2, e, f, m, *, q: int, t: int,
               qp: int, kd: int):
    """One grid step advances ``kd`` anti-diagonals (in-kernel loop over the
    (kd, qp, B) similarity block).  Blocking amortizes the per-grid-step
    pipeline cost — with one diagonal per step the fixed overhead of ~1000
    tiny steps dominated the VPU work 5:1."""
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

    # shift along the query axis: row i reads row i-1 of the previous diag
    def shift_down(x):
        y = pltpu.roll(x, 1, axis=0)
        return jnp.where(ii == 0, jnp.float32(0.0), y)

    def one_diag(d, s, h1, h2, eo, fo):
        """One Gotoh wavefront step in registers.

        e/f are deliberately NOT masked to the valid band: outside it they
        drift, but the drift values are provably < 0 (pre-valid h is 0, so
        e,f <= -gi under the recurrence) and right-edge cells never feed a
        valid cell again, so the masked h — the only state that reaches m —
        is unaffected."""
        jj = d - ii
        valid = (ii < q) & (jj >= 0) & (jj < t)
        e_new = jnp.maximum(eo - ge, h1 - gi)
        f_new = jnp.maximum(pltpu.roll(fo, 1, axis=0) - ge,
                            pltpu.roll(h1, 1, axis=0) - gi)
        f_new = jnp.where(ii == 0, NEG, f_new)  # row 0 wrap guard
        h_new = jnp.maximum(
            jnp.maximum(shift_down(h2) + s, jnp.float32(0.0)),
            jnp.maximum(e_new, f_new))
        h_new = jnp.where(valid, h_new, jnp.float32(0.0))
        return h_new, e_new, f_new

    def body(k, _):
        # two diagonals per iteration: intermediates stay in registers, so
        # scratch traffic per diagonal is halved (the kernel is VMEM-op
        # bound, not FLOP bound)
        d0 = blk * kd + 2 * k
        sA = sd_ref[2 * k].astype(jnp.float32)
        sB = sd_ref[2 * k + 1].astype(jnp.float32)
        h1 = hm1[:]
        hA, eA, fA = one_diag(d0, sA, h1, hm2[:], e[:], f[:])
        hB, eB, fB = one_diag(d0 + 1, sB, hA, h1, eA, fA)
        m[:] = jnp.maximum(m[:], jnp.maximum(hA, hB))
        hm2[:] = hA
        hm1[:] = hB
        e[:] = eB
        f[:] = fB
        return 0

    jax.lax.fori_loop(0, kd // 2, body, 0, unroll=True)

    @pl.when(blk == nblk - 1)
    def _():
        out_ref[0] = jnp.max(m[:], axis=0)


@functools.partial(jax.jit, static_argnames=("q", "t", "kd"))
def sw_affine_scores_from_skewed(sd: jax.Array, gap: jax.Array, *, q: int,
                                 t: int, kd: int = 16) -> jax.Array:
    """sd: (D, Qp, B) skewed similarity (D = q+t-1); gap: (1,2) [gi, ge].
    Returns (B,) local alignment scores.  kd = anti-diagonals per grid step
    (padded diagonals past D are masked out by the validity predicate)."""
    nd, qp, b = sd.shape
    if kd % 2:
        raise ValueError("kd must be even (two diagonals per loop step)")
    nblk = -(-nd // kd)
    if nblk * kd != nd:
        sd = jnp.pad(sd, ((0, nblk * kd - nd), (0, 0), (0, 0)))
    kernel = functools.partial(_sw_kernel, q=q, t=t, qp=qp, kd=kd)
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
            scratch_shapes=[
                pltpu.VMEM((qp, b), jnp.float32),  # H at d-1
                pltpu.VMEM((qp, b), jnp.float32),  # H at d-2
                pltpu.VMEM((qp, b), jnp.float32),  # E
                pltpu.VMEM((qp, b), jnp.float32),  # F
                pltpu.VMEM((qp, b), jnp.float32),  # running max
            ],
        ),
        cost_estimate=pl.CostEstimate(
            flops=12 * q * t * b, bytes_accessed=nd * qp * b * sd.dtype.itemsize,
            transcendentals=0),
    )(gap, sd)
    return out[0]


def skew_similarity(s: jax.Array) -> jax.Array:
    """(B, Q, T) -> (D, Qp, B) where slab d holds S[b, i, d-i].

    Implemented as the pad/reshape diagonal trick (no gathers): pad rows to
    T+Q, flatten, drop, reshape — row i of the result is shifted right by i.
    """
    b, q, t = s.shape
    w = q + t  # padded row width
    d = w - 1  # number of anti-diagonals
    qp = _round_up(q, 8)
    bp = _round_up(b, 128)
    padded = jnp.pad(s, ((0, bp - b), (0, 0), (0, q)))   # (bp, q, w)
    flat = padded.reshape(bp, q * w)[:, : q * (w - 1)]
    skewed = flat.reshape(bp, q, w - 1)  # [b, i, d] = S[b, i, d-i]
    skewed = jnp.pad(skewed, ((0, 0), (0, qp - q), (0, 0)))
    return jnp.transpose(skewed, (2, 1, 0))  # (D, Qp, Bp)


@functools.partial(jax.jit, static_argnames=("sim_dtype",))
def similarity_from_codes(q_codes: jax.Array, t_codes: jax.Array,
                          table: jax.Array, sim_dtype=jnp.float32) -> jax.Array:
    """(B, Q) x (B, T) int codes + (A, A) table -> (B, Q, T) similarity via
    one-hot matmuls on the MXU."""
    a = table.shape[0]
    qoh = jax.nn.one_hot(q_codes, a, dtype=jnp.float32)      # (B, Q, A)
    toh = jax.nn.one_hot(t_codes, a, dtype=jnp.float32)      # (B, T, A)
    qt = jnp.einsum("bqa,ac->bqc", qoh, table.astype(jnp.float32),
                    preferred_element_type=jnp.float32)
    s = jnp.einsum("bqc,btc->bqt", qt, toh,
                   preferred_element_type=jnp.float32)
    return s.astype(sim_dtype)


def sw_affine_batch(q_codes, t_codes, table, gi: float, ge: float,
                    sim_dtype=jnp.float32):
    """End-to-end batched SW: codes -> similarity -> skew -> kernel."""
    b, q = q_codes.shape
    t = t_codes.shape[1]
    s = similarity_from_codes(jnp.asarray(q_codes), jnp.asarray(t_codes),
                              jnp.asarray(table), sim_dtype=sim_dtype)
    sd = skew_similarity(s)
    gap = jnp.array([[gi, ge]], dtype=jnp.float32)
    return sw_affine_scores_from_skewed(sd, gap, q=q, t=t)[:b]


@functools.partial(jax.jit, static_argnames=("q", "t"))
def sw_affine_scores_xla(sd: jax.Array, gap: jax.Array, *, q: int,
                         t: int) -> jax.Array:
    """Pure-XLA twin of the Pallas kernel (lax.scan over skewed diagonals):
    the portable path for CPU meshes / dryruns and the fallback engine.
    sd: (D, Qp, B) skewed similarity; gap: (1, 2) [gi, ge] -> (B,) scores."""
    nd, qp, b = sd.shape
    gi = gap[0, 0]
    ge = gap[0, 1]
    ii = jax.lax.broadcasted_iota(jnp.int32, (qp, 1), 0)

    def shift_down(x):
        y = jnp.roll(x, 1, axis=0)
        return jnp.where(ii == 0, jnp.float32(0.0), y)

    def step(carry, inp):
        hm1, hm2, e, f, m = carry
        d, s = inp
        s = s.astype(jnp.float32)
        jj = d - ii
        valid = (ii < q) & (jj >= 0) & (jj < t)
        e_new = jnp.maximum(e - ge, hm1 - gi)
        f_new = jnp.maximum(
            jnp.where(ii == 0, NEG, shift_down(f) - ge),
            jnp.where(ii == 0, NEG, shift_down(hm1) - gi))
        h_new = jnp.maximum(jnp.maximum(shift_down(hm2) + s, 0.0),
                            jnp.maximum(e_new, f_new))
        h_new = jnp.where(valid, h_new, 0.0)
        e_new = jnp.where(valid, e_new, NEG)
        f_new = jnp.where(valid, f_new, NEG)
        m = jnp.maximum(m, h_new)
        return (h_new, hm1, e_new, f_new, m), None

    z = jnp.zeros((qp, b), jnp.float32)
    neg = jnp.full((qp, b), NEG, jnp.float32)
    (h, _, _, _, m), _ = jax.lax.scan(
        step, (z, z, neg, neg, z), (jnp.arange(nd), sd))
    return jnp.max(m, axis=0)


def sw_affine_batch_xla(q_codes, t_codes, table, gi: float, ge: float):
    """End-to-end batched SW via the XLA engine (portable)."""
    b, q = q_codes.shape
    t = t_codes.shape[1]
    s = similarity_from_codes(jnp.asarray(q_codes), jnp.asarray(t_codes),
                              jnp.asarray(table))
    sd = skew_similarity(s)
    gap = jnp.array([[gi, ge]], dtype=jnp.float32)
    return sw_affine_scores_xla(sd, gap, q=q, t=t)[:b]


def sw_affine_reference(s: np.ndarray, gi: float, ge: float) -> np.ndarray:
    """Numpy Gotoh SW oracle for testing: s (B, Q, T) -> (B,) scores."""
    b, q, t = s.shape
    out = np.zeros(b, dtype=np.float32)
    for bi in range(b):
        h = np.zeros((q + 1, t + 1), np.float32)
        e = np.full((q + 1, t + 1), -np.inf, np.float32)
        f = np.full((q + 1, t + 1), -np.inf, np.float32)
        best = 0.0
        for i in range(1, q + 1):
            for j in range(1, t + 1):
                e[i, j] = max(e[i, j - 1] - ge, h[i, j - 1] - gi)
                f[i, j] = max(f[i - 1, j] - ge, h[i - 1, j] - gi)
                h[i, j] = max(0.0, h[i - 1, j - 1] + s[bi, i - 1, j - 1],
                              e[i, j], f[i, j])
                best = max(best, h[i, j])
        out[bi] = best
    return out
