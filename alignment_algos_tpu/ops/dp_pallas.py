"""Exact general-gap DP as a Pallas TPU kernel.

This is the fast path for the reference scoring models (HMAPaliEval /
Hmap2Eval / Gn2Eval / AASubstitutionEval): the same O(Q*T*(Q+T)) recurrence
as `ops/dp_ref` / `ops/dp_engine` (dpmatrix.h:356-536), driven by the same
host-precomputed `DPCosts` tables, producing bit-identical H matrices.

Why a table-driven kernel and not a position-specific Gotoh recurrence:
byte parity pins the *float op order* of every candidate to the reference's
``(H[k] - cost) + sim`` with ``cost = gi + ge*(dist-2)`` evaluated directly
(hmap_eval.h:63-117).  An incremental affine recurrence (E = max(E - ge,
H - gi)) accumulates the gap cost through repeated subtraction — a different
float rounding sequence — so it cannot be bit-equal for real-valued costs.
The endpoint-min gap values (min over the flanking template residues) and
gn2's distance-gated deletion table (gn2_eval.h:99-130) are not affine at
all.  Precomputing D[k, j] on host (exact reference arithmetic) and taking
masked maxima on device preserves candidate values exactly; max is
order-insensitive, so scores match bit-for-bit.

Kernel layout (one pair per grid step, everything VMEM-resident):
  * S (q2,t2), D (t2,t2), CpadR (2*q2,t2) stream in per pair; H (q2,t2) is
    the output block.
  * The row loop runs inside the kernel (fori_loop): per row one (t2,t2)
    deletion slab over the previous row and one (q2,t2) insertion slab over
    the column history, both pure VPU work.
  * The previous row is needed in column orientation for the deletion
    broadcast; the relayout is done on the MXU as an identity matmul
    (eye @ row^T), which is far cheaper than a vector transpose on TPU.
  * The insertion slab needs H[k][j-1]; a lane-shifted copy of H is
    maintained incrementally (one row shift per step) instead of re-rolling
    the whole matrix.

Capacity: VMEM holds all tables for q2,t2 up to ~768; larger pairs fall
back to ops/dp_engine (the XLA scan).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scoring.base import DPCosts
from .dp_ref import NULL, DPResult

NEG = -3.0e38

# per-pair VMEM: S + D + CpadR + H + Hsh + eye (+ slack for the (t2,t2)
# candidate slab); keep under the 16 MB budget
MAX_VMEM_SIDE = 768


def _kernel(s_ref, d_ref, cpr_ref, ins0_ref, insc_ref, dcl_ref, h_ref,
            hsh, eye, *, q0: int, q1: int, t0: int, t1: int, q2: int,
            t2: int, local: bool):
    f32 = jnp.float32

    def clamp(x):
        return jnp.maximum(f32(0.0), x) if local else x

    ii_col = jax.lax.broadcasted_iota(jnp.int32, (q2, 1), 0)
    jj_row = jax.lax.broadcasted_iota(jnp.int32, (1, t2), 1)

    @pl.when(pl.program_id(0) == 0)
    def _():
        eye[:] = (jax.lax.broadcasted_iota(jnp.int32, (t2, t2), 0)
                  == jax.lax.broadcasted_iota(jnp.int32, (t2, t2), 1)
                  ).astype(f32)

    # ---- prologue: zero H, boundary row q0+1 and boundary col t0+1 -------
    h_ref[0] = jnp.zeros((q2, t2), f32)

    srow_b = s_ref[0, pl.ds(q0 + 1, 1), :]                    # (1, t2)
    brow_del = clamp((f32(0.0) - d_ref[0, pl.ds(t0, 1), :]) + srow_b)
    # at column t0+1 the boundary value is just clamp(sim) (scalar stores/
    # loads don't lower on Mosaic, so keep everything row-shaped)
    brow = jnp.where(jj_row == t0 + 1, clamp(srow_b), brow_del)
    brow = jnp.where((jj_row >= t0 + 1) & (jj_row <= t1 - 1), brow, f32(0.0))
    h_ref[0, pl.ds(q0 + 1, 1), :] = brow

    bcol = clamp((f32(0.0) - ins0_ref[0]) + s_ref[0, :, pl.ds(t0 + 1, 1)])
    cur = h_ref[0, :, pl.ds(t0 + 1, 1)]
    h_ref[0, :, pl.ds(t0 + 1, 1)] = jnp.where(
        (ii_col >= q0 + 2) & (ii_col <= q1 - 1), bcol, cur)

    # lane-shifted copy: hsh[k, j] = H[k, j-1]
    hsh[:] = jnp.where(jj_row == 0, f32(0.0), pltpu.roll(h_ref[0], 1, axis=1))

    # ---- interior rows ----------------------------------------------------
    kk_col = jax.lax.broadcasted_iota(jnp.int32, (t2, 1), 0)
    del_kmask = (kk_col >= t0 + 1) & (kk_col <= jj_row - 2)      # (t2, t2)
    interior_j = (jj_row >= t0 + 2) & (jj_row <= t1 - 1)

    def row_body(r, _):
        i = q0 + 2 + r
        hprev = h_ref[0, pl.ds(i - 1, 1), :]                      # (1, t2)
        sim = s_ref[0, pl.ds(i, 1), :]                            # (1, t2)

        mrow = pltpu.roll(hprev, 1, axis=1)
        match = clamp(jnp.where(jj_row == 0, f32(0.0), mrow) + sim)

        # deletion slab: hprev in column orientation via MXU identity matmul
        hcol = jax.lax.dot_general(
            eye[:], hprev, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32)                           # (t2, 1)
        dc = clamp((hcol - d_ref[0]) + sim)
        dc = jnp.where(del_kmask, dc, f32(NEG))
        del_max = jnp.max(dc, axis=0, keepdims=True)              # (1, t2)

        # insertion slab over the column history
        cost = cpr_ref[0, pl.ds(q2 - i, q2), :]                   # (q2, t2)
        ic = clamp((hsh[:] - cost) + sim)
        kmask = (ii_col >= q0 + 1) & (ii_col <= i - 2)
        ic = jnp.where(kmask, ic, f32(NEG))
        ins_max = jnp.max(ic, axis=0, keepdims=True)              # (1, t2)

        best = jnp.maximum(match, jnp.maximum(del_max, ins_max))
        cur_row = h_ref[0, pl.ds(i, 1), :]
        row = jnp.where(interior_j, best, cur_row)
        h_ref[0, pl.ds(i, 1), :] = row
        hsh[pl.ds(i, 1), :] = jnp.where(jj_row == 0, f32(0.0),
                                        pltpu.roll(row, 1, axis=1))
        return 0

    jax.lax.fori_loop(0, max(q1 - q0 - 2, 0), row_body, 0)

    # ---- closing cell (q1, t1) --------------------------------------------
    # all vector-shaped: Mosaic cannot load/store scalars from/to VMEM.
    # one-hot max extractions are exact (other entries are NEG), so the
    # float op order of every candidate is unchanged.
    srow_c = s_ref[0, pl.ds(q1, 1), :]                            # (1, t2)
    sim_c = jnp.max(jnp.where(jj_row == t1, srow_c, f32(NEG)),
                    axis=1, keepdims=True)                        # (1, 1)
    hlast = h_ref[0, pl.ds(q1 - 1, 1), :]                         # (1, t2)
    h_diag = jnp.max(jnp.where(jj_row == t1 - 1, hlast, f32(NEG)),
                     axis=1, keepdims=True)                       # (1, 1)
    match = clamp(h_diag + sim_c)

    dcand = clamp((hlast - dcl_ref[0]) + sim_c)                   # (1, t2)
    dmask = (jj_row >= t0 + 1) & (jj_row <= t1 - 1)
    dcand = jnp.where(dmask, dcand, f32(NEG))
    del_max = jnp.max(dcand, axis=1, keepdims=True)               # (1, 1)

    icand = clamp((h_ref[0, :, pl.ds(t1 - 1, 1)] - insc_ref[0]) + sim_c)
    imask = (ii_col >= q0 + 1) & (ii_col <= q1 - 1)
    icand = jnp.where(imask, icand, f32(NEG))
    ins_max = jnp.max(icand, axis=0, keepdims=True)               # (1, 1)

    best = jnp.maximum(match, jnp.maximum(del_max, ins_max))      # (1, 1)
    row_q1 = h_ref[0, pl.ds(q1, 1), :]
    h_ref[0, pl.ds(q1, 1), :] = jnp.where(jj_row == t1, best, row_q1)


@functools.partial(jax.jit, static_argnames=("q0", "q1", "t0", "t1", "local"))
def _dp_pallas_batched(S, D, CpadR, ins0, ins_close, dclose, *, q0, q1,
                       t0, t1, local):
    n, q2, t2 = S.shape
    kernel = functools.partial(_kernel, q0=q0, q1=q1, t0=t0, t1=t1,
                               q2=q2, t2=t2, local=local)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, q2, t2), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(n,),
            in_specs=[
                pl.BlockSpec((1, q2, t2), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, t2, t2), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, 2 * q2, t2), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, q2, 1), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, q2, 1), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, 1, t2), lambda b: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, q2, t2), lambda b: (b, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((q2, t2), jnp.float32),   # lane-shifted H
                pltpu.VMEM((t2, t2), jnp.float32),   # identity (MXU relayout)
            ],
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * (q1 - q0) * t2 * (q2 + t2),
            bytes_accessed=n * (q2 * t2 * 3 + t2 * t2) * 4,
            transcendentals=0),
    )(S, D, CpadR, ins0, ins_close, dclose)


def _host_tables(c: DPCosts, q0: int, q1: int, t0: int, t1: int):
    """Exact host-precomputed cost tables (reference float32 mul-then-add),
    identical to ops/dp_engine's preparation."""
    q2 = c.q_size
    d = np.arange(-(q2 - 1), q2 + 1, dtype=np.int64)
    Cpad = (c.A[None, :] + c.B[None, :]
            * (d[:, None] - c.ins_dist_offset).astype(np.float32)
            ).astype(np.float32)
    if c.C is not None:
        Cpad = (Cpad + c.C[None, :].astype(np.float32)).astype(np.float32)
    Cpad[d < 2] = 0.0

    ii = np.arange(q2, dtype=np.int64)
    ins0 = c.ins_cost_of_dist(ii - q0, t0 + 1)
    if c.ins_zero_head_q and q0 == 0:
        ins0 = np.zeros_like(ins0)
    ins_close = c.ins_cost_of_dist(q1 - ii, t1)
    if c.ins_zero_tail_q and q1 == q2 - 1:
        ins_close = np.zeros_like(ins_close)
    dclose = np.ascontiguousarray(c.D[:, t1])        # D column as a lane row
    return Cpad[::-1].copy(), ins0, ins_close, dclose


def supported(c: DPCosts) -> bool:
    return max(c.q_size, c.t_size) <= MAX_VMEM_SIDE


def forward_h_batched(costs: list[DPCosts], local: bool = False,
                      interpret: bool = False) -> np.ndarray:
    """Full forward H matrices for a batch of same-shape cost models.
    Bit-identical to dp_ref/dp_engine H output.  interpret=True runs the
    Pallas interpreter (CPU tests)."""
    assert costs
    q2, t2 = costs[0].q_size, costs[0].t_size
    for c in costs:
        assert (c.q_size, c.t_size) == (q2, t2), "bucket by shape first"
    q0, t0, q1, t1 = 0, 0, q2 - 1, t2 - 1
    if q1 - q0 - 2 < 0 or t1 - t0 - 2 < 0:
        from . import dp_ref
        return np.stack([dp_ref.build_forward(c, q0, q1, t0, t1,
                                              local=local).H for c in costs])

    S_b, D_b, Cp_b, i0_b, ic_b, dc_b = [], [], [], [], [], []
    for c in costs:
        CpadR, ins0, insc, dclose = _host_tables(c, q0, q1, t0, t1)
        S_b.append(c.S)
        D_b.append(c.D)
        Cp_b.append(CpadR)
        i0_b.append(ins0[:, None])
        ic_b.append(insc[:, None])
        dc_b.append(dclose[None, :])

    fn = _dp_pallas_batched
    if interpret:
        with pltpu.force_tpu_interpret_mode():
            out = fn(jnp.asarray(np.stack(S_b)), jnp.asarray(np.stack(D_b)),
                     jnp.asarray(np.stack(Cp_b)), jnp.asarray(np.stack(i0_b)),
                     jnp.asarray(np.stack(ic_b)), jnp.asarray(np.stack(dc_b)),
                     q0=q0, q1=q1, t0=t0, t1=t1, local=local)
            return np.asarray(out)
    out = fn(jnp.asarray(np.stack(S_b)), jnp.asarray(np.stack(D_b)),
             jnp.asarray(np.stack(Cp_b)), jnp.asarray(np.stack(i0_b)),
             jnp.asarray(np.stack(ic_b)), jnp.asarray(np.stack(dc_b)),
             q0=q0, q1=q1, t0=t0, t1=t1, local=local)
    return np.asarray(out)


def forward_scores_batch(costs: list[DPCosts], local: bool = False,
                         interpret: bool = False) -> np.ndarray:
    """Optimal global scores H[q1, t1] for a batch of same-shape pairs."""
    H = forward_h_batched(costs, local=local, interpret=interpret)
    return H[:, -1, -1].copy()


def forward_result(c: DPCosts, local: bool = False,
                   interpret: bool = False) -> DPResult:
    """DPResult with the exact H matrix (traceback pointers left NULL —
    callers that need tracebacks use dp_engine/dp_ref; the scores and any
    downstream re-derivation are bit-identical)."""
    H = forward_h_batched([c], local=local, interpret=interpret)[0]
    res = DPResult(c.q_size, c.t_size)
    res.H = H
    res.PQ[:] = NULL
    res.PT[:] = NULL
    return res
