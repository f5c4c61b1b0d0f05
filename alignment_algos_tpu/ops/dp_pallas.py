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
all.  Precomputing the cost tables on host (exact reference arithmetic) and
taking masked maxima on device preserves candidate values exactly; max is
order-insensitive, so scores match bit-for-bit.

Kernel layout — the Mosaic-clean design (round 3):

  * The grid is (pair, row): each grid step computes ONE row of H.  The
    similarity row streams in as a (1, 1, t2) block and the H row streams
    out the same way, so there is NO dynamic sublane indexing anywhere —
    the round-2 kernel kept the row loop inside the kernel and indexed a
    2*q2-row cost slab at a dynamic sublane offset, which Mosaic rejects
    ("cannot statically prove that index in dimension 1 is a multiple
    of 8").
  * Insertion candidates are indexed by gap DISTANCE m = i - k instead of
    by absolute row k: the cost table Cm[m, j] = ins_cost(m, j) is then
    static, and the H history lives in a distance-indexed scratch
    hrev[m, j] = H[i-m, j-1] that rolls down one sublane per row.  Fresh
    values enter at m = 1 (the just-finished previous row); every row the
    mask needs (m in [2, i-1]) is valid by induction.
  * Deletion candidates need the previous row in column orientation for
    the (t2, t2) broadcast; the relayout is done on the MXU as an identity
    matmul (eye @ row^T), far cheaper than a vector transpose on TPU.
  * Boundary row/column and the closing cell (dpmatrix.h:409-426,504-534)
    are pl.when branches on the row index; the boundary-column value is
    merged into every interior row so the streamed-out row is final.

Capacity: resident VMEM is Cm + hrev + D + eye ~= (2*q2*t2 + 2*t2*t2)*4 B
plus small per-row blocks; q2,t2 up to ~768 fit the 16 MB budget.  Larger
pairs fall back to ops/dp_engine (the XLA scan).
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

# resident VMEM: Cm + hrev (q2*t2 each) + D + eye (t2*t2 each), double-
# buffered row blocks are negligible; keep under the 16 MB budget
MAX_VMEM_SIDE = 768


def _kernel(s_ref, d_ref, cm_ref, ins0_ref, insc_ref, dcl_ref, h_ref,
            hrev, prev, eye, *, q0: int, q1: int, t0: int, t1: int,
            q2: int, t2: int, local: bool, ku: int = 1):
    f32 = jnp.float32
    for _r in range(ku):
        _row_body(s_ref, d_ref, cm_ref, ins0_ref, insc_ref, dcl_ref, h_ref,
                  hrev, prev, eye, r=_r, q0=q0, q1=q1, t0=t0, t1=t1,
                  q2=q2, t2=t2, local=local, ku=ku)


def _row_body(s_ref, d_ref, cm_ref, ins0_ref, insc_ref, dcl_ref, h_ref,
              hrev, prev, eye, *, r: int, q0: int, q1: int, t0: int,
              t1: int, q2: int, t2: int, local: bool, ku: int):
    f32 = jnp.float32
    i = pl.program_id(1) * ku + r

    def clamp(x):
        return jnp.maximum(f32(0.0), x) if local else x

    jj_row = jax.lax.broadcasted_iota(jnp.int32, (1, t2), 1)
    mm_col = jax.lax.broadcasted_iota(jnp.int32, (q2, 1), 0)

    @pl.when((pl.program_id(0) == 0) & (i == 0))
    def _():
        eye[:] = (jax.lax.broadcasted_iota(jnp.int32, (t2, t2), 0)
                  == jax.lax.broadcasted_iota(jnp.int32, (t2, t2), 1)
                  ).astype(f32)

    sim = s_ref[0, r:r + 1]                                     # (1, t2)

    # ---- rows before the boundary row: zeros --------------------------
    @pl.when(i <= q0)
    def _():
        h_ref[0, r:r + 1] = jnp.zeros((1, t2), f32)

    # ---- boundary row q0+1 (dpmatrix.h:409-417) ------------------------
    @pl.when(i == q0 + 1)
    def _():
        brow_del = clamp((f32(0.0) - d_ref[0, pl.ds(t0, 1), :]) + sim)
        brow = jnp.where(jj_row == t0 + 1, clamp(sim), brow_del)
        brow = jnp.where((jj_row >= t0 + 1) & (jj_row <= t1 - 1), brow,
                         f32(0.0))
        h_ref[0, r:r + 1] = brow
        prev[:] = brow

    # shared by interior + closing rows: advance the distance-indexed H
    # history (hrev[m, j] = H[i-m, j-1]) and fetch the previous row
    def advance_history():
        shifted = jnp.where(jj_row == 0, f32(0.0),
                            pltpu.roll(prev[:], 1, axis=1))
        hist = pltpu.roll(hrev[:], 1, axis=0)
        hrev[:] = jnp.where(mm_col == 1, shifted, hist)

    # ---- interior rows q0+2 .. q1-1 (dpmatrix.h:447-486) ---------------
    @pl.when((i >= q0 + 2) & (i <= q1 - 1))
    def _():
        advance_history()
        hprev = prev[:]                                         # (1, t2)
        match = clamp(hrev[pl.ds(1, 1), :] + sim)

        # deletion slab: hprev in column orientation via MXU identity
        hcol = jax.lax.dot_general(
            eye[:], hprev, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32)                         # (t2, 1)
        kk_col = jax.lax.broadcasted_iota(jnp.int32, (t2, 1), 0)
        dc = clamp((hcol - d_ref[0]) + sim)
        dc = jnp.where((kk_col >= t0 + 1) & (kk_col <= jj_row - 2), dc,
                       f32(NEG))
        del_max = jnp.max(dc, axis=0, keepdims=True)            # (1, t2)

        # insertion slab over the distance-indexed history
        ic = clamp((hrev[:] - cm_ref[0]) + sim)
        ic = jnp.where((mm_col >= 2) & (mm_col <= i - q0 - 1), ic, f32(NEG))
        ins_max = jnp.max(ic, axis=0, keepdims=True)            # (1, t2)

        best = jnp.maximum(match, jnp.maximum(del_max, ins_max))

        # boundary column t0+1 (dpmatrix.h:419-426); exact one-hot max
        # extraction of ins0[i] (other entries are NEG)
        ins0_i = jnp.max(jnp.where(mm_col == i, ins0_ref[0], f32(NEG)))
        bcol = clamp((f32(0.0) - ins0_i)
                     + jnp.max(jnp.where(jj_row == t0 + 1, sim, f32(NEG))))
        interior_j = (jj_row >= t0 + 2) & (jj_row <= t1 - 1)
        row = jnp.where(interior_j, best, f32(0.0))
        row = jnp.where(jj_row == t0 + 1, bcol, row)
        h_ref[0, r:r + 1] = row
        prev[:] = row

    # ---- closing row q1: only cell (q1, t1) is set (dpmatrix.h:504-534)
    @pl.when(i == q1)
    def _():
        advance_history()
        hlast = prev[:]                                         # (1, t2)
        sim_c = jnp.max(jnp.where(jj_row == t1, sim, f32(NEG)))   # scalar
        h_diag = jnp.max(jnp.where(jj_row == t1 - 1, hlast, f32(NEG)))
        match = clamp(h_diag + sim_c)

        dcand = clamp((hlast - dcl_ref[0]) + sim_c)             # (1, t2)
        dcand = jnp.where((jj_row >= t0 + 1) & (jj_row <= t1 - 1), dcand,
                          f32(NEG))
        del_max = jnp.max(dcand)

        # insertion candidates H[q1-m, t1-1] - ins_cost(m, t1): the t1
        # lane of hrev holds exactly H[q1-m, t1-1]
        icand = clamp((hrev[:, pl.ds(t1 - 1 + 1, 1)] - insc_ref[0]) + sim_c)
        icand = jnp.where((mm_col >= 1) & (mm_col <= q1 - q0 - 1), icand,
                          f32(NEG))
        ins_max = jnp.max(icand)

        best = jnp.maximum(match, jnp.maximum(del_max, ins_max))
        h_ref[0, r:r + 1] = jnp.where(jj_row == t1, best, f32(0.0))


@functools.partial(jax.jit, static_argnames=("q0", "q1", "t0", "t1", "local",
                                             "ku"))
def _dp_pallas_batched(S, D, Cm, ins0, ins_close_m, dclose, *, q0, q1,
                       t0, t1, local, ku=1):
    n, q2, t2 = S.shape
    if q2 % ku:
        ku = 1
    kernel = functools.partial(_kernel, q0=q0, q1=q1, t0=t0, t1=t1,
                               q2=q2, t2=t2, local=local, ku=ku)
    # rows stream as (1, ku, t2) blocks; Mosaic requires the block height
    # to equal the array dimension, so rows are flattened into the leading
    # dim and regrouped by ku
    S_rows = S.reshape(n * q2 // ku, ku, t2)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n * q2 // ku, ku, t2), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(n, q2 // ku),
            in_specs=[
                pl.BlockSpec((1, ku, t2),
                             lambda b, r, _nb=q2 // ku: (b * _nb + r, 0, 0)),
                pl.BlockSpec((1, t2, t2), lambda b, r: (b, 0, 0)),   # D
                pl.BlockSpec((1, q2, t2), lambda b, r: (b, 0, 0)),   # Cm
                pl.BlockSpec((1, q2, 1), lambda b, r: (b, 0, 0)),    # ins0
                pl.BlockSpec((1, q2, 1), lambda b, r: (b, 0, 0)),    # insc_m
                pl.BlockSpec((1, 1, t2), lambda b, r: (b, 0, 0)),    # dclose
            ],
            out_specs=pl.BlockSpec((1, ku, t2),
                                   lambda b, r, _nb=q2 // ku: (b * _nb + r,
                                                               0, 0)),
            scratch_shapes=[
                pltpu.VMEM((q2, t2), jnp.float32),   # hrev (distance-indexed)
                pltpu.VMEM((1, t2), jnp.float32),    # previous H row
                pltpu.VMEM((t2, t2), jnp.float32),   # identity (MXU relayout)
            ],
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * (q1 - q0) * t2 * (q2 + t2),
            bytes_accessed=n * (q2 * t2 * 3 + t2 * t2) * 4,
            transcendentals=0),
    )(S_rows, D, Cm, ins0, ins_close_m, dclose)
    return out.reshape(n, q2, t2)


def _host_tables(c: DPCosts, q0: int, q1: int, t0: int, t1: int):
    """Exact host-precomputed cost tables (reference float32 mul-then-add),
    identical to ops/dp_engine's preparation.  Cm and ins_close_m are
    indexed by gap distance m (see module docstring)."""
    q2 = c.q_size
    m = np.arange(q2, dtype=np.int64)
    Cm = (c.A[None, :] + c.B[None, :]
          * (m[:, None] - c.ins_dist_offset).astype(np.float32)
          ).astype(np.float32)
    if c.C is not None:
        Cm = (Cm + c.C[None, :].astype(np.float32)).astype(np.float32)
    Cm[m < 2] = 0.0

    ii = np.arange(q2, dtype=np.int64)
    ins0 = c.ins_cost_of_dist(ii - q0, t0 + 1)
    if c.ins_zero_head_q and q0 == 0:
        ins0 = np.zeros_like(ins0)
    # closing-cell insertion costs in distance form: insc_m[m] =
    # insertion(q1-m, q1, t1-1, t1)
    insc_m = c.ins_cost_of_dist(m, t1)
    if c.ins_zero_tail_q and q1 == q2 - 1:
        insc_m = np.zeros_like(insc_m)
    dclose = np.ascontiguousarray(c.D[:, t1])        # D column as a lane row
    return Cm, ins0, insc_m, dclose


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

    S_b, D_b, Cm_b, i0_b, ic_b, dc_b = [], [], [], [], [], []
    for c in costs:
        Cm, ins0, insc_m, dclose = _host_tables(c, q0, q1, t0, t1)
        S_b.append(c.S)
        D_b.append(c.D)
        Cm_b.append(Cm)
        i0_b.append(ins0[:, None])
        ic_b.append(insc_m[:, None])
        dc_b.append(dclose[None, :])

    fn = _dp_pallas_batched
    if interpret:
        with pltpu.force_tpu_interpret_mode():
            out = fn(jnp.asarray(np.stack(S_b)), jnp.asarray(np.stack(D_b)),
                     jnp.asarray(np.stack(Cm_b)), jnp.asarray(np.stack(i0_b)),
                     jnp.asarray(np.stack(ic_b)), jnp.asarray(np.stack(dc_b)),
                     q0=q0, q1=q1, t0=t0, t1=t1, local=local)
            return np.asarray(out)
    out = fn(jnp.asarray(np.stack(S_b)), jnp.asarray(np.stack(D_b)),
             jnp.asarray(np.stack(Cm_b)), jnp.asarray(np.stack(i0_b)),
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
