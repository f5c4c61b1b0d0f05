"""Batched exact general-gap DP scores (Pallas TPU kernel, round 4).

Same recurrence and bit-exact candidate values as ops/dp_pallas (the
reference O(Q*T*(Q+T)) build, dpmatrix.h:356-536, driven by host-
precomputed DPCosts tables), but restructured for throughput: scores
only, B pairs vectorized per grid step, ku rows per step.

Why: the row-per-step H-emitting kernel (ops/dp_pallas) pays a measured
~22 us of per-grid-step streamed-DMA overhead on this deployment — at
n*q2 grid steps that is ~100 ms per 16-pair 258-residue bucket, ~1000x
the VPU floor for the actual candidate evaluations.  This kernel runs
grid (groups, q2/ku) — two orders of magnitude fewer steps — with ONE
streamed input (the similarity rows); the gap-cost tables ride
group-indexed block specs so they are fetched once per group.

Layout (the lane-padding trap dictates it): pair index b lives on
SUBLANES (B = 8) or the LEADING axis — never on lanes, where the 128
minimum would multiply the per-pair (t2, t2) deletion tables past VMEM.
  sim rows   (1, ku, B, t2)   streamed; B sublanes, t2 lanes
  hrev state (q2, B, t2)      hrev[m, b, j] = H[i-m, j-1]; m leading
  CmB        (q2, B, t2)      insertion cost by gap distance m
  DT         (B, t2, t2)      deletion table D[k, j] as [b, k, j]
  del slab   (B, t2k, t2j)    k on sublanes, j on lanes, b leading
The one true relayout — H[i-1, *] from (B-sublane, t2-lane) row
orientation into (B-lead, t2-sublane) column orientation for the
deletion slab — is a single native 2D transpose of the (B, t2) row plus
B static lane slices, once per row.

Exactness: every candidate value is fl(fl(H - cost) + sim) with the
host-precomputed cost tables, identical to dp_pallas/dp_ref; sim is
added AFTER the masked max, which is exact because fl(x + s) is
monotone in x, so max_k fl(fl(H_k - c_k) + s) == fl(max_k fl(H_k - c_k)
+ s).  Scores are bit-identical to dp_ref H[q1, t1]
(tests/test_dp_scores.py on the interpreter, tests/test_tpu_hardware.py
on the chip).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scoring.base import DPCosts
from .dp_pallas import _host_tables

NEG = -3.0e38
B = 8           # pairs per group (sublanes)
KU = 8          # rows per grid step
VMEM_LIMIT = 96 * 1024 * 1024   # v5e VMEM is 128 MiB physical
VMEM_NEED_CAP = 80 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(s_ref, dt_hbm, cm_hbm, ins0_hbm, insc_hbm, dcl_hbm, out_ref,
            hrev, prev, dmask, dt_ref, cm_ref, ins0_ref, insc_ref,
            dcl_ref, sems, *, q0: int, q1: int, t0: int, t1: int,
            q2p: int, t2p: int, ku: int, local: bool):
    f32 = jnp.float32
    g = pl.program_id(0)
    rb = pl.program_id(1)

    # group tables load ONCE per group by explicit DMA: streamed block
    # specs re-fetch even when the index map is constant across steps,
    # which at (1, b, t2, t2) block sizes dominated the whole kernel
    @pl.when(rb == 0)
    def _():
        copies = [
            pltpu.make_async_copy(dt_hbm.at[g], dt_ref, sems.at[0]),
            pltpu.make_async_copy(cm_hbm.at[g], cm_ref, sems.at[1]),
            pltpu.make_async_copy(ins0_hbm.at[g], ins0_ref, sems.at[2]),
            pltpu.make_async_copy(insc_hbm.at[g], insc_ref, sems.at[3]),
            pltpu.make_async_copy(dcl_hbm.at[g], dcl_ref, sems.at[4]),
        ]
        for c in copies:
            c.start()
        for c in copies:
            c.wait()

    def clamp(x):
        return jnp.maximum(f32(0.0), x) if local else x

    jl = jax.lax.broadcasted_iota(jnp.int32, (1, t2p), 1)       # lane j
    ml = jax.lax.broadcasted_iota(jnp.int32, (q2p, 1, 1), 0)    # lead m

    @pl.when((g == 0) & (rb == 0))
    def _():
        # deletion add-mask[k, j]: 0 where t0+1 <= k <= j-2, else NEG
        kk = jax.lax.broadcasted_iota(jnp.int32, (t2p, t2p), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (t2p, t2p), 1)
        dmask[:] = jnp.where((kk >= t0 + 1) & (kk <= jj - 2), f32(0.0),
                             f32(NEG))

    @pl.when(rb == 0)
    def _():
        hrev[:] = jnp.zeros_like(hrev)
        prev[:] = jnp.zeros_like(prev)

    for r in range(ku):
        i = rb * ku + r
        sim = s_ref[0, r]                                       # (B, t2)

        # ---- boundary row q0+1 (dpmatrix.h:409-417) --------------------
        @pl.when(i == q0 + 1)
        def _():
            d_row = dt_ref[:, t0, :]                            # (B, t2)
            brow = clamp((f32(0.0) - d_row) + sim)
            brow = jnp.where(jl == t0 + 1, clamp(sim), brow)
            brow = jnp.where((jl >= t0 + 1) & (jl <= t1 - 1), brow,
                             f32(0.0))
            prev[:] = brow

        def advance_history():
            shifted = jnp.where(jl == 0, f32(0.0),
                                pltpu.roll(prev[:], 1, axis=1))
            hist = pltpu.roll(hrev[:], 1, axis=0)
            hrev[:] = jnp.where(ml == 1, shifted[None], hist)

        # ---- interior rows q0+2 .. q1-1 (dpmatrix.h:447-486) -----------
        @pl.when((i >= q0 + 2) & (i <= q1 - 1))
        def _():
            advance_history()
            hp = prev[:]                                        # (B, t2)
            match = clamp(hrev[1] + sim)

            # deletion: H[i-1, k] into column orientation via ONE
            # native 2D transpose + B static lane slices
            hp_t = hp.T                                         # (t2, B)
            dc_parts = []
            for b in range(hp.shape[0]):
                hcol = hp_t[:, b:b + 1]                         # (t2k, 1)
                dc_parts.append((hcol - dt_ref[b]) + dmask[:])
            del_kj = jnp.stack(dc_parts)                        # (B,t2k,t2j)
            del_max = clamp(jnp.max(del_kj, axis=1) + sim)      # (B, t2)

            # insertion over the distance-indexed history
            ic = hrev[:] - cm_ref[:]                            # (q2,B,t2)
            ic = ic + jnp.where((ml >= 2) & (ml <= i - q0 - 1),
                                f32(0.0), f32(NEG))
            ins_max = clamp(jnp.max(ic, axis=0) + sim)          # (B, t2)

            best = jnp.maximum(match, jnp.maximum(del_max, ins_max))

            # boundary column t0+1 (dpmatrix.h:419-426)
            sim_b = jnp.max(jnp.where(jl == t0 + 1, sim, f32(NEG)),
                            axis=1, keepdims=True)              # (B, 1)
            bcol = clamp((f32(0.0) - ins0_ref[i][:, 0:1]) + sim_b)
            row = jnp.where((jl >= t0 + 2) & (jl <= t1 - 1), best,
                            f32(0.0))
            row = jnp.where(jl == t0 + 1,
                            jnp.broadcast_to(bcol, row.shape), row)
            prev[:] = row

        # ---- closing row q1 (dpmatrix.h:504-534) -----------------------
        @pl.when(i == q1)
        def _():
            advance_history()
            hlast = prev[:]                                     # (B, t2)
            sim_c = jnp.max(jnp.where(jl == t1, sim, f32(NEG)),
                            axis=1, keepdims=True)              # (B, 1)
            h_diag = jnp.max(jnp.where(jl == t1 - 1, hlast, f32(NEG)),
                             axis=1, keepdims=True)
            match = clamp(h_diag + sim_c)

            dcand = hlast - dcl_ref[:]                          # (B, t2)
            dcand = dcand + jnp.where((jl >= t0 + 1) & (jl <= t1 - 1),
                                      f32(0.0), f32(NEG))
            del_max = clamp(jnp.max(dcand, axis=1, keepdims=True) + sim_c)

            # insertion candidates H[q1-m, t1-1]: lane t1 of hrev
            icand = (hrev[:, :, t1:t1 + 1]
                     - insc_ref[:, :, 0:1])                  # (q2,B,1)
            icand = icand + jnp.where(
                (ml >= 1) & (ml <= q1 - q0 - 1), f32(0.0), f32(NEG))
            ins_max = clamp(jnp.max(icand, axis=0) + sim_c)     # (B, 1)

            best = jnp.maximum(match, jnp.maximum(del_max, ins_max))
            out_ref[0] = jnp.broadcast_to(best, (best.shape[0], 128))


@functools.partial(jax.jit, static_argnames=("q0", "q1", "t0", "t1",
                                             "local", "ku"))
def _dp_scores_call(S, DT, Cm, ins0, insc, dclose, *, q0, q1, t0, t1,
                    local, ku=KU):
    g, q2p, b, t2p = S.shape
    kernel = functools.partial(_kernel, q0=q0, q1=q1, t0=t0, t1=t1,
                               q2p=q2p, t2p=t2p, ku=ku, local=local)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((g, b, 128), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(g, q2p // ku),
            in_specs=[
                pl.BlockSpec((1, ku, b, t2p),
                             lambda gi, ri: (gi, ri, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, b, 128), lambda gi, ri: (gi, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((q2p, b, t2p), jnp.float32),   # hrev
                pltpu.VMEM((b, t2p), jnp.float32),        # previous row
                pltpu.VMEM((t2p, t2p), jnp.float32),      # deletion mask
                pltpu.VMEM((b, t2p, t2p), jnp.float32),   # DT (per group)
                pltpu.VMEM((q2p, b, t2p), jnp.float32),   # Cm
                pltpu.VMEM((q2p, b, 128), jnp.float32),   # ins0
                pltpu.VMEM((q2p, b, 128), jnp.float32),   # insc
                pltpu.VMEM((b, t2p), jnp.float32),        # dclose
                pltpu.SemaphoreType.DMA((5,)),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=3 * g * b * (q1 - q0) * t2p * (q2p + t2p),
            bytes_accessed=g * b * (q2p * t2p * 2 + t2p * t2p) * 4,
            transcendentals=0),
    )(S, DT, Cm, ins0, insc, dclose)
    return out


def _vmem_need(q2: int, t2: int) -> int:
    """Scratch + stack estimate: hrev + Cm (q2p*B*t2p each), DT and ~2
    live deletion-slab temporaries (B*t2p^2 each), ins tables, mask."""
    q2p = _round_up(q2, KU)
    t2p = _round_up(t2, 128)
    return 4 * (2 * q2p * B * t2p + 3 * B * t2p * t2p
                + 2 * q2p * B * 128 + t2p * t2p + 3 * B * t2p)


def supported(c: DPCosts) -> bool:
    return _vmem_need(c.q_size, c.t_size) <= VMEM_NEED_CAP


def forward_scores_batch(costs: list[DPCosts], local: bool = False,
                         interpret: bool = False) -> np.ndarray:
    """Optimal global scores H[q1, t1] for a batch of same-shape cost
    models; bit-identical to dp_ref/dp_engine/dp_pallas.

    Only the raw per-pair data crosses to the device (S, D, and the
    A/B/C insertion coefficient vectors); the padded kernel layouts and
    the distance-indexed Cm/ins0/insc tables are built on device with
    the exact reference float32 op order (one mul, one add, optional
    C add — identical roundings to _host_tables)."""
    assert costs
    q2, t2 = costs[0].q_size, costs[0].t_size
    for c in costs:
        assert (c.q_size, c.t_size) == (q2, t2), "bucket by shape first"
    q0, t0, q1, t1 = 0, 0, q2 - 1, t2 - 1
    if q1 - q0 - 2 < 0 or t1 - t0 - 2 < 0:
        from . import dp_ref
        return np.stack([dp_ref.build_forward(c, q0, q1, t0, t1,
                                              local=local).H[q1, t1]
                         for c in costs])

    n = len(costs)
    S = np.stack([c.S for c in costs])
    vec_d = all(c.del_gi_vec is not None and c.del_align == costs[0].del_align
                for c in costs)
    if vec_d:
        # D is device-rebuilt from the two per-position vectors: the
        # (t2, t2) table never crosses the (slow) host->device link
        D = np.stack([np.stack([c.del_gi_vec, c.del_ge_vec])
                      for c in costs])                       # (n, 2, t2)
    else:
        D = np.stack([c.D for c in costs])
    A = np.stack([c.A for c in costs])
    Bv = np.stack([c.B for c in costs])
    C = np.stack([np.zeros(t2, np.float32) if c.C is None
                  else c.C.astype(np.float32) for c in costs])
    zero_head = bool(costs[0].ins_zero_head_q) and q0 == 0
    zero_tail = bool(costs[0].ins_zero_tail_q) and q1 == q2 - 1
    off = int(costs[0].ins_dist_offset)
    has_c = any(c.C is not None for c in costs)
    from ..scoring.base import _DEL_FREE_OVERHANG_MODES
    del_free = bool(vec_d and costs[0].del_align
                    in _DEL_FREE_OVERHANG_MODES)
    args = (jnp.asarray(S), jnp.asarray(D), jnp.asarray(A),
            jnp.asarray(Bv), jnp.asarray(C))
    kw = dict(q0=q0, q1=q1, t0=t0, t1=t1, local=local,
              zero_head=zero_head, zero_tail=zero_tail, off=off,
              has_c=has_c, vec_d=vec_d, del_free=del_free)
    if interpret:
        # NB: the unjitted wrapper — an outer jit around the interpreted
        # pallas call silently broadcasts pair 0's result across the
        # batch on the CPU interpreter
        with pltpu.force_tpu_interpret_mode():
            out = _prep_and_run.__wrapped__(*args, **kw)
            return np.asarray(out)[:, :, 0].reshape(-1)[:n].copy()
    out = _prep_and_run(*args, **kw)
    return np.asarray(out)[:, :, 0].reshape(-1)[:n].copy()


@functools.partial(jax.jit, static_argnames=("q0", "q1", "t0", "t1",
                                             "local", "zero_head",
                                             "zero_tail", "off", "has_c",
                                             "vec_d", "del_free"))
def _prep_and_run(S, D, A, Bv, C, *, q0, q1, t0, t1, local, zero_head,
                  zero_tail, off, has_c, vec_d=False, del_free=False):
    n, q2, t2 = S.shape
    f32 = jnp.float32
    if vec_d:
        # rebuild D[k, j] = min(gi[k], gi[j]) + min(ge[k], ge[j])*(j-k-2)
        # for j-k >= 2 else 0, with overhang zeroing — same elementwise
        # float32 roundings as scoring.base.affine_deletion_table
        gi_v, ge_v = D[:, 0, :], D[:, 1, :]
        gp = jnp.minimum(gi_v[:, :, None], gi_v[:, None, :])
        ep = jnp.minimum(ge_v[:, :, None], ge_v[:, None, :])
        kk = jnp.arange(t2, dtype=jnp.int32)[:, None]
        jj = jnp.arange(t2, dtype=jnp.int32)[None, :]
        dist = (jj - kk).astype(f32)
        Dt = gp + ep * (dist - f32(2.0))
        Dt = jnp.where(jj - kk < 2, f32(0.0), Dt)
        if del_free:
            Dt = Dt.at[:, 0, :].set(f32(0.0))
            Dt = Dt.at[:, :, t2 - 1].set(f32(0.0))
        D = Dt
    g = -(-n // B)
    q2p = _round_up(q2, KU)
    t2p = _round_up(t2, 128)
    npad = g * B - n

    def pack(x, shape):
        pads = [(0, 0)] * x.ndim
        pads[0] = (0, npad)
        x = jnp.pad(x, pads)
        return x.reshape((g, B) + x.shape[1:])

    f32 = jnp.float32
    m = jnp.arange(q2, dtype=jnp.int32)[:, None].astype(f32)
    # Cm[b, m, j]: reference mul-then-add order (A + B*(m-off)) [+ C]
    Cm = (A[:, None, :] + Bv[:, None, :] * (m[None] - f32(off)))
    if has_c:
        Cm = Cm + C[:, None, :]
    Cm = jnp.where(m[None] < 2, f32(0.0), Cm)
    # ins0[b, i] = cost of distance i - q0 at column t0+1
    d0 = (jnp.arange(q2, dtype=jnp.int32).astype(f32) - f32(q0))
    i0 = (A[:, t0 + 1:t0 + 2] + Bv[:, t0 + 1:t0 + 2]
          * (d0[None] - f32(off)))
    if has_c:
        i0 = i0 + C[:, t0 + 1:t0 + 2]
    i0 = jnp.where(d0[None] < 2, f32(0.0), i0)
    if zero_head:
        i0 = jnp.zeros_like(i0)
    # insc[b, m] = cost of distance m at column t1
    ic = (A[:, t1:t1 + 1] + Bv[:, t1:t1 + 1]
          * (d0[None] + f32(q0) - f32(off)))
    if has_c:
        ic = ic + C[:, t1:t1 + 1]
    ic = jnp.where(d0[None] + q0 < 2, f32(0.0), ic)
    if zero_tail:
        ic = jnp.zeros_like(ic)

    Sp = jnp.pad(pack(S, None), ((0, 0), (0, 0), (0, q2p - q2),
                                 (0, t2p - t2))).transpose(0, 2, 1, 3)
    DTp = jnp.pad(pack(D, None), ((0, 0), (0, 0), (0, t2p - t2),
                                  (0, t2p - t2)))
    Cmp = jnp.pad(pack(Cm, None), ((0, 0), (0, 0), (0, q2p - q2),
                                   (0, t2p - t2))).transpose(0, 2, 1, 3)
    I0p = jnp.pad(pack(i0, None), ((0, 0), (0, 0), (0, q2p - q2))
                  ).transpose(0, 2, 1)[..., None]
    I0p = jnp.broadcast_to(I0p, I0p.shape[:-1] + (128,))
    ICp = jnp.pad(pack(ic, None), ((0, 0), (0, 0), (0, q2p - q2))
                  ).transpose(0, 2, 1)[..., None]
    ICp = jnp.broadcast_to(ICp, ICp.shape[:-1] + (128,))
    DCp = jnp.pad(pack(D[:, :, t1], None), ((0, 0), (0, 0),
                                            (0, t2p - t2)))
    return _dp_scores_call(Sp, DTp, Cmp, I0p, ICp, DCp, q0=q0, q1=q1,
                           t0=t0, t1=t1, local=local)
