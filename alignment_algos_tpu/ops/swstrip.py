"""Strip-mined batched affine-gap Smith-Waterman (Pallas TPU kernel).

The monolithic wavefront kernel (ops/swaffine.py) computes a full
(Qp, B) slab per anti-diagonal: for square Q=T problems only ~50% of the
slab is inside the valid band, so half the VPU work is masked away.  This
variant tiles the query axis into strips of S rows and sweeps each strip's
own (shorter) anti-diagonals, raising band occupancy to T/(S+T-1)
(~89% at S=64, T=512) and shrinking both the similarity array and the
five state slabs — which in turn lets the lane (batch) axis grow to 1024+
within the 16 MB VMEM budget.

Inter-strip dependencies (H and F of a strip's last row feed the next
strip's row 0) stay ON CHIP: the kernel keeps two (DSp + S, B) boundary
buffers in VMEM scratch, writes each strip's last-row H/F per diagonal
(staged per grid step, stored at kd-aligned offsets so every dynamic
sublane index is provably a multiple of 8 — the Mosaic rule that sank the
round-2 exact-DP kernel), and reads them back one strip later at a fixed
+S-8 offset.  Reads run ahead of writes by S-8 >= kd slots, so a single
rotating buffer serves both strips without double buffering.

Bit-parity: every cell evaluates the same float32 candidate expressions in
the same order as the monolithic kernel and the XLA scan twin
(sw_affine_scores_xla), so scores are bit-identical — asserted in
tests/test_swstrip.py.

Replaces the reference's per-pair host loop (aa_ali.cpp via
dpmatrix.h:447-486) for the batched local-alignment screens.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -3.0e38

VMEM_BUDGET = 14 * 2**20


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _sw_strip_kernel(gap_ref, sd_ref, out_ref, hm1, hm2, e, f, m, bh, bf,
                     sth, stf, *, q: int, t: int, sp: int, kd: int, uf: int):
    s_idx = pl.program_id(0)
    blk = pl.program_id(1)
    ns = pl.num_programs(0)
    nblk = pl.num_programs(1)
    gi = gap_ref[0, 0]
    ge = gap_ref[0, 1]

    @pl.when((s_idx == 0) & (blk == 0))
    def _():
        m[:] = jnp.zeros_like(m)
        bh[:] = jnp.zeros_like(bh)        # H above row 0 is 0 (local SW)
        bf[:] = jnp.full_like(bf, NEG)    # F above row 0 is -inf

    @pl.when(blk == 0)
    def _():
        hm1[:] = jnp.zeros_like(hm1)
        hm2[:] = jnp.zeros_like(hm2)
        e[:] = jnp.full_like(e, NEG)
        f[:] = jnp.full_like(f, NEG)

    ii = jax.lax.broadcasted_iota(jnp.int32, (sp, 1), 0)
    qv = q - s_idx * sp                   # valid rows in this strip
    t_u32 = jnp.uint32(t)

    # previous strip's last-row H/F at columns j = dl-1 and j = dl live at
    # boundary slots j + sp - 1; reading a (kd+8, B) block at the 8-aligned
    # base blk*kd + sp - 8 covers rows u+6 (j = dl-1) and u+7 (j = dl)
    base = blk * kd + (sp - 8)
    hb_blk = bh[pl.ds(base, kd + 8)]
    fb_blk = bf[pl.ds(base, kd + 8)]

    def one_diag(dl, s, h1, h2, eo, fo, hb_dl, hb_dlm1, fb_dl,
                 masked: bool):
        open_ = h1 - gi
        e_new = jnp.maximum(eo - ge, open_)
        f_new = pltpu.roll(jnp.maximum(fo - ge, open_), 1, axis=0)
        f_new = jnp.where(ii == 0, jnp.maximum(fb_dl - ge, hb_dl - gi),
                          f_new)
        diag = jnp.where(ii == 0, hb_dlm1, pltpu.roll(h2, 1, axis=0))
        h_new = jnp.maximum(jnp.maximum(diag + s, jnp.float32(0.0)),
                            jnp.maximum(e_new, f_new))
        if masked:
            jj = dl - ii
            valid = (ii < qv) & (jj.astype(jnp.uint32) < t_u32)
            h_new = jnp.where(valid, h_new, jnp.float32(0.0))
        return h_new, e_new, f_new

    # statically unrolled (python loop): the boundary-row extracts and the
    # staging stores need literal sublane indices
    def run_block(masked: bool):
        for k in range(kd // uf):
            h1 = hm1[:]
            h2 = hm2[:]
            ee = e[:]
            ff = f[:]
            mloc = None
            for u in range(uf):
                du = uf * k + u
                s = sd_ref[0, du].astype(jnp.float32)
                h_new, ee, ff = one_diag(
                    blk * kd + du, s, h1, h2, ee, ff,
                    hb_blk[du + 7:du + 8], hb_blk[du + 6:du + 7],
                    fb_blk[du + 7:du + 8], masked)
                sth[pl.ds(du, 1)] = h_new[sp - 1:sp]
                stf[pl.ds(du, 1)] = ff[sp - 1:sp]
                h2, h1 = h1, h_new
                mloc = h_new if mloc is None else jnp.maximum(mloc, h_new)
            m[:] = jnp.maximum(m[:], mloc)
            hm2[:] = h2
            hm1[:] = h1
            e[:] = ee
            f[:] = ff

    # a block of diagonals is "interior" when every row of every diagonal
    # is in the valid band — then the mask (and its zeroing select) is an
    # identity and a maskless body runs instead (~78% of blocks at S=64,
    # T=512)
    interior = ((blk * kd >= sp - 1) & ((blk + 1) * kd - 1 <= t - 1)
                & (qv >= sp))

    @pl.when(interior)
    def _():
        run_block(False)

    @pl.when(jnp.logical_not(interior))
    def _():
        run_block(True)

    # publish this strip's last-row H/F for the next strip; the kd-aligned
    # offset keeps the store provably 8-aligned, and reads (at +sp-8) stay
    # >= kd slots ahead so this strip never clobbers what it still reads
    bh[pl.ds(blk * kd, kd)] = sth[:]
    bf[pl.ds(blk * kd, kd)] = stf[:]

    @pl.when((s_idx == ns - 1) & (blk == nblk - 1))
    def _():
        out_ref[0] = jnp.max(m[:], axis=0)


def vmem_ok(q: int, t: int, b: int, strip: int = 64, kd: int = 16) -> bool:
    """Bound the strip kernel's VMEM footprint (5 state slabs + 2 boundary
    buffers + staging + double-buffered sim block) against the budget, so
    screen wrappers can chunk or fall back instead of hitting a scoped-vmem
    compile OOM (round-3 advisor finding)."""
    sp = strip
    dsp = _round_up(sp + t - 1, kd)
    bp = _round_up(b, 128)
    scratch = (5 * sp + 2 * (dsp + sp) + 2 * kd) * bp * 4
    blocks = 2 * kd * sp * bp          # int8 sim block, double-buffered
    return scratch + blocks <= VMEM_BUDGET


def _striped_call(sd, gap, *, q, t, strip, kd, uf):
    ns, dsp, sp, b = sd.shape
    sim_spec = pl.BlockSpec((1, kd, sp, b), lambda s, d: (s, d, 0, 0))
    if sp != strip or strip % 8 or kd % 8 or kd % uf or dsp % kd:
        raise ValueError("bad strip/kd/uf geometry")
    if strip < kd + 8:
        raise ValueError("strip must be >= kd + 8 (boundary rotation)")
    if not vmem_ok(q, t, b, strip=strip, kd=kd):
        raise ValueError(
            f"strip kernel scratch for t={t}, b={b} exceeds the VMEM "
            "budget; chunk the batch axis or use the rowscan/xla engine")
    nblk = dsp // kd
    kernel = functools.partial(_sw_strip_kernel, q=q, t=t, sp=sp, kd=kd,
                               uf=uf)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, b), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(ns, nblk),
            in_specs=[
                pl.BlockSpec((1, 2), lambda s, d: (0, 0),
                             memory_space=pltpu.SMEM),
                sim_spec,
            ],
            out_specs=pl.BlockSpec((1, b), lambda s, d: (0, 0)),
            scratch_shapes=[
                pltpu.VMEM((sp, b), jnp.float32),   # H at d-1
                pltpu.VMEM((sp, b), jnp.float32),   # H at d-2
                pltpu.VMEM((sp, b), jnp.float32),   # E
                pltpu.VMEM((sp, b), jnp.float32),   # F
                pltpu.VMEM((sp, b), jnp.float32),   # running max
                pltpu.VMEM((dsp + sp, b), jnp.float32),  # boundary H
                pltpu.VMEM((dsp + sp, b), jnp.float32),  # boundary F
                pltpu.VMEM((kd, b), jnp.float32),   # staged last-row H
                pltpu.VMEM((kd, b), jnp.float32),   # staged last-row F
            ],
        ),
        cost_estimate=pl.CostEstimate(
            flops=12 * q * t * b,
            bytes_accessed=ns * dsp * sp * b * sd.dtype.itemsize,
            transcendentals=0),
    )(gap, sd)
    return out[0]


@functools.partial(jax.jit,
                   static_argnames=("q", "t", "strip", "kd", "uf"))
def sw_affine_scores_striped(sd: jax.Array, gap: jax.Array, *, q: int,
                             t: int, strip: int = 64, kd: int = 16,
                             uf: int = 4) -> jax.Array:
    """sd: (NS, DSp, Sp, B) strip-skewed similarity from
    :func:`strip_skewed_similarity_from_codes`; gap: (1, 2) [gi, ge].
    Returns (B,) local alignment scores, bit-identical to
    swaffine.sw_affine_scores_from_skewed / sw_affine_scores_xla."""
    return _striped_call(sd, gap, q=q, t=t, strip=strip, kd=kd, uf=uf)


def _strip_sim(q_codes, t_codes, table, strip: int, kd: int, sim_dtype,
               int8_mm: bool):
    """Shared producer body -> (NS, S, DSp, Bp) row-major strip skew
    ([ns, i, d, b] = sim[ns*S + i, d - i, b])."""
    b, q = q_codes.shape
    t = t_codes.shape[1]
    a = table.shape[0]
    s = strip
    ns = -(-q // s)
    qp = ns * s
    bp = _round_up(b, 128)
    ds = s + t - 1
    dsp = _round_up(ds, kd)
    if int8_mm and sim_dtype == jnp.int8:
        # integer tables (BLOSUM): int8 one-hot x int8 table on the MXU's
        # int8 path, int32 accumulate, convert fused into the epilogue —
        # no float32 (Q, T, B) intermediate round-trips HBM
        qoh = jax.nn.one_hot(q_codes, a, dtype=jnp.int8)     # (B, Q, A)
        toh = jax.nn.one_hot(t_codes, a, dtype=jnp.int8)     # (B, T, A)
        qt = jnp.einsum("bqa,ac->bqc", qoh, table.astype(jnp.int8),
                        preferred_element_type=jnp.int32).astype(jnp.int8)
        sim = jnp.einsum("bqc,btc->qtb", qt, toh,
                         preferred_element_type=jnp.int32).astype(jnp.int8)
    else:
        qoh = jax.nn.one_hot(q_codes, a, dtype=jnp.float32)  # (B, Q, A)
        toh = jax.nn.one_hot(t_codes, a, dtype=jnp.float32)  # (B, T, A)
        qt = jnp.einsum("bqa,ac->bqc", qoh, table.astype(jnp.float32),
                        preferred_element_type=jnp.float32)
        sim = jnp.einsum("bqc,btc->qtb", qt, toh,
                         preferred_element_type=jnp.float32).astype(sim_dtype)
    sim = jnp.pad(sim, ((0, qp - q), (0, 0), (0, bp - b)))   # (Qp, T, Bp)
    sim = sim.reshape(ns, s, t, bp)
    # per-strip diagonal skew via ONE pad: widen rows straight to the
    # final padded diagonal count (dsp + 1 columns), flatten, drop,
    # reshape -> row i shifted right by i: [ns, i, d, b] = sim[ns,i,d-i,b]
    w = dsp + 1
    padded = jnp.pad(sim, ((0, 0), (0, 0), (0, w - t), (0, 0)))
    flat = padded.reshape(ns, s * w, bp)[:, : s * (w - 1)]
    return flat.reshape(ns, s, dsp, bp)                      # [ns, i, d, b]


@functools.partial(jax.jit, static_argnames=("strip", "kd", "sim_dtype",
                                             "int8_mm"))
def strip_skewed_similarity_from_codes(q_codes: jax.Array,
                                       t_codes: jax.Array, table: jax.Array,
                                       strip: int = 64, kd: int = 16,
                                       sim_dtype=jnp.int8,
                                       int8_mm: bool = False) -> jax.Array:
    """(B, Q) x (B, T) int codes + (A, A) table -> (NS, DSp, Sp, Bp)
    strip-skewed similarity: [ns, d, i, b] = sim[ns*S + i, d - i, b].

    One MXU one-hot contraction emits (Q, T, B) with the 128-lane batch
    axis last; the per-strip diagonal skew is the pad/flatten/reshape trick
    on the strip's row block (no gathers, no lane-crossing ops), followed by
    a sublane-major transpose.  Total size is Q*(S+T-1)*B — 1.6x smaller
    than the monolithic skew's (Q+T-1)*Qp*B at S=64, T=Q=512."""
    sk = _strip_sim(q_codes, t_codes, table, strip, kd, sim_dtype, int8_mm)
    return jnp.transpose(sk, (0, 2, 1, 3))                   # (NS,DSp,S,Bp)


@functools.partial(jax.jit, static_argnames=("strip", "kd", "sim_dtype"))
def strip_skewed_similarity_screen(q_codes: jax.Array, t_codes: jax.Array,
                                   table: jax.Array, strip: int = 64,
                                   kd: int = 16,
                                   sim_dtype=jnp.int8) -> jax.Array:
    """Screen-shaped producer: ONE query (Q,) against B templates (B, T)
    -> (NS, DSp, Sp, Bp) strip-skewed similarity.

    The contraction is a single un-batched MXU matmul (Q, A) @ (A, T*B) —
    none of the batch-minor einsum relayouts the distinct-pairs form pays —
    so the producer drops well under the kernel's own cost.  This is the
    production shape of config 2 (all-vs-all = one query row at a time)
    and config 5 (library screen)."""
    (q,) = q_codes.shape
    b, t = t_codes.shape
    a = table.shape[0]
    s = strip
    ns = -(-q // s)
    qp = ns * s
    bp = _round_up(b, 128)
    ds = s + t - 1
    dsp = _round_up(ds, kd)
    qoh = jax.nn.one_hot(q_codes, a, dtype=jnp.float32)          # (Q, A)
    qt = jnp.dot(qoh, table.astype(jnp.float32),
                 preferred_element_type=jnp.float32)             # (Q, A)
    toh = jax.nn.one_hot(t_codes.T, a, dtype=jnp.float32, axis=0)
    sim = jnp.dot(qt, toh.reshape(a, t * b),
                  preferred_element_type=jnp.float32)            # (Q, T*B)
    sim = sim.reshape(q, t, b).astype(sim_dtype)
    sim = jnp.pad(sim, ((0, qp - q), (0, 0), (0, bp - b)))       # (Qp,T,Bp)
    sim = sim.reshape(ns, s, t, bp)
    # single-pad skew: widen rows straight to dsp+1 columns, flatten, drop
    w = dsp + 1
    padded = jnp.pad(sim, ((0, 0), (0, 0), (0, w - t), (0, 0)))
    flat = padded.reshape(ns, s * w, bp)[:, : s * (w - 1)]
    sk = flat.reshape(ns, s, dsp, bp)                            # [ns,i,d,b]
    return jnp.transpose(sk, (0, 2, 1, 3))                       # diag-major


def sw_affine_screen_striped(q_codes, t_codes, table, gi: float, ge: float,
                             strip: int = 64, kd: int = 16, uf: int = 4,
                             sim_dtype=jnp.int8):
    """One query against a template library through the strip engine:
    codes -> screen producer (one MXU matmul) -> kernel -> (B,) scores."""
    q_codes = jnp.asarray(q_codes)
    t_codes = jnp.asarray(t_codes)
    (q,) = q_codes.shape
    b, t = t_codes.shape
    sd = strip_skewed_similarity_screen(q_codes, t_codes, jnp.asarray(table),
                                        strip=strip, kd=kd,
                                        sim_dtype=sim_dtype)
    gap = jnp.array([[gi, ge]], dtype=jnp.float32)
    return sw_affine_scores_striped(sd, gap, q=q, t=t, strip=strip, kd=kd,
                                    uf=uf)[:b]


def sw_affine_batch_striped(q_codes, t_codes, table, gi: float, ge: float,
                            strip: int = 64, kd: int = 16, uf: int = 4,
                            sim_dtype=jnp.int8):
    """End-to-end batched local SW through the strip-mined kernel:
    codes -> strip-skewed similarity (MXU) -> kernel -> (B,) scores."""
    q_codes = jnp.asarray(q_codes)
    t_codes = jnp.asarray(t_codes)
    b, q = q_codes.shape
    t = t_codes.shape[1]
    sd = strip_skewed_similarity_from_codes(
        q_codes, t_codes, jnp.asarray(table), strip=strip, kd=kd,
        sim_dtype=sim_dtype)
    gap = jnp.array([[gi, ge]], dtype=jnp.float32)
    return sw_affine_scores_striped(sd, gap, q=q, t=t, strip=strip, kd=kd,
                                    uf=uf)[:b]
