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

# VMEM working-set budget for auto-tiling: the chip has 16 MB; leave headroom
# for the compiler's own temporaries (CLAUDE.md: blocks*2 + scratch < 16 MB).
VMEM_BUDGET = 14 * 2**20


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _auto_kd(qp: int, b: int, esz: int, budget: int = VMEM_BUDGET) -> int:
    """Largest even diagonals-per-grid-step count whose double-buffered
    similarity blocks plus the five f32 state slabs fit the VMEM budget.
    Bigger kd amortizes the fixed per-grid-step pipeline cost; the VMEM
    ceiling is what forces kd down as the batch (lane) axis grows."""
    state = 5 * qp * b * 4
    for kd in (32, 24, 16, 12, 8, 6, 4, 2):
        if state + 2 * kd * qp * b * esz <= budget:
            return kd
    return 2


def _sw_kernel(gap_ref, sd_ref, out_ref, hm1, hm2, e, f, m, *, q: int, t: int,
               qp: int, kd: int, uf: int = 2):
    """One grid step advances ``kd`` anti-diagonals (in-kernel loop over the
    (kd, qp, B) similarity block).  Blocking amortizes the per-grid-step
    pipeline cost — with one diagonal per step the fixed overhead of ~1000
    tiny steps dominated the VPU work 5:1.  ``uf`` diagonals chain through
    temporaries per loop iteration, so the five state slabs round-trip
    VMEM scratch once per uf diagonals instead of once per diagonal (the
    kernel is VMEM-op bound, not FLOP bound)."""
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
        open_ = h1 - gi                     # shared by E and (rolled) F
        e_new = jnp.maximum(eo - ge, open_)
        # max-then-roll == roll-then-max (roll is a permutation); saves a roll
        f_new = pltpu.roll(jnp.maximum(fo - ge, open_), 1, axis=0)
        f_new = jnp.where(ii == 0, NEG, f_new)  # row 0 wrap guard
        h_new = jnp.maximum(
            jnp.maximum(shift_down(h2) + s, jnp.float32(0.0)),
            jnp.maximum(e_new, f_new))
        h_new = jnp.where(valid, h_new, jnp.float32(0.0))
        return h_new, e_new, f_new

    def body(k, _):
        d0 = blk * kd + uf * k
        h1 = hm1[:]
        h2 = hm2[:]
        ee = e[:]
        ff = f[:]
        mloc = None
        for u in range(uf):
            s = sd_ref[uf * k + u].astype(jnp.float32)
            h_new, ee, ff = one_diag(d0 + u, s, h1, h2, ee, ff)
            h2, h1 = h1, h_new
            mloc = h_new if mloc is None else jnp.maximum(mloc, h_new)
        m[:] = jnp.maximum(m[:], mloc)
        hm2[:] = h2
        hm1[:] = h1
        e[:] = ee
        f[:] = ff
        return 0

    jax.lax.fori_loop(0, kd // uf, body, 0, unroll=True)

    @pl.when(blk == nblk - 1)
    def _():
        out_ref[0] = jnp.max(m[:], axis=0)


@functools.partial(jax.jit, static_argnames=("q", "t", "kd", "uf"))
def sw_affine_scores_from_skewed(sd: jax.Array, gap: jax.Array, *, q: int,
                                 t: int, kd: int | None = None,
                                 uf: int = 2) -> jax.Array:
    """sd: (D, Qp, B) skewed similarity (D = q+t-1); gap: (1,2) [gi, ge].
    Returns (B,) local alignment scores.  kd = anti-diagonals per grid step
    (None = largest that fits VMEM; padded diagonals past D are masked out
    by the validity predicate); uf = diagonals chained through temporaries
    per loop iteration."""
    nd, qp, b = sd.shape
    if kd is None:
        kd = _auto_kd(qp, b, sd.dtype.itemsize)
        kd = max(kd, uf)
    if kd % uf:
        raise ValueError("kd must be a multiple of uf")
    nblk = -(-nd // kd)
    if nblk * kd != nd:
        sd = jnp.pad(sd, ((0, nblk * kd - nd), (0, 0), (0, 0)))
    kernel = functools.partial(_sw_kernel, q=q, t=t, qp=qp, kd=kd, uf=uf)
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


def _sw_tb_kernel(gap_ref, sd_ref, tb_ref, m_ref, dat_ref, hm1, hm2, e, f,
                  m, dat, *, q: int, t: int, qp: int, kd: int):
    """Traceback-emitting twin of ``_sw_kernel``: per cell one int8 code
    (bits 0-1 H source: 0 stop / 1 diag / 2 E / 3 F; bit 2 E-extend;
    bit 3 F-extend) plus the running max value and its diagonal index per
    (row, lane), so the optimal local alignment can be decoded on host
    (the device-side analogue of optimal.h:47-124's stored prev pointers,
    at 1 byte per cell instead of 2 int32)."""
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
        dat[:] = jnp.zeros_like(dat)

    ii = jax.lax.broadcasted_iota(jnp.int32, (qp, 1), 0)

    def shift_down(x):
        y = pltpu.roll(x, 1, axis=0)
        return jnp.where(ii == 0, jnp.float32(0.0), y)

    def one_diag(d, s, h1, h2, eo, fo):
        jj = d - ii
        valid = (ii < q) & (jj >= 0) & (jj < t)
        e_open = h1 - gi
        e_ext = eo - ge
        e_new = jnp.maximum(e_ext, e_open)
        f_open = shift_down(h1) - gi
        f_ext = pltpu.roll(fo, 1, axis=0) - ge
        f_ext = jnp.where(ii == 0, NEG, f_ext)
        f_open = jnp.where(ii == 0, NEG, f_open)
        f_new = jnp.maximum(f_ext, f_open)
        diag = shift_down(h2) + s
        h_new = jnp.maximum(jnp.maximum(diag, jnp.float32(0.0)),
                            jnp.maximum(e_new, f_new))
        h_new = jnp.where(valid, h_new, jnp.float32(0.0))
        # per-cell code; ties resolve diag > E > F, open > extend
        code = jnp.where(
            h_new == 0.0, 0,
            jnp.where(h_new == diag, 1, jnp.where(h_new == e_new, 2, 3)))
        code = code | jnp.where(e_ext > e_open, 4, 0)
        code = code | jnp.where(f_ext > f_open, 8, 0)
        code = jnp.where(valid, code, 0)
        return h_new, e_new, f_new, code.astype(jnp.int8)

    def track(h_new, d):
        upd = h_new > m[:]
        dat[:] = jnp.where(upd, jnp.int32(d), dat[:])
        m[:] = jnp.where(upd, h_new, m[:])

    def body(k, _):
        d0 = blk * kd + 2 * k
        sA = sd_ref[2 * k].astype(jnp.float32)
        sB = sd_ref[2 * k + 1].astype(jnp.float32)
        h1 = hm1[:]
        hA, eA, fA, cA = one_diag(d0, sA, h1, hm2[:], e[:], f[:])
        track(hA, d0)
        hB, eB, fB, cB = one_diag(d0 + 1, sB, hA, h1, eA, fA)
        track(hB, d0 + 1)
        tb_ref[2 * k] = cA
        tb_ref[2 * k + 1] = cB
        hm2[:] = hA
        hm1[:] = hB
        e[:] = eB
        f[:] = fB
        return 0

    jax.lax.fori_loop(0, kd // 2, body, 0, unroll=True)

    @pl.when(blk == nblk - 1)
    def _():
        m_ref[:] = m[:]
        dat_ref[:] = dat[:]


@functools.partial(jax.jit, static_argnames=("q", "t", "kd"))
def sw_affine_tb_from_skewed(sd: jax.Array, gap: jax.Array, *, q: int,
                             t: int, kd: int | None = None):
    """Traceback variant: returns (tb (Dpad, Qp, B) int8 codes,
    m (Qp, B) running max, dat (Qp, B) int32 diagonal-of-max).  Decode with
    :func:`decode_local_tracebacks`."""
    nd, qp, b = sd.shape
    if kd is None:
        # six state slabs + double-buffered sim-in and tb-out blocks
        state = 6 * qp * b * 4
        kd = 2
        for cand in (32, 24, 16, 12, 8, 6, 4, 2):
            if state + 2 * cand * qp * b * (sd.dtype.itemsize + 1) \
                    <= VMEM_BUDGET:
                kd = cand
                break
    if kd % 2:
        raise ValueError("kd must be even")
    nblk = -(-nd // kd)
    if nblk * kd != nd:
        sd = jnp.pad(sd, ((0, nblk * kd - nd), (0, 0), (0, 0)))
    kernel = functools.partial(_sw_tb_kernel, q=q, t=t, qp=qp, kd=kd)
    tb, m, dat = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((nblk * kd, qp, b), jnp.int8),
            jax.ShapeDtypeStruct((qp, b), jnp.float32),
            jax.ShapeDtypeStruct((qp, b), jnp.int32),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(nblk,),
            in_specs=[
                pl.BlockSpec((1, 2), lambda d: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((kd, qp, b), lambda d: (d, 0, 0)),
            ],
            out_specs=(
                pl.BlockSpec((kd, qp, b), lambda d: (d, 0, 0)),
                pl.BlockSpec((qp, b), lambda d: (0, 0)),
                pl.BlockSpec((qp, b), lambda d: (0, 0)),
            ),
            scratch_shapes=[
                pltpu.VMEM((qp, b), jnp.float32),  # H at d-1
                pltpu.VMEM((qp, b), jnp.float32),  # H at d-2
                pltpu.VMEM((qp, b), jnp.float32),  # E
                pltpu.VMEM((qp, b), jnp.float32),  # F
                pltpu.VMEM((qp, b), jnp.float32),  # running max
                pltpu.VMEM((qp, b), jnp.int32),    # diagonal of max
            ],
        ),
        cost_estimate=pl.CostEstimate(
            flops=16 * q * t * b,
            bytes_accessed=nd * qp * b * (sd.dtype.itemsize + 1),
            transcendentals=0),
    )(gap, sd)
    return tb, m, dat


def decode_local_tracebacks(tb: np.ndarray, m: np.ndarray, dat: np.ndarray,
                            q: int, t: int, nb: int | None = None):
    """Vectorized host decode of the kernel's traceback codes.

    Returns (scores (B,), paths) where paths[b] is the list of matched
    (query_idx, template_idx) 0-based pairs, N-to-C order (empty when the
    best local score is 0)."""
    tb = np.asarray(tb)
    m = np.asarray(m)
    dat = np.asarray(dat)
    b = m.shape[1] if nb is None else nb
    scores = m[:q, :b].max(axis=0)
    bi = m[:q, :b].argmax(axis=0)
    bd = dat[bi, np.arange(b)]

    lanes = np.arange(b)
    i = bi.astype(np.int64)
    j = (bd - bi).astype(np.int64)
    state = np.zeros(b, np.int8)       # 0 = H, 1 = E, 2 = F
    alive = scores > 0.0
    # matched (i, j) per (step, lane), -1 where no match: the per-lane
    # paths are mask-extracted afterwards instead of appended in the loop
    # (the per-step per-lane python appends dominated large decodes)
    max_steps = q + t + 2
    rec_i = np.full((max_steps, b), -1, np.int32)
    rec_j = np.full((max_steps, b), -1, np.int32)
    for step in range(max_steps):
        if not alive.any():
            break
        inb = alive & (i >= 0) & (j >= 0)
        alive = inb
        if not alive.any():
            break
        c = np.zeros(b, np.int8)
        al = np.where(alive)[0]
        c[al] = tb[i[al] + j[al], i[al], lanes[al]]
        in_h = alive & (state == 0)
        hb = c & 3
        stop = in_h & (hb == 0)
        alive = alive & ~stop
        match = alive & (state == 0) & (hb == 1)
        rec_i[step, match] = i[match]
        rec_j[step, match] = j[match]
        to_e = alive & (state == 0) & (hb == 2)
        to_f = alive & (state == 0) & (hb == 3)
        state = np.where(to_e, 1, np.where(to_f, 2, state)).astype(np.int8)
        i = np.where(match, i - 1, i)
        j = np.where(match, j - 1, j)
        in_e = alive & (state == 1) & ~to_e & ~match
        in_e = in_e | to_e
        in_f = (alive & (state == 2) & ~to_f & ~match) | to_f
        # E consumes one template column; leaves E when the open bit won
        e_ext = (c & 4) != 0
        f_ext = (c & 8) != 0
        j = np.where(in_e, j - 1, j)
        state = np.where(in_e & ~e_ext, 0, state).astype(np.int8)
        i = np.where(in_f, i - 1, i)
        state = np.where(in_f & ~f_ext, 0, state).astype(np.int8)
    paths = []
    for lane in range(b):
        msk = rec_i[:, lane] >= 0
        pi = rec_i[msk, lane][::-1]
        pj = rec_j[msk, lane][::-1]
        paths.append(list(zip(pi.tolist(), pj.tolist())))
    return scores, paths


@functools.partial(jax.jit, static_argnames=("q", "t", "b"))
def _decode_tb_device(tb, m, dat, *, q: int, t: int, b: int):
    """Device-side port of decode_local_tracebacks' per-step loop: the
    multi-MB traceback code array never leaves the chip — only the
    (max_steps, B) matched-pair records do (a ~30x smaller pull through
    this deployment's ~90 MB/s device->host link)."""
    lanes = jnp.arange(b)
    mq = m[:q, :b]
    scores = jnp.max(mq, axis=0)
    bi = jnp.argmax(mq, axis=0).astype(jnp.int32)
    bd = dat[bi, lanes].astype(jnp.int32)
    max_steps = q + t + 2
    i = bi
    j = bd - bi
    state = jnp.zeros(b, jnp.int8)
    alive = scores > 0.0
    rec_i = jnp.full((max_steps, b), -1, jnp.int32)
    rec_j = jnp.full((max_steps, b), -1, jnp.int32)

    def body(step, carry):
        i, j, state, alive, rec_i, rec_j = carry
        alive = alive & (i >= 0) & (j >= 0)
        d0 = jnp.clip(i + j, 0, tb.shape[0] - 1)
        i0 = jnp.clip(i, 0, tb.shape[1] - 1)
        c = jnp.where(alive, tb[d0, i0, lanes], 0).astype(jnp.int8)
        hb = c & 3
        in_h = alive & (state == 0)
        stop = in_h & (hb == 0)
        alive = alive & ~stop
        match = alive & (state == 0) & (hb == 1)
        rec_i = rec_i.at[step].set(jnp.where(match, i, -1))
        rec_j = rec_j.at[step].set(jnp.where(match, j, -1))
        to_e = alive & (state == 0) & (hb == 2)
        to_f = alive & (state == 0) & (hb == 3)
        state = jnp.where(to_e, 1, jnp.where(to_f, 2, state)).astype(jnp.int8)
        i = jnp.where(match, i - 1, i)
        j = jnp.where(match, j - 1, j)
        in_e = (alive & (state == 1) & ~to_e & ~match) | to_e
        in_f = (alive & (state == 2) & ~to_f & ~match) | to_f
        e_ext = (c & 4) != 0
        f_ext = (c & 8) != 0
        j = jnp.where(in_e, j - 1, j)
        state = jnp.where(in_e & ~e_ext, 0, state).astype(jnp.int8)
        i = jnp.where(in_f, i - 1, i)
        state = jnp.where(in_f & ~f_ext, 0, state).astype(jnp.int8)
        return (i, j, state, alive, rec_i, rec_j)

    carry = jax.lax.fori_loop(0, max_steps, body,
                              (i, j, state, alive, rec_i, rec_j))
    return scores, carry[4], carry[5]


def decode_local_tracebacks_device(tb, m, dat, q: int, t: int,
                                   nb: int | None = None):
    """Device decode + tiny host path extraction; same (scores, paths) as
    decode_local_tracebacks, asserted equal in tests/test_swaffine.py."""
    b = m.shape[1] if nb is None else nb
    scores, rec_i, rec_j = _decode_tb_device(tb, m, dat, q=q, t=t, b=b)
    scores = np.asarray(scores)
    rec_i = np.asarray(rec_i)
    rec_j = np.asarray(rec_j)
    paths = []
    for lane in range(b):
        msk = rec_i[:, lane] >= 0
        pi = rec_i[msk, lane][::-1]
        pj = rec_j[msk, lane][::-1]
        paths.append(list(zip(pi.tolist(), pj.tolist())))
    return scores, paths


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
    one-hot matmuls on the MXU.  sim_dtype=int8 is exact for integer
    substitution tables (BLOSUM fits [-128, 127]) and halves the HBM
    traffic of the skew + kernel passes."""
    a = table.shape[0]
    qoh = jax.nn.one_hot(q_codes, a, dtype=jnp.float32)      # (B, Q, A)
    toh = jax.nn.one_hot(t_codes, a, dtype=jnp.float32)      # (B, T, A)
    qt = jnp.einsum("bqa,ac->bqc", qoh, table.astype(jnp.float32),
                    preferred_element_type=jnp.float32)
    s = jnp.einsum("bqc,btc->bqt", qt, toh,
                   preferred_element_type=jnp.float32)
    return s.astype(sim_dtype)


@functools.partial(jax.jit, static_argnames=("sim_dtype",))
def skewed_similarity_from_codes(q_codes: jax.Array, t_codes: jax.Array,
                                 table: jax.Array,
                                 sim_dtype=jnp.float32) -> jax.Array:
    """Fused codes -> skewed similarity with the batch axis kept LAST
    throughout: (B, Q) x (B, T) -> (D, Qp, Bp).

    The einsum emits (Q, T, B) directly, so the subsequent diagonal-skew
    transpose only permutes the two leading (sublane-major) axes while the
    128-lane batch axis stays in place — no lane-crossing transpose, which
    is the expensive relayout in the (B, Q, T)-first formulation."""
    b, q = q_codes.shape
    t = t_codes.shape[1]
    a = table.shape[0]
    bp = _round_up(b, 128)
    qp = _round_up(q, 8)
    qoh = jax.nn.one_hot(q_codes, a, dtype=jnp.float32)      # (B, Q, A)
    toh = jax.nn.one_hot(t_codes, a, dtype=jnp.float32)      # (B, T, A)
    qt = jnp.einsum("bqa,ac->bqc", qoh, table.astype(jnp.float32),
                    preferred_element_type=jnp.float32)
    s = jnp.einsum("bqc,btc->qtb", qt, toh,
                   preferred_element_type=jnp.float32).astype(sim_dtype)
    s = jnp.pad(s, ((0, 0), (0, 0), (0, bp - b)))            # (Q, T, Bp)
    # diagonal skew via the pad/flatten/reshape trick, batch axis untouched:
    # row i of the (Q, W-1) view is shifted right by i, so [i, d] = S[i, d-i]
    w = q + t
    padded = jnp.pad(s, ((0, 0), (0, q), (0, 0)))            # (Q, W, Bp)
    flat = padded.reshape(q * w, bp)[: q * (w - 1)]
    sk = flat.reshape(q, w - 1, bp)                          # [i, d, b]
    sk = jnp.pad(sk, ((0, qp - q), (0, 0), (0, 0)))
    return jnp.transpose(sk, (1, 0, 2))                      # (D, Qp, Bp)


def sw_affine_batch(q_codes, t_codes, table, gi: float, ge: float,
                    sim_dtype=jnp.float32, fused_skew: bool = False):
    """End-to-end batched SW: codes -> similarity -> skew -> kernel.
    fused_skew=True routes through the batch-last skew (no lane-crossing
    transpose), the production configuration for large batches."""
    b, q = q_codes.shape
    t = t_codes.shape[1]
    if fused_skew:
        sd = skewed_similarity_from_codes(
            jnp.asarray(q_codes), jnp.asarray(t_codes), jnp.asarray(table),
            sim_dtype=sim_dtype)
    else:
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


@functools.partial(jax.jit, static_argnames=("q", "t"))
def sw_affine_tb_xla(sd: jax.Array, gap: jax.Array, *, q: int, t: int):
    """Pure-XLA twin of ``_sw_tb_kernel`` (lax.scan over skewed diagonals):
    emits bit-identical int8 traceback codes / running max / diagonal-of-max,
    so :func:`decode_local_tracebacks` works on any backend."""
    nd, qp, b = sd.shape
    gi = gap[0, 0]
    ge = gap[0, 1]
    ii = jax.lax.broadcasted_iota(jnp.int32, (qp, 1), 0)

    def shift_down(x):
        y = jnp.roll(x, 1, axis=0)
        return jnp.where(ii == 0, jnp.float32(0.0), y)

    def step(carry, inp):
        hm1, hm2, e, f, m, dat = carry
        d, s = inp
        s = s.astype(jnp.float32)
        jj = d - ii
        valid = (ii < q) & (jj >= 0) & (jj < t)
        e_open = hm1 - gi
        e_ext = e - ge
        e_new = jnp.maximum(e_ext, e_open)
        f_open = jnp.where(ii == 0, NEG, shift_down(hm1) - gi)
        f_ext = jnp.where(ii == 0, NEG, jnp.roll(f, 1, axis=0) - ge)
        f_new = jnp.maximum(f_ext, f_open)
        diag = shift_down(hm2) + s
        h_new = jnp.maximum(jnp.maximum(diag, jnp.float32(0.0)),
                            jnp.maximum(e_new, f_new))
        h_new = jnp.where(valid, h_new, jnp.float32(0.0))
        code = jnp.where(
            h_new == 0.0, 0,
            jnp.where(h_new == diag, 1, jnp.where(h_new == e_new, 2, 3)))
        code = code | jnp.where(e_ext > e_open, 4, 0)
        code = code | jnp.where(f_ext > f_open, 8, 0)
        code = jnp.where(valid, code, 0).astype(jnp.int8)
        upd = h_new > m
        dat = jnp.where(upd, jnp.int32(d), dat)
        m = jnp.where(upd, h_new, m)
        return (h_new, hm1, e_new, f_new, m, dat), code

    z = jnp.zeros((qp, b), jnp.float32)
    neg = jnp.full((qp, b), NEG, jnp.float32)
    di = jnp.zeros((qp, b), jnp.int32)
    (_, _, _, _, m, dat), tb = jax.lax.scan(
        step, (z, z, neg, neg, z, di), (jnp.arange(nd), sd))
    return tb, m, dat


def sw_affine_tb_batch(q_codes, t_codes, table, gi: float, ge: float,
                       sim_dtype=jnp.float32):
    """End-to-end batched local SW **with alignments**: codes -> skewed
    similarity -> traceback engine (Pallas kernel on TPU, XLA twin
    elsewhere) -> host decode.  Returns (scores (B,), paths) where paths[b]
    is the optimal local alignment's matched (query_idx, template_idx)
    0-based pairs — the batched device analogue of Optimal::enumerate
    (optimal.h:47-124)."""
    q_codes = jnp.asarray(q_codes)
    t_codes = jnp.asarray(t_codes)
    b, q = q_codes.shape
    t = t_codes.shape[1]
    sd = skewed_similarity_from_codes(q_codes, t_codes, jnp.asarray(table),
                                      sim_dtype=sim_dtype)
    gap = jnp.array([[gi, ge]], dtype=jnp.float32)
    if jax.devices()[0].platform == "tpu":
        tb, m, dat = sw_affine_tb_from_skewed(sd, gap, q=q, t=t)
    else:
        tb, m, dat = sw_affine_tb_xla(sd, gap, q=q, t=t)
    return decode_local_tracebacks_device(tb, m, dat, q, t, nb=b)


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
