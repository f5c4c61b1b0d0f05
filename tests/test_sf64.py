"""Softfloat binary64 / exact-f32 op tests (ops/sf64).

Ground truths:
- mul64/fma64: exact rational arithmetic (fractions.Fraction; CPython's
  Fraction->float conversion is correctly rounded).
- conversions: numpy astype (IEEE on the CPU host).
- div32/sqrt32: numpy float32 divide/sqrt (IEEE on the CPU host).
- expf32: the live libm expf (native/exactmath.c links the same libm the
  reference oracles use).  Sampled densely here; tools/validate_expf.py
  sweeps the full f32 domain |x| <= 8 exhaustively.
"""

from __future__ import annotations

import struct
from fractions import Fraction

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from alignment_algos_tpu.ops import sf64


def _pair_from_f64(x: np.ndarray):
    b = x.astype(np.float64).view(np.uint64)
    return (jnp.asarray((b >> 32).astype(np.uint32)),
            jnp.asarray((b & 0xFFFFFFFF).astype(np.uint32)))


def _f64_from_pair(hi, lo):
    b = (np.asarray(hi, np.uint64) << 32) | np.asarray(lo, np.uint64)
    return b.view(np.float64)


def _rand_f64(rng, n, emin=-300, emax=300):
    m = rng.uniform(1.0, 2.0, n)
    e = rng.integers(emin, emax, n)
    s = rng.choice([-1.0, 1.0], n)
    return (s * m * np.exp2(e)).astype(np.float64)


def test_f32_f64_roundtrip():
    rng = np.random.default_rng(0)
    vals = np.concatenate([
        rng.uniform(-1e30, 1e30, 20000).astype(np.float32),
        rng.normal(0, 1, 20000).astype(np.float32),
        np.array([0.0, -0.0, 1.0, -1.0, 1e-44, -1e-44, 1.17549e-38,
                  np.float32(2**-149), np.float32(88.7), -88.7],
                 np.float32),
    ])
    bits = jnp.asarray(vals.view(np.uint32))
    hi, lo = jax.jit(sf64.f32_to_f64)(bits)
    got = _f64_from_pair(np.asarray(hi), np.asarray(lo))
    exp = vals.astype(np.float64)
    assert (got.view(np.uint64) == exp.view(np.uint64)).all()

    # narrowing: random f64 in f32-normal range, incl. round/tie patterns
    w = _rand_f64(rng, 50000, -120, 120)
    # force some exact-tie low halves
    wb = w.view(np.uint64).copy()
    wb[::7] = (wb[::7] & ~np.uint64(0x1FFFFFFF)) | np.uint64(0x10000000)
    wb[::11] = wb[::11] & ~np.uint64(0x1FFFFFFF)
    w = wb.view(np.float64)
    hi = jnp.asarray((wb >> 32).astype(np.uint32))
    lo = jnp.asarray((wb & 0xFFFFFFFF).astype(np.uint32))
    got32 = np.asarray(jax.jit(sf64.f64_to_f32)(hi, lo))
    exp32 = w.astype(np.float32).view(np.uint32)
    assert (got32 == exp32).all()


def test_mul64_random():
    rng = np.random.default_rng(1)
    a = _rand_f64(rng, 50000)
    b = _rand_f64(rng, 50000)
    hi, lo = jax.jit(sf64.mul64)(_pair_from_f64(a), _pair_from_f64(b))
    got = _f64_from_pair(np.asarray(hi), np.asarray(lo))
    exp = a * b  # numpy f64 multiply is IEEE correctly rounded
    assert (got.view(np.uint64) == exp.view(np.uint64)).all()


def test_mul64_zero():
    a = np.array([0.0, 3.5, 0.0, -2.0], np.float64)
    b = np.array([2.5, 0.0, 0.0, 7.25], np.float64)
    hi, lo = jax.jit(sf64.mul64)(_pair_from_f64(a), _pair_from_f64(b))
    got = _f64_from_pair(np.asarray(hi), np.asarray(lo))
    assert (got == a * b).all()


def _fma_ref(a, b, c):
    f = Fraction(a) * Fraction(b) + Fraction(c)
    return float(f)


def test_fma64_cases():
    rng = np.random.default_rng(2)
    cases = []
    # generic
    a = _rand_f64(rng, 2000, -40, 40)
    b = _rand_f64(rng, 2000, -40, 40)
    c = _rand_f64(rng, 2000, -80, 80)
    cases += list(zip(a, b, c))
    # cancellation: c ~= -a*b
    a2 = _rand_f64(rng, 2000, -30, 30)
    b2 = _rand_f64(rng, 2000, -30, 30)
    prod = a2 * b2
    pb = prod.view(np.uint64) + rng.integers(-4, 5, 2000).astype(np.int64
                                                                 ).view(
        np.uint64)
    c2 = -pb.view(np.float64)
    cases += list(zip(a2, b2, c2))
    # far addend both ways
    a3 = _rand_f64(rng, 1000, -10, 10)
    b3 = _rand_f64(rng, 1000, -10, 10)
    c3 = _rand_f64(rng, 1000, 80, 200)
    cases += list(zip(a3, b3, c3))
    c4 = _rand_f64(rng, 1000, -300, -150)
    cases += list(zip(a3, b3, c4))
    # threshold region around the far-c shortcut (ec - E ~ 56)
    for d in range(50, 62):
        a5 = _rand_f64(rng, 200, -2, 2)
        b5 = _rand_f64(rng, 200, -2, 2)
        c5 = _rand_f64(rng, 200, d, d + 1)
        cases += list(zip(a5, b5, c5))
        cases += list(zip(a5, b5, -c5))
    # zeros
    cases += [(0.0, 1.5, 2.5), (1.5, 0.0, -2.5), (1.5, 2.5, 0.0),
              (0.0, 0.0, 0.0), (0.0, 0.0, 3.25)]

    A = np.array([x[0] for x in cases], np.float64)
    B = np.array([x[1] for x in cases], np.float64)
    C = np.array([x[2] for x in cases], np.float64)
    hi, lo = jax.jit(sf64.fma64)(_pair_from_f64(A), _pair_from_f64(B),
                                 _pair_from_f64(C))
    got = _f64_from_pair(np.asarray(hi), np.asarray(lo))
    bad = 0
    for i, (x, y, z) in enumerate(cases):
        exp = _fma_ref(x, y, z)
        if struct.pack("<d", got[i]) != struct.pack("<d", exp):
            bad += 1
            if bad < 8:
                print(f"fma mismatch: {x!r}*{y!r}+{z!r} -> got {got[i]!r} "
                      f"want {exp!r}")
    assert bad == 0, f"{bad}/{len(cases)} fma mismatches"


def test_expf_matches_libm():
    from alignment_algos_tpu.native import expf as libm_expf

    rng = np.random.default_rng(3)
    xs = np.concatenate([
        rng.uniform(-4, 4, 300000).astype(np.float32),
        rng.uniform(-0.7, 0.7, 300000).astype(np.float32),
        rng.uniform(-1e-3, 1e-3, 100000).astype(np.float32),
        rng.uniform(-80, 80, 50000).astype(np.float32),
        (rng.uniform(-1, 1, 50000) * np.exp2(
            rng.integers(-140, 3, 50000))).astype(np.float32),
        np.array([0.0, -0.0, 2**-149, -2**-149, 2**-126, -2**-126,
                  0.5, -0.5, 1.0, -1.0, 87.0, -86.0], np.float32),
    ])
    got = np.asarray(jax.jit(sf64.expf32)(jnp.asarray(xs)))
    exp = libm_expf(xs)
    mism = got.view(np.uint32) != exp.view(np.uint32)
    if mism.any():
        idx = np.where(mism)[0][:8]
        for i in idx:
            print(f"expf mismatch at x={xs[i]!r}: got {got[i]!r} "
                  f"want {exp[i]!r}")
    assert not mism.any(), f"{int(mism.sum())}/{len(xs)} expf mismatches"


def test_div32_matches_ieee():
    rng = np.random.default_rng(4)
    a = np.concatenate([
        (rng.uniform(-2, 2, 400000) * np.exp2(
            rng.integers(-30, 30, 400000))).astype(np.float32),
        np.zeros(100, np.float32),
    ])
    b = np.concatenate([
        (rng.uniform(0.5, 2, 400000) * np.exp2(
            rng.integers(-30, 30, 400000))).astype(np.float32),
        rng.uniform(0.5, 2, 100).astype(np.float32),
    ])
    got = np.asarray(jax.jit(sf64.div32)(
        jnp.asarray(a.view(np.uint32)), jnp.asarray(b.view(np.uint32))))
    exp = (a / b).view(np.uint32)
    mism = got != exp
    if mism.any():
        idx = np.where(mism)[0][:8]
        for i in idx:
            print(f"div mismatch {a[i]!r}/{b[i]!r}: got "
                  f"{got[i].view(np.float32) if hasattr(got[i],'view') else got[i]}"
                  f" want {(a[i]/b[i])!r}")
    assert not mism.any(), f"{int(mism.sum())} div mismatches"


def test_div32_near_ties():
    # construct quotients that land exactly on or next to rounding
    # boundaries: a = fl(b * q_mid) for q_mid halfway between two f32s
    rng = np.random.default_rng(5)
    mb = rng.integers(1 << 23, 1 << 24, 20000).astype(np.uint64)
    qm = rng.integers(1 << 23, 1 << 24, 20000).astype(np.uint64)
    # a_int = mb * (2*qm + 1): quotient a/b = (qm + 0.5) * 2^1 exactly
    a_int = mb * (2 * qm + 1)
    a = a_int.astype(np.float64)  # may round; fine — still near the tie
    af = a.astype(np.float32)
    bf = mb.astype(np.float32)
    got = np.asarray(jax.jit(sf64.div32)(
        jnp.asarray(af.view(np.uint32)), jnp.asarray(bf.view(np.uint32))))
    exp = (af / bf).view(np.uint32)
    assert (got == exp).all()


def test_sqrt32_matches_ieee():
    rng = np.random.default_rng(6)
    v = np.concatenate([
        (rng.uniform(0.25, 4, 400000) * np.exp2(
            rng.integers(-60, 60, 400000))).astype(np.float32),
        np.zeros(10, np.float32),
        # perfect squares and neighbours
        (np.arange(1, 30000, dtype=np.float64) ** 2).astype(np.float32),
    ])
    got = np.asarray(jax.jit(sf64.sqrt32)(jnp.asarray(v.view(np.uint32))))
    exp = np.sqrt(v).view(np.uint32)
    mism = got != exp
    if mism.any():
        idx = np.where(mism)[0][:8]
        for i in idx:
            print(f"sqrt mismatch v={v[i]!r}: got {got[i]} want {exp[i]}")
    assert not mism.any(), f"{int(mism.sum())} sqrt mismatches"
