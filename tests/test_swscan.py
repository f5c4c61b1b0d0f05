"""Row-scan prefix-max SW kernel: bit-parity with the Gotoh engines
(Pallas interpret mode on the CPU test backend; real-chip Mosaic parity is
covered by tests/test_tpu_hardware.py).  Integer tables only — that is the
engine's exactness gate (ops/swscan.py docstring)."""

import numpy as np
import pytest
import jax.numpy as jnp

from alignment_algos_tpu.ops import swaffine, swscan


def _interp():
    from jax.experimental.pallas import tpu as pltpu
    return pltpu.force_tpu_interpret_mode()


@pytest.mark.parametrize("q,t,b,strategy,seed", [
    (32, 32, 5, "lvl", 0),
    (40, 24, 3, "lvl", 1),     # padded q and t
    (16, 48, 4, "lvl", 2),
    (13, 29, 2, "lvl", 3),     # tiny odd shapes, single carry chunk
    (32, 32, 5, "dbl", 4),     # doubling fallback strategy
])
def test_rowscan_bit_equal_gotoh(q, t, b, strategy, seed):
    rng = np.random.default_rng(seed)
    qc = jnp.asarray(rng.integers(0, 20, (b, q)), jnp.int32)
    tc = jnp.asarray(rng.integers(0, 20, (b, t)), jnp.int32)
    table = jnp.asarray(rng.integers(-6, 12, (20, 20)).astype(np.float32))
    gi, ge = 11.0, 1.0
    ref = np.asarray(swaffine.sw_affine_batch_xla(qc, tc, table, gi, ge))
    with _interp():
        got = np.asarray(swscan.sw_rowscan_batch(
            qc, tc, table, gi, ge, sim_dtype=jnp.float32,
            strategy=strategy))
    np.testing.assert_array_equal(got, ref)


def test_rowscan_screen_shape_bit_equal():
    rng = np.random.default_rng(7)
    q, t, nlib = 24, 40, 6
    qc = jnp.asarray(rng.integers(0, 20, q), jnp.int32)
    lib = jnp.asarray(rng.integers(0, 20, (nlib, t)), jnp.int32)
    table = jnp.asarray(rng.integers(-6, 12, (20, 20)).astype(np.float32))
    gi, ge = 8.0, 2.0
    qb = jnp.broadcast_to(qc[None, :], (nlib, q))
    ref = np.asarray(swaffine.sw_affine_batch_xla(qb, lib, table, gi, ge))
    with _interp():
        got = np.asarray(swscan.sw_rowscan_screen(
            qc, lib, table, gi, ge, sim_dtype=jnp.float32))
    np.testing.assert_array_equal(got, ref)


def test_similarity_producers_agree():
    rng = np.random.default_rng(9)
    q, t, b = 20, 18, 3
    qc = rng.integers(0, 20, (b, q)).astype(np.int32)
    tc = rng.integers(0, 20, (b, t)).astype(np.int32)
    table = rng.integers(-6, 12, (20, 20)).astype(np.float32)
    sim = np.asarray(swscan.rowscan_similarity_from_codes(
        jnp.asarray(qc), jnp.asarray(tc), jnp.asarray(table)))
    for bi in range(b):
        for i in range(q):
            for j in range(t):
                assert sim[i, j, bi] == table[qc[bi, i], tc[bi, j]]
    # screen producer, int8 MXU path == f32 path for integer tables
    qs = qc[0]
    s8 = np.asarray(swscan.rowscan_similarity_screen(
        jnp.asarray(qs), jnp.asarray(tc), jnp.asarray(table),
        sim_dtype=jnp.int8))
    sf = np.asarray(swscan.rowscan_similarity_screen(
        jnp.asarray(qs), jnp.asarray(tc), jnp.asarray(table),
        sim_dtype=jnp.float32))
    np.testing.assert_array_equal(s8.astype(np.float32), sf)


def test_supported_gate():
    tbl_int = np.asarray(
        np.random.default_rng(0).integers(-8, 12, (20, 20)), np.float32)
    assert swscan.supported(tbl_int, 11.0, 1.0, 512, 512, 512)
    # non-integer table
    assert not swscan.supported(tbl_int + 0.5, 11.0, 1.0, 512, 512, 512)
    # ge > gi violates the prefix-max lemma
    assert not swscan.supported(tbl_int, 1.0, 2.0, 512, 512, 512)
    # non-integer gap
    assert not swscan.supported(tbl_int, 10.5, 1.0, 512, 512, 512)
    # VMEM blow-up
    assert not swscan.supported(tbl_int, 11.0, 1.0, 512, 4096, 4096)


def test_rowscan_gi_equals_ge_boundary():
    """The prefix-max lemma requires gi >= ge; equality is the boundary
    case (E - gi == E - ge) and must stay bit-equal."""
    rng = np.random.default_rng(31)
    q, t, b = 24, 40, 3
    qc = jnp.asarray(rng.integers(0, 20, (b, q)), jnp.int32)
    tc = jnp.asarray(rng.integers(0, 20, (b, t)), jnp.int32)
    table = jnp.asarray(rng.integers(-6, 12, (20, 20)).astype(np.float32))
    gi = ge = 3.0
    ref = np.asarray(swaffine.sw_affine_batch_xla(qc, tc, table, gi, ge))
    with _interp():
        got = np.asarray(swscan.sw_rowscan_batch(
            qc, tc, table, gi, ge, sim_dtype=jnp.float32))
    np.testing.assert_array_equal(got, ref)
