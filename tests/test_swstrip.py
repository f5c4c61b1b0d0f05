"""Strip-mined batched SW kernel: bit-parity with the monolithic engines
(runs in Pallas interpret mode on the CPU test backend; on TPU the same
code compiles to Mosaic — covered by tests/test_tpu_hardware.py)."""

import numpy as np
import pytest
import jax.numpy as jnp

from alignment_algos_tpu.ops import swaffine, swstrip


def _interp():
    from jax.experimental.pallas import tpu as pltpu
    return pltpu.force_tpu_interpret_mode()


def test_strip_skew_layout():
    rng = np.random.default_rng(0)
    b, q, t = 2, 20, 13
    qc = rng.integers(0, 20, (b, q))
    tc = rng.integers(0, 20, (b, t))
    table = rng.integers(-4, 12, (20, 20)).astype(np.float32)
    sd = np.asarray(swstrip.strip_skewed_similarity_from_codes(
        jnp.asarray(qc), jnp.asarray(tc), jnp.asarray(table),
        strip=16, kd=8, sim_dtype=jnp.float32))
    ns, dsp, sp, bp = sd.shape
    assert (ns, sp, bp) == (2, 16, 128) and dsp % 8 == 0
    for bi in range(b):
        for i in range(q):
            for j in range(t):
                v = table[qc[bi, i], tc[bi, j]]
                assert sd[i // 16, (i % 16) + j, i % 16, bi] == v


@pytest.mark.parametrize("q,t,strip,kd,uf,seed", [
    (32, 32, 16, 8, 2, 0),     # square, strips exact
    (40, 24, 16, 8, 4, 1),     # q not a strip multiple (padded last strip)
    (16, 48, 16, 8, 2, 2),     # single strip (boundary buffers unused)
    (48, 16, 16, 8, 2, 3),     # tall: many strips, short template
])
def test_striped_scores_bit_equal_monolithic(q, t, strip, kd, uf, seed):
    rng = np.random.default_rng(seed)
    b = 5
    qc = jnp.asarray(rng.integers(0, 20, (b, q)), jnp.int32)
    tc = jnp.asarray(rng.integers(0, 20, (b, t)), jnp.int32)
    table = jnp.asarray(rng.integers(-4, 12, (20, 20)).astype(np.float32))
    gi, ge = 11.0, 1.0
    gap = jnp.array([[gi, ge]], dtype=jnp.float32)

    sd_mono = swaffine.skewed_similarity_from_codes(qc, tc, table)
    ref = np.asarray(swaffine.sw_affine_scores_xla(sd_mono, gap, q=q, t=t))

    sd = swstrip.strip_skewed_similarity_from_codes(qc, tc, table,
                                                    strip=strip, kd=kd)
    with _interp():
        got = np.asarray(swstrip.sw_affine_scores_striped(
            sd, gap, q=q, t=t, strip=strip, kd=kd, uf=uf))
    np.testing.assert_array_equal(got[:b], ref[:b])

    # and against the plain numpy Gotoh oracle
    s = np.asarray(swaffine.similarity_from_codes(qc, tc, table))
    oracle = swaffine.sw_affine_reference(s, gi, ge)
    np.testing.assert_array_equal(got[:b], oracle)


def test_striped_screen_shape_bit_equal():
    """One-query-vs-library producer (single MXU matmul) must reproduce
    the batched engine's scores bit-for-bit."""
    rng = np.random.default_rng(13)
    b, q, t = 7, 40, 24
    qc1 = rng.integers(0, 20, (q,))
    tc = rng.integers(0, 20, (b, t))
    table = rng.integers(-4, 12, (20, 20)).astype(np.float32)
    with _interp():
        got = np.asarray(swstrip.sw_affine_screen_striped(
            qc1, tc, table, 11.0, 1.0, strip=16, kd=8, uf=2))
        ref = np.asarray(swstrip.sw_affine_batch_striped(
            np.broadcast_to(qc1, (b, q)), tc, table, 11.0, 1.0,
            strip=16, kd=8, uf=2))
    np.testing.assert_array_equal(got, ref)


def test_striped_end_to_end_int8():
    rng = np.random.default_rng(7)
    b, q, t = 3, 40, 40
    qc = rng.integers(0, 20, (b, q))
    tc = rng.integers(0, 20, (b, t))
    table = rng.integers(-4, 12, (20, 20)).astype(np.float32)
    with _interp():
        got = np.asarray(swstrip.sw_affine_batch_striped(
            qc, tc, table, 11.0, 1.0, strip=16, kd=8, uf=2))
    s = np.asarray(swaffine.similarity_from_codes(
        jnp.asarray(qc), jnp.asarray(tc), jnp.asarray(table)))
    oracle = swaffine.sw_affine_reference(s, 11.0, 1.0)
    np.testing.assert_array_equal(got, oracle)
