"""Device-mesh library screening (the scale-out layer; net-new design —
the reference is single-threaded, SURVEY.md section 2.10).

A template library is sharded over the mesh's data-parallel axis; every
device runs the batched affine-SW wavefront engine over its shard; per-shard
top-K results merge via an all-gather (a replicated-output top_k forces the
collective) with deterministic tie-breaking (score descending, then template
id ascending — mirroring sortSet's stable ranking semantics).

Works on any jax.sharding.Mesh: 8 virtual CPU devices in tests, ICI-linked
chips on a pod slice in production.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import swaffine


def default_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None and len(devs) < n_devices:
        devs = jax.devices("cpu")
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), axis_names=(axis,))


def _put(mesh: Mesh, arr, spec) -> jax.Array:
    """Place a host-replicated numpy array onto the mesh with the given
    PartitionSpec.  Uses make_array_from_callback, which works identically
    in single-process and multi-process (jax.distributed) runs: every
    process passes the same full array and contributes only the shards its
    local devices own."""
    sh = NamedSharding(mesh, spec)
    arr = np.asarray(arr)
    return jax.make_array_from_callback(arr.shape, sh, lambda idx: arr[idx])


def _pad_library(t_codes: np.ndarray, shards: int):
    """Pad the library to a multiple of the shard count with sentinel rows."""
    n = t_codes.shape[0]
    padded = -(-n // shards) * shards
    if padded != n:
        pad = np.zeros((padded - n, t_codes.shape[1]), dtype=t_codes.dtype)
        t_codes = np.concatenate([t_codes, pad], axis=0)
    return t_codes, n


@functools.partial(jax.jit, static_argnames=("q", "t", "k", "engine",
                                             "int8_sim"))
def _screen_step(q_codes, t_codes, table, gap, valid_mask, *, q: int, t: int,
                 k: int, engine: str, int8_sim: bool = False):
    b = t_codes.shape[0]
    if engine == "rowscan":
        # row-scan prefix-max engine (ops/swscan, round 4): consumes the
        # one-matmul (Q, T, B) similarity directly — no skew/transpose
        # passes; e2e rate == kernel rate.  Integer tables only (the
        # caller gates via swscan.supported)
        from ..ops import swscan
        sim = swscan.rowscan_similarity_screen(
            q_codes, t_codes, table,
            sim_dtype=jnp.int8 if int8_sim else jnp.float32)
        scores = swscan.sw_rowscan_scores(sim, gap, q=q, t=t)[:b]
    elif engine == "strip":
        # strip-mined wavefront engine (ops/swstrip, round 3): ~89% band
        # occupancy; kept for non-integral tables on TPU
        from ..ops import swstrip
        sd = swstrip.strip_skewed_similarity_screen(
            q_codes, t_codes, table,
            sim_dtype=jnp.int8 if int8_sim else jnp.float32)
        scores = swstrip.sw_affine_scores_striped(sd, gap, q=q, t=t)[:b]
    else:
        qb = jnp.broadcast_to(q_codes[None, :], (b, q))
        s = swaffine.similarity_from_codes(qb, t_codes, table)
        sd = swaffine.skew_similarity(s)
        scores = swaffine.sw_affine_scores_xla(sd, gap, q=q, t=t)[:b]
    scores = jnp.where(valid_mask, scores, jnp.float32(-3e38))
    # deterministic top-k: score desc, ties by library index asc.
    # top_k is stable on equal keys (returns lower indices first).
    topk_scores, topk_idx = jax.lax.top_k(scores, k)
    # replicate the merged result on every device (and every process in a
    # multi-host run): this is the all-gather over the library shards
    topk_scores = jax.lax.with_sharding_constraint(topk_scores, P())
    topk_idx = jax.lax.with_sharding_constraint(topk_idx, P())
    return topk_scores, topk_idx


def _pick_engine(engine, table, gi, ge, q, t, b_shard, mesh) -> str:
    """Resolve the per-chip engine: "rowscan" (round-4 default when the
    exactness gate passes), "strip" (wavefront fallback incl. non-integer
    tables), or "xla" (portable scan twin, also the non-TPU path).  An
    explicit engine always wins (round-3 advisor: no un-overridable
    platform checks).  The decision keys on the MESH's device platform,
    not the process default — this deployment's sitecustomize can leave a
    TPU as the default backend while the mesh is the virtual CPU one
    (the driver's multichip dryrun), where a Pallas engine cannot run."""
    if engine is not None:
        return engine
    if mesh.devices.flat[0].platform != "tpu":
        return "xla"
    from ..ops import swscan, swstrip
    if swscan.supported(table, gi, ge, q, t, b_shard):
        return "rowscan"
    if swstrip.vmem_ok(q, t, b_shard):
        return "strip"
    return "xla"


def screen_library(q_codes: np.ndarray, t_codes: np.ndarray,
                   table: np.ndarray, gi: float, ge: float, k: int = 10,
                   mesh: Mesh | None = None, use_pallas: bool | None = None,
                   engine: str | None = None):
    """One query against a sharded template library.

    q_codes: (Q,) int codes; t_codes: (N, T) int codes (padded per template);
    returns (scores, indices) of the global top-k, identical on every host.
    engine: None = auto (see _pick_engine), or "rowscan"/"strip"/"xla";
    use_pallas is the legacy alias (False forces "xla").
    """
    if mesh is None:
        mesh = default_mesh()
    axis = mesh.axis_names[0]
    shards = mesh.devices.size
    if engine is None and use_pallas is not None:
        engine = None if use_pallas else "xla"

    t_codes, n_real = _pad_library(np.asarray(t_codes, dtype=np.int32), shards)
    q = int(np.asarray(q_codes).shape[0])
    t = int(t_codes.shape[1])
    k = min(k, n_real)
    engine = _pick_engine(engine, table, gi, ge, q, t,
                          t_codes.shape[0] // shards, mesh)

    t_dev = _put(mesh, t_codes, P(axis, None))
    q_dev = _put(mesh, np.asarray(q_codes, np.int32), P())
    table_dev = _put(mesh, np.asarray(table, np.float32), P())
    gap = _put(mesh, np.array([[gi, ge]], np.float32), P())
    valid = _put(mesh, np.arange(t_codes.shape[0]) < n_real, P(axis))

    tbl = np.asarray(table)
    int8_sim = bool(np.all(tbl == np.round(tbl)) and np.abs(tbl).max() < 127)
    with mesh:
        scores, idx = _screen_step(q_dev, t_dev, table_dev, gap, valid,
                                   q=q, t=t, k=k, engine=engine,
                                   int8_sim=int8_sim)
    return np.asarray(scores), np.asarray(idx)


def grid_mesh(shape: tuple[int, int], axes=("qb", "lib")) -> Mesh:
    """2-D mesh: query batches on one axis, library shards on the other."""
    n = shape[0] * shape[1]
    devs = jax.devices()
    if len(devs) < n:
        devs = jax.devices("cpu")
    return Mesh(np.array(devs[:n]).reshape(shape), axis_names=axes)


@functools.partial(jax.jit, static_argnames=("q", "t", "k"))
def _grid_step(q_codes, t_codes, table, gap, valid, *, q: int, t: int, k: int):
    """All-pairs scores on a 2-D mesh: GSPMD partitions the (nq, nt, ...)
    intermediates along both mesh axes; the per-query top-k produces the
    replicated cross-shard merge."""

    def one_query(qc):
        b = t_codes.shape[0]
        qb = jnp.broadcast_to(qc[None, :], (b, q))
        s = swaffine.similarity_from_codes(qb, t_codes, table)
        sd = swaffine.skew_similarity(s)
        return swaffine.sw_affine_scores_xla(sd, gap, q=q, t=t)[:b]

    scores = jax.vmap(one_query)(q_codes)          # (nq, nt)
    masked = jnp.where(valid[None, :], scores, jnp.float32(-3e38))
    topk_scores, topk_idx = jax.lax.top_k(masked, k)
    return scores, topk_scores, topk_idx


def _grid_scores_tpu(mesh, qd, td, tab, gap, *, q: int, t: int,
                     int8_sim: bool, engine: str):
    """TPU all-pairs scores: shard_map over the (qb, lib) mesh, each device
    scanning its local query block against its local library shard through
    the selected per-chip engine — queries stay parallel ACROSS the mesh
    (a bare lax.scan over a qb-sharded axis would serialize and force a
    gather) while each device amortizes its dispatch over its whole
    block."""
    from ..ops import swscan, swstrip
    qb_ax, lib_ax = mesh.axis_names
    sim_dtype = jnp.int8 if int8_sim else jnp.float32

    def local_block(qblk, tblk, tbl, gp):
        bloc = tblk.shape[0]
        toh = (swscan.library_onehot(tblk, tbl.shape[0],
                                     sim_dtype=sim_dtype)
               if engine == "rowscan" else None)

        def body(_, qc):
            if engine == "rowscan":
                sim = swscan.rowscan_similarity_screen(qc, tblk, tbl,
                                                       sim_dtype=sim_dtype,
                                                       toh=toh)
                sc = swscan.sw_rowscan_scores(sim, gp, q=q, t=t)[:bloc]
            else:
                sd = swstrip.strip_skewed_similarity_screen(
                    qc, tblk, tbl, sim_dtype=sim_dtype)
                sc = swstrip.sw_affine_scores_striped(sd, gp, q=q,
                                                      t=t)[:bloc]
            return 0, sc
        _, sc = jax.lax.scan(body, 0, qblk)
        return sc                                   # (nq_loc, nt_loc)

    fn = jax.shard_map(local_block, mesh=mesh,
                       in_specs=(P(qb_ax, None), P(lib_ax, None), P(), P()),
                       out_specs=P(qb_ax, lib_ax),
                       check_vma=False)  # pallas outputs carry no vma info
    return jax.jit(fn)(qd, td, tab, gap)


@functools.partial(jax.jit, static_argnames=("k",))
def _grid_topk(scores, valid, *, k: int):
    masked = jnp.where(valid[None, :], scores, jnp.float32(-3e38))
    return jax.lax.top_k(masked, k)


def screen_grid(q_codes: np.ndarray, t_codes: np.ndarray, table: np.ndarray,
                gi: float, ge: float, k: int = 5,
                mesh: Mesh | None = None, engine: str | None = None):
    """Many queries x sharded library on a 2-D (qb, lib) mesh.

    Returns (scores (nq, nt), topk_scores (nq, k), topk_idx (nq, k)).
    engine: None = auto per _pick_engine; "rowscan"/"strip" force a TPU
    kernel, "xla" forces the portable scan path on any platform.
    """
    if mesh is None:
        mesh = grid_mesh((1, max(1, len(jax.devices()))))
    qb_ax, lib_ax = mesh.axis_names
    q_codes = np.asarray(q_codes, dtype=np.int32)
    t_codes = np.asarray(t_codes, dtype=np.int32)
    nq, q = q_codes.shape
    nt, t = t_codes.shape
    k = min(k, nt)

    # pad both batch axes to the mesh extents; padded library rows are
    # masked out of the top-k, padded query rows dropped on return
    q_codes_p, _ = _pad_library(q_codes, int(mesh.shape[qb_ax]))
    t_codes_p, _ = _pad_library(t_codes, int(mesh.shape[lib_ax]))

    q_sh = NamedSharding(mesh, P(qb_ax, None))
    t_sh = NamedSharding(mesh, P(lib_ax, None))
    repl = NamedSharding(mesh, P())
    qd = jax.device_put(jnp.asarray(q_codes_p), q_sh)
    td = jax.device_put(jnp.asarray(t_codes_p), t_sh)
    tab = jax.device_put(jnp.asarray(table, dtype=jnp.float32), repl)
    gap = jax.device_put(jnp.array([[gi, ge]], dtype=jnp.float32), repl)
    valid = jax.device_put(jnp.arange(t_codes_p.shape[0]) < nt,
                           NamedSharding(mesh, P(lib_ax)))
    engine = _pick_engine(engine, table, gi, ge, q, t,
                          t_codes_p.shape[0] // int(mesh.shape[lib_ax]),
                          mesh)
    with mesh:
        if engine in ("rowscan", "strip"):
            tblh = np.asarray(table)
            int8_sim = bool(np.all(tblh == np.round(tblh))
                            and np.abs(tblh).max() < 127)
            scores = _grid_scores_tpu(mesh, qd, td, tab, gap, q=q, t=t,
                                      int8_sim=int8_sim, engine=engine)
            ts, ti = _grid_topk(scores, valid, k=k)
        else:
            scores, ts, ti = _grid_step(qd, td, tab, gap, valid,
                                        q=q, t=t, k=k)
    return (np.asarray(scores)[:nq, :nt], np.asarray(ts)[:nq],
            np.asarray(ti)[:nq])


def _sharded_bucket_scores(batch, engine: str, mesh: Mesh,
                           local: bool = False) -> np.ndarray:
    """Optimal global scores for one same-shape bucket of cost models,
    sharded over the mesh's first axis with shard_map: every device runs
    the exact engine (dp_pallas on TPU, the lax.scan engine elsewhere) on
    its slice of the batch; the gathered scores are bit-identical to a
    single-device run because each pair's computation is unchanged —
    sharding only partitions the batch axis."""
    from jax import shard_map

    from ..ops import dp_engine, dp_pallas, dp_scores

    axis = mesh.axis_names[0]
    ndev = int(mesh.devices.size)
    n = len(batch)
    npad = -(-n // ndev) * ndev
    batch_p = list(batch) + [batch[0]] * (npad - n)
    q2, t2 = batch[0].q_size, batch[0].t_size
    q0, t0, q1, t1 = 0, 0, q2 - 1, t2 - 1

    if engine == "pallas" and dp_pallas.supported(batch[0]):
        tabs = [dp_pallas._host_tables(c, q0, q1, t0, t1) for c in batch_p]
        args = (np.stack([c.S for c in batch_p]),
                np.stack([c.D for c in batch_p]),
                np.stack([tb[0] for tb in tabs]),
                np.stack([tb[1][:, None] for tb in tabs]),
                np.stack([tb[2][:, None] for tb in tabs]),
                np.stack([tb[3][None, :] for tb in tabs]))

        def local_fn(S, D, Cm, i0, ic, dc):
            H = dp_pallas._dp_pallas_batched(S, D, Cm, i0, ic, dc, q0=q0,
                                             q1=q1, t0=t0, t1=t1, local=local)
            return H[:, q1, t1]
    else:
        d = np.arange(-(q2 - 1), q2 + 1, dtype=np.int64)
        ii = np.arange(q2, dtype=np.int64)
        zero_head = bool(batch[0].ins_zero_head_q)
        zero_tail = bool(batch[0].ins_zero_tail_q)
        S_b, D_b, Cp_b, i0_b, ic_b = [], [], [], [], []
        for c in batch_p:
            Cpad = (c.A[None, :] + c.B[None, :]
                    * (d[:, None] - c.ins_dist_offset).astype(np.float32)
                    ).astype(np.float32)
            if c.C is not None:
                Cpad = (Cpad + c.C[None, :].astype(np.float32)
                        ).astype(np.float32)
            Cpad[d < 2] = 0.0
            ins0 = c.ins_cost_of_dist(ii - q0, t0 + 1)
            if zero_head:
                ins0 = np.zeros_like(ins0)
            ins_close = c.ins_cost_of_dist(q1 - ii, t1)
            if zero_tail:
                ins_close = np.zeros_like(ins_close)
            S_b.append(c.S)
            D_b.append(c.D)
            Cp_b.append(Cpad[::-1].copy())
            i0_b.append(ins0)
            ic_b.append(ins_close)
        args = tuple(np.stack(x) for x in (S_b, D_b, Cp_b, i0_b, ic_b))

        def local_fn(S, D, CpadR, ins0, insc):
            H, _, _, _, _ = dp_engine._dp_forward_batched(
                S, D, CpadR, ins0, insc, q0=q0, q1=q1, t0=t0, t1=t1,
                local=local, zero_head=zero_head, zero_tail=zero_tail)
            return H[:, q1, t1]

    fn = shard_map(local_fn, mesh=mesh,
                   in_specs=tuple(P(axis) for _ in args),
                   out_specs=P(axis))
    with mesh:
        scores = np.asarray(jax.jit(fn)(*(jnp.asarray(a) for a in args)))
    return scores[:n]


def screen_profiles(query, templates, evaluator_factory, k: int = 10,
                    engine: str | None = None, mesh: Mesh | None = None):
    """Exact-scoring profile screen: one HMAP query against a list of
    template profiles, with reference scoring (bit-equal to per-pair
    DPMatrix builds).  Templates are bucketed by length (the engines
    require same-shape cost models per batch).

    engine: "pallas" = the exact general-gap Pallas kernel (ops/dp_pallas,
    the TPU fast path; scores only), "xla" = the lax.scan engine
    (ops/dp_engine, traceback-capable), None = pallas on TPU (falling back
    per-bucket when a pair exceeds the kernel's VMEM capacity), xla
    elsewhere.

    mesh: shard each shape bucket over the mesh's first axis (shard_map;
    per-shard exact scoring, bit-identical to single-device).  None = one
    device.

    evaluator_factory(query, templ) -> evaluator with build_costs().
    Returns (scores, order) — optimal global scores and the top-k template
    indices (score desc, index asc).
    """
    from ..ops import dp_engine, dp_pallas, dp_scores

    if engine is None:
        plat = (mesh.devices.flat[0].platform if mesh is not None
                else jax.devices()[0].platform)
        engine = "pallas" if plat == "tpu" else "xla"
        # round 5: HMAP-family evaluators route to the device similarity
        # producer (ops/hmap_device) — no Q*T host->device transfer, no
        # host cost build; bit-identical scores (tests/test_hmap_device)
        if engine == "pallas" and mesh is None and templates:
            from ..scoring.hmap2_eval import Hmap2Eval
            from ..scoring.hmap_eval import HMAPaliEval
            ev0 = evaluator_factory(query, templates[0])
            if isinstance(ev0, HMAPaliEval) and type(ev0).build_costs in (
                    HMAPaliEval.build_costs, Hmap2Eval.build_costs):
                engine = "device"

    if engine == "device":
        from ..ops import hmap_device
        ev0 = evaluator_factory(query, templates[0])
        return hmap_device.screen_hmap_device(query, templates,
                                              ev0.params, k=k,
                                              engine="pallas", ev=ev0)

    buckets: dict[tuple[int, int], list[int]] = {}
    costs = [None] * len(templates)
    for idx, templ in enumerate(templates):
        ev = evaluator_factory(query, templ)
        c = ev.build_costs(query, templ)
        costs[idx] = c
        buckets.setdefault((c.q_size, c.t_size), []).append(idx)

    scores = np.zeros(len(templates), dtype=np.float32)
    for shape, idxs in buckets.items():
        batch = [costs[i] for i in idxs]
        if mesh is not None and int(mesh.devices.size) > 1:
            bucket_scores = _sharded_bucket_scores(batch, engine, mesh)
            for i, sc in zip(idxs, bucket_scores):
                scores[i] = sc
        elif engine == "pallas" and dp_scores.supported(batch[0]):
            # scores-only batched kernel (ops/dp_scores, round 4): B pairs
            # per grid step — ~85x the per-pair row-streaming kernel
            bucket_scores = dp_scores.forward_scores_batch(batch)
            for i, sc in zip(idxs, bucket_scores):
                scores[i] = sc
        elif engine == "pallas" and dp_pallas.supported(batch[0]):
            bucket_scores = dp_pallas.forward_scores_batch(batch)
            for i, sc in zip(idxs, bucket_scores):
                scores[i] = sc
        else:
            results = dp_engine.build_forward_jax_batched(batch)
            for i, res in zip(idxs, results):
                scores[i] = res.H[-1, -1]
    order = np.lexsort((np.arange(len(scores)), -scores))[:k]
    return scores, order


def screen_library_host(q_codes, t_codes, table, gi, ge, k=10):
    """Single-device reference for testing the sharded path."""
    scores = np.asarray(swaffine.sw_affine_batch_xla(
        jnp.broadcast_to(jnp.asarray(q_codes, jnp.int32)[None, :],
                         (t_codes.shape[0], len(q_codes))),
        jnp.asarray(t_codes, jnp.int32), jnp.asarray(table), gi, ge))
    order = np.lexsort((np.arange(len(scores)), -scores))
    top = order[:k]
    return scores[top], top
