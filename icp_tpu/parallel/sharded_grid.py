"""Sharded spatially-pruned ICP: ring fold + per-shard kd-tile culling.

The at-scale composition of the two round-2 engines: ``parallel/sharded.py``'s
ring ``ppermute`` fold (model shards travel the ICI ring, scene stays put)
with ``kernels/nn_grid.py``'s exact tile culling (kd tiles + upper-bound
pruning + in-kernel DMA work list) applied per hop:

  * each device kd-sorts ITS scene shard once and builds a ``ModelGrid`` over
    ITS model shard once; the grid's arrays (transposed tiles, bboxes,
    original-order points) ride the ring as the fold payload;
  * on every hop, the visiting shard's tiles are culled against
    ``min(best_d, u)`` — the running cross-shard best distance *tightens the
    bound hop by hop*, so later hops cull almost everything (strictly more
    pruning than the single-device engine gets);
  * cross-shard ties break to the lowest GLOBAL original index, exactly like
    the dense sharded engine: the pruned kernel and its overflow path
    compute distances with the same broadcast diff-squares f32 math, so
    equality comparisons are bitwise meaningful across hops;
  * the loop carry holds ``u`` — the previous iteration's residual
    ``||y - p_new||^2``, a valid upper bound on the new NN distance (same
    gather-free trick as ``engine/grid.py``).

No reference counterpart (the reference is single-GPU brute force,
``src/GPU/compute.cu:94-245``); this is the framework's own at-scale story:
1M-point clouds sharded over a pod slice at grid-pruned cost, with no
O(N_loc x M) buffer anywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from icp_tpu.config import ICPConfig
from icp_tpu.engine.icp import ICPResult, ICPTrace
from icp_tpu.kernels.nn_grid import (
    ModelGrid,
    _round_up,
    bound_from_indices,
    build_model_grid,
    closest_point_indices_grid,
    initial_bound_indices,
    kd_order,
    levels_for,
)
from icp_tpu.ops.alignment import alignment_from_stats
from icp_tpu.ops.transform import apply_similarity, compose, identity_similarity
from icp_tpu.parallel.mesh import make_mesh
from icp_tpu.parallel.sharded import (
    _distributed_quantile,
    _masked_stats,
    _pad_rows,
    _unpad_result,
)

_BIG = 3.0e38


def _prepare_scene_shard(p_loc, w_loc, target_tile: int):
    """kd-sort + pad ONE device's scene rows; returns
    (p_sorted, w_sorted, inv_slots, tn).

    ``w_loc`` marks globally-real rows (global padding lands on the last
    shard); kd padding replicates the last row with weight 0.  Real rows sort
    compactly (padding to segment tails), keeping scene tiles tight.
    """
    n = p_loc.shape[0]
    lvl = levels_for(n, target_tile)
    tn = _round_up(-(-n // (2**lvl)), 8)
    n_pad = tn * (2**lvl)
    pad = jnp.broadcast_to(p_loc[-1], (n_pad - n, 3)).astype(p_loc.dtype)
    p_pad = jnp.concatenate([p_loc, pad], axis=0)
    w_pad = jnp.concatenate([w_loc, jnp.zeros((n_pad - n,), w_loc.dtype)])
    perm = kd_order(p_pad, lvl, real=w_pad > 0)
    inv_slots = jnp.argsort(perm)[:n]
    return p_pad[perm], w_pad[perm], inv_slots, tn


def _ring_correspond_grid(p_loc, u, grid_arrays, *, tm: int, axis: str,
                          n_dev: int, m_shard: int, scene_tile: int,
                          max_candidates: int, interpret: bool):
    """Grid-pruned ring NN fold.  Returns (y, global index, best distance).

    ``u``: (N_loc,) f32 upper bounds on the GLOBAL NN distance (previous
    iteration's residual, or the first-iteration local-shard bound — local
    distances bound the global minimum from above).  ``grid_arrays``: the
    ModelGrid array fields of THIS device's shard; they rotate around the
    ring (``model_tile`` stays static and is passed as ``tm``).
    """
    my = jax.lax.axis_index(axis).astype(jnp.int32)
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    n_loc = p_loc.shape[0]

    def hop(k, carry):
        best_d, best_gi, best_y, tiles_t, tile_lo, tile_hi, m_orig = carry
        src = jax.lax.rem(
            my - k.astype(jnp.int32) + jnp.int32(n_dev), jnp.int32(n_dev)
        )
        g = ModelGrid(tiles_t=tiles_t, tile_lo=tile_lo, tile_hi=tile_hi,
                      model_orig=m_orig, model_tile=tm)
        # cull bound: both the cross-hop running best and the caller's bound
        # are achieved distances to real model points — exact upper bounds.
        idx, y, _, d2 = closest_point_indices_grid(
            p_loc, g, jnp.minimum(best_d, u), scene_tile=scene_tile,
            max_candidates=max_candidates, interpret=interpret,
        )
        gi = idx + src * m_shard
        better = jnp.logical_or(
            d2 < best_d, jnp.logical_and(d2 == best_d, gi < best_gi)
        )
        best_d = jnp.where(better, d2, best_d)
        best_gi = jnp.where(better, gi, best_gi)
        best_y = jnp.where(better[:, None], y, best_y)
        tiles_t = jax.lax.ppermute(tiles_t, axis, perm)
        tile_lo = jax.lax.ppermute(tile_lo, axis, perm)
        tile_hi = jax.lax.ppermute(tile_hi, axis, perm)
        m_orig = jax.lax.ppermute(m_orig, axis, perm)
        return best_d, best_gi, best_y, tiles_t, tile_lo, tile_hi, m_orig

    init = (
        jnp.full((n_loc,), _BIG, jnp.float32),
        jnp.full((n_loc,), 2**31 - 1, jnp.int32),
        jnp.zeros((n_loc, 3), jnp.float32),
    ) + grid_arrays
    best_d, best_gi, best_y, *_ = jax.lax.fori_loop(0, n_dev, hop, init)
    return best_y, best_gi, best_d


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh",
        "max_iter",
        "solver",
        "with_scale",
        "reference_compat",
        "trim_fraction",
        "scene_tile_target",
        "model_tile_target",
        "max_candidates",
        "bound_stride",
        "trace",
    ),
)
def _icp_sharded_grid_jit(
    model_pad,
    scene_pad,
    scene_mask,
    threshold,
    n_iters=None,  # dynamic iteration bound; None -> the static max_iter
    *,
    mesh: Mesh,
    max_iter: int,
    solver: str,
    with_scale: bool,
    reference_compat: bool,
    trim_fraction: float = 0.0,
    scene_tile_target: int = 256,
    model_tile_target: int = 1024,
    max_candidates: int = 16,
    bound_stride: int = 16,
    trace: bool = False,
):
    axis = mesh.axis_names[0]
    n_dev = mesh.shape[axis]
    dt = scene_pad.dtype
    m_shard = model_pad.shape[0] // n_dev
    interp = jax.default_backend() != "tpu"
    bound = jnp.asarray(max_iter if n_iters is None else n_iters, jnp.int32)

    def local_icp(m_loc, p_loc_raw, w_loc_raw, bound):
        # One-time per-shard setup (hoisted out of the loop by XLA): local
        # model grid, local scene kd sort, first-iteration bounds from a
        # strided subsample of the LOCAL shard (local distances bound the
        # global NN from above — no collective needed).
        grid = build_model_grid(m_loc, target_tile=model_tile_target)
        grid_arrays = (grid.tiles_t, grid.tile_lo, grid.tile_hi,
                       grid.model_orig)
        p0, w_loc, inv_slots, tn = _prepare_scene_shard(
            p_loc_raw, w_loc_raw, scene_tile_target
        )
        stride = max(1, min(bound_stride, m_shard // 4))
        idx0 = initial_bound_indices(p0, grid.model_orig, stride=stride,
                                     interpret=interp)
        u0 = bound_from_indices(p0, grid, idx0)

        def step(p, sim_tot, it, u):
            y, _, d2 = _ring_correspond_grid(
                p, u, grid_arrays, tm=grid.model_tile, axis=axis,
                n_dev=n_dev, m_shard=m_shard, scene_tile=tn,
                max_candidates=max_candidates, interpret=interp,
            )
            y = y.astype(dt)
            if trim_fraction > 0.0:
                tau = _distributed_quantile(
                    d2.astype(dt), w_loc, 1.0 - trim_fraction, axis
                )
                w_eff = w_loc * (d2.astype(dt) <= tau).astype(w_loc.dtype)
            else:
                w_eff = w_loc
            stats = _masked_stats(p, y, w_eff, axis)
            sim = alignment_from_stats(stats, solver=solver,
                                       with_scale=with_scale)
            p_new = apply_similarity(p, sim)
            derr = y - p_new
            d2_new = jnp.sum(derr * derr, axis=1)
            err_sum = jax.lax.psum(jnp.sum(w_eff * d2_new), axis)
            err = (2.0 * err_sum / stats.n) if reference_compat else (
                err_sum / stats.n
            )
            # next iteration's culling bound: residual to this iteration's
            # match (a model point) — gather-free, same as engine/grid.py
            return p_new, compose(sim_tot, sim), err, it + 1, \
                d2_new.astype(jnp.float32)

        init = (
            p0,
            identity_similarity(dt),
            jnp.asarray(jnp.inf, dt),
            jnp.asarray(0, jnp.int32),
            u0,
        )

        if trace:
            # early-exiting while_loop + error buffer (see parallel/sharded.py)
            def cond_t(carry):
                _, _, err, it, _, _ = carry
                return jnp.logical_and(it < bound, err >= threshold)

            def body_t(carry):
                p, sim_tot, _, it, u, errs = carry
                p2, sim2, err2, it2, u2 = step(p, sim_tot, it, u)
                errs = jax.lax.dynamic_update_index_in_dim(
                    errs, err2.astype(errs.dtype), it, 0
                )
                return p2, sim2, err2, it2, u2, errs

            p, sim_tot, err, it, _, errs = jax.lax.while_loop(
                cond_t, body_t, init + (jnp.full((max_iter,), jnp.nan, dt),)
            )
            return p[inv_slots], sim_tot, err, it, errs

        def cond(carry):
            _, _, err, it, _ = carry
            return jnp.logical_and(it < bound, err >= threshold)

        def body(carry):
            p, sim_tot, _, it, u = carry
            return step(p, sim_tot, it, u)

        p, sim_tot, err, it, _ = jax.lax.while_loop(cond, body, init)
        return p[inv_slots], sim_tot, err, it

    shard = PartitionSpec(axis, None)
    mask_spec = PartitionSpec(axis)
    rep = PartitionSpec()
    out_specs = (shard, rep, rep, rep) + ((rep,) if trace else ())
    out = jax.shard_map(
        local_icp,
        mesh=mesh,
        in_specs=(shard, shard, mask_spec, rep),
        out_specs=out_specs,
        check_vma=False,
    )(model_pad, scene_pad, scene_mask, bound)
    if trace:
        p, sim_tot, err, it, errs = out
        return ICPTrace(
            result=ICPResult(points=p, transform=sim_tot, err=err, iters=it),
            errs=errs,
        )
    p, sim_tot, err, it = out
    return ICPResult(points=p, transform=sim_tot, err=err, iters=it)


def icp_sharded_grid(
    model,
    scene,
    config: ICPConfig | None = None,
    *,
    mesh: Mesh | None = None,
    trace: bool = False,
    n_iters=None,
):
    """Multi-chip spatially-pruned ICP over a ``points`` mesh.

    API-compatible with ``icp_sharded`` (``icp_sharded(nn_method="grid")``
    dispatches here).  Model padding uses the 1e17 sentinel: pad rows form
    far-away kd tiles whose bbox distance culls them out of every candidate
    list, and their huge distances keep them out of every fold.
    """
    cfg = config or ICPConfig()
    mesh = mesh or make_mesh()
    axis = mesh.axis_names[0]
    n_dev = mesh.shape[axis]

    dtype = np.dtype(cfg.dtype)
    model_np = np.asarray(model, dtype)
    scene_np = np.asarray(scene, dtype)
    n = scene_np.shape[0]

    scene_pad = _pad_rows(scene_np, n_dev, 0.0)
    model_pad = _pad_rows(model_np, n_dev, 1.0e17)
    mask = np.zeros((scene_pad.shape[0],), dtype)
    mask[:n] = 1.0

    shard = NamedSharding(mesh, PartitionSpec(axis, None))
    mask_shard = NamedSharding(mesh, PartitionSpec(axis))
    backend = jax.default_backend()
    out = _icp_sharded_grid_jit(
        jax.device_put(model_pad, shard),
        jax.device_put(scene_pad, shard),
        jax.device_put(mask, mask_shard),
        jnp.asarray(cfg.threshold, cfg.dtype),
        None if n_iters is None else jnp.asarray(n_iters, jnp.int32),
        mesh=mesh,
        max_iter=cfg.max_iter,
        solver=cfg.resolved_solver(backend),
        with_scale=cfg.with_scale,
        reference_compat=cfg.reference_compat,
        trim_fraction=cfg.trim_fraction,
        scene_tile_target=cfg.grid_scene_tile,
        model_tile_target=cfg.grid_model_tile,
        max_candidates=cfg.grid_max_candidates,
        trace=trace,
    )
    return _unpad_result(out, n, trace)
