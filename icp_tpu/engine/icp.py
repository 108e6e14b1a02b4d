"""The ICP outer loop — a single jitted ``lax.while_loop`` resident on device.

Reference counterpart: ``CPU::ICP::find_corresponding`` (``src/cpu.cc:55-79``)
and ``GPU::ICP::find_corresponding_opti`` (``src/GPU/gpu.cc:52-83``): per
iteration, (1) brute-force closest-point correspondence, (2) Horn similarity
solve, (3) apply transform + error, (4) converge when the reported error drops
below ``threshold`` (1e-5, ``src/cpu.hh:113``) or ``max_iter`` is reached.

The reference GPU driver round-trips host<->device for *every op every
iteration* (its report attributes >70% of API time to synchronize/malloc —
SURVEY.md §3.2).  The TPU-native design keeps the entire loop on device:
one jitted while_loop carrying ``(cloud, cumulative transform, err, i)``;
nothing touches the host until the final result is fetched.

Error metric (QUIRK-1, ``src/cpu.cc:63-73``): the reference reports
``(err_compute_alignment + err_compute) / np`` — both terms measure the SAME
residual ``sum ||y - (s R p + t)||^2`` (once before, once during the in-place
apply), so the reported error is ~2x the MSE.  With
``reference_compat=True`` (default) we reproduce that metric exactly —
computing the residual once and doubling it, which is mathematically identical
and halves the flops; ``reference_compat=False`` reports the plain MSE.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from icp_tpu.config import ICPConfig
from icp_tpu.ops.alignment import Similarity, alignment_from_stats, compute_alignment_stats
from icp_tpu.ops.distance import closest_point_indices
from icp_tpu.ops.transform import (
    apply_and_error,
    apply_similarity,
    compose,
    identity_similarity,
)


class ICPResult(NamedTuple):
    points: jax.Array  # (N, 3) transformed scene cloud (the reference's new_p)
    transform: Similarity  # cumulative similarity mapping input scene -> points
    err: jax.Array  # last reported per-iteration error
    iters: jax.Array  # iterations actually executed (int32)


class ICPTrace(NamedTuple):
    result: ICPResult
    errs: jax.Array  # (max_iter,) per-iteration reported error (frozen after
    # convergence, mirroring the reference's early break)


def _trim_weights(p: jax.Array, y: jax.Array, trim_fraction: float):
    """Trimmed-ICP weights: keep the (1 - trim_fraction) best correspondences
    by current squared distance (robust to partial overlap / outliers — a
    capability the reference lacks entirely).  Static trim_fraction == 0.0
    compiles to the exact untrimmed program."""
    d2 = jnp.sum((y - p) ** 2, axis=1)
    tau = jnp.quantile(d2, 1.0 - trim_fraction)
    return (d2 <= tau).astype(p.dtype)


def icp_step(
    p: jax.Array,
    model: jax.Array,
    *,
    solver: str,
    nn_method: str,
    with_scale: bool,
    reference_compat: bool,
    scene_tile: int,
    model_tile: int,
    acc_dtype=None,
    trim_fraction: float = 0.0,
):
    """One ICP iteration: correspondence -> alignment -> apply+error.

    Returns (p_new, per-iteration Similarity, reported error).
    """
    idx = closest_point_indices(
        p, model, method=nn_method, scene_tile=scene_tile, model_tile=model_tile
    )
    y = jnp.take(model, idx, axis=0)
    if trim_fraction > 0.0:
        w = _trim_weights(p, y, trim_fraction)
        stats = compute_alignment_stats(p, y, acc_dtype=acc_dtype, weights=w)
        sim = alignment_from_stats(stats, solver=solver, with_scale=with_scale)
        p_new = apply_similarity(p, sim)
        d = y - p_new
        err_sum = jnp.sum(w * jnp.sum(d * d, axis=1))
        n = stats.n.astype(err_sum.dtype)
    else:
        stats = compute_alignment_stats(p, y, acc_dtype=acc_dtype)
        sim = alignment_from_stats(stats, solver=solver, with_scale=with_scale)
        p_new, err_sum = apply_and_error(p, y, sim)
        n = jnp.asarray(p.shape[0], err_sum.dtype)
    err = (2.0 * err_sum / n) if reference_compat else (err_sum / n)
    return p_new, sim, err


def _step_and_compose(
    p,
    model,
    sim_tot,
    *,
    solver,
    nn_method,
    with_scale,
    reference_compat,
    scene_tile,
    model_tile,
    trim_fraction: float = 0.0,
):
    """One iteration + transform composition.

    Fast path (solver=qcp_fused + nn=pallas): the model-point gather runs
    inside the NN kernel (one-hot matmul) and the whole alignment solve +
    composition runs in the fused scalar-core kernel — the XLA glue per
    iteration reduces to the stats sums and the fused apply/error pass.
    """
    if solver == "qcp_fused" and nn_method == "pallas":
        # Fused fast path.  ``sim_tot`` here is NOT a Similarity but the
        # (1, 32) state block output by the alignment kernel (identity-packed
        # at loop start, carried verbatim) — zero repacking per iteration.
        from icp_tpu.kernels.nn_pallas import closest_point_indices_pallas
        from icp_tpu.kernels.qcp_pallas import (
            alignment_step_state_pallas,
            pack_stats,
            unpack_state,
        )
        from icp_tpu.ops.transform import apply_similarity

        interp = jax.default_backend() != "tpu"
        # NOTE: indices + HBM gather, NOT the kernel's one-hot in-kernel
        # gather — measured 12us vs ~75us on cow (the one-hot matmul's
        # contraction over the whole model tile at HIGHEST precision costs
        # far more than the gather it saves).
        idx = closest_point_indices_pallas(
            p, model, scene_tile=scene_tile, model_tile=model_tile,
            interpret=interp,
        )
        y = jnp.take(model, idx, axis=0)
        w = _trim_weights(p, y, trim_fraction) if trim_fraction > 0.0 else None
        stats = compute_alignment_stats(p, y, weights=w)
        # err comes from the kernel in closed form (gy + s^2 gp - 2 s lambda,
        # Horn's residual at the optimum; with weighted stats this is the
        # weighted residual) — no (N, 3) error reduction pass.
        new_state = alignment_step_state_pallas(
            pack_stats(stats), sim_tot, with_scale=with_scale, interpret=interp
        )
        sim, _, err_sum = unpack_state(new_state)
        p_new = apply_similarity(p, sim)
        n = stats.n.astype(err_sum.dtype)
        err = (2.0 * err_sum / n) if reference_compat else (err_sum / n)
        return p_new, new_state, err

    p_new, sim, err = icp_step(
        p,
        model,
        solver=solver,
        nn_method=nn_method,
        with_scale=with_scale,
        reference_compat=reference_compat,
        scene_tile=scene_tile,
        model_tile=model_tile,
        trim_fraction=trim_fraction,
    )
    return p_new, compose(sim_tot, sim), err


def _is_fused(solver: str, nn_method: str) -> bool:
    return solver == "qcp_fused" and nn_method == "pallas"


def _init_transform_state(solver: str, nn_method: str, dt):
    if _is_fused(solver, nn_method):
        from icp_tpu.kernels.qcp_pallas import identity_state

        return identity_state()
    return identity_similarity(dt)


def _finish_transform_state(state, solver: str, nn_method: str) -> Similarity:
    if _is_fused(solver, nn_method):
        from icp_tpu.kernels.qcp_pallas import unpack_state

        return unpack_state(state)[1]
    return state


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_iter",
        "solver",
        "nn_method",
        "with_scale",
        "reference_compat",
        "scene_tile",
        "model_tile",
        "trim_fraction",
    ),
)
def _icp_while(
    model,
    scene,
    threshold,
    *,
    max_iter: int,
    solver: str,
    nn_method: str,
    with_scale: bool,
    reference_compat: bool,
    scene_tile: int,
    model_tile: int,
    trim_fraction: float = 0.0,
):
    dt = scene.dtype

    def cond(carry):
        _, _, err, it = carry
        return jnp.logical_and(it < max_iter, err >= threshold)

    def body(carry):
        p, sim_tot, _, it = carry
        p_new, sim_tot2, err = _step_and_compose(
            p,
            model,
            sim_tot,
            solver=solver,
            nn_method=nn_method,
            with_scale=with_scale,
            reference_compat=reference_compat,
            scene_tile=scene_tile,
            model_tile=model_tile,
            trim_fraction=trim_fraction,
        )
        return p_new, sim_tot2, err, it + 1

    init = (
        scene,
        _init_transform_state(solver, nn_method, dt),
        jnp.asarray(jnp.inf, dt),
        jnp.asarray(0, jnp.int32),
    )
    p, state, err, it = jax.lax.while_loop(cond, body, init)
    return ICPResult(
        points=p,
        transform=_finish_transform_state(state, solver, nn_method),
        err=err,
        iters=it,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_iter",
        "solver",
        "nn_method",
        "with_scale",
        "reference_compat",
        "scene_tile",
        "model_tile",
        "trim_fraction",
    ),
)
def _icp_scan_trace(
    model,
    scene,
    threshold,
    *,
    max_iter: int,
    solver: str,
    nn_method: str,
    with_scale: bool,
    reference_compat: bool,
    scene_tile: int,
    model_tile: int,
    trim_fraction: float = 0.0,
):
    """Fixed-shape scan variant that records the per-iteration error trace.

    Emulates the reference's early ``break`` by freezing the state once
    converged (subsequent trace entries repeat the final error)."""
    dt = scene.dtype

    def body(carry, _):
        p, sim_tot, err, it, done = carry
        p_new, sim_tot2, err_new = _step_and_compose(
            p,
            model,
            sim_tot,
            solver=solver,
            nn_method=nn_method,
            with_scale=with_scale,
            reference_compat=reference_compat,
            scene_tile=scene_tile,
            model_tile=model_tile,
            trim_fraction=trim_fraction,
        )
        keep = lambda new, old: jnp.where(done, old, new)
        p = keep(p_new, p)
        sim_tot = jax.tree.map(keep, sim_tot2, sim_tot)
        err = keep(err_new, err)
        it = jnp.where(done, it, it + 1)
        done = jnp.logical_or(done, err < threshold)
        return (p, sim_tot, err, it, done), err

    init = (
        scene,
        _init_transform_state(solver, nn_method, dt),
        jnp.asarray(jnp.inf, dt),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(False),
    )
    (p, state, err, it, _), errs = jax.lax.scan(body, init, None, length=max_iter)
    return ICPTrace(
        result=ICPResult(
            points=p,
            transform=_finish_transform_state(state, solver, nn_method),
            err=err,
            iters=it,
        ),
        errs=errs,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "solver",
        "nn_method",
        "with_scale",
        "reference_compat",
        "scene_tile",
        "model_tile",
        "trim_fraction",
    ),
)
def icp_fixed_iters(
    model,
    scene,
    *,
    n_iters,  # dynamic on purpose: one compiled program serves every count
    # (compiles are minutes on tunneled backends; fori_loop takes a traced
    # bound by lowering to while_loop)
    solver: str = "eigh",
    nn_method: str = "bcast",
    with_scale: bool = True,
    reference_compat: bool = True,
    scene_tile: int = 256,
    model_tile: int = 4096,
    trim_fraction: float = 0.0,
):
    """Run exactly ``n_iters`` iterations with no convergence exit — the
    benchmark workload (reference full-loop benches use 20 iterations,
    ``src/bench.cc:435-445``)."""
    dt = scene.dtype

    def body(_, carry):
        p, sim_tot, __ = carry
        p_new, sim_tot2, err = _step_and_compose(
            p,
            model,
            sim_tot,
            solver=solver,
            nn_method=nn_method,
            with_scale=with_scale,
            reference_compat=reference_compat,
            scene_tile=scene_tile,
            model_tile=model_tile,
            trim_fraction=trim_fraction,
        )
        return p_new, sim_tot2, err

    init = (
        scene,
        _init_transform_state(solver, nn_method, dt),
        jnp.asarray(jnp.inf, dt),
    )
    n = jnp.asarray(n_iters, jnp.int32)
    p, state, err = jax.lax.fori_loop(0, n, body, init)
    return ICPResult(
        points=p,
        transform=_finish_transform_state(state, solver, nn_method),
        err=err,
        iters=n,
    )


def _validate(model, scene, cfg: ICPConfig) -> None:
    """Reference input validation (``src/cpu.cc:42-53``).

    The np==nm restriction is an artifact of the reference's array plumbing —
    brute-force NN does not need it — so it is only enforced under
    ``validate_inputs`` for strict compat; >=4 points is always required
    (the similarity solve needs 4 non-degenerate correspondences).
    """
    if scene.shape[0] < 4:
        raise ValueError("[error] Need at least 4 point pairs")
    if cfg.validate_inputs and scene.shape[0] != model.shape[0]:
        raise ValueError(
            "[error] Point sets need to have the same number of points. "
            "(reference restriction; pass validate_inputs=False to lift it)"
        )


def icp(
    model,
    scene,
    config: Optional[ICPConfig] = None,
    *,
    trace: bool = False,
    guard: bool = False,
):
    """Register ``scene`` onto ``model``; both (N, 3) arrays.

    Returns ``ICPResult`` (or ``ICPTrace`` when ``trace=True``).  The full
    loop runs as one XLA computation on the default backend.

    ``guard=True`` adds a host-side NaN/divergence check on the result
    (forces a device sync; the reference has no failure detection at all —
    SURVEY.md §5).
    """
    cfg = config or ICPConfig()
    model = jnp.asarray(model, cfg.dtype)
    scene = jnp.asarray(scene, cfg.dtype)
    _validate(model, scene, cfg)
    backend = jax.default_backend()
    kwargs = dict(
        max_iter=cfg.max_iter,
        solver=cfg.resolved_solver(backend),
        nn_method=cfg.resolved_nn_method(backend),
        with_scale=cfg.with_scale,
        reference_compat=cfg.reference_compat,
        scene_tile=cfg.scene_tile,
        model_tile=cfg.model_tile,
        trim_fraction=cfg.trim_fraction,
    )
    threshold = jnp.asarray(cfg.threshold, cfg.dtype)
    if trace:
        out = _icp_scan_trace(model, scene, threshold, **kwargs)
        result = out.result
    else:
        out = _icp_while(model, scene, threshold, **kwargs)
        result = out
    if guard:
        from icp_tpu.utils.profiling import check_finite

        check_finite("icp", result.err, result.points)
    return out
