"""Generalized-ICP (plane-to-plane) — Segal et al.'s covariance-weighted
registration, TPU-native.

Each point carries a disk covariance ``C = I - (1 - eps) n n^T`` (large in the
local tangent plane, ``eps`` along the normal).  The per-correspondence
residual ``d = y - T p`` is weighted by ``M = (C_y + R C_p R^T)^-1`` and the
6-vector Gauss-Newton update solves ``sum J^T M J x = sum J^T M d``.
Point-to-point and point-to-plane are the ``eps -> 1`` and ``eps -> 0``
limits; GICP interpolates and is the most accurate of the three on real scan
pairs.  No reference counterpart.

TPU-native choices: batched closed-form 3x3 inverses (adjugate / det —
branchless, no LAPACK), one einsum pass for the 6x6 system (psum-able),
Rodrigues update — the same building blocks as ``point_to_plane.py``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from icp_tpu.config import ICPConfig
from icp_tpu.engine.icp import ICPResult, _validate
from icp_tpu.engine.point_to_plane import _rodrigues
from icp_tpu.ops.alignment import Similarity
from icp_tpu.ops.distance import closest_point_indices
from icp_tpu.ops.transform import apply_similarity, compose, identity_similarity


def disk_covariances(normals: jax.Array, eps: float = 1e-3) -> jax.Array:
    """(N, 3) unit normals -> (N, 3, 3) plane-disk covariances
    ``I - (1 - eps) n n^T``."""
    dt = normals.dtype
    eye = jnp.eye(3, dtype=dt)
    nnT = normals[:, :, None] * normals[:, None, :]
    return eye[None] - (1.0 - eps) * nnT


def _inv3_batched(M: jax.Array) -> jax.Array:
    """Closed-form batched inverse of (N, 3, 3) via adjugate / det."""
    a, b, c = M[:, 0, 0], M[:, 0, 1], M[:, 0, 2]
    d, e, f = M[:, 1, 0], M[:, 1, 1], M[:, 1, 2]
    g, h, i = M[:, 2, 0], M[:, 2, 1], M[:, 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-30, 1.0, det)
    adj = jnp.stack(
        [
            jnp.stack([A, -(b * i - c * h), b * f - c * e], axis=-1),
            jnp.stack([B, a * i - c * g, -(a * f - c * d)], axis=-1),
            jnp.stack([C, -(a * h - b * g), a * e - b * d], axis=-1),
        ],
        axis=-2,
    )
    return adj * inv_det[:, None, None]


def _gicp_step(p, cov_p, model, cov_m, *, nn_method, scene_tile, model_tile,
               damping=1e-9):
    """One GICP Gauss-Newton iteration.  ``cov_p`` must already be expressed
    in the CURRENT scene frame (rotated alongside p by the caller)."""
    idx = closest_point_indices(
        p, model, method=nn_method, scene_tile=scene_tile, model_tile=model_tile
    )
    y = jnp.take(model, idx, axis=0)
    Cy = jnp.take(cov_m, idx, axis=0)

    M = _inv3_batched(Cy + cov_p)  # (N, 3, 3)
    d = y - p  # (N, 3) residuals (we solve for a small correction T ~ I)

    # J_i = [ [p]_x | -I ]  for residual d(x) = y - (R p + t), x = [omega, t]
    zeros = jnp.zeros_like(p[:, 0])
    px = jnp.stack(
        [
            jnp.stack([zeros, -p[:, 2], p[:, 1]], axis=-1),
            jnp.stack([p[:, 2], zeros, -p[:, 0]], axis=-1),
            jnp.stack([-p[:, 1], p[:, 0], zeros], axis=-1),
        ],
        axis=-2,
    )  # (N, 3, 3) = [p]_x ; d(R p)/d omega = -[p]_x omega => J_omega = [p]_x
    J = jnp.concatenate([px, -jnp.broadcast_to(jnp.eye(3, dtype=p.dtype),
                                               px.shape)], axis=-1)  # (N,3,6)

    HI = jax.lax.Precision.HIGHEST
    MJ = jnp.einsum("nij,njk->nik", M, J, precision=HI)  # (N, 3, 6)
    A = jnp.einsum("nji,njk->ik", J, MJ, precision=HI)  # (6, 6)
    b = jnp.einsum("nji,njk,nk->i", J, M, d, precision=HI)  # (6,)
    x = -jnp.linalg.solve(A + damping * jnp.eye(6, dtype=p.dtype), b)

    R = _rodrigues(x[:3])
    t = x[3:]
    sim = Similarity(s=jnp.asarray(1.0, p.dtype), R=R, t=t)
    p_new = apply_similarity(p, sim)
    dn = y - p_new
    err = jnp.mean(jnp.einsum("ni,nij,nj->n", dn, M, dn, precision=HI))
    return p_new, sim, err


@functools.partial(
    jax.jit,
    static_argnames=("max_iter", "nn_method", "scene_tile", "model_tile"),
)
def _gicp_while(
    model,
    cov_m,
    scene,
    cov_s,
    threshold,
    *,
    max_iter: int,
    nn_method: str,
    scene_tile: int,
    model_tile: int,
):
    dt = scene.dtype

    def cond(carry):
        _, _, _, err, it = carry
        return jnp.logical_and(it < max_iter, err >= threshold)

    def body(carry):
        p, cov_p, sim_tot, _, it = carry
        p_new, sim, err = _gicp_step(
            p, cov_p, model, cov_m, nn_method=nn_method,
            scene_tile=scene_tile, model_tile=model_tile,
        )
        # rotate the scene covariances with the step: C <- R C R^T
        cov_p = jnp.einsum(
            "ij,njk,lk->nil", sim.R, cov_p, sim.R,
            precision=jax.lax.Precision.HIGHEST,
        )
        return p_new, cov_p, compose(sim_tot, sim), err, it + 1

    init = (
        scene,
        cov_s,
        identity_similarity(dt),
        jnp.asarray(jnp.inf, dt),
        jnp.asarray(0, jnp.int32),
    )
    p, _, sim_tot, err, it = jax.lax.while_loop(cond, body, init)
    return ICPResult(points=p, transform=sim_tot, err=err, iters=it)


def icp_generalized(
    model,
    scene,
    config: Optional[ICPConfig] = None,
    *,
    model_normals=None,
    scene_normals=None,
    normal_k: int = 16,
    eps: float = 1e-3,
):
    """Generalized (plane-to-plane) ICP.  Normals for BOTH clouds are
    estimated via kNN-PCA if not given; ``eps`` is the across-surface
    covariance (0 -> pure plane metric, 1 -> point-to-point)."""
    from icp_tpu.ops.normals import estimate_normals

    cfg = config or ICPConfig()
    model = jnp.asarray(model, cfg.dtype)
    scene = jnp.asarray(scene, cfg.dtype)
    _validate(model, scene, cfg)
    if model_normals is None:
        model_normals = estimate_normals(model, k=normal_k)
    if scene_normals is None:
        scene_normals = estimate_normals(scene, k=normal_k)
    cov_m = disk_covariances(jnp.asarray(model_normals, cfg.dtype), eps)
    cov_s = disk_covariances(jnp.asarray(scene_normals, cfg.dtype), eps)
    backend = jax.default_backend()
    return _gicp_while(
        model,
        cov_m,
        scene,
        cov_s,
        jnp.asarray(cfg.threshold, cfg.dtype),
        max_iter=cfg.max_iter,
        nn_method=cfg.resolved_nn_method(backend),
        scene_tile=cfg.scene_tile,
        model_tile=cfg.model_tile,
    )
