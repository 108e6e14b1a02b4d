"""Pose-graph optimization and distributed bundle adjustment.

The back end of the multi-scan extension (BASELINE.json config 5): given
per-scan poses from the pairwise ICP chain (``slam.pairwise``) and relative
or point-level constraints, jointly optimize all poses.

Two solvers, both jitted end-to-end:

  * ``optimize_pose_graph`` — edge-based Gauss-Newton/Levenberg-Marquardt on
    SE(3) poses (quaternion + translation parametrization, gauge fixed at
    pose 0).  The problem is tiny (7P parameters); it runs replicated.
  * ``bundle_adjust`` / ``bundle_adjust_sharded`` — point-level joint
    refinement: residual per correspondence ``r_k = T_a x_k - T_b y_k``.
    The normal equations ``H = sum_k J_k^T J_k``, ``g = sum_k J_k^T r_k``
    are accumulated per point and, in the sharded variant, reduced with a
    single ``psum`` over the points mesh axis before a replicated dense
    solve — the Schur-complement-style collective reduction of
    SURVEY.md §5 (distributed comm backend) on TPU ICI.

No counterpart exists in the reference (single-pair registration only).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from icp_tpu.ops.alignment import Similarity, quat_to_rot


class PoseEdge(NamedTuple):
    """Relative-pose constraint: scan j expressed in scan i's frame."""

    i: int
    j: int
    R: jax.Array  # (3, 3) measured R_ij
    t: jax.Array  # (3,) measured t_ij
    weight: float = 1.0


def poses_to_params(poses: Sequence[Similarity]) -> jax.Array:
    """Pack [q(4), t(3)] per pose; rotation matrix -> quaternion."""
    rows = []
    for p in poses:
        R = np.asarray(p.R, np.float64)
        q = _rot_to_quat_np(R)
        rows.append(np.concatenate([q, np.asarray(p.t, np.float64)]))
    return jnp.asarray(np.stack(rows), jnp.float32)


def params_to_poses(theta: jax.Array) -> list[Similarity]:
    out = []
    for k in range(theta.shape[0]):
        q = theta[k, :4]
        q = q / jnp.linalg.norm(q)
        out.append(
            Similarity(
                s=jnp.asarray(1.0, theta.dtype),
                R=quat_to_rot(q),
                t=theta[k, 4:7],
            )
        )
    return out


def _rot_to_quat_np(R: np.ndarray) -> np.ndarray:
    """Shepperd's method (numerically stable rotation -> quaternion)."""
    tr = np.trace(R)
    if tr > 0:
        s = np.sqrt(tr + 1.0) * 2
        w = 0.25 * s
        x = (R[2, 1] - R[1, 2]) / s
        y = (R[0, 2] - R[2, 0]) / s
        z = (R[1, 0] - R[0, 1]) / s
    elif R[0, 0] > R[1, 1] and R[0, 0] > R[2, 2]:
        s = np.sqrt(1.0 + R[0, 0] - R[1, 1] - R[2, 2]) * 2
        w = (R[2, 1] - R[1, 2]) / s
        x = 0.25 * s
        y = (R[0, 1] + R[1, 0]) / s
        z = (R[0, 2] + R[2, 0]) / s
    elif R[1, 1] > R[2, 2]:
        s = np.sqrt(1.0 + R[1, 1] - R[0, 0] - R[2, 2]) * 2
        w = (R[0, 2] - R[2, 0]) / s
        x = (R[0, 1] + R[1, 0]) / s
        y = 0.25 * s
        z = (R[1, 2] + R[2, 1]) / s
    else:
        s = np.sqrt(1.0 + R[2, 2] - R[0, 0] - R[1, 1]) * 2
        w = (R[1, 0] - R[0, 1]) / s
        x = (R[0, 2] + R[2, 0]) / s
        y = (R[1, 2] + R[2, 1]) / s
        z = 0.25 * s
    q = np.array([w, x, y, z])
    return q / np.linalg.norm(q)


def _edge_residual(theta, i, j, R_meas, t_meas, weight):
    qi = theta[i, :4]
    qi = qi / jnp.linalg.norm(qi)
    qj = theta[j, :4]
    qj = qj / jnp.linalg.norm(qj)
    Ri, Rj = quat_to_rot(qi), quat_to_rot(qj)
    ti, tj = theta[i, 4:7], theta[j, 4:7]
    r_rot = (Ri.T @ Rj - R_meas).reshape(-1)
    r_t = Ri.T @ (tj - ti) - t_meas
    return weight * jnp.concatenate([r_rot, r_t])


@functools.partial(jax.jit, static_argnames=("edges_static", "n_iters"))
def _optimize_jit(theta0, edge_R, edge_t, edge_w, *, edges_static, n_iters):
    n_poses = theta0.shape[0]
    dt = theta0.dtype

    def residuals(theta):
        rs = [
            _edge_residual(theta, i, j, edge_R[k], edge_t[k], edge_w[k])
            for k, (i, j) in enumerate(edges_static)
        ]
        # quaternion-norm soft constraints keep the parametrization healthy
        qn = jnp.array(
            [jnp.sum(theta[p, :4] ** 2) - 1.0 for p in range(n_poses)], dt
        )
        return jnp.concatenate(rs + [qn])

    flat0 = theta0.reshape(-1)
    n_params = flat0.shape[0]
    # Gauge fix: pose 0 is frozen via a large diagonal prior in the normal
    # equations.  (Masking the *step* after an unconstrained solve is wrong —
    # the remaining parameters would be solved as if pose 0 were free.)
    gauge = jnp.concatenate(
        [jnp.full((7,), 1e8, dt), jnp.full((n_params - 7,), 1e-6, dt)]
    )

    def gn_step(_, flat):
        theta = flat.reshape(n_poses, 7)
        r = residuals(theta)
        J = jax.jacfwd(lambda f: residuals(f.reshape(n_poses, 7)))(flat)
        H = J.T @ J + jnp.diag(gauge)
        g = J.T @ r
        delta = -jnp.linalg.solve(H, g)
        return flat + delta

    flat = jax.lax.fori_loop(0, n_iters, gn_step, flat0)
    theta = flat.reshape(n_poses, 7)
    return theta, jnp.sum(residuals(theta) ** 2)


def optimize_pose_graph(
    poses: Sequence[Similarity],
    edges: Sequence[PoseEdge],
    *,
    n_iters: int = 10,
) -> Tuple[list[Similarity], float]:
    """Gauss-Newton pose-graph solve; returns (optimized poses, final cost)."""
    theta0 = poses_to_params(poses)
    edge_R = jnp.stack([jnp.asarray(e.R, jnp.float32) for e in edges])
    edge_t = jnp.stack([jnp.asarray(e.t, jnp.float32) for e in edges])
    edge_w = jnp.asarray([e.weight for e in edges], jnp.float32)
    edges_static = tuple((e.i, e.j) for e in edges)
    theta, cost = _optimize_jit(
        theta0, edge_R, edge_t, edge_w, edges_static=edges_static, n_iters=n_iters
    )
    return params_to_poses(theta), float(cost)


# ---------------------------------------------------------------------------
# Point-level bundle adjustment (normal equations reduced over points)
# ---------------------------------------------------------------------------


def _point_residual(flat_theta, n_poses, a, b, x, y):
    """r = T_a x - T_b y for one correspondence (a, b may be traced)."""
    theta = flat_theta.reshape(n_poses, 7)
    qa = theta[a, :4]
    qa = qa / jnp.linalg.norm(qa)
    qb = theta[b, :4]
    qb = qb / jnp.linalg.norm(qb)
    return (quat_to_rot(qa) @ x + theta[a, 4:7]) - (
        quat_to_rot(qb) @ y + theta[b, 4:7]
    )


def _ba_normal_terms(flat_theta, n_poses, a_ids, b_ids, xs, ys, w, axis):
    """Per-point Gauss-Newton terms, summed (locally, then psum'd if sharded):
    H = sum_k w_k J_k^T J_k,  g = sum_k w_k J_k^T r_k,  cost = sum w_k|r_k|^2.

    xs/ys: (N, 3) matched points in frames a_ids/b_ids (int32 per point);
    w: (N,) weights (0 masks out padding rows in the sharded variant).
    """
    res_fn = lambda th, a, b, x, y: _point_residual(th, n_poses, a, b, x, y)
    r = jax.vmap(res_fn, in_axes=(None, 0, 0, 0, 0))(
        flat_theta, a_ids, b_ids, xs, ys
    )  # (N, 3)
    J = jax.vmap(jax.jacfwd(res_fn, argnums=0), in_axes=(None, 0, 0, 0, 0))(
        flat_theta, a_ids, b_ids, xs, ys
    )  # (N, 3, P)
    H = jnp.einsum("n,nri,nrj->ij", w, J, J)
    g = jnp.einsum("n,nri,nr->i", w, J, r)
    cost = jnp.sum(w * jnp.sum(r * r, axis=1))
    if axis is not None:
        H = jax.lax.psum(H, axis)
        g = jax.lax.psum(g, axis)
        cost = jax.lax.psum(cost, axis)
    return H, g, cost


def _flatten_correspondences(correspondences, dtype):
    a_ids, b_ids, xs, ys = [], [], [], []
    for a, b, x, y in correspondences:
        assert x.shape == y.shape and x.shape[1] == 3
        n = x.shape[0]
        a_ids.append(np.full((n,), a, np.int32))
        b_ids.append(np.full((n,), b, np.int32))
        xs.append(np.asarray(x, dtype))
        ys.append(np.asarray(y, dtype))
    return (
        np.concatenate(a_ids),
        np.concatenate(b_ids),
        np.concatenate(xs),
        np.concatenate(ys),
    )


def _ba_solve(flat0, n_poses, ba_terms_fn, *, n_iters, damping):
    """Shared LM loop: ba_terms_fn(flat) -> (H, g, cost) summed over points."""
    n_params = flat0.shape[0]
    dt = flat0.dtype
    # Gauge: pose 0 frozen via a large diagonal prior (see _optimize_jit).
    gauge = jnp.concatenate(
        [jnp.full((7,), 1e8, dt), jnp.zeros((n_params - 7,), dt)]
    )

    def qreg(flat):
        """Quaternion-norm soft constraints (H', g' contributions)."""
        H = jnp.zeros((n_params, n_params), dt)
        g = jnp.zeros((n_params,), dt)
        theta = flat.reshape(n_poses, 7)
        for p in range(n_poses):
            fn = lambda f, p=p: jnp.sum(f.reshape(n_poses, 7)[p, :4] ** 2) - 1.0
            Jq = jax.grad(fn)(flat)
            H = H + jnp.outer(Jq, Jq)
            g = g + Jq * fn(flat)
        return H, g

    def step(_, flat):
        H, g, _ = ba_terms_fn(flat)
        Hq, gq = qreg(flat)
        H = H + Hq + damping * jnp.eye(n_params, dtype=dt) + jnp.diag(gauge)
        g = g + gq
        delta = -jnp.linalg.solve(H, g)
        return flat + delta

    flat = jax.lax.fori_loop(0, n_iters, step, flat0)
    _, _, cost = ba_terms_fn(flat)
    return flat, cost


def bundle_adjust(
    poses: Sequence[Similarity],
    correspondences: Sequence[Tuple[int, int, np.ndarray, np.ndarray]],
    *,
    n_iters: int = 8,
    damping: float = 1e-6,
) -> Tuple[list[Similarity], float]:
    """Joint point-level refinement (single device).

    ``correspondences``: (scan_a, scan_b, points_in_a, points_in_b) tuples;
    row k of points_in_a/points_in_b is one matched point expressed in the
    two scan frames.
    """
    n_poses = len(poses)
    flat0 = poses_to_params(poses).reshape(-1)
    dt = flat0.dtype
    a_ids, b_ids, xs, ys = _flatten_correspondences(correspondences, np.float32)
    a_d, b_d = jnp.asarray(a_ids), jnp.asarray(b_ids)
    xs_d, ys_d = jnp.asarray(xs, dt), jnp.asarray(ys, dt)
    w_d = jnp.ones((xs.shape[0],), dt)

    @functools.partial(jax.jit, static_argnames=("n_iters",))
    def run(flat0, a, b, x, y, w, *, n_iters):
        terms = lambda f: _ba_normal_terms(f, n_poses, a, b, x, y, w, None)
        return _ba_solve(flat0, n_poses, terms, n_iters=n_iters, damping=damping)

    flat, cost = run(flat0, a_d, b_d, xs_d, ys_d, w_d, n_iters=n_iters)
    return params_to_poses(flat.reshape(n_poses, 7)), float(cost)


def bundle_adjust_sharded(
    poses: Sequence[Similarity],
    correspondences: Sequence[Tuple[int, int, np.ndarray, np.ndarray]],
    *,
    mesh=None,
    n_iters: int = 8,
    damping: float = 1e-6,
) -> Tuple[list[Similarity], float]:
    """Distributed BA: correspondences sharded over the points mesh; normal
    equations psum-reduced each Gauss-Newton step, dense solve replicated."""
    from jax.sharding import NamedSharding, PartitionSpec

    from icp_tpu.parallel.mesh import make_mesh

    mesh = mesh or make_mesh()
    axis = mesh.axis_names[0]
    n_dev = mesh.shape[axis]

    n_poses = len(poses)
    flat0 = poses_to_params(poses).reshape(-1)
    dt = flat0.dtype
    a_ids, b_ids, xs, ys = _flatten_correspondences(correspondences, np.float32)
    n = xs.shape[0]
    n_pad = -(-n // n_dev) * n_dev
    pad = n_pad - n
    a_ids = np.concatenate([a_ids, np.zeros((pad,), np.int32)])
    b_ids = np.concatenate([b_ids, np.zeros((pad,), np.int32)])
    xs = np.concatenate([xs, np.zeros((pad, 3), np.float32)])
    ys = np.concatenate([ys, np.zeros((pad, 3), np.float32)])
    w = np.concatenate([np.ones((n,), np.float32), np.zeros((pad,), np.float32)])

    row = NamedSharding(mesh, PartitionSpec(axis))
    row2 = NamedSharding(mesh, PartitionSpec(axis, None))
    rep = NamedSharding(mesh, PartitionSpec())
    args = (
        jax.device_put(flat0, rep),
        jax.device_put(a_ids, row),
        jax.device_put(b_ids, row),
        jax.device_put(xs.astype(np.float32), row2),
        jax.device_put(ys.astype(np.float32), row2),
        jax.device_put(w, row),
    )

    @functools.partial(jax.jit, static_argnames=("n_iters",))
    def run(flat0, a, b, x, y, w, *, n_iters):
        def local(flat0, a, b, x, y, w):
            terms = lambda f: _ba_normal_terms(f, n_poses, a, b, x, y, w, axis)
            return _ba_solve(
                flat0, n_poses, terms, n_iters=n_iters, damping=damping
            )

        return jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(
                PartitionSpec(),
                PartitionSpec(axis),
                PartitionSpec(axis),
                PartitionSpec(axis, None),
                PartitionSpec(axis, None),
                PartitionSpec(axis),
            ),
            out_specs=(PartitionSpec(), PartitionSpec()),
            check_vma=False,
        )(flat0, a, b, x, y, w)

    flat, cost = run(*args, n_iters=n_iters)
    return params_to_poses(np.asarray(flat).reshape(n_poses, 7)), float(cost)
