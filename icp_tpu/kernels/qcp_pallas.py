"""Fused Horn 4x4 solve as a single Pallas kernel (scalar core).

Why this exists: the QCP solve (characteristic-polynomial Newton + adjugate
eigenvector + rotation construction) is ~300 dependent scalar ops.  Expressed
in XLA at shape (), that chain costs ~94 us per ICP iteration on v5e (each
scalar op is dispatched individually) — more than the whole 2903^2
correspondence search.  Inside one Pallas kernel the same chain runs on the
scalar core in a single dispatch: ~2 us.

Contract (same math as ``icp_tpu.ops.alignment.max_eigvec_qcp`` +
``quat_to_rot``; equivalence is pinned by tests):
  input  (1, 16) f32 SMEM: [S00..S22 (row major), gp, gy, 0, 0, 0, 0, 0]
  output (1, 16) f32 SMEM: [R00..R22 (row major), q0..q3, lambda, 0, 0]

The reference computes this on the host with Eigen every iteration
(``src/GPU/gpu.cc:113``); here it never leaves the chip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEWTON_ITERS = 12
_POWER_ITERS = 2


def _qcp_kernel(in_ref, out_ref):
    f = lambda i: in_ref[0, i]
    S = [[f(3 * r + c) for c in range(3)] for r in range(3)]
    gp, gy = f(9), f(10)
    R, q, lam = _qcp_rotation_scalar(S, gp, gy)
    for r in range(3):
        for c in range(3):
            out_ref[0, 3 * r + c] = R[r][c]
    for k in range(4):
        out_ref[0, 9 + k] = q[k]
    out_ref[0, 13] = lam
    out_ref[0, 14] = 0.0
    out_ref[0, 15] = 0.0


def alignment_update_scalars(Spy, sum_p, sum_y, sum_pp, sum_yy, n,
                             prev_s, prev_R, prev_t, *, with_scale):
    """Whole per-iteration alignment update as scalar math (shared by the
    standalone alignment kernel below and the fully-fused ICP iteration
    kernel in ``kernels/icp_fused.py``).

    Inputs are raw sufficient statistics (``Spy`` = sum p y^T as a 3x3 nested
    scalar list) plus the previous cumulative transform.  Returns
    ``(s, R, t, s_tot, R_tot, t_tot, residual_sum, lambda)``.

    Computes centroids via the shift identities, runs the QCP solve, builds
    (s, R, t), and composes with the previous cumulative transform — all the
    scalar work of an ICP iteration that XLA would otherwise dispatch as
    ~hundreds of individual ops.
    """
    inv_n = 1.0 / n
    mu_p = [v * inv_n for v in sum_p]
    mu_y = [v * inv_n for v in sum_y]
    # S = sum p y^T - n mu_p mu_y^T ; gp/gy via the same shift identity.
    S = [[Spy[r][c] - n * mu_p[r] * mu_y[c] for c in range(3)] for r in range(3)]
    gp = sum_pp - n * (mu_p[0] ** 2 + mu_p[1] ** 2 + mu_p[2] ** 2)
    gy = sum_yy - n * (mu_y[0] ** 2 + mu_y[1] ** 2 + mu_y[2] ** 2)

    R, _, lam = _qcp_rotation_scalar(S, gp, gy)

    s = jnp.sqrt(jnp.maximum(gy / jnp.maximum(gp, 1e-30), 0.0)) if with_scale else jnp.float32(1.0)
    t = [mu_y[r] - s * (R[r][0] * mu_p[0] + R[r][1] * mu_p[1] + R[r][2] * mu_p[2])
         for r in range(3)]

    # Compose with the previous cumulative transform (this step applied AFTER
    # prev): s_tot = s*prev_s; R_tot = R prev_R; t_tot = s R prev_t + t.
    s_tot = s * prev_s
    R_tot = [[R[r][0] * prev_R[0][c] + R[r][1] * prev_R[1][c] + R[r][2] * prev_R[2][c]
              for c in range(3)] for r in range(3)]
    t_tot = [s * (R[r][0] * prev_t[0] + R[r][1] * prev_t[1] + R[r][2] * prev_t[2]) + t[r]
             for r in range(3)]
    # Residual of the NEW transform in closed form (Horn): at the optimum,
    # sum ||y - (s R p + t)||^2 = gy + s^2 gp - 2 s lambda_max.  Saves a full
    # (N, 3) reduction pass per iteration.  f32 cancellation floor is
    # ~ulp(gy), well below the 1e-5 convergence threshold at dataset scale.
    resid = jnp.maximum(gy + s * s * gp - 2.0 * s * lam, 0.0)
    return s, R, t, s_tot, R_tot, t_tot, resid, lam


def write_state_block(out_ref, s, R, t, s_tot, R_tot, t_tot, resid, lam):
    """Write the (1, 32) state-block layout: [s_step, R_step(9), t_step(3),
    s_tot, R_tot(9), t_tot(3), residual_sum, lambda, 0...] — slots 13..25 are
    what the next iteration reads back as ``prev``."""
    out_ref[0, 0] = s
    for r in range(3):
        for c in range(3):
            out_ref[0, 1 + 3 * r + c] = R[r][c]
    for r in range(3):
        out_ref[0, 10 + r] = t[r]
    out_ref[0, 13] = s_tot
    for r in range(3):
        for c in range(3):
            out_ref[0, 14 + 3 * r + c] = R_tot[r][c]
    for r in range(3):
        out_ref[0, 23 + r] = t_tot[r]
    out_ref[0, 26] = resid
    out_ref[0, 27] = lam
    for k in range(28, 32):
        out_ref[0, k] = 0.0


def read_prev_transform(prev_ref):
    """Read (s_tot, R_tot, t_tot) scalars from a (1, 32) state-block ref."""
    g = lambda i: prev_ref[0, i]
    prev_s = g(13)
    prev_R = [[g(14 + 3 * r + c) for c in range(3)] for r in range(3)]
    prev_t = [g(23), g(24), g(25)]
    return prev_s, prev_R, prev_t


def _alignment_step_kernel(stats_ref, prev_ref, out_ref, *, with_scale):
    """Standalone alignment-update kernel (one scalar-core dispatch).

    stats input (1, 32): [sum_py(9), sum_p(3), sum_y(3), sum_pp, sum_yy, n]
    prev input  (1, 32): the PREVIOUS iteration's output block (identity-
                         packed at loop start) — the loop carries this block
                         verbatim, so no per-iteration repacking is needed.
    output      (1, 32): see ``write_state_block``.
    """
    f = lambda i: stats_ref[0, i]
    Spy = [[f(3 * r + c) for c in range(3)] for r in range(3)]
    sum_p = [f(9), f(10), f(11)]
    sum_y = [f(12), f(13), f(14)]
    sum_pp, sum_yy, n = f(15), f(16), f(17)
    prev_s, prev_R, prev_t = read_prev_transform(prev_ref)
    out = alignment_update_scalars(Spy, sum_p, sum_y, sum_pp, sum_yy, n,
                                   prev_s, prev_R, prev_t,
                                   with_scale=with_scale)
    write_state_block(out_ref, *out)


def _qcp_rotation_scalar(S, gp, gy):
    """Scalar-form QCP: S as 3x3 nested scalars -> rotation R (nested list).

    Shared by both kernels; same math as the array-form ``max_eigvec_qcp``.

    Scale normalization: the adjugate's cofactors are cubic in |S|, so for
    large clouds (|S| ~ 1e7 at 1M points) their squared norms overflow f32
    (~1e42).  The eigenvector is invariant under uniform scaling of S, so the
    whole solve runs on S/(gp+gy); the returned lambda is re-scaled so the
    closed-form residual stays correct.
    """
    total = jnp.maximum(gp + gy, 1e-30)
    norm = 1.0 / total
    S = [[S[r][c] * norm for c in range(3)] for r in range(3)]
    gp = gp * norm
    gy = gy * norm
    S00, S01, S02 = S[0]
    S10, S11, S12 = S[1]
    S20, S21, S22 = S[2]

    tr = S00 + S11 + S22
    A = S12 - S21
    B = S20 - S02
    C = S01 - S10
    N = [
        [tr, A, B, C],
        [A, S00 - S11 - S22, S01 + S10, S02 + S20],
        [B, S01 + S10, S11 - S00 - S22, S12 + S21],
        [C, S02 + S20, S12 + S21, S22 - S00 - S11],
    ]
    c2 = -2.0 * (
        S00 * S00 + S01 * S01 + S02 * S02
        + S10 * S10 + S11 * S11 + S12 * S12
        + S20 * S20 + S21 * S21 + S22 * S22
    )
    detS = (
        S00 * (S11 * S22 - S12 * S21)
        - S01 * (S10 * S22 - S12 * S20)
        + S02 * (S10 * S21 - S11 * S20)
    )
    c1 = -8.0 * detS

    def minor3(M, rows, cols):
        (r0, r1, r2), (c0_, c1_, c2_) = rows, cols
        return (
            M[r0][c0_] * (M[r1][c1_] * M[r2][c2_] - M[r1][c2_] * M[r2][c1_])
            - M[r0][c1_] * (M[r1][c0_] * M[r2][c2_] - M[r1][c2_] * M[r2][c0_])
            + M[r0][c2_] * (M[r1][c0_] * M[r2][c1_] - M[r1][c1_] * M[r2][c0_])
        )

    c0 = jnp.float32(0.0)
    for j in range(4):
        cols = tuple(c for c in range(4) if c != j)
        c0 = c0 + ((-1.0) ** j) * N[0][j] * minor3(N, (1, 2, 3), cols)

    lam = jnp.sqrt(jnp.maximum(gp * gy, 0.0))
    for _ in range(_NEWTON_ITERS):
        p = ((lam * lam + c2) * lam + c1) * lam + c0
        dp = (4.0 * lam * lam + 2.0 * c2) * lam + c1
        dp = jnp.where(jnp.abs(dp) < 1e-30, 1.0, dp)
        lam = lam - p / dp

    M = [[N[i][j] - jnp.where(i == j, lam, 0.0) for j in range(4)] for i in range(4)]
    adj = [[None] * 4 for _ in range(4)]
    for i in range(4):
        r = tuple(x for x in range(4) if x != i)
        for j in range(4):
            c = tuple(x for x in range(4) if x != j)
            adj[j][i] = ((-1.0) ** (i + j)) * minor3(M, r, c)

    norms = [
        adj[0][j] ** 2 + adj[1][j] ** 2 + adj[2][j] ** 2 + adj[3][j] ** 2
        for j in range(4)
    ]
    best = norms[0]
    q = [adj[0][0], adj[1][0], adj[2][0], adj[3][0]]
    for j in range(1, 4):
        take = norms[j] > best
        best = jnp.where(take, norms[j], best)
        q = [jnp.where(take, adj[k][j], q[k]) for k in range(4)]
    # degenerate-adjugate rescue: branchless select of an all-ones seed (an
    # unconditional epsilon would contaminate the healthy case — see
    # max_eigvec_qcp)
    degenerate = best < 1e-16
    q = [jnp.where(degenerate, 1.0, qk) for qk in q]
    shift = jnp.sqrt(jnp.maximum(gp * gy, 0.0)) + 1.0
    for _ in range(_POWER_ITERS):
        w = [sum(N[i][j] * q[j] for j in range(4)) + shift * q[i] for i in range(4)]
        inv = jax.lax.rsqrt(jnp.maximum(w[0] ** 2 + w[1] ** 2 + w[2] ** 2 + w[3] ** 2, 1e-30))
        q = [wi * inv for wi in w]
    inv = jax.lax.rsqrt(jnp.maximum(q[0] ** 2 + q[1] ** 2 + q[2] ** 2 + q[3] ** 2, 1e-30))
    w_, x_, y_, z_ = q[0] * inv, q[1] * inv, q[2] * inv, q[3] * inv
    R = [
        [w_ * w_ + x_ * x_ - y_ * y_ - z_ * z_, 2.0 * (x_ * y_ - w_ * z_), 2.0 * (x_ * z_ + w_ * y_)],
        [2.0 * (x_ * y_ + w_ * z_), w_ * w_ - x_ * x_ + y_ * y_ - z_ * z_, 2.0 * (y_ * z_ - w_ * x_)],
        [2.0 * (x_ * z_ - w_ * y_), 2.0 * (y_ * z_ + w_ * x_), w_ * w_ - x_ * x_ - y_ * y_ + z_ * z_],
    ]
    return R, (w_, x_, y_, z_), lam * total  # un-scale lambda for callers


def pack_stats(stats) -> jax.Array:
    """AlignmentStats -> (1, 32) f32 kernel input (one concatenate)."""
    dt = jnp.float32
    return jnp.concatenate(
        [
            stats.sum_py.astype(dt).reshape(-1),
            stats.sum_p.astype(dt),
            stats.sum_y.astype(dt),
            stats.sum_pp.astype(dt).reshape(1),
            stats.sum_yy.astype(dt).reshape(1),
            stats.n.astype(dt).reshape(1),
            jnp.zeros((14,), dt),
        ]
    ).reshape(1, 32)


def identity_state() -> jax.Array:
    """(1, 32) state block encoding the identity cumulative transform."""
    out = jnp.zeros((1, 32), jnp.float32)
    out = out.at[0, 13].set(1.0)  # s_tot
    for k in range(3):
        out = out.at[0, 14 + 4 * k].set(1.0)  # R_tot = I (slots 14, 18, 22)
    return out


def pack_total_state(sim) -> jax.Array:
    """(1, 32) state block whose cumulative transform is ``sim`` — the
    warm-start / resume entry point for the fused loop."""
    dt = jnp.float32
    out = jnp.zeros((1, 32), dt)
    out = out.at[0, 13].set(jnp.asarray(sim.s, dt))
    out = out.at[0, 14:23].set(jnp.asarray(sim.R, dt).reshape(-1))
    out = out.at[0, 23:26].set(jnp.asarray(sim.t, dt))
    return out


def unpack_state(state: jax.Array):
    """(step Similarity, total Similarity, residual_sum) from a state block."""
    from icp_tpu.ops.alignment import Similarity

    step = Similarity(
        s=state[0, 0], R=state[0, 1:10].reshape(3, 3), t=state[0, 10:13]
    )
    total = Similarity(
        s=state[0, 13], R=state[0, 14:23].reshape(3, 3), t=state[0, 23:26]
    )
    return step, total, state[0, 26]


def alignment_step_state_pallas(stats_packed: jax.Array, prev_state: jax.Array,
                                *, with_scale: bool = True,
                                interpret: bool = False) -> jax.Array:
    """State-block form: (packed stats, previous state block) -> new state
    block.  The ICP loop carries the block verbatim between iterations — zero
    repacking cost per iteration."""
    return pl.pallas_call(
        functools.partial(_alignment_step_kernel, with_scale=with_scale),
        in_specs=[
            pl.BlockSpec((1, 32), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 32), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 32), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 32), jnp.float32),
        interpret=interpret,
    )(stats_packed, prev_state)


def alignment_step_pallas(stats, prev_sim, *, with_scale: bool = True,
                          interpret: bool = False):
    """(AlignmentStats, previous Similarity) -> (step Similarity,
    composed Similarity, residual_sum) in one kernel dispatch."""
    dt = jnp.float32
    prev = jnp.zeros((1, 32), dt)
    prev = prev.at[0, 13].set(prev_sim.s.astype(dt))
    prev = prev.at[0, 14:23].set(prev_sim.R.astype(dt).reshape(-1))
    prev = prev.at[0, 23:26].set(prev_sim.t.astype(dt))
    out = alignment_step_state_pallas(
        pack_stats(stats), prev, with_scale=with_scale, interpret=interpret
    )
    return unpack_state(out)


def horn_rotation_pallas(S: jax.Array, gp: jax.Array, gy: jax.Array,
                         *, interpret: bool = False):
    """Rotation matrix (3,3) from the cross-covariance via the fused kernel.

    Also returns (q, lambda_max) for diagnostics.  Not jitted here: nested
    jit around pallas_call inside outer loop bodies trips a jax-0.9.0
    lowering-cache bug when combined with a second pallas kernel.
    """
    dt = jnp.float32
    packed = jnp.zeros((1, 16), dt)
    packed = packed.at[0, :9].set(S.astype(dt).reshape(-1))
    packed = packed.at[0, 9].set(gp.astype(dt))
    packed = packed.at[0, 10].set(gy.astype(dt))
    out = pl.pallas_call(
        _qcp_kernel,
        in_specs=[pl.BlockSpec((1, 16), memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, 16), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 16), dt),
        interpret=interpret,
    )(packed)
    R = out[0, :9].reshape(3, 3)
    q = out[0, 9:13]
    lam = out[0, 13]
    return R, q, lam
