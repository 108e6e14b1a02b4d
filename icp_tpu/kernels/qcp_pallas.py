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
    S00, S01, S02 = f(0), f(1), f(2)
    S10, S11, S12 = f(3), f(4), f(5)
    S20, S21, S22 = f(6), f(7), f(8)
    gp, gy = f(9), f(10)

    # Horn's symmetric traceless N-matrix (reference src/cpu.cc:121-126).
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

    # Characteristic polynomial l^4 + c2 l^2 + c1 l + c0 (traceless).
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

    # Newton from the Cauchy-Schwarz upper bound sqrt(gp*gy) >= lambda_max.
    lam = jnp.sqrt(jnp.maximum(gp * gy, 0.0))
    for _ in range(_NEWTON_ITERS):
        p = ((lam * lam + c2) * lam + c1) * lam + c0
        dp = (4.0 * lam * lam + 2.0 * c2) * lam + c1
        dp = jnp.where(jnp.abs(dp) < 1e-30, 1.0, dp)
        lam = lam - p / dp

    # Eigenvector = max-norm column of adj(N - lam I)  (adj = c v v^T).
    M = [[N[i][j] - jnp.where(i == j, lam, 0.0) for j in range(4)] for i in range(4)]
    adj = [[None] * 4 for _ in range(4)]
    for i in range(4):
        r = tuple(x for x in range(4) if x != i)
        for j in range(4):
            c = tuple(x for x in range(4) if x != j)
            adj[j][i] = ((-1.0) ** (i + j)) * minor3(M, r, c)  # transpose

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
    # Degenerate-adjugate rescue + power-iteration polish on the PSD shift.
    q = [qk + 1e-6 for qk in q]
    shift = jnp.sqrt(jnp.maximum(gp * gy, 0.0)) + 1.0
    for _ in range(_POWER_ITERS):
        w = [
            sum(N[i][j] * q[j] for j in range(4)) + shift * q[i]
            for i in range(4)
        ]
        inv = jax.lax.rsqrt(jnp.maximum(w[0] ** 2 + w[1] ** 2 + w[2] ** 2 + w[3] ** 2, 1e-30))
        q = [wi * inv for wi in w]
    inv = jax.lax.rsqrt(jnp.maximum(q[0] ** 2 + q[1] ** 2 + q[2] ** 2 + q[3] ** 2, 1e-30))
    w_, x_, y_, z_ = q[0] * inv, q[1] * inv, q[2] * inv, q[3] * inv

    # Rotation (same algebra as the reference's q_bar^H q_caps block).
    out_ref[0, 0] = w_ * w_ + x_ * x_ - y_ * y_ - z_ * z_
    out_ref[0, 1] = 2.0 * (x_ * y_ - w_ * z_)
    out_ref[0, 2] = 2.0 * (x_ * z_ + w_ * y_)
    out_ref[0, 3] = 2.0 * (x_ * y_ + w_ * z_)
    out_ref[0, 4] = w_ * w_ - x_ * x_ + y_ * y_ - z_ * z_
    out_ref[0, 5] = 2.0 * (y_ * z_ - w_ * x_)
    out_ref[0, 6] = 2.0 * (x_ * z_ - w_ * y_)
    out_ref[0, 7] = 2.0 * (y_ * z_ + w_ * x_)
    out_ref[0, 8] = w_ * w_ - x_ * x_ - y_ * y_ + z_ * z_
    out_ref[0, 9] = w_
    out_ref[0, 10] = x_
    out_ref[0, 11] = y_
    out_ref[0, 12] = z_
    out_ref[0, 13] = lam
    out_ref[0, 14] = 0.0
    out_ref[0, 15] = 0.0


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
