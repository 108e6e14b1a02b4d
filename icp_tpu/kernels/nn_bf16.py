"""bf16-MXU prefiltered NN: approximate argmin + exact-f32 recheck + margin
certification (VERDICT r2 next-step #5).

Hypothesis under test: the exact dense kernels are VPU-roofline-bound
(docs/PERF.md), and the MXU's single-pass bf16 throughput (6x fewer passes
than the exact ``precision=HIGHEST`` expansion) could buy a cheaper distance
tile for mid-size clouds.  The catch (predicted by PERF.md, measured here):
bf16 rounds the CROSS TERM to ~8 bits, an ABSOLUTE error of
``O(2^-8 * |p| * |m|)`` — independent of how small the true distances are —
so near convergence, where NN distances collapse toward 0, the approximate
argmin flips freely among all candidates within that error band.

Design (one fused kernel, same tiling as ``nn_pallas``):
  * distance tile ``d~ = ||m||^2 - 2 fl16(p) . fl16(m)``: the norm term is
    exact f32 (precomputed), only the cross term rides the single-pass bf16
    MXU; f32 accumulation.
  * fold carry per scene point: (best d~, second-best d~, argmin index,
    EXACT f32 distance to the winner).  The winner's model row is gathered
    in-kernel by the exact one-hot matmul and its true distance recomputed
    in f32 — so the reported distance is always exact for the reported
    index, and therefore a valid upper bound on the true NN distance
    (usable as a grid-engine culling bound).
  * certification: with ``B`` the rigorous cross-term error bound (host
    side, from coordinate maxima), ``second - best > 2B`` proves no other
    model point can beat the winner -> the argmin is EXACT for that point.
    The certified mask is the measurement instrument: its decay across ICP
    iterations quantifies the hazard.

Error bound derivation (round-to-nearest, bf16 unit roundoff u = 2^-8):
``|fl(p)fl(m) - pm| <= (2u + u^2)|p||m|`` per element; summed over 3
coordinates and doubled by the -2 factor:
``|d~ - d_norm_exact| <= 2 * 2.01u * 3 * Pmax * Mmax`` where Pmax/Mmax are
the largest absolute coordinates.  ``_BF16_BOUND_FACTOR = 16u`` (> 12.06u)
also absorbs the f32 accumulation residue with slack.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_COORD_LANES = 8
_BIG = 3.0e38
_INT_MAX = 2**31 - 1
_BF16_U = 2.0 ** -8
_BF16_BOUND_FACTOR = 16.0 * _BF16_U


def cross_term_bound(scene: jax.Array, model: jax.Array) -> jax.Array:
    """Rigorous f32 bound on |d~ - d| from bf16 cross-term rounding."""
    pmax = jnp.max(jnp.abs(scene.astype(jnp.float32)))
    mmax = jnp.max(jnp.abs(model.astype(jnp.float32)))
    return jnp.asarray(_BF16_BOUND_FACTOR, jnp.float32) * pmax * mmax


def _nn_bf16_kernel(p_ref, pb_ref, mt_ref, mb_ref, mnorm_ref,
                    best_ref, second_ref, idx_ref, dex_ref):
    j = pl.program_id(1)
    tm = mt_ref.shape[1]

    # approximate distance tile: exact-f32 norm term, single-pass bf16 MXU
    # cross term (the 6x-cheaper pass this kernel exists to measure)
    prod = jax.lax.dot_general(
        pb_ref[:],
        mb_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    d = mnorm_ref[:] - 2.0 * prod  # (TN, TM)

    # tile-local (best, second, argmin) with lowest-index tie-breaking
    m1 = jnp.min(d, axis=1, keepdims=True)
    col = jax.lax.broadcasted_iota(jnp.int32, d.shape, dimension=1)
    masked = jnp.where(d == m1, col, jnp.int32(_INT_MAX))
    arg = jnp.min(masked, axis=1, keepdims=True)
    is_win = jnp.logical_and(d == m1, col == arg)
    m2 = jnp.min(jnp.where(is_win, jnp.float32(_BIG), d), axis=1,
                 keepdims=True)
    gidx = arg + j * tm

    # exact f32 distance to the tile winner: one-hot gather (exact 0/1
    # matmul) + rowwise residual on the (TN, 8) slab — negligible VPU work
    onehot = is_win.astype(jnp.float32)
    pt = jax.lax.dot_general(
        onehot,
        mt_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (TN, 8); coord lanes 3..7 are zero in both operands
    diff = p_ref[:] - pt
    dex = jnp.sum(diff * diff, axis=1, keepdims=True)

    @pl.when(j == 0)
    def _init():
        best_ref[:] = m1
        second_ref[:] = m2
        idx_ref[:] = gidx
        dex_ref[:] = dex

    @pl.when(j > 0)
    def _fold():
        b_old, s_old = best_ref[:], second_ref[:]
        better = m1 < b_old  # strict <: earlier tile wins approx ties
        # global second-best of the union {b_old, s_old, m1, m2}
        second_ref[:] = jnp.minimum(
            jnp.maximum(m1, b_old), jnp.minimum(m2, s_old)
        )
        best_ref[:] = jnp.where(better, m1, b_old)
        idx_ref[:] = jnp.where(better, gidx, idx_ref[:])
        dex_ref[:] = jnp.where(better, dex, dex_ref[:])


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def closest_point_indices_bf16(
    scene: jax.Array,
    model: jax.Array,
    *,
    scene_tile: int = 256,
    model_tile: int = 4096,
    interpret: bool | None = None,
    center: bool = True,
):
    """Approximate NN via bf16-MXU prefilter with exact recheck.

    Returns ``(idx, d_exact, certified)``:
      * ``idx`` (N,) int32 — bf16-approximate argmin (ties/flips confined to
        candidates within ``2B`` of the winner, ``B = cross_term_bound``);
      * ``d_exact`` (N,) f32 — EXACT squared distance to ``model[idx]``
        (always a valid upper bound on the true NN distance);
      * ``certified`` (N,) bool — True where the margin proves ``idx`` IS
        the exact NN.

    ``center=True`` subtracts the model centroid from both clouds first
    (distance-preserving up to f32 rounding of the shift) — coordinates
    become O(spread) instead of O(offset), shrinking ``B`` by the offset
    ratio for free.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, dim = scene.shape
    m = model.shape[0]
    assert dim == 3, f"expected 3-D points, got {dim}"
    dt = jnp.float32
    scene = scene.astype(dt)
    model = model.astype(dt)
    if center:
        c = jnp.mean(model, axis=0)
        scene = scene - c
        model = model - c
    bound = cross_term_bound(scene, model)

    tn = min(scene_tile, _round_up(n, 8))
    tm = min(model_tile, _round_up(m, 128))
    n_pad = _round_up(n, tn)
    m_pad = _round_up(m, tm)

    p_p = jnp.zeros((n_pad, _COORD_LANES), dt).at[:n, :3].set(scene)
    m_p = jnp.zeros((m_pad, _COORD_LANES), dt).at[m:, :3].set(1.0e17)
    m_p = m_p.at[:m, :3].set(model)
    mt = m_p.T  # (8, Mp)
    mnorm = jnp.sum(mt * mt, axis=0, keepdims=True)  # exact f32 (1, Mp)
    pb = p_p.astype(jnp.bfloat16)
    mb = mt.astype(jnp.bfloat16)

    grid = (n_pad // tn, m_pad // tm)
    row = lambda i, j: (i, 0)  # noqa: E731
    best, second, idx, dex = pl.pallas_call(
        _nn_bf16_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tn, _COORD_LANES), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, _COORD_LANES), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((_COORD_LANES, tm), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_COORD_LANES, tm), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tn, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 1), row, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 1), dt),
            jax.ShapeDtypeStruct((n_pad, 1), dt),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((n_pad, 1), dt),
        ],
        interpret=interpret,
    )(p_p, pb, mt, mb, mnorm)
    best, second = best[:n, 0], second[:n, 0]
    certified = (second - best) > 2.0 * bound
    return idx[:n, 0], dex[:n, 0], certified
