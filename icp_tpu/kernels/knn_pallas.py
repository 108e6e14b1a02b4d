"""Fused tiled k-nearest-neighbor Pallas kernel.

Generalization of the flagship correspondence kernel (``nn_pallas.py``) from a
(min, argmin) carry to a k-best carry — the enabler for normal estimation and
GICP at scale (the previous chunked ``lax.top_k`` path took 2.2 s on the
2,903-point cow; this kernel is bandwidth/VPU bound like the NN kernel).

No reference counterpart (the reference has no kNN anywhere; its NN hot loop
is ``src/cpu.cc:5-27`` / ``src/GPU/compute.cu:94-245``) — this is framework
infrastructure for the beyond-reference engines.

Design:
  * grid over (query-tile i, point-tile j), j fastest; the (TN, K) output
    blocks for query tile i stay VMEM-resident across all j.
  * per step: exact-f32 VPU broadcast distances (TN, TM) — the same 9-pass
    form as the NN kernel (dim-3 data: beats the MXU expansion and avoids the
    bf16 argmin hazard) — then K lexicographic (distance, index) extractions
    into a tile-local top-K, then a merge of carry+tile (TN, 2K) by the same
    extraction.  Results are sorted ascending by (d^2, index); ties resolve
    to the lowest point index, matching the NN kernel's contract.
  * padded point rows sit at 1e17 per coordinate (distance ~3e34 < the 3e38
    mask sentinel) and can never enter a top-K with k <= true point count.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_COORD_LANES = 8
_BIG = 3.0e38  # mask sentinel (plain float: no device alloc at import)
_INT_MAX = 2**31 - 1


def _topk_extract(d, gi, k: int):
    """K smallest (d, gi) pairs per row, lexicographic ((d, idx) ascending).

    Each extraction: row min of d, lowest index among equal-min columns, then
    the winning (d, idx) cell is masked to the sentinel.  (d, gi) pairs are
    unique by construction (indices are globally unique), so exactly one cell
    is masked per extraction.
    """
    outs_d, outs_i = [], []
    for _ in range(k):
        m = jnp.min(d, axis=1, keepdims=True)
        cand = jnp.where(d == m, gi, jnp.int32(_INT_MAX))
        win = jnp.min(cand, axis=1, keepdims=True)
        outs_d.append(m)
        outs_i.append(win)
        is_win = jnp.logical_and(d == m, gi == win)
        d = jnp.where(is_win, jnp.float32(_BIG), d)
    return jnp.concatenate(outs_d, axis=1), jnp.concatenate(outs_i, axis=1)


def _knn_kernel(q_ref, pt_ref, dist_ref, idx_ref, *, k: int):
    j = pl.program_id(1)
    tm = pt_ref.shape[1]

    # Exact-f32 VPU broadcast distances (see nn_pallas._nn_kernel).
    d = jnp.zeros((q_ref.shape[0], tm), jnp.float32)
    for c in range(3):
        diff = q_ref[:, c][:, None] - pt_ref[c, :][None, :]
        d = d + diff * diff

    col = jax.lax.broadcasted_iota(jnp.int32, d.shape, dimension=1)
    tile_d, tile_i = _topk_extract(d, col + j * tm, k)

    @pl.when(j == 0)
    def _init():
        dist_ref[:] = tile_d
        idx_ref[:] = tile_i

    @pl.when(j > 0)
    def _fold():
        md = jnp.concatenate([dist_ref[:], tile_d], axis=1)
        mi = jnp.concatenate([idx_ref[:], tile_i], axis=1)
        d_out, i_out = _topk_extract(md, mi, k)
        dist_ref[:] = d_out
        idx_ref[:] = i_out


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def knn_pallas(
    query: jax.Array,
    points: jax.Array,
    k: int,
    *,
    query_tile: int = 256,
    point_tile: int = 1024,
    interpret: bool | None = None,
):
    """k nearest ``points`` for each ``query`` row (both (N, 3) / (M, 3)).

    Returns ``(d2, idx)``: (N, k) squared distances and point indices, sorted
    ascending by (distance, index).  Exact f32 distances; ties resolve to the
    lowest point index.  Requires ``k <= len(points)``.

    ``interpret=None`` auto-selects compiled-on-TPU / interpreter elsewhere
    (how the CPU test suite exercises the kernel).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, dim = query.shape
    m = points.shape[0]
    assert dim == 3, f"expected 3-D points, got {dim}"
    if k > m:
        raise ValueError(f"k={k} exceeds point count {m}")
    dt = jnp.float32
    query = query.astype(dt)
    points = points.astype(dt)

    tn = min(query_tile, _round_up(n, 8))
    tm = max(min(point_tile, _round_up(m, 128)), _round_up(k, 128))
    n_pad = _round_up(n, tn)
    m_pad = _round_up(m, tm)

    q_p = jnp.zeros((n_pad, _COORD_LANES), dt).at[:n, :3].set(query)
    pt_p = jnp.zeros((m_pad, _COORD_LANES), dt).at[m:, :3].set(1.0e17)
    pt_p = pt_p.at[:m, :3].set(points)
    pt_t = pt_p.T  # (8, Mp)

    grid = (n_pad // tn, m_pad // tm)
    dist, idx = pl.pallas_call(
        functools.partial(_knn_kernel, k=k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tn, _COORD_LANES), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_COORD_LANES, tm), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tn, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, k), dt),
            jax.ShapeDtypeStruct((n_pad, k), jnp.int32),
        ],
        interpret=interpret,
    )(q_p, pt_t)
    return dist[:n], idx[:n]
