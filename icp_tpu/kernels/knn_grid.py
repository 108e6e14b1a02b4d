"""Spatially-pruned exact kNN: kd-tile culling + k-best DMA work-list kernel.

Composition of the two round-2 kernels: ``knn_pallas.py``'s k-best
lexicographic-extraction carry inside ``nn_grid.py``'s work-list structure
(one grid step per query tile, candidate model tiles DMA-ed HBM->VMEM with
double buffering).  This is what makes normal estimation — and therefore
point-to-plane/GICP — tractable at 1M+ points: dense kNN is O(N*M) with a
k-pass extraction per tile, the pruned version folds only the few tiles that
can hold a true k-nearest neighbor.

Two-phase bound scheme (kNN has no previous-iteration bound to carry):
  1. **Seed**: fold each query tile against its C0 nearest model tiles (by
     bbox distance).  The per-point k-th best distance from REAL points is a
     valid upper bound on the true k-th NN distance.
  2. **Cull + exact pass**: a model tile survives only if its bbox distance
     beats the query tile's max seed bound; fold the survivors.  A query
     tile whose candidate count exceeds the table capacity folds ALL model
     tiles in-kernel — a per-tile fallback, so one unlucky tile (e.g. an
     isolated point with a huge k-th-NN ball) degrades only itself, not the
     whole pass (a global dense fallback cost 30x on a 1M cloud where one
     tile overflowed — measured).

Exactness: every true k-nearest neighbor lies in a tile whose bbox distance
is <= the true k-th distance <= the seed bound; deflate/inflate margins
absorb f32 rounding; the overflow path folds a superset.  Ties resolve to
the lowest ORIGINAL index — ``knn_pallas``'s contract (tests pin equality).

No reference counterpart (the reference has no kNN anywhere).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from icp_tpu.kernels.knn_pallas import _topk_extract
from icp_tpu.kernels.nn_grid import (
    ModelGrid,
    _COORD_LANES,
    _UPPER_INFLATE,
    _round_up,
    tile_box_dists,
)

_BIG = 3.0e38
_INT_MAX = 2**31 - 1


def _knn_worklist_kernel(k, nj, cand_ref, cnt_ref, q_ref, model_hbm, dist_ref,
                         idx_ref, scratch, sems):
    """One grid step = ONE query tile: fold its candidate model tiles with a
    (TN, K) k-best carry, DMA-ing each tile HBM->VMEM with double buffering
    (same structure as ``nn_grid._pruned_kernel``; same (8, cap) SMEM
    candidate window).

    Per-tile overflow fallback: a query tile whose candidate count exceeds
    the table capacity folds ALL ``nj`` model tiles (ids = step index) — a
    superset of its candidates, so still exact.  Only the unlucky tile pays;
    a global dense fallback cost 30x on a 1M cloud where ONE tile
    overflowed (measured)."""
    tn = q_ref.shape[0]
    tm = scratch.shape[2]
    cap = cand_ref.shape[1]
    r = jax.lax.rem(pl.program_id(0), jnp.int32(8))
    cnt_raw = cnt_ref[r, 0]
    use_all = cnt_raw > cap
    cnt = jnp.where(use_all, jnp.int32(nj), jnp.maximum(cnt_raw, 1))

    def get_dma(slot, c):
        tile = jnp.where(use_all, c, cand_ref[r, jnp.minimum(c, cap - 1)])
        return pltpu.make_async_copy(
            model_hbm.at[tile],
            scratch.at[slot],
            sems.at[slot],
        )

    get_dma(0, 0).start()

    def fold(c, carry):
        best_d, best_i = carry  # (TN, K) f32 / i32, ascending (d, idx)
        slot = jax.lax.rem(c, jnp.int32(2))

        @pl.when(c + 1 < cnt)
        def _():
            get_dma(jax.lax.rem(c + jnp.int32(1), jnp.int32(2)), c + 1).start()

        get_dma(slot, c).wait()
        rows = scratch[slot]  # (8, tm): sublanes 0-2 coords, 3 orig index
        d = jnp.zeros((tn, tm), jnp.float32)
        for ax in range(3):
            diff = q_ref[:, ax][:, None] - rows[ax, :][None, :]
            d = d + diff * diff
        # original index (exact-integer f32 below 2^24; pad rows carry _BIG,
        # which saturates to INT_MAX — their ~1e34 distances keep them out
        # of any top-k with k <= real point count)
        gi = jnp.broadcast_to(rows[3, :][None, :], d.shape).astype(jnp.int32)
        td, ti = _topk_extract(d, gi, k)
        md = jnp.concatenate([best_d, td], axis=1)
        mi = jnp.concatenate([best_i, ti], axis=1)
        return _topk_extract(md, mi, k)

    init = (
        jnp.full((tn, k), jnp.float32(_BIG)),
        jnp.full((tn, k), jnp.int32(_INT_MAX)),
    )
    best_d, best_i = jax.lax.fori_loop(0, cnt, fold, init)
    dist_ref[:] = best_d
    idx_ref[:] = best_i


def _run_worklist(q_pad, cand, counts_k, grid: ModelGrid, k: int, *,
                  scene_tile: int, interpret: bool):
    n_pad = q_pad.shape[0]
    tn = scene_tile
    ni = n_pad // tn
    cap = cand.shape[1]
    tm = grid.model_tile
    nj = grid.tile_lo.shape[0]
    ni8 = _round_up(ni, 8)
    if ni8 > ni:
        cand = jnp.pad(cand, ((0, ni8 - ni), (0, 0)))
        counts_k = jnp.pad(counts_k, ((0, ni8 - ni), (0, 0)))
    return pl.pallas_call(
        functools.partial(_knn_worklist_kernel, k, nj),
        grid=(ni,),
        in_specs=[
            pl.BlockSpec((8, cap), lambda i: (i // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, 1), lambda i: (i // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((None, tn, _COORD_LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((tn, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, _COORD_LANES, tm), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(cand, counts_k, q_pad.reshape(ni, tn, _COORD_LANES), grid.tiles_t)


def knn_grid(
    query: jax.Array,
    grid: ModelGrid,
    k: int,
    *,
    scene_tile: int = 256,
    max_candidates: int = 16,
    interpret: bool | None = None,
):
    """Exact k nearest model points per query row, with tile culling.

    Returns ``(d2, idx)``: (N, k) squared distances and ORIGINAL model
    indices, ascending by (distance, index) — identical to
    ``knn_pallas(query, grid.model_orig, k)`` (query tiles whose candidate
    set overflows the table fold every model tile in-kernel, so the result
    is exact regardless).  ``query`` should be spatially coherent
    (kd-sorted) for pruning to bite; correctness never depends on it.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = query.shape[0]
    m = grid.model_orig.shape[0]
    if k > m:
        raise ValueError(f"k={k} exceeds point count {m}")
    dt = jnp.float32
    query = query.astype(dt)

    tn = min(scene_tile, _round_up(n, 8))
    n_pad = _round_up(n, tn)
    ni = n_pad // tn
    nj = grid.tile_lo.shape[0]
    tm = grid.model_tile

    q_pad = jnp.zeros((n_pad, _COORD_LANES), dt)
    q_pad = q_pad.at[:n, :3].set(query)
    if n_pad > n:
        q_pad = q_pad.at[n:, :3].set(query[-1])

    bd2 = tile_box_dists(q_pad, grid, scene_tile=tn)  # (Ni, Nj)

    # Phase 1 — seed bounds: the C0 nearest tiles must hold >= k real points
    # for the bound to be finite-tight (a shortfall only loosens the bound
    # and at worst triggers the per-tile fold-everything path).
    c0 = min(nj, max(2, -(-k // tm) + 1))
    order = jnp.argsort(bd2, axis=1)[:, :c0].astype(jnp.int32)  # (Ni, C0)
    counts0 = jnp.full((ni, 1), c0, jnp.int32)
    d_seed, _ = _run_worklist(q_pad, order, counts0, grid, k,
                              scene_tile=tn, interpret=interpret)
    u = d_seed[:, k - 1] * _UPPER_INFLATE  # (n_pad,) per-point k-th bound

    # Phase 2 — cull with the per-tile max bound, then the exact pass.
    # Raw (unclamped) counts go to the kernel: a row whose count exceeds
    # the table capacity folds ALL tiles in-kernel (per-tile fallback).
    cap = min(max_candidates, nj)
    u_tile = jnp.max(u.reshape(ni, tn), axis=1)  # (Ni,)
    mask = bd2 <= u_tile[:, None]
    counts = jnp.sum(mask, axis=1).astype(jnp.int32)[:, None]
    col = jnp.broadcast_to(jnp.arange(nj, dtype=jnp.int32)[None, :], mask.shape)
    keys = jnp.where(mask, col, jnp.int32(nj))
    keys = jax.lax.sort(keys, dimension=1)[:, :cap]
    cand = jnp.where(keys < nj, keys, 0)

    d_full, i_full = _run_worklist(q_pad, cand, counts, grid, k,
                                   scene_tile=tn, interpret=interpret)
    return d_full[:n], i_full[:n]
