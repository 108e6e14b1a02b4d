"""Whole-ICP-iteration Pallas kernel: NN + alignment stats + QCP solve fused.

Round-3 profiling showed ~40% of every dense ICP iteration on cow was XLA
glue *around* the NN kernel (harness r03: NN 26.7 us, full loop 43.8 us):
an HBM row gather of the matched model points (~12 us — lesson 8 in
docs/PERF.md: loop-varying gathers cost ~9 ns/row), the alignment-stats
reduction passes, the (N,3)@(3,3) apply pass, and a second kernel dispatch
for the scalar solve.  This kernel removes all of it: one iteration is ONE
Pallas dispatch whose grid step (one scene tile)

  1. applies the cumulative similarity (read from the (1,32) SMEM state
     block of ``kernels/qcp_pallas.py``) to the scene tile in-kernel —
     the (N,3) cloud is never materialized between iterations, only the
     32-float state block rides the ``lax.while_loop`` carry;
  2. runs the lane-chunked NN fold (the register-resident carry pattern of
     ``nn_pallas._nn_kernel_chunked``) and, per chunk, also folds the three
     *coordinates* of the winning model point — so the matched points exist
     in registers and the HBM gather disappears;
  3. extracts the per-row winner and reduces the Horn sufficient statistics
     (sum p, sum y, sum p y^T, sum ||p||^2, sum ||y||^2 —
     ``ops/alignment.py``) of the tile, accumulating them in SMEM;
  4. on the LAST scene tile runs the whole QCP alignment solve + transform
     composition on the scalar core (shared scalar math:
     ``qcp_pallas.alignment_update_scalars``) and writes the new state
     block, whose slot 26 already carries the closed-form residual.

Reference counterpart: one iteration of ``GPU::ICP::find_corresponding_opti``
(``src/GPU/gpu.cc:52-83``) = 4 kernel launches + 6 host<->device round trips
+ a host Eigen solve; here it is a single device program with zero host
involvement.

Numerics contract: squared-distance argmin in the prescaled expansion form
``d' = ||m||^2 - 2 p.m`` (the ``||p||^2`` term is a per-row constant and
cannot affect the argmin) — the same contract as the shipping MXU kernel
path (``nn_pallas._nn_kernel`` distance_impl="mxu") and the reference's own
GPU kernel (``src/GPU/compute.cu:117``).  Measured motivation: the expansion
needs 4 fused ops per 128-lane chunk (mnorm load + 3 FMAs against
pre-scaled ``-2m`` coordinates) vs 6 for the subtract form, and the fold is
VPU-op-bound (docs/PERF.md).  Duplicate model points produce bit-equal d'
so tie-breaking to the lowest model index is preserved exactly (strict <
across chunks keeps the lowest chunk, the final masked index-min picks the
lowest global index).  The winning coordinates are carried PRE-SCALED and
un-scaled by -0.5 at extraction — exact (a power of two).

Measured design notes (v5e, cow 2,903^2 — the full A/B journey incl. four
rejected structures is in docs/PERF.md "round 4: fully-fused iteration"):
  * this kernel: 41.8 us/iter bare (scalar-serialized loop), statistically
    equal to the composable pipeline's 42.8 — the glue it removes (~12 us
    HBM gather + stats/apply passes) comes back as in-kernel extraction
    cost; the win is architectural (one dispatch, a 32-float loop carry, no
    (N,3) materialization between iterations), not throughput;
  * scene tile 128 is the measured optimum: the 5-array fold carry spills
    registers above it (tn=256 -> 54.3, 512 -> 52.3) and per-tile overhead
    dominates below it (0.65 us/tile line: 46 tiles -> 54.1, 91 -> 82.8,
    182 -> 145.9);
  * the per-tile winner extraction (a serial chain of 5 dependent
    cross-lane reductions) is the structural cost: component-sliced
    kernels measured apply+fold+argmin 28.0, +coordinate extraction 41.8,
    +stats 44.8, +scalar accumulation 50.6 (tiled shape, tn=128);
  * three alternatives REJECTED on measurement: deferred whole-cloud
    extraction through VMEM scratch slabs 59.2 (stores kill the
    register-resident fold), model-on-lane-axis tiled blocks 50.7, 2-carry
    fold + masked coordinate pass 47.1.

Scale limits: the default engine path is gated to models whose fold fully
unrolls (<= _MAX_FUSED_MODEL points — see the measured horse crossover at
that constant); the chunk loop is fully unrolled below _UNROLL_CHUNKS chunks and
block-unrolled inside a ``fori_loop`` above it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from icp_tpu.kernels.qcp_pallas import (
    alignment_update_scalars,
    read_prev_transform,
    write_state_block,
)

_BIG = 3.0e38
_PAD_COORD = 1.0e17  # padded model points: distance ~3e34, never wins
_CHUNK = 128  # one vector-lane width per fold step
_UNROLL_CHUNKS = 40  # full unroll up to here; blocked fori_loop beyond
_FORI_UNROLL = 8  # chunks per fori_loop step for large models
# Model size cap for the fused dense path = the fully-unrolled fold range.
# MEASURED crossover (v5e, round 4): at horse size (48,485 pts, 379 chunks
# through the blocked fori_loop) the fused iteration runs 8.82 ms/iter vs
# the composable pipeline's 6.79 — the fori blocks break the
# register-resident fold pipeline.  At cow size (23 chunks, fully unrolled)
# the two are equal (41.8 vs 42.8 us) and the fused kernel wins on
# architecture (one dispatch, 32-float carry).  So the default engine path
# uses the fused kernel only where the fold fully unrolls; the fori path
# below remains for callers driving fused_icp_step directly.
_MAX_FUSED_MODEL = _UNROLL_CHUNKS * _CHUNK  # 5,120 points


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _fold_chunk(c, mt_ref, px, py, pz, carry):
    """One 128-lane fold step: expansion-form distances of the scene tile
    against model chunk ``c``, strict-< carry update of (best d', chunk
    index, winning pre-scaled model coordinates) — 10 VPU ops per chunk.
    ``c`` may be a Python int (unrolled) or a traced int32 (fori path)."""
    best, cidx, yx, yy, yz = carry
    sl = pl.dslice(c * _CHUNK, _CHUNK)
    m2x = mt_ref[0, sl][None, :]  # pre-scaled -2 * model coords
    m2y = mt_ref[1, sl][None, :]
    m2z = mt_ref[2, sl][None, :]
    mn = mt_ref[3, sl][None, :]  # ||m||^2
    dc = mn + px * m2x + py * m2y + pz * m2z
    better = dc < best  # strict <: earlier chunk keeps ties (lowest index)
    best = jnp.where(better, dc, best)
    cidx = jnp.where(better, jnp.int32(c) if isinstance(c, int) else c, cidx)
    yx = jnp.where(better, m2x, yx)
    yy = jnp.where(better, m2y, yy)
    yz = jnp.where(better, m2z, yz)
    return best, cidx, yx, yy, yz


def _icp_iter_kernel(p_ref, mt_ref, state_ref, out_ref, acc_ref, *,
                     n_chunks, n_tiles, n_valid, with_scale):
    """Grid: (scene tiles,).  One whole ICP iteration (see module docstring).

    p_ref   (TN, 8) VMEM  — RAW scene tile (zero-padded coords in lanes 0..2)
    mt_ref  (8, Mp) VMEM  — whole model: rows 0..2 = -2*coords, row 3 = ||m||^2
    state_ref (1, 32) SMEM — previous state block (cumulative transform)
    out_ref (1, 32) SMEM  — new state block (written on the last tile)
    acc_ref (1, 24) SMEM scratch — running stats sums across scene tiles

    Everything per tile stays in vector registers — fold carries never touch
    VMEM.  (Software-pipelining the extraction against the next tile's fold
    through VMEM scratch was tried TWICE — double-buffered dynamic offsets
    and a single static bank — and both regressed ~16 us/iter: spilling the
    carries to scratch costs more than the extraction latency it hides.)
    """
    i = pl.program_id(0)
    tn = p_ref.shape[0]

    # -- 1. apply the cumulative transform to this scene tile (9 scalar-
    # broadcast FMAs over (TN,1) columns — negligible next to the fold).
    s_c, R_c, t_c = read_prev_transform(state_ref)
    p0x = p_ref[:, 0][:, None]
    p0y = p_ref[:, 1][:, None]
    p0z = p_ref[:, 2][:, None]
    px = s_c * (R_c[0][0] * p0x + R_c[0][1] * p0y + R_c[0][2] * p0z) + t_c[0]
    py = s_c * (R_c[1][0] * p0x + R_c[1][1] * p0y + R_c[1][2] * p0z) + t_c[1]
    pz = s_c * (R_c[2][0] * p0x + R_c[2][1] * p0y + R_c[2][2] * p0z) + t_c[2]

    # -- 2. chunked NN fold, carrying the winning (pre-scaled) coordinates.
    zero = jnp.zeros((tn, _CHUNK), jnp.float32)
    carry = (jnp.full((tn, _CHUNK), jnp.float32(_BIG)),
             jnp.zeros((tn, _CHUNK), jnp.int32), zero, zero, zero)
    if n_chunks <= _UNROLL_CHUNKS:
        for c in range(n_chunks):
            carry = _fold_chunk(c, mt_ref, px, py, pz, carry)
    else:
        # Large model: block-unrolled fori_loop (fori steps cost ~us each —
        # docs/PERF.md lesson 3 — so amortize _FORI_UNROLL chunks per step).
        n_blocks = n_chunks // _FORI_UNROLL  # n_chunks padded to a multiple

        def body(b, carry):
            for u in range(_FORI_UNROLL):
                carry = _fold_chunk(b * _FORI_UNROLL + u, mt_ref, px, py, pz,
                                    carry)
            return carry

        carry = jax.lax.fori_loop(0, n_blocks, body, carry)
    best, cidx, yx, yy, yz = carry

    # -- 3. winner per row: lowest distance, ties to the lowest global index
    # (g = cidx*128 + lane is order-isomorphic to (chunk, lane) and equals
    # the model index; reconstructed AFTER the fold so the per-chunk carry
    # stays one int select).
    lane = jax.lax.broadcasted_iota(jnp.int32, (tn, _CHUNK), dimension=1)
    g = cidx * _CHUNK + lane
    dmin = jnp.min(best, axis=1, keepdims=True)  # (TN, 1)
    masked_g = jnp.where(best == dmin, g, jnp.int32(2**31 - 1))
    win = jnp.min(masked_g, axis=1, keepdims=True)
    onehot = (g == win).astype(jnp.float32)  # exactly one lane per row
    # un-scale the -2x carried coordinates (exact: power of two)
    yxr = -0.5 * jnp.sum(onehot * yx, axis=1, keepdims=True)  # (TN, 1)
    yyr = -0.5 * jnp.sum(onehot * yy, axis=1, keepdims=True)
    yzr = -0.5 * jnp.sum(onehot * yz, axis=1, keepdims=True)

    # -- 4. Horn sufficient statistics of this tile (padded rows masked out).
    row = jax.lax.broadcasted_iota(jnp.int32, (tn, 1), dimension=0)
    v = ((i * tn + row) < n_valid).astype(jnp.float32)  # (TN, 1) validity
    pxv, pyv, pzv = px * v, py * v, pz * v
    yxv, yyv, yzv = yxr * v, yyr * v, yzr * v
    vals = [
        # sum p y^T (row major)
        jnp.sum(pxv * yxr), jnp.sum(pxv * yyr), jnp.sum(pxv * yzr),
        jnp.sum(pyv * yxr), jnp.sum(pyv * yyr), jnp.sum(pyv * yzr),
        jnp.sum(pzv * yxr), jnp.sum(pzv * yyr), jnp.sum(pzv * yzr),
        jnp.sum(pxv), jnp.sum(pyv), jnp.sum(pzv),  # sum p
        jnp.sum(yxv), jnp.sum(yyv), jnp.sum(yzv),  # sum y
        jnp.sum(pxv * px + pyv * py + pzv * pz),   # sum ||p||^2
        jnp.sum(yxv * yxr + yyv * yyr + yzv * yzr),  # sum ||y||^2
    ]

    @pl.when(i == 0)
    def _init():
        for k, val in enumerate(vals):
            acc_ref[0, k] = val

    @pl.when(i > 0)
    def _accum():
        for k, val in enumerate(vals):
            acc_ref[0, k] = acc_ref[0, k] + val

    # -- 5. last tile: the whole alignment solve + composition, on-core.
    @pl.when(i == n_tiles - 1)
    def _solve():
        f = lambda k: acc_ref[0, k]
        Spy = [[f(3 * r + c) for c in range(3)] for r in range(3)]
        sum_p = [f(9), f(10), f(11)]
        sum_y = [f(12), f(13), f(14)]
        sum_pp, sum_yy = f(15), f(16)
        prev = read_prev_transform(state_ref)
        out = alignment_update_scalars(
            Spy, sum_p, sum_y, sum_pp, sum_yy, jnp.float32(n_valid),
            *prev, with_scale=with_scale)
        write_state_block(out_ref, *out)




def prepare_fused_inputs(scene: jax.Array, model: jax.Array,
                         *, scene_tile: int = 128):
    """Pad/transpose the clouds into the kernel's layouts (done ONCE outside
    the while_loop; everything inside the loop is the single kernel call).

    Returns ``(p0_padded (Np,8), model_t (8,Mp), n, (tn, n_tiles, n_chunks))``
    — closed over by the loop body so padding is loop-invariant."""
    n, d = scene.shape
    m = model.shape[0]
    assert d == 3, f"expected 3-D points, got {d}"
    dt = jnp.float32
    scene = scene.astype(dt)
    model = model.astype(dt)

    tn = min(scene_tile, _round_up(n, 8))
    n_pad = _round_up(n, tn)
    n_chunks_raw = _round_up(m, _CHUNK) // _CHUNK
    if n_chunks_raw <= _UNROLL_CHUNKS:
        n_chunks = n_chunks_raw
    else:
        n_chunks = _round_up(n_chunks_raw, _FORI_UNROLL)
    m_pad = n_chunks * _CHUNK

    p0 = jnp.zeros((n_pad, 8), dt).at[:n, :3].set(scene)
    # Kernel model layout (8, Mp): rows 0..2 = -2 * coords (pre-scaled for
    # the expansion-form FMA), row 3 = ||m||^2.  Padded points sit at
    # coordinate _PAD_COORD => d' ~ 3e34, finite and never winning.
    mp = jnp.full((m_pad, 8), 0.0, dt).at[m:, :3].set(_PAD_COORD)
    mp = mp.at[:m, :3].set(model)
    mn = jnp.sum(mp[:, :3] * mp[:, :3], axis=1)
    mp = (-2.0 * mp).at[:, 3].set(mn)
    mt = mp.T  # (8, Mp)
    return p0, mt, n, (tn, n_pad // tn, n_chunks)


def fused_icp_step(prepared, state: jax.Array, *, with_scale: bool = True,
                   interpret: bool = False) -> jax.Array:
    """One ICP iteration: (prepared inputs, (1,32) state block) -> new state
    block.  The loop carry is the state block alone.

    One kernel shape ships: the chunked coordinate-carrying fold.  Three
    structural alternatives were built and measured SLOWER on the chip
    (docs/PERF.md round-4 section): model-on-the-lane-axis tiled blocks
    (50.7 us vs 41.8), deferred extraction through VMEM slabs (59.2 — the
    stores force the fold carries out of registers), and a 2-carry fold
    with a masked second coordinate pass (47.1)."""
    p0, mt, n, (tn, n_tiles, n_chunks) = prepared
    kernel = functools.partial(
        _icp_iter_kernel,
        n_chunks=n_chunks,
        n_tiles=n_tiles,
        n_valid=n,
        with_scale=with_scale,
    )
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tn, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(mt.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 32), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 32), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 32), jnp.float32),
        scratch_shapes=[pltpu.SMEM((1, 24), jnp.float32)],
        interpret=interpret,
    )(p0, mt, state)


def fused_path_available(solver: str, nn_method: str, trim_fraction: float,
                         n_model: int) -> bool:
    """The fully-fused iteration kernel serves the default dense TPU path:
    qcp_fused solver + pallas NN, untrimmed, model small enough for the
    fully-unrolled fold (the fori path measured 30% slower than the
    composable pipeline at horse size — see _MAX_FUSED_MODEL).  Everything
    else uses the composable op pipeline."""
    return (solver == "qcp_fused" and nn_method == "pallas"
            and trim_fraction == 0.0 and n_model <= _MAX_FUSED_MODEL)
