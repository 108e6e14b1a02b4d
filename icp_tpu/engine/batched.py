"""Batched registration: many cloud pairs per chip, one program.

The production/serving shape of the problem (BASELINE.json's "frames/s"
metric): registering a stream of frame pairs.  A single cow-sized pair
underutilizes the chip; ``vmap`` over the pair axis amortizes every kernel
across the batch.  No reference counterpart (strictly one pair per process).

Semantics: every pair runs exactly ``n_iters`` iterations (the batch cannot
early-exit together; converged pairs simply keep re-solving — their transform
is a fixed point, so results are unchanged).  For convergence-gated batches,
run ``icp`` per pair instead.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from icp_tpu.engine.icp import ICPResult, icp_fixed_iters


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
def icp_batched(
    models: jax.Array,  # (B, M, 3)
    scenes: jax.Array,  # (B, N, 3)
    *,
    n_iters,
    solver: str = "eigh",
    nn_method: str = "bcast",
    with_scale: bool = True,
    reference_compat: bool = True,
    scene_tile: int = 256,
    model_tile: int = 4096,
    trim_fraction: float = 0.0,
) -> ICPResult:
    """Register B pairs in one compiled program; all leaves gain a leading
    batch axis."""

    def one(model, scene):
        return icp_fixed_iters(
            model,
            scene,
            n_iters=n_iters,
            solver=solver,
            nn_method=nn_method,
            with_scale=with_scale,
            reference_compat=reference_compat,
            scene_tile=scene_tile,
            model_tile=model_tile,
            trim_fraction=trim_fraction,
        )

    return jax.vmap(one)(models, scenes)
