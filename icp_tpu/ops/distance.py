"""Closest-point correspondence search (the ICP hot loop).

Reference behavior being matched (NOT the implementation):
  * brute-force nearest neighbor: for every scene point, the model point with
    minimal euclidean distance (reference ``CPU::closest_matrix``
    ``src/cpu.cc:5-27`` — 99.74% of its CPU runtime; CUDA opti version
    ``src/GPU/compute.cu:94-245``);
  * squared distance is the contract (the CUDA path skips the sqrt,
    ``src/GPU/compute.cu:117``; argmin-equivalent);
  * ties resolve to the LOWEST model index (strict ``>`` comparisons,
    ``src/cpu.cc:22``, ``src/GPU/compute.cu:137``).

TPU-native design: three implementations behind one dispatcher.
  * ``bcast``: fully fused XLA broadcast form — XLA fuses the subtract/square/
    sum into the argmin reduction, so the N x M distance matrix is never
    materialized in HBM.  Best on CPU and good on TPU for small dims.
  * ``matmul``: the classic ``||p||^2 + ||m||^2 - 2 p.m`` MXU expansion.
    Materializes N x M; kept as a cross-check and for profiling.
  * ``pallas``: the flagship fused tiled kernel (``icp_tpu.kernels.nn_pallas``)
    — MXU for the cross term, running (min, argmin) carry across model tiles,
    O(tile^2) memory.  Replaces the reference's memory-adaptive 1280-column
    batching (``src/GPU/compute.cu:154-245``) with static BlockSpec tiling.

All return int32 indices into the model; gathering the matched points
(``Y = model[idx]``) is left to the caller so the gather can be fused or
sharded as needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def closest_point_indices_bcast(scene: jax.Array, model: jax.Array) -> jax.Array:
    """Fused broadcast form: argmin_j ||scene_i - model_j||^2 -> (N,) int32."""
    d2 = jnp.sum(
        (scene[:, None, :] - model[None, :, :]) ** 2, axis=-1
    )  # fused into the reduction by XLA
    return jnp.argmin(d2, axis=1).astype(jnp.int32)


def closest_point_indices_matmul(scene: jax.Array, model: jax.Array) -> jax.Array:
    """MXU expansion: ||m||^2 - 2 s.m (the ||s||^2 term is constant per row
    and cannot change the argmin, so it is dropped — fewer flops, and it
    avoids one source of f32 cancellation)."""
    cross = jnp.matmul(scene, model.T, precision=jax.lax.Precision.HIGHEST)
    m2 = jnp.sum(model * model, axis=1)
    d2 = m2[None, :] - 2.0 * cross
    return jnp.argmin(d2, axis=1).astype(jnp.int32)


def closest_point_indices(
    scene: jax.Array,
    model: jax.Array,
    *,
    method: str = "auto",
    scene_tile: int = 512,
    model_tile: int = 1024,
) -> jax.Array:
    """Dispatching wrapper. ``method`` in {auto, bcast, matmul, pallas}."""
    if method == "auto":
        method = "pallas" if scene.ndim and _default_backend() == "tpu" else "bcast"
    if method == "bcast":
        return closest_point_indices_bcast(scene, model)
    if method == "matmul":
        return closest_point_indices_matmul(scene, model)
    if method == "pallas":
        from icp_tpu.kernels import nn_pallas

        return nn_pallas.closest_point_indices_pallas(
            scene, model, scene_tile=scene_tile, model_tile=model_tile
        )
    if method == "bf16":
        # APPROXIMATE: bf16-MXU prefilter with exact recheck of the winner
        # (kernels/nn_bf16.py) — argmins may flip among candidates within
        # the bf16 cross-term error band; measured trade-off in docs/PERF.md
        from icp_tpu.kernels import nn_bf16

        idx, _, _ = nn_bf16.closest_point_indices_bf16(
            scene, model, scene_tile=scene_tile, model_tile=model_tile
        )
        return idx
    raise ValueError(f"unknown nn method: {method}")


@functools.cache
def _default_backend() -> str:
    return jax.default_backend()


def squared_distances(scene: jax.Array, model: jax.Array) -> jax.Array:
    """Dense N x M squared-distance matrix (test/debug utility only; the
    production paths never materialize it)."""
    return jnp.sum((scene[:, None, :] - model[None, :, :]) ** 2, axis=-1)
