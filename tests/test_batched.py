"""Batched multi-pair registration (the frames/s serving path)."""

import jax.numpy as jnp
import numpy as np

from icp_tpu.engine.batched import icp_batched


def _pairs(rng, B=4, N=200):
    models = rng.standard_normal((B, N, 3)).astype(np.float32)
    th = 0.1
    R = np.array(
        [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]],
        np.float32,
    )
    scenes = models @ R.T + np.array([0.1, -0.05, 0.2], np.float32)
    return models, scenes


def test_batched_matches_per_pair(rng):
    models, scenes = _pairs(rng)
    res = icp_batched(jnp.asarray(models), jnp.asarray(scenes), n_iters=20)
    assert res.points.shape == scenes.shape
    np.testing.assert_allclose(np.asarray(res.points), models, atol=1e-5)
    assert (np.asarray(res.err) < 1e-5).all()


def test_batched_pallas_fused_path(rng):
    models, scenes = _pairs(rng)
    res = icp_batched(
        jnp.asarray(models), jnp.asarray(scenes), n_iters=20,
        solver="qcp_fused", nn_method="pallas",
    )
    np.testing.assert_allclose(np.asarray(res.points), models, atol=5e-5)


def test_batched_heterogeneous_transforms(rng):
    # each pair gets a different transform; all must be recovered
    models = rng.standard_normal((3, 150, 3)).astype(np.float32)
    scenes = np.empty_like(models)
    for b in range(3):
        th = 0.05 * (b + 1)
        R = np.array(
            [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]],
            np.float32,
        )
        scenes[b] = models[b] @ R.T + 0.1 * (b + 1)
    res = icp_batched(jnp.asarray(models), jnp.asarray(scenes), n_iters=30)
    np.testing.assert_allclose(np.asarray(res.points), models, atol=1e-4)
