"""Multiscale registration: recovers transforms that single-scale ICP cannot
(large-rotation scan pairs — the non-adjacent bunny views case)."""

import jax.numpy as jnp
import numpy as np

from icp_tpu import ICPConfig
from icp_tpu.ops.alignment import Similarity
from icp_tpu.ops.transform import apply_similarity, inverse
from icp_tpu.slam.pairwise import register_pair


def _rot_z(theta):
    return np.array(
        [
            [np.cos(theta), -np.sin(theta), 0.0],
            [np.sin(theta), np.cos(theta), 0.0],
            [0.0, 0.0, 1.0],
        ]
    )


def test_pca_init_rescues_large_rotation(rng):
    # A structured (non-spherical) cloud rotated 50 degrees: ICP from
    # identity stalls in a local minimum (inherent to the algorithm — the
    # reference would stall identically); PCA initialization rescues it.
    t = np.linspace(0, 4 * np.pi, 800)
    world = np.stack([np.cos(t) * (1 + 0.2 * t), np.sin(t) * (1 + 0.2 * t),
                      0.3 * t], axis=1)
    world += 0.005 * rng.standard_normal(world.shape)
    T = Similarity(
        jnp.asarray(1.0, jnp.float64),
        jnp.asarray(_rot_z(np.deg2rad(50.0))),
        jnp.asarray([0.5, -0.3, 0.2]),
    )
    scene = np.asarray(apply_similarity(jnp.asarray(world), inverse(T)))

    cfg = ICPConfig(max_iter=60, dtype=jnp.float64, solver="eigh",
                    nn_method="bcast", with_scale=False, validate_inputs=False)
    vanilla = register_pair(world, scene, cfg)
    pca = register_pair(world, scene, cfg, init="pca", multiscale=(4, 1))
    # vanilla stalls far from the truth; PCA-initialized lands on it
    assert np.abs(np.asarray(vanilla.transform.R) - np.asarray(T.R)).max() > 0.05
    np.testing.assert_allclose(np.asarray(pca.transform.R), np.asarray(T.R),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(pca.transform.t), np.asarray(T.t),
                               atol=5e-3)


def test_multiscale_composition_consistency(rng):
    # Whatever the levels, the returned transform must map the original scene
    # onto the model (replay check).
    world = rng.standard_normal((300, 3))
    T = Similarity(
        jnp.asarray(1.0, jnp.float64),
        jnp.asarray(_rot_z(0.2)),
        jnp.asarray([0.1, 0.0, -0.1]),
    )
    scene = np.asarray(apply_similarity(jnp.asarray(world), inverse(T)))
    cfg = ICPConfig(max_iter=40, dtype=jnp.float64, solver="eigh",
                    nn_method="bcast", with_scale=False, validate_inputs=False)
    pr = register_pair(world, scene, cfg, multiscale=(4, 1))
    registered = np.asarray(apply_similarity(jnp.asarray(scene), pr.transform))
    d2 = np.sum((registered - world) ** 2, axis=1)
    assert np.sqrt(d2.mean()) < 1e-6
