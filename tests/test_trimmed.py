"""Trimmed (robust) ICP: outlier rejection the reference lacks."""

import jax.numpy as jnp
import numpy as np

from icp_tpu import ICPConfig, icp
from tests.conftest import random_rotation


def _make_outlier_problem(rng, n=400, n_out=80):
    """Model + transformed scene where the scene carries gross outliers."""
    world = rng.standard_normal((n, 3))
    R = random_rotation(rng)
    # small rotation (stay in ICP's basin)
    R = np.linalg.svd(np.eye(3) + 0.1 * (R - np.eye(3)))[0] @ \
        np.linalg.svd(np.eye(3) + 0.1 * (R - np.eye(3)))[2]
    t = np.array([0.2, -0.1, 0.15])
    scene = world @ R.T + t
    # corrupt some scene points with gross outliers
    scene_bad = scene.copy()
    scene_bad[:n_out] += 5.0 + rng.standard_normal((n_out, 3))
    return world, scene_bad, R, t


def test_trimmed_rejects_outliers(rng):
    world, scene, R, t = _make_outlier_problem(rng)
    base = dict(max_iter=60, dtype=jnp.float64, solver="eigh",
                nn_method="bcast", with_scale=False, validate_inputs=False)
    vanilla = icp(world, scene, ICPConfig(**base))
    trimmed = icp(world, scene, ICPConfig(**base, trim_fraction=0.3))
    # the scene->model inverse transform should be recovered by trimmed ICP
    R_err_v = np.abs(np.asarray(vanilla.transform.R) @ R - np.eye(3)).max()
    R_err_t = np.abs(np.asarray(trimmed.transform.R) @ R - np.eye(3)).max()
    assert R_err_t < 1e-4, R_err_t
    assert R_err_t < R_err_v  # and strictly better than vanilla
    # inliers land on the model
    reg = np.asarray(trimmed.points)[80:]
    d = np.sqrt(((reg - world[80:]) ** 2).sum(1))
    assert np.median(d) < 1e-6


def test_trim_zero_is_bitwise_reference_path(cow_pair):
    """trim_fraction=0.0 must compile to the exact untrimmed program."""
    ref, tr1 = cow_pair
    ref, tr1 = np.ascontiguousarray(ref[::20]), np.ascontiguousarray(tr1[::20])
    base = dict(max_iter=10, dtype=jnp.float64, solver="eigh", nn_method="bcast")
    a = icp(ref, tr1, ICPConfig(**base), trace=True)
    b = icp(ref, tr1, ICPConfig(**base, trim_fraction=0.0), trace=True)
    np.testing.assert_array_equal(np.asarray(a.errs), np.asarray(b.errs))


def test_trimmed_fused_path_interpret(cow_pair, rng):
    """Trimming works through the fused pallas/qcp_fused path too."""
    world, scene, R, t = _make_outlier_problem(rng, n=256, n_out=40)
    cfg = ICPConfig(max_iter=60, dtype=jnp.float32, solver="qcp_fused",
                    nn_method="pallas", with_scale=False,
                    validate_inputs=False, trim_fraction=0.3)
    res = icp(world, scene, cfg)
    R_err = np.abs(np.asarray(res.transform.R) @ R - np.eye(3)).max()
    assert R_err < 1e-3


def test_trimmed_sharded_matches_single(rng):
    """Sharded trimmed ICP (distributed histogram quantile) recovers the
    outlier-corrupted transform like the single-device quantile path."""
    import jax

    from icp_tpu.parallel.mesh import make_mesh
    from icp_tpu.parallel.sharded import icp_sharded

    world, scene, R, t = _make_outlier_problem(rng)
    base = dict(max_iter=60, dtype=jnp.float64, solver="eigh",
                nn_method="bcast", with_scale=False, validate_inputs=False,
                trim_fraction=0.3)
    single = icp(world, scene, ICPConfig(**base))
    mesh = make_mesh(jax.devices()[:8])
    sharded = icp_sharded(world, scene, ICPConfig(**base), mesh=mesh, ring=True)
    R_err = np.abs(np.asarray(sharded.transform.R) @ R - np.eye(3)).max()
    assert R_err < 1e-3, R_err
    # the approximate quantile may differ from jnp.quantile at the margin;
    # both must land on the same transform
    np.testing.assert_allclose(
        np.asarray(sharded.transform.t), np.asarray(single.transform.t),
        atol=1e-3,
    )


def test_trimmed_sharded_2d_matches_single(rng):
    """Trim on the 2-D (sp, mp) mesh (quantile over sp; scene rows replicated
    over mp) recovers the same transform as the single-device path."""
    import jax

    from icp_tpu.parallel.sharded import icp_sharded_2d, make_mesh_2d

    world, scene, R, t = _make_outlier_problem(rng)
    base = dict(max_iter=60, dtype=jnp.float64, solver="eigh",
                nn_method="bcast", with_scale=False, validate_inputs=False,
                trim_fraction=0.3)
    single = icp(world, scene, ICPConfig(**base))
    mesh = make_mesh_2d(4, 2, jax.devices()[:8])
    sharded = icp_sharded_2d(world, scene, ICPConfig(**base), mesh=mesh)
    R_err = np.abs(np.asarray(sharded.transform.R) @ R - np.eye(3)).max()
    assert R_err < 1e-3, R_err
    np.testing.assert_allclose(
        np.asarray(sharded.transform.t), np.asarray(single.transform.t),
        atol=1e-3,
    )
