"""kNN Pallas kernel: oracle parity, ties, ragged shapes (SURVEY.md §4b)."""

import jax.numpy as jnp
import numpy as np
import pytest

from icp_tpu.kernels.knn_pallas import knn_pallas


def _oracle_knn(query, points, k):
    """NumPy oracle: k smallest (d2, idx) lexicographic per query row."""
    d2 = ((query[:, None, :] - points[None, :, :]) ** 2).sum(-1)
    idx = np.argsort(d2, axis=1, kind="stable")[:, :k]  # stable = lowest-index ties
    return np.take_along_axis(d2, idx, axis=1), idx


@pytest.mark.parametrize("n,m,k", [(64, 64, 4), (100, 130, 8), (257, 513, 17)])
def test_knn_matches_oracle(rng, n, m, k):
    q = rng.standard_normal((n, 3)).astype(np.float32)
    p = rng.standard_normal((m, 3)).astype(np.float32)
    d2, idx = knn_pallas(q, p, k, query_tile=64, point_tile=128)
    od2, oidx = _oracle_knn(q, p, k)
    np.testing.assert_array_equal(np.asarray(idx), oidx)
    np.testing.assert_allclose(np.asarray(d2), od2, rtol=1e-5, atol=1e-6)


def test_knn_tie_breaks_to_lowest_index(rng):
    # duplicate points across tile boundaries: ties must pick lowest index
    base = rng.standard_normal((40, 3)).astype(np.float32)
    p = np.concatenate([base, base[::-1]], axis=0)  # every point duplicated
    q = base[:16] + 1e-8
    d2, idx = knn_pallas(q, p, 4, query_tile=8, point_tile=128)
    od2, oidx = _oracle_knn(q, p, 4)
    np.testing.assert_array_equal(np.asarray(idx), oidx)


def test_knn_self_query(rng):
    # query == points: nearest neighbor of each point is itself (d2 = 0)
    p = rng.standard_normal((70, 3)).astype(np.float32)
    d2, idx = knn_pallas(p, p, 3, query_tile=16, point_tile=128)
    np.testing.assert_array_equal(np.asarray(idx)[:, 0], np.arange(70))
    np.testing.assert_allclose(np.asarray(d2)[:, 0], 0.0)


def test_knn_k_exceeds_points_raises(rng):
    p = rng.standard_normal((5, 3)).astype(np.float32)
    with pytest.raises(ValueError):
        knn_pallas(p, p, 6)


def test_normals_use_knn_kernel(rng):
    """estimate_normals on a noisy plane recovers the plane normal."""
    import jax.numpy as jnp

    from icp_tpu.ops.normals import estimate_normals

    xy = rng.uniform(-1, 1, (300, 2))
    pts = np.column_stack([xy, 1e-3 * rng.standard_normal(300)])
    n = np.asarray(estimate_normals(jnp.asarray(pts, jnp.float32), k=12))
    assert np.all(np.abs(n[:, 2]) > 0.99)


def test_knn_grid_matches_dense(rng):
    from icp_tpu.kernels.knn_grid import knn_grid
    from icp_tpu.kernels.nn_grid import build_model_grid

    pts = rng.standard_normal((1500, 3)).astype(np.float32)
    query = rng.standard_normal((700, 3)).astype(np.float32) * 0.9
    grid = build_model_grid(jnp.asarray(pts), target_tile=128)
    q = jnp.asarray(query)
    d_g, i_g = knn_grid(q, grid, 8, scene_tile=64, max_candidates=16)
    d_d, i_d = knn_pallas(q, jnp.asarray(pts), 8)
    np.testing.assert_array_equal(np.asarray(i_g), np.asarray(i_d))
    np.testing.assert_allclose(np.asarray(d_g), np.asarray(d_d), rtol=1e-6)


def test_knn_grid_tie_break(rng):
    from icp_tpu.kernels.knn_grid import knn_grid
    from icp_tpu.kernels.nn_grid import build_model_grid

    base = rng.standard_normal((300, 3)).astype(np.float32)
    pts = np.concatenate([base, base], axis=0)  # exact duplicates
    grid = build_model_grid(jnp.asarray(pts), target_tile=128)
    q = jnp.asarray(base[:64])
    d_g, i_g = knn_grid(q, grid, 6, scene_tile=32, max_candidates=32)
    d_d, i_d = knn_pallas(q, jnp.asarray(pts), 6)
    np.testing.assert_array_equal(np.asarray(i_g), np.asarray(i_d))


def test_knn_grid_overflow_falls_back_dense(rng):
    from icp_tpu.kernels.knn_grid import knn_grid
    from icp_tpu.kernels.nn_grid import build_model_grid

    pts = rng.standard_normal((600, 3)).astype(np.float32)
    grid = build_model_grid(jnp.asarray(pts), target_tile=128)
    q = jnp.asarray(rng.standard_normal((100, 3)).astype(np.float32))
    # cap=1 guarantees phase-2 overflow -> per-tile fold-everything path
    d_g, i_g = knn_grid(q, grid, 5, scene_tile=32, max_candidates=1)
    d_d, i_d = knn_pallas(q, jnp.asarray(pts), 5)
    np.testing.assert_array_equal(np.asarray(i_g), np.asarray(i_d))


def test_estimate_normals_grid_matches_dense(rng):
    from icp_tpu.ops.normals import estimate_normals

    pts = rng.standard_normal((900, 3)).astype(np.float32)
    a = np.asarray(estimate_normals(jnp.asarray(pts), k=12, method="dense"))
    b = np.asarray(estimate_normals(jnp.asarray(pts), k=12, method="grid"))
    # same neighbor sets -> same covariances -> same normals (sign-exact)
    np.testing.assert_allclose(a, b, atol=1e-6)
