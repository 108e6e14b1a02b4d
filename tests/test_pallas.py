"""Pallas NN kernel vs jnp/oracle equivalence (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from icp_tpu.kernels.nn_pallas import (
    closest_point_indices_pallas,
    closest_point_with_distances_pallas,
)
from tests import oracle


@pytest.mark.parametrize(
    "n,m,tn,tm",
    [
        (16, 128, 8, 128),  # single tile
        (40, 300, 16, 128),  # ragged: padding in both axes
        (100, 1000, 32, 256),  # multiple model tiles (carry fold)
        (257, 129, 64, 128),  # scene tiles > 1, model ragged
    ],
)
def test_pallas_matches_oracle(n, m, tn, tm, rng):
    p = rng.standard_normal((n, 3)).astype(np.float32)
    mm = rng.standard_normal((m, 3)).astype(np.float32)
    want = oracle.closest_indices(p.astype(np.float64), mm.astype(np.float64))
    got = np.asarray(
        closest_point_indices_pallas(
            jnp.asarray(p), jnp.asarray(mm), scene_tile=tn, model_tile=tm,
            interpret=True,
        )
    )
    # f32 rounding may flip near-ties: compare achieved distances.
    d_got = np.sum((p - mm[got]) ** 2, axis=1)
    d_want = np.sum((p - mm[want]) ** 2, axis=1)
    np.testing.assert_allclose(d_got, d_want, rtol=1e-4, atol=1e-5)
    assert (got == want).mean() > 0.99


@pytest.mark.parametrize(
    "n,m,tn,tm",
    [(40, 300, 16, 128), (100, 1000, 32, 256), (257, 129, 64, 128)],
)
def test_chunked_kernel_matches_oracle(n, m, tn, tm, rng):
    from icp_tpu.kernels.nn_pallas import _closest_pallas

    p = rng.standard_normal((n, 3)).astype(np.float32)
    mm = rng.standard_normal((m, 3)).astype(np.float32)
    want = oracle.closest_indices(p.astype(np.float64), mm.astype(np.float64))
    got = np.asarray(
        _closest_pallas(
            jnp.asarray(p), jnp.asarray(mm), scene_tile=tn, model_tile=tm,
            interpret=True, with_dist=False, distance_impl="chunked",
        )
    )
    d_got = np.sum((p - mm[got]) ** 2, axis=1)
    d_want = np.sum((p - mm[want]) ** 2, axis=1)
    np.testing.assert_allclose(d_got, d_want, rtol=1e-4, atol=1e-5)


def test_chunked_kernel_tie_break(rng):
    from icp_tpu.kernels.nn_pallas import _closest_pallas

    m = np.ones((300, 3), np.float32)
    p = rng.standard_normal((16, 3)).astype(np.float32)
    got = np.asarray(
        _closest_pallas(
            jnp.asarray(p), jnp.asarray(m), scene_tile=8, model_tile=128,
            interpret=True, with_dist=False, distance_impl="chunked",
        )
    )
    np.testing.assert_array_equal(got, np.zeros(16, np.int32))


def test_pallas_tie_break_lowest_index_within_and_across_tiles(rng):
    # duplicates placed in different model tiles; lowest global index must win
    m = np.ones((300, 3), np.float32)  # all identical -> index 0 wins
    p = rng.standard_normal((16, 3)).astype(np.float32)
    got = np.asarray(
        closest_point_indices_pallas(
            jnp.asarray(p), jnp.asarray(m), scene_tile=8, model_tile=128,
            interpret=True,
        )
    )
    np.testing.assert_array_equal(got, np.zeros(16, np.int32))


def test_pallas_distances_variant(rng):
    p = rng.standard_normal((24, 3)).astype(np.float32)
    m = rng.standard_normal((200, 3)).astype(np.float32)
    idx, d2 = closest_point_with_distances_pallas(
        jnp.asarray(p), jnp.asarray(m), scene_tile=8, model_tile=128,
        interpret=True,
    )
    idx, d2 = np.asarray(idx), np.asarray(d2)
    want = np.sum((p - m[idx]) ** 2, axis=1)
    np.testing.assert_allclose(d2, want, rtol=1e-4, atol=1e-5)


def test_with_points_matches_gather(rng):
    """In-kernel one-hot gather == model[idx]."""
    from icp_tpu.kernels.nn_pallas import closest_points_and_targets_pallas

    p = rng.standard_normal((64, 3)).astype(np.float32)
    m = rng.standard_normal((300, 3)).astype(np.float32)
    idx, y = closest_points_and_targets_pallas(
        jnp.asarray(p), jnp.asarray(m), scene_tile=16, model_tile=128,
        interpret=True,
    )
    idx, y = np.asarray(idx), np.asarray(y)
    np.testing.assert_array_equal(y, m[idx])


def test_fused_step_path_matches_reference_path(cow_pair):
    """solver=qcp_fused + nn=pallas (the TPU fast path, fully fused kernels)
    must produce the same registration as the plain path."""
    from icp_tpu import ICPConfig, icp

    ref, tr1 = cow_pair
    ref = np.ascontiguousarray(ref[::20])
    tr1 = np.ascontiguousarray(tr1[::20])
    fused = icp(ref, tr1, ICPConfig(max_iter=20, dtype=jnp.float32,
                                    nn_method="pallas", solver="qcp_fused"))
    plain = icp(ref, tr1, ICPConfig(max_iter=20, dtype=jnp.float32,
                                    nn_method="bcast", solver="qcp"))
    assert float(fused.err) < 1e-5
    assert int(fused.iters) == int(plain.iters)
    np.testing.assert_allclose(
        np.asarray(fused.points), np.asarray(plain.points), atol=1e-4
    )
    # cumulative transform must replay correctly (composition in-kernel)
    from icp_tpu.ops.transform import apply_similarity

    replay = apply_similarity(jnp.asarray(tr1, jnp.float32), fused.transform)
    np.testing.assert_allclose(
        np.asarray(replay), np.asarray(fused.points), atol=1e-4
    )


def test_pallas_inside_icp_loop(cow_pair):
    """nn_method='pallas' end to end (interpret on CPU)."""
    from icp_tpu import ICPConfig, icp

    ref, tr1 = cow_pair
    ref, tr1 = ref[::20], tr1[::20]
    cfg = ICPConfig(max_iter=20, dtype=jnp.float32, nn_method="pallas", solver="qcp")
    res = icp(np.ascontiguousarray(ref), np.ascontiguousarray(tr1), cfg)
    assert float(res.err) < 1e-5
