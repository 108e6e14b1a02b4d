"""Global registration: FPFH features + spectral filter + batched RANSAC.

No reference counterpart — the reference's ICP is purely local (iterates
from identity, ``src/cpu.cc:55-79``) and its datasets are pre-aligned; this
suite pins the capability that removes that limitation: recovering a pose
from NOTHING, at arbitrary rotation, with partial overlap.

Key regression pinned here: normal-sign canonicalization must be LOCAL
(neighborhood mean), not global-centroid — the centroid moves with a crop,
flipping signs inconsistently between partially overlapping views, which
was measured to cut the good-match rate from ~32% to ~9% and starve RANSAC
(ops/fpfh.py module docstring).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icp_tpu.config import ICPConfig
from icp_tpu.engine.global_reg import (
    compatibility_scores,
    global_register,
    match_features,
    ransac_alignment,
)
from icp_tpu.io.csv import load_matrix
from icp_tpu.ops.fpfh import fpfh_features
from tests.conftest import data_path, random_rotation


def _rot_err_deg(R_got, R_true):
    c = (np.trace(np.asarray(R_got) @ np.asarray(R_true).T) - 1.0) / 2.0
    return np.rad2deg(np.arccos(np.clip(c, -1.0, 1.0)))


@pytest.fixture(scope="module")
def bunny_crops():
    """Two partially overlapping crops of bun000 (overlap ~1/3 of each),
    the scene crop moved by a 150-degree rotation + translation."""
    pts = load_matrix(data_path("bun000.txt")).astype(np.float32)
    x = pts[:, 0]
    lo, hi = x.min(), x.max()
    a = pts[x < lo + 0.6 * (hi - lo)]
    b = pts[x > lo + 0.4 * (hi - lo)]
    a = a[:: max(1, a.shape[0] // 1500)]
    b = b[:: max(1, b.shape[0] // 1500)]
    th = np.deg2rad(150.0)
    R = np.array(
        [[np.cos(th), -np.sin(th), 0.0],
         [np.sin(th), np.cos(th), 0.0],
         [0.0, 0.0, 1.0]], np.float32)
    t = np.array([0.3, -0.2, 0.1], np.float32)
    b_moved = (b @ R.T + t).astype(np.float32)
    return a, b_moved, R.T, (-R.T @ t)  # model, scene, R_true, t_true


def test_fpfh_rotation_invariance(rng):
    # descriptors must be (numerically) invariant under rigid motion:
    # same points, same order, rotated + translated -> same features
    pts = load_matrix(data_path("cow_ref.txt")).astype(np.float32)[::4]
    R = random_rotation(rng).astype(np.float32)
    t = rng.standard_normal(3).astype(np.float32)
    f0 = np.asarray(fpfh_features(jnp.asarray(pts), k=16))
    f1 = np.asarray(fpfh_features(jnp.asarray(pts @ R.T + t), k=16))
    # histograms are bin-quantized: tiny angle perturbations at bin edges
    # move mass between adjacent bins, so compare with a loose L1 budget
    l1 = np.abs(f0 - f1).sum(axis=1)  # each row sums to 300 (3 blocks x 100)
    assert np.median(l1) < 5.0
    assert (l1 < 60.0).mean() > 0.99


def test_fpfh_descriptors_are_normalized():
    pts = load_matrix(data_path("cow_ref.txt")).astype(np.float32)[::8]
    f = np.asarray(fpfh_features(jnp.asarray(pts), k=16))
    assert f.shape == (pts.shape[0], 33)
    blocks = f.reshape(-1, 3, 11).sum(axis=2)
    np.testing.assert_allclose(blocks, 100.0, atol=1e-3)


def test_match_features_identity():
    pts = load_matrix(data_path("cow_ref.txt")).astype(np.float32)[::8]
    f = fpfh_features(jnp.asarray(pts), k=16)
    idx, valid = match_features(f, f, mutual=True)
    # identical descriptor sets: every row matches itself (ties resolve to
    # the lowest index consistently in both directions, so mutual holds)
    assert np.asarray(valid).all()
    np.testing.assert_array_equal(np.asarray(idx),
                                  np.arange(pts.shape[0]))


def test_compatibility_scores_isolate_consistent_set(rng):
    # 60 true rigid correspondences + 140 random outliers: the spectral
    # scores must rank every true match above every outlier
    R = random_rotation(rng).astype(np.float32)
    t = rng.standard_normal(3).astype(np.float32)
    s_true = rng.uniform(-1, 1, (60, 3)).astype(np.float32)
    m_true = s_true @ R.T + t
    s_out = rng.uniform(-1, 1, (140, 3)).astype(np.float32)
    m_out = rng.uniform(-1, 1, (140, 3)).astype(np.float32)
    s = jnp.asarray(np.concatenate([s_true, s_out]))
    m = jnp.asarray(np.concatenate([m_true, m_out]))
    valid = jnp.ones((200,), bool)
    scores = np.asarray(compatibility_scores(s, m, valid, sigma=0.01))
    assert scores[:60].min() > scores[60:].max()


def test_ransac_alignment_with_outliers_and_scale(rng):
    # synthetic correspondences: 50 inliers of a similarity (s=1.37) + 150
    # outliers; batched RANSAC must recover (s, R, t) from the contaminated
    # set without any spectral help
    R = random_rotation(rng).astype(np.float32)
    t = rng.standard_normal(3).astype(np.float32)
    s_fac = 1.37
    p_in = rng.uniform(-1, 1, (50, 3)).astype(np.float32)
    y_in = s_fac * p_in @ R.T + t
    p_out = rng.uniform(-1, 1, (150, 3)).astype(np.float32)
    y_out = rng.uniform(-1, 1, (150, 3)).astype(np.float32)
    scene = jnp.asarray(np.concatenate([p_in, p_out]))
    model = jnp.asarray(np.concatenate([y_in, y_out]))
    valid = jnp.ones((200,), bool)
    sim, frac = ransac_alignment(
        scene, model, valid, inlier_tau=0.02,
        key=jax.random.PRNGKey(3), n_hypotheses=1024, with_scale=True)
    assert _rot_err_deg(sim.R, R) < 0.5
    assert abs(float(sim.s) - s_fac) < 0.01
    np.testing.assert_allclose(np.asarray(sim.t), t, atol=0.02)
    assert 0.2 < float(frac) < 0.35  # ~50/200 inliers


@pytest.mark.slow
def test_global_register_full_cloud_large_rotation(rng):
    # full-cloud case: same points both sides, 150-degree pose offset —
    # PCA handles this too; global_register must as well
    pts = load_matrix(data_path("cow_ref.txt")).astype(np.float32)[::3]
    th = np.deg2rad(150.0)
    R = np.array(
        [[1.0, 0.0, 0.0],
         [0.0, np.cos(th), -np.sin(th)],
         [0.0, np.sin(th), np.cos(th)]], np.float32)
    t = np.array([1.0, -2.0, 0.5], np.float32)
    scene = (pts @ R.T + t).astype(np.float32)
    res = global_register(pts, scene, seed=0)
    assert _rot_err_deg(res.transform.R, R.T) < 3.0
    assert float(res.inlier_fraction) > 0.5


@pytest.mark.slow
def test_global_register_partial_overlap(bunny_crops):
    # THE case PCA cannot do: ~1/3 overlap, 150-degree rotation, real
    # scan noise.  Requires crop-stable normal orientation + the spectral
    # filter (either alone was measured insufficient).
    a, b_moved, R_true, t_true = bunny_crops
    res = global_register(a, b_moved, seed=0)
    assert _rot_err_deg(res.transform.R, R_true) < 6.0
    assert np.linalg.norm(np.asarray(res.transform.t) - t_true) < 0.03


@pytest.mark.slow
def test_register_pair_fpfh_init_end_to_end(bunny_crops):
    # init="fpfh" + trimmed point-to-plane ICP: sub-degree on the crops
    from icp_tpu.slam.pairwise import register_pair

    a, b_moved, R_true, t_true = bunny_crops
    cfg = ICPConfig(trim_fraction=0.5, with_scale=False,
                    validate_inputs=False)
    out = register_pair(a, b_moved, cfg, init="fpfh",
                        engine="point_to_plane")
    assert _rot_err_deg(out.transform.R, R_true) < 1.0
    assert np.linalg.norm(np.asarray(out.transform.t) - t_true) < 0.01
