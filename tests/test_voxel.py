"""Voxel-grid downsampling (ops/voxel.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from icp_tpu.ops.voxel import voxel_downsample, voxel_downsample_np


def _np_reference(points, v):
    """Dict-of-voxels reference (the dynamic formulation the op replaces)."""
    lo = points.min(axis=0)
    q = np.clip(((points - lo) / v).astype(np.int64), 0, 1023)
    key = (q[:, 0] << 20) | (q[:, 1] << 10) | q[:, 2]
    cents = {}
    for k, p in zip(key, points):
        cents.setdefault(int(k), []).append(p)
    keys = sorted(cents)
    return np.array([np.mean(cents[k], axis=0) for k in keys]), len(keys)


def test_voxel_matches_dict_reference(rng):
    pts = rng.standard_normal((500, 3)).astype(np.float32)
    want, n_want = _np_reference(pts, 0.3)
    got, n_got = voxel_downsample_np(pts, 0.3)
    assert n_got == n_want
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_voxel_output_ordering_and_mask(rng):
    pts = rng.uniform(0, 2, (200, 3)).astype(np.float32)
    out, mask, n_vox = voxel_downsample(jnp.asarray(pts), 0.5, capacity=200)
    n = int(n_vox)
    mask = np.asarray(mask)
    assert mask[:n].all() and not mask[n:].any()
    # zeros past the valid rows
    assert np.all(np.asarray(out)[n:] == 0.0)


def test_voxel_singleton_points_pass_through(rng):
    # voxel smaller than any pairwise gap (but >= extent/1024, the
    # documented lattice constraint): every point is its own voxel
    pts = (10.0 * rng.standard_normal((64, 3))).astype(np.float32)
    v = float(pts.max() - pts.min()) / 1000.0
    from scipy.spatial.distance import pdist

    assert pdist(pts).min() > 2.0 * v * np.sqrt(3)  # seed-stable premise
    got, n = voxel_downsample_np(pts, v)
    assert n == 64
    np.testing.assert_allclose(np.sort(got, axis=0), np.sort(pts, axis=0),
                               rtol=1e-6, atol=1e-6)


def test_voxel_capacity_overflow_reported(rng):
    pts = rng.standard_normal((128, 3)).astype(np.float32)
    v = float(pts.max() - pts.min()) / 1000.0
    out, mask, n_vox = voxel_downsample(jnp.asarray(pts), v, capacity=16)
    # 128 singleton voxels cannot fit in 16 rows: count reports the truth
    assert int(n_vox) == 128
    assert int(np.asarray(mask).sum()) <= 16


def test_voxel_downsample_registers_like_full_cloud(cow_pair):
    # downstream sanity: registering the decimated clouds still recovers the
    # transform (voxelized clouds sample the same surfaces)
    from icp_tpu import ICPConfig, icp

    ref, tr1 = cow_pair
    ref_d, _ = voxel_downsample_np(np.asarray(ref, np.float32), 0.01)
    tr1_d, _ = voxel_downsample_np(np.asarray(tr1, np.float32), 0.01)
    assert len(ref_d) < len(ref)
    cfg = ICPConfig(max_iter=30, dtype=jnp.float32, nn_method="bcast",
                    validate_inputs=False, threshold=1e-9)
    res = icp(ref_d, tr1_d, cfg)
    # voxelized pair: not exact-transform anymore, but must land close
    assert float(res.err) < 1e-4


def test_voxel_empty_cloud(rng):
    got, n = voxel_downsample_np(np.zeros((0, 3), np.float32), 0.5)
    assert n == 0 and got.shape == (0, 3)
    out, mask, n_vox = voxel_downsample(jnp.zeros((0, 3), jnp.float32), 0.5,
                                        capacity=8)
    assert int(n_vox) == 0 and not np.asarray(mask).any()


def test_voxel_padding_is_inert(rng):
    # n_valid padding (the size-bucketing path) must not move centroids,
    # create voxels, or shift the lattice anchor
    pts = rng.uniform(-1, 3, (300, 3)).astype(np.float32)
    want, n_want = voxel_downsample_np(pts, 0.4)  # bucket 512, n_valid=300
    pad = np.broadcast_to(pts[0], (212, 3))
    padded = jnp.asarray(np.concatenate([pts, pad], axis=0))
    out, mask, n_vox = voxel_downsample(padded, 0.4, capacity=512,
                                        n_valid=300)
    assert int(n_vox) == n_want
    np.testing.assert_allclose(np.asarray(out)[:n_want], want,
                               rtol=1e-6, atol=1e-7)


def test_voxel_np_bucket_reuses_one_program(rng):
    # distinct scan sizes within one power-of-two bucket must share one
    # compiled program (multi-minute tunnel compiles otherwise; CLAUDE.md
    # rule 3)
    voxel_downsample_np(rng.standard_normal((300, 3)).astype(np.float32), 0.3)
    before = voxel_downsample._cache_size()
    for n in (257, 300, 389, 511, 512):
        voxel_downsample_np(
            rng.standard_normal((n, 3)).astype(np.float32), 0.3)
    assert voxel_downsample._cache_size() == before


@pytest.mark.slow
def test_slam_cli_voxel_flag(tmp_path, rng):
    import os
    import subprocess
    import sys

    world = rng.standard_normal((400, 3))
    th = 0.08
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
    scan0, scan1 = world, world @ R.T + np.array([0.1, -0.05, 0.02])
    for i, s in enumerate((scan0, scan1)):
        lines = ["Points_0,Points_1,Points_2"] + [
            ",".join(f"{x:.8g}" for x in row) for row in s]
        (tmp_path / f"scan{i}.txt").write_text("\n".join(lines) + "\n")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    r = subprocess.run(
        [sys.executable, "-m", "icp_tpu.slam.cli", "scan0.txt", "scan1.txt",
         "--voxel", "0.2", "--nn", "bcast"],
        capture_output=True, text=True, cwd=tmp_path, env=env, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "voxel 0.2" in r.stderr
    out1 = np.loadtxt(tmp_path / "registered_1.txt", delimiter=",",
                      skiprows=1)
    # scan1 registered into scan0's frame must land near the world cloud
    # (voxelized registration: centroid-level accuracy)
    d = np.linalg.norm(out1 - world, axis=1)
    assert np.median(d) < 0.05, np.median(d)
