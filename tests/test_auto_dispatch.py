"""Size-based ``nn_method="auto"`` dispatch (VERDICT r4 #7).

The reference picks its device execution shape automatically by problem
aspect (``computeDim``, ``src/GPU/compute.cu:66-90``); the TPU engine's
analog is picking the NN implementation by problem SIZE, using the measured
crossovers (docs/PERF.md): the dense Pallas kernel is VPU-roofline-bound and
the kd-grid engine reaches overhead-parity at cow size then wins 9.4x at
horse — so ``auto`` must route large clouds to the grid without the caller
reading the perf log.
"""

import numpy as np
import pytest

from icp_tpu.config import GRID_AUTO_THRESHOLD, ICPConfig


def test_auto_tpu_small_is_pallas():
    cfg = ICPConfig()
    assert cfg.resolved_nn_method("tpu", 2903) == "pallas"
    assert cfg.resolved_nn_method("tpu", GRID_AUTO_THRESHOLD - 1) == "pallas"


def test_auto_tpu_large_is_grid():
    cfg = ICPConfig()
    assert cfg.resolved_nn_method("tpu", GRID_AUTO_THRESHOLD) == "grid"
    assert cfg.resolved_nn_method("tpu", 48485) == "grid"  # horse
    assert cfg.resolved_nn_method("tpu", 1_000_000) == "grid"


def test_auto_tpu_unknown_size_is_pallas():
    # sites that cannot know the problem size keep the round-4 behavior
    assert ICPConfig().resolved_nn_method("tpu") == "pallas"


def test_auto_cpu_is_bcast_at_every_size():
    cfg = ICPConfig()
    for n in (10, 2903, GRID_AUTO_THRESHOLD, 1_000_000):
        assert cfg.resolved_nn_method("cpu", n) == "bcast"


def test_explicit_method_passes_through():
    for m in ("bcast", "matmul", "pallas", "grid", "bf16"):
        cfg = ICPConfig(nn_method=m)
        assert cfg.resolved_nn_method("tpu", 1_000_000) == m
        assert cfg.resolved_nn_method("cpu", 16) == m


def test_auto_end_to_end_on_cpu_backend():
    """``icp`` under auto must run (bcast) on the CPU test backend for a
    cloud past the TPU grid threshold — the threshold is TPU-only."""
    from icp_tpu.engine.icp import icp

    rng = np.random.default_rng(0)
    n = GRID_AUTO_THRESHOLD + 5
    model = rng.standard_normal((n, 3)).astype(np.float32)
    theta = 0.05
    R = np.array(
        [[np.cos(theta), -np.sin(theta), 0.0],
         [np.sin(theta), np.cos(theta), 0.0],
         [0.0, 0.0, 1.0]], np.float32)
    scene = model @ R.T + np.array([0.01, -0.02, 0.03], np.float32)
    res = icp(model, scene, ICPConfig(max_iter=3, validate_inputs=False))
    assert int(res.iters) >= 1
    assert np.isfinite(float(res.err))


@pytest.mark.slow
def test_auto_grid_branch_dispatches(monkeypatch):
    """Force the 'tpu' resolution on the CPU backend for a tiny cloud by
    dropping the threshold: the auto path must take the grid engine branch
    (pinned by matching the explicit-grid result exactly)."""
    import icp_tpu.config as config_mod
    from icp_tpu.engine.icp import icp

    rng = np.random.default_rng(1)
    model = rng.standard_normal((96, 3)).astype(np.float32)
    scene = model[:93] + 0.01 * rng.standard_normal((93, 3)).astype(np.float32)

    monkeypatch.setattr(config_mod, "GRID_AUTO_THRESHOLD", 64)
    # resolved_nn_method reads the module global through the import above
    cfg_auto = ICPConfig(max_iter=3, validate_inputs=False,
                         grid_model_tile=32, grid_scene_tile=8)
    assert cfg_auto.resolved_nn_method("tpu", 96) == "grid"

    cfg_grid = ICPConfig(max_iter=3, validate_inputs=False, nn_method="grid",
                         grid_model_tile=32, grid_scene_tile=8)
    r_auto = icp(model, scene, cfg_auto)
    r_grid = icp(model, scene, cfg_grid)
    # on CPU auto resolves to bcast; grid NN is exact, so results agree
    assert int(r_auto.iters) == int(r_grid.iters)
    np.testing.assert_allclose(np.asarray(r_auto.points),
                               np.asarray(r_grid.points), atol=2e-5)
