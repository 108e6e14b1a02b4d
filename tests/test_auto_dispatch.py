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


def test_engines_pass_problem_size_to_the_resolver(monkeypatch):
    """Pin the dispatch GLUE, not just the resolver: every engine entry
    must call ``resolved_nn_method(backend, n_points)`` with the max of the
    two cloud sizes.  (A spy records the call; without it, inverting the
    ``== "grid"`` branch in an engine would pass every CPU test, because on
    CPU auto always resolves to bcast — VERDICT-r5 review finding.)"""
    from icp_tpu.engine.icp import icp
    from icp_tpu.engine.point_to_plane import icp_point_to_plane
    from icp_tpu.engine.symmetric import icp_symmetric

    rng = np.random.default_rng(1)
    model = rng.standard_normal((96, 3)).astype(np.float32)
    scene = (model[:93] +
             0.01 * rng.standard_normal((93, 3)).astype(np.float32))

    calls = []
    orig = ICPConfig.resolved_nn_method

    def spy(self, backend, n_points=None):
        calls.append(n_points)
        return orig(self, backend, n_points)

    monkeypatch.setattr(ICPConfig, "resolved_nn_method", spy)
    cfg = ICPConfig(max_iter=2, validate_inputs=False)
    for engine in (icp, icp_point_to_plane, icp_symmetric):
        calls.clear()
        engine(model, scene, cfg)
        assert 96 in calls, (engine.__name__, calls)


def test_grid_auto_threshold_matches_measured_crossover():
    """The threshold constant must stay inside the measured crossover
    bracket (docs/PERF.md 'auto-dispatch crossover': dense wins at 2,021
    pts, grid wins from 4,041)."""
    from icp_tpu.config import GRID_AUTO_THRESHOLD

    assert 2021 < GRID_AUTO_THRESHOLD <= 4096
