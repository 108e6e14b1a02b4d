"""Checkpoint + guard utility tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from icp_tpu.ops.alignment import Similarity
from icp_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from icp_tpu.utils.profiling import check_finite


def test_checkpoint_roundtrip(tmp_path):
    sim = Similarity(
        s=jnp.asarray(1.5, jnp.float32),
        R=jnp.eye(3, dtype=jnp.float32),
        t=jnp.asarray([1.0, 2.0, 3.0], jnp.float32),
    )
    pts = np.random.default_rng(0).standard_normal((10, 3))
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, transform=sim, iteration=7, err=1e-6, points=pts)
    sim2, it, err, pts2 = load_checkpoint(path)
    assert it == 7 and err == 1e-6
    np.testing.assert_allclose(np.asarray(sim2.s), 1.5)
    np.testing.assert_allclose(np.asarray(sim2.R), np.eye(3))
    np.testing.assert_allclose(pts2, pts)


def test_checkpoint_without_points(tmp_path):
    sim = Similarity(
        s=jnp.asarray(1.0, jnp.float32),
        R=jnp.eye(3, dtype=jnp.float32),
        t=jnp.zeros(3, jnp.float32),
    )
    path = str(tmp_path / "ck2.npz")
    save_checkpoint(path, transform=sim, iteration=1, err=0.5)
    _, _, _, pts = load_checkpoint(path)
    assert pts is None


def test_check_finite_raises_with_context():
    check_finite("ok", np.ones(3))
    with pytest.raises(FloatingPointError, match="icp-step: array 1"):
        check_finite("icp-step", np.ones(3), np.array([1.0, np.nan]))


def test_icp_guard_flag(cow_pair):
    from icp_tpu import ICPConfig, icp

    ref, tr1 = cow_pair
    cfg = ICPConfig(max_iter=2, dtype=jnp.float64, nn_method="bcast")
    res = icp(ref[::50], tr1[::50], cfg, guard=True)  # finite path: no raise
    assert np.isfinite(float(res.err))


@pytest.mark.slow
def test_profiling_trace_smoke(tmp_path):
    """trace() must not break the computation whether or not the backend
    supports profiling."""
    from icp_tpu.utils.profiling import trace

    with trace(str(tmp_path / "prof")):
        x = jnp.ones((64, 64))
        assert float(jnp.sum(x)) == 64 * 64


def test_run_with_metrics_structured_record(cow_pair, tmp_path):
    import json

    from icp_tpu import ICPConfig
    from icp_tpu.utils.metrics import run_with_metrics

    ref, tr1 = cow_pair
    tr, rec = run_with_metrics(
        ref, tr1, ICPConfig(max_iter=30, solver="eigh", nn_method="bcast")
    )
    assert rec.iters == int(tr.result.iters)
    assert len(rec.errs) == rec.iters and rec.errs[-1] < 1e-5
    assert rec.errs[0] > rec.errs[-1]
    d = json.loads(rec.to_json())
    assert d["solver"] == "eigh" and d["wall_s"] > 0


def test_cli_metrics_flag(cow_pair, tmp_path, monkeypatch):
    import json

    from icp_tpu.engine.cli import main
    from tests.conftest import data_path

    monkeypatch.chdir(tmp_path)
    mpath = str(tmp_path / "metrics.json")
    rc = main([data_path("cow_ref.txt"), data_path("cow_tr1.txt"), "30",
               "--metrics", mpath, "--solver", "eigh", "--nn", "bcast"])
    assert rc == 0
    rec = json.loads(open(mpath).read())
    assert rec["err"] < 1e-5 and len(rec["errs"]) == rec["iters"]
