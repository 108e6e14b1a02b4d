"""Benchmark-infrastructure tests (CPU, tiny workloads) — keeps the harness,
scaling protocol, and graft entry points from rotting."""

import json
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np

from icp_tpu.bench.harness import amortized_op_time, wall_time
from icp_tpu.bench.scaling import run_cell, synthetic_pair


def test_amortized_op_time_sane():
    x = jnp.ones((64, 64), jnp.float32)

    def fn(a, c):
        return jnp.sum(a * (1.0 + c * 1e-20))

    per = amortized_op_time(fn, (x,), n_small=5, n_big=50, reps=2)
    # CPU timing noise can make the two-point difference slightly negative
    # for a microsecond-scale op; only catch gross breakage.
    assert -0.01 <= per < 0.1


def test_wall_time_forces_completion():
    x = jnp.ones((128, 128), jnp.float32)
    t = wall_time(lambda: float(jnp.sum(x @ x)), reps=2)
    assert 0 < t < 5.0


def test_synthetic_pair_protocol():
    model, scene = synthetic_pair(256, 1024)
    assert model.shape == (256, 3)
    assert scene.shape == (1024, 3)
    # scene rows are transformed copies of model rows (mod tiling)
    assert not np.allclose(scene[:256], model)


def test_scaling_cell_runs_on_mesh():
    cell = run_cell(
        n_devices=min(4, len(jax.devices())),
        points_per_device=64,
        n_iters=2,
        ring=True,
        model_points=128,
    )
    assert cell["iter_per_s"] > 0
    assert np.isfinite(cell["err"])


def test_graft_entry_single_chip():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    p_new = out[0]
    assert p_new.shape == args[1].shape


def test_graft_dryrun_multichip():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(min(8, len(jax.devices())))
