"""Benchmark-infrastructure tests (CPU, tiny workloads) — keeps the harness,
scaling protocol, and graft entry points from rotting."""

import json
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


@pytest.mark.slow
def test_graft_dryrun_multichip():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(min(8, len(jax.devices())))


def _run_bench(extra_env, timeout=300):
    import os

    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
               **extra_env)
    env.pop("ICP_BENCH_TEST_HANG", None)
    env.update(extra_env)
    return subprocess.run(
        [sys.executable, "/root/repo/bench.py"],
        capture_output=True, text=True, env=env, timeout=timeout,
    )


@pytest.mark.slow
def test_bench_success_path_emits_one_json_line():
    proc = _run_bench({})
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.splitlines() if l.strip()]
    assert len(lines) == 1
    rec = json.loads(lines[0])
    assert rec["metric"] == "icp_iter_per_s_cow"
    assert rec["unit"] == "iter/s"
    assert rec["value"] > 0
    assert rec["vs_baseline"] > 0


@pytest.mark.slow
def test_bench_watchdog_kills_hung_phase_and_diagnoses():
    """The round-2 failure mode: the tunnel hangs inside backend init / remote
    compile.  The supervisor must kill the exact child process group, retry,
    and emit a diagnostic JSON line instead of hanging the driver."""
    proc = _run_bench({
        "ICP_BENCH_TEST_HANG": "gate",
        "ICP_BENCH_GATE_TIMEOUT": "3",
        "ICP_BENCH_ATTEMPTS": "2",
        "ICP_BENCH_BACKOFF": "1",
    }, timeout=240)
    assert proc.returncode == 1
    lines = [l for l in proc.stdout.splitlines() if l.strip()]
    assert len(lines) == 1
    rec = json.loads(lines[0])
    assert rec["value"] == 0.0
    assert "watchdog" in rec["error"]
    att = rec["diagnostic"]["attempts"]
    assert len(att) == 2
    assert all(a["phase"] == "gate" for a in att)


@pytest.mark.slow
def test_bench_retry_recovers_from_one_bad_attempt(tmp_path):
    """First attempt hangs (flag file present -> child consumes it and
    sleeps), watchdog kills it, second attempt runs clean -> rc 0."""
    flag = tmp_path / "hang_once"
    flag.write_text("")
    proc = _run_bench({
        "ICP_BENCH_TEST_HANG_ONCE_FILE": str(flag),
        "ICP_BENCH_INIT_TIMEOUT": "10",
        "ICP_BENCH_ATTEMPTS": "2",
        "ICP_BENCH_BACKOFF": "1",
    })
    assert proc.returncode == 0, proc.stderr[-2000:]
    rec = json.loads(proc.stdout.strip())
    assert rec["value"] > 0
    assert not flag.exists()


@pytest.mark.slow
def test_bench_rc0_without_verdict_diagnosed():
    """A child that exits 0 with no JSON verdict (lost stdout) must still
    yield a non-null error in the diagnostic JSON, not "error": null."""
    proc = _run_bench({
        "ICP_BENCH_TEST_DROP_VERDICT": "1",
        "ICP_BENCH_ATTEMPTS": "1",
    })
    assert proc.returncode == 1
    rec = json.loads(proc.stdout.strip())
    assert rec["value"] == 0.0
    assert "without a JSON verdict" in rec["error"]


def test_perf_gate_compares_artifacts(tmp_path):
    # the regression gate must fail on >tolerance rate drops and on dropped
    # metrics, pass otherwise, and read both artifact formats
    import os
    gate = "/root/repo/scripts/perf_gate.py"

    old = tmp_path / "old.jsonl"
    old.write_text(
        '{"benchmark": "full_loop_per_iter", "rate_per_s": 25000.0, '
        '"time_us": 40.0}\n'
        '{"benchmark": "closest_pallas", "rate_per_s": 90000.0}\n'
    )
    new_ok = tmp_path / "new_ok.jsonl"
    new_ok.write_text(
        '{"benchmark": "full_loop_per_iter", "rate_per_s": 24000.0}\n'
        '{"benchmark": "closest_pallas", "rate_per_s": 95000.0}\n'
    )
    new_bad = tmp_path / "new_bad.jsonl"
    new_bad.write_text(
        '{"benchmark": "full_loop_per_iter", "rate_per_s": 15000.0}\n'
        '{"benchmark": "closest_pallas", "rate_per_s": 95000.0}\n'
    )
    new_dropped = tmp_path / "new_dropped.jsonl"
    new_dropped.write_text(
        '{"benchmark": "full_loop_per_iter", "rate_per_s": 25000.0}\n'
    )

    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")

    def run(a, b):
        return subprocess.run([sys.executable, gate, str(a), str(b)],
                              capture_output=True, text=True, env=env)

    assert run(old, new_ok).returncode == 0
    r = run(old, new_bad)
    assert r.returncode == 1 and "FAIL" in r.stdout
    r = run(old, new_dropped)
    assert r.returncode == 1 and "dropped" in r.stdout

    # driver BENCH_rN.json format
    bench_old = tmp_path / "BENCH_old.json"
    bench_old.write_text(json.dumps({
        "rc": 0, "parsed": {"metric": "icp_iter_per_s_cow",
                            "value": 27016.8, "unit": "iter/s"}}))
    bench_new = tmp_path / "BENCH_new.json"
    bench_new.write_text(json.dumps({
        "rc": 0, "parsed": {"metric": "icp_iter_per_s_cow",
                            "value": 26000.0, "unit": "iter/s"}}))
    assert run(bench_old, bench_new).returncode == 0


def test_numpy_host_engine_registers():
    # the dual-engine baseline row must do real ICP work, not just burn
    # time: 15 iterations on the exact-transform cow pair must land the
    # scene on the model
    import numpy as np

    from icp_tpu.bench.harness import _numpy_icp, load_cow

    ref, tr1 = load_cow()
    ref, tr1 = ref[::10], tr1[::10]
    wall, p = _numpy_icp(ref, tr1, 15)
    assert wall > 0
    assert np.abs(np.asarray(p) - np.asarray(ref, np.float64)).max() < 1e-3


def test_amortized_inner_chaining():
    # inner=K copies per step must report the same per-call time scale
    x = jnp.ones((64, 64), jnp.float32)

    def fn(a, c):
        return jnp.sum(a * (1.0 + c * 1e-20))

    per = amortized_op_time(fn, (x,), n_small=5, n_big=50, reps=2, inner=8)
    assert -0.01 <= per < 0.1


def test_roofline_spec_and_bounds():
    from icp_tpu.bench.roofline import (
        chip_spec,
        mfu_fields,
        nn_vpu_bound_pairs_per_s,
    )

    spec = chip_spec("TPU v5 lite")
    assert spec is not None and spec.name == "TPU v5e"
    # analytic VPU bound: lanes x ALUs x clock / lane-ops-per-pair
    assert spec.vpu_lane_ops_per_s == 8 * 128 * 4 * 0.94e9
    bound = nn_vpu_bound_pairs_per_s(spec, "closest_pallas")
    assert abs(bound - spec.vpu_lane_ops_per_s / 10.0) < 1.0
    # the r03 measured kernel (0.315e12 pairs/s) sits at ~82% of this bound
    assert 0.7 < 0.315e12 / bound < 1.0
    row = mfu_fields(spec, "closest_pallas", 0.315e12, None, 26.7e-6)
    assert 70.0 < row["mfu_pct"] < 100.0
    # bandwidth util for an elementwise op: bytes / time / spec BW
    row = mfu_fields(spec, "err_compute", None, 2 * 2903 * 3 * 4, 1.0e-6)
    assert 0.0 < row["hbm_util_pct"] < 100.0
    # unknown chip (CPU backend): no fabricated utilization fields
    assert chip_spec("cpu-thing") is None
    assert mfu_fields(None, "closest_pallas", 1.0, 1.0, 1.0) == {}


def test_fused_iteration_bound():
    """The whole-iteration analytic bound (VERDICT r4 #3): component model
    pinned at cow size against the measured kernel slices."""
    from icp_tpu.bench.roofline import (
        chip_spec,
        fused_iteration_bound_s,
        iteration_mfu_pct,
    )

    spec = chip_spec("TPU v5 lite")
    b = fused_iteration_bound_s(spec, 2903, 2903)
    # the fold dominates and must match the NN-only model: 23 tiles x 23
    # chunks x 10 passes over (128,128) blocks ~= 22 us at the VPU rate
    assert 20e-6 < b["fold_s"] < 25e-6
    # extraction throughput floor ~4-5 us (44 passes over (tn,128) x 23
    # tiles) — the measured 13.8 us sits ABOVE it: the difference is the
    # serial cross-lane reduction latency the throughput model excludes
    assert 3e-6 < b["extract_s"] < 6e-6
    assert b["extract_s"] < 13.8e-6
    assert b["stats_s"] < 2e-6 and b["apply_s"] < 1e-6
    assert 1e-6 < b["solve_s"] < 3e-6
    # total pure-throughput bound ~29-31 us: BELOW the 41.8 us measurement
    # (the gap is reduction latency) and ABOVE the retired 33 us target's
    # implied budget once that latency is priced in (docs/PERF.md round 5)
    assert 27e-6 < b["total_s"] < 33e-6
    mfu = iteration_mfu_pct(spec, 2903, 2903, 42e-6)
    assert 65.0 < mfu < 80.0
    # off-TPU: no fabricated numbers
    assert iteration_mfu_pct(None, 2903, 2903, 42e-6) is None
    # scaling sanity: doubling the model ~doubles the fold term only
    b2 = fused_iteration_bound_s(spec, 2903, 5806)
    assert abs(b2["fold_s"] / b["fold_s"] - 2.0) < 0.1
    assert abs(b2["extract_s"] - b["extract_s"]) < 1e-9
