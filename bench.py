#!/usr/bin/env python
"""Headline benchmark: ICP iterations/s per chip on the cow pair.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline = the reference's best engine (GPU-opti on GTX 1050): 20 ICP
iterations of the cow pair in 107 ms => ~187 iter/s (BASELINE.md).

Timing protocol: the full fixed-iteration ICP loop (correspondence + Horn
alignment + fused apply/error per iteration, all on device) timed at two
iteration counts and differenced — this cancels host<->device sync latency
(the axon tunnel costs ~35 ms per forced fetch and its block_until_ready is
async) and measures true per-iteration device throughput.  A convergence run
is also executed to assert the result is correct (err < 1e-5, the reference's
threshold) before any number is reported.

Resilience (round 3): the tunneled TPU backend has two failure modes that a
single-process bench cannot survive — ``UNAVAILABLE`` at backend init, and
indefinite hangs inside ``import jax`` / remote compile (measured: >10 min
for an identical cached program, docs/PERF.md "Compile latency").  So this
file is a *supervisor*: the measurement runs in a child process
(``bench.py --measure``) that emits phase markers on stderr; the parent
enforces a per-phase watchdog + a total budget, kills the exact child process
group on expiry, retries with backoff, and on final failure emits a
diagnostic JSON line (phase reached, elapsed, stderr tail per attempt)
instead of hanging the driver.

Env knobs (seconds unless noted):
  ICP_BENCH_INIT_TIMEOUT=600     backend-init phase watchdog
  ICP_BENCH_GATE_TIMEOUT=1200    convergence-gate phase (includes 1st compile)
  ICP_BENCH_MEASURE_TIMEOUT=1500 timing phase (r05: three loop paths
                                 measured interleaved, and first compiles
                                 of the pipeline/grid programs land here —
                                 remote-compile latency swings 3x between
                                 days, docs/PERF.md "Compile latency")
  ICP_BENCH_ATTEMPTS=2           supervised attempts
  ICP_BENCH_BACKOFF=20           sleep between attempts
  ICP_BENCH_TOTAL_TIMEOUT=2700   hard budget across all attempts
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

METRIC = "icp_iter_per_s_cow"
BASELINE_ITER_PER_S = 187.0

PHASES = ("spawn", "init", "gate", "measure", "done")
PHASE_MARK = "[bench:phase]"


def _env_float(name: str, default: float) -> float:
    try:
        return float(os.environ.get(name, default))
    except ValueError:
        return default


# --------------------------------------------------------------------------
# Child: the actual measurement (runs in its own process group)
# --------------------------------------------------------------------------

def _phase(name: str) -> None:
    print(f"{PHASE_MARK} {name}", file=sys.stderr, flush=True)
    if os.environ.get("ICP_BENCH_TEST_HANG") == name:
        time.sleep(3600)  # test hook: simulate a tunnel hang in this phase
    once = os.environ.get("ICP_BENCH_TEST_HANG_ONCE_FILE")
    if once and name == "init" and os.path.exists(once):
        os.remove(once)  # test hook: hang the FIRST attempt only
        time.sleep(3600)


def measure() -> int:
    _phase("init")
    import jax
    import jax.numpy as jnp

    from icp_tpu.bench.harness import load_cow, wall_time
    from icp_tpu.config import ICPConfig
    from icp_tpu.engine.icp import icp, icp_fixed_iters

    backend = jax.default_backend()
    # Force real backend initialization NOW so a dead tunnel fails (or hangs)
    # inside the init phase, not mid-gate.  block_until_ready is async through
    # the axon tunnel (CLAUDE.md rule 2) — only a scalar fetch proves the
    # device completed work.
    float(jnp.zeros(()))

    ref_np, tr1_np = load_cow()
    ref = jnp.asarray(ref_np, jnp.float32)
    tr1 = jnp.asarray(tr1_np, jnp.float32)
    on_tpu = backend == "tpu"
    solver = "qcp_fused" if on_tpu else "eigh"
    nn_method = "pallas" if on_tpu else "bcast"

    _phase("gate")
    if on_tpu:
        try:  # keep the bench robust to kernel regressions
            out = icp_fixed_iters(
                ref, tr1, n_iters=20, solver=solver, nn_method="pallas"
            )
            float(out.err)
        except Exception as e:
            print(f"[bench] pallas NN failed ({type(e).__name__}); "
                  "falling back to bcast", file=sys.stderr, flush=True)
            nn_method = "bcast"

    # Correctness gate: must converge within the reference threshold, and the
    # registered cloud must land on the reference cloud (cow_tr1 is an exact
    # transform of cow_ref) — the "alignment RMSE vs reference transform"
    # metric from BASELINE.json.
    import numpy as np

    res = icp(
        ref_np,
        tr1_np,
        ICPConfig(max_iter=30, solver=solver, nn_method=nn_method),
    )
    err = float(res.err)
    iters = int(res.iters)
    rmse = float(np.sqrt(np.mean(np.sum((np.asarray(res.points) - ref_np) ** 2, axis=1))))
    print(
        f"[bench] convergence gate: err={err:.3e} iters={iters} "
        f"alignment_rmse_vs_ref={rmse:.3e}",
        file=sys.stderr, flush=True,
    )
    if not (err < 1e-5):
        print(json.dumps({"metric": METRIC, "value": 0.0,
                          "unit": "iter/s", "vs_baseline": 0.0,
                          "error": f"did not converge: err={err}"}), flush=True)
        return 1

    _phase("measure")

    def timed_loop(k, cache_tag=""):
        def run():
            out = icp_fixed_iters(
                ref, tr1, n_iters=k, solver=solver, nn_method=nn_method,
                cache_tag=cache_tag,
            )
            float(out.err)  # force completion through the async tunnel

        return wall_time(run, reps=8)

    def timed_pipeline(k):
        # the composable pipeline (fused whole-iteration kernel disabled via
        # the gate predicate).  cache_tag is an inert static arg: fresh jit
        # entry so the patched gate is re-evaluated, identical kernels.
        import icp_tpu.kernels.icp_fused as _fm

        orig = _fm.fused_path_available
        _fm.fused_path_available = lambda *a, **kw: False
        try:
            return timed_loop(k, cache_tag="pipeline")
        finally:
            _fm.fused_path_available = orig

    def timed_grid(k):
        # kd-grid-pruned engine, fixed-iteration mode: exact (bit-parity
        # with dense pinned by tests), and as of r05 the fastest measured
        # cow loop (37.6 us/iter in harness_r05) — spatial pruning beats
        # the dense VPU roofline even at 2,903 points once bounds tighten.
        from icp_tpu.engine.grid import _icp_grid

        thr = jnp.asarray(0.0, jnp.float32)

        def run():
            res = _icp_grid(ref, tr1, thr, max_iter=10**6, solver=solver,
                            with_scale=True, reference_compat=True,
                            mode="fixed", n_iters=k)
            float(res.err)

        return wall_time(run, reps=8)

    # Best-of-3 differencing passes PER PATH, fused/pipeline INTERLEAVED in
    # the same capture (VERDICT r4 weak #2: the fused default measured ~4%
    # slower than the pipeline in r04 — the headline now runs whichever path
    # measures faster TODAY, and reports both so the A/B is an artifact).
    # Spread is reported because the shared tunneled device's sustained
    # throughput drifts 10-20% between runs (measured — same program, same
    # HLO, different day: 37.0 vs 44.7 us/iter); the headline `value` is the
    # best pass (the machine's capability, not its instantaneous load).
    runs_fused, runs_pipe, runs_grid = [], [], []
    if on_tpu:
        passes = {"fused": (timed_loop, runs_fused),
                  "pipeline": (timed_pipeline, runs_pipe),
                  "grid": (timed_grid, runs_grid)}
        dead = set()
        for _ in range(3):
            for pname, (timed, acc) in passes.items():
                if pname in dead:
                    continue
                try:  # one regressed path must not kill the headline
                    acc.append((timed(520) - timed(20)) / 500)
                except Exception as e:
                    dead.add(pname)
                    print(f"[bench] {pname} path failed "
                          f"({type(e).__name__}: {e}); dropped",
                          file=sys.stderr, flush=True)
        for acc in (runs_fused, runs_pipe, runs_grid):
            acc.sort()
        candidates = [(p, acc) for p, (_, acc) in passes.items() if acc]
        if not candidates:
            print(json.dumps({"metric": METRIC, "value": 0.0,
                              "unit": "iter/s", "vs_baseline": 0.0,
                              "error": "every loop path failed"}), flush=True)
            return 1
        path, runs = min(candidates, key=lambda kv: kv[1][0])
    else:
        runs = sorted(
            (timed_loop(520) - timed_loop(20)) / 500 for _ in range(3)
        )
        path = "pipeline"
    per_iter = runs[0]
    median = runs[len(runs) // 2]
    spread_pct = 100.0 * (runs[-1] - runs[0]) / runs[0]
    value = 1.0 / per_iter
    # True MFU vs the analytic chip roofline (bench/roofline.py): fraction of
    # the documented VPU bound the whole loop sustains — not a self-measured
    # normalizer (VERDICT r3 weak #6).
    # ``mfu_pct`` is vs the WHOLE-iteration analytic bound (apply + fold +
    # extraction + stats + solve — roofline.fused_iteration_bound_s), not
    # the NN-only bound that understated utilization by construction
    # (VERDICT r4 weak #3); ``mfu_nn_pct`` keeps the old normalization for
    # cross-round comparability.  Both describe the DENSE iteration's
    # instruction budget, so they are computed from the best dense pass
    # (fused/pipeline) even when the kd-grid path wins the headline — the
    # grid program does a fraction of the dense work by design, and
    # normalizing it against the dense bound would fake high utilization.
    mfu = mfu_nn = None
    from icp_tpu.bench.roofline import (
        chip_spec,
        iteration_mfu_pct,
        nn_vpu_bound_pairs_per_s,
    )
    spec = chip_spec(jax.devices()[0].device_kind)
    dense_runs = sorted(runs_fused + runs_pipe) or runs
    dense_best = dense_runs[0]
    if spec is not None:
        # icp_fixed_iters(ref, tr1): ref is the MODEL, tr1 the SCENE
        mfu = iteration_mfu_pct(spec, tr1.shape[0], ref.shape[0], dense_best)
        bound = nn_vpu_bound_pairs_per_s(spec, "closest_fused")
        mfu_nn = round(
            100.0 * ref.shape[0] * tr1.shape[0] / dense_best / bound, 1)
    print(
        f"[bench] per-iter best={per_iter*1e6:.1f} us, "
        f"median={median*1e6:.1f} us, spread={spread_pct:.1f}%, "
        f"mfu_iter={mfu}% (mfu_nn={mfu_nn}%) "
        f"(backend={backend}, nn={nn_method}, solver={solver}, path={path})",
        file=sys.stderr, flush=True,
    )
    _phase("done")
    if os.environ.get("ICP_BENCH_TEST_DROP_VERDICT"):
        return 0  # test hook: rc=0 with no JSON verdict (lost stdout)
    print(
        json.dumps(
            {
                "metric": METRIC,
                "value": round(value, 1),
                "unit": "iter/s",
                "vs_baseline": round(value / BASELINE_ITER_PER_S, 2),
                "iter_per_s_median": round(1.0 / median, 1),
                "per_iter_us_runs": [round(r * 1e6, 2) for r in runs],
                "spread_pct": round(spread_pct, 1),
                "mfu_pct": mfu,
                "mfu_nn_pct": mfu_nn,
                "path": path,
                "per_iter_us_fused": [round(r * 1e6, 2) for r in runs_fused],
                "per_iter_us_pipeline": [round(r * 1e6, 2) for r in runs_pipe],
                "per_iter_us_grid": [round(r * 1e6, 2) for r in runs_grid],
            }
        ),
        flush=True,
    )
    return 0


# --------------------------------------------------------------------------
# Parent: watchdog supervisor
# --------------------------------------------------------------------------

class _Attempt:
    def __init__(self) -> None:
        self.phase = "spawn"
        self.phase_t0 = time.time()
        self.stderr_tail: list[str] = []
        self.rc: int | None = None
        self.json_line: str | None = None
        self.failure: str | None = None

    def summary(self) -> dict:
        return {
            "phase": self.phase,
            "phase_elapsed_s": round(time.time() - self.phase_t0, 1),
            "rc": self.rc,
            "failure": self.failure,
            "stderr_tail": self.stderr_tail[-6:],
        }


def _drain_stderr(pipe, attempt: _Attempt) -> None:
    for raw in iter(pipe.readline, b""):
        line = raw.decode("utf-8", "replace").rstrip()
        if line.startswith(PHASE_MARK):
            attempt.phase = line[len(PHASE_MARK):].strip()
            attempt.phase_t0 = time.time()
        else:
            attempt.stderr_tail.append(line)
            if len(attempt.stderr_tail) > 50:
                del attempt.stderr_tail[:25]
        print(line, file=sys.stderr, flush=True)
    pipe.close()


def _run_attempt(deadline: float, phase_timeouts: dict[str, float]) -> _Attempt:
    import threading

    attempt = _Attempt()
    child = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--measure"],
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        start_new_session=True,  # own process group: killable without patterns
    )
    reader = threading.Thread(target=_drain_stderr, args=(child.stderr, attempt),
                              daemon=True)
    reader.start()
    try:
        while True:
            rc = child.poll()
            if rc is not None:
                attempt.rc = rc
                break
            now = time.time()
            budget = phase_timeouts.get(attempt.phase, 600.0)
            if now - attempt.phase_t0 > budget:
                attempt.failure = (
                    f"watchdog: phase '{attempt.phase}' exceeded {budget:.0f}s"
                )
                break
            if now > deadline:
                attempt.failure = "total benchmark budget exhausted"
                break
            time.sleep(1.0)
    finally:
        if attempt.failure is not None:
            try:  # kill the exact child process group (never by pattern)
                os.killpg(os.getpgid(child.pid), signal.SIGKILL)
            except (ProcessLookupError, PermissionError):
                pass
            child.wait()
            attempt.rc = child.returncode
    out = child.stdout.read().decode("utf-8", "replace")
    child.stdout.close()
    reader.join(timeout=5.0)
    for line in out.splitlines():
        line = line.strip()
        if line.startswith("{"):
            attempt.json_line = line
    if attempt.failure is None and attempt.json_line is None:
        # Covers rc!=0 AND the pathological rc==0-with-no-verdict (stdout
        # lost) — the diagnostic JSON must always carry a non-null error.
        attempt.failure = f"child exited rc={attempt.rc} without a JSON verdict"
    return attempt


def supervise() -> int:
    t0 = time.time()
    deadline = t0 + _env_float("ICP_BENCH_TOTAL_TIMEOUT", 2700.0)
    attempts_max = int(_env_float("ICP_BENCH_ATTEMPTS", 2))
    backoff = _env_float("ICP_BENCH_BACKOFF", 20.0)
    phase_timeouts = {
        "spawn": 120.0,
        "init": _env_float("ICP_BENCH_INIT_TIMEOUT", 600.0),
        "gate": _env_float("ICP_BENCH_GATE_TIMEOUT", 1200.0),
        "measure": _env_float("ICP_BENCH_MEASURE_TIMEOUT", 1500.0),
        "done": 120.0,
    }

    history: list[dict] = []
    for i in range(attempts_max):
        print(f"[bench] attempt {i + 1}/{attempts_max}", file=sys.stderr, flush=True)
        attempt = _run_attempt(deadline, phase_timeouts)
        history.append(attempt.summary())
        if attempt.json_line is not None:
            # Child produced its verdict (success OR a structured gate
            # failure) — pass it through verbatim and mirror its rc.
            print(attempt.json_line, flush=True)
            return attempt.rc or 0
        print(f"[bench] attempt {i + 1} failed: {attempt.failure}",
              file=sys.stderr, flush=True)
        if time.time() + backoff > deadline:
            break
        if i + 1 < attempts_max:
            time.sleep(backoff)

    print(json.dumps({
        "metric": METRIC,
        "value": 0.0,
        "unit": "iter/s",
        "vs_baseline": 0.0,
        "error": history[-1]["failure"] if history else "no attempt ran",
        "diagnostic": {
            "elapsed_s": round(time.time() - t0, 1),
            "attempts": history,
        },
    }), flush=True)
    return 1


def main() -> int:
    if "--measure" in sys.argv:
        return measure()
    return supervise()


if __name__ == "__main__":
    sys.exit(main())
