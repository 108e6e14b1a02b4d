#!/usr/bin/env python
"""Interleaved A/B capture decomposing the headline slide (VERDICT r4 #2).

The headline slid 27,017 (r01) -> 23,631 (r03) -> 22,197 (r04) iter/s with
no code regression ever identified.  This script alternates, in ONE capture
session on an idle host:

  (a) the fused whole-iteration path   (the r04+ default dense program)
  (b) the composable pipeline          (= the r01-era program STRUCTURE:
      tuned-tile pallas NN + HBM gather + XLA stats + qcp_fused scalar
      kernel with the state-block carry — what measured 36.9-39.3 us/iter
      in round 1, docs/PERF.md "Current status" table)
  (c) the plain NN kernel solo         (the longest-lived tracer op:
      26.9 us r01, 26.7 us r03, 28.4 us r04 in the same artifacts)

three rounds each, interleaved a-b-c-a-b-c so host/tunnel drift hits all
three equally.  Interpretation: if (b) and (c) sit above their r01/r03
numbers by the same factor as the headline slid, the slide is
chip/tunnel-side drift — re-pin the gate baseline; if (a) alone is high,
the fused path regressed — fix the kernel.

Writes docs/perf/drift_r05.json.  RUN SOLO on the TPU (CLAUDE.md rule 1).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HISTORY = {
    # per-iteration / per-call microseconds from committed artifacts
    "fused": {"r04": 43.93},          # harness_r04_hw.jsonl full_loop_per_iter
    "pipeline": {"r01": 39.3, "r03": 43.8, "r04": 42.26},
    # r01: PERF.md "tuned 256x4096 tiles + state-block carry" (the program
    # structure (b) reproduces); r03/r04: harness artifacts
    "nn_solo": {"r01": 26.9, "r03": 26.7, "r04": 28.4},
}


def main() -> int:
    import jax
    import jax.numpy as jnp

    from icp_tpu.bench.harness import amortized_op_time, load_cow, wall_time
    from icp_tpu.engine.icp import icp_fixed_iters
    from icp_tpu.kernels.nn_pallas import closest_point_indices_pallas

    assert jax.default_backend() == "tpu", "drift A/B must run on the chip"
    ref_np, tr1_np = load_cow()
    ref = jnp.asarray(ref_np, jnp.float32)
    tr1 = jnp.asarray(tr1_np, jnp.float32)

    def timed_loop(k, cache_tag=""):
        def run():
            out = icp_fixed_iters(ref, tr1, n_iters=k, solver="qcp_fused",
                                  nn_method="pallas", cache_tag=cache_tag)
            float(out.err)

        return wall_time(run, reps=8)

    def fused_pass():
        return (timed_loop(520) - timed_loop(20)) / 500

    def pipeline_pass():
        # cache_tag: inert static arg — fresh jit entry so the patched gate
        # below is re-evaluated instead of reusing the fused program, with
        # IDENTICAL kernels at every size.  (The earlier scene_tile=264 and
        # model_tile=4224 dodges changed the tiling at some sizes — the
        # confound class this capture exists to exclude.)
        import icp_tpu.kernels.icp_fused as _fm

        orig = _fm.fused_path_available
        _fm.fused_path_available = lambda *a, **k: False
        try:
            return (timed_loop(520, cache_tag="pipeline")
                    - timed_loop(20, cache_tag="pipeline")) / 500
        finally:
            _fm.fused_path_available = orig

    def nn_pass():
        return amortized_op_time(
            lambda m, p, c: closest_point_indices_pallas(p + c * 1e-20, m),
            (ref, tr1))

    # warm every program first so compiles never land inside the interleave
    print("[drift] warming programs ...", file=sys.stderr, flush=True)
    fused_pass(), pipeline_pass(), nn_pass()

    runs = {"fused": [], "pipeline": [], "nn_solo": []}
    t0 = time.time()
    for r in range(3):
        print(f"[drift] interleave round {r} ...", file=sys.stderr, flush=True)
        runs["fused"].append(fused_pass() * 1e6)
        runs["pipeline"].append(pipeline_pass() * 1e6)
        runs["nn_solo"].append(nn_pass() * 1e6)

    out = {
        "protocol": "interleaved a-b-c x3, one session, 20/520 differencing "
        "(wall_time reps=8), all programs pre-warmed",
        "wall_s": round(time.time() - t0, 1),
        "device": jax.devices()[0].device_kind,
        "history_us": HISTORY,
        "runs_us": {k: [round(v, 2) for v in vs] for k, vs in runs.items()},
        "best_us": {k: round(min(vs), 2) for k, vs in runs.items()},
    }
    # drift factors vs each path's own history
    best = out["best_us"]
    out["vs_history"] = {
        "pipeline_vs_r01": round(best["pipeline"] / HISTORY["pipeline"]["r01"], 3),
        "nn_vs_r01": round(best["nn_solo"] / HISTORY["nn_solo"]["r01"], 3),
        "fused_vs_r04": round(best["fused"] / HISTORY["fused"]["r04"], 3),
        "fused_vs_pipeline_today": round(best["fused"] / best["pipeline"], 3),
    }
    print(json.dumps(out, indent=1))
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "perf", "drift_r05.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"[drift] wrote {path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
