#!/usr/bin/env python
"""Per-round weak-scaling artifact (VERDICT r3 #8 / SURVEY §6 target).

Runs the fixed-model weak-scaling sweep (``icp_tpu/bench/scaling.py``) on a
1 -> 2 -> 4 -> 8 virtual-device CPU mesh — the only measurable multi-device
trend in this one-chip environment — and writes one JSON artifact per round
to ``docs/perf/scaling_rNN.json`` so the trend is tracked across rounds.

Usage:  python scripts/run_scaling.py [round_number] [--points-per-device N]

The sweep measures an oversubscribed host (8 virtual devices share the same
CPU), so the efficiency column is a LOWER bound on real-ICI scaling: the
per-device compute does not shrink, only collective overhead is added.
"""

import json
import os
import sys

# The axon PJRT plugin registers at interpreter start (sitecustomize), so
# env vars set here are too late for it — re-exec with the full CPU-only
# environment before anything JAX-related loads (CLAUDE.md rule 1: a second
# TPU-registered process can kill an in-flight program on the shared chip).
if os.environ.get("_ICP_SCALING_REEXEC") != "1":
    env = dict(os.environ)
    env["_ICP_SCALING_REEXEC"] = "1"
    env["PALLAS_AXON_POOL_IPS"] = ""  # never touch the shared TPU
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    os.execve(sys.executable, [sys.executable] + sys.argv, env)


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    rnd = int(argv.pop(0)) if argv and argv[0].isdigit() else 0
    ppd = 16384
    if "--points-per-device" in argv:
        i = argv.index("--points-per-device")
        ppd = int(argv[i + 1])

    from icp_tpu.bench.scaling import run_cell

    cells = []
    base = None
    for d in (1, 2, 4, 8):
        cell = run_cell(d, ppd, n_iters=3, ring=True, model_points=16384)
        if base is None:
            base = cell["wall_s"]
        cell["weak_scaling_efficiency"] = round(base / cell["wall_s"], 3)
        print(json.dumps(cell), flush=True)
        cells.append(cell)

    out = {
        "protocol": "fixed-model weak scaling, scene grows with devices, "
        "best-of-3 walls, oversubscribed 8-virtual-device CPU mesh "
        "(lower bound on ICI scaling)",
        "points_per_device": ppd,
        "cells": cells,
    }
    if rnd:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "docs", "perf", f"scaling_r{rnd:02d}.json",
        )
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print(f"[scaling] wrote {path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
