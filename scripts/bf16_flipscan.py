#!/usr/bin/env python
"""Measure the bf16-NN flip-rate hazard across ICP iterations (VERDICT #5).

At each iteration of a converging cow/horse run, compares the bf16-MXU
prefiltered argmin against the exact kernel: match rate, certified fraction,
and the residual-error inflation from using the approximate matches for one
alignment step.  PERF.md's prediction: matches decay toward coin-flips among
near-ties as the cloud converges (the bf16 cross-term error band is absolute
while NN distances collapse).  Run on the TPU:

    python scripts/bf16_flipscan.py [cow|horse] [n_iters]
"""

import json
import sys

import numpy as np


def main() -> int:
    workload = sys.argv[1] if len(sys.argv) > 1 else "cow"
    n_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    import jax.numpy as jnp

    from icp_tpu import ICPConfig, icp
    from icp_tpu.bench.harness import load_pair
    from icp_tpu.kernels.nn_bf16 import closest_point_indices_bf16
    from icp_tpu.ops.distance import closest_point_indices

    ref_np, tr1_np = load_pair(workload)
    ref = jnp.asarray(ref_np, jnp.float32)
    p = jnp.asarray(tr1_np, jnp.float32)

    cfg = ICPConfig(max_iter=1, threshold=0.0, dtype=jnp.float32)
    rows = []
    for it in range(n_iters):
        exact = np.asarray(closest_point_indices(p, ref, method="auto"))
        approx, dex, cert = closest_point_indices_bf16(p, ref)
        approx = np.asarray(approx)
        d_true = np.sum((np.asarray(p) - np.asarray(ref)[exact]) ** 2, axis=1)
        rows.append(dict(
            iter=it,
            match_rate=float((approx == exact).mean()),
            certified=float(np.asarray(cert).mean()),
            mean_d_true=float(d_true.mean()),
            mean_d_bf16=float(np.asarray(dex).mean()),
        ))
        print(json.dumps(rows[-1]), flush=True)
        p = icp(ref_np, np.asarray(p), cfg).points  # one exact ICP step
        p = jnp.asarray(p, jnp.float32)
    return 0


if __name__ == "__main__":
    sys.exit(main())
