#!/usr/bin/env python
"""End-to-end bunny SLAM: chain registration + loop closure + pose graph.

Registers the 5 bunny views in a chain, adds a loop-closure edge
(bun315 -> bun000, a 45-degree pair), measures the accumulated chain drift
against the directly measured closure, then optimizes the pose graph and
reports the post-optimization consistency — the quantified benefit of the
SLAM back end over dead-reckoned chaining.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from icp_tpu.config import ICPConfig
from icp_tpu.io.csv import load_matrix
from icp_tpu.ops.transform import compose, inverse
from icp_tpu.slam.pairwise import chain_to_world_poses, register_chain, register_pair
from icp_tpu.slam.pose_graph import PoseEdge, optimize_pose_graph

VIEWS = ["bun000", "bun045", "bun180", "bun270", "bun315"]


def rel(pose_i, pose_j):
    """Relative transform of pose_j expressed in pose_i's frame."""
    return compose(pose_j, inverse(pose_i))


def consistency(pose_i, pose_j, edge):
    """Max-abs deviation between the pose-implied relative transform and the
    measured edge (rotation entries + translation)."""
    T = rel(pose_i, pose_j)
    dR = float(np.abs(np.asarray(T.R) - np.asarray(edge.R)).max())
    dt = float(np.abs(np.asarray(T.t) - np.asarray(edge.t)).max())
    return dR, dt


def main():
    data = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")
    sub = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    engine = sys.argv[2] if len(sys.argv) > 2 else "point_to_point"
    nn = sys.argv[3] if len(sys.argv) > 3 else None
    clouds = [load_matrix(os.path.join(data, v + ".txt"))[::sub] for v in VIEWS]
    backend = jax.default_backend()
    cfg = ICPConfig(
        max_iter=60,
        dtype=jnp.float32,
        solver="qcp_fused" if backend == "tpu" else "eigh",
        nn_method=nn or ("pallas" if backend == "tpu" else "bcast"),
        with_scale=False,
        validate_inputs=False,
        trim_fraction=0.3,
    )
    t0 = time.time()
    pairs = register_chain(clouds, cfg, multiscale=(8, 1), init="pca",
                           engine=engine)
    poses = chain_to_world_poses(pairs)

    # loop closure: bun315 (index 4) directly onto bun000 (index 0)
    closure = register_pair(clouds[4], clouds[0], cfg, multiscale=(8, 1),
                            init="pca", engine=engine)
    # closure.transform maps cloud0 -> cloud4 frame: edge (i=4, j=0)
    edges = [
        PoseEdge(k, k + 1, jnp.asarray(np.asarray(pairs[k].transform.R)),
                 jnp.asarray(np.asarray(pairs[k].transform.t)))
        for k in range(4)
    ] + [
        PoseEdge(4, 0, jnp.asarray(np.asarray(closure.transform.R)),
                 jnp.asarray(np.asarray(closure.transform.t)))
    ]

    dR0, dt0 = consistency(poses[4], poses[0], edges[-1])
    opt, cost = optimize_pose_graph(poses, edges, n_iters=15)
    dR1, dt1 = consistency(opt[4], opt[0], edges[-1])

    print(json.dumps(dict(
        closure_drift_before=dict(rot=round(dR0, 5), trans=round(dt0, 5)),
        closure_drift_after=dict(rot=round(dR1, 5), trans=round(dt1, 5)),
        graph_cost=cost,
        pair_errs=[round(p.err, 7) for p in pairs],
        closure_err=round(closure.err, 7),
        wall_s=round(time.time() - t0, 1),
        backend=backend,
        subsample=sub,
        engine=engine,
        nn_method=cfg.nn_method,
    )))


if __name__ == "__main__":
    main()
