"""Multi-scan pairwise registration chains (the bunny workload).

The reference cannot register the bunny views at all: its input validation
requires equal point counts (``src/cpu.cc:42-53``) and the five Stanford
bunny views have different counts (31,701-40,256) plus real sensor noise
(``data_students/README.md``).  This layer lifts that restriction (brute-force
NN never needed it) and chains pairwise ICP into per-scan world poses — the
front end of the pose-graph extension (BASELINE.json configs 3 and 5).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import numpy as np

from icp_tpu.config import ICPConfig
from icp_tpu.engine.icp import ICPResult, icp
from icp_tpu.ops.alignment import Similarity
from icp_tpu.ops.transform import compose, identity_similarity


@dataclasses.dataclass
class PairwiseResult:
    """Result of registering scan i onto scan i-1 (or a given target)."""

    transform: Similarity  # maps source scan into the target frame
    err: float
    iters: int


def register_pair(
    model: np.ndarray,
    scene: np.ndarray,
    config: Optional[ICPConfig] = None,
) -> PairwiseResult:
    """ICP-register ``scene`` onto ``model`` (unequal counts allowed)."""
    cfg = config or ICPConfig()
    if cfg.validate_inputs:
        cfg = dataclasses.replace(cfg, validate_inputs=False)
    res: ICPResult = icp(model, scene, cfg)
    return PairwiseResult(
        transform=res.transform, err=float(res.err), iters=int(res.iters)
    )


def register_chain(
    clouds: Sequence[np.ndarray],
    config: Optional[ICPConfig] = None,
) -> List[PairwiseResult]:
    """Register each scan onto its predecessor: results[i] maps cloud i+1
    into cloud i's frame."""
    out = []
    for a, b in zip(clouds[:-1], clouds[1:]):
        out.append(register_pair(a, b, config))
    return out


def chain_to_world_poses(pairs: Sequence[PairwiseResult]) -> List[Similarity]:
    """Compose pairwise transforms into world poses (frame of scan 0).

    pose[i] maps scan i into scan-0 coordinates; pose[0] = identity.
    """
    import jax.numpy as jnp

    poses = [identity_similarity(jnp.float32)]
    for pr in pairs:
        # scan k+1 -> scan k (pr.transform), then scan k -> world (poses[-1]).
        poses.append(compose(pr.transform, poses[-1]))
    return poses
