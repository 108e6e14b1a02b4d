"""Checkpoint/resume for registration state.

The reference persists nothing but the final transformed cloud
(``output.txt``); transform state (s, R, t) is never saved (SURVEY.md §5).
Here the full transform state is checkpointable — required by the SLAM layer,
where per-pair results feed the pose graph, and useful for resuming long
multi-scan runs.  Plain ``.npz`` (no orbax dependency for 10 floats).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from icp_tpu.ops.alignment import Similarity


def save_checkpoint(
    path: str,
    *,
    transform: Similarity,
    iteration: int,
    err: float,
    points: Optional[np.ndarray] = None,
) -> None:
    data = dict(
        s=np.asarray(transform.s, np.float64),
        R=np.asarray(transform.R, np.float64),
        t=np.asarray(transform.t, np.float64),
        iteration=np.int64(iteration),
        err=np.float64(err),
    )
    if points is not None:
        data["points"] = np.asarray(points, np.float64)
    np.savez(path, **data)


def load_checkpoint(path: str):
    """Returns (Similarity, iteration, err, points-or-None)."""
    with np.load(path) as z:
        sim = Similarity(s=z["s"], R=z["R"], t=z["t"])
        pts = z["points"] if "points" in z.files else None
        return sim, int(z["iteration"]), float(z["err"]), pts
