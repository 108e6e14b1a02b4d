"""Configuration for the TPU-native ICP engine.

The reference exposes its knobs as 3 positional CLI args, compile-time macros
(``REF_PATH``/``SCENE_PATH``, ``BATCH_SIZE=1280``, thread-block shapes; see
reference ``src/GPU/compute.cu:7-9``, ``src/bench.cc:7-8``) and one hardcoded
convergence threshold (``src/cpu.hh:113``).  Here everything lives in one
dataclass, consumable from Python or CLI flags.
"""

from __future__ import annotations

import dataclasses
# (no typing imports needed)

import jax.numpy as jnp

# Smallest cloud (max of model/scene rows) at which ``nn_method="auto"``
# dispatches to the kd-grid engine on TPU.  Measured crossover sweep on
# subsampled horse (real surface data, r05 chip capture — docs/PERF.md
# "auto-dispatch crossover"): dense wins at 2,021 pts (13.7 vs 15.9 us),
# grid wins 1.34x at 4,041, 1.95x at 8,081, 4.05x at 16,162; cow (2,903)
# measures parity-band.  The crossover sits at ~3-3.5k points; 4,096 keeps
# every measured grid-winning size on the grid path while cow-sized and
# smaller clouds stay on the dense/fused kernel.
GRID_AUTO_THRESHOLD = 4096


@dataclasses.dataclass(frozen=True)
class ICPConfig:
    """All tunables of the ICP engine.

    Attributes:
      max_iter: maximum outer iterations (reference: argv[3]).
      threshold: convergence threshold on the per-iteration error
        (reference: ``threshold = 1e-5``, ``src/cpu.hh:113``).  Checked against
        the *reported* error, which in ``reference_compat`` mode is ~2x the MSE
        (QUIRK-1, see ``engine/icp.py``).
      dtype: compute dtype for point coordinates / distances / accumulations.
        The reference is float64 throughout; on TPU the fast path is float32
        with HIGHEST-precision matmuls (validated against the float64 oracle
        in tests; ``compute_alignment_stats`` accepts a separate ``acc_dtype``
        for power users).
      reference_compat: if True, report the reference's error metric
        ``(err_alignment + err_apply) / np`` which double-counts the residual
        (~2x MSE, reference ``src/cpu.cc:63-73``).  If False, report plain MSE.
      solver: alignment eigenproblem solver: ``"eigh"`` (jnp.linalg.eigh on the
        Horn 4x4 N-matrix), ``"qcp"`` (Newton on the quartic characteristic
        polynomial + adjugate eigenvector; branch-free), ``"qcp_fused"``
        (same math fused into one Pallas scalar-core kernel; fastest on TPU),
        ``"kabsch"`` (3x3 SVD), or ``"auto"``.
      nn_method: correspondence search implementation: ``"bcast"`` (fused XLA
        broadcast), ``"matmul"`` (||a||^2+||b||^2-2ab), ``"pallas"`` (tiled
        fused MXU kernel), ``"grid"`` (kd-tiled spatially-pruned kernel —
        exact, fastest for large clouds; ``kernels/nn_grid.py``), or
        ``"auto"`` (size-based dispatch on TPU: pallas below
        ``GRID_AUTO_THRESHOLD`` points, grid at or above it — the measured
        crossover, docs/PERF.md; bcast elsewhere).
      scene_tile / model_tile: Pallas NN kernel tile sizes (scene points x
        model points per grid step).  Replaces the reference's empirically
        found ``BATCH_SIZE=1280`` scene batching (``src/GPU/compute.cu:7-9``).
      validate_inputs: if True, enforce the reference's input checks (equal
        point counts, >=4 points, ``src/cpu.cc:42-53``).  The equal-count
        restriction is an artifact (NN correspondence does not need np==nm);
        disable to register e.g. the bunny views.
      with_scale: estimate the similarity scale factor (reference always does);
        False gives rigid (SE(3)) alignment for SLAM use.
      trim_fraction: trimmed-ICP outlier rejection — drop this fraction of
        the worst correspondences (by current distance) from every alignment
        solve.  0.0 (default) reproduces the reference exactly; ~0.1-0.4 is
        typical for partially overlapping real scans.  Reported error becomes
        the mean over KEPT correspondences.
      grid_scene_tile / grid_model_tile: target kd tile sizes for the
        ``"grid"`` NN path (points per scene/model tile; rounded to hardware
        multiples).
      grid_max_candidates: candidate-model-tile capacity per scene tile for
        the grid path;
        iterations whose candidate count exceeds it fall back to the dense
        kernel (exactness is never affected).
    """

    max_iter: int = 200
    threshold: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    reference_compat: bool = True
    solver: str = "auto"
    nn_method: str = "auto"
    scene_tile: int = 256
    model_tile: int = 4096
    validate_inputs: bool = True
    with_scale: bool = True
    trim_fraction: float = 0.0
    grid_scene_tile: int = 256
    grid_model_tile: int = 1024
    grid_max_candidates: int = 16

    def resolved_solver(self, backend: str) -> str:
        if self.solver != "auto":
            return self.solver
        return "qcp_fused" if backend == "tpu" else "eigh"

    def resolved_nn_method(self, backend: str,
                           n_points: int | None = None) -> str:
        """Resolve ``"auto"`` to a concrete NN implementation.

        ``n_points``: the dense problem scale — max(model rows, scene rows)
        — when the caller knows it.  Size-based dispatch (the reference's
        ``computeDim`` analog, ``src/GPU/compute.cu:66-90``, which picks
        thread-block shapes by aspect ratio) built on the measured
        crossovers in docs/PERF.md: the dense Pallas kernel is at the VPU
        roofline and the kd-grid engine reaches overhead-parity at cow size
        (43.7 vs 41.8 us/iter), then wins 9.4x at horse (48,485) and 9.2x
        at 1M — so past ``GRID_AUTO_THRESHOLD`` the grid path is strictly
        better on TPU.  CPU stays on ``bcast``: it is the oracle/test
        backend, where Pallas kernels run in interpret mode.
        """
        if self.nn_method != "auto":
            return self.nn_method
        if backend == "tpu":
            if n_points is not None and n_points >= GRID_AUTO_THRESHOLD:
                return "grid"
            return "pallas"
        return "bcast"
