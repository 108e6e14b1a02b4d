"""Fully-fused ICP iteration kernel (kernels/icp_fused.py) vs the composable
op pipeline — interpret mode on CPU.

The fused kernel is the default dense TPU path (one Pallas dispatch per
iteration: in-kernel transform apply + NN fold carrying winning coordinates +
Horn-stats reduction + scalar-core QCP solve).  These tests pin its numerics
against the op pipeline (``engine/icp.icp_step``) that the oracle suite
already validates, including the reference's tie-break contract (lowest model
index — ``src/cpu.cc:22``, ``src/GPU/compute.cu:137``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icp_tpu.config import ICPConfig
from icp_tpu.engine.icp import icp, icp_fixed_iters, icp_step
from icp_tpu.kernels.icp_fused import (
    _CHUNK,
    _UNROLL_CHUNKS,
    fused_icp_step,
    fused_path_available,
    prepare_fused_inputs,
)
from icp_tpu.kernels.qcp_pallas import identity_state, unpack_state
from icp_tpu.ops.transform import apply_similarity


def _pipeline_step(scene, model):
    """One op-pipeline iteration (the fused kernel's reference)."""
    return icp_step(
        scene, model, solver="qcp", nn_method="bcast", with_scale=True,
        reference_compat=True, scene_tile=128, model_tile=512,
    )


def _fused_step(scene, model, with_scale=True):
    prep = prepare_fused_inputs(jnp.asarray(scene), jnp.asarray(model))
    state = fused_icp_step(prep, identity_state(), with_scale=with_scale,
                           interpret=True)
    return unpack_state(state)


@pytest.mark.parametrize("n,m", [(16, 100), (100, 300), (257, 950)])
def test_fused_step_matches_pipeline(n, m, rng):
    p = rng.standard_normal((n, 3)).astype(np.float32)
    mm = rng.standard_normal((m, 3)).astype(np.float32) * 2.0
    step, total, resid = _fused_step(p, mm)
    _, sim, err = _pipeline_step(jnp.asarray(p), jnp.asarray(mm))
    np.testing.assert_allclose(np.asarray(step.R), np.asarray(sim.R),
                               atol=1e-5)
    np.testing.assert_allclose(float(step.s), float(sim.s), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(step.t), np.asarray(sim.t),
                               atol=1e-5)
    # first iteration: total == step
    np.testing.assert_allclose(np.asarray(total.R), np.asarray(step.R),
                               atol=1e-6)
    # fused residual is the closed-form Horn optimum; pipeline's is the
    # recomputed (N,3) reduction — same quantity to f32 rounding
    np.testing.assert_allclose(2.0 * float(resid) / n, float(err),
                               rtol=1e-3, atol=1e-5)


def test_fused_large_model_fori_path(rng):
    # model large enough to leave the unrolled fold (> _UNROLL_CHUNKS chunks)
    m = _CHUNK * (_UNROLL_CHUNKS + 3) + 17  # ragged, forces fori + padding
    p = rng.standard_normal((64, 3)).astype(np.float32)
    mm = rng.standard_normal((m, 3)).astype(np.float32)
    step, _, _ = _fused_step(p, mm)
    _, sim, _ = _pipeline_step(jnp.asarray(p), jnp.asarray(mm))
    np.testing.assert_allclose(np.asarray(step.R), np.asarray(sim.R),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(step.t), np.asarray(sim.t),
                               atol=1e-5)


def test_fused_tie_break_lowest_index(rng):
    # One scene row exactly equidistant (d=1) from three planted model
    # points in different lanes AND different chunks: the winner must be
    # the lowest global model index, matching the bcast pipeline (reference
    # contract, ``src/cpu.cc:22``).  The other rows get unambiguous diverse
    # correspondences so the Horn solve is well-conditioned and a tie-break
    # flip (sum_y shifts by a unit vector) would move t well past 1e-5.
    m = _CHUNK * 2  # 2 chunks
    mm = (rng.standard_normal((m, 3)) * 10.0 + [20.0, 0.0, 0.0]).astype(
        np.float32)
    mm[np.sum(mm * mm, axis=1) < 4.0] += [10.0, 0.0, 0.0]  # keep d>1 to origin
    mm[3] = [1.0, 0.0, 0.0]
    mm[7] = [0.0, 1.0, 0.0]     # same chunk, later lane, equal distance
    mm[_CHUNK + 2] = [0.0, 0.0, 1.0]  # later chunk, equal distance
    p = np.empty((8, 3), np.float32)
    p[0] = [0.0, 0.0, 0.0]  # the tie: equidistant from all three planted pts
    for i in range(1, 8):
        p[i] = mm[50 + i] + 0.001 * i  # unambiguous NN = model[50 + i]
    step, _, _ = _fused_step(p, mm)
    _, sim, _ = _pipeline_step(jnp.asarray(p), jnp.asarray(mm))
    np.testing.assert_allclose(np.asarray(step.R), np.asarray(sim.R),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(step.t), np.asarray(sim.t),
                               atol=1e-4)


def test_fused_full_icp_matches_pipeline(cow_pair):
    ref, tr1 = cow_pair
    ref = np.ascontiguousarray(ref[::4], np.float32)
    tr1 = np.ascontiguousarray(tr1[::4], np.float32)
    fused = icp(ref, tr1, ICPConfig(max_iter=25, dtype=jnp.float32,
                                    solver="qcp_fused", nn_method="pallas"))
    plain = icp(ref, tr1, ICPConfig(max_iter=25, dtype=jnp.float32,
                                    solver="qcp", nn_method="bcast"))
    assert int(fused.iters) == int(plain.iters)
    assert float(fused.err) < 1e-5
    np.testing.assert_allclose(np.asarray(fused.points),
                               np.asarray(plain.points), atol=1e-4)
    np.testing.assert_allclose(np.asarray(fused.transform.R),
                               np.asarray(plain.transform.R), atol=1e-5)


def test_fused_fixed_iters_and_warm_start(cow_pair):
    ref, tr1 = cow_pair
    ref = np.ascontiguousarray(ref[::8], np.float32)
    tr1 = np.ascontiguousarray(tr1[::8], np.float32)
    # fixed-iteration parity (the bench workload)
    fused = icp_fixed_iters(ref, tr1, n_iters=6, solver="qcp_fused",
                            nn_method="pallas")
    plain = icp_fixed_iters(ref, tr1, n_iters=6, solver="qcp",
                            nn_method="bcast")
    np.testing.assert_allclose(np.asarray(fused.points),
                               np.asarray(plain.points), atol=1e-4)
    # warm start: seeding with the 6-iter transform must continue, not
    # restart — the returned transform still maps the caller's scene
    res = icp(ref, tr1, ICPConfig(max_iter=25, dtype=jnp.float32,
                                  solver="qcp_fused", nn_method="pallas"),
              init=fused.transform)
    assert float(res.err) < 1e-5
    np.testing.assert_allclose(
        np.asarray(res.points),
        np.asarray(apply_similarity(jnp.asarray(tr1), res.transform)),
        atol=1e-4,
    )


@pytest.mark.parametrize("n,m", [
    (127, 128), (128, 129), (129, 127),   # scene-tile boundary
    (8, 255), (9, 256), (7, 257),         # chunk boundary + tiny scenes
])
def test_fused_boundary_sizes_match_pipeline(n, m, rng):
    """Padding edges: scene sizes straddling the 128-row tile and model
    sizes straddling the 128-lane chunk must not leak padded rows/lanes
    into the winner or the stats."""
    p = rng.standard_normal((n, 3)).astype(np.float32)
    mm = rng.standard_normal((m, 3)).astype(np.float32) * 2.0
    step, _, _ = _fused_step(p, mm)
    _, sim, _ = _pipeline_step(jnp.asarray(p), jnp.asarray(mm))
    np.testing.assert_allclose(np.asarray(step.R), np.asarray(sim.R),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(step.t), np.asarray(sim.t),
                               atol=1e-5)


def test_fused_path_gating():
    assert fused_path_available("qcp_fused", "pallas", 0.0, 1000)
    assert not fused_path_available("qcp_fused", "pallas", 0.1, 1000)  # trim
    assert not fused_path_available("eigh", "pallas", 0.0, 1000)
    assert not fused_path_available("qcp_fused", "grid", 0.0, 1000)
    assert not fused_path_available("qcp_fused", "pallas", 0.0, 10**7)


def test_fused_trace_and_guard_paths(cow_pair):
    # the scan-trace and device-guard drivers share the fused body
    ref, tr1 = cow_pair
    ref = np.ascontiguousarray(ref[::8], np.float32)
    tr1 = np.ascontiguousarray(tr1[::8], np.float32)
    tr = icp(ref, tr1, ICPConfig(max_iter=25, dtype=jnp.float32,
                                 solver="qcp_fused", nn_method="pallas"),
             trace=True)
    iters = int(tr.result.iters)
    errs = np.asarray(tr.errs)
    assert np.isfinite(errs[:iters]).all()
    assert errs[iters - 1] < 1e-5
    g = icp(ref, tr1, ICPConfig(max_iter=25, dtype=jnp.float32,
                                solver="qcp_fused", nn_method="pallas"),
            guard="device")
    assert int(g.iters) == iters
