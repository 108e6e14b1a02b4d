"""Sharded-engine tests on the virtual 8-device CPU mesh: ring == all-gather
== single-device, masking of padded rows, and unequal/odd point counts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icp_tpu import ICPConfig, icp
from icp_tpu.parallel.mesh import make_mesh
from icp_tpu.parallel.sharded import icp_sharded
from tests import oracle


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8, "conftest must fan out 8 CPU devices"
    return make_mesh()


def _cfg(**kw):
    base = dict(max_iter=20, dtype=jnp.float64, solver="eigh", nn_method="bcast")
    base.update(kw)
    return ICPConfig(**base)


def test_sharded_matches_single_device(cow_pair, mesh8):
    ref, tr1 = cow_pair
    ref, tr1 = np.ascontiguousarray(ref[::10]), np.ascontiguousarray(tr1[::10])
    single = icp(ref, tr1, _cfg())
    for ring in (True, False):
        sharded = icp_sharded(ref, tr1, _cfg(), mesh=mesh8, ring=ring)
        assert int(sharded.iters) == int(single.iters), f"ring={ring}"
        np.testing.assert_allclose(
            np.asarray(sharded.points), np.asarray(single.points), atol=1e-9,
            err_msg=f"ring={ring}",
        )
        np.testing.assert_allclose(
            float(sharded.err), float(single.err), rtol=1e-9
        )


def test_sharded_odd_counts_padding(mesh8, rng):
    # 291 scene points and 1037 model points: neither divides 8 — exercises
    # both the scene mask and the far-away model padding.
    p = rng.standard_normal((291, 3))
    R = np.linalg.qr(rng.standard_normal((3, 3)))[0]
    if np.linalg.det(R) < 0:
        R[:, 0] = -R[:, 0]
    model = rng.standard_normal((1037, 3))
    scene = 1.4 * (model[:291] @ R.T) + np.array([0.2, -0.4, 0.6])
    cfg = _cfg(validate_inputs=False, max_iter=40)
    sharded = icp_sharded(model, scene, cfg, mesh=mesh8, ring=True)
    single = icp(model, scene, cfg)
    assert int(sharded.iters) == int(single.iters)
    np.testing.assert_allclose(
        np.asarray(sharded.points), np.asarray(single.points), atol=1e-8
    )


def test_ring_correspondence_global_indices(mesh8, rng):
    """The ring fold must produce the same matched points as the oracle
    (global-index correctness with sharded model)."""
    from jax.sharding import NamedSharding, PartitionSpec

    from icp_tpu.parallel.sharded import _ring_correspond

    p = rng.standard_normal((64, 3))
    m = rng.standard_normal((160, 3))
    want = oracle.closest_indices(p, m)

    axis = mesh8.axis_names[0]

    def run(p_loc, m_loc):
        pt, gi = _ring_correspond(p_loc, m_loc, axis=axis, n_dev=8)
        return pt, gi

    shard = PartitionSpec(axis, None)
    pt, gi = jax.jit(
        jax.shard_map(
            run,
            mesh=mesh8,
            in_specs=(shard, shard),
            out_specs=(shard, PartitionSpec(axis)),
            check_vma=False,
        )
    )(jnp.asarray(p), jnp.asarray(m))
    np.testing.assert_array_equal(np.asarray(gi), want)
    np.testing.assert_allclose(np.asarray(pt), m[want], rtol=1e-12)


@pytest.mark.parametrize("shape", [(4, 2), (2, 4), (8, 1), (1, 8)])
def test_2d_mesh_matches_single_device(cow_pair, shape):
    from icp_tpu.parallel.sharded import icp_sharded_2d, make_mesh_2d

    ref, tr1 = cow_pair
    ref, tr1 = np.ascontiguousarray(ref[::10]), np.ascontiguousarray(tr1[::10])
    single = icp(ref, tr1, _cfg())
    mesh = make_mesh_2d(*shape)
    sharded = icp_sharded_2d(ref, tr1, _cfg(), mesh=mesh)
    assert int(sharded.iters) == int(single.iters), f"shape={shape}"
    np.testing.assert_allclose(
        np.asarray(sharded.points), np.asarray(single.points), atol=1e-9,
        err_msg=f"shape={shape}",
    )


def test_2d_mesh_odd_counts(rng):
    from icp_tpu.parallel.sharded import icp_sharded_2d, make_mesh_2d

    model = rng.standard_normal((1037, 3))
    R = np.linalg.qr(rng.standard_normal((3, 3)))[0]
    if np.linalg.det(R) < 0:
        R[:, 0] = -R[:, 0]
    scene = 1.2 * (model[:291] @ R.T) + np.array([0.1, -0.2, 0.3])
    cfg = _cfg(validate_inputs=False, max_iter=40)
    mesh = make_mesh_2d(4, 2)
    sharded = icp_sharded_2d(model, scene, cfg, mesh=mesh)
    single = icp(model, scene, cfg)
    assert int(sharded.iters) == int(single.iters)
    np.testing.assert_allclose(
        np.asarray(sharded.points), np.asarray(single.points), atol=1e-8
    )


def test_ring_tie_breaks_to_lowest_global_index(mesh8):
    from jax.sharding import PartitionSpec

    from icp_tpu.parallel.sharded import _ring_correspond

    # All model points identical: every scene point must match global index 0,
    # whichever shard the fold visits first.
    p = np.tile(np.array([[1.0, 2.0, 3.0]]), (16, 1))
    m = np.ones((80, 3))
    axis = mesh8.axis_names[0]
    shard = PartitionSpec(axis, None)
    _, gi = jax.jit(
        jax.shard_map(
            lambda pl_, ml_: _ring_correspond(pl_, ml_, axis=axis, n_dev=8),
            mesh=mesh8,
            in_specs=(shard, shard),
            out_specs=(shard, PartitionSpec(axis)),
            check_vma=False,
        )
    )(jnp.asarray(p), jnp.asarray(m))
    np.testing.assert_array_equal(np.asarray(gi), np.zeros(16, np.int32))


def test_sharded_trace_matches_single_device_trace(cow_pair, mesh8):
    # Per-iteration error observability on the sharded path (scan loop) must
    # reproduce the single-device trace exactly, and agree with the
    # while-loop sharded result.
    ref, tr1 = cow_pair
    ref, tr1 = np.ascontiguousarray(ref[::10]), np.ascontiguousarray(tr1[::10])
    single_tr = icp(ref, tr1, _cfg(), trace=True)
    tr = icp_sharded(ref, tr1, _cfg(), mesh=mesh8, ring=True, trace=True)
    it = int(tr.result.iters)
    assert it == int(single_tr.result.iters)
    np.testing.assert_allclose(
        np.asarray(tr.errs)[:it], np.asarray(single_tr.errs)[:it], rtol=1e-9
    )
    plain = icp_sharded(ref, tr1, _cfg(), mesh=mesh8, ring=True)
    np.testing.assert_allclose(
        np.asarray(tr.result.points), np.asarray(plain.points), atol=1e-12
    )
    assert float(tr.errs[it - 1]) == pytest.approx(float(tr.result.err))


def test_2d_mesh_trace(cow_pair):
    from icp_tpu.parallel.sharded import icp_sharded_2d, make_mesh_2d

    ref, tr1 = cow_pair
    ref, tr1 = np.ascontiguousarray(ref[::10]), np.ascontiguousarray(tr1[::10])
    mesh = make_mesh_2d(4, 2)
    single_tr = icp(ref, tr1, _cfg(), trace=True)
    tr = icp_sharded_2d(ref, tr1, _cfg(), mesh=mesh, trace=True)
    it = int(tr.result.iters)
    assert it == int(single_tr.result.iters)
    np.testing.assert_allclose(
        np.asarray(tr.errs)[:it], np.asarray(single_tr.errs)[:it], rtol=1e-9
    )
