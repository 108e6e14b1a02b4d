"""Static-shape bucketing (``ops/padding.py``): bucket-padded + masked runs
must match exact-shape runs, across every engine and NN path, while reusing
ONE compiled program per bucket.

Why this exists: a scan chain over varying cloud sizes (the bunny views,
31,701-40,256 points) otherwise compiles a fresh program per pair per
multiscale level — on the remote-compile TPU backend the compiles dominated
the SLAM wall time (docs/PERF.md round 4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from icp_tpu import ICPConfig, icp
from icp_tpu.ops.padding import (
    SENTINEL,
    bucket_size,
    pad_to_bucket,
    replica_fill,
    valid_mask,
)


def _rng(seed=7):
    # Local generator: the session-scoped ``rng`` fixture is a SHARED stream
    # (consuming draws here would shift every later test's data).
    return np.random.default_rng(seed)


def _cloud(rng, n):
    return rng.standard_normal((n, 3)).astype(np.float32)


def _pair(rng, n_model=203, n_scene=157, angle=0.3):
    """Unequal-count model/scene pair related by a modest rigid motion."""
    model = _cloud(rng, n_model)
    c, s = np.cos(angle), np.sin(angle)
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    t = np.array([0.05, -0.02, 0.03], np.float32)
    scene = (model[:n_scene] @ R.T + t).astype(np.float32)
    return model, scene


def _sim_params(res):
    return (
        float(res.transform.s),
        np.asarray(res.transform.R, np.float64),
        np.asarray(res.transform.t, np.float64),
    )


def _assert_same_result(res_pad, res_exact, n_scene, atol=5e-5):
    s_p, R_p, t_p = _sim_params(res_pad)
    s_e, R_e, t_e = _sim_params(res_exact)
    assert int(res_pad.iters) == int(res_exact.iters)
    np.testing.assert_allclose(s_p, s_e, atol=atol)
    np.testing.assert_allclose(R_p, R_e, atol=atol)
    np.testing.assert_allclose(t_p, t_e, atol=atol)
    np.testing.assert_allclose(
        float(res_pad.err), float(res_exact.err), rtol=1e-3, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(res_pad.points)[:n_scene], np.asarray(res_exact.points),
        atol=atol,
    )


def test_bucket_size():
    assert bucket_size(1) == 4096
    assert bucket_size(4096) == 4096
    assert bucket_size(4097) == 8192
    assert bucket_size(100, quantum=64) == 128
    with pytest.raises(ValueError):
        bucket_size(0)


def test_pad_to_bucket_sentinels():
    rng = _rng()
    c = _cloud(rng, 100)
    padded, n = pad_to_bucket(c, quantum=64)
    assert padded.shape == (128, 3) and n == 100
    np.testing.assert_array_equal(padded[:100], c)
    assert np.all(padded[100:] == SENTINEL)
    same, n2 = pad_to_bucket(c, quantum=64, n_pad=100)
    assert same.shape == (100, 3) and n2 == 100
    with pytest.raises(ValueError):
        pad_to_bucket(c, n_pad=50)


def test_replica_fill_and_mask():
    rng = _rng()
    c = jnp.asarray(_cloud(rng, 8))
    filled = replica_fill(c, 5)
    np.testing.assert_array_equal(np.asarray(filled[:5]), np.asarray(c[:5]))
    for r in range(5, 8):
        np.testing.assert_array_equal(np.asarray(filled[r]), np.asarray(c[4]))
    m = valid_mask(8, 5, jnp.float32)
    np.testing.assert_array_equal(np.asarray(m), [1, 1, 1, 1, 1, 0, 0, 0])


@pytest.mark.parametrize("nn_method", ["bcast", "pallas"])
@pytest.mark.parametrize("trim", [0.0, 0.2])
def test_dense_bucketed_matches_exact(nn_method, trim):
    rng = _rng()
    model, scene = _pair(rng)
    cfg = ICPConfig(max_iter=40, dtype=jnp.float32, solver="eigh",
                    nn_method=nn_method, validate_inputs=False,
                    with_scale=False, trim_fraction=trim)
    exact = icp(model, scene, cfg)
    m_pad, m_n = pad_to_bucket(model, quantum=128)
    s_pad, s_n = pad_to_bucket(scene, quantum=128)
    padded = icp(m_pad, s_pad, cfg, scene_n=s_n, model_n=m_n)
    _assert_same_result(padded, exact, s_n)


def test_grid_bucketed_matches_exact():
    rng = _rng()
    model, scene = _pair(rng, n_model=700, n_scene=530)
    cfg = ICPConfig(max_iter=40, dtype=jnp.float32, solver="eigh",
                    nn_method="grid", validate_inputs=False,
                    with_scale=False, grid_scene_tile=64,
                    grid_model_tile=128)
    exact = icp(model, scene, cfg)
    m_pad, m_n = pad_to_bucket(model, quantum=256)
    s_pad, s_n = pad_to_bucket(scene, quantum=256)
    padded = icp(m_pad, s_pad, cfg, scene_n=s_n, model_n=m_n)
    _assert_same_result(padded, exact, s_n)


def test_one_program_serves_the_bucket():
    """Different valid counts in the same bucket must NOT recompile — the
    entire point of bucketing (compiles are minutes on tunneled backends)."""
    rng = _rng()
    from icp_tpu.engine.icp import _icp_while

    cfg = ICPConfig(max_iter=30, dtype=jnp.float32, solver="eigh",
                    nn_method="bcast", validate_inputs=False,
                    with_scale=False)
    before = _icp_while._cache_size()
    for n_scene in (157, 101, 128):
        model, scene = _pair(rng, n_model=203, n_scene=n_scene)
        m_pad, m_n = pad_to_bucket(model, quantum=256)
        s_pad, s_n = pad_to_bucket(scene, quantum=256)
        res = icp(m_pad, s_pad, cfg, scene_n=s_n, model_n=m_n)
        assert float(res.err) < 1e-5
    assert _icp_while._cache_size() == before + 1


def test_trace_and_guard_paths_bucketed():
    rng = _rng()
    model, scene = _pair(rng)
    cfg = ICPConfig(max_iter=40, dtype=jnp.float32, solver="eigh",
                    nn_method="bcast", validate_inputs=False,
                    with_scale=False)
    m_pad, m_n = pad_to_bucket(model, quantum=128)
    s_pad, s_n = pad_to_bucket(scene, quantum=128)
    exact = icp(model, scene, cfg, trace=True)
    padded = icp(m_pad, s_pad, cfg, scene_n=s_n, model_n=m_n, trace=True)
    ne, np_ = int(exact.result.iters), int(padded.result.iters)
    assert ne == np_
    np.testing.assert_allclose(
        np.asarray(padded.errs)[:np_], np.asarray(exact.errs)[:ne],
        rtol=1e-3, atol=1e-8,
    )
    guarded = icp(m_pad, s_pad, cfg, scene_n=s_n, model_n=m_n, guard="device")
    assert int(guarded.iters) == ne


def test_normals_exact_on_sentinel_padding():
    """kNN-PCA normals over a sentinel-padded cloud must equal the unpadded
    normals for every real row (sentinels are never among the k nearest)."""
    rng = _rng()
    from icp_tpu.ops.normals import estimate_normals

    c = _cloud(rng, 300)
    want = np.asarray(estimate_normals(jnp.asarray(c), k=8))
    padded, n = pad_to_bucket(c, quantum=256)
    got = np.asarray(estimate_normals(jnp.asarray(padded), k=8))[:n]
    # normal sign is arbitrary: compare |dot| ~ 1
    dots = np.abs(np.sum(want * got, axis=1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-5)
    assert np.all(np.isfinite(np.asarray(
        estimate_normals(jnp.asarray(padded), k=8))))


def _plane_pair(n_model=420, n_scene=333, angle=0.12, seed=5):
    """Smooth-surface pair (normals well-defined) with unequal counts."""
    rng = np.random.default_rng(seed)
    g = rng.uniform(-1.0, 1.0, size=(n_model, 2)).astype(np.float32)
    z = (0.3 * np.sin(2.0 * g[:, 0]) + 0.2 * np.cos(3.0 * g[:, 1])).astype(
        np.float32)
    model = np.column_stack([g[:, 0], g[:, 1], z]).astype(np.float32)
    c, s = np.cos(angle), np.sin(angle)
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    t = np.array([0.03, -0.01, 0.02], np.float32)
    scene = (model[:n_scene] @ R.T + t).astype(np.float32)
    return model, scene


@pytest.mark.parametrize("engine", ["point_to_plane", "gicp", "symmetric"])
@pytest.mark.parametrize("nn_method", ["bcast", "grid"])
def test_plane_engines_bucketed_match_exact(engine, nn_method):
    """p2pl / GICP / symmetric: bucketed+masked == exact shapes, dense AND
    kd-grid NN paths.  Normals are estimated internally on the sentinel-
    padded clouds (exact for real rows), then the engines replica-fill."""
    from icp_tpu.engine.gicp import icp_generalized
    from icp_tpu.engine.point_to_plane import icp_point_to_plane
    from icp_tpu.engine.symmetric import icp_symmetric

    fn = {"point_to_plane": icp_point_to_plane, "gicp": icp_generalized,
          "symmetric": icp_symmetric}[engine]
    model, scene = _plane_pair()
    cfg = ICPConfig(max_iter=25, dtype=jnp.float32, nn_method=nn_method,
                    validate_inputs=False, with_scale=False,
                    threshold=1e-10, grid_scene_tile=64, grid_model_tile=128)
    exact = fn(model, scene, cfg)
    m_pad, m_n = pad_to_bucket(model, quantum=256)
    s_pad, s_n = pad_to_bucket(scene, quantum=256)
    padded = fn(m_pad, s_pad, cfg, scene_n=s_n, model_n=m_n)
    _assert_same_result(padded, exact, s_n, atol=2e-4)


@pytest.mark.parametrize("engine", ["point_to_plane", "symmetric"])
def test_plane_engines_bucketed_trimmed(engine):
    """Bucketed + trimmed together: the masked quantile must exclude pad
    rows (identical trim decisions as the exact-shape run)."""
    from icp_tpu.engine.point_to_plane import icp_point_to_plane
    from icp_tpu.engine.symmetric import icp_symmetric

    fn = {"point_to_plane": icp_point_to_plane,
          "symmetric": icp_symmetric}[engine]
    model, scene = _plane_pair()
    cfg = ICPConfig(max_iter=25, dtype=jnp.float32, nn_method="bcast",
                    validate_inputs=False, with_scale=False,
                    threshold=1e-10, trim_fraction=0.25)
    exact = fn(model, scene, cfg)
    m_pad, m_n = pad_to_bucket(model, quantum=256)
    s_pad, s_n = pad_to_bucket(scene, quantum=256)
    padded = fn(m_pad, s_pad, cfg, scene_n=s_n, model_n=m_n)
    _assert_same_result(padded, exact, s_n, atol=2e-4)


def test_register_chain_bucketed_matches(cow_pair):
    """Chain registration with bucket_quantum must produce the same poses as
    exact shapes (subsampled cow slices of deliberately unequal sizes)."""
    from icp_tpu.slam.pairwise import register_chain

    ref, tr1 = cow_pair
    # three unequal-size "scans" derived from the same rigid pair
    clouds = [np.ascontiguousarray(ref[::9]),
              np.ascontiguousarray(tr1[::11]),
              np.ascontiguousarray(tr1[::13])]
    cfg = ICPConfig(max_iter=40, dtype=jnp.float32, solver="eigh",
                    nn_method="bcast", validate_inputs=False,
                    with_scale=False)
    exact = register_chain(clouds, cfg, bucket_quantum=None)
    bucketed = register_chain(clouds, cfg, bucket_quantum=512)
    # default ("auto") buckets unequal chains — must ALSO match exact
    auto = register_chain(clouds, cfg)
    for a, b in zip(exact, bucketed):
        assert a.iters == b.iters
        np.testing.assert_allclose(np.asarray(a.transform.R),
                                   np.asarray(b.transform.R), atol=5e-5)
        np.testing.assert_allclose(np.asarray(a.transform.t),
                                   np.asarray(b.transform.t), atol=5e-5)
        np.testing.assert_allclose(a.err, b.err, rtol=1e-3, atol=1e-9)
    for a, b in zip(exact, auto):
        assert a.iters == b.iters
        np.testing.assert_allclose(np.asarray(a.transform.R),
                                   np.asarray(b.transform.R), atol=5e-5)
        np.testing.assert_allclose(np.asarray(a.transform.t),
                                   np.asarray(b.transform.t), atol=5e-5)


def test_auto_quantum():
    from icp_tpu.ops.padding import auto_quantum

    assert auto_quantum(40256) == 4096  # bunny full res -> measured optimum
    assert auto_quantum(2903) == 512    # cow-size chain, <=~18% overhead
    assert auto_quantum(512) == 64      # exact power: no doubling
    assert auto_quantum(4096) == 512    # ceil(4096/8)=512 -> exactly 512
    assert auto_quantum(100) == 64      # tiny test chains stay cheap
    assert auto_quantum(1) == 64
    with np.testing.assert_raises(ValueError):
        auto_quantum(0)


def test_register_chain_auto_default_resolution():
    """The 'auto' default: OFF for equal-size chains (no padding work), ON
    with auto_quantum for unequal ones — resolved inside register_chain;
    pinned here via the pad shape visible in the pair results."""
    from icp_tpu.slam.pairwise import register_chain

    rng = np.random.default_rng(3)
    base = rng.standard_normal((120, 3)).astype(np.float32)
    cfg = ICPConfig(max_iter=5, dtype=jnp.float32, solver="eigh",
                    nn_method="bcast", validate_inputs=False,
                    with_scale=False)
    # equal-size chain: auto == off == identical results bit-for-bit
    eq_clouds = [base, base + 0.01, base + 0.02]
    a = register_chain(eq_clouds, cfg)
    b = register_chain(eq_clouds, cfg, bucket_quantum=None)
    for x, y in zip(a, b):
        assert x.iters == y.iters
        np.testing.assert_array_equal(np.asarray(x.transform.R),
                                      np.asarray(y.transform.R))
