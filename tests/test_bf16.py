"""bf16-MXU prefiltered NN (kernels/nn_bf16.py): invariants that hold by
construction regardless of bf16 flips, plus the certification guarantee.

The kernel is APPROXIMATE by design; these tests pin exactly what it
promises (and nothing it doesn't):
  * the reported distance is the exact f32 distance to the reported index;
  * that distance upper-bounds the true NN distance;
  * a certified point's index IS the exact NN (mathematical guarantee);
  * well-separated clouds certify fully and match the oracle.
The speed/flip-rate trade-off on hardware is measured in docs/PERF.md.
"""

import jax.numpy as jnp
import numpy as np

from icp_tpu.kernels.nn_bf16 import closest_point_indices_bf16
from tests import oracle


def test_bf16_reported_distance_is_exact_and_upper_bounds_nn(rng):
    p = rng.standard_normal((100, 3)).astype(np.float32)
    m = rng.standard_normal((1000, 3)).astype(np.float32)
    idx, dex, cert = closest_point_indices_bf16(
        jnp.asarray(p), jnp.asarray(m), scene_tile=32, model_tile=256,
        interpret=True, center=False,
    )
    idx, dex = np.asarray(idx), np.asarray(dex)
    # exact distance to the reported match
    np.testing.assert_allclose(dex, np.sum((p - m[idx]) ** 2, axis=1),
                               rtol=1e-6, atol=1e-7)
    # valid upper bound on the true NN distance
    want = oracle.closest_indices(p.astype(np.float64), m.astype(np.float64))
    d_true = np.sum((p - m[want]) ** 2, axis=1)
    assert np.all(dex >= d_true - 1e-7)


def test_bf16_certified_points_match_oracle(rng):
    p = rng.standard_normal((128, 3)).astype(np.float32)
    m = rng.standard_normal((512, 3)).astype(np.float32)
    idx, _, cert = closest_point_indices_bf16(
        jnp.asarray(p), jnp.asarray(m), scene_tile=32, model_tile=128,
        interpret=True,
    )
    idx, cert = np.asarray(idx), np.asarray(cert)
    want = oracle.closest_indices(p.astype(np.float64), m.astype(np.float64))
    # the guarantee: certification implies exactness, always
    assert np.array_equal(idx[cert], want[cert])


def test_bf16_separated_cloud_fully_certified(rng):
    # model points on a coarse lattice, scene points right next to lattice
    # sites: NN margins >> the bf16 error band -> everything certifies and
    # matches the oracle exactly
    g = np.stack(np.meshgrid(*[np.arange(4.0)] * 3), -1).reshape(-1, 3)
    m = g.astype(np.float32)  # 64 sites, spacing 1
    sel = rng.integers(0, len(m), 40)
    p = (m[sel] + 0.01 * rng.standard_normal((40, 3))).astype(np.float32)
    idx, dex, cert = closest_point_indices_bf16(
        jnp.asarray(p), jnp.asarray(m), scene_tile=8, model_tile=128,
        interpret=True,
    )
    assert np.all(np.asarray(cert))
    np.testing.assert_array_equal(np.asarray(idx), sel)


def test_bf16_centering_shrinks_bound(rng):
    # a large offset inflates the cross-term bound; centering removes it
    from icp_tpu.kernels.nn_bf16 import cross_term_bound

    p = rng.standard_normal((64, 3)).astype(np.float32) + 100.0
    m = rng.standard_normal((256, 3)).astype(np.float32) + 100.0
    b_raw = float(cross_term_bound(jnp.asarray(p), jnp.asarray(m)))
    c = jnp.mean(jnp.asarray(m), axis=0)
    b_centered = float(cross_term_bound(jnp.asarray(p) - c,
                                        jnp.asarray(m) - c))
    assert b_centered < b_raw / 100
    # and the centered run certifies where the uncentered one cannot
    _, _, cert = closest_point_indices_bf16(
        jnp.asarray(p), jnp.asarray(m), scene_tile=16, model_tile=128,
        interpret=True, center=True,
    )
    _, _, cert_raw = closest_point_indices_bf16(
        jnp.asarray(p), jnp.asarray(m), scene_tile=16, model_tile=128,
        interpret=True, center=False,
    )
    assert np.asarray(cert).sum() >= np.asarray(cert_raw).sum()


def test_bf16_dispatches_from_ops(rng):
    from icp_tpu.ops.distance import closest_point_indices

    p = rng.standard_normal((32, 3)).astype(np.float32)
    m = rng.standard_normal((128, 3)).astype(np.float32)
    idx = np.asarray(closest_point_indices(
        jnp.asarray(p), jnp.asarray(m), method="bf16",
        scene_tile=8, model_tile=128,
    ))
    assert idx.shape == (32,)
    assert (0 <= idx).all() and (idx < 128).all()
