"""Correspondence-search tests: all implementations vs the NumPy oracle,
tie-breaking, and unequal point counts."""

import jax.numpy as jnp
import numpy as np
import pytest

from icp_tpu.ops.distance import (
    closest_point_indices_bcast,
    closest_point_indices_matmul,
    squared_distances,
)
from tests import oracle

IMPLS = {
    "bcast": closest_point_indices_bcast,
    "matmul": closest_point_indices_matmul,
}


@pytest.mark.parametrize("impl", sorted(IMPLS))
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.float64])
def test_matches_oracle_random(impl, dtype, rng):
    p = rng.standard_normal((37, 3))
    m = rng.standard_normal((53, 3))
    want = oracle.closest_indices(p, m)
    got = np.asarray(IMPLS[impl](jnp.asarray(p, dtype), jnp.asarray(m, dtype)))
    # f32 may legitimately flip argmins between near-equidistant model points;
    # require the *distances* to agree to f32 tolerance instead of the indices.
    d2 = np.sum((p - m[got]) ** 2, axis=1)
    d2_want = np.sum((p - m[want]) ** 2, axis=1)
    np.testing.assert_allclose(d2, d2_want, rtol=1e-5, atol=1e-6)
    if dtype == jnp.float64:
        np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("impl", sorted(IMPLS))
def test_tie_breaks_to_lowest_index(impl):
    # Model contains duplicated points: the LOWEST index must win
    # (reference strict-> comparisons, src/cpu.cc:22, compute.cu:137).
    m = jnp.asarray(
        [[5.0, 0, 0], [1.0, 0, 0], [1.0, 0, 0], [1.0, 0, 0]], jnp.float32
    )
    p = jnp.asarray([[1.0, 0, 0], [0.9, 0, 0]], jnp.float32)
    got = np.asarray(IMPLS[impl](p, m))
    np.testing.assert_array_equal(got, [1, 1])


@pytest.mark.parametrize("impl", sorted(IMPLS))
def test_unequal_counts(impl, rng):
    # NN correspondence does not need np == nm (the reference's check is an
    # artifact — SURVEY.md §3); bunny views have different counts.
    p = rng.standard_normal((10, 3))
    m = rng.standard_normal((25, 3))
    want = oracle.closest_indices(p, m)
    got = np.asarray(IMPLS[impl](jnp.asarray(p, jnp.float64), jnp.asarray(m, jnp.float64)))
    np.testing.assert_array_equal(got, want)


def test_squared_distances_matches_oracle(rng):
    p = rng.standard_normal((7, 3))
    m = rng.standard_normal((9, 3))
    want = np.sum((p[:, None, :] - m[None, :, :]) ** 2, axis=-1)
    got = np.asarray(squared_distances(jnp.asarray(p), jnp.asarray(m)))
    np.testing.assert_allclose(got, want, rtol=1e-12)
