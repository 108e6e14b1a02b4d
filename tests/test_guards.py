"""In-loop failure detection: guard="device" + checkify step (SURVEY §5)."""

import jax.numpy as jnp
import numpy as np
import pytest

from icp_tpu import ICPConfig, icp
from icp_tpu.engine.icp import ICPGuardError


def _cfg(**kw):
    base = dict(max_iter=30, solver="eigh", nn_method="bcast")
    base.update(kw)
    return ICPConfig(**base)


def test_device_guard_clean_run_unaffected(cow_pair):
    ref, tr1 = cow_pair
    plain = icp(ref, tr1, _cfg())
    guarded = icp(ref, tr1, _cfg(), guard="device")
    assert int(guarded.iters) == int(plain.iters)
    np.testing.assert_array_equal(np.asarray(guarded.points),
                                  np.asarray(plain.points))


def test_device_guard_nan_fails_fast(cow_pair):
    ref, tr1 = cow_pair
    poisoned = np.asarray(tr1).copy()
    poisoned[7, 1] = np.nan
    with pytest.raises(ICPGuardError, match="non-finite"):
        icp(ref, poisoned, _cfg(), guard="device")
    # fail-fast contract: the abort happens at iteration 1, not max_iter
    try:
        icp(ref, poisoned, _cfg(), guard="device")
    except ICPGuardError as e:
        assert "iteration 1" in str(e)


def test_host_guard_still_catches_nan(cow_pair):
    ref, tr1 = cow_pair
    poisoned = np.asarray(tr1).copy()
    poisoned[0, 0] = np.inf
    with pytest.raises(FloatingPointError):
        icp(ref, poisoned, _cfg(), guard=True)


def test_checked_step_locates_nan(cow_pair):
    from icp_tpu.utils.guards import checked_icp_step

    ref, tr1 = cow_pair
    msg, _ = checked_icp_step(tr1, ref)
    assert msg is None  # clean input: no check fires
    poisoned = np.asarray(tr1).copy()
    poisoned[3, 2] = np.nan
    msg, _ = checked_icp_step(poisoned, ref)
    assert msg is not None and "nan" in msg.lower()
