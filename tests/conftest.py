"""Test configuration: run everything on a virtual 8-device CPU mesh.

The axon sitecustomize pins JAX_PLATFORMS=axon (single real TPU chip); for
tests we override to CPU *before any backend is queried* and fan out 8 virtual
devices so the sharded paths are exercised without a pod
(SURVEY.md §4: the "fake backend" the reference lacks).

Hardware mode (``ICP_TESTS_TPU=1``): leaves the real TPU backend in place
and collects ONLY the ``tpu``-marked compiled-mode suite (``test_hw.py``) —
the CPU suite's interpret-mode kernel tests cannot see Mosaic/precision
behavior, so the hardware gate is a separate, serialized run:

    ICP_TESTS_TPU=1 python -m pytest tests/test_hw.py -q

(one process at a time — see CLAUDE.md rule 1).  In the default CPU mode,
``tpu``-marked tests are skipped.
"""

import os

# Subprocess-spawning tests (CLI contract, distributed bring-up, bench
# supervisor) run `python -m icp_tpu...` from other working directories;
# make the package importable there even when it is not pip-installed
# (the environment can be reset between sessions).  Must happen at import
# time: test modules snapshot `os.environ` into their own ENV dicts.
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.environ["PYTHONPATH"] = _REPO_ROOT + (
    os.pathsep + os.environ["PYTHONPATH"] if os.environ.get("PYTHONPATH") else ""
)

TPU_MODE = os.environ.get("ICP_TESTS_TPU") == "1"

if not TPU_MODE:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )

import jax  # noqa: E402

if not TPU_MODE:
    jax.config.update("jax_platforms", "cpu")
    # Float64 available for oracle-parity tests (library code always passes
    # explicit dtypes, so this does not change the f32 fast paths under
    # test).  TPU mode stays f32 (no f64 hardware).
    jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    if TPU_MODE:
        skip = pytest.mark.skip(reason="CPU-suite test (ICP_TESTS_TPU=1 "
                                       "runs only tpu-marked tests)")
        for item in items:
            if "tpu" not in item.keywords:
                item.add_marker(skip)
    else:
        skip = pytest.mark.skip(reason="needs real TPU (run with "
                                       "ICP_TESTS_TPU=1 on hardware)")
        for item in items:
            if "tpu" in item.keywords:
                item.add_marker(skip)

DATA_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")


def data_path(name: str) -> str:
    return os.path.join(DATA_DIR, name)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def cow_pair():
    from icp_tpu.io.csv import load_matrix

    ref = load_matrix(data_path("cow_ref.txt"))
    tr1 = load_matrix(data_path("cow_tr1.txt"))
    return ref, tr1


def random_rotation(rng: np.random.Generator) -> np.ndarray:
    """Uniform random rotation via QR of a gaussian matrix."""
    A = rng.standard_normal((3, 3))
    Q, R = np.linalg.qr(A)
    Q = Q @ np.diag(np.sign(np.diag(R)))
    if np.linalg.det(Q) < 0:
        Q[:, 0] = -Q[:, 0]
    return Q
