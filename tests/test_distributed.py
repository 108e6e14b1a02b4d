"""Multi-process ``jax.distributed`` bring-up test (VERDICT r2 weak #6).

``parallel/mesh.py::init_distributed`` is the multi-host entry and cannot be
exercised in-process: it spins up the coordinator service and global device
registry.  This test spawns 2 coordinator+worker subprocesses with 4 virtual
CPU devices each (the jax.distributed simulation SURVEY.md §4 prescribes for
multi-host logic), forms the 8-device global ``points`` mesh across the
process boundary, runs ``icp_sharded`` over it — collectives crossing
processes the way DCN traffic would — and pins the result against the
single-process 8-device run.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import sys
import numpy as np

pid, nproc, coord = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

from icp_tpu.parallel.mesh import init_distributed

init_distributed(coordinator_address=coord, num_processes=nproc,
                 process_id=pid)

import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from icp_tpu import ICPConfig
from icp_tpu.io.csv import load_matrix
from icp_tpu.parallel.mesh import make_mesh
from icp_tpu.parallel.sharded import icp_sharded

assert len(jax.devices()) == nproc * 4, jax.devices()
assert len(jax.local_devices()) == 4

ref = load_matrix("/root/repo/data/cow_ref.txt")[::20]
tr1 = load_matrix("/root/repo/data/cow_tr1.txt")[::20]
cfg = ICPConfig(max_iter=20, dtype=jnp.float64, solver="eigh",
                nn_method="bcast")
res = icp_sharded(ref, tr1, cfg, mesh=make_mesh())
print(f"RESULT pid={pid} iters={int(res.iters)} err={float(res.err):.17e}",
      flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_init_distributed_two_process_mesh(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    env = dict(
        os.environ,
        PALLAS_AXON_POOL_IPS="",
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
    )
    coord = f"localhost:{_free_port()}"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), "2", coord],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=tmp_path,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker hung")
        assert p.returncode == 0, err[-2000:]
        outs.append(out)

    results = [l for o in outs for l in o.splitlines() if l.startswith("RESULT")]
    assert len(results) == 2
    # both processes must report the identical replicated result
    assert results[0].split("iters=", 1)[1] == results[1].split("iters=", 1)[1]

    # and it must match the single-process 8-device run of the same program
    import jax
    import jax.numpy as jnp

    from icp_tpu import ICPConfig
    from icp_tpu.io.csv import load_matrix
    from icp_tpu.parallel.mesh import make_mesh
    from icp_tpu.parallel.sharded import icp_sharded

    ref = load_matrix("/root/repo/data/cow_ref.txt")[::20]
    tr1 = load_matrix("/root/repo/data/cow_tr1.txt")[::20]
    cfg = ICPConfig(max_iter=20, dtype=jnp.float64, solver="eigh",
                    nn_method="bcast")
    single = icp_sharded(ref, tr1, cfg, mesh=make_mesh(jax.devices()[:8]))
    iters = int(results[0].split("iters=")[1].split()[0])
    err = float(results[0].split("err=")[1])
    assert iters == int(single.iters)
    np.testing.assert_allclose(err, float(single.err), rtol=1e-9)
