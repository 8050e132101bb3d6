"""Real multi-process jax.distributed smoke (SURVEY.md §5 "DCN across
hosts").

Two spawned CPU processes form a jax.distributed cluster over localhost
(the coordination service + Gloo collectives — the same machinery a
multi-host TPU slice uses over DCN), build one global 4-device pools
mesh (2 virtual CPU devices per process), and run the sharded ADMM solve
on the reference arbitrage instance.  This exercises
``parallel/mesh.py::init_distributed`` with an actual multi-process
runtime rather than the single-host no-op path.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_CHILD = r"""
import sys, os
sys.path.insert(0, {repo!r})
pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
import jax
from cfmm_routing_tpu.parallel.mesh import init_distributed, pool_mesh
n = init_distributed(
    coordinator_address=f"localhost:{{port}}", num_processes=nproc,
    process_id=pid,
)
assert n == nproc, (n, nproc)
import jax.numpy as jnp
from cfmm_routing_tpu.models.reference_instances import arbitrage_instance
from cfmm_routing_tpu.parallel.sharded import ShardedAdmmSolver
from cfmm_routing_tpu.solver.admm import AdmmOptions
spec, obj = arbitrage_instance()
mesh = pool_mesh()  # all 4 global devices (2 local per process)
assert mesh.devices.size == 4, mesh.devices
solver = ShardedAdmmSolver(
    spec, mesh, dtype=jnp.float32,
    options=AdmmOptions(max_iters=12000, eps_abs=1e-7, eps_rel=1e-7),
)
res = solver.solve(obj)
v = float(res.objective)  # replicated output: readable on every process
assert abs(v - 21.499805) / 21.499805 < 5e-4, v

# sharded mixed-precision refinement across the SAME 2-process mesh:
# every process runs the identical SPMD correction solves; the host-side
# f64 certificates are deterministic, so the refined value replicates
import dataclasses
import jax.tree_util as jtu
import numpy as _np
from jax.experimental import multihost_utils
from cfmm_routing_tpu.parallel.sharded import ShardedDeltaAdmmSolver
from cfmm_routing_tpu.solver.refine_device import refine_device
# pool-sharded trades span non-addressable devices in a multi-process
# mesh; gather the GLOBAL arrays onto every process for the host-side
# re-centering (refine_device's delta_buckets works on global arrays)
host = jtu.tree_map(
    lambda x: _np.asarray(multihost_utils.process_allgather(x, tiled=True)),
    res,
)
dsolver = ShardedDeltaAdmmSolver(
    solver.compiled, mesh, dtype=jnp.float32,
    options=dataclasses.replace(
        solver.inner.options, max_iters=250, eps_abs=1e-8, eps_rel=1e-8,
        adapt_rho=False,
    ),
)
out = refine_device(solver.compiled, obj, host, target_gap=1e-6, solver=dsolver)
assert out.achieved, (out.certificate.gap_rel, out.certificate.feasibility_rel)
vr = float(out.certificate.objective)
assert abs(vr - 21.499805) / 21.499805 < 1e-5, vr
print(f"[{{pid}}] DIST-SMOKE-PASS {{v}} REFINED {{vr}}", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_solve(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "child.py"
    script.write_text(_CHILD.format(repo=repo))
    port = _free_port()
    env = dict(os.environ)
    # pure-CPU children: drop the axon TPU plugin trigger and the parent
    # suite's device-count flag, then pin 2 virtual devices per process
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("JAX_ENABLE_X64", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), "2", str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert "DIST-SMOKE-PASS" in out, out
    # both processes computed the same replicated objective
    vals = [
        float(line.split()[-1])
        for out in outs
        for line in out.splitlines()
        if "DIST-SMOKE-PASS" in line
    ]
    assert len(vals) == 2
    np.testing.assert_allclose(vals[0], vals[1], rtol=0)
