"""Determinism, profiling hooks, multi-host init (SURVEY.md §5)."""
import glob
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cfmm_routing_tpu.models.reference_instances import arbitrage_instance
from cfmm_routing_tpu.parallel.mesh import init_distributed, pool_mesh
from cfmm_routing_tpu.solver.admm import AdmmOptions, AdmmSolver
from cfmm_routing_tpu.solver.compiler import compile_spec
from cfmm_routing_tpu.utils.profiling import time_phases, trace


def test_determinism_bitwise():
    """Same problem, same options => bitwise-identical iterates (the
    determinism guarantee standing in for race detection, SURVEY.md §5)."""
    spec, obj = arbitrage_instance()
    opts = AdmmOptions(max_iters=500, eps_abs=1e-8, eps_rel=1e-8)
    a = AdmmSolver(compile_spec(spec), dtype=jnp.float32, options=opts).solve(obj)
    b = AdmmSolver(compile_spec(spec), dtype=jnp.float32, options=opts).solve(obj)
    assert float(a.objective) == float(b.objective)
    np.testing.assert_array_equal(np.asarray(a.psi), np.asarray(b.psi))
    np.testing.assert_array_equal(np.asarray(a.prices), np.asarray(b.prices))
    for name in a.deltas:
        np.testing.assert_array_equal(
            np.asarray(a.deltas[name]), np.asarray(b.deltas[name])
        )


def test_time_phases():
    spec, obj = arbitrage_instance()
    solver = AdmmSolver(
        compile_spec(spec), dtype=jnp.float32,
        options=AdmmOptions(max_iters=10),
    )
    t = time_phases(solver, obj, inner=3)
    assert set(t) == {"project+bcast", "edge-reduce", "psi-prox", "full-iteration"}
    assert all(v > 0 for v in t.values())


def test_trace_writes_profile(tmp_path):
    """Run in a watchdogged subprocess: jax.profiler.stop_trace has been
    observed to block for minutes inside the remote-TPU plugin when the
    tunnel is busy (environment flake, not a product property) — a hang
    must skip this test, never wedge the suite."""
    import subprocess
    import sys
    import textwrap

    script = textwrap.dedent(
        f"""
        import os, sys, glob
        sys.path.insert(0, {repr(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))})
        import jax
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
        import jax.numpy as jnp
        from cfmm_routing_tpu.models.reference_instances import arbitrage_instance
        from cfmm_routing_tpu.solver.admm import AdmmOptions, AdmmSolver
        from cfmm_routing_tpu.solver.compiler import compile_spec
        from cfmm_routing_tpu.utils.profiling import trace
        spec, obj = arbitrage_instance()
        solver = AdmmSolver(compile_spec(spec), dtype=jnp.float32,
                            options=AdmmOptions(max_iters=50))
        with trace({repr(str(tmp_path))}):
            jax.block_until_ready(solver.solve(obj).objective)
        produced = glob.glob({repr(str(tmp_path))} + "/**/*", recursive=True)
        assert any(os.path.isfile(p) for p in produced), produced
        print("TRACE-OK")
        """
    )
    try:
        proc = subprocess.run(
            [sys.executable, "-c", script],
            capture_output=True, text=True, timeout=240,
        )
    except subprocess.TimeoutExpired:
        pytest.skip("jax.profiler stop_trace blocked on the remote-TPU plugin")
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "TRACE-OK" in proc.stdout


def test_init_distributed_single_host():
    assert init_distributed() == 1
    mesh = pool_mesh(platform="cpu")
    assert mesh.shape["pools"] >= 1
