"""VMEM-resident multi-iteration kernel vs the classic XLA iteration.

The resident block (ops/resident_pallas.py) runs whole ADMM iterations —
projection, consensus exchange, linear prox — inside one Pallas launch;
its trajectory must match `AdmmSolver._iterate` step-for-step to f32
roundoff on mixed bucket kinds.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from cfmm_routing_tpu.solver.admm import AdmmOptions, AdmmSolver
from cfmm_routing_tpu.solver.compiler import compile_table
from cfmm_routing_tpu.utils.synth import random_arbitrage_table


def _mk(n_assets=16, n_pools=320, seed=4, alpha=1.0):
    table, obj = random_arbitrage_table(n_assets, n_pools, seed=seed)
    compiled = compile_table(table, pad_pools_to=128)
    opts = AdmmOptions(
        max_iters=10**6, eps_abs=0.0, eps_rel=0.0, adapt_rho=False,
        alpha=alpha, consensus="onehot",
    )
    return AdmmSolver(compiled, dtype=jnp.float32, options=opts), obj


@pytest.mark.parametrize("alpha", [1.0, 1.6])
@pytest.mark.parametrize("iters,block", [(12, 12), (25, 8)])
def test_resident_matches_classic(alpha, iters, block):
    solver, obj = _mk(alpha=alpha)
    res_r = solver.solve_resident(
        obj, iters=iters, block=block, interpret=True
    )

    import dataclasses

    opts_c = dataclasses.replace(solver.options, max_iters=iters + 1)
    classic = AdmmSolver(solver.compiled, dtype=jnp.float32, options=opts_c)
    res_c = classic.solve(obj)

    np.testing.assert_allclose(
        np.asarray(res_r.psi), np.asarray(res_c.psi), atol=3e-4
    )
    np.testing.assert_allclose(
        float(res_r.objective), float(res_c.objective), rtol=1e-4, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(res_r.prices), np.asarray(res_c.prices), atol=3e-4
    )
    assert int(res_r.iters) == iters + 1


def test_resident_reference_instance_converges():
    """The resident path solves the reference arbitrage network to its
    pinned optimum (f32 accuracy)."""
    from cfmm_routing_tpu.models.reference_instances import arbitrage_instance
    from cfmm_routing_tpu.solver.compiler import compile_spec

    spec, obj = arbitrage_instance()
    compiled = compile_spec(spec, pad_pools_to=128)
    solver = AdmmSolver(
        compiled, dtype=jnp.float32,
        options=AdmmOptions(max_iters=10**6, eps_abs=0.0, eps_rel=0.0),
    )
    res = solver.solve_resident(obj, iters=1200, block=100, interpret=True)
    assert abs(float(res.objective) - 21.499805) / 21.499805 < 5e-4


def test_resident_rejects_too_large():
    from cfmm_routing_tpu.ops.resident_pallas import resident_vmem_bytes

    # 100k-pool scale must exceed the VMEM model and raise
    groups = [("gm", False, 2, 73728), ("cs", True, 4, 7168)]
    assert resident_vmem_bytes(groups, 256) > (6 << 20)

    table, obj = random_arbitrage_table(256, 100_000, seed=0)
    solver = AdmmSolver(
        compile_table(table, pad_pools_to=128), dtype=jnp.float32,
        options=AdmmOptions(max_iters=10),
    )
    with pytest.raises(ValueError, match="VMEM-resident"):
        solver.solve_resident(obj, iters=4, block=4, interpret=True)


def test_resident_rejects_utilities():
    from cfmm_routing_tpu.models.utility import ConcaveUtility

    solver, obj = _mk()
    util = ConcaveUtility.linear(obj.c, lo=np.asarray(obj.lo))
    with pytest.raises(NotImplementedError, match="linear"):
        solver.solve_resident(util, iters=4, interpret=True)
