"""Per-asset diagonal equilibration (solver/precondition.py).

The transformation is a change of token units: it must preserve the
optimum exactly, turn uniform constant-sum pools into weighted ones, and
— the point — cut ADMM iteration counts on badly-scaled networks.
"""
import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from cfmm_routing_tpu.models.pools import ConstantSumPool, ProductPool
from cfmm_routing_tpu.models.utility import Objective
from cfmm_routing_tpu.oracle import oracle_solve
from cfmm_routing_tpu.solver.admm import AdmmOptions, AdmmSolver
from cfmm_routing_tpu.solver.certify import certify
from cfmm_routing_tpu.solver.compiler import (
    PoolTable,
    ProblemSpec,
    compile_spec,
    compile_table,
)
from cfmm_routing_tpu.solver.precondition import (
    asset_scales,
    equilibrate,
    unscale_result,
)
from cfmm_routing_tpu.utils.synth import random_arbitrage_table

OPTS = AdmmOptions(max_iters=30000, eps_abs=1e-10, eps_rel=1e-10)


def _skewed_problem(seed=3, n_assets=16, n_pools=200, decades=5):
    """A well-scaled random network re-expressed in wildly mismatched
    per-asset base units (10^[-decades, decades])."""
    table, obj = random_arbitrage_table(n_assets, n_pools, seed=seed)
    rng = np.random.default_rng(seed + 100)
    u = rng.integers(-decades, decades + 1, size=n_assets).astype(np.float64)
    skew = equilibrate(table, obj, d=2.0 ** (u * 3.3219281))  # ~10^u, pow2
    return skew.table, skew.objective


def test_weighted_cs_pool_end_to_end():
    """A hand-built weighted constant-sum pool routes correctly vs the
    scipy oracle (the projection/certify/oracle weighted paths agree)."""
    spec = ProblemSpec(
        n_assets=3,
        pools=[
            ProductPool((0, 1), [10.0, 10.0], fee=0.997),
            ConstantSumPool((1, 2), [8.0, 30.0], fee=0.999,
                            weights=[2.0, 0.5]),
        ],
    )
    obj = Objective.arbitrage([1.0, 1.1, 0.6])
    compiled = compile_spec(spec)
    solver = AdmmSolver(compiled, dtype=jnp.float64, options=OPTS)
    res = solver.solve(obj)
    assert bool(res.converged)
    ref = oracle_solve(spec, obj)
    np.testing.assert_allclose(
        float(res.objective), ref.objective, rtol=1e-6, atol=1e-8
    )
    cert = certify(
        compiled, obj, res.deltas, res.lambdas, np.asarray(res.prices),
        psi_claimed=np.asarray(res.psi),
    )
    assert cert.gap_rel < 1e-6
    assert cert.feasibility < 1e-8


def test_equilibrate_preserves_optimum():
    """Solving the equilibrated problem and unscaling reproduces the
    skewed problem's optimum (objective invariant, certificate valid in
    original units)."""
    bad_table, bad_obj = _skewed_problem()
    compiled_bad = compile_table(bad_table)

    eq = equilibrate(bad_table, bad_obj)
    compiled_eq = compile_table(eq.table)
    solver = AdmmSolver(compiled_eq, dtype=jnp.float64, options=OPTS)
    res = solver.solve(eq.objective)
    assert bool(res.converged)

    res0 = unscale_result(res, eq.d, compiled_eq)
    # certify the unscaled routing against the ORIGINAL (skewed) problem
    cert = certify(
        compiled_bad, bad_obj, res0.deltas, res0.lambdas,
        np.asarray(res0.prices), psi_claimed=np.asarray(res0.psi),
    )
    assert cert.feasibility < 1e-7 * max(
        1.0, float(np.max(np.abs(np.asarray(res0.psi))))
    )
    assert cert.gap_rel < 1e-6
    # objective value is unit-invariant
    np.testing.assert_allclose(
        float(np.dot(bad_obj.c, np.asarray(res0.psi))),
        float(res.objective), rtol=1e-9,
    )


def test_equilibration_cuts_iterations_on_skewed_network():
    """The measured point of the preconditioner: on a unit-skewed network
    the equilibrated solve reaches tolerance in (far) fewer iterations."""
    bad_table, bad_obj = _skewed_problem(seed=9, decades=4)
    opts = dataclasses.replace(OPTS, eps_abs=1e-7, eps_rel=1e-7,
                               max_iters=30000)

    raw = AdmmSolver(compile_table(bad_table), dtype=jnp.float64,
                     options=opts).solve(bad_obj)

    eq = equilibrate(bad_table, bad_obj)
    pre = AdmmSolver(compile_table(eq.table), dtype=jnp.float64,
                     options=opts).solve(eq.objective)
    assert bool(pre.converged)
    # the equilibrated run must be decisively cheaper (or the raw run
    # failed to converge at all inside the budget)
    assert (not bool(raw.converged)) or int(pre.iters) <= int(raw.iters) // 2, (
        int(pre.iters), int(raw.iters),
    )


def test_api_precondition_matches_pin():
    """api.arbitrage(precondition=True): solve in scaled units, results
    and certificate in original units, matching the reference pin."""
    from cfmm_routing_tpu import api
    from cfmm_routing_tpu.models.reference_instances import arbitrage_instance

    spec, obj = arbitrage_instance()
    route = api.arbitrage(
        spec, obj.c, certify=True, precondition=True,
        dtype=jnp.float64, options=OPTS,
    )
    assert route.converged
    assert abs(route.objective - 21.499805) / 21.499805 < 1e-6
    assert route.certificate.gap_rel < 1e-6
    assert route.certificate.feasibility_rel < 1e-7
    assert len(route.deltas) == 5


def test_api_precondition_concave_utility():
    from cfmm_routing_tpu import api
    from cfmm_routing_tpu.models.reference_instances import arbitrage_instance
    from cfmm_routing_tpu.models.utility import ConcaveUtility

    spec, obj = arbitrage_instance()
    util = ConcaveUtility.linear(obj.c, lo=np.zeros(4))
    util = util.with_log(1, float(obj.c[1]), 2.0).with_box(1, 0.0, 30.0)
    plain = api.route(spec, util, dtype=jnp.float64, options=OPTS)
    pre = api.route(
        spec, util, precondition=True, dtype=jnp.float64, options=OPTS
    )
    np.testing.assert_allclose(pre.objective, plain.objective, rtol=1e-6)
    np.testing.assert_allclose(pre.psi, plain.psi, atol=1e-6)


def test_asset_scales_power_of_two():
    table, obj = random_arbitrage_table(12, 50, seed=1)
    for mode in ("reserves", "prices", "blend"):
        d = asset_scales(table, obj, mode=mode)
        assert np.all(d > 0)
        np.testing.assert_array_equal(d, 2.0 ** np.round(np.log2(d)))


def test_weighted_cs_serde_roundtrip():
    """Weighted constant-sum pools survive the JSON config round-trip."""
    from cfmm_routing_tpu.utils.serde import spec_from_json, spec_to_json

    spec = ProblemSpec(
        n_assets=3,
        pools=[
            ProductPool((0, 1), [10.0, 10.0], fee=0.997),
            ConstantSumPool((1, 2), [8.0, 30.0], fee=0.999,
                            weights=[2.0, 0.5]),
            ConstantSumPool((0, 2), [4.0, 5.0], fee=1.0),  # uniform
        ],
    )
    spec2 = spec_from_json(spec_to_json(spec))
    np.testing.assert_array_equal(spec2.pools[1].weights, [2.0, 0.5])
    np.testing.assert_array_equal(spec2.pools[2].weights, [1.0, 1.0])
    doc = spec_to_json(spec)
    assert '"weights"' in doc  # weighted pool serializes its q
    obj = Objective.arbitrage([1.0, 1.1, 0.6])
    a = AdmmSolver(compile_spec(spec), dtype=jnp.float64, options=OPTS).solve(obj)
    b = AdmmSolver(compile_spec(spec2), dtype=jnp.float64, options=OPTS).solve(obj)
    np.testing.assert_allclose(float(a.objective), float(b.objective), rtol=1e-10)


def test_precondition_bounded_pool_vs_oracle():
    """Equilibration with bounded-liquidity (shifted) pools: shifts scale
    with the asset units and the optimum is preserved vs the oracle."""
    from cfmm_routing_tpu.models.pools import BoundedProductPool

    spec = ProblemSpec(
        n_assets=3,
        pools=[
            BoundedProductPool((0, 1), [2.0, 3000.0], [5.0, 8000.0], fee=0.997),
            ProductPool((1, 2), [4000.0, 6.0], fee=0.997),
            ProductPool((0, 2), [3.0, 2.0], fee=0.999),
        ],
    )
    obj = Objective.arbitrage([1.0, 0.001, 1.2])
    ref = oracle_solve(spec, obj)

    table = PoolTable.from_spec(spec)
    eq = equilibrate(table, obj)
    compiled_eq = compile_table(eq.table)
    res = AdmmSolver(compiled_eq, dtype=jnp.float64, options=OPTS).solve(
        eq.objective
    )
    assert bool(res.converged)
    res0 = unscale_result(
        __import__("jax").tree_util.tree_map(np.asarray, res), eq.d, compiled_eq
    )
    np.testing.assert_allclose(
        float(np.dot(obj.c, np.asarray(res0.psi))), ref.objective,
        rtol=1e-6, atol=1e-8,
    )


def test_precondition_rejects_explicit_solver():
    """precondition=True must not silently drop a caller-supplied solver
    (its compiled problem is in original units) — round-3 advisor fix."""
    import pytest as _pytest

    from cfmm_routing_tpu import api
    from cfmm_routing_tpu.models.reference_instances import arbitrage_instance
    from cfmm_routing_tpu.solver.compiler import compile_spec

    spec, obj = arbitrage_instance()
    solver = AdmmSolver(compile_spec(spec))
    with _pytest.raises(ValueError, match="mutually exclusive"):
        api.arbitrage(spec, obj.c, solver=solver, precondition=True)
