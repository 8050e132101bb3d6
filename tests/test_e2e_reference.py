"""End-to-end parity: the three reference workloads vs pinned baselines.

BASELINE.md pins (re-derived with two independent solvers, <1e-6 agreement):
  arbitrage.py   -> 21.499805
  liquidation.py -> 15.883010
  two-asset.py   -> u(0)=6.233000, u(25)=31.005495, u(50)=44.182020

The TPU solver (f64 CPU mode here) must match within 1e-6 relative gap
(SURVEY.md §4(3), the BASELINE.json north-star criterion).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from cfmm_routing_tpu import api
from cfmm_routing_tpu.models.reference_instances import (
    arbitrage_instance,
    liquidation_instance,
    two_asset_instance,
)
from cfmm_routing_tpu.solver.admm import AdmmOptions, AdmmSolver
from cfmm_routing_tpu.solver.compiler import compile_spec

OPTS = AdmmOptions(max_iters=30000, eps_abs=1e-11, eps_rel=1e-11)


def _solve(spec, obj):
    solver = AdmmSolver(compile_spec(spec), dtype=jnp.float64, options=OPTS)
    return solver, solver.solve(obj)


def test_arbitrage_objective():
    spec, obj = arbitrage_instance()
    solver, res = _solve(spec, obj)
    assert bool(res.converged)
    assert abs(float(res.objective) - 21.499805) / 21.499805 < 1e-6


def test_check_every_matches_per_iteration_checks():
    """check_every=5 (stats-free fast iterations between residual checks)
    converges to the same objective as per-iteration checking."""
    spec, obj = arbitrage_instance()
    import dataclasses

    opts5 = dataclasses.replace(OPTS, check_every=5)
    solver = AdmmSolver(compile_spec(spec), dtype=jnp.float64, options=opts5)
    res = solver.solve(obj)
    assert bool(res.converged)
    assert int(res.iters) % 5 == 0
    assert abs(float(res.objective) - 21.499805) / 21.499805 < 1e-6


def test_arbitrage_route_is_feasible():
    """The returned trades must be executable: every pool's phi must not
    decrease, and psi must satisfy the side constraints."""
    spec, obj = arbitrage_instance()
    solver, res = _solve(spec, obj)
    deltas, lambdas = solver.unbucket(res)
    psi = np.zeros(spec.n_assets)
    for pool, D, L in zip(spec.pools, deltas, lambdas):
        assert (D >= -1e-12).all() and (L >= -1e-12).all()
        newR = pool.reserves + pool.fee * D - L
        if pool.kind == "gm":
            phi0 = np.sum(pool.weights * np.log(pool.reserves + pool.shift))
            phi1 = np.sum(pool.weights * np.log(newR + pool.shift))
            assert phi1 >= phi0 - 1e-9
        else:
            assert newR.sum() >= pool.reserves.sum() - 1e-9
            assert (newR >= -1e-9).all()
        for j, a in enumerate(pool.assets):
            psi[a] += L[j] - D[j]
    # psi >= 0 side constraint (arbitrage.py:77) up to consensus residual
    assert (psi >= -1e-6).all()
    # objective computed from the actual trades matches the reported one
    assert abs(np.dot(obj.c, psi) - float(res.objective)) < 1e-5


def test_liquidation_objective():
    spec, obj = liquidation_instance()
    solver, res = _solve(spec, obj)
    assert bool(res.converged)
    assert abs(float(res.psi[4]) - 15.883010) / 15.883010 < 1e-6
    # full basket liquidated: psi[j] == -holdings[j] for j != numeraire
    np.testing.assert_allclose(
        np.asarray(res.psi[:4]), -np.array([2.0, 1.0, 3.0, 5.0]), atol=1e-7
    )


@pytest.mark.parametrize(
    "t,pin",
    [(0.0, 6.233000), (10.0, 16.388196), (25.0, 31.005495), (50.0, 44.182020)],
)
def test_two_asset_sweep_points(t, pin):
    spec, obj = two_asset_instance(t)
    _, res = _solve(spec, obj)
    assert bool(res.converged)
    assert abs(float(res.objective) - pin) / pin < 1e-6


def test_sweep_api_batched():
    """The vmapped sweep must agree with pointwise solves and be monotone
    concave in t (property test from SURVEY.md §4(2))."""
    spec, _ = two_asset_instance(0.0)
    amounts = np.linspace(0.0, 50.0, 11)
    sw = api.sweep(
        spec, give=0, receive=2, amounts=amounts,
        dtype=jnp.float64, options=OPTS,
    )
    assert sw.converged.all()
    assert sw.utilities.shape == (11,)
    # pins at grid points t=0, 25, 50
    assert abs(sw.utilities[0] - 6.233000) < 1e-5
    assert abs(sw.utilities[5] - 31.005495) / 31.005495 < 1e-6
    assert abs(sw.utilities[10] - 44.182020) / 44.182020 < 1e-6
    # u monotone nondecreasing, concave (within tolerance)
    du = np.diff(sw.utilities)
    assert (du >= -1e-6).all()
    assert (np.diff(du) <= 1e-4).all()
    # per-pool net trade curves have the right shapes
    assert len(sw.net_trades) == 5
    assert sw.net_trades[0].shape == (3, 11)


def test_sweep_certified_and_per_pool_parity():
    """certify=True: every grid point carries a rigorous duality-gap
    certificate, and the per-pool net-trade curves match independent
    pointwise oracle solves (the reference prints per-pool trades per
    sweep iteration, ``two-asset.py:96-98``)."""
    from cfmm_routing_tpu.oracle import oracle_solve

    spec, _ = two_asset_instance(0.0)
    amounts = np.array([0.0, 10.0, 25.0, 50.0])
    sw = api.sweep(
        spec, give=0, receive=2, amounts=amounts,
        dtype=jnp.float64, options=OPTS, certify=True,
    )
    assert sw.certificates is not None and len(sw.certificates) == 4
    for cert in sw.certificates:
        assert cert.gap_rel < 1e-6
        assert cert.feasibility_rel < 1e-7
    assert sw.prices.shape == (4, 3)

    # per-pool net trades vs oracle at each t (dual-degenerate points can
    # differ per pool; compare the per-asset net flows, which are unique)
    for ti, t in enumerate(amounts):
        spec_t, obj_t = two_asset_instance(float(t))
        ref = oracle_solve(spec_t, obj_t)
        psi_t = np.zeros(3)
        for pid, pool in enumerate(spec.pools):
            for j, a in enumerate(pool.assets):
                psi_t[a] += sw.net_trades[pid][j, ti]
        np.testing.assert_allclose(psi_t, ref.psi, atol=2e-5)


def test_api_arbitrage_and_liquidate():
    spec, _ = arbitrage_instance()
    route = api.arbitrage(
        spec, [1.5, 10, 2, 3], dtype=jnp.float64, options=OPTS
    )
    assert route.converged
    assert abs(route.objective - 21.499805) / 21.499805 < 1e-6
    assert len(route.deltas) == 5
    # dual prices at optimum: positive and ~proportional to market values
    # for assets the router actually trades
    assert (route.prices >= -1e-8).all()

    spec, _ = liquidation_instance()
    route = api.liquidate(
        spec, [2, 1, 3, 5, 10], numeraire=4, dtype=jnp.float64, options=OPTS
    )
    assert route.converged
    assert abs(route.psi[4] - 15.883010) / 15.883010 < 1e-6


def test_zero_trade_when_no_arbitrage():
    """Property (SURVEY.md §4(2)): a no-arbitrage market yields psi = 0.

    Two identical fee-less pools at identical prices admit no profit.
    """
    from cfmm_routing_tpu.models.pools import ProductPool
    from cfmm_routing_tpu.models.utility import Objective
    from cfmm_routing_tpu.solver.compiler import ProblemSpec

    spec = ProblemSpec(
        n_assets=2,
        pools=[
            ProductPool((0, 1), [10.0, 10.0], fee=0.997),
            ProductPool((0, 1), [20.0, 20.0], fee=0.997),
        ],
    )
    obj = Objective.arbitrage([1.0, 1.0])
    _, res = _solve(spec, obj)
    assert float(res.objective) < 1e-7
