"""Primal-infeasibility detection (VERDICT round-1 #8).

The reference surfaces infeasibility as a cvxpy solver status behind
``/root/reference/liquidation.py:85``.  Here the chunked driver detects a
non-converging run, extracts the diverging dual direction, and returns a
RIGOROUS separating-price certificate: margin < 0 proves the psi box
demands more value than every pool together can emit.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from cfmm_routing_tpu.models.pools import ProductPool
from cfmm_routing_tpu.models.utility import Objective
from cfmm_routing_tpu.solver.admm import AdmmOptions, AdmmSolver
from cfmm_routing_tpu.solver.certify import certify_infeasible
from cfmm_routing_tpu.solver.compiler import ProblemSpec, compile_spec
from cfmm_routing_tpu.solver.driver import ChunkedDriver


def _spec():
    # one 2-asset product pool with 10/10 reserves: at most ~10 units of
    # either asset can ever be withdrawn
    return ProblemSpec(
        n_assets=2, pools=[ProductPool((0, 1), [10.0, 10.0], fee=0.997)]
    )


def _objective(demand: float) -> Objective:
    # "spend at most 10 units of asset 0, end with at least `demand` of
    # asset 1" — infeasible for demand > 10 (can never drain the pool past
    # its reserve), feasible for small demand
    return Objective(
        c=np.array([0.0, 1.0]),
        lo=np.array([-10.0, demand]),
        hi=np.array([np.inf, np.inf]),
    )


def test_certificate_proves_infeasible_demand():
    compiled = compile_spec(_spec())
    cert = certify_infeasible(compiled, _objective(50.0), np.array([0.0, 1.0]))
    assert cert.infeasible
    # pools can emit at most 10 units of asset 1 against a demand of 50
    assert cert.margin < -35.0
    assert "INFEASIBLE" in cert.summary()


def test_certificate_inconclusive_on_feasible_instance():
    compiled = compile_spec(_spec())
    for u in (np.array([0.0, 1.0]), np.array([1.0, 1.0]), np.array([3.0, 0.1])):
        cert = certify_infeasible(compiled, _objective(2.0), u)
        assert not cert.infeasible
        assert cert.margin >= 0.0


def test_driver_reports_infeasible_status():
    solver = AdmmSolver(
        compile_spec(_spec()), dtype=jnp.float64,
        options=AdmmOptions(max_iters=10**6, eps_abs=1e-9, eps_rel=1e-9),
    )
    res, log = ChunkedDriver(solver, chunk=100).solve(
        _objective(50.0), max_iters=20000
    )
    assert log.status == "infeasible"
    assert log.infeasibility is not None and log.infeasibility.infeasible
    assert not bool(res.converged)


def test_driver_feasible_twin_converges():
    solver = AdmmSolver(
        compile_spec(_spec()), dtype=jnp.float64,
        options=AdmmOptions(max_iters=10**6, eps_abs=1e-9, eps_rel=1e-9),
    )
    res, log = ChunkedDriver(solver, chunk=100).solve(
        _objective(2.0), max_iters=20000
    )
    assert log.status == "converged"
    assert log.infeasibility is None
    # it really ends with >= 2 units of asset 1
    assert float(res.psi[1]) >= 2.0 - 1e-7


def test_certificate_never_claims_on_zero_direction():
    compiled = compile_spec(_spec())
    cert = certify_infeasible(compiled, _objective(50.0), np.zeros(2))
    assert not cert.infeasible and cert.margin == np.inf
