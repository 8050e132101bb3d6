"""Non-separable concave utilities (CustomUtility + FISTA consensus prox).

Closes the round-1 generality gap vs the reference's modeling layer: the
cvxpy stack accepts ANY DCP-concave objective over psi
(``/root/reference/arbitrage.py:57`` is just the linear instance); the
separable atom library could not express couplings like log(1 + c@psi)
or a full quadratic form.  Ground truth: the scipy oracle solving the
identical program through CustomUtility's host value/grad.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from cfmm_routing_tpu.models.utility import CustomUtility
from cfmm_routing_tpu.oracle import oracle_solve
from cfmm_routing_tpu.solver.admm import AdmmOptions, AdmmSolver
from cfmm_routing_tpu.solver.compiler import compile_spec
from cfmm_routing_tpu.utils.synth import random_arbitrage

TIGHT = AdmmOptions(max_iters=40000, eps_abs=1e-10, eps_rel=1e-10)


def _network(seed=11):
    spec, lin = random_arbitrage(5, 8, seed=seed)
    return spec, np.asarray(lin.c)


def test_log_of_linear_matches_oracle():
    """U(psi) = log(1 + c @ psi), psi >= 0 — concave, NON-separable.
    -Hessian = c c^T / (1 + c@psi)^2 <= ||c||^2 I on the box."""
    spec, c = _network()
    n = spec.n_assets
    util = CustomUtility(
        fn=lambda p: jnp.log(1.0 + jnp.dot(jnp.asarray(c, p.dtype), p)),
        lo=np.zeros(n), hi=np.full(n, 50.0),
        # the global smoothness bound ||c||^2 is ~100x the curvature at the
        # solution (1 + c@psi is large there), so the safe FISTA step is
        # tiny — budget inner trips accordingly (rate 1 - sqrt(mu/L))
        smoothness=float(c @ c), prox_iters=600,
    )
    solver = AdmmSolver(compile_spec(spec), dtype=jnp.float64, options=TIGHT)
    res = solver.solve(util)
    assert bool(res.converged)
    truth = oracle_solve(spec, util)
    got = util.value(np.asarray(res.psi))
    want = util.value(truth.psi)
    assert abs(got - want) < 1e-6 * max(1.0, abs(want)), (got, want)
    # the device-side objective on the result agrees with the host value
    assert abs(float(res.objective) - got) < 1e-8


def test_nonseparable_quadratic_matches_oracle():
    """U(psi) = c @ psi - 0.5 psi^T Q psi with a dense PSD Q."""
    spec, c = _network(seed=13)
    n = spec.n_assets
    rng = np.random.default_rng(5)
    A = rng.normal(size=(n, n)) / np.sqrt(n)
    Q = A @ A.T + 0.1 * np.eye(n)
    lam_max = float(np.linalg.eigvalsh(Q)[-1])

    util = CustomUtility(
        fn=lambda p: jnp.dot(jnp.asarray(c, p.dtype), p)
        - 0.5 * jnp.dot(p, jnp.asarray(Q, p.dtype) @ p),
        lo=np.full(n, -5.0), hi=np.full(n, 50.0),
        smoothness=lam_max, prox_iters=80,
    )
    solver = AdmmSolver(compile_spec(spec), dtype=jnp.float64, options=TIGHT)
    res = solver.solve(util)
    assert bool(res.converged)
    truth = oracle_solve(spec, util)
    got = util.value(np.asarray(res.psi))
    want = util.value(truth.psi)
    assert abs(got - want) < 1e-6 * max(1.0, abs(want)), (got, want)


def test_custom_certification_with_conjugate():
    """certify() works when the user supplies a rigorous conjugate.
    For U = c@psi - 0.5 psi^T Q psi the box-free conjugate
    0.5 (c-nu)^T Q^{-1} (c-nu) is a valid UPPER bound on the box sup."""
    spec, c = _network(seed=13)
    n = spec.n_assets
    rng = np.random.default_rng(5)
    A = rng.normal(size=(n, n)) / np.sqrt(n)
    Q = A @ A.T + 0.1 * np.eye(n)
    Qinv = np.linalg.inv(Q)

    util = CustomUtility(
        fn=lambda p: jnp.dot(jnp.asarray(c, p.dtype), p)
        - 0.5 * jnp.dot(p, jnp.asarray(Q, p.dtype) @ p),
        lo=np.full(n, -5.0), hi=np.full(n, 50.0),
        smoothness=float(np.linalg.eigvalsh(Q)[-1]), prox_iters=80,
        conjugate=lambda nu: 0.5 * float((c - nu) @ Qinv @ (c - nu)),
    )
    solver = AdmmSolver(compile_spec(spec), dtype=jnp.float64, options=TIGHT)
    res = solver.solve(util)
    from cfmm_routing_tpu.solver.certify import certify

    cert = certify(
        solver.compiled, util,
        {k: np.asarray(v) for k, v in res.deltas.items()},
        {k: np.asarray(v) for k, v in res.lambdas.items()},
        np.asarray(res.prices), psi_claimed=np.asarray(res.psi),
    )
    # valid bound: gap is nonnegative (up to f64 slack) and small at optimum
    assert cert.gap_abs > -1e-8
    assert cert.gap_rel < 1e-5
    assert cert.feasibility < 1e-8


def test_custom_certify_requires_conjugate():
    spec, c = _network()
    n = spec.n_assets
    util = CustomUtility(
        fn=lambda p: jnp.log(1.0 + jnp.dot(jnp.asarray(c, p.dtype), p)),
        lo=np.zeros(n), hi=np.full(n, 50.0), smoothness=float(c @ c),
    )
    from cfmm_routing_tpu.solver.certify import certify

    with pytest.raises(ValueError, match="conjugate"):
        certify(compile_spec(spec), util, {}, {}, np.zeros(n))


def test_custom_warm_start():
    spec, c = _network()
    n = spec.n_assets
    util = CustomUtility(
        fn=lambda p: jnp.log(1.0 + jnp.dot(jnp.asarray(c, p.dtype), p)),
        lo=np.zeros(n), hi=np.full(n, 50.0),
        smoothness=float(c @ c), prox_iters=600,
    )
    solver = AdmmSolver(compile_spec(spec), dtype=jnp.float64, options=TIGHT)
    cold = solver.solve(util)
    rewarm = solver.solve(util, warm=cold)
    assert bool(rewarm.converged)
    assert int(rewarm.iters) <= max(10, int(cold.iters) // 5)
