"""General separable concave utilities (models/utility.py ConcaveUtility +
ops/prox.py utility_prox).

The reference's cvxpy layer admits arbitrary concave utilities over psi
(SURVEY.md §0) though its scripts only use linear ones; these tests pin the
nonlinear extension against (a) per-coordinate scalar optimization, (b) the
scipy oracle on full networks, and (c) the rigorous duality certificate.
"""
import numpy as np
import pytest
import scipy.optimize as sopt

import jax.numpy as jnp

from cfmm_routing_tpu import api
from cfmm_routing_tpu.models.utility import ConcaveUtility, Objective
from cfmm_routing_tpu.oracle import oracle_solve
from cfmm_routing_tpu.ops.prox import psi_prox, utility_prox, utility_value
from cfmm_routing_tpu.solver.admm import AdmmOptions, AdmmSolver
from cfmm_routing_tpu.solver.certify import certify
from cfmm_routing_tpu.solver.compiler import compile_spec
from cfmm_routing_tpu.utils.synth import random_arbitrage

TIGHT = AdmmOptions(max_iters=30000, eps_abs=1e-11, eps_rel=1e-11)


def _mixed_utility(n: int, seed: int) -> ConcaveUtility:
    rng = np.random.default_rng(seed)
    u = ConcaveUtility.linear(rng.uniform(0.5, 2.0, n), lo=np.zeros(n))
    for j in range(n):
        kind = j % 4
        if kind == 1:
            u = u.with_quadratic(j, rng.uniform(0.5, 2.0), rng.uniform(0.1, 1.0))
        elif kind == 2:
            u = u.with_log(j, rng.uniform(0.5, 2.0), rng.uniform(0.5, 3.0))
        elif kind == 3:
            u = u.with_power(
                j, rng.uniform(0.5, 2.0), rng.uniform(0.2, 0.8), rng.uniform(0.5, 2.0)
            )
        u = u.with_box(j, rng.uniform(-0.5, 0.0), rng.uniform(1.0, 8.0))
    return u


def test_prox_matches_scalar_optimizer():
    """utility_prox == per-coordinate bounded concave maximization."""
    n = 16
    rng = np.random.default_rng(0)
    util = _mixed_utility(n, seed=1)
    s = rng.normal(0.0, 2.0, n)
    degree = rng.integers(1, 6, n).astype(np.float64)
    rho = 0.7

    packed = util.pack(jnp.float64)
    psi, mu = utility_prox(
        jnp.asarray(s), jnp.asarray(degree), packed, jnp.float64(rho)
    )
    psi = np.asarray(psi)

    for j in range(n):
        w = rho / (2.0 * degree[j])

        def neg_obj(x, j=j, w=w):
            e = np.zeros(n)
            e[j] = x
            return -(util.value_vec(e)[j] - 0.5 * w * (x - s[j]) ** 2)

        lo, hi = float(packed.lo[j]), float(packed.hi[j])
        res = sopt.minimize_scalar(
            neg_obj, bounds=(lo, hi), method="bounded",
            options={"xatol": 1e-12},
        )
        assert abs(psi[j] - res.x) < 1e-6, f"asset {j}: {psi[j]} vs {res.x}"
        # consensus multiplier contract
        assert abs(mu[j] - (psi[j] - s[j]) / (2.0 * degree[j])) < 1e-12


def test_all_linear_matches_psi_prox():
    n = 8
    rng = np.random.default_rng(3)
    c = rng.normal(size=n)
    lo = np.zeros(n)
    hi = np.full(n, 5.0)
    util = ConcaveUtility.linear(c, lo, hi).pack(jnp.float64)
    s = rng.normal(0.0, 3.0, n)
    d = rng.integers(1, 4, n).astype(np.float64)
    psi_a, mu_a = psi_prox(
        jnp.asarray(s), jnp.asarray(d), jnp.asarray(c), jnp.asarray(lo),
        jnp.asarray(hi), jnp.float64(1.3),
    )
    psi_b, mu_b = utility_prox(jnp.asarray(s), jnp.asarray(d), util, jnp.float64(1.3))
    np.testing.assert_allclose(np.asarray(psi_a), np.asarray(psi_b), atol=1e-14)
    np.testing.assert_allclose(np.asarray(mu_a), np.asarray(mu_b), atol=1e-14)


def test_value_grad_consistency():
    n = 12
    util = _mixed_utility(n, seed=7)
    rng = np.random.default_rng(4)
    psi = rng.uniform(0.1, 2.0, n)
    g = util.grad(psi)
    eps = 1e-6
    for j in range(n):
        e = np.zeros(n)
        e[j] = eps
        fd = (util.value(psi + e) - util.value(psi - e)) / (2 * eps)
        assert abs(fd - g[j]) < 1e-5 * max(1.0, abs(g[j]))


def test_packed_value_matches_host():
    n = 10
    util = _mixed_utility(n, seed=9)
    psi = np.random.default_rng(5).uniform(0.0, 1.5, n)
    dev = float(utility_value(util.pack(jnp.float64), jnp.asarray(psi)))
    assert abs(dev - util.value(psi)) < 1e-10 * max(1.0, abs(dev))


@pytest.mark.parametrize("flavor", ["log", "power", "quad"])
def test_solver_matches_oracle_nonlinear(flavor):
    """Full network solve with a nonlinear utility == scipy oracle."""
    spec, lin = random_arbitrage(5, 8, seed=11)
    n = spec.n_assets
    util = ConcaveUtility.linear(lin.c, lo=np.zeros(n))
    for j in range(n):
        if flavor == "log":
            util = util.with_log(j, 1.0 + 0.2 * j, 1.0)
        elif flavor == "power":
            util = util.with_power(j, 1.0 + 0.1 * j, 0.5, 1.0)
        else:
            util = util.with_quadratic(j, 1.0 + 0.3 * j, 0.5)
        util = util.with_box(j, 0.0, 50.0)

    solver = AdmmSolver(compile_spec(spec), dtype=jnp.float64, options=TIGHT)
    res = solver.solve(util)
    truth = oracle_solve(spec, util)
    # compare achieved utility values (psi itself may be non-unique)
    got = util.value(np.asarray(res.psi))
    want = util.value(truth.psi)
    assert abs(got - want) < 1e-5 * max(1.0, abs(want)), (got, want)


def test_certificate_nonlinear():
    spec, lin = random_arbitrage(5, 8, seed=13)
    n = spec.n_assets
    util = ConcaveUtility.linear(lin.c, lo=np.zeros(n))
    for j in range(n):
        util = util.with_log(j, 1.0, 1.0).with_box(j, 0.0, 50.0)
    solver = AdmmSolver(compile_spec(spec), dtype=jnp.float64, options=TIGHT)
    res = solver.solve(util)
    cert = certify(
        solver.compiled,
        util,
        {k: np.asarray(v) for k, v in res.deltas.items()},
        {k: np.asarray(v) for k, v in res.lambdas.items()},
        np.asarray(res.prices),
        psi_claimed=np.asarray(res.psi),
    )
    assert cert.feasibility < 1e-8
    assert cert.gap_abs >= -1e-9
    # curved-utility duals converge a touch slower than linear ones; the
    # bound stays rigorous, just ~1e-5-loose at these tolerances
    assert cert.gap_rel < 5e-5
    # the dual bound must sit above the oracle optimum too
    truth = oracle_solve(spec, util)
    assert cert.dual_bound >= util.value(truth.psi) - 1e-6


def test_api_route_generic():
    spec, lin = random_arbitrage(4, 6, seed=17)
    n = spec.n_assets
    util = ConcaveUtility.linear(lin.c, lo=np.zeros(n))
    util = util.with_log(0, 1.0, 1.0).with_box(0, 0.0, 20.0)
    r = api.route(spec, util, dtype=jnp.float64, options=TIGHT, certify=True)
    assert r.converged
    assert r.certificate is not None and r.certificate.gap_rel < 1e-5
    # linear Objective also accepted
    r2 = api.route(spec, lin, dtype=jnp.float64, options=TIGHT)
    assert np.isfinite(r2.objective)
    with pytest.raises(TypeError):
        api.route(spec, np.ones(n))


def test_power_root_matches_brentq_extreme_params():
    """Regression (round 2): the old Newton-only _power_root collapsed to
    the positive floor for small prox weights w (i.e. small rho) with
    t < 0 — the overflow in y^(p-1) froze the iterate and the prox
    silently returned a wrong fixed point, so the SOLVER converged to a
    suboptimal psi with clean residuals.  The bracketed bisection must
    match scipy brentq across extreme parameter draws."""
    from scipy.optimize import brentq

    from cfmm_routing_tpu.ops.prox import _power_root

    rng = np.random.default_rng(12)
    for _ in range(80):
        w = 10.0 ** rng.uniform(-4, 2)
        t = rng.uniform(-80, 80)
        cf = 10.0 ** rng.uniform(-3, 2)
        p = rng.uniform(0.02, 0.98)
        hi = max(2 * t, 1.0) + (2 * cf / w) ** (1.0 / (2.0 - p)) + 1e8
        root = brentq(
            lambda y: w * (y - t) - cf * y ** (p - 1.0),
            1e-300, hi, xtol=1e-300, rtol=8.9e-16, maxiter=600,
        )
        got = float(
            _power_root(
                jnp.float64(w), jnp.float64(t), jnp.float64(cf),
                jnp.float64(p), jnp.float64(2.2e-308),
            )
        )
        assert abs(got - root) <= 1e-9 * max(abs(root), 1e-12), (w, t, cf, p)


def test_power_utility_solve_correct_at_small_rho():
    """End-to-end twin of the regression above: at rho=0.125 the solver
    used to 'converge' (residuals ~1e-10) to an objective 4.5% below the
    optimum on this instance."""
    from cfmm_routing_tpu.utils.synth import random_arbitrage

    spec, lin = random_arbitrage(5, 8, seed=11)
    n = spec.n_assets
    util = ConcaveUtility.linear(lin.c, lo=np.zeros(n))
    for j in range(n):
        util = util.with_power(j, 1.0 + 0.1 * j, 0.5, 1.0).with_box(j, 0.0, 50.0)
    opts = AdmmOptions(
        max_iters=60000, eps_abs=1e-10, eps_rel=1e-10, adapt_rho=False,
        rho=0.125,
    )
    res = AdmmSolver(compile_spec(spec), dtype=jnp.float64, options=opts).solve(util)
    assert bool(res.converged)
    got = util.value(np.asarray(res.psi))
    assert abs(got - 25.750686) < 1e-4, got
