"""Certification (solver/certify.py): feasibility + rigorous dual bounds.

The dual bound must be a TRUE upper bound on the optimum for ANY price
vector — including prices from an unconverged solver — and must become
tight (small relative gap) when the solver converges.  Ground truth is the
scipy oracle (SURVEY.md §4(2)).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from cfmm_routing_tpu import api
from cfmm_routing_tpu.models.reference_instances import (
    arbitrage_instance,
    liquidation_instance,
)
from cfmm_routing_tpu.models.utility import Objective
from cfmm_routing_tpu.oracle import oracle_solve
from cfmm_routing_tpu.solver.admm import AdmmOptions, AdmmSolver
from cfmm_routing_tpu.solver.certify import certify
from cfmm_routing_tpu.solver.compiler import compile_spec
from cfmm_routing_tpu.utils.synth import random_arbitrage

TIGHT = AdmmOptions(max_iters=30000, eps_abs=1e-11, eps_rel=1e-11)


def _certify_solve(spec, obj, opts):
    solver = AdmmSolver(compile_spec(spec), dtype=jnp.float64, options=opts)
    res = solver.solve(obj)
    cert = certify(
        solver.compiled,
        obj,
        {k: np.asarray(v) for k, v in res.deltas.items()},
        {k: np.asarray(v) for k, v in res.lambdas.items()},
        np.asarray(res.prices),
        psi_claimed=np.asarray(res.psi),
    )
    return res, cert


def test_arbitrage_certificate_tight():
    spec, obj = arbitrage_instance()
    res, cert = _certify_solve(spec, obj, TIGHT)
    # primal value matches the pinned baseline and the gap brackets it
    assert abs(cert.objective - 21.499805) / 21.499805 < 1e-6
    assert cert.gap_abs >= -1e-9  # dual bound above primal
    assert cert.gap_rel < 1e-6
    assert cert.feasibility < 1e-8
    assert cert.psi_consistency < 1e-9


def test_liquidation_certificate_tight():
    spec, obj = liquidation_instance()
    res, cert = _certify_solve(spec, obj, TIGHT)
    assert abs(cert.objective - 15.883010) / 15.883010 < 1e-6
    assert cert.gap_rel < 1e-6
    assert cert.feasibility < 1e-8


@pytest.mark.parametrize("seed", range(4))
def test_dual_bound_is_valid_even_unconverged(seed):
    """An ADMM iterate stopped after only 30 iterations still yields a
    certificate whose dual bound exceeds the TRUE optimum (oracle)."""
    spec, obj = random_arbitrage(6, 12, seed=seed)
    truth = oracle_solve(spec, obj).objective
    _, cert = _certify_solve(
        spec, obj, AdmmOptions(max_iters=30, eps_abs=1e-12, eps_rel=1e-12)
    )
    assert cert.dual_bound >= truth - 1e-7 * max(1.0, abs(truth))


@pytest.mark.parametrize("seed", [10, 11])
def test_certificate_brackets_oracle(seed):
    """Converged certificate: primal <= oracle optimum <= dual bound."""
    spec, obj = random_arbitrage(5, 10, seed=seed)
    truth = oracle_solve(spec, obj).objective
    _, cert = _certify_solve(spec, obj, TIGHT)
    tol = 1e-6 * max(1.0, abs(truth))
    assert cert.objective <= truth + tol
    assert cert.dual_bound >= truth - tol
    assert cert.gap_rel < 1e-4


def test_zero_prices_bound_finite():
    """Degenerate all-zero prices must fall back to the drain bound, not
    inf/nan."""
    spec, obj = arbitrage_instance()
    solver = AdmmSolver(compile_spec(spec), dtype=jnp.float64, options=TIGHT)
    res = solver.solve(obj)
    cert = certify(
        solver.compiled,
        obj,
        {k: np.asarray(v) for k, v in res.deltas.items()},
        {k: np.asarray(v) for k, v in res.lambdas.items()},
        np.zeros(spec.n_assets),
    )
    assert np.isfinite(cert.dual_bound)
    assert cert.dual_bound >= 21.499805 - 1e-6  # still a valid upper bound


def test_api_certify_flag():
    spec, obj = arbitrage_instance()
    route = api.arbitrage(
        spec, obj.c, certify=True, dtype=jnp.float64, options=TIGHT
    )
    assert route.certificate is not None
    assert route.certificate.gap_rel < 1e-6
    assert "rel_gap" in route.certificate.summary()


def test_certify_batch_matches_per_point():
    """certify_batch == T serial certify calls, field for field (same
    math, vectorized over the grid axis; round-5 batched sweep path)."""
    import jax.numpy as jnp

    from cfmm_routing_tpu.solver.admm import AdmmOptions, AdmmSolver
    from cfmm_routing_tpu.solver.certify import certify, certify_batch
    from cfmm_routing_tpu.solver.compiler import compile_spec
    from cfmm_routing_tpu.models.reference_instances import (
        two_asset_instance,
    )

    spec, _ = two_asset_instance()
    n = spec.n_assets
    T = 5
    amounts = np.linspace(0.0, 40.0, T)
    c = np.zeros((T, n))
    c[:, 2] = 1.0
    lo = np.zeros((T, n))
    lo[:, 0] = -amounts
    hi_solve = np.full((T, n), np.finfo(np.float32).max / 4)
    hi = np.full((T, n), np.inf)
    solver = AdmmSolver(
        compile_spec(spec), dtype=jnp.float32,
        options=AdmmOptions(max_iters=1500, eps_abs=1e-6, eps_rel=1e-6),
    )
    res = solver.solve_batch(c, lo, hi_solve)
    dbat = {k: np.asarray(v) for k, v in res.deltas.items()}
    lbat = {k: np.asarray(v) for k, v in res.lambdas.items()}
    prices = np.asarray(res.prices)
    psi = np.asarray(res.psi)

    batch = certify_batch(
        solver.compiled, c, lo, hi, dbat, lbat, prices, psi_claimed=psi
    )
    from cfmm_routing_tpu.models.utility import Objective

    for t in range(T):
        one = certify(
            solver.compiled,
            Objective(c[t], lo=lo[t], hi=hi[t]),
            {k: v[t] for k, v in dbat.items()},
            {k: v[t] for k, v in lbat.items()},
            prices[t],
            psi_claimed=psi[t],
        )
        b = batch[t]
        assert abs(b.objective - one.objective) <= 1e-12 * max(
            1.0, abs(one.objective)
        )
        assert abs(b.dual_bound - one.dual_bound) <= 1e-9 * max(
            1.0, abs(one.dual_bound)
        )
        assert abs(b.gap_rel - one.gap_rel) <= 1e-12
        for f in (
            "phi_violation", "nonneg_violation", "floor_violation",
            "box_violation", "psi_consistency",
        ):
            assert abs(getattr(b, f) - getattr(one, f)) <= 1e-12, f


def test_feasibility_rel_keeps_phi_relative():
    """phi_violation is already relative (log-domain for gm, k0-normalized
    for cs); a large trade scale must NOT dilute it — only the absolute
    components (nonneg/floor/box, token units) divide by psi_scale.
    Regression for the round-3 advisor finding (certify.py feasibility_rel
    unsound at psi_scale >> 1)."""
    import dataclasses

    from cfmm_routing_tpu.solver.certify import Certificate

    cert = Certificate(
        objective=0.0, dual_bound=0.0, gap_abs=0.0, gap_rel=0.0,
        phi_violation=1e-2, nonneg_violation=1e-1, floor_violation=0.0,
        box_violation=0.0, psi_consistency=0.0, prices=np.zeros(1),
        psi_scale=1e4,
    )
    # a 1e-2 RELATIVE pool-invariant violation stays 1e-2, never 1e-6
    assert abs(cert.feasibility_rel - 1e-2) < 1e-15
    cert_abs = dataclasses.replace(cert, phi_violation=0.0)
    # absolute 1e-1 slack on 1e4-sized trades is a 1e-5 relative violation
    assert abs(cert_abs.feasibility_rel - 1e-5) < 1e-18
