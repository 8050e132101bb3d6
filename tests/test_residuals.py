"""Device-side certificate gate (solver/residuals.py) vs the rigorous
f64 host certificate: the gate's estimates must agree to f32-evaluation
accuracy so the solve loop can run its accept-gating on device and pay
for the f64 pass only when accepting."""
import numpy as np

import jax
import jax.numpy as jnp

from cfmm_routing_tpu.solver.admm import AdmmOptions, AdmmSolver
from cfmm_routing_tpu.solver.certify import certify, dual_bound
from cfmm_routing_tpu.solver.compiler import compile_table
from cfmm_routing_tpu.solver.residuals import DeviceGate
from cfmm_routing_tpu.utils.synth import random_arbitrage_table


def _solve_state(solver, obj, iters):
    c = jnp.asarray(obj.c, jnp.float32)
    lo = jnp.asarray(np.maximum(obj.lo, -3e38), jnp.float32)
    hi = jnp.asarray(np.minimum(obj.hi, 3e38), jnp.float32)
    z = {
        nm: (jnp.zeros_like(a["mask"]), jnp.zeros_like(a["mask"]))
        for nm, a in solver.buckets.items()
    }
    nu = jnp.zeros((solver.n,), jnp.float32)
    rho = jnp.float32(1.0)
    step = jax.jit(lambda z, nu: solver._iterate(z, nu, rho, c, lo, hi))
    for _ in range(iters):
        z, nu, psi, w, _ = step(z, nu)
    return z, nu, 1.0


def test_gate_matches_host_certificate_identity_scaling():
    table, obj = random_arbitrage_table(12, 64, seed=4)
    compiled = compile_table(table)
    solver = AdmmSolver(
        compiled, dtype=jnp.float32, options=AdmmOptions(max_iters=10)
    )
    z, nu, rho = _solve_state(solver, obj, 400)
    gate = DeviceGate(solver, compiled, obj)
    est = gate.finish(gate.evaluate(z, nu, rho))

    # host ground truth from the same projected point
    w_out = {}
    for name, arrs in solver.buckets.items():
        nu_e = solver._bcast_nu(nu, name)
        zD, zL = z[name]
        D, L = solver._project(name, arrs, zD - nu_e, zL + nu_e)
        w_out[name] = (np.asarray(D), np.asarray(L))
    cert = certify(
        compiled, obj,
        {k: v[0] for k, v in w_out.items()},
        {k: v[1] for k, v in w_out.items()},
        np.asarray(rho * np.asarray(nu), np.float64),
    )
    assert abs(est.objective - cert.objective) <= 1e-5 * max(
        1.0, abs(cert.objective)
    )
    assert abs(est.dual - cert.dual_bound) <= 1e-9 * max(
        1.0, abs(cert.dual_bound)
    )
    assert abs(est.gap_rel - cert.gap_rel) <= 1e-5
    assert abs(est.feasibility_rel - cert.feasibility_rel) <= 1e-5


def test_gate_matches_host_certificate_equilibrated():
    """Solve in EQUILIBRATED space, gate in ORIGINAL units (the
    bench_grid flow): power-of-two scales are fp-exact so the gate's
    original-unit estimates must match the f64 host certificate of the
    un-scaled point to f32 accuracy."""
    from cfmm_routing_tpu.solver.precondition import (
        equilibrate,
        scale_objective,
        scale_table,
    )

    table, obj = random_arbitrage_table(12, 64, seed=6)
    d_skew = np.exp2(np.round(np.linspace(-6, 6, table.n_assets)))
    table = scale_table(table, 1.0 / d_skew)
    obj = scale_objective(obj, 1.0 / d_skew)
    eq = equilibrate(table, obj)
    compiled_eq = compile_table(eq.table)
    compiled_orig = compile_table(table)
    solver = AdmmSolver(
        compiled_eq, dtype=jnp.float32, options=AdmmOptions(max_iters=10)
    )
    z, nu, rho = _solve_state(solver, eq.objective, 500)
    gate = DeviceGate(solver, compiled_orig, obj, d=eq.d)
    est = gate.finish(gate.evaluate(z, nu, rho))

    d_ext = np.concatenate([eq.d, [1.0]])
    w_out = {}
    for name, arrs in solver.buckets.items():
        nu_e = solver._bcast_nu(nu, name)
        zD, zL = z[name]
        D, L = solver._project(name, arrs, zD - nu_e, zL + nu_e)
        ds = d_ext[compiled_eq.buckets[name].asset].T
        w_out[name] = (np.asarray(D) * ds, np.asarray(L) * ds)
    cert = certify(
        compiled_orig, obj,
        {k: v[0] for k, v in w_out.items()},
        {k: v[1] for k, v in w_out.items()},
        np.asarray(rho * np.asarray(nu), np.float64) / eq.d,
    )
    assert abs(est.objective - cert.objective) <= 1e-4 * max(
        1.0, abs(cert.objective)
    )
    assert abs(est.gap_rel - cert.gap_rel) <= 1e-5
    assert abs(est.feasibility_rel - cert.feasibility_rel) <= 1e-5
    # the prices-only dual bound is exactly certify's dual side
    assert abs(
        dual_bound(compiled_orig, obj, cert.prices) - cert.dual_bound
    ) <= 1e-9 * max(1.0, abs(cert.dual_bound))
