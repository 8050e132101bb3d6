"""High-level workload API: the reference's three scripts as one-call fns.

    arbitrage(spec, market_values)        ~ /root/reference/arbitrage.py
    liquidate(spec, holdings, numeraire)  ~ /root/reference/liquidation.py
    sweep(spec, give, receive, amounts)   ~ /root/reference/two-asset.py

The sweep runs all grid points as ONE vmapped device call (the reference
re-canonicalizes and re-solves 50 times in a Python loop,
``two-asset.py:40-91``).  Each call returns a :class:`Route` with per-pool
trades in spec order, the net trade vector, dual prices, and solver
diagnostics; `certify=True` adds an f64 host-side certification report
(feasibility residuals + duality gap, ``solver/certify.py``).
"""
from __future__ import annotations

import dataclasses
import logging
from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

import jax

from .models.utility import ConcaveUtility, Objective
from .solver.admm import AdmmOptions, AdmmSolver
from .solver.compiler import PoolTable, ProblemSpec, compile_spec, compile_table

__all__ = [
    "Route", "Sweep", "arbitrage", "liquidate", "sweep", "route", "make_solver",
]

_LOG = logging.getLogger("cfmm_routing_tpu.api")


@dataclasses.dataclass
class Route:
    """A solved routing: what to tender/receive at every pool."""

    objective: float
    psi: np.ndarray
    prices: np.ndarray
    deltas: List[np.ndarray]  # per pool, spec order
    lambdas: List[np.ndarray]
    iters: int
    converged: bool
    r_norm: float
    s_norm: float
    certificate: Optional[object] = None


@dataclasses.dataclass
class Sweep:
    """Batched solve over a grid of input amounts (price-impact frontier)."""

    amounts: np.ndarray
    utilities: np.ndarray  # u(t) per grid point
    net_trades: List[np.ndarray]  # per pool: (k, T) array of Lambda - Delta
    iters: np.ndarray
    converged: np.ndarray
    prices: Optional[np.ndarray] = None  # (T, n) dual prices per grid point
    certificates: Optional[List[object]] = None  # per-point Certificate


def make_solver(
    spec: ProblemSpec,
    dtype=jnp.float32,
    options: Optional[AdmmOptions] = None,
) -> AdmmSolver:
    compiled = compile_spec(spec)
    return AdmmSolver(compiled, dtype=dtype, options=options or AdmmOptions())


def _route_from(solver: AdmmSolver, res, obj: Objective, do_certify: bool,
                cert_compiled=None) -> Route:
    deltas, lambdas = solver.unbucket(res)
    cert = None
    if do_certify:
        from .solver.certify import certify as _certify

        cert = _certify(
            cert_compiled if cert_compiled is not None else solver.compiled,
            obj,
            {k: np.asarray(v) for k, v in res.deltas.items()},
            {k: np.asarray(v) for k, v in res.lambdas.items()},
            np.asarray(res.prices),
            psi_claimed=np.asarray(res.psi),
        )
    return Route(
        objective=float(res.objective),
        psi=np.asarray(res.psi),
        prices=np.asarray(res.prices),
        deltas=deltas,
        lambdas=lambdas,
        iters=int(res.iters),
        converged=bool(res.converged),
        r_norm=float(res.r_norm),
        s_norm=float(res.s_norm),
        certificate=cert,
    )


def _refined_route(solver, compiled, solve_objective, res, refine_to,
                   cert_space=None) -> Route:
    """Run device-resident refinement to ``refine_to`` and build the Route
    from the refined point (always carries its certificate).
    ``cert_space``: the refine_device (cert_compiled, cert_objective,
    unscale_fn) triple for preconditioned solves."""
    from .solver.refine_device import refine_device

    out = refine_device(
        compiled, solve_objective, res, target_gap=refine_to,
        cert_space=cert_space,
    )
    route = _route_from(solver, out.result, solve_objective, False)
    route.certificate = out.certificate
    route.converged = bool(out.achieved)
    # the certificate recomputes the objective from the trades in f64 in
    # the CALLER's units — authoritative over the solve-space value
    route.objective = float(out.certificate.objective)
    return route


def _floor_options(solver_kwargs, refine_to):
    """Refinement lifts the f32 noise floor but converges at ADMM's usual
    rate — it needs a base iterate AT the floor, not a rough one.  When
    the caller asked for a certified gap without tuning the solver, run
    the base solve to residual 1e-7 (its f32 floor neighborhood) and SAY
    SO: on an ill-conditioned network this is a 20k-iteration budget the
    user never chose explicitly."""
    if refine_to is not None and "options" not in solver_kwargs:
        _LOG.info(
            "refine_to=%g with no explicit options: running the base solve "
            "to its f32 floor (max_iters=20000, eps=1e-7) — pass "
            "options=AdmmOptions(...) to choose the base budget yourself",
            refine_to,
        )
        solver_kwargs = dict(
            solver_kwargs,
            options=AdmmOptions(max_iters=20_000, eps_abs=1e-7, eps_rel=1e-7),
        )
    return solver_kwargs


def _reject_solver_with_precondition(solver):
    if solver is not None:
        raise ValueError(
            "solver= and precondition=True are mutually exclusive: the "
            "preconditioned path solves in rescaled units and must build "
            "its own solver (the passed solver's compiled problem is in "
            "original units).  Pass dtype=/options= via **solver_kwargs "
            "instead, or call solver.solve on an equilibrate()d problem "
            "directly."
        )


def _solve_preconditioned(spec, objective, certify, solver_kwargs,
                          refine_to=None):
    """Equilibrated solve in scaled units, results in ORIGINAL units.

    Per-asset power-of-two unit rescaling (``solver/precondition.py``)
    before the solve, exact un-scaling after; the optional certificate is
    evaluated against the ORIGINAL problem.  The reference has no
    analogue — ECOS's interior-point scaling plays this role behind
    ``/root/reference/arbitrage.py:82``.
    """
    from .solver.precondition import equilibrate, unscale_result

    table = PoolTable.from_spec(spec)
    eq = equilibrate(table, objective)
    compiled_eq = compile_table(eq.table, spec=spec)
    solver = make_solver_compiled(compiled_eq, **solver_kwargs)
    res = solver.solve(eq.objective)
    if refine_to is not None:
        return _refined_route(
            solver, compiled_eq, eq.objective, res, refine_to,
            cert_space=(
                compile_table(table, spec=spec), objective,
                lambda r: unscale_result(r, eq.d, compiled_eq),
            ),
        )
    res_host = jax.tree_util.tree_map(np.asarray, res)
    res0 = unscale_result(res_host, eq.d, compiled_eq)
    # re-evaluate the objective in original units (for log atoms the
    # scaled value differs by an additive constant)
    if isinstance(objective, ConcaveUtility):
        obj_val = objective.value(res0.psi)
    else:
        obj_val = float(np.asarray(objective.c) @ np.asarray(res0.psi))
    res0 = res0._replace(objective=np.float64(obj_val))
    cert_compiled = compile_table(table, spec=spec) if certify else None
    return _route_from(solver, res0, objective, certify, cert_compiled)


def make_solver_compiled(compiled, dtype=jnp.float32, options=None) -> AdmmSolver:
    return AdmmSolver(compiled, dtype=dtype, options=options or AdmmOptions())


def arbitrage(
    spec: ProblemSpec,
    market_values: Sequence[float],
    solver: Optional[AdmmSolver] = None,
    certify: bool = False,
    precondition: bool = False,
    refine_to: Optional[float] = None,
    **solver_kwargs,
) -> Route:
    """max market_value @ psi s.t. psi >= 0 (``arbitrage.py:57,77``).

    ``refine_to``: run device-resident mixed-precision refinement
    (``solver/refine_device.py``) to the given certified relative gap —
    the one-call equivalent of ECOS's terminal accuracy behind
    ``arbitrage.py:82``; the returned Route carries the certificate."""
    obj = Objective.arbitrage(market_values)
    if solver is None:
        solver_kwargs = _floor_options(solver_kwargs, refine_to)
    if precondition:
        _reject_solver_with_precondition(solver)
        return _solve_preconditioned(spec, obj, certify, solver_kwargs,
                                     refine_to=refine_to)
    solver = solver or make_solver(spec, **solver_kwargs)
    res = solver.solve(obj)
    if refine_to is not None:
        return _refined_route(solver, solver.compiled, obj, res, refine_to)
    return _route_from(solver, res, obj, certify)


def liquidate(
    spec: ProblemSpec,
    holdings: Sequence[float],
    numeraire: int,
    solver: Optional[AdmmSolver] = None,
    certify: bool = False,
    precondition: bool = False,
    refine_to: Optional[float] = None,
    **solver_kwargs,
) -> Route:
    """Liquidate `holdings` entirely into asset `numeraire`
    (``liquidation.py:57,77-80``).  ``refine_to``: see :func:`arbitrage`."""
    obj = Objective.liquidation(spec.n_assets, numeraire, holdings)
    if solver is None:
        solver_kwargs = _floor_options(solver_kwargs, refine_to)
    if precondition:
        _reject_solver_with_precondition(solver)
        return _solve_preconditioned(spec, obj, certify, solver_kwargs,
                                     refine_to=refine_to)
    solver = solver or make_solver(spec, **solver_kwargs)
    res = solver.solve(obj)
    if refine_to is not None:
        return _refined_route(solver, solver.compiled, obj, res, refine_to)
    return _route_from(solver, res, obj, certify)


def route(
    spec: ProblemSpec,
    objective,
    solver: Optional[AdmmSolver] = None,
    certify: bool = False,
    precondition: bool = False,
    refine_to: Optional[float] = None,
    **solver_kwargs,
) -> Route:
    """Generic routing: maximize any :class:`Objective` (linear + box) or
    :class:`ConcaveUtility` (separable concave atoms) over the network.

    This is the superset entry point — the reference's cvxpy layer accepts
    arbitrary concave utilities (SURVEY.md §0) even though its scripts only
    exercise linear ones; ``route`` exposes the same generality here.

    ``precondition=True`` solves in equilibrated per-asset units
    (``solver/precondition.py``) and returns results (and the optional
    certificate) in the ORIGINAL units — use it for production networks
    whose tokens live in mismatched base units.
    """
    if not isinstance(objective, (Objective, ConcaveUtility)):
        raise TypeError("objective must be an Objective or ConcaveUtility")
    if solver is None:
        solver_kwargs = _floor_options(solver_kwargs, refine_to)
    if precondition:
        _reject_solver_with_precondition(solver)
        return _solve_preconditioned(spec, objective, certify, solver_kwargs,
                                     refine_to=refine_to)
    solver = solver or make_solver(spec, **solver_kwargs)
    res = solver.solve(objective)
    if refine_to is not None:
        return _refined_route(solver, solver.compiled, objective, res, refine_to)
    return _route_from(solver, res, objective, certify)


def sweep(
    spec: ProblemSpec,
    give: int,
    receive: int,
    amounts: Sequence[float],
    solver: Optional[AdmmSolver] = None,
    certify: bool = False,
    refine_to: Optional[float] = None,
    **solver_kwargs,
) -> Sweep:
    """Trade-size sweep: u(t) = max psi[receive] s.t. psi >= -t e_give.

    One batched vmapped solve over the whole grid — the TPU-native
    counterpart of the serial loop at ``two-asset.py:40-91``.

    ``certify=True`` runs the rigorous f64 host certificate
    (``solver/certify.py``) at EVERY grid point using that point's dual
    prices from the one batched solve — the reference can only eyeball
    the 50 printed objectives (``two-asset.py:96-100``); here each point
    carries its own duality-gap bound.  The per-point certificate is
    ~30 ms at reference scale (the jitted f64 support-bound kernel is
    shape-cached across points), so even 1024-point sweeps certify in
    seconds.
    """
    if solver is None:
        solver_kwargs = _floor_options(solver_kwargs, refine_to)
    solver = solver or make_solver(spec, **solver_kwargs)
    n = spec.n_assets
    amounts = np.asarray(amounts, np.float64)
    T = len(amounts)

    c = np.zeros((T, n))
    c[:, receive] = 1.0
    lo = np.zeros((T, n))
    lo[:, give] = -amounts
    hi = np.full((T, n), np.finfo(np.float32).max / 4)

    res = solver.solve_batch(c, lo, hi)

    # per-pool net trades (k, T), reference's `all_values` (two-asset.py:93-94)
    dbat = {k: np.asarray(v) for k, v in res.deltas.items()}
    lbat = {k: np.asarray(v) for k, v in res.lambdas.items()}
    per_pool = [None] * solver.compiled.n_pools
    for name, b in solver.compiled.buckets.items():
        # batched slot-major: (T, K, m) -> per pool (k, T)
        for r, pid in enumerate(b.pool_ids):
            k = int(solver.compiled.widths[pid])
            per_pool[pid] = (lbat[name][:, :k, r] - dbat[name][:, :k, r]).T
    net = per_pool

    prices = np.array(res.prices)
    utilities = np.asarray(res.objective, np.float64).copy()
    iters_arr = np.array(res.iters)
    conv_arr = np.array(res.converged)
    certs = None
    if refine_to is not None:
        # BATCHED refinement + certification of the whole grid: one
        # vmapped delta-dual correction solve and ONE batched f64
        # certificate per pass cover all T points (round 5 -- replaces
        # the round-4 serial per-point loop; each point of the frontier
        # gets the same certified terminal accuracy the single solves
        # get, matching ECOS certifying each of the reference's 50
        # serial solves, two-asset.py:91)
        from .solver.admm import RouteResult as _RR
        from .solver.refine_device import refine_device, refine_sweep

        hi_cert = np.full((T, n), np.inf)
        out = refine_sweep(
            solver.compiled, c, lo, hi_cert, res, target_gap=refine_to,
        )
        certs = list(out.certificates)
        utilities[:] = out.objectives
        prices[:] = out.prices
        iters_arr[:] = iters_arr + out.iters
        conv_arr[:] = out.achieved
        for name, b in solver.compiled.buckets.items():
            D = out.deltas[name]  # (T, K, m)
            L = out.lambdas[name]
            for r, pid in enumerate(b.pool_ids):
                k = int(solver.compiled.widths[pid])
                per_pool[pid][:, :] = (L[:, :k, r] - D[:, :k, r]).T
        # rare stragglers (degenerate re-centers) fall back to the
        # per-point path
        for t in np.flatnonzero(~out.achieved):
            obj_t = Objective(c[t], lo=lo[t], hi=np.full(n, np.inf))
            point = _RR(
                objective=utilities[t],
                psi=np.zeros(n),  # refine_device recomputes from trades
                prices=prices[t],
                deltas={k_: v[t] for k_, v in out.deltas.items()},
                lambdas={k_: v[t] for k_, v in out.lambdas.items()},
                iters=iters_arr[t], r_norm=np.zeros(()),
                s_norm=np.zeros(()), converged=np.asarray(False),
                rho_final=np.asarray(res.rho_final)[t],
            )
            out_t = refine_device(
                solver.compiled, obj_t, point, target_gap=refine_to
            )
            certs[t] = out_t.certificate
            utilities[t] = float(out_t.certificate.objective)
            rp = out_t.result
            prices[t] = np.asarray(rp.prices)
            conv_arr[t] = bool(out_t.achieved)
            for name, b in solver.compiled.buckets.items():
                for r, pid in enumerate(b.pool_ids):
                    k = int(solver.compiled.widths[pid])
                    per_pool[pid][:, t] = (
                        np.asarray(rp.lambdas[name])[:k, r]
                        - np.asarray(rp.deltas[name])[:k, r]
                    )
    elif certify:
        # one batched f64 certificate pass over the whole grid (round 5;
        # was a serial per-point certify loop)
        from .solver.certify import certify_batch

        hi_cert = np.full((T, n), np.inf)
        certs = certify_batch(
            solver.compiled, c, lo, hi_cert,
            dbat, lbat, prices, psi_claimed=np.asarray(res.psi),
        )

    return Sweep(
        amounts=amounts,
        utilities=utilities,
        net_trades=net,
        iters=iters_arr,
        converged=conv_arr,
        prices=prices,
        certificates=certs,
    )
