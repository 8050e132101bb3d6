"""Device-resident primal-side certificate gate.

Round 4's end-to-end clock at 100k pools was ~40% serial host
certificate passes (BENCH_GRID.md): each pass projected once on device,
transferred every (K, m) trade plane over the tunnel, and recomputed the
primal residuals in f64 on host — only to decide "not yet, keep
solving".  The rigorous criterion behind the reference
(``/root/reference/arbitrage.py:82``: ECOS's gap is a free by-product of
its iteration) needs the full f64 pass only when a candidate is about to
be ACCEPTED.

This module computes the entire primal side on device in the solve
dtype — one projection pass for exactly-feasible trades, the net trade,
the objective value, and every feasibility residual — and ships home a
handful of scalars plus the (n,) price vector.  The host then evaluates
only the prices-only dual bound (``certify.dual_bound``) to estimate the
gap.  When the solve runs equilibrated, the per-asset power-of-two
scales are fp-exact, so the gate evaluates everything directly in
ORIGINAL units; its only inexactness is f32 arithmetic itself (~1e-7
relative, plus ~degree*eps roundoff in the f32 net-trade reduction) —
orders of magnitude below the 1e-3..1e-4 in-loop gating thresholds.
The accepting certificate is ALWAYS the rigorous f64 host pass
(``certify.certify``); the gate only decides when to pay for it.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["GateEstimate", "DeviceGate"]


class GateEstimate(NamedTuple):
    """Host-side view of one gate evaluation (estimates, NOT a
    certificate — see module docstring)."""

    gap_rel: float
    feasibility_rel: float
    objective: float
    dual: float

    @property
    def score(self) -> float:
        return max(abs(self.gap_rel), self.feasibility_rel)


class DeviceGate:
    """Jitted primal-side residual program bound to one solver.

    ``objective`` is the ORIGINAL-units linear :class:`Objective`;
    ``d`` the equilibration scales (None = solve space == original
    space).  ``evaluate(z, nu, rho)`` returns device arrays immediately
    (dispatch is async — callers overlap the next solve chunk with the
    host-side read); ``finish`` turns them into a :class:`GateEstimate`
    using the f64 host dual bound.
    """

    def __init__(self, solver, compiled_orig, objective, d=None):
        self.solver = solver
        self.compiled_orig = compiled_orig
        self.objective = objective
        n = solver.n
        dt = solver.dtype
        d_host = np.ones(n) if d is None else np.asarray(d, np.float64)
        d_ext = np.concatenate([d_host, [1.0]])
        self._d = d_host
        self._dvec = jnp.asarray(d_host, dt)
        self._dplanes = {
            name: jnp.asarray(d_ext[b.asset].T, dt)
            for name, b in solver.compiled.buckets.items()
        }
        fmax = np.finfo(np.float32).max / 4
        self._c = jnp.asarray(np.asarray(objective.c, np.float64), dt)
        self._lo = jnp.asarray(np.maximum(objective.lo, -fmax), dt)
        self._hi = jnp.asarray(np.minimum(objective.hi, fmax), dt)
        self._fn = jax.jit(self._impl)

    def _impl(self, z, nu, rho):
        solver = self.solver
        dt = solver.dtype
        zero = jnp.zeros((), dt)
        phi = zero
        psi = jnp.zeros((solver.n,), dt)
        gross = jnp.zeros((solver.n,), dt)
        per_bucket = []
        for name, arrs in solver.buckets.items():
            kind, needs_floor = solver._meta[name]
            nu_e = solver._bcast_nu(nu, name)
            zD, zL = z[name]
            D, L = solver._project(name, arrs, zD - nu_e, zL + nu_e)
            ds = self._dplanes[name]
            mask = arrs["mask"]
            gamma = arrs["gamma"][None, :]
            x = arrs["R"] + gamma * D - L
            if kind == "gm":
                y = jnp.where(
                    mask > 0, jnp.maximum(x + arrs["s"], 1e-30), 1.0
                )
                h = jnp.sum(arrs["w"] * jnp.log(y), axis=0)
                phi = jnp.maximum(phi, jnp.max(arrs["logk0"] - h))
            else:
                tot = jnp.sum(
                    jnp.where(
                        mask > 0, arrs["w"] * jnp.maximum(x, 0.0), 0.0
                    ),
                    axis=0,
                )
                phi = jnp.maximum(
                    phi,
                    jnp.max(
                        (arrs["k0"] - tot) / jnp.maximum(arrs["k0"], 1.0)
                    ),
                )
            psi = psi + solver._reduce_edges((L - D) * mask, name)
            gross = gross + solver._reduce_edges(
                (jnp.abs(D) + jnp.abs(L)) * ds * mask, name
            )
            per_bucket.append((name, D, L, x, ds, mask, needs_floor))
        psi = solver._psum(psi)
        gross = solver._psum(gross)
        psi_orig = psi * self._dvec
        # per-asset row scales, mirroring certify(): violations judged
        # against the asset's OWN magnitude (|psi_j| or gross volume)
        scale = jnp.maximum(
            1.0, jnp.maximum(jnp.abs(psi_orig), gross)
        )
        box_a = jnp.maximum(
            jax.nn.relu(self._lo - psi_orig),
            jax.nn.relu(psi_orig - self._hi),
        )
        feas_abs_rel = jnp.max(box_a / scale)
        for name, D, L, x, ds, mask, needs_floor in per_bucket:
            se = solver._bcast_nu(scale, name)
            se = jnp.where(mask > 0, jnp.maximum(se, 1.0), 1.0)
            nneg_slot = jax.nn.relu(jnp.maximum(-D, -L)) * ds * mask
            feas_abs_rel = jnp.maximum(feas_abs_rel, jnp.max(nneg_slot / se))
            if needs_floor:
                floor_slot = jax.nn.relu(-x) * ds * mask
                feas_abs_rel = jnp.maximum(
                    feas_abs_rel, jnp.max(floor_slot / se)
                )
        obj = jnp.sum(self._c * psi_orig)
        psi_scale = jnp.max(jnp.abs(psi_orig))
        prices_orig = rho * nu / self._dvec
        return dict(
            phi=phi, feas_abs_rel=feas_abs_rel, obj=obj,
            psi_scale=psi_scale, prices=prices_orig,
        )

    def evaluate(self, z, nu, rho):
        """Dispatch the device program; returns the raw device outputs
        without blocking (overlap-friendly)."""
        return self._fn(z, nu, jnp.asarray(rho, self.solver.dtype))

    def finish(self, out) -> GateEstimate:
        """Blockingly read the device outputs and evaluate the host f64
        prices-only dual bound -> a :class:`GateEstimate`."""
        from .certify import dual_bound

        out = jax.device_get(out)  # one batched fetch (tunnel latency)
        prices = np.asarray(out["prices"], np.float64)
        # cheap eta-search depth: the gate only steers; a looser (still
        # rigorous) bound at ~half the host cost keeps the gate's host
        # half shorter than one device chunk (full overlap)
        dual = dual_bound(
            self.compiled_orig, self.objective, prices, evals=(8, 4)
        )
        obj = float(out["obj"])
        gap = dual - obj
        gap_rel = gap / max(1.0, abs(obj), abs(dual))
        feas_rel = max(float(out["phi"]), float(out["feas_abs_rel"]))
        return GateEstimate(
            gap_rel=gap_rel, feasibility_rel=feas_rel, objective=obj,
            dual=dual,
        )
