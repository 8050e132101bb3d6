"""Tracing / profiling hooks (SURVEY.md §5 — absent in the reference).

Two tools:

* :func:`trace` — context manager around ``jax.profiler`` writing a
  TensorBoard-loadable device trace (kernel timeline, HBM traffic).
* :func:`time_phases` — per-phase wall-clock decomposition of one ADMM
  iteration (projection+broadcast / edge-reduction / psi-prox / z-update),
  each phase compiled standalone and timed in a loop.  This is the
  measurement harness behind the consensus-exchange design choices in
  ``solver/admm.py``.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict

import jax
import jax.numpy as jnp

__all__ = ["trace", "time_phases"]


@contextlib.contextmanager
def trace(logdir: str):
    """Device trace for TensorBoard:  with trace('/tmp/tb'): solver.solve(...)"""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _time(fn, args, iters, inner):
    g = jax.jit(lambda *a: jax.lax.fori_loop(0, inner, lambda i, s: fn(*s), a))
    out = jax.block_until_ready(g(*args))
    t0 = time.perf_counter()
    out = jax.block_until_ready(g(*args))
    return (time.perf_counter() - t0) / inner


def time_phases(solver, objective, iters: int = 1, inner: int = 20) -> Dict[str, float]:
    """Per-phase seconds/iteration for one problem (device-resident loops)."""
    import numpy as np

    dtype = solver.dtype
    n = solver.n
    c = jnp.asarray(objective.c, dtype)
    lo = jnp.asarray(np.maximum(objective.lo, -3e38), dtype)
    hi = jnp.asarray(np.minimum(objective.hi, 3e38), dtype)
    z = {
        name: (
            jnp.zeros(arrs["mask"].shape, dtype),
            jnp.zeros(arrs["mask"].shape, dtype),
        )
        for name, arrs in solver.buckets.items()
    }
    nu = jnp.zeros((n,), dtype)
    rho = jnp.asarray(solver.options.rho, dtype)

    out: Dict[str, float] = {}

    def proj(z, nu):
        zn = {}
        for name, arrs in solver.buckets.items():
            nu_e = solver._bcast_nu(nu, name)
            zD, zL = z[name]
            D, L = solver._project(name, arrs, zD - nu_e, zL + nu_e)
            zn[name] = (D, L)
        return zn, nu + jnp.float32(0)

    out["project+bcast"] = _time(proj, (z, nu), iters, inner)

    def reduce_(z, nu):
        y = jnp.zeros((n,), dtype)
        for name in solver.buckets:
            zD, zL = z[name]
            y = y + solver._reduce_edges(zL - zD, name)
        return z, nu + y

    out["edge-reduce"] = _time(reduce_, (z, nu), iters, inner)

    from ..ops.prox import psi_prox

    def prox(s, nu):
        psi, mu = psi_prox(s + nu * 0, solver.degree, c, lo, hi, rho)
        return psi, mu

    out["psi-prox"] = _time(prox, (nu, nu), iters, inner)

    def full(z, nu):
        z, nu, _, _, _ = solver._iterate(z, nu, rho, c, lo, hi)
        return z, nu

    out["full-iteration"] = _time(full, (z, nu), iters, inner)
    return out
