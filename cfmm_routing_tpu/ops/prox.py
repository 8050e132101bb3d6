"""Closed-form psi-prox: the consensus z-update of the ADMM.

The z-update  argmin_z G(psi(z)) + (rho/2)||z - v||^2  over all edge copies
reduces exactly (see solver/admm.py docstring for the derivation) to an
n-vector problem

    psi* = argmin_psi  -c^T psi + I_box(psi) + (rho/4) sum_j (psi_j - s_j)^2 / d_j

with s = scatter-added edge values and d = per-asset degree.  Because the
quadratic is diagonal, the solution is "shift then clip":

    psi_j = clip(s_j + (2/rho) d_j c_j, lo_j, hi_j)

This covers all three reference objectives (``arbitrage.py:57,77``,
``liquidation.py:57,77-80``, ``two-asset.py:66,86``) — linear utility with
a box (equalities = degenerate box).  Assets touched by no pool (d_j = 0)
are pinned to psi_j = 0.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["psi_prox"]


def psi_prox(s, degree, c, lo, hi, rho):
    """Solve the weighted prox above.  All args (n,) except scalar rho.

    Returns (psi, mu) where mu_j = (psi_j - s_j) / (2 d_j) is the per-asset
    consensus multiplier (the scaled dual price update).
    """
    d_safe = jnp.maximum(degree, 1.0)
    psi = s + (2.0 / rho) * d_safe * c
    psi = jnp.clip(psi, lo, hi)
    psi = jnp.where(degree > 0, psi, 0.0)
    mu = (psi - s) / (2.0 * d_safe)
    mu = jnp.where(degree > 0, mu, 0.0)
    return psi, mu
