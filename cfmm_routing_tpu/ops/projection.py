"""Batched Euclidean projection onto CFMM trading sets (jnp reference path).

This module is the mathematical core of the solver — the TPU-native
replacement for the ECOS interior-point iterations hidden behind the
reference's ``prob.solve()`` (``/root/reference/arbitrage.py:82``).

Projection problem (per pool, batched over a slot-major (K, m) bucket —
pools ride the 128-lane axis, slots the sublane axis):

    minimize_{D, L}  ||D - p||^2 + ||L - q||^2
    s.t.             D >= 0,  L >= 0,
                     phi(R + gamma*D - L) >= phi(R)
                     [x := R + gamma*D - L >= 0   if the pool needs a floor]

KKT structure (mu >= 0 the phi-constraint multiplier, g = grad phi >= 0):

    D_j = relu(p_j + gamma * theta_j)
    L_j = relu(q_j - theta_j)            with  theta_j = mu * g_j (+ floor sigma_j)

For phi = weighted geo-mean, on the active manifold g_j = w_j k0/(x_j+s_j),
so for fixed mu each coordinate solves a scalar hyperbolic fixed point with
a CLOSED-FORM solution (a 4-region piecewise quadratic — `_inner_gm`).
For phi = sum, g = 1 and the coordinate maps are piecewise linear.
The only iteration is a 1-D monotone root-find in mu, done as fixed-trip
bisection + regula-falsi polish — branch-free, identical trip count across
the whole bucket, pure VPU work.  The Pallas kernel
(`projection_pallas.py`) runs the identical math with the whole root-find
fused in VMEM.

Shapes: p, q, R, w, s, mask: (K, m);  gamma, logk0, k0: (m,);  out: (K, m).
All functions are dtype-polymorphic (f32 on TPU, f64 for certification
tests on CPU).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["project_gm", "project_cs", "ProjectionConfig"]


class ProjectionConfig(NamedTuple):
    n_bisect: int = 48
    n_polish: int = 6


def _stable_quad_root(a, c):
    """Positive root of xi^2 - a*xi - c = 0 (c >= 0), cancellation-safe."""
    sq = jnp.sqrt(a * a + 4.0 * c)
    pos = 0.5 * (a + sq)
    neg = (2.0 * c) / jnp.maximum(sq - a, jnp.finfo(a.dtype).tiny)
    return jnp.where(a > 0, pos, neg)


def _xi_of_theta(p, q, Rp, gamma, theta):
    """xi(theta) = Rp + gamma*relu(p + gamma*theta) - relu(q - theta).

    The (shifted) post-trade reserve as a function of the per-coordinate
    multiplier theta.  Piecewise linear and nondecreasing in theta.
    """
    return Rp + gamma * jax.nn.relu(p + gamma * theta) - jax.nn.relu(q - theta)


def _inner_gm(p, q, Rp, gamma, t):
    """Solve xi = xi_of_theta(theta), theta = t / xi  (t >= 0) in closed form.

    Returns xi > 0 (for t > 0).  Exactly one clip-region is consistent; we
    find it by bracketing the root of G(theta) = theta*xi(theta) - t at the
    clip breakpoints, then apply that region's quadratic formula:
      A: both active   xi = Rp + gamma*p - q + (1+g^2) t/xi
      B: L clipped     xi = Rp + gamma*p     + g^2     t/xi
      C: D clipped     xi = Rp - q           +         t/xi
      D: both clipped  xi = Rp
    """
    tiny = jnp.finfo(p.dtype).tiny

    def G(theta):
        return theta * _xi_of_theta(p, q, Rp, gamma, theta) - t

    th1 = jax.nn.relu(-p / gamma)  # D clips below this theta
    th2 = jax.nn.relu(q)  # L clips above this theta
    b1 = jnp.minimum(th1, th2)
    b2 = jnp.maximum(th1, th2)
    in_r1 = G(b1) >= 0
    in_r2 = jnp.logical_and(~in_r1, G(b2) >= 0)
    rep = jnp.where(in_r1, 0.5 * b1, jnp.where(in_r2, 0.5 * (b1 + b2), b2 + 1.0))

    dclip = (p + gamma * rep) < 0
    lclip = (q - rep) < 0
    a = jnp.where(
        dclip,
        jnp.where(lclip, Rp, Rp - q),
        jnp.where(lclip, Rp + gamma * p, Rp + gamma * p - q),
    )
    bb = jnp.where(
        dclip,
        jnp.where(lclip, 0.0, 1.0),
        jnp.where(lclip, gamma * gamma, 1.0 + gamma * gamma),
    )
    xi = _stable_quad_root(a, bb * t)
    # t == 0: theta = 0 exactly -> direct evaluation (the quadratic form is
    # wrong there for a < 0)
    xi0 = _xi_of_theta(p, q, Rp, gamma, jnp.zeros_like(p))
    return jnp.where(t > tiny, xi, xi0)


def _solve_theta_linear(p, q, Rp, gamma, target):
    """Smallest theta with xi_of_theta(theta) == target (piecewise linear).

    Used for reserve-floor clamps: drive the post-trade reserve to the
    floor.  Assumes a root exists (xi(+inf) = +inf).
    """
    g2 = gamma * gamma
    th1 = jax.nn.relu(-p / gamma)
    th2 = jax.nn.relu(q)
    b1 = jnp.minimum(th1, th2)
    b2 = jnp.maximum(th1, th2)
    in_r1 = _xi_of_theta(p, q, Rp, gamma, b1) >= target
    in_r2 = jnp.logical_and(~in_r1, _xi_of_theta(p, q, Rp, gamma, b2) >= target)
    rep = jnp.where(in_r1, 0.5 * b1, jnp.where(in_r2, 0.5 * (b1 + b2), b2 + 1.0))
    dclip = (p + gamma * rep) < 0
    lclip = (q - rep) < 0
    thA = (target - Rp - gamma * p + q) / (1.0 + g2)
    thB = (target - Rp - gamma * p) / g2
    thC = target - Rp + q
    thD = 0.5 * (th1 + th2)  # flat region: D = L = 0 regardless of theta
    th = jnp.where(dclip, jnp.where(lclip, thD, thC), jnp.where(lclip, thB, thA))
    return jax.nn.relu(th)


def _dl_from_theta(p, q, gamma, theta):
    return jax.nn.relu(p + gamma * theta), jax.nn.relu(q - theta)


def _eval_gm(mu, p, q, Rp, gamma, w, k0, mask, s, needs_floor):
    """Coordinate solve at multiplier mu (m,); returns (D, L, xi, h).

    h(mu) = sum_slots w * log xi - log k0, monotone nondecreasing in mu.
    """
    t = mu[None, :] * w * k0[None, :]
    xi = _inner_gm(p, q, Rp, gamma, t)
    theta = t / jnp.maximum(xi, jnp.finfo(p.dtype).tiny)
    if needs_floor:
        clamped = xi < s
        thf = _solve_theta_linear(p, q, Rp, gamma, s)
        theta = jnp.where(clamped, jnp.maximum(thf, theta), theta)
        xi = jnp.where(clamped, s, xi)
    D, L = _dl_from_theta(p, q, gamma, theta)
    D = D * mask
    L = L * mask
    logxi = jnp.log(jnp.maximum(xi, 1e-300 if xi.dtype == jnp.float64 else 1e-30))
    h = jnp.sum(w * logxi, axis=0)
    return D, L, xi, h


def _eval_cs(mu, p, q, R, gamma, w, mask, k0):
    """Weighted constant-sum coordinate solve: theta_j = mu * q_j.

    phi(x) = sum_j q_j x_j (the ``w`` plane holds the raw coefficients
    q_j; 1.0 on uniform pools, 0 on padding), so grad phi = q and the KKT
    multiplier enters each coordinate as theta_j = mu q_j.
    h(mu) = sum_slots q_j x_j, monotone nondecreasing in mu.  The reserve
    floor x >= 0 (reference ``arbitrage.py:74``) is clamped in closed form.
    """
    theta = mu[None, :] * w
    D, L = _dl_from_theta(p, q, gamma, theta)
    x = R + gamma * D - L
    clamped = x < 0
    thf = _solve_theta_linear(p, q, R, gamma, jnp.zeros_like(R))
    theta = jnp.where(clamped, jnp.maximum(thf, theta), theta)
    D, L = _dl_from_theta(p, q, gamma, theta)
    D = D * mask
    L = L * mask
    x = jnp.maximum(R + gamma * D - L, 0.0) * mask
    h = jnp.sum(w * x, axis=0)
    return D, L, x, h


def _root_find(h_of_mu, mu_hi, h_target, cfg: ProjectionConfig, dtype):
    """Bisection + regula-falsi phases on monotone h(mu) = h_target.

    Returns mu on the feasible side (h >= target).  mu_hi must bracket.
    A single while_loop with a *dynamic* trip count: XLA would fully unroll
    a static-bound loop here, exploding compile time ~3x for zero runtime
    benefit (the body is pure VPU arithmetic either way).
    """
    zero = jnp.zeros_like(mu_hi)
    h0 = h_of_mu(zero)
    feasible0 = h0 >= h_target
    lo = zero
    hi = jnp.where(feasible0, zero, mu_hi)
    hlo = h0
    hhi = h_of_mu(hi)
    n_bisect = jnp.asarray(cfg.n_bisect, jnp.int32)
    n_total = jnp.asarray(cfg.n_bisect + cfg.n_polish, jnp.int32)

    def step(st):
        i, lo, hi, hlo, hhi = st
        denom = hhi - hlo
        falsi_frac = jnp.where(
            jnp.abs(denom) > jnp.finfo(dtype).tiny,
            (h_target - hlo) / denom,
            jnp.full_like(denom, 0.5),
        )
        frac = jnp.where(i < n_bisect, 0.5, jnp.clip(falsi_frac, 0.05, 0.95))
        mid = lo + frac * (hi - lo)
        hm = h_of_mu(mid)
        going_up = hm < h_target
        return (
            i + 1,
            jnp.where(going_up, mid, lo),
            jnp.where(going_up, hi, mid),
            jnp.where(going_up, hm, hlo),
            jnp.where(going_up, hhi, hm),
        )

    _, lo, hi, hlo, hhi = jax.lax.while_loop(
        lambda st: st[0] < n_total, step, (jnp.int32(0), lo, hi, hlo, hhi)
    )
    return jnp.where(feasible0, zero, hi)


def gm_mu_bracket(p, q, R, w, s, gamma, k0, mask, dtype):
    """Upper bracket for the gm multiplier: big enough that every L clips
    to 0, hence xi >= Rp and h >= log k0.  Sufficient per slot:
    t >= max(2 q+ (Rp + gamma p+), 4 q+^2 gamma^2)."""
    Rp = R + s
    qp = jax.nn.relu(q) + 1e-3
    need_t = jnp.maximum(
        2.0 * qp * (Rp + gamma * jax.nn.relu(p)), 4.0 * qp * qp * gamma * gamma
    )
    w_safe = jnp.where(mask > 0, w, 1.0)
    return (
        4.0
        * jnp.max(
            jnp.where(
                mask > 0,
                need_t / (w_safe * jnp.maximum(k0[None, :], jnp.finfo(dtype).tiny)),
                0.0,
            ),
            axis=0,
        )
        + 1.0
    )


@functools.partial(jax.jit, static_argnames=("needs_floor", "cfg"))
def project_gm(
    p, q, R, w, s, gamma, logk0, k0, mask,
    needs_floor: bool = False,
    cfg: ProjectionConfig = ProjectionConfig(),
):
    """Project (p, q) onto geo-mean trading sets.  Slot-major shapes:
    p/q/R/w/s/mask (K, m); gamma/logk0/k0 (m,).  Returns (D, L) (K, m)."""
    Rp = R + s
    dtype = p.dtype

    def h_of_mu(mu):
        return _eval_gm(mu, p, q, Rp, gamma, w, k0, mask, s, needs_floor)[3]

    mu_hi = gm_mu_bracket(p, q, R, w, s, gamma, k0, mask, dtype)
    mu = _root_find(h_of_mu, mu_hi, logk0, cfg, dtype)
    D, L, _, _ = _eval_gm(mu, p, q, Rp, gamma, w, k0, mask, s, needs_floor)
    return D, L


@functools.partial(jax.jit, static_argnames=("cfg",))
def project_cs(
    p, q, R, gamma, w, k0, mask,
    cfg: ProjectionConfig = ProjectionConfig(),
):
    """Project (p, q) onto (weighted) constant-sum trading sets (with
    reserve floor).  ``w`` holds the linear coefficients q_j (1.0 uniform).
    Slot-major shapes as in :func:`project_gm`.  Returns (D, L) (K, m)."""
    dtype = p.dtype

    def h_of_mu(mu):
        return _eval_cs(mu, p, q, R, gamma, w, mask, k0)[3]

    # theta_j = mu q_j >= max(q) clips every L to 0 -> x >= R slotwise
    # -> sum q x >= sum q R = k0
    w_safe = jnp.where(mask > 0, w, 1.0)
    mu_hi = jnp.max(jax.nn.relu(q) * mask / w_safe, axis=0) + 1.0
    mu = _root_find(h_of_mu, mu_hi, k0, cfg, dtype)
    D, L, _, _ = _eval_cs(mu, p, q, R, gamma, w, mask, k0)
    return D, L
