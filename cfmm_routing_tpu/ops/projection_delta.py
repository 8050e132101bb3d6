"""Batched Euclidean projection onto SHIFTED trading sets: the kernel of
device-resident mixed-precision refinement (``solver/refine_device.py``).

The reference certifies ~1e-8 inside ECOS's f64 interior-point solve
(``/root/reference/arbitrage.py:82``).  The TPU f32 solve floors at a
~1e-5 relative gap because every iteration evaluates the pool invariant
``phi(R + gamma*D - L) >= phi(R)`` at O(1)-sized reserves: f32 rounding
of the post-trade reserve caps the achievable constraint residual at
~1e-7 absolute, and the ADMM iterate inherits that noise floor.

This module projects onto the SAME trading set re-parametrized around a
base point (D0, L0) from a completed f32 solve:

    D = D0 + eps * a,   L = L0 + eps * b        (a, b the scaled deltas)

    S = { (a, b) :  a >= aD := -D0/eps,  b >= aL := -L0/eps,
          sum_j w_j log1p(v_j / X0_j) >= -sigma0 },
    v := gamma*a - b,   X0 := (R + s + gamma*D0 - L0)/eps,
    sigma0 := sum_j w_j log(x0_j) - log k0     (computed in f64 on host).

Identical set, exact reparametrization — but the constraint residual is
now built from ``log1p`` of O(eps)-relative quantities with NO
cancellation: f32 absolute precision on the deltas is eps * 1e-7, so one
refinement pass gains ~a factor eps of accuracy while running entirely
on device at f32 speed.

The projection math mirrors ``ops/projection.py`` exactly (same 4-region
closed-form coordinate solve, same monotone 1-D root-find in the
constraint multiplier) with two generalizations: per-slot LOWER BOUNDS
(aD, aL) replace the nonnegativity orthant, and the constraint level is
the log-domain slack -sigma0 instead of log k0.

Shapes (slot-major, pools on the 128-lane axis): p, q, X0, w, aD, aL,
sS, mask: (K, m); gamma, nsig (= -sigma0), tgt: (m,).  Outputs (K, m).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .projection import ProjectionConfig, _root_find, _stable_quad_root

__all__ = ["project_gm_delta", "project_cs_delta"]


def _ab_from_theta(p, q, gamma, theta, aD, aL):
    """Coordinate maps with general lower bounds: a = max(p + gamma*theta,
    aD), b = max(q - theta, aL) — the aD = aL = 0 case is projection.py's
    ``_dl_from_theta``."""
    return jnp.maximum(p + gamma * theta, aD), jnp.maximum(q - theta, aL)


def _v_of_theta(p, q, gamma, theta, aD, aL):
    """v(theta) = gamma*a(theta) - b(theta): piecewise linear and
    nondecreasing in theta (gamma > 0)."""
    a, b = _ab_from_theta(p, q, gamma, theta, aD, aL)
    return gamma * a - b


def _inner_gm_delta(p, q, X0, gamma, t, aD, aL):
    """Solve  xi = X0 + v(t / xi)  in closed form (t >= 0), xi := X0 + v.

    Mirror of projection.py's ``_inner_gm`` with general lower bounds.
    Exactly one clip-region is consistent; bracket the root of
    G(theta) = theta * (X0 + v(theta)) - t at the two breakpoints, then
    apply that region's quadratic:
      A: both free     xi = X0 + gamma*p - q   + (1+g^2) t/xi
      B: b clamped     xi = X0 + gamma*p - aL  + g^2     t/xi
      C: a clamped     xi = X0 + gamma*aD - q  +         t/xi
      D: both clamped  xi = X0 + gamma*aD - aL
    Returns (xi, theta) — callers rebuild v from theta via
    :func:`_ab_from_theta` (NOT from xi - X0: xi is O(X0)-sized and that
    difference would reintroduce the cancellation this module exists to
    avoid).
    """
    tiny = jnp.finfo(p.dtype).tiny

    def G(theta):
        return theta * (X0 + _v_of_theta(p, q, gamma, theta, aD, aL)) - t

    th1 = jax.nn.relu((aD - p) / gamma)  # a clips below this theta
    th2 = jax.nn.relu(q - aL)  # b clips above this theta
    b1 = jnp.minimum(th1, th2)
    b2 = jnp.maximum(th1, th2)
    in_r1 = G(b1) >= 0
    in_r2 = jnp.logical_and(~in_r1, G(b2) >= 0)
    rep = jnp.where(in_r1, 0.5 * b1, jnp.where(in_r2, 0.5 * (b1 + b2), b2 + 1.0))

    aclip = (p + gamma * rep) < aD
    bclip = (q - rep) < aL
    coef = jnp.where(
        aclip,
        jnp.where(bclip, X0 + gamma * aD - aL, X0 + gamma * aD - q),
        jnp.where(bclip, X0 + gamma * p - aL, X0 + gamma * p - q),
    )
    bb = jnp.where(
        aclip,
        jnp.where(bclip, 0.0, 1.0),
        jnp.where(bclip, gamma * gamma, 1.0 + gamma * gamma),
    )
    xi = _stable_quad_root(coef, bb * t)
    theta = t / jnp.maximum(xi, tiny)
    # t == 0 -> theta = 0 exactly (the quadratic form is wrong for coef < 0)
    xi0 = X0 + _v_of_theta(p, q, gamma, jnp.zeros_like(p), aD, aL)
    xi = jnp.where(t > tiny, xi, xi0)
    theta = jnp.where(t > tiny, theta, 0.0)
    return xi, theta


def _solve_theta_linear_delta(p, q, X0, gamma, target, aD, aL):
    """Smallest theta with X0 + v(theta) == target (piecewise linear) —
    the reserve-floor clamp (mirror of projection.py's
    ``_solve_theta_linear`` with general lower bounds)."""
    g2 = gamma * gamma
    th1 = jax.nn.relu((aD - p) / gamma)
    th2 = jax.nn.relu(q - aL)
    b1 = jnp.minimum(th1, th2)
    b2 = jnp.maximum(th1, th2)

    def xi_of(theta):
        return X0 + _v_of_theta(p, q, gamma, theta, aD, aL)

    in_r1 = xi_of(b1) >= target
    in_r2 = jnp.logical_and(~in_r1, xi_of(b2) >= target)
    rep = jnp.where(in_r1, 0.5 * b1, jnp.where(in_r2, 0.5 * (b1 + b2), b2 + 1.0))
    aclip = (p + gamma * rep) < aD
    bclip = (q - rep) < aL
    thA = (target - X0 - gamma * p + q) / (1.0 + g2)
    thB = (target - X0 - gamma * p + aL) / g2
    thC = target - X0 - gamma * aD + q
    thD = 0.5 * (th1 + th2)  # flat region: both clamped, xi constant
    th = jnp.where(aclip, jnp.where(bclip, thD, thC), jnp.where(bclip, thB, thA))
    return jax.nn.relu(th)


def _eval_gm_delta(mu, p, q, X0, gamma, w, aD, aL, mask, sS, needs_floor):
    """Coordinate solve at multiplier mu (m,); returns (a, b, h).

    h(mu) = sum_slots w * log1p(v / X0), monotone nondecreasing in mu.
    ``sS`` = shift/eps: the real-reserve floor x_real >= 0 reads
    xi >= sS in shifted-scaled units (exactly projection.py's clamp with
    s -> s/eps).  v is rebuilt from theta so h carries full delta-scale
    precision; padding slots (mask 0) contribute exactly 0.
    """
    t = mu[None, :] * w
    xi, theta = _inner_gm_delta(p, q, X0, gamma, t, aD, aL)
    if needs_floor:
        clamped = xi < sS
        thf = _solve_theta_linear_delta(p, q, X0, gamma, sS, aD, aL)
        theta = jnp.where(clamped, jnp.maximum(thf, theta), theta)
    a, b = _ab_from_theta(p, q, gamma, theta, aD, aL)
    a = jnp.where(mask > 0, a, 0.0)
    b = jnp.where(mask > 0, b, 0.0)
    v = gamma * a - b
    u = v / X0
    # log1p of an O(eps)-relative argument: no cancellation, full f32
    # absolute precision on the constraint residual
    h_slot = w * jnp.log1p(jnp.maximum(u, -0.999999))
    h = jnp.sum(jnp.where(mask > 0, h_slot, 0.0), axis=0)
    return a, b, h


def _gm_delta_bracket(p, q, X0, gamma, w, aD, aL, mask, nsig, dtype):
    """Upper bracket for the multiplier: a mu_hi with h(mu_hi) >= -sigma0.

    Per slot, theta >= theta_req guarantees (i) b clamps to aL and (ii)
    v >= v_req := X0 * (e^{max(nsig,0)} - 1) + margin, so every slot has
    w*log1p(v/X0) >= w*max(nsig, 0) and (gm weights sum to 1 per pool)
    h >= nsig.  Then t = 2 * theta_req * M with M >= xi(theta_req) makes
    G(theta_req) = theta_req*xi - t < 0, so the root lies above theta_req
    (G is increasing).  mu_hi = max_slots t / w.
    """
    margin = jnp.asarray(1e-3, dtype)
    vreq = X0 * jnp.expm1(jax.nn.relu(nsig))[None, :] + margin
    # v = gamma*a - b with b = aL: need gamma*(p + gamma*theta) >= vreq + aL
    th_v = (vreq + aL - gamma * p) / (gamma * gamma)
    th_req = jax.nn.relu(jnp.maximum(q - aL, th_v)) + margin
    a_at = jnp.maximum(p + gamma * th_req, aD)
    M = X0 + gamma * jnp.abs(a_at) + jnp.abs(aL) + 1.0
    t_req = 2.0 * th_req * M
    w_safe = jnp.where(mask > 0, w, 1.0)
    return jnp.max(jnp.where(mask > 0, t_req / w_safe, 0.0), axis=0) + 1.0


@functools.partial(jax.jit, static_argnames=("needs_floor", "cfg"))
def project_gm_delta(
    p, q, X0, w, sS, gamma, nsig, aD, aL, mask,
    needs_floor: bool = False,
    cfg: ProjectionConfig = ProjectionConfig(),
):
    """Project (p, q) onto shifted-scaled geo-mean trading sets.

    Slot-major shapes: p/q/X0/w/sS/aD/aL/mask (K, m); gamma/nsig (m,).
    ``nsig`` = -sigma0 = log k0 - sum w log x0 (the log-domain slack the
    delta trades must recover; negative when the base point has slack).
    Returns (a, b) (K, m) scaled delta trades.
    """
    dtype = p.dtype

    def h_of_mu(mu):
        return _eval_gm_delta(
            mu, p, q, X0, gamma, w, aD, aL, mask, sS, needs_floor
        )[2]

    mu_hi = _gm_delta_bracket(p, q, X0, gamma, w, aD, aL, mask, nsig, dtype)
    mu = _root_find(h_of_mu, mu_hi, nsig, cfg, dtype)
    a, b, _ = _eval_gm_delta(
        mu, p, q, X0, gamma, w, aD, aL, mask, sS, needs_floor
    )
    return a, b


def _eval_cs_delta(mu, p, q, X0, gamma, w, aD, aL, mask, needs_floor):
    """(Weighted) constant-sum coordinate solve: theta_j = mu * q_j.

    h(mu) = sum_slots q_j * v_j, monotone nondecreasing; the reserve
    floor x >= 0 reads v >= -X0 and is clamped in closed form."""
    theta = mu[None, :] * w
    if needs_floor:
        a, b = _ab_from_theta(p, q, gamma, theta, aD, aL)
        clamped = (X0 + gamma * a - b) < 0.0
        thf = _solve_theta_linear_delta(
            p, q, X0, gamma, jnp.zeros_like(X0), aD, aL
        )
        theta = jnp.where(clamped, jnp.maximum(thf, theta), theta)
    a, b = _ab_from_theta(p, q, gamma, theta, aD, aL)
    a = jnp.where(mask > 0, a, 0.0)
    b = jnp.where(mask > 0, b, 0.0)
    v = gamma * a - b
    h = jnp.sum(jnp.where(mask > 0, w * v, 0.0), axis=0)
    return a, b, h


@functools.partial(jax.jit, static_argnames=("needs_floor", "cfg"))
def project_cs_delta(
    p, q, X0, gamma, w, tgt, aD, aL, mask,
    needs_floor: bool = True,
    cfg: ProjectionConfig = ProjectionConfig(),
):
    """Project (p, q) onto shifted-scaled (weighted) constant-sum sets.

    Constraint: sum_j q_j v_j >= tgt (= -s0/eps, the scaled linear
    slack), v = gamma*a - b, plus the reserve floor X0 + v >= 0 and the
    per-slot lower bounds.  ``w`` holds the linear coefficients q_j.
    Returns (a, b) (K, m).
    """
    dtype = p.dtype

    def h_of_mu(mu):
        return _eval_cs_delta(
            mu, p, q, X0, gamma, w, aD, aL, mask, needs_floor
        )[2]

    # bracket: theta_req clamps every b to aL and pushes q*v above its
    # share of tgt (mirror of the gm bracket, linear h)
    margin = jnp.asarray(1e-3, dtype)
    w_safe = jnp.where(mask > 0, w, 1.0)
    vreq = jax.nn.relu(tgt)[None, :] / w_safe + margin
    th_v = (vreq + aL - gamma * p) / (gamma * gamma)
    th_req = jax.nn.relu(jnp.maximum(q - aL, th_v)) + margin
    mu_hi = jnp.max(jnp.where(mask > 0, th_req / w_safe, 0.0), axis=0) + 1.0
    mu = _root_find(h_of_mu, mu_hi, tgt, cfg, dtype)
    a, b, _ = _eval_cs_delta(mu, p, q, X0, gamma, w, aD, aL, mask, needs_floor)
    return a, b
