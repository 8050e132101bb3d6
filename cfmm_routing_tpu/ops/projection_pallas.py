"""Pallas TPU kernels for the batched trading-set projection.

Same mathematics as ``ops/projection.py`` (the jnp reference path — see
its docstring for the KKT derivation), but the entire monotone root-find
runs fused in VMEM: one kernel launch per bucket loads a tile of pools
once from HBM, iterates ~50 bisection/regula-falsi steps entirely on-chip,
and writes (D, L) back.  The jnp path instead round-trips HBM on every
root-find step, which is why it is bandwidth-bound.

Layout: each pool-slot channel c < K is a separate (m,) vector viewed as
(m/128, 128) — fully dense (8, 128) f32 tiling, 100% lane AND sublane
occupancy regardless of K (a (K, m) block with K=2 would waste 3/4 of
every sublane group).  The K-way reductions (h, mu broadcast) are
unrolled Python sums over the channel list.

Equivalence with the jnp path is tested to ~1e-6 in
``tests/test_pallas.py`` (interpret mode on CPU, compiled on TPU).
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .projection import ProjectionConfig

__all__ = ["project_gm_pallas", "project_cs_pallas", "PALLAS_TILE"]

PALLAS_TILE = 2048  # pools per grid step; (TILE/128, 128) f32 blocks
_LANES = 128


def _relu(x):
    return jnp.maximum(x, 0.0)


def _stable_quad_root(a, c):
    sq = jnp.sqrt(a * a + 4.0 * c)
    pos = 0.5 * (a + sq)
    neg = (2.0 * c) / jnp.maximum(sq - a, jnp.float32(1e-30))
    return jnp.where(a > 0, pos, neg)


def _xi_of_theta(p, q, Rp, gamma, theta):
    return Rp + gamma * _relu(p + gamma * theta) - _relu(q - theta)


def _inner_gm(p, q, Rp, gamma, t):
    """Closed-form per-slot hyperbolic solve (see projection._inner_gm)."""
    th1 = _relu(-p / gamma)
    th2 = _relu(q)
    b1 = jnp.minimum(th1, th2)
    b2 = jnp.maximum(th1, th2)
    G1 = b1 * _xi_of_theta(p, q, Rp, gamma, b1) - t
    G2 = b2 * _xi_of_theta(p, q, Rp, gamma, b2) - t
    in_r1 = G1 >= 0
    in_r2 = jnp.logical_and(~in_r1, G2 >= 0)
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
    xi0 = _xi_of_theta(p, q, Rp, gamma, jnp.zeros_like(p))
    return jnp.where(t > jnp.float32(1e-37), xi, xi0)


def _solve_theta_linear(p, q, Rp, gamma, target):
    g2 = gamma * gamma
    th1 = _relu(-p / gamma)
    th2 = _relu(q)
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
    thD = 0.5 * (th1 + th2)
    th = jnp.where(dclip, jnp.where(lclip, thD, thC), jnp.where(lclip, thB, thA))
    return _relu(th)


def _eval_gm_channels(mu, ch, gamma, k0, needs_floor):
    """Evaluate all K channels at multiplier mu; return (D, L, h)."""
    h = None
    Ds, Ls = [], []
    for (p, q, Rp, w, s, mask) in ch:
        t = mu * w * k0
        xi = _inner_gm(p, q, Rp, gamma, t)
        theta = t / jnp.maximum(xi, jnp.float32(1e-30))
        if needs_floor:
            clamped = xi < s
            thf = _solve_theta_linear(p, q, Rp, gamma, s)
            theta = jnp.where(clamped, jnp.maximum(thf, theta), theta)
            xi = jnp.where(clamped, s, xi)
        D = _relu(p + gamma * theta) * mask
        L = _relu(q - theta) * mask
        term = w * jnp.log(jnp.maximum(xi, jnp.float32(1e-30)))
        h = term if h is None else h + term
        Ds.append(D)
        Ls.append(L)
    return Ds, Ls, h


def _eval_cs_channels(mu, ch, gamma, k0):
    """Weighted constant-sum: theta_j = mu * q_j with q the raw linear
    coefficients in the ``w`` plane; h = sum_j q_j x_j (projection._eval_cs)."""
    h = None
    Ds, Ls = [], []
    for (p, q, R, w, s, mask) in ch:
        theta = mu * w
        D = _relu(p + gamma * theta)
        L = _relu(q - theta)
        x = R + gamma * D - L
        clamped = x < 0
        thf = _solve_theta_linear(p, q, R, gamma, jnp.zeros_like(R))
        theta = jnp.where(clamped, jnp.maximum(thf, theta), theta)
        D = _relu(p + gamma * theta) * mask
        L = _relu(q - theta) * mask
        x = jnp.maximum(R + gamma * D - L, 0.0) * mask
        term = w * x
        h = term if h is None else h + term
        Ds.append(D)
        Ls.append(L)
    return Ds, Ls, h


def _root_find_body(h_of_mu, mu_hi, h_target, cfg: ProjectionConfig):
    zero = jnp.zeros_like(mu_hi)
    h0 = h_of_mu(zero)
    feasible0 = h0 >= h_target
    lo = zero
    hi = jnp.where(feasible0, zero, mu_hi)
    hlo = h0
    hhi = h_of_mu(hi)
    n_bisect = jnp.int32(cfg.n_bisect)
    n_total = jnp.int32(cfg.n_bisect + cfg.n_polish)

    def step(st):
        i, lo, hi, hlo, hhi = st
        denom = hhi - hlo
        falsi_frac = jnp.where(
            jnp.abs(denom) > jnp.float32(1e-30),
            (h_target - hlo) / denom,
            jnp.full_like(denom, 0.5),
        )
        frac = jnp.where(i < n_bisect, 0.5, jnp.clip(falsi_frac, 0.05, 0.95))
        mid = lo + frac * (hi - lo)
        hm = h_of_mu(mid)
        up = hm < h_target
        return (
            i + 1,
            jnp.where(up, mid, lo),
            jnp.where(up, hi, mid),
            jnp.where(up, hm, hlo),
            jnp.where(up, hhi, hm),
        )

    _, lo, hi, hlo, hhi = jax.lax.while_loop(
        lambda st: st[0] < n_total, step, (jnp.int32(0), lo, hi, hlo, hhi)
    )
    return jnp.where(feasible0, zero, hi)


def _gm_kernel(K: int, needs_floor: bool, cfg: ProjectionConfig, refs):
    """refs: [p_0..p_{K-1}, q_*, R_*, w_*, s_*, mask_*, gamma, logk0, k0,
    D_0..D_{K-1}, L_0..L_{K-1}]"""
    nin = 6 * K + 3
    ins, outs = refs[:nin], refs[nin:]
    P = [ins[c][:] for c in range(K)]
    Q = [ins[K + c][:] for c in range(K)]
    R = [ins[2 * K + c][:] for c in range(K)]
    W = [ins[3 * K + c][:] for c in range(K)]
    S = [ins[4 * K + c][:] for c in range(K)]
    M = [ins[5 * K + c][:] for c in range(K)]
    gamma = ins[6 * K][:]
    logk0 = ins[6 * K + 1][:]
    k0 = ins[6 * K + 2][:]

    ch = [(P[c], Q[c], R[c] + S[c], W[c], S[c], M[c]) for c in range(K)]

    # bracket (see projection.gm_mu_bracket)
    mu_hi = None
    for (p, q, Rp, w, s, mask) in ch:
        qp = _relu(q) + 1e-3
        need_t = jnp.maximum(
            2.0 * qp * (Rp + gamma * _relu(p)), 4.0 * qp * qp * gamma * gamma
        )
        w_safe = jnp.where(mask > 0, w, 1.0)
        cand = jnp.where(mask > 0, need_t / (w_safe * jnp.maximum(k0, 1e-30)), 0.0)
        mu_hi = cand if mu_hi is None else jnp.maximum(mu_hi, cand)
    mu_hi = 4.0 * mu_hi + 1.0

    def h_of_mu(mu):
        return _eval_gm_channels(mu, ch, gamma, k0, needs_floor)[2]

    mu = _root_find_body(h_of_mu, mu_hi, logk0, cfg)
    Ds, Ls, _ = _eval_gm_channels(mu, ch, gamma, k0, needs_floor)
    for c in range(K):
        outs[c][:] = Ds[c]
        outs[K + c][:] = Ls[c]


def _cs_kernel(K: int, cfg: ProjectionConfig, refs):
    nin = 6 * K + 3
    ins, outs = refs[:nin], refs[nin:]
    P = [ins[c][:] for c in range(K)]
    Q = [ins[K + c][:] for c in range(K)]
    R = [ins[2 * K + c][:] for c in range(K)]
    W = [ins[3 * K + c][:] for c in range(K)]
    S = [ins[4 * K + c][:] for c in range(K)]
    M = [ins[5 * K + c][:] for c in range(K)]
    gamma = ins[6 * K][:]
    k0 = ins[6 * K + 2][:]

    ch = [(P[c], Q[c], R[c], W[c], S[c], M[c]) for c in range(K)]

    mu_hi = None
    for (p, q, R_, w, s, mask) in ch:
        w_safe = jnp.where(mask > 0, w, 1.0)
        cand = _relu(q) * mask / w_safe
        mu_hi = cand if mu_hi is None else jnp.maximum(mu_hi, cand)
    mu_hi = mu_hi + 1.0

    def h_of_mu(mu):
        return _eval_cs_channels(mu, ch, gamma, k0)[2]

    mu = _root_find_body(h_of_mu, mu_hi, k0, cfg)
    Ds, Ls, _ = _eval_cs_channels(mu, ch, gamma, k0)
    for c in range(K):
        outs[c][:] = Ds[c]
        outs[K + c][:] = Ls[c]


def _pallas_project(
    kind: str, p, q, R, w, s, gamma, logk0, k0, mask,
    needs_floor: bool, cfg: ProjectionConfig, tile: int, interpret: bool,
):
    """Common driver: split (K, m) arrays into channel views and launch."""
    K, m = p.shape
    assert m % _LANES == 0, f"pool count {m} must be a multiple of {_LANES}"
    rows = m // _LANES
    tile_rows = min(tile // _LANES, rows)
    # grid must divide: caller guarantees m % tile == 0 or tile >= m
    while rows % tile_rows != 0:
        tile_rows //= 2
    grid = (rows // tile_rows,)

    def chan(a):  # (m,) -> (rows, 128)
        return a.reshape(rows, _LANES)

    inputs = []
    for arr in (p, q, R, w, s, mask):
        inputs.extend(chan(arr[c]) for c in range(K))
    inputs.extend([chan(gamma), chan(logk0), chan(k0)])

    block = pl.BlockSpec(
        (tile_rows, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    n_in = len(inputs)
    kernel = functools.partial(
        _gm_kernel if kind == "gm" else _cs_kernel,
        *((K, needs_floor, cfg) if kind == "gm" else (K, cfg)),
    )

    def kfn(*refs):
        kernel(refs)

    out = pl.pallas_call(
        kfn,
        out_shape=[jax.ShapeDtypeStruct((rows, _LANES), p.dtype)] * (2 * K),
        grid=grid,
        in_specs=[block] * n_in,
        out_specs=[block] * (2 * K),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=60 * (cfg.n_bisect + cfg.n_polish) * K * m,
            bytes_accessed=4 * m * (6 * K + 3 + 2 * K),
            transcendentals=(cfg.n_bisect + cfg.n_polish + 2) * K * m,
        ),
    )(*inputs)
    D = jnp.stack([out[c].reshape(m) for c in range(K)])
    L = jnp.stack([out[K + c].reshape(m) for c in range(K)])
    return D, L


def project_gm_pallas(
    p, q, R, w, s, gamma, logk0, k0, mask,
    needs_floor: bool = False,
    cfg: ProjectionConfig = ProjectionConfig(),
    tile: int = PALLAS_TILE,
    interpret: bool = False,
):
    """Drop-in Pallas replacement for :func:`projection.project_gm`.

    gamma/logk0/k0 must be (m,) vectors (same as the jnp path)."""
    return _pallas_project(
        "gm", p, q, R, w, s, gamma, logk0, k0, mask, needs_floor, cfg, tile,
        interpret,
    )


def project_cs_pallas(
    p, q, R, gamma, w, k0, mask,
    cfg: ProjectionConfig = ProjectionConfig(),
    tile: int = PALLAS_TILE,
    interpret: bool = False,
):
    """Drop-in Pallas replacement for :func:`projection.project_cs`
    (``w``: the raw linear coefficients q_j; 1.0 for uniform pools)."""
    zeros = jnp.zeros_like(p)
    return _pallas_project(
        "cs", p, q, R, w, zeros, gamma, jnp.zeros_like(k0),
        k0, mask, True, cfg, tile, interpret,
    )
