"""Projection kernels vs. scipy ground-truth QP/NLP projections.

Strategy per SURVEY.md §4(1): every projection kernel is unit-tested
against an independent scipy solve of

    min ||D-p||^2 + ||L-q||^2  s.t. (D,L) in T_pool

over randomized pools and query points (feasible, infeasible, clipped).
"""
import numpy as np
import pytest
import scipy.optimize as sopt

import jax.numpy as jnp

from cfmm_routing_tpu.ops.projection import (
    ProjectionConfig,
    project_cs,
    project_gm,
)


def _scipy_project_gm(p, q, R, w, s, gamma, needs_floor):
    k = len(R)
    logk0 = float(np.sum(w * np.log(R + s)))

    def fun(x):
        return 0.5 * (np.sum((x[:k] - p) ** 2) + np.sum((x[k:] - q) ** 2))

    def jac(x):
        return np.concatenate([x[:k] - p, x[k:] - q])

    def phi(x):
        newR = R + s + gamma * x[:k] - x[k:]
        return np.sum(w * np.log(np.maximum(newR, 1e-300))) - logk0

    cons = [sopt.NonlinearConstraint(phi, 0.0, np.inf)]
    if needs_floor:
        A = np.zeros((k, 2 * k))
        for j in range(k):
            A[j, j] = gamma
            A[j, k + j] = -1.0
        cons.append(sopt.LinearConstraint(A, -R, np.inf))
    best = None
    for x0 in [np.full(2 * k, 0.1), np.concatenate([np.maximum(p, 0.01), np.maximum(q, 0.01)])]:
        r = sopt.minimize(
            fun, x0, jac=jac, method="SLSQP",
            bounds=sopt.Bounds(np.zeros(2 * k), np.full(2 * k, np.inf)),
            constraints=cons, options={"maxiter": 1000, "ftol": 1e-16},
        )
        if best is None or (r.fun < best.fun and r.status == 0):
            best = r
    return best.x[:k], best.x[k:]


def _scipy_project_cs(p, q, R, gamma, w=None):
    k = len(R)
    w = np.ones(k) if w is None else np.asarray(w)

    def fun(x):
        return 0.5 * (np.sum((x[:k] - p) ** 2) + np.sum((x[k:] - q) ** 2))

    def jac(x):
        return np.concatenate([x[:k] - p, x[k:] - q])

    row = np.concatenate([gamma * w, -w])
    A = np.zeros((k, 2 * k))
    for j in range(k):
        A[j, j] = gamma
        A[j, k + j] = -1.0
    cons = [
        sopt.LinearConstraint(row, 0.0, np.inf),
        sopt.LinearConstraint(A, -R, np.inf),
    ]
    r = sopt.minimize(
        fun, np.full(2 * k, 0.1), jac=jac, method="SLSQP",
        bounds=sopt.Bounds(np.zeros(2 * k), np.full(2 * k, np.inf)),
        constraints=cons, options={"maxiter": 1000, "ftol": 1e-16},
    )
    return r.x[:k], r.x[k:]


def _rand_points(rng, k, scale):
    """Query points spanning feasible / infeasible / sign-mixed regions."""
    return rng.uniform(-scale, scale, size=k), rng.uniform(-scale, scale, size=k)


CFG = ProjectionConfig(n_bisect=60, n_polish=8)


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("k", [2, 3, 4])
def test_project_gm_matches_scipy(seed, k):
    rng = np.random.default_rng(seed)
    R = rng.uniform(0.5, 50.0, size=k)
    w = rng.uniform(0.5, 4.0, size=k)
    w = w / w.sum()
    gamma = float(rng.uniform(0.9, 1.0))
    p, q = _rand_points(rng, k, 8.0)

    D_ref, L_ref = _scipy_project_gm(p, q, R, w, np.zeros(k), gamma, False)

    logk0 = float(np.sum(w * np.log(R)))
    D, L = project_gm(
        jnp.asarray(p)[:, None], jnp.asarray(q)[:, None],
        jnp.asarray(R)[:, None], jnp.asarray(w)[:, None], jnp.zeros((k, 1)),
        jnp.full((1,), gamma), jnp.asarray([logk0]),
        jnp.asarray([np.exp(logk0)]), jnp.ones((k, 1)),
        needs_floor=False, cfg=CFG,
    )
    np.testing.assert_allclose(np.asarray(D[:, 0]), D_ref, atol=5e-6)
    np.testing.assert_allclose(np.asarray(L[:, 0]), L_ref, atol=5e-6)


@pytest.mark.parametrize("seed", range(6))
def test_project_gm_shifted_floor(seed):
    """Bounded-liquidity (v3-style) pools: shifted phi + reserve floor."""
    k = 2
    rng = np.random.default_rng(100 + seed)
    R = rng.uniform(0.2, 5.0, size=k)
    s = rng.uniform(1.0, 20.0, size=k)
    w = np.full(k, 0.5)
    gamma = float(rng.uniform(0.9, 1.0))
    p, q = _rand_points(rng, k, 6.0)

    D_ref, L_ref = _scipy_project_gm(p, q, R, w, s, gamma, True)

    logk0 = float(np.sum(w * np.log(R + s)))
    D, L = project_gm(
        jnp.asarray(p)[:, None], jnp.asarray(q)[:, None],
        jnp.asarray(R)[:, None], jnp.asarray(w)[:, None], jnp.asarray(s)[:, None],
        jnp.full((1,), gamma), jnp.asarray([logk0]),
        jnp.asarray([np.exp(logk0)]), jnp.ones((k, 1)),
        needs_floor=True, cfg=CFG,
    )
    np.testing.assert_allclose(np.asarray(D[:, 0]), D_ref, atol=5e-6)
    np.testing.assert_allclose(np.asarray(L[:, 0]), L_ref, atol=5e-6)


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("k", [2, 4])
def test_project_cs_matches_scipy(seed, k):
    rng = np.random.default_rng(200 + seed)
    R = rng.uniform(0.5, 30.0, size=k)
    gamma = float(rng.uniform(0.9, 1.0))
    p, q = _rand_points(rng, k, 10.0)

    D_ref, L_ref = _scipy_project_cs(p, q, R, gamma)

    D, L = project_cs(
        jnp.asarray(p)[:, None], jnp.asarray(q)[:, None], jnp.asarray(R)[:, None],
        jnp.full((1,), gamma), jnp.ones((k, 1)), jnp.asarray([R.sum()]),
        jnp.ones((k, 1)), cfg=CFG,
    )
    np.testing.assert_allclose(np.asarray(D[:, 0]), D_ref, atol=5e-6)
    np.testing.assert_allclose(np.asarray(L[:, 0]), L_ref, atol=5e-6)


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize("k", [2, 3])
def test_project_cs_weighted_matches_scipy(seed, k):
    """Weighted constant-sum (phi = sum q_j x_j): the preconditioner's
    image of a uniform cs pool under per-asset rescaling."""
    rng = np.random.default_rng(300 + seed)
    R = rng.uniform(0.5, 30.0, size=k)
    w = rng.uniform(0.25, 4.0, size=k)
    gamma = float(rng.uniform(0.9, 1.0))
    p, q = _rand_points(rng, k, 10.0)

    D_ref, L_ref = _scipy_project_cs(p, q, R, gamma, w=w)

    D, L = project_cs(
        jnp.asarray(p)[:, None], jnp.asarray(q)[:, None], jnp.asarray(R)[:, None],
        jnp.full((1,), gamma), jnp.asarray(w)[:, None],
        jnp.asarray([float(w @ R)]), jnp.ones((k, 1)), cfg=CFG,
    )
    np.testing.assert_allclose(np.asarray(D[:, 0]), D_ref, atol=5e-6)
    np.testing.assert_allclose(np.asarray(L[:, 0]), L_ref, atol=5e-6)


def test_feasible_point_is_fixed():
    """Projection of an interior feasible point is the identity."""
    k = 2
    R = np.array([10.0, 10.0])
    w = np.full(k, 0.5)
    # small deposit-only trade is strictly feasible
    p = np.array([0.5, 0.3])
    q = np.array([0.1, 0.05])
    logk0 = float(np.sum(w * np.log(R)))
    D, L = project_gm(
        jnp.asarray(p)[:, None], jnp.asarray(q)[:, None],
        jnp.asarray(R)[:, None], jnp.asarray(w)[:, None], jnp.zeros((k, 1)),
        jnp.full((1,), 0.997), jnp.asarray([logk0]),
        jnp.asarray([np.exp(logk0)]), jnp.ones((k, 1)), cfg=CFG,
    )
    np.testing.assert_allclose(np.asarray(D[:, 0]), p, atol=1e-12)
    np.testing.assert_allclose(np.asarray(L[:, 0]), q, atol=1e-12)


def test_padding_slots_stay_zero():
    """Padded slots (w=0, p=q=0) must produce exactly zero trades."""
    R = np.array([[10.0, 10.0, 1.0, 1.0]]).T
    w = np.array([[0.5, 0.5, 0.0, 0.0]]).T
    mask = np.array([[1.0, 1.0, 0.0, 0.0]]).T
    p = np.array([[3.0, -8.0, 0.0, 0.0]]).T
    q = np.array([[1.0, 9.0, 0.0, 0.0]]).T
    logk0 = np.array([np.log(10.0)])
    D, L = project_gm(
        jnp.asarray(p), jnp.asarray(q), jnp.asarray(R), jnp.asarray(w),
        jnp.zeros((4, 1)), jnp.full((1,), 0.997), jnp.asarray(logk0),
        jnp.exp(jnp.asarray(logk0)), jnp.asarray(mask), cfg=CFG,
    )
    assert float(jnp.abs(D[2:, 0]).max()) == 0.0
    assert float(jnp.abs(L[2:, 0]).max()) == 0.0


def test_f32_projection_close_to_f64():
    rng = np.random.default_rng(7)
    k = 3
    R = rng.uniform(0.5, 20.0, size=(16, k))
    w = rng.uniform(0.5, 3.0, size=(16, k))
    w = w / w.sum(axis=1, keepdims=True)
    gamma = rng.uniform(0.95, 1.0, size=(16, 1))
    p = rng.uniform(-5, 5, size=(16, k))
    q = rng.uniform(-5, 5, size=(16, k))
    logk0 = np.sum(w * np.log(R), axis=1)

    raw = (p.T, q.T, R.T, w.T, np.zeros_like(R.T), gamma[:, 0], logk0, np.exp(logk0), np.ones_like(R.T))
    args64 = [jnp.asarray(a, jnp.float64) for a in raw]
    args32 = [jnp.asarray(a, jnp.float32) for a in raw]
    D64, L64 = project_gm(*args64, cfg=CFG)
    D32, L32 = project_gm(*args32, cfg=CFG)
    np.testing.assert_allclose(np.asarray(D32), np.asarray(D64), atol=5e-4)
    np.testing.assert_allclose(np.asarray(L32), np.asarray(L64), atol=5e-4)
