"""Pallas projection kernels vs. the jnp reference path.

The Pallas kernels (``ops/projection_pallas.py``) implement the identical
piecewise-closed-form + monotone-root-find math as ``ops/projection.py``,
fused in VMEM.  On CPU we run them in interpret mode and require agreement
with the jnp path to f32 roundoff; the compiled-on-TPU check lives in the
bench/driver path (same inputs, same assertion, real Mosaic lowering).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from cfmm_routing_tpu.ops.projection import (
    ProjectionConfig,
    project_cs,
    project_gm,
)
from cfmm_routing_tpu.ops.projection_pallas import (
    project_cs_pallas,
    project_gm_pallas,
)

CFG = ProjectionConfig(n_bisect=48, n_polish=6)
M = 256  # pools; must be a multiple of 128 lanes


def _gm_batch(seed, K, m=M, shifted=False):
    rng = np.random.default_rng(seed)
    R = rng.uniform(0.3, 40.0, size=(K, m))
    w = rng.uniform(0.5, 4.0, size=(K, m))
    mask = np.ones((K, m))
    # ~1/4 of pools use only 2 of the K slots (padding path)
    if K > 2:
        pad = rng.random(m) < 0.25
        mask[2:, pad] = 0.0
        w[2:, pad] = 0.0
        R[2:, pad] = 1.0
    w = w / np.maximum(w.sum(axis=0, keepdims=True), 1e-30)
    s = rng.uniform(0.5, 10.0, size=(K, m)) * mask if shifted else np.zeros((K, m))
    gamma = rng.uniform(0.9, 1.0, size=m)
    p = rng.uniform(-6, 6, size=(K, m)) * mask
    q = rng.uniform(-6, 6, size=(K, m)) * mask
    logk0 = np.sum(w * np.log(R + s), axis=0, where=mask > 0)
    args = (p, q, R, w, s, gamma, logk0, np.exp(logk0), mask)
    return tuple(jnp.asarray(a, jnp.float32) for a in args)


@pytest.mark.parametrize("seed,K", [(0, 2), (1, 3), (2, 4)])
def test_gm_pallas_matches_jnp(seed, K):
    args = _gm_batch(seed, K)
    D0, L0 = project_gm(*args, needs_floor=False, cfg=CFG)
    D1, L1 = project_gm_pallas(*args, needs_floor=False, cfg=CFG, interpret=True)
    np.testing.assert_allclose(np.asarray(D1), np.asarray(D0), atol=5e-5)
    np.testing.assert_allclose(np.asarray(L1), np.asarray(L0), atol=5e-5)


@pytest.mark.parametrize("seed", [3, 4])
def test_gm_pallas_floor_matches_jnp(seed):
    args = _gm_batch(seed, 2, shifted=True)
    D0, L0 = project_gm(*args, needs_floor=True, cfg=CFG)
    D1, L1 = project_gm_pallas(*args, needs_floor=True, cfg=CFG, interpret=True)
    np.testing.assert_allclose(np.asarray(D1), np.asarray(D0), atol=5e-5)
    np.testing.assert_allclose(np.asarray(L1), np.asarray(L0), atol=5e-5)


@pytest.mark.parametrize("seed,K", [(5, 2), (6, 3)])
def test_cs_pallas_matches_jnp(seed, K):
    rng = np.random.default_rng(seed)
    m = M
    R = rng.uniform(0.3, 30.0, size=(K, m))
    mask = np.ones((K, m))
    gamma = rng.uniform(0.9, 1.0, size=m)
    p = rng.uniform(-8, 8, size=(K, m))
    q = rng.uniform(-8, 8, size=(K, m))
    k0 = R.sum(axis=0)
    w = np.ones((K, m))
    args = tuple(
        jnp.asarray(a, jnp.float32) for a in (p, q, R, gamma, w, k0, mask)
    )
    D0, L0 = project_cs(*args, cfg=CFG)
    D1, L1 = project_cs_pallas(*args, cfg=CFG, interpret=True)
    np.testing.assert_allclose(np.asarray(D1), np.asarray(D0), atol=5e-5)
    np.testing.assert_allclose(np.asarray(L1), np.asarray(L0), atol=5e-5)


def test_cs_pallas_weighted_matches_jnp():
    """Weighted constant-sum (phi = sum q_j x_j) in the fused kernel path."""
    rng = np.random.default_rng(11)
    K, m = 2, M
    R = rng.uniform(0.3, 30.0, size=(K, m))
    w = rng.uniform(0.25, 4.0, size=(K, m))
    mask = np.ones((K, m))
    gamma = rng.uniform(0.9, 1.0, size=m)
    p = rng.uniform(-8, 8, size=(K, m))
    q = rng.uniform(-8, 8, size=(K, m))
    k0 = (w * R).sum(axis=0)
    args = tuple(
        jnp.asarray(a, jnp.float32) for a in (p, q, R, gamma, w, k0, mask)
    )
    D0, L0 = project_cs(*args, cfg=CFG)
    D1, L1 = project_cs_pallas(*args, cfg=CFG, interpret=True)
    np.testing.assert_allclose(np.asarray(D1), np.asarray(D0), atol=5e-5)
    np.testing.assert_allclose(np.asarray(L1), np.asarray(L0), atol=5e-5)


def test_gm_pallas_multi_tile():
    """Grid > 1: 512 pools with tile=256 exercises the block partitioning."""
    args = _gm_batch(9, 2, m=512)
    D0, L0 = project_gm(*args, cfg=CFG)
    D1, L1 = project_gm_pallas(*args, cfg=CFG, tile=256, interpret=True)
    np.testing.assert_allclose(np.asarray(D1), np.asarray(D0), atol=5e-5)
    np.testing.assert_allclose(np.asarray(L1), np.asarray(L0), atol=5e-5)
