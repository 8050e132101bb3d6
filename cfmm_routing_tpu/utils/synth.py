"""Synthetic CFMM network generators for benchmarks and scale tests.

The reference hardcodes 5-pool networks (``arbitrage.py:6-28``); benchmark
configs in BASELINE.json call for 1k-100k-pool networks of mixed type.
Generators are deterministic given a seed.
"""
from __future__ import annotations

import numpy as np

from ..models.pools import (
    BoundedProductPool,
    ConstantSumPool,
    GeoMeanPool,
    ProductPool,
)
from ..models.utility import Objective
from ..solver.compiler import ProblemSpec

__all__ = ["random_network", "random_arbitrage"]


def random_network(
    n_assets: int,
    n_pools: int,
    seed: int = 0,
    p_product: float = 0.7,
    p_weighted: float = 0.1,
    p_bounded: float = 0.1,
    p_sum: float = 0.1,
    max_width: int = 4,
    reserve_scale: float = 100.0,
) -> ProblemSpec:
    """A connected-ish random pool network with a realistic type mix.

    ~70% two-asset constant-product (the dominant real-world family), plus
    weighted multi-asset, bounded-liquidity (v3-style) and constant-sum
    pools.  Asset pairs are drawn with a popularity bias (Zipf-like) so a
    few hub assets (numeraires) appear in many pools, as on real networks.
    """
    rng = np.random.default_rng(seed)
    probs = np.array([p_product, p_weighted, p_bounded, p_sum], np.float64)
    probs = probs / probs.sum()
    # Zipf-ish popularity over assets => hub structure
    pop = 1.0 / np.arange(1, n_assets + 1) ** 0.8
    pop = pop / pop.sum()

    pools = []
    for i in range(n_pools):
        kind = rng.choice(4, p=probs)
        if kind in (0, 2):
            k = 2
        else:
            k = int(rng.integers(2, max(3, min(max_width, n_assets)) + 1))
        assets = rng.choice(n_assets, size=k, replace=False, p=pop)
        # guarantee a spanning backbone so every asset is reachable
        if i < n_assets - 1:
            assets = np.array([i % n_assets, (i + 1) % n_assets] + list(assets[2:]))[:k]
            assets = np.unique(assets)[:k]
            if len(assets) < 2:
                assets = np.array([i % n_assets, (i + 1) % n_assets])
        reserves = rng.uniform(0.1, 1.0, size=len(assets)) * reserve_scale
        fee = float(rng.choice([0.997, 0.997, 0.995, 0.999, 1.0]))
        if kind == 0:
            pools.append(ProductPool(assets, reserves, fee=fee))
        elif kind == 1:
            w = rng.uniform(1.0, 8.0, size=len(assets))
            pools.append(GeoMeanPool(assets, reserves, w, fee=fee))
        elif kind == 2:
            shifts = rng.uniform(0.5, 5.0, size=len(assets)) * reserve_scale
            pools.append(BoundedProductPool(assets, reserves, shifts, fee=fee))
        else:
            pools.append(ConstantSumPool(assets, reserves, fee=fee))
    return ProblemSpec(n_assets=n_assets, pools=pools)


def random_arbitrage(n_assets: int, n_pools: int, seed: int = 0, **kw):
    """Network + a market-value arbitrage objective (prices ~ lognormal)."""
    spec = random_network(n_assets, n_pools, seed=seed, **kw)
    rng = np.random.default_rng(seed + 1)
    prices = np.exp(rng.normal(0.0, 1.0, size=n_assets))
    return spec, Objective.arbitrage(prices)
