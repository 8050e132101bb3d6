"""Pool-sharded solver on a virtual 8-device CPU mesh (SURVEY.md §4(4)).

The sharded SPMD program must reproduce the single-device result (modulo
floating-point reduction order) on the reference instances and on larger
random networks where every device owns several pools.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cfmm_routing_tpu.models.pools import ConstantSumPool, GeoMeanPool, ProductPool
from cfmm_routing_tpu.models.reference_instances import arbitrage_instance
from cfmm_routing_tpu.models.utility import Objective
from cfmm_routing_tpu.parallel.mesh import pool_mesh
from cfmm_routing_tpu.parallel.sharded import ShardedAdmmSolver
from cfmm_routing_tpu.solver.admm import AdmmOptions, AdmmSolver
from cfmm_routing_tpu.solver.compiler import ProblemSpec, compile_spec

OPTS = AdmmOptions(max_iters=20000, eps_abs=1e-10, eps_rel=1e-10)


def _random_network(rng, n_assets, n_pools):
    pools = []
    for _ in range(n_pools):
        kind = rng.integers(0, 3)
        k = int(rng.integers(2, min(5, n_assets) + 1))
        assets = tuple(rng.choice(n_assets, size=k, replace=False))
        reserves = rng.uniform(1.0, 100.0, size=k)
        fee = float(rng.uniform(0.95, 1.0))
        if kind == 0:
            pools.append(ProductPool(assets, reserves, fee=fee))
        elif kind == 1:
            w = rng.uniform(1.0, 4.0, size=k)
            pools.append(GeoMeanPool(assets, reserves, w, fee=fee))
        else:
            pools.append(ConstantSumPool(assets, reserves, fee=fee))
    return ProblemSpec(n_assets=n_assets, pools=pools)


def test_eight_cpu_devices_available():
    assert len(jax.devices("cpu")) >= 8


def test_sharded_matches_single_device_reference_instance():
    spec, obj = arbitrage_instance()
    mesh = pool_mesh(n_devices=4, platform="cpu")
    sharded = ShardedAdmmSolver(spec, mesh, dtype=jnp.float64, options=OPTS)
    res_s = sharded.solve(obj)

    single = AdmmSolver(compile_spec(spec), dtype=jnp.float64, options=OPTS)
    res_1 = single.solve(obj)

    assert bool(res_s.converged)
    np.testing.assert_allclose(
        float(res_s.objective), float(res_1.objective), rtol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(res_s.psi), np.asarray(res_1.psi), atol=1e-7
    )


@pytest.mark.parametrize("n_dev", [2, 8])
def test_sharded_random_network(n_dev):
    rng = np.random.default_rng(42)
    spec = _random_network(rng, n_assets=12, n_pools=24)
    c = rng.uniform(0.5, 5.0, size=12)
    obj = Objective.arbitrage(c)

    mesh = pool_mesh(n_devices=n_dev, platform="cpu")
    sharded = ShardedAdmmSolver(spec, mesh, dtype=jnp.float64, options=OPTS)
    res_s = sharded.solve(obj)

    single = AdmmSolver(compile_spec(spec), dtype=jnp.float64, options=OPTS)
    res_1 = single.solve(obj)

    assert bool(res_s.converged) and bool(res_1.converged)
    np.testing.assert_allclose(
        float(res_s.objective), float(res_1.objective), rtol=1e-6, atol=1e-8
    )


def test_sharded_trades_unbucket_correctly():
    """Gathered per-pool trades from the sharded solve must match the
    single-device ones (same spec ordering, same values)."""
    spec, obj = arbitrage_instance()
    mesh = pool_mesh(n_devices=4, platform="cpu")
    sharded = ShardedAdmmSolver(spec, mesh, dtype=jnp.float64, options=OPTS)
    d_s, l_s = sharded.unbucket(sharded.solve(obj))

    single = AdmmSolver(compile_spec(spec), dtype=jnp.float64, options=OPTS)
    d_1, l_1 = single.unbucket(single.solve(obj))

    for a, b in zip(d_s, d_1):
        np.testing.assert_allclose(a, b, atol=1e-6)
    for a, b in zip(l_s, l_1):
        np.testing.assert_allclose(a, b, atol=1e-6)


@pytest.mark.parametrize("n_dev", [4, 8])
def test_asset_sharded_consensus_matches_single_device(n_dev):
    """shard_assets=True: reduce_scatter + n/D-block prox + all_gather must
    reproduce the replicated-psum result (SURVEY.md §5 reduce_scatter).
    n=12 over 8 devices exercises uneven blocks (n_pad=16, 2 per device)."""
    rng = np.random.default_rng(7)
    spec = _random_network(rng, n_assets=12, n_pools=24)
    c = rng.uniform(0.5, 5.0, size=12)
    obj = Objective.arbitrage(c)

    mesh = pool_mesh(n_devices=n_dev, platform="cpu")
    sharded = ShardedAdmmSolver(
        spec, mesh, dtype=jnp.float64, options=OPTS, shard_assets=True
    )
    res_s = sharded.solve(obj)

    single = AdmmSolver(compile_spec(spec), dtype=jnp.float64, options=OPTS)
    res_1 = single.solve(obj)

    assert bool(res_s.converged) and bool(res_1.converged)
    np.testing.assert_allclose(
        float(res_s.objective), float(res_1.objective), rtol=1e-6, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(res_s.psi), np.asarray(res_1.psi), atol=1e-6
    )


def test_asset_sharded_reference_instance():
    spec, obj = arbitrage_instance()
    mesh = pool_mesh(n_devices=4, platform="cpu")
    sharded = ShardedAdmmSolver(
        spec, mesh, dtype=jnp.float64, options=OPTS, shard_assets=True
    )
    res = sharded.solve(obj)
    assert bool(res.converged)
    np.testing.assert_allclose(float(res.objective), 21.499805, rtol=1e-6)
