"""Fused Pallas iteration vs the classic XLA iteration — trajectory parity.

The fused path (ops/iteration_pallas.py + AdmmSolver._iterate_fused) is an
algebraic restructuring of EXACTLY the same ADMM update; its (D, L, nu,
psi) trajectory must match the classic `_iterate` step-for-step to f32
roundoff on every bucket kind.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cfmm_routing_tpu.solver.admm import AdmmOptions, AdmmSolver
from cfmm_routing_tpu.solver.compiler import compile_table
from cfmm_routing_tpu.utils.synth import random_arbitrage_table

N_STEPS = 12


def _mk_solver(n_assets=64, n_pools=320, seed=0, alpha=1.7):
    table, obj = random_arbitrage_table(n_assets, n_pools, seed=seed)
    compiled = compile_table(table, pad_pools_to=128)
    opts = AdmmOptions(max_iters=50, alpha=alpha, consensus="onehot")
    return AdmmSolver(compiled, dtype=jnp.float32, options=opts), obj


@pytest.mark.parametrize("alpha", [1.0, 1.7])
def test_fused_matches_classic_trajectory(alpha):
    solver, obj = _mk_solver(alpha=alpha)
    n = solver.n
    c = jnp.asarray(obj.c, jnp.float32)
    lo = jnp.asarray(np.maximum(obj.lo, -3e38), jnp.float32)
    hi = jnp.asarray(np.minimum(obj.hi, 3e38), jnp.float32)
    rho = jnp.float32(1.0)

    # jit both step functions: eager interpret-mode Pallas dispatches every
    # kernel op individually and is ~100x slower than one compiled program
    classic_step = jax.jit(
        lambda z, nu: solver._iterate(z, nu, rho, c, lo, hi)
    )
    fused_step = jax.jit(
        lambda s, wdef, nu: solver._iterate_fused(
            s, wdef, nu, rho, c, lo, hi, interpret=True
        )
    )

    # classic
    z = {
        name: (jnp.zeros_like(a["mask"]), jnp.zeros_like(a["mask"]))
        for name, a in solver.buckets.items()
    }
    nu = jnp.zeros((n,), jnp.float32)
    classic = []
    for _ in range(N_STEPS):
        z, nu, psi, w, _ = classic_step(z, nu)
        classic.append((psi, nu, w))

    # fused (interpret mode on CPU)
    s, wdef, nuf = solver.fused_init()
    for k in range(N_STEPS):
        s, wdef, nuf, psi_f, w_f = fused_step(s, wdef, nuf)
        psi_c, nu_c, w_c = classic[k]
        np.testing.assert_allclose(
            np.asarray(psi_f), np.asarray(psi_c), atol=2e-4,
            err_msg=f"psi step {k}",
        )
        np.testing.assert_allclose(
            np.asarray(nuf), np.asarray(nu_c), atol=2e-4,
            err_msg=f"nu step {k}",
        )
        for name in w_c:
            np.testing.assert_allclose(
                np.asarray(w_f[name][0]), np.asarray(w_c[name][0]),
                atol=2e-4, err_msg=f"D[{name}] step {k}",
            )

    # and the materialized edge state matches the classic z
    zf = solver.fused_to_z(s, wdef)
    for name in z:
        np.testing.assert_allclose(
            np.asarray(zf[name][0]), np.asarray(z[name][0]), atol=2e-4,
            err_msg=f"zD[{name}]",
        )
        np.testing.assert_allclose(
            np.asarray(zf[name][1]), np.asarray(z[name][1]), atol=2e-4,
            err_msg=f"zL[{name}]",
        )


def test_fused_radix_matches_classic_large_asset_universe():
    """n_assets=1024 (H=8 radix rows): the kernel's radix-128 exchange and
    the classic path's 'radix' consensus mode must stay trajectory-equal.
    This is the config class whose dense one-hot predecessor VMEM-OOMed."""
    table, obj = random_arbitrage_table(1024, 256, seed=5)
    compiled = compile_table(table, pad_pools_to=128)
    k = 6
    opts = AdmmOptions(
        max_iters=k + 1, eps_abs=0.0, eps_rel=0.0, adapt_rho=False,
        consensus="radix",
    )
    solver = AdmmSolver(compiled, dtype=jnp.float32, options=opts)
    res_c = solver.solve(obj)
    res_f = solver.solve_fused(obj, iters=k, interpret=True)
    np.testing.assert_allclose(
        np.asarray(res_f.psi), np.asarray(res_c.psi), atol=3e-4
    )
    np.testing.assert_allclose(
        float(res_f.objective), float(res_c.objective), rtol=1e-4, atol=1e-3
    )


def test_solve_fused_matches_classic_fixed_iters():
    """solve_fused(iters=k) == classic solve stopped at k+1 iterations
    (the fused loop plus its one classic residual-harvest step)."""
    table, obj = random_arbitrage_table(16, 256, seed=2)
    compiled = compile_table(table, pad_pools_to=128)
    k = 10
    opts = AdmmOptions(
        max_iters=k + 1, eps_abs=0.0, eps_rel=0.0, adapt_rho=False,
        consensus="onehot",
    )
    solver = AdmmSolver(compiled, dtype=jnp.float32, options=opts)
    res_c = solver.solve(obj)
    res_f = solver.solve_fused(obj, iters=k, interpret=True)
    np.testing.assert_allclose(
        np.asarray(res_f.psi), np.asarray(res_c.psi), atol=2e-4
    )
    assert abs(float(res_f.r_norm) - float(res_c.r_norm)) < 2e-4
    assert abs(float(res_f.s_norm) - float(res_c.s_norm)) < 2e-4
    assert int(res_f.iters) == k + 1


def test_solve_fused_rejects_unaligned():
    table, obj = random_arbitrage_table(16, 100, seed=1)
    solver = AdmmSolver(
        compile_table(table), dtype=jnp.float32, options=AdmmOptions(max_iters=5)
    )
    with pytest.raises(ValueError, match="pad_pools_to=128"):
        solver.solve_fused(obj, iters=3, interpret=True)


def test_fused_requires_lane_aligned_pools():
    table, obj = random_arbitrage_table(16, 100, seed=1)
    compiled = compile_table(table)  # no pad_pools_to=128
    solver = AdmmSolver(
        compiled, dtype=jnp.float32, options=AdmmOptions(max_iters=5)
    )
    s, wdef, nu = solver.fused_init()
    c = jnp.zeros((16,), jnp.float32)
    with pytest.raises(AssertionError, match="multiple of 128"):
        solver._iterate_fused(s, wdef, nu, jnp.float32(1.0), c, c, c,
                              interpret=True)
