"""Scenario folding (solver/fold.py): T sweep points as ONE problem on
the pool axis — the TPU-first scenario batch (one fused-kernel launch
per bucket per iteration regardless of T; the reference loops T serial
cvxpy solves, /root/reference/two-asset.py:40)."""
import numpy as np
import jax.numpy as jnp

from cfmm_routing_tpu.models.utility import Objective
from cfmm_routing_tpu.solver.admm import AdmmOptions, AdmmSolver
from cfmm_routing_tpu.solver.compiler import compile_table
from cfmm_routing_tpu.solver.fold import (
    fold_compiled,
    fold_planes,
    solve_batch_folded,
    unfold_planes,
)
from cfmm_routing_tpu.solver.precondition import equilibrate
from cfmm_routing_tpu.utils.synth import random_arbitrage_table


def _setup(T=3, seed=5):
    table, obj = random_arbitrage_table(12, 60, seed=seed)
    eq = equilibrate(table, obj)
    compiled = compile_table(eq.table)
    rng = np.random.default_rng(3)
    c = np.asarray(eq.objective.c)[None, :] * rng.uniform(
        0.8, 1.25, size=(T, 1)
    )
    lo = np.tile(np.asarray(eq.objective.lo)[None, :], (T, 1))
    hi = np.full_like(c, np.inf)
    return compiled, c, lo, hi


def test_fold_compiled_block_diagonal():
    """Asset ids offset per point (padding -> T*n), degrees tile, pool
    counts multiply — the folded consensus cannot mix points."""
    compiled, c, _, _ = _setup(T=3)
    T, n = 3, compiled.n_assets
    fc = fold_compiled(compiled, T)
    assert fc.n_assets == T * n
    assert fc.n_pools == T * compiled.n_pools
    np.testing.assert_array_equal(fc.degree, np.tile(compiled.degree, T))
    for name, b in compiled.buckets.items():
        fb = fc.buckets[name]
        m = b.mask.shape[0]
        assert fb.mask.shape[0] == T * m
        for t in range(T):
            blk = fb.asset[t * m : (t + 1) * m]
            real = b.mask > 0
            np.testing.assert_array_equal(blk[real], b.asset[real] + t * n)
            assert np.all(blk[~real] == T * n)


def test_fold_planes_roundtrip():
    compiled, *_ = _setup()
    rng = np.random.default_rng(0)
    planes = {
        name: rng.standard_normal((4, b.mask.shape[1], b.mask.shape[0]))
        for name, b in compiled.buckets.items()
    }
    back = unfold_planes(fold_planes(planes), 4)
    for k in planes:
        np.testing.assert_array_equal(back[k], planes[k])


def test_solve_batch_folded_matches_per_point():
    """Folded batch == per-point solves to the shared f32 convergence
    tolerance (the fold is exact; only the joint stopping rule and the
    shared rho differ)."""
    compiled, c, lo, hi = _setup(T=3)
    opts = AdmmOptions(
        max_iters=8000, eps_abs=1e-6, eps_rel=1e-6, adapt_rho=False
    )
    res_f = solve_batch_folded(compiled, c, lo, hi, options=opts)
    assert bool(np.all(res_f.converged))
    solver = AdmmSolver(compiled, dtype=jnp.float32, options=opts)
    for t in range(c.shape[0]):
        r = solver.solve(Objective(c[t], lo=lo[t], hi=hi[t]))
        assert abs(float(r.objective) - res_f.objective[t]) <= 5e-5 * abs(
            float(r.objective)
        )


def test_refine_sweep_fold_and_vmap_agree():
    """Both refine_sweep backends certify the same grid."""
    from cfmm_routing_tpu.solver.refine_device import refine_sweep

    compiled, c, lo, hi = _setup(T=2)
    opts = AdmmOptions(max_iters=8000, eps_abs=1e-6, eps_rel=1e-6)
    solver = AdmmSolver(compiled, dtype=jnp.float32, options=opts)
    res = solver.solve_batch(
        c, np.maximum(lo, -3e38), np.full_like(c, 3e38)
    )
    for fold in (True, False):
        ref = refine_sweep(
            compiled, c, lo, hi, res, target_gap=1e-6, fold=fold
        )
        assert bool(np.all(ref.achieved)), (fold, [
            (f"{ct.gap_rel:.2e}", f"{ct.feasibility_rel:.2e}")
            for ct in ref.certificates
        ])


def test_solve_batch_reserves_folded_matches_vmapped():
    """Folded reserve-state scenarios (BASELINE config 5) == the vmapped
    solve_batch_reserves to the shared f32 iteration tolerance; the
    reserve leaves ride the traced buckets argument, so scenario batches
    never recompile."""
    from cfmm_routing_tpu.solver.fold import solve_batch_reserves_folded

    compiled, c, lo, hi = _setup(T=1)
    del c, lo, hi
    table, obj = random_arbitrage_table(12, 60, seed=5)
    from cfmm_routing_tpu.solver.precondition import equilibrate as _eq

    eq = _eq(table, obj)
    T = 3
    rng = np.random.default_rng(9)
    scale = rng.uniform(0.7, 1.3, size=(T, compiled.n_pools))
    opts = AdmmOptions(max_iters=800, eps_abs=0.0, eps_rel=0.0,
                       adapt_rho=False)
    res_f = solve_batch_reserves_folded(
        compiled, eq.objective, scale, options=opts, n_iters=800
    )
    solver = AdmmSolver(compiled, dtype=jnp.float32, options=opts)
    res_v = solver.solve_batch_reserves(eq.objective, scale)
    obj_v = np.asarray(res_v.objective, np.float64)
    assert np.all(
        np.abs(res_f.objective - obj_v) <= 5e-4 * np.maximum(1, np.abs(obj_v))
    ), (res_f.objective, obj_v)
