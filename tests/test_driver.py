"""Chunked driver: residual observability, checkpoint/resume (SURVEY.md §5)."""
import numpy as np
import pytest

import jax.numpy as jnp

from cfmm_routing_tpu.models.reference_instances import arbitrage_instance
from cfmm_routing_tpu.solver.admm import AdmmOptions, AdmmSolver
from cfmm_routing_tpu.solver.compiler import compile_spec
from cfmm_routing_tpu.solver.driver import ChunkedDriver, SolveLog

OPTS = AdmmOptions(max_iters=30000, eps_abs=1e-10, eps_rel=1e-10)


def _solver():
    spec, obj = arbitrage_instance()
    return AdmmSolver(compile_spec(spec), dtype=jnp.float64, options=OPTS), obj


def test_chunked_matches_whileloop():
    solver, obj = _solver()
    res_w = solver.solve(obj)
    driver = ChunkedDriver(solver, chunk=100)
    res_c, log = driver.solve(obj, max_iters=30000)
    assert bool(res_c.converged)
    np.testing.assert_allclose(
        float(res_c.objective), float(res_w.objective), rtol=1e-7
    )
    # structured log: iterations advance by chunk, residuals reach tolerance
    assert len(log) >= 1
    its = [r.iteration for r in log.records]
    assert its == sorted(its)
    last = log.records[-1]
    assert last.r_norm <= last.eps_pri and last.s_norm <= last.eps_dua


def test_log_csv_and_callback(tmp_path):
    solver, obj = _solver()
    driver = ChunkedDriver(solver, chunk=50)
    seen = []
    res, log = driver.solve(obj, max_iters=500, callback=seen.append)
    assert len(seen) == len(log.records)
    path = tmp_path / "log.csv"
    log.to_csv(str(path))
    lines = path.read_text().strip().splitlines()
    assert lines[0].startswith("iteration,")
    assert len(lines) == len(log) + 1


def test_checkpoint_resume(tmp_path):
    solver, obj = _solver()
    ck = str(tmp_path / "state")

    # run A: stop early (budget), checkpointing every chunk
    driver_a = ChunkedDriver(solver, chunk=100)
    res_a, _ = driver_a.solve(obj, max_iters=200, checkpoint_path=ck)
    assert not bool(res_a.converged)

    # run B: resume from the checkpoint and finish
    driver_b = ChunkedDriver(solver, chunk=100)
    res_b, log_b = driver_b.solve(
        obj, max_iters=30000, checkpoint_path=ck, resume=True
    )
    assert bool(res_b.converged)
    # resumed iteration counter continues past the checkpoint
    assert log_b.records[0].iteration > 200 - 100 + 1

    # uninterrupted reference
    res_ref, _ = ChunkedDriver(solver, chunk=100).solve(obj, max_iters=30000)
    np.testing.assert_allclose(
        float(res_b.objective), float(res_ref.objective), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(res_b.objective), 21.499805, rtol=1e-5
    )


def test_chunked_stops_like_whileloop_at_rho_neq_1():
    """Regression for the double-rho dual-residual bug (round 1): _iterate
    returns s2/u2 already rho^2-scaled; the driver must NOT scale by rho
    again.  At rho0=5 with eps_rel=0 the bug inflated the reported dual
    residual 5x, so the chunked driver kept iterating long after the
    while_loop path had converged."""
    spec, obj = arbitrage_instance()
    opts = AdmmOptions(
        max_iters=30000, eps_abs=1e-8, eps_rel=0.0, rho=5.0, adapt_rho=False
    )
    solver = AdmmSolver(compile_spec(spec), dtype=jnp.float64, options=opts)
    res_w = solver.solve(obj)
    assert bool(res_w.converged)

    driver = ChunkedDriver(solver, chunk=25)
    res_c, log = driver.solve(obj, max_iters=30000)
    assert log.status == "converged"
    # identical trajectory (fixed rho): the chunked stop lands within one
    # chunk of the while_loop's stopping iteration
    assert int(res_c.iters) <= int(res_w.iters) + 25
    np.testing.assert_allclose(
        float(res_c.objective), float(res_w.objective), rtol=1e-8
    )
    np.testing.assert_allclose(float(res_c.objective), 21.499805, rtol=1e-6)


def test_chunked_converges_with_rho_adaptation_from_rho5():
    """rho adaptation between chunks (rho0 far from 1) still converges to
    the pinned optimum and reports rho_final on the result."""
    spec, obj = arbitrage_instance()
    opts = AdmmOptions(
        max_iters=30000, eps_abs=1e-9, eps_rel=1e-9, rho=5.0,
        adapt_rho=True, adapt_ratio=5.0,
    )
    solver = AdmmSolver(compile_spec(spec), dtype=jnp.float64, options=opts)
    res, log = ChunkedDriver(solver, chunk=50).solve(obj, max_iters=30000)
    assert log.status == "converged"
    np.testing.assert_allclose(float(res.objective), 21.499805, rtol=1e-6)
    assert float(res.rho_final) > 0.0


def test_f32_stall_detection():
    """f32 solve with f64-grade tolerances must stop with 'stalled', not
    burn the whole budget cycling at its noise floor."""
    spec, obj = arbitrage_instance()
    solver = AdmmSolver(compile_spec(spec), dtype=jnp.float32, options=OPTS)
    driver = ChunkedDriver(solver, chunk=100)
    res, log = driver.solve(obj, max_iters=100000)
    assert log.status == "stalled"
    assert not bool(res.converged)
    # the stalled answer is still the right answer to f32 accuracy
    np.testing.assert_allclose(float(res.objective), 21.499805, rtol=1e-4)
    # and it stopped well before the budget
    assert int(res.iters) < 10000


def test_f64_requires_x64_guard(monkeypatch):
    import jax

    spec, obj = arbitrage_instance()
    compiled = compile_spec(spec)
    jax.config.update("jax_enable_x64", False)
    try:
        with pytest.raises(ValueError, match="jax_enable_x64"):
            AdmmSolver(compiled, dtype=jnp.float64, options=OPTS)
    finally:
        jax.config.update("jax_enable_x64", True)


def test_route_feasible_after_chunked():
    solver, obj = _solver()
    res, _ = ChunkedDriver(solver, chunk=100).solve(obj, max_iters=30000)
    deltas, lambdas = solver.unbucket(res)
    spec = solver.compiled.spec
    for pool, D, L in zip(spec.pools, deltas, lambdas):
        assert (D >= -1e-12).all() and (L >= -1e-12).all()
        newR = pool.reserves + pool.fee * D - L
        if pool.kind == "gm":
            phi0 = np.sum(pool.weights * np.log(pool.reserves + pool.shift))
            phi1 = np.sum(pool.weights * np.log(newR + pool.shift))
            assert phi1 >= phi0 - 1e-9
        else:
            assert newR.sum() >= pool.reserves.sum() - 1e-9


def test_warm_start_reconverges_fast():
    """A solved route warm-starts a perturbed problem in far fewer
    iterations than a cold solve (capability absent in the reference —
    it re-canonicalizes from scratch 50x in two-asset.py:40-91)."""
    spec, obj = arbitrage_instance()
    solver = AdmmSolver(
        compile_spec(spec), dtype=jnp.float64,
        options=AdmmOptions(max_iters=30000, eps_abs=1e-9, eps_rel=1e-9),
    )
    cold = solver.solve(obj)
    assert bool(cold.converged)

    # identical problem, warm start: should finish almost immediately
    rewarm = solver.solve(obj, warm=cold)
    assert bool(rewarm.converged)
    assert int(rewarm.iters) <= max(10, int(cold.iters) // 10)
    np.testing.assert_allclose(
        float(rewarm.objective), float(cold.objective), rtol=1e-7
    )

    # perturbed prices: warm still much cheaper than cold
    from cfmm_routing_tpu.models.utility import Objective

    obj2 = Objective.arbitrage(np.asarray(obj.c) * 1.02)
    cold2 = solver.solve(obj2)
    warm2 = solver.solve(obj2, warm=cold)
    assert bool(warm2.converged)
    np.testing.assert_allclose(
        float(warm2.objective), float(cold2.objective), rtol=1e-6
    )
    assert int(warm2.iters) < int(cold2.iters)


def test_fused_chunks_match_classic_chunks():
    """fused=True drives the identical iteration; converged objective and
    log shape must match the classic chunk body."""
    spec, obj = arbitrage_instance()
    solver = AdmmSolver(
        compile_spec(spec, pad_pools_to=128), dtype=jnp.float32,
        options=AdmmOptions(max_iters=10000, eps_abs=2e-6, eps_rel=2e-6),
    )
    classic = ChunkedDriver(solver, chunk=100)
    res_c, log_c = classic.solve(obj, max_iters=4000)

    fused = ChunkedDriver(solver, chunk=100, fused=True, interpret=True)
    res_f, log_f = fused.solve(obj, max_iters=4000)
    assert log_f.status == "converged"
    np.testing.assert_allclose(
        float(res_f.objective), float(res_c.objective), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(res_f.psi), np.asarray(res_c.psi), atol=1e-3
    )


def test_fused_chunks_reject_unaligned():
    spec, obj = arbitrage_instance()
    solver = AdmmSolver(compile_spec(spec), dtype=jnp.float64, options=OPTS)
    with pytest.raises(ValueError, match="pad_pools_to"):
        ChunkedDriver(solver, chunk=10, fused=True)


def test_chunked_concave_utility():
    """The driver accepts ConcaveUtility objectives and logs its values."""
    from cfmm_routing_tpu.models.utility import ConcaveUtility

    spec, obj = arbitrage_instance()
    n = spec.n_assets
    util = ConcaveUtility.linear(obj.c, lo=np.zeros(n))
    for j in range(n):
        util = util.with_log(j, float(obj.c[j]), 1.0).with_box(j, 0.0, 100.0)
    solver = AdmmSolver(compile_spec(spec), dtype=jnp.float64, options=OPTS)
    driver = ChunkedDriver(solver, chunk=200)
    res, log = driver.solve(util, max_iters=20000)
    assert log.status == "converged"
    # matches the direct while_loop solve on the same utility
    res_w = solver.solve(util)
    np.testing.assert_allclose(
        float(res.objective), float(res_w.objective), rtol=1e-7
    )
