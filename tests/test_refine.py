"""f64 refine stage: f32 solve -> certified <=1e-6 gap (VERDICT round-1 #4).

The reference certifies ~1e-8 via ECOS on every instance
(``/root/reference/arbitrage.py:82``); the TPU f32 path alone reaches
~1e-4.  ``solver.refine.refine`` must close the rest from ANY f32
starting point — converged or truncated — and restore the caller's x64
flag afterwards.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cfmm_routing_tpu.models.reference_instances import (
    arbitrage_instance,
    liquidation_instance,
    two_asset_instance,
)
from cfmm_routing_tpu.solver.admm import AdmmOptions, AdmmSolver
from cfmm_routing_tpu.solver.compiler import compile_spec
from cfmm_routing_tpu.solver.refine import refine

F32_OPTS = AdmmOptions(max_iters=6000, eps_abs=2e-6, eps_rel=2e-6)


def _f32_solve(spec, obj):
    solver = AdmmSolver(compile_spec(spec), dtype=jnp.float32, options=F32_OPTS)
    return solver.compiled, solver.solve(obj)


@pytest.mark.parametrize(
    "instance,pin,get",
    [
        (arbitrage_instance, 21.499805, lambda r: float(r.objective)),
        (liquidation_instance, 15.883010, lambda r: float(r.psi[4])),
        (lambda: two_asset_instance(25.0), 31.005495, lambda r: float(r.objective)),
    ],
    ids=["arbitrage", "liquidation", "two-asset-t25"],
)
def test_refine_certifies_reference_instances(instance, pin, get):
    spec, obj = instance()
    compiled, res32 = _f32_solve(spec, obj)
    out = refine(compiled, obj, res32, target_gap=1e-6)
    assert out.achieved, out.certificate.summary()
    assert out.certificate.gap_rel <= 1e-6
    # feasibility is certified RELATIVE to trade magnitudes (the ECOS/SCS
    # convention refine stops on; Certificate.feasibility_rel)
    assert out.certificate.feasibility_rel <= 1e-6
    # the certified value matches the reference's pinned optimum
    np.testing.assert_allclose(get(out.result), pin, rtol=2e-6)
    # prices and trades are host numpy, safe to use after the x64 restore
    assert isinstance(out.result.psi, np.ndarray)


def test_refine_cpu_sharded_matches_single_device():
    """cpu_shards: the f64 polish sharded over 4 virtual CPU devices
    certifies the same instance to the same target (SPMD-over-cores twin
    of the single-device refine)."""
    spec, obj = arbitrage_instance()
    compiled = compile_spec(spec, pad_pools_to=4)
    s32 = AdmmSolver(
        compiled, dtype=jnp.float32,
        options=AdmmOptions(max_iters=1500, eps_abs=1e-5, eps_rel=1e-5),
    )
    res32 = s32.solve(obj)
    out1 = refine(compiled, obj, res32, target_gap=1e-6)
    out4 = refine(compiled, obj, res32, target_gap=1e-6, cpu_shards=4)
    assert out4.achieved and out1.achieved
    assert abs(out4.certificate.gap_rel) <= 1e-6
    np.testing.assert_allclose(
        out4.certificate.objective, out1.certificate.objective, rtol=1e-6
    )
    np.testing.assert_allclose(
        float(out4.result.objective), 21.499805, rtol=2e-6
    )


def test_refine_from_truncated_f32_solve():
    """An UNCONVERGED f32 start (50 iterations) must still refine to a
    certified gap — the polish does the remaining work."""
    spec, obj = arbitrage_instance()
    solver = AdmmSolver(
        compile_spec(spec), dtype=jnp.float32,
        options=AdmmOptions(max_iters=50, eps_abs=0.0, eps_rel=0.0),
    )
    res32 = solver.solve(obj)
    assert not bool(res32.converged)
    out = refine(solver.compiled, obj, res32, target_gap=1e-6)
    assert out.achieved
    np.testing.assert_allclose(float(out.result.objective), 21.499805, rtol=2e-6)


def test_refine_restores_x64_flag():
    """Called from an f32 session (x64 off), refine must leave x64 off."""
    spec, obj = arbitrage_instance()
    compiled, res32 = _f32_solve(spec, obj)
    jax.config.update("jax_enable_x64", False)
    try:
        out = refine(compiled, obj, res32, target_gap=1e-6)
        assert not bool(jax.config.jax_enable_x64)
        assert out.achieved
    finally:
        jax.config.update("jax_enable_x64", True)


def test_refine_beats_f32_gap():
    """The certificate after refine is strictly tighter than the f32
    iterate's own certificate."""
    from cfmm_routing_tpu.solver.certify import certify

    spec, obj = arbitrage_instance()
    compiled, res32 = _f32_solve(spec, obj)
    cert32 = certify(
        compiled, obj,
        {k: np.asarray(v) for k, v in res32.deltas.items()},
        {k: np.asarray(v) for k, v in res32.lambdas.items()},
        np.asarray(res32.prices),
        psi_claimed=np.asarray(res32.psi),
    )
    out = refine(compiled, obj, res32, target_gap=1e-6)
    assert out.certificate.gap_rel < cert32.gap_rel
    assert out.certificate.gap_rel <= 1e-6
