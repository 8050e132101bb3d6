"""All consensus-exchange strategies must produce identical solves.

'scatter', 'onehot', and 'radix' are pure implementation choices for the
same two linear maps (broadcast nu to edges; reduce edges to assets) —
results must agree to roundoff on every problem, including n not a
multiple of the 128 radix.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from cfmm_routing_tpu.models.reference_instances import (
    arbitrage_instance,
    liquidation_instance,
)
from cfmm_routing_tpu.solver.admm import AdmmOptions, AdmmSolver
from cfmm_routing_tpu.solver.compiler import compile_table, compile_spec
from cfmm_routing_tpu.utils.synth import random_arbitrage_table

MODES = ["scatter", "onehot", "radix"]


def _solve(compiled, obj, mode, iters=300):
    opts = AdmmOptions(
        max_iters=iters, eps_abs=1e-12, eps_rel=1e-12, consensus=mode
    )
    s = AdmmSolver(compiled, dtype=jnp.float64, options=opts)
    return s.solve(obj)


@pytest.mark.parametrize("instance", [arbitrage_instance, liquidation_instance])
def test_modes_agree_reference(instance):
    spec, obj = instance()
    compiled = compile_spec(spec)
    base = _solve(compiled, obj, "scatter")
    for mode in MODES[1:]:
        res = _solve(compiled, obj, mode)
        np.testing.assert_allclose(
            np.asarray(res.psi), np.asarray(base.psi), atol=1e-9,
            err_msg=mode,
        )


@pytest.mark.parametrize("n_assets", [200, 300])
def test_modes_agree_synthetic_nonaligned_n(n_assets):
    """n not a multiple of 128 exercises the radix padding path."""
    table, obj = random_arbitrage_table(n_assets, 700, seed=2)
    compiled = compile_table(table)
    base = _solve(compiled, obj, "scatter", iters=120)
    for mode in MODES[1:]:
        res = _solve(compiled, obj, mode, iters=120)
        np.testing.assert_allclose(
            np.asarray(res.psi), np.asarray(base.psi), atol=1e-8,
            err_msg=mode,
        )
        np.testing.assert_allclose(
            np.asarray(res.prices), np.asarray(base.prices), atol=1e-8,
            err_msg=mode,
        )


def test_auto_mode_selection():
    table, obj = random_arbitrage_table(1024, 300, seed=0)
    s = AdmmSolver(
        compile_table(table), dtype=jnp.float32,
        options=AdmmOptions(max_iters=5, consensus="auto"),
    )
    assert s.consensus == "radix"
    spec, _ = arbitrage_instance()
    s2 = AdmmSolver(
        compile_spec(spec), dtype=jnp.float32,
        options=AdmmOptions(max_iters=5, consensus="auto"),
    )
    assert s2.consensus == "onehot"
