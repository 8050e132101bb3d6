"""JSON problem I/O, CLI driver, and figure rendering.

Covers the config-system and visualization components (SURVEY.md §5): the
reference hardcodes problems in source and styles plots via latexify.py;
here both are first-class, so both get tests.
"""
import json
import os
import subprocess
import sys

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

from cfmm_routing_tpu import api
from cfmm_routing_tpu.models.pools import (
    BoundedProductPool,
    ConstantSumPool,
    GeoMeanPool,
    ProductPool,
)
from cfmm_routing_tpu.models.reference_instances import (
    arbitrage_instance,
    two_asset_instance,
)
from cfmm_routing_tpu.models.utility import Objective
from cfmm_routing_tpu.solver.admm import AdmmOptions
from cfmm_routing_tpu.solver.compiler import ProblemSpec
from cfmm_routing_tpu.utils.serde import (
    load_problem,
    objective_from_json,
    spec_from_json,
    spec_to_json,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spec_json_roundtrip():
    spec = ProblemSpec(
        n_assets=4,
        pools=[
            GeoMeanPool((0, 1, 2), [4, 4, 4], [3, 2, 1], fee=0.998),
            ProductPool((0, 1), [10, 1], fee=0.997),
            ConstantSumPool((2, 3), [10, 10], fee=0.999),
            BoundedProductPool((1, 3), [1, 2], [5, 5], fee=0.997),
        ],
    )
    spec2 = spec_from_json(spec_to_json(spec))
    assert spec2.n_assets == spec.n_assets
    for a, b in zip(spec.pools, spec2.pools):
        assert type(a) is type(b)
        assert a.assets == b.assets
        np.testing.assert_allclose(a.reserves, b.reserves)
        np.testing.assert_allclose(a.weights, b.weights)
        np.testing.assert_allclose(a.shift, b.shift)
        assert a.fee == b.fee


def test_objective_json_forms():
    o = objective_from_json({"workload": "arbitrage", "market_values": [1, 2]}, 2)
    np.testing.assert_allclose(o.c, [1, 2])
    o = objective_from_json(
        {"workload": "liquidation", "numeraire": 1, "holdings": [3, 0]}, 2
    )
    assert o.lo[0] == o.hi[0] == -3.0
    o = objective_from_json({"workload": "trade", "receive": 1, "holdings": [5, 0]}, 2)
    assert o.lo[0] == -5.0 and not np.isfinite(o.hi[0])
    with pytest.raises(ValueError, match="unknown workload"):
        objective_from_json({"workload": "nope"}, 2)
    with pytest.raises(ValueError, match="unknown pool type"):
        spec_from_json({"n_assets": 1, "pools": [{"type": "weird"}]})


def _run_cli(args, **kw):
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["JAX_PLATFORMS"] = ""
    # keep CLI subprocess tests off the TPU tunnel
    env["CFMM_FORCE_CPU"] = "1"
    return subprocess.run(
        [sys.executable, "-m", "cfmm_routing_tpu", *args],
        capture_output=True,
        text=True,
        cwd=REPO,
        env=env,
        timeout=600,
        **kw,
    )


def test_cli_export_and_solve(tmp_path):
    r = _run_cli(["export-reference", "arbitrage"])
    assert r.returncode == 0, r.stderr
    doc = json.loads(r.stdout)
    assert doc["objective"]["workload"] == "arbitrage"

    path = tmp_path / "arb.json"
    path.write_text(r.stdout)
    r2 = _run_cli(
        ["solve", str(path), "--f64", "--certify", "--json", "--eps", "1e-9"]
    )
    assert r2.returncode == 0, r2.stderr
    out = json.loads(r2.stdout)
    assert abs(out["objective"] - 21.499805) < 1e-4
    assert out["certificate"]["rel_gap"] < 1e-6


def test_cli_missing_objective(tmp_path):
    spec, _ = arbitrage_instance()
    path = tmp_path / "noobj.json"
    path.write_text(spec_to_json(spec))
    r = _run_cli(["solve", str(path)])
    assert r.returncode == 2
    assert "no 'objective'" in r.stderr


def test_sweep_figures(tmp_path):
    from cfmm_routing_tpu.utils.plotting import save_sweep_figures

    spec, _ = two_asset_instance()
    sw = api.sweep(
        spec, 0, 2, np.linspace(0.0, 10.0, 4),
        options=AdmmOptions(max_iters=2000, eps_abs=1e-5, eps_rel=1e-5),
    )
    f1 = tmp_path / "flows.png"
    f2 = tmp_path / "u.png"
    save_sweep_figures(sw, str(f1), str(f2))
    assert f1.stat().st_size > 1000
    assert f2.stat().st_size > 1000
    # utilities are increasing in t (concave frontier property)
    assert np.all(np.diff(sw.utilities) > -1e-4)


def test_load_problem_roundtrip(tmp_path):
    spec, obj = arbitrage_instance()
    doc = json.loads(spec_to_json(spec))
    doc["objective"] = {"workload": "arbitrage", "market_values": obj.c.tolist()}
    path = tmp_path / "p.json"
    path.write_text(json.dumps(doc))
    spec2, obj2 = load_problem(str(path))
    assert spec2.n_assets == spec.n_assets
    np.testing.assert_allclose(obj2.c, obj.c)


def test_constant_sum_pool_accepts_generator_assets():
    """assets may be any iterable (generators included) — round-3 advisor
    fix: the default-weights length probe must not exhaust it before the
    base constructor sees it."""
    from cfmm_routing_tpu.models.pools import ConstantSumPool

    p = ConstantSumPool((a for a in (0, 1, 2)), [1.0, 2.0, 3.0])
    assert len(p.assets) == 3
    assert len(p.weights) == 3


def test_refine_strict_raises_on_degraded_cpu_shards():
    """refine(cpu_shards=N, strict=True) must error, not silently run
    single-device, when the CPU mesh cannot be built (round-3 verdict:
    'surface degraded modes loudly')."""
    import jax
    import pytest as _pytest

    from cfmm_routing_tpu.models.reference_instances import arbitrage_instance
    from cfmm_routing_tpu.solver.admm import AdmmSolver
    from cfmm_routing_tpu.solver.compiler import compile_spec
    from cfmm_routing_tpu.solver.refine import refine

    spec, obj = arbitrage_instance()
    solver = AdmmSolver(compile_spec(spec))
    res = solver.solve(obj, max_iters=5)
    res = jax.tree_util.tree_map(lambda x: np.asarray(x), res)
    with _pytest.raises(RuntimeError, match="SINGLE-DEVICE"):
        refine(
            compile_spec(spec), obj, res, target_gap=1e-30,
            cpu_shards=10_000, strict=True,
        )


def test_api_refine_to_certified_route():
    """arbitrage(refine_to=1e-7) returns a certificate-carrying Route at
    the pinned optimum — the one-call ECOS-terminal-accuracy surface."""
    from cfmm_routing_tpu import api
    from cfmm_routing_tpu.models.reference_instances import arbitrage_instance

    spec, obj = arbitrage_instance()
    route = api.arbitrage(spec, obj.c, refine_to=1e-7)
    assert route.certificate is not None
    assert route.converged
    assert abs(route.certificate.gap_rel) <= 1e-7
    assert abs(route.objective - 21.499805) / 21.499805 < 1e-6
    # per-pool trades are unbucketed in spec order
    assert len(route.deltas) == len(spec.pools)


def test_api_refine_to_preconditioned():
    """refine_to composes with precondition=True: refinement runs in
    equilibrated space, the certificate speaks original units."""
    from cfmm_routing_tpu import api
    from cfmm_routing_tpu.models.reference_instances import (
        liquidation_instance,
    )

    spec, obj = liquidation_instance()
    route = api.liquidate(
        spec, [2, 1, 3, 5, 10], numeraire=4,
        precondition=True, refine_to=1e-6,
    )
    assert route.converged
    assert abs(route.certificate.gap_rel) <= 1e-6
    assert abs(route.psi[4] - 15.883010) / 15.883010 < 1e-5


def test_cli_refine_to(tmp_path):
    """solve --refine-to 1e-6 certifies via the device-resident
    refinement and reports the certificate in the JSON output."""
    r = _run_cli(["export-reference", "arbitrage"])
    assert r.returncode == 0, r.stderr
    path = tmp_path / "arb.json"
    path.write_text(r.stdout)
    r2 = _run_cli(["solve", str(path), "--refine-to", "1e-6", "--json"])
    assert r2.returncode == 0, r2.stderr
    out = json.loads(r2.stdout)
    assert abs(out["objective"] - 21.499805) < 1e-4
    assert abs(out["certificate"]["rel_gap"]) <= 1e-6
    assert out["converged"] is True


def test_sweep_refine_to_certifies_every_point():
    """sweep(refine_to=...): every frontier point gets a certified gap
    (the reference's 50 serial ECOS solves each certify — here one
    batched solve + per-point device refinement)."""
    spec, _ = two_asset_instance()
    sw = api.sweep(
        spec, 0, 2, np.linspace(0.0, 25.0, 4), refine_to=1e-6,
    )
    assert sw.certificates is not None and len(sw.certificates) == 4
    for cert in sw.certificates:
        assert abs(cert.gap_rel) <= 1e-6
        assert cert.feasibility_rel <= 1e-6
    # the refined frontier still matches the pinned u(25)
    np.testing.assert_allclose(sw.utilities[-1], 31.005495, rtol=1e-5)
    # frontier stays nondecreasing after refinement
    assert np.all(np.diff(sw.utilities) > -1e-6)
