"""Compiled-on-TPU Pallas smoke tests (skipped when no TPU is attached).

Round-1 post-mortem: every Pallas kernel test ran ``interpret=True`` on
CPU, which cannot catch Mosaic tiling or VMEM-limit errors — and exactly
such an error (scoped VMEM 17.22M > 16M at the flagship bench config)
shipped to production.  This test launches the real kernels compiled for
the TPU at bench-shaped tiles: one ``fused_step``-based solve and one
``project_gm_pallas``/``project_cs_pallas`` pair at m=4096 pools,
n_assets=256, mixed bucket widths K in {2,3,4}.

The TPU work runs in a SUBPROCESS with a clean JAX config: the test suite
enables x64 globally (conftest.py) and f64 programs must never reach the
TPU backend (they hang the remote worker).  The subprocess also keeps the
suite's CPU pinning from leaking into the TPU run, and isolates the
single-chip claim (it is released when the subprocess exits).
"""
import os
import subprocess
import sys

import pytest

import jax


def _has_tpu() -> bool:
    try:
        return any(d.platform == "tpu" for d in jax.devices())
    except RuntimeError:
        return False


_SCRIPT = r"""
import os, sys
sys.path.insert(0, os.getcwd())
import jax
jax.config.update(
    "jax_compilation_cache_dir", os.path.join(os.getcwd(), ".jax_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
import jax.numpy as jnp
import numpy as np

assert jax.default_backend() == "tpu", jax.default_backend()

# ---- 1) fused-kernel solve parity vs the classic XLA path ---------------
from cfmm_routing_tpu.solver.admm import AdmmOptions, AdmmSolver
from cfmm_routing_tpu.solver.compiler import compile_table
from cfmm_routing_tpu.utils.synth import random_arbitrage_table

table, obj = random_arbitrage_table(256, 4096, seed=7)
compiled = compile_table(table, pad_pools_to=1024)
opts = AdmmOptions(max_iters=120, eps_abs=0.0, eps_rel=0.0, adapt_rho=False)
solver = AdmmSolver(compiled, dtype=jnp.float32, options=opts)
rc = solver.solve(obj)
rf = solver.solve_fused(obj, iters=119)
oc, of = float(rc.objective), float(rf.objective)
rel = abs(of - oc) / max(1.0, abs(oc))
assert rel < 1e-4, f"fused/classic objective mismatch: {of} vs {oc} (rel {rel:.2e})"
assert abs(float(rf.r_norm) - float(rc.r_norm)) < 1e-2 * max(
    1.0, float(rc.r_norm)
), (float(rf.r_norm), float(rc.r_norm))
print(f"fused-solve-parity OK rel={rel:.2e}")

# ---- 2) projection kernels compiled at bench-shaped tiles ----------------
from cfmm_routing_tpu.ops.projection import ProjectionConfig, project_cs, project_gm
from cfmm_routing_tpu.ops.projection_pallas import (
    project_cs_pallas,
    project_gm_pallas,
)

CFG = ProjectionConfig()
rng = np.random.default_rng(0)
for K in (2, 4):
    m = 4096
    R = rng.uniform(0.3, 40.0, size=(K, m))
    w = rng.uniform(0.5, 4.0, size=(K, m))
    mask = np.ones((K, m)); s = np.zeros((K, m))
    w = w / w.sum(axis=0, keepdims=True)
    gamma = rng.uniform(0.9, 1.0, size=m)
    p = rng.uniform(-6, 6, size=(K, m)); q = rng.uniform(-6, 6, size=(K, m))
    logk0 = np.sum(w * np.log(R), axis=0)
    args = tuple(
        jnp.asarray(a, jnp.float32)
        for a in (p, q, R, w, s, gamma, logk0, np.exp(logk0), mask)
    )
    D0, L0 = project_gm(*args, needs_floor=False, cfg=CFG)
    D1, L1 = project_gm_pallas(*args, needs_floor=False, cfg=CFG)
    np.testing.assert_allclose(np.asarray(D1), np.asarray(D0), atol=5e-4)
    np.testing.assert_allclose(np.asarray(L1), np.asarray(L0), atol=5e-4)
    print(f"gm-projection K={K} OK")

K, m = 3, 4096
R = rng.uniform(0.3, 30.0, size=(K, m))
mask = np.ones((K, m)); gamma = rng.uniform(0.9, 1.0, size=m)
p = rng.uniform(-8, 8, size=(K, m)); q = rng.uniform(-8, 8, size=(K, m))
args = tuple(
    jnp.asarray(a, jnp.float32)
    for a in (p, q, R, gamma, np.ones((K, m)), R.sum(axis=0), mask)
)
D0, L0 = project_cs(*args, cfg=CFG)
D1, L1 = project_cs_pallas(*args, cfg=CFG)
np.testing.assert_allclose(np.asarray(D1), np.asarray(D0), atol=5e-4)
np.testing.assert_allclose(np.asarray(L1), np.asarray(L0), atol=5e-4)
print("cs-projection OK")
print("TPU-COMPILED-SMOKE-PASS")
"""


@pytest.mark.skipif(
    not _has_tpu() or os.environ.get("CFMM_SKIP_TPU_TESTS") == "1",
    reason="no TPU attached (or CFMM_SKIP_TPU_TESTS=1)",
)
def test_tpu_compiled_smoke():
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_ENABLE_X64")
    }
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
        capture_output=True,
        text=True,
        timeout=560,
    )
    assert proc.returncode == 0, (
        f"TPU smoke subprocess failed (rc={proc.returncode})\n"
        f"--- stdout ---\n{proc.stdout}\n--- stderr ---\n{proc.stderr[-4000:]}"
    )
    assert "TPU-COMPILED-SMOKE-PASS" in proc.stdout
