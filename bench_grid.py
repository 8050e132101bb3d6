"""Wall-clock-to-certified-gap benchmark grid (SURVEY.md §7.7, BASELINE).

For each (m pools, B scenarios) config this measures, on the real chip:

  * solve-seconds until the RIGOROUS host certificate (solver/certify.py)
    first reports gap_rel <= 1e-3 with relative box feasibility <= 1e-3
    (certification time itself is excluded from the solve clock and
    reported separately);
  * the host f64 refine stage's extra seconds to a certified 1e-6 gap
    (the ECOS-parity criterion behind /root/reference/arbitrage.py:82).

The reference cannot run any of these sizes: its cvxpy->ECOS stack is a
serial CPU interior-point method.  Scenario batches (B > 1) replace the
reference's 50-solve Python loop (two-asset.py:40) with ONE vmapped
device call.

Writes BENCH_GRID.md and prints one JSON line per config to stdout.
"""
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp
import numpy as np

CHUNK = 250
MAX_ITERS = 8000
GAP_F32 = 1e-3
GAP_REFINE = 1e-6


def _log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def _certify_state(solver, compiled, obj, z, nu, rho, psi):
    """Project once for exactly-feasible trades, then host-certify."""
    from cfmm_routing_tpu.solver.certify import certify

    w_out = {}
    for name, arrs in solver.buckets.items():
        nu_e = solver._bcast_nu(nu, name)
        zD, zL = z[name]
        D, L = solver._project(name, arrs, zD - nu_e, zL + nu_e)
        w_out[name] = (np.asarray(D), np.asarray(L))
    cert = certify(
        compiled, obj,
        {k: v[0] for k, v in w_out.items()},
        {k: v[1] for k, v in w_out.items()},
        np.asarray(rho * nu, np.float64),
        psi_claimed=np.asarray(psi, np.float64),
    )
    psi_scale = float(np.max(np.abs(np.asarray(psi)), initial=1.0))
    feas_rel = cert.feasibility / max(1.0, psi_scale)
    return cert, feas_rel, w_out


def _result_from_state(solver, obj, z, nu, rho, psi, w_out, iters):
    from cfmm_routing_tpu.solver.admm import RouteResult

    c = jnp.asarray(obj.c, solver.dtype)
    return RouteResult(
        objective=jnp.sum(c * psi),
        psi=psi,
        prices=rho * nu,
        deltas={k: v[0] for k, v in w_out.items()},
        lambdas={k: v[1] for k, v in w_out.items()},
        iters=jnp.asarray(iters, jnp.int32),
        r_norm=jnp.zeros((), solver.dtype),
        s_norm=jnp.zeros((), solver.dtype),
        converged=jnp.asarray(False),
        rho_final=rho,
    )


def run_config(m, n_assets, B, fused):
    from cfmm_routing_tpu.solver.admm import AdmmOptions, AdmmSolver
    from cfmm_routing_tpu.solver.compiler import compile_table
    from cfmm_routing_tpu.solver.driver import ChunkedDriver
    from cfmm_routing_tpu.solver.refine import refine
    from cfmm_routing_tpu.utils.synth import random_arbitrage_table

    table, obj = random_arbitrage_table(n_assets, m, seed=7)
    # 1024-pool padding at EVERY size: the fused kernel's compiled tiles
    # must be 8-sublane aligned (rows < 8 hangs the Mosaic compiler)
    compiled = compile_table(table, pad_pools_to=1024)
    opts = AdmmOptions(max_iters=10**6, eps_abs=0.0, eps_rel=0.0)
    solver = AdmmSolver(compiled, dtype=jnp.float32, options=opts)
    drv = ChunkedDriver(solver, chunk=CHUNK, fused=fused)

    c = jnp.asarray(obj.c, jnp.float32)
    lo = jnp.asarray(np.maximum(obj.lo, -3e38), jnp.float32)
    hi = jnp.asarray(np.minimum(obj.hi, 3e38), jnp.float32)
    z = {
        nm: (jnp.zeros_like(a["mask"]), jnp.zeros_like(a["mask"]))
        for nm, a in solver.buckets.items()
    }
    nu = jnp.zeros((solver.n,), jnp.float32)
    rho = jnp.float32(1.0)

    # warmup-compile the chunk program outside the clock
    _log(f"m={m}: compiling chunk program (fused={fused})...")
    t0 = time.perf_counter()
    zw, nuw, *_ = drv._chunk_jit(z, nu, rho, c, lo, hi, None)
    jax.block_until_ready(nuw)
    _log(f"m={m}: chunk compile {time.perf_counter() - t0:.1f}s")

    solve_s = 0.0
    cert_s = 0.0
    iters = 0
    gap = feas = float("inf")
    cert = None
    while iters < MAX_ITERS:
        t0 = time.perf_counter()
        z, nu, r2, s2, w2, z2, u2, psi, objv = drv._chunk_jit(
            z, nu, rho, c, lo, hi, None
        )
        jax.block_until_ready(psi)
        solve_s += time.perf_counter() - t0
        iters += CHUNK
        r = float(jnp.sqrt(r2))
        s = float(jnp.sqrt(s2))
        if r > 3.0 * s:
            rho, nu = rho * 2.0, nu / 2.0
        elif s > 3.0 * r:
            rho, nu = rho / 2.0, nu * 2.0
        t0 = time.perf_counter()
        cert, feas, w_out = _certify_state(solver, compiled, obj, z, nu, rho, psi)
        cert_s += time.perf_counter() - t0
        gap = cert.gap_rel
        _log(
            f"m={m} B=1 it={iters}: r={r:.2e} s={s:.2e} gap={gap:.2e} "
            f"feas_rel={feas:.2e} solve={solve_s:.2f}s"
        )
        if gap <= GAP_F32 and feas <= GAP_F32:
            break

    row = dict(
        m=m, n_assets=n_assets, B=1, iters_to_1e3=iters,
        solve_s_to_1e3=round(solve_s, 3), certify_s=round(cert_s, 3),
        gap=float(gap), feas_rel=float(feas),
    )

    # ---- host f64 refine to 1e-6 -------------------------------------------
    res32 = _result_from_state(solver, obj, z, nu, rho, psi, w_out, iters)
    t0 = time.perf_counter()
    ref = refine(compiled, obj, res32, target_gap=GAP_REFINE)
    refine_s = time.perf_counter() - t0
    row.update(
        refine_s_to_1e6=round(refine_s, 3),
        refine_iters=ref.iters,
        refined_gap=float(ref.certificate.gap_rel),
        certified_1e6=bool(ref.achieved),
    )
    _log(
        f"m={m}: refine {refine_s:.2f}s ({ref.iters} f64 iters) -> "
        f"gap {ref.certificate.gap_rel:.2e}"
    )

    rows = [row]

    # ---- scenario batch: B sweeps as ONE vmapped device call ----------------
    if B > 1:
        rng = np.random.default_rng(3)
        scale = rng.uniform(0.8, 1.25, size=(B, 1))
        cB = jnp.asarray(np.asarray(obj.c)[None, :] * scale, jnp.float32)
        loB = jnp.tile(lo[None, :], (B, 1))
        hiB = jnp.tile(hi[None, :], (B, 1))
        opts_b = AdmmOptions(
            max_iters=max(iters, CHUNK), eps_abs=0.0, eps_rel=0.0,
            adapt_rho=False,
        )
        solver_b = AdmmSolver(compiled, dtype=jnp.float32, options=opts_b)
        out = solver_b.solve_batch(cB, loB, hiB)  # compile warmup
        jax.block_until_ready(out.objective)
        t0 = time.perf_counter()
        out = solver_b.solve_batch(cB, loB, hiB)
        jax.block_until_ready(out.objective)
        batch_s = time.perf_counter() - t0
        rows.append(
            dict(
                m=m, n_assets=n_assets, B=B, iters=int(out.iters[0]),
                batch_solve_s=round(batch_s, 3),
                per_scenario_s=round(batch_s / B, 4),
                objective_mean=float(jnp.mean(out.objective)),
            )
        )
        _log(f"m={m} B={B}: {batch_s:.2f}s total, {batch_s/B:.3f}s/scenario")
    return rows


def main():
    grid = [
        # (m, n_assets, B, fused)
        (1_000, 64, 50, True),
        (10_000, 64, 50, True),
        (100_000, 256, 1, True),
    ]
    all_rows = []
    for m, n, B, fused in grid:
        try:
            all_rows.extend(run_config(m, n, B, fused))
        except Exception:
            _log(f"config m={m} B={B} FAILED:")
            for line in traceback.format_exc().splitlines():
                _log("  " + line)
    for row in all_rows:
        print(json.dumps(row), flush=True)

    lines = [
        "# Wall-clock-to-certified-gap grid (single v5e chip + host refine)",
        "",
        "f32 on-device solve to certified gap<=1e-3 (rigorous dual bound,",
        "relative box feasibility <=1e-3), then host f64 refine to 1e-6.",
        "",
        "| pools | assets | B | iters | solve s (to 1e-3) | refine s (to 1e-6) | final gap |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in all_rows:
        if r.get("B", 1) == 1:
            lines.append(
                f"| {r['m']} | {r['n_assets']} | 1 | {r['iters_to_1e3']} | "
                f"{r['solve_s_to_1e3']} | {r.get('refine_s_to_1e6', '-')} | "
                f"{r.get('refined_gap', r['gap']):.1e} |"
            )
        else:
            lines.append(
                f"| {r['m']} | {r['n_assets']} | {r['B']} | {r['iters']} | "
                f"{r['batch_solve_s']} ({r['per_scenario_s']}/scenario) | - | - |"
            )
    with open("BENCH_GRID.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    _log("wrote BENCH_GRID.md")


if __name__ == "__main__":
    main()
