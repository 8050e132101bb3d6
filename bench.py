"""Headline benchmark: consensus-ADMM iteration throughput at 100k pools.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Convention (BASELINE.md): the reference publishes no performance numbers —
its solver stack (cvxpy->ECOS) is serial CPU and cannot represent this
scale at all.  The north-star (BASELINE.json) is a certified 100k-pool
solve in <1s; routing problems of this class converge in ~500 ADMM
iterations, so the baseline bar is 500 iterations/s on the full 100k-pool
network.  vs_baseline = value / 500 (>1 beats the north-star rate).

Run on the TPU (never enables x64).  Also sanity-checks correctness on the
three reference workloads before timing; a bench that prints numbers from
a wrong solver is meaningless.
"""
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

N_ASSETS = 256
N_POOLS = 100_000
FIXED_ITERS = 500


def _sanity() -> bool:
    from cfmm_routing_tpu.models.reference_instances import (
        arbitrage_instance,
        liquidation_instance,
        two_asset_instance,
    )
    from cfmm_routing_tpu.solver.admm import AdmmOptions, AdmmSolver
    from cfmm_routing_tpu.solver.compiler import compile_spec

    opts = AdmmOptions(max_iters=6000, eps_abs=2e-6, eps_rel=2e-6)
    checks = [
        (arbitrage_instance(), 21.499805, lambda r: float(r.objective)),
        (liquidation_instance(), 15.883010, lambda r: float(r.psi[4])),
        (two_asset_instance(25.0), 31.005495, lambda r: float(r.objective)),
    ]
    ok = True
    for (spec, obj), pin, get in checks:
        s = AdmmSolver(compile_spec(spec), dtype=jnp.float32, options=opts)
        v = get(s.solve(obj))
        rel = abs(v - pin) / abs(pin)
        ok &= rel < 5e-3  # f32 on-device tolerance; f64 refine closes the rest
        print(f"# sanity: {v:.6f} vs {pin} (rel {rel:.1e})", file=sys.stderr)
    return ok


def main():
    from cfmm_routing_tpu.solver.admm import AdmmOptions, AdmmSolver
    from cfmm_routing_tpu.solver.compiler import compile_table
    from cfmm_routing_tpu.utils.synth import random_arbitrage_table

    sane = _sanity()

    table, obj = random_arbitrage_table(N_ASSETS, N_POOLS, seed=7)
    # (8-sublane x 128-lane)-aligned pool counts so the fused Pallas path
    # gets legal tiles; <=1% padding waste at this scale
    compiled = compile_table(table, pad_pools_to=1024)
    print(
        f"# {N_POOLS} pools, {N_ASSETS} assets, buckets: "
        f"{ {n: (b.m, b.width) for n, b in compiled.buckets.items()} }",
        file=sys.stderr,
    )

    # fixed-iteration mode: eps=0 never converges early
    opts = AdmmOptions(max_iters=FIXED_ITERS, eps_abs=0.0, eps_rel=0.0, adapt_rho=False)
    solver = AdmmSolver(compiled, dtype=jnp.float32, options=opts)

    def time_path(label, run):
        t0 = time.time()
        res = run()
        jax.block_until_ready(res.objective)
        print(f"# {label}: compile+first solve {time.time() - t0:.1f}s", file=sys.stderr)
        times = []
        for _ in range(3):
            t0 = time.time()
            res = run()
            jax.block_until_ready(res.objective)
            times.append(time.time() - t0)
        best = min(times)
        ips = FIXED_ITERS / best
        print(
            f"# {label}: {FIXED_ITERS} iters in {best:.3f}s -> {ips:.1f} it/s; "
            f"obj={float(res.objective):.3f} r={float(res.r_norm):.2e}",
            file=sys.stderr,
        )
        return ips, res

    ips_classic, res_c = time_path("classic", lambda: solver.solve(obj))
    ips_fused, res_f = time_path(
        "fused", lambda: solver.solve_fused(obj, iters=FIXED_ITERS - 1)
    )
    # the two paths run the identical iteration; objectives must agree
    rel = abs(float(res_f.objective) - float(res_c.objective)) / max(
        1.0, abs(float(res_c.objective))
    )
    if rel > 1e-3:
        print(f"# WARNING fused/classic objective mismatch rel={rel:.2e}",
              file=sys.stderr)
        sane = False

    value = max(ips_classic, ips_fused) if sane else 0.0
    print(
        json.dumps(
            {
                "metric": "admm_iterations_per_s_100k_pools_1chip",
                "value": round(value, 2),
                "unit": "iterations/s",
                "vs_baseline": round(value / 500.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
