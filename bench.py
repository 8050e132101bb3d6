"""Headline benchmark: consensus-ADMM iteration throughput at 100k pools.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Convention (BASELINE.md): the reference publishes no performance numbers —
its solver stack (cvxpy->ECOS, ``/root/reference/arbitrage.py:82``) is
serial CPU and cannot represent this scale at all.  The north-star
(BASELINE.json) is a certified 100k-pool solve in <1s; routing problems of
this class converge in ~500 ADMM iterations, so the baseline bar is 500
iterations/s on the full 100k-pool network.  vs_baseline = value / 500
(>1 beats the north-star rate).

Hardening (round-1 post-mortem): every stage is individually guarded — a
kernel failure on one path can NEVER destroy the other path's measurement
or the final JSON line; the persistent XLA compilation cache is configured
so repeat runs skip the multi-minute remote compiles; the sanity gate runs
first but only annotates (a wrong solver zeroes vs_baseline, it does not
crash the bench).

Modes:
  python bench.py            headline: it/s at 100k pools / 256 assets
  python bench.py --grid     wall-clock-to-gap grid (see bench_grid.py)
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

N_ASSETS = 256
N_POOLS = 100_000
FIXED_ITERS = 500
REPEATS = 3


def _log(msg: str) -> None:
    print(f"# {msg}", file=sys.stderr, flush=True)


def _guard(label, fn, default=None):
    """Run fn(); on ANY exception log the traceback and return default."""
    try:
        return fn()
    except Exception:
        _log(f"{label} FAILED:")
        for line in traceback.format_exc().splitlines():
            _log(f"  {line}")
        return default


def _sanity() -> bool:
    """Correctness gate on the three reference workloads (pins from
    BASELINE.md; ground truth behind /root/reference/{arbitrage,
    liquidation,two-asset}.py prints).

    Two-stage: the f32 on-device solve must land within 5e-3 of the pin,
    then the DEVICE-RESIDENT refinement (solver/refine_device.py — f32
    correction solves on the same chip, rigorous f64 certificates) must
    certify <=1e-7 relative gap from that f32 iterate (the ECOS-parity
    criterion) and match the pin to 2e-6."""
    from cfmm_routing_tpu.models.reference_instances import (
        arbitrage_instance,
        liquidation_instance,
        two_asset_instance,
    )
    from cfmm_routing_tpu.solver.admm import AdmmOptions, AdmmSolver
    from cfmm_routing_tpu.solver.compiler import compile_spec
    from cfmm_routing_tpu.solver.refine_device import refine_device

    opts = AdmmOptions(max_iters=6000, eps_abs=2e-6, eps_rel=2e-6)
    checks = [
        ("arbitrage", arbitrage_instance(), 21.499805, lambda r: float(r.objective)),
        ("liquidation", liquidation_instance(), 15.883010, lambda r: float(r.psi[4])),
        ("two-asset t=25", two_asset_instance(25.0), 31.005495,
         lambda r: float(r.objective)),
    ]
    ok = True
    for label, (spec, obj), pin, get in checks:
        def run(spec=spec, obj=obj, get=get, pin=pin, label=label):
            s = AdmmSolver(compile_spec(spec), dtype=jnp.float32, options=opts)
            res32 = s.solve(obj)
            v32 = get(res32)
            rel32 = abs(v32 - pin) / abs(pin)
            _log(f"sanity[{label}]: f32 {v32:.6f} vs {pin} (rel {rel32:.1e})")
            ref = refine_device(s.compiled, obj, res32, target_gap=1e-7)
            v64 = get(ref.result)
            rel64 = abs(v64 - pin) / abs(pin)
            _log(
                f"sanity[{label}]: refined {v64:.9f} "
                f"cert_gap={ref.certificate.gap_rel:.2e} (rel {rel64:.1e})"
            )
            return rel32 < 5e-3 and ref.achieved and rel64 < 2e-6

        good = _guard(f"sanity[{label}]", run, default=False)
        ok &= bool(good)
    return ok


def _time_path(label, run):
    """Compile + time a solve path; returns it/s or None on failure."""
    t0 = time.time()
    res = _guard(f"{label} compile+first-solve", run)
    if res is None:
        return None, None
    jax.block_until_ready(res.objective)
    _log(f"{label}: compile+first solve {time.time() - t0:.1f}s")
    times = []
    for _ in range(REPEATS):
        t0 = time.time()
        res = _guard(f"{label} timed-solve", run)
        if res is None:
            return None, None
        jax.block_until_ready(res.objective)
        times.append(time.time() - t0)
    best = min(times)
    ips = FIXED_ITERS / best
    _log(
        f"{label}: {FIXED_ITERS} iters in {best:.3f}s -> {ips:.1f} it/s; "
        f"obj={float(res.objective):.3f} r={float(res.r_norm):.2e}"
    )
    return ips, res


def main():
    from cfmm_routing_tpu.solver.admm import AdmmOptions, AdmmSolver
    from cfmm_routing_tpu.solver.compiler import compile_table
    from cfmm_routing_tpu.utils.synth import random_arbitrage_table

    sane = bool(_guard("sanity", _sanity, default=False)) \
        if os.environ.get("BENCH_SKIP_SANITY") != "1" else True

    table, obj = random_arbitrage_table(N_ASSETS, N_POOLS, seed=7)
    # (8-sublane x 128-lane)-aligned pool counts so the fused Pallas path
    # gets legal tiles; <=1% padding waste at this scale
    compiled = compile_table(table, pad_pools_to=1024)
    _log(
        f"{N_POOLS} pools, {N_ASSETS} assets, buckets: "
        f"{ {n: (b.m, b.width) for n, b in compiled.buckets.items()} }"
    )

    # fixed-iteration mode: eps=0 never converges early.  Projection depth
    # (24,4): measured +28% fused it/s over the conservative (48,6) at an
    # objective match of 6e-7 relative (knob sweep in BENCH_GRID.md);
    # terminal accuracy is refine_device's job, not the base root-find's.
    from cfmm_routing_tpu.ops.projection import ProjectionConfig

    opts = AdmmOptions(
        max_iters=FIXED_ITERS, eps_abs=0.0, eps_rel=0.0, adapt_rho=False,
        projection=ProjectionConfig(n_bisect=24, n_polish=4),
    )
    solver = AdmmSolver(compiled, dtype=jnp.float32, options=opts)

    # fused first: it compiles in seconds and secures a headline number
    # before the classic path's multi-minute XLA compile is attempted
    ips_fused, res_f = _time_path(
        "fused", lambda: solver.solve_fused(obj, iters=FIXED_ITERS - 1)
    )
    # merged K-group variant (round 5): one launch per channel count;
    # measured +1.9% over per-bucket launches at this shape
    ips_merged, _res_m = _time_path(
        "merged",
        lambda: solver.solve_fused(obj, iters=FIXED_ITERS - 1, merged=True),
    )
    ips_classic, res_c = (None, None)
    if os.environ.get("BENCH_SKIP_CLASSIC") != "1":
        ips_classic, res_c = _time_path("classic", lambda: solver.solve(obj))

    # the two paths run the identical iteration; objectives must agree
    if res_f is not None and res_c is not None:
        rel = abs(float(res_f.objective) - float(res_c.objective)) / max(
            1.0, abs(float(res_c.objective))
        )
        if rel > 1e-3:
            _log(f"WARNING fused/classic objective mismatch rel={rel:.2e}")
            sane = False

    candidates = [
        x for x in (ips_classic, ips_fused, ips_merged) if x is not None
    ]
    value = max(candidates) if candidates and sane else 0.0
    print(
        json.dumps(
            {
                "metric": "admm_iterations_per_s_100k_pools_1chip",
                "value": round(value, 2),
                "unit": "iterations/s",
                "vs_baseline": round(value / 500.0, 3),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    if "--grid" in sys.argv:
        import bench_grid

        bench_grid.main()
    else:
        main()
