"""Wall-clock-to-certified-gap benchmark grid (SURVEY.md §7.7, BASELINE).

For each network size this measures, on the real chip:

  * the equilibrated f32 on-device solve (per-asset power-of-two unit
    scaling, solver/precondition.py; fused Pallas chunks) run to its f32
    floor under the RIGOROUS host certificate — evaluated in ORIGINAL
    units on the un-scaled problem (solver/certify.py, f64 dual bound
    valid for any prices; |gap| <= eps AND feas_rel <= eps, the
    ECOS-parity criterion behind /root/reference/arbitrage.py:82);
  * then the DEVICE-RESIDENT mixed-precision refinement
    (solver/refine_device.py) closes the remaining decades to a
    certified 1e-6 on the same chip — one ~250-iteration correction
    solve at every measured size;
  * scenario batches: B objective scenarios as ONE vmapped device call
    (replaces the reference's 50-solve Python loop, two-asset.py:40) and
    B per-pool reserve states via solve_batch_reserves (BASELINE
    config 5).

Writes BENCH_GRID.md and prints one JSON line per config to stdout.
"""
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# the host f64 refine stage shards over virtual CPU devices (SPMD across
# cores); the flag must be set before jax initializes. The TPU backend is
# unaffected.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp
import numpy as np

# 250-iteration chunks, gate FINISHED every 2nd chunk: each DeviceGate
# host pass costs one tunnel fetch (~0.15 s) regardless of problem
# size, so finishing a gate per 250-iteration chunk (0.06-0.11 s of
# device work) left the gated loop HOST-bound — e2e at 1k pools
# measured 4.08 s against a 1.13 s solve+refine.  Doubling CHUNK to 500
# instead halved the rho-adaptation cadence and the 100k handoff slid
# from ~2.2k to 9.5k iterations — adaptation needs the 250 cadence;
# only the HOST gate work is worth thinning.
CHUNK = 250
GATE_EVERY = 2  # finish one gate per this many chunks
MAX_ITERS = 12_000
GAP_LOOSE = 1e-3
GAP_TIGHT = 1e-6


def _log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def _certify_orig(solver, compiled_eq, compiled_orig, obj, d, z, nu, rho, psi,
                  timing=None):
    """Project once for exactly-feasible trades (scaled space), un-scale to
    original units, and run the rigorous certificate there.  Returns the
    certificate plus BOTH the original-units and scaled trades (the
    device-refine stage re-centers in scaled space)."""
    from cfmm_routing_tpu.solver.certify import certify

    t0 = time.perf_counter()
    d_ext = np.concatenate([d, [1.0]])
    w_dev = {}
    for name, arrs in solver.buckets.items():
        nu_e = solver._bcast_nu(nu, name)
        zD, zL = z[name]
        w_dev[name] = solver._project(name, arrs, zD - nu_e, zL + nu_e)
    # ONE batched device->host fetch: per-leaf np.asarray is a separate
    # round trip per plane and latency-bound over the remote tunnel
    w_scaled = jax.device_get(w_dev)
    w_out = {}
    for name in w_scaled:
        ds = d_ext[compiled_eq.buckets[name].asset].T  # (K, m)
        D, L = w_scaled[name]
        w_out[name] = (D * ds, L * ds)
    if timing is not None:
        timing["project+transfer"] = time.perf_counter() - t0
        t0 = time.perf_counter()
    cert = certify(
        compiled_orig, obj,
        {k: v[0] for k, v in w_out.items()},
        {k: v[1] for k, v in w_out.items()},
        np.asarray(rho * nu, np.float64) / d,
        psi_claimed=np.asarray(psi, np.float64) * d,
    )
    if timing is not None:
        timing["certify_f64"] = time.perf_counter() - t0
    return cert, w_out, w_scaled


def run_config(m, n_assets, B, fused):
    from cfmm_routing_tpu.solver.admm import AdmmOptions, AdmmSolver, RouteResult
    from cfmm_routing_tpu.solver.compiler import compile_table
    from cfmm_routing_tpu.solver.driver import ChunkedDriver
    from cfmm_routing_tpu.solver.precondition import equilibrate
    from cfmm_routing_tpu.utils.synth import random_arbitrage_table

    table, obj = random_arbitrage_table(n_assets, m, seed=7)
    eq = equilibrate(table, obj)
    # 1024-pool padding at EVERY size: the fused kernel's compiled tiles
    # must be 8-sublane aligned (rows < 8 hangs the Mosaic compiler)
    compiled = compile_table(eq.table, pad_pools_to=1024)
    compiled_orig = compile_table(table, pad_pools_to=1024)
    from cfmm_routing_tpu.ops.projection import ProjectionConfig

    # (24,4) root-find: measured +28% fused it/s at objective parity; the
    # device refinement stage owns terminal accuracy (its delta
    # projections keep the deep default)
    opts = AdmmOptions(
        max_iters=10**6, eps_abs=0.0, eps_rel=0.0,
        projection=ProjectionConfig(n_bisect=24, n_polish=4),
    )
    solver = AdmmSolver(compiled, dtype=jnp.float32, options=opts)
    drv = ChunkedDriver(solver, chunk=CHUNK, fused=fused)

    c = jnp.asarray(eq.objective.c, jnp.float32)
    lo = jnp.asarray(np.maximum(eq.objective.lo, -3e38), jnp.float32)
    hi = jnp.asarray(np.minimum(eq.objective.hi, 3e38), jnp.float32)
    z = {
        nm: (jnp.zeros_like(a["mask"]), jnp.zeros_like(a["mask"]))
        for nm, a in solver.buckets.items()
    }
    nu = jnp.zeros((solver.n,), jnp.float32)
    rho = jnp.float32(1.0)

    # warmup-compile the chunk program outside the clock
    _log(f"m={m}: compiling chunk program (fused={fused})...")
    t0 = time.perf_counter()
    zw, nuw, _r2w, _s2w, _w2w, _z2w, _u2w, psi_w, _objw = drv._chunk_jit(
        z, nu, rho, c, lo, hi, None
    )
    jax.block_until_ready(nuw)
    _log(f"m={m}: chunk compile {time.perf_counter() - t0:.1f}s")

    # warmup-compile the DELTA refinement programs outside the clock too
    # (same jitted programs serve every pass/eps — the delta arrays are
    # traced arguments; a fresh process otherwise pays the compiles
    # inside refine_s).  The refinement runs the FUSED delta path on TPU
    # (round 5), whose n_iters is a static arg: warm with the real chunk
    # size, cold-chunk AND warm-chunk programs.
    import dataclasses as _dc

    from cfmm_routing_tpu.solver.refine_device import DeltaAdmmSolver

    dopts = _dc.replace(
        opts, max_iters=CHUNK, eps_abs=1e-8, eps_rel=1e-8, adapt_rho=False,
        projection=AdmmOptions().projection,
    )
    dsolver = DeltaAdmmSolver(compiled, dtype=jnp.float32, options=dopts)
    t0 = time.perf_counter()
    dummy = RouteResult(
        objective=jnp.zeros(()),
        psi=np.zeros(solver.n),
        prices=np.zeros(solver.n),
        deltas={nm: np.zeros(a["mask"].shape) for nm, a in solver.buckets.items()},
        lambdas={nm: np.zeros(a["mask"].shape) for nm, a in solver.buckets.items()},
        iters=np.asarray(0, np.int32), r_norm=np.zeros(()),
        s_norm=np.zeros(()), converged=np.asarray(False),
        rho_final=np.asarray(1.0),
    )
    from cfmm_routing_tpu.solver.refine_device import _delta_objective

    bdict_w, _ = dsolver.delta_buckets(dummy, 1.0, nu0=np.zeros(solver.n))
    dobj_w = _delta_objective(eq.objective, np.zeros(solver.n), 1.0)
    # refine_device runs 250-iteration chunks (its measured-good
    # cadence, independent of the solve loop's CHUNK) — warm THAT
    # program (n_iters is a static arg: a CHUNK-sized warm leaves the
    # refine stage recompiling inside the timed region, measured 12 s)
    dres_w = dsolver.solve_delta(
        dobj_w, bdict_w, np.zeros(solver.n), 1.0,
        250 if fused else 1, fused=fused,
    )
    jax.block_until_ready(dres_w.objective)
    dres_w2 = dsolver.solve_delta(
        dobj_w, bdict_w, np.zeros(solver.n), 1.0,
        250 if fused else 1, fused=fused,
        warm=jax.tree_util.tree_map(np.asarray, dres_w),
    )
    jax.block_until_ready(dres_w2.objective)
    _log(f"m={m}: delta programs (fused={fused}) compile "
         f"{time.perf_counter() - t0:.1f}s")

    # warm the certificate paths: the full f64 pass (device projection +
    # transfers) and the per-chunk DEVICE GATE (primal residuals on
    # device + prices-only f64 dual bound on host, solver/residuals.py)
    from cfmm_routing_tpu.solver.residuals import DeviceGate

    t0 = time.perf_counter()
    _certify_orig(solver, compiled, compiled_orig, obj, eq.d, z, nu, rho, psi_w)
    gate = DeviceGate(solver, compiled_orig, obj, d=eq.d)
    gate.finish(gate.evaluate(z, nu, rho))
    _log(f"m={m}: certificate paths warm {time.perf_counter() - t0:.1f}s")

    solve_s = 0.0
    cert_s = 0.0  # HOST certificate work (gate finishes + full passes) —
    #               overlapped with device chunks; the wall clock is
    #               tracked separately (e2e_s)
    iters = 0
    loose = None  # (iters, solve_s) at first gate-estimated 1e-3
    tight = None  # at first CONFIRMED (full f64) 1e-6
    cert = None
    w_out = None
    w_scaled = None
    # Round-5 certification structure: the primal side of every in-loop
    # pass runs ON DEVICE (solver/residuals.DeviceGate — projection,
    # net trade, objective, feasibility residuals, in original units via
    # the fp-exact power-of-two scales) and only the (n,)-price vector
    # crosses to host for the RIGOROUS f64 dual bound.  The gate is
    # dispatched right after each chunk and its host half is processed
    # while the NEXT chunk runs on device, so certification is off the
    # critical path.  A FULL f64 host certificate (certify.certify) is
    # paid only to CONFIRM an accept/handoff decision.
    r_min = float("inf")
    r_stall = 0
    pending = None  # (iters, z, nu, rho, solve_s, gate_out) one chunk back
    handoff = False

    def _host_gate(pend):
        nonlocal cert_s, loose, tight, cert, w_out, w_scaled, handoff, r_stall
        it_p, z_p, nu_p, rho_p, solve_p, go_p = pend
        tc = time.perf_counter()
        est = gate.finish(go_p)
        cert_s += time.perf_counter() - tc
        score = est.score
        _log(
            f"m={m} it={it_p}: gate gap={est.gap_rel:.2e} "
            f"feas={est.feasibility_rel:.2e} solve={solve_p:.2f}s"
        )
        if loose is None and score <= GAP_LOOSE:
            loose = (it_p, solve_p)
        floor_suspect = loose is not None and r_stall >= 12
        # handoff wants a near-converged DUAL, not just a small score:
        # the base solve (full rho, adaptation) converges the prices,
        # while the delta solve closes feasibility decades fast but a
        # POSITIVE gap only slowly (measured round 5: a gap +1.05e-5 /
        # feas 7.7e-5 entry burned 6000 refine iterations and stalled at
        # 4.2e-6, while round-4-style entries — gap ~ -5e-6, feas ~7e-5
        # — refine in one 250-iteration chunk).  Small negative gaps are
        # accepted (value overshoot from residual infeasibility, which
        # refinement repairs on the feasibility side) but LARGE overshoot
        # (< -1.5e-5) means the iterate is still rough everywhere
        # (measured: a -2.6e-5 entry at 1k cost 2510 refine iterations,
        # a -7.7e-6 entry at 100k cost 502).
        confirm = (
            score <= GAP_TIGHT
            or (
                loose is not None
                and est.gap_rel <= 5e-6
                and est.gap_rel >= -1.5e-5
                and est.feasibility_rel <= 1.5e-4
            )
            or (floor_suspect and score <= 3e-4)
        )
        if not confirm:
            if floor_suspect:
                _log(
                    f"m={m}: residual plateau at gate score {score:.1e} "
                    "not yet refinable; continuing the base solve"
                )
                r_stall = 0
            return False
        # pay for the rigorous f64 pass only at accept/handoff
        tc = time.perf_counter()
        cert_c, w_out_c, w_scaled_c = _certify_orig(
            solver, compiled, compiled_orig, obj, eq.d, z_p, nu_p, rho_p,
            go_p["psi_solve"],
        )
        cert_s += time.perf_counter() - tc
        cert = cert_c
        w_out, w_scaled = w_out_c, w_scaled_c
        score_c = max(abs(cert.gap_rel), cert.feasibility_rel)
        _log(
            f"m={m} it={it_p}: CONFIRM gap={cert.gap_rel:.2e} "
            f"feas={cert.feasibility_rel:.2e}"
        )
        if score_c <= GAP_TIGHT:
            tight = (it_p, solve_p)
            return True
        if (
            cert.gap_rel <= 5e-6
            and cert.gap_rel >= -1.5e-5
            and cert.feasibility_rel <= 1.5e-4
        ):
            _log(
                f"m={m}: gap {cert.gap_rel:.1e} feas "
                f"{cert.feasibility_rel:.1e} refinable; handing to "
                "refine_device"
            )
            handoff = True
            return True
        if floor_suspect and score_c <= 3e-4:
            _log(f"m={m}: f32 floor at {score_c:.1e}; handing to refine_device")
            handoff = True
            return True
        return False

    t_e2e0 = time.perf_counter()
    ci = 0
    while iters < MAX_ITERS:
        t0 = time.perf_counter()
        z_n, nu_n, r2, s2, w2, z2, u2, psi, objv = drv._chunk_jit(
            z, nu, rho, c, lo, hi, None
        )
        iters += CHUNK
        ci += 1
        # dispatch a gate for THIS chunk's state every GATE_EVERY chunks
        # (async; device runs it right after the chunk), then do the
        # HELD gate's host-side work while the device is busy
        gate_out = None
        if ci % GATE_EVERY == 0:
            gate_out = dict(gate.evaluate(z_n, nu_n, rho))
            gate_out["psi_solve"] = psi
        prev = pending
        pending = None
        stop = False
        if prev is not None:
            stop = _host_gate(prev)
        if stop:
            # decisions act on the HELD snapshot; roll the state back
            # to it (the in-flight work is discarded — already
            # overlapped with the host pass)
            iters = prev[0]
            z, nu, rho = prev[1], prev[2], prev[3]
            solve_s = prev[4]
            break
        jax.block_until_ready(psi)
        solve_s += time.perf_counter() - t0
        r = float(jnp.sqrt(r2))
        s = float(jnp.sqrt(s2))
        z, nu = z_n, nu_n
        if gate_out is not None:
            pending = (iters, z_n, nu_n, rho, solve_s, gate_out)
        # never adapt off a (near-)exact f32 fixed point: r can reach
        # EXACTLY 0 there, and the s > 3r branch would then halve rho
        # every remaining chunk, handing the refine stage a collapsed
        # penalty (observed on hardware at 10k pools with r = 0.0)
        if min(r, s) > 1e-6:
            if r > 3.0 * s:
                rho, nu = rho * 2.0, nu / 2.0
            elif s > 3.0 * r:
                rho, nu = rho / 2.0, nu * 2.0
        if r < 0.9 * r_min:
            r_stall = 0
        else:
            r_stall += 1
        r_min = min(r_min, r)
    if pending is not None and tight is None and not handoff:
        _host_gate(pending)
        iters, z, nu, rho, solve_s = (
            pending[0], pending[1], pending[2], pending[3], pending[4]
        )
    if cert is None:
        cert, w_out, w_scaled = _certify_orig(
            solver, compiled, compiled_orig, obj, eq.d, z, nu, rho, psi
        )
    loop_wall_s = time.perf_counter() - t_e2e0

    row = dict(
        m=m, n_assets=n_assets, B=1, equilibrated=True,
        iters_to_1e3=(loose[0] if loose else None),
        solve_s_to_1e3=(round(loose[1], 3) if loose else None),
        iters_to_1e6=(tight[0] if tight else None),
        solve_s_to_1e6=(round(tight[1], 3) if tight else None),
        device_iters=iters, device_solve_s=round(solve_s, 3),
        certify_s_total=round(cert_s, 3),
        certify_s_per_pass=round(cert_s / max(1, iters // CHUNK), 3),
        loop_wall_s=round(loop_wall_s, 3),
        gap=float(cert.gap_rel), feas_rel=float(cert.feasibility_rel),
        certified_1e6=bool(tight is not None),
        refine_s=0.0, refine_iters=0,
    )

    if tight is None:
        # ---- DEVICE-RESIDENT refinement (solver/refine_device.py) -------
        # re-center in SCALED space on the accelerator, certify every
        # candidate in ORIGINAL units (cert_space); falls back to the
        # host f64 refine only if the base point is unusable
        from cfmm_routing_tpu.solver.precondition import unscale_result
        from cfmm_routing_tpu.solver.refine_device import refine_device

        res32_scaled = RouteResult(
            objective=jnp.asarray(float(objv)),
            psi=np.asarray(psi, np.float64),
            prices=np.asarray(rho * nu, np.float64),
            deltas={k: v[0] for k, v in w_scaled.items()},
            lambdas={k: v[1] for k, v in w_scaled.items()},
            iters=np.asarray(iters, np.int32),
            r_norm=np.zeros(()), s_norm=np.zeros(()),
            converged=np.asarray(False),
            rho_final=np.asarray(float(rho)),
        )
        t0 = time.perf_counter()
        ref = refine_device(
            compiled, eq.objective, res32_scaled, target_gap=GAP_TIGHT,
            solver=dsolver, fused=fused, entry_cert=cert,
            cert_space=(
                compiled_orig, obj,
                lambda r: unscale_result(r, eq.d, compiled),
            ),
        )
        refine_s = time.perf_counter() - t0
        row.update(
            refine_s=round(refine_s, 3), refine_iters=ref.iters,
            gap=float(ref.certificate.gap_rel),
            feas_rel=float(ref.certificate.feasibility_rel),
            certified_1e6=bool(ref.achieved),
        )
        _log(
            f"m={m}: refine_device {refine_s:.2f}s ({ref.iters} f32 device "
            f"iters) -> gap {ref.certificate.gap_rel:.2e} "
            f"feas {ref.certificate.feasibility_rel:.2e}"
        )

    rows = [row]

    # ---- certified sweep (round 5): refine_sweep + certify_batch ------------
    # the whole grid refines through ONE vmapped delta solve and ONE
    # batched f64 certificate per pass (was a serial per-point loop)
    if B > 1 and m <= 10_000:
        from cfmm_routing_tpu.solver.refine_device import refine_sweep

        # T=1024 vmapped delta solves reproducibly CRASH the remote TPU
        # worker ("kernel fault"; observed twice) — cap the certified
        # sweep at 256 points per vmapped program
        Tc = min(B, 256)
        rngs = np.random.default_rng(11)
        c_s = np.asarray(eq.objective.c)[None, :] * rngs.uniform(
            0.8, 1.25, size=(Tc, 1)
        )
        lo_s = np.tile(np.asarray(eq.objective.lo)[None, :], (Tc, 1))
        hi_s = np.full((Tc, solver.n), np.inf)
        # the delta refinement needs f32-floor entries (same contract as
        # the single-route path): solve each point to residual 1e-6.
        # Measured at T=64/1k pools: 1e-6 entries certify 64/64; 1e-5
        # entries leave refinement 16k iterations and only 33/64; 1e-7
        # entries just shift 4 s from refine into the solve.  The entry
        # solve and the refinement both run FOLDED (solver/fold.py): T
        # block-diagonal copies as one T*m-pool fused-kernel solve —
        # one launch per bucket per iteration regardless of T
        from cfmm_routing_tpu.solver.fold import solve_batch_folded

        opts_s = AdmmOptions(
            max_iters=max(2 * row["device_iters"], 4000),
            eps_abs=1e-6, eps_rel=1e-6,
            projection=ProjectionConfig(n_bisect=24, n_polish=4),
        )
        lo32 = np.maximum(lo_s, -3e38)
        hi32 = np.full((Tc, solver.n), 3e38)
        out_s = solve_batch_folded(  # warm the folded programs
            compiled, c_s, lo_s, hi32, options=opts_s, chunk=CHUNK
        )
        t0 = time.perf_counter()
        out_s = solve_batch_folded(
            compiled, c_s, lo_s, hi32, options=opts_s, chunk=CHUNK
        )
        sweep_solve_s = time.perf_counter() - t0
        # warm the folded delta programs (first refine_sweep call pays
        # ~20 s of compiles over the tunnel; the cache keeps them)
        refine_sweep(compiled, c_s, lo_s, hi_s, out_s, target_gap=GAP_TIGHT)
        t0 = time.perf_counter()
        ref_s = refine_sweep(
            compiled, c_s, lo_s, hi_s, out_s, target_gap=GAP_TIGHT,
        )
        sweep_ref_s = time.perf_counter() - t0
        n_ok = int(np.sum(ref_s.achieved))
        rows.append(
            dict(
                m=m, n_assets=n_assets, B=Tc, kind="certified_sweep",
                batch_solve_s=round(sweep_solve_s, 3),
                refine_certify_s=round(sweep_ref_s, 3),
                per_scenario_s=round((sweep_solve_s + sweep_ref_s) / Tc, 4),
                certified=n_ok,
                refine_iters=int(ref_s.iters),
            )
        )
        _log(
            f"m={m} T={Tc} certified sweep: solve {sweep_solve_s:.2f}s + "
            f"refine+certify {sweep_ref_s:.2f}s -> {n_ok}/{Tc} at 1e-6"
        )

    # ---- scenario batch: B objective scenarios as ONE vmapped call ----------
    if B > 1:
        rng = np.random.default_rng(3)
        scale = rng.uniform(0.8, 1.25, size=(B, 1))
        cB = jnp.asarray(np.asarray(eq.objective.c)[None, :] * scale, jnp.float32)
        loB = jnp.tile(lo[None, :], (B, 1))
        hiB = jnp.tile(hi[None, :], (B, 1))
        budget = row["iters_to_1e6"] or row["iters_to_1e3"] or iters
        opts_b = AdmmOptions(
            max_iters=max(budget, CHUNK), eps_abs=0.0, eps_rel=0.0,
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
                m=m, n_assets=n_assets, B=B, kind="objectives",
                iters=int(out.iters[0]),
                batch_solve_s=round(batch_s, 3),
                per_scenario_s=round(batch_s / B, 4),
                objective_mean=float(jnp.mean(out.objective)),
            )
        )
        _log(f"m={m} B={B} objectives: {batch_s:.2f}s, {batch_s/B:.4f}s/scenario")

        # ---- BASELINE config 5: B per-pool reserve states -------------------
        Br = min(B, 8) if m >= 100_000 else B
        scale_r = rng.uniform(0.7, 1.3, size=(Br, compiled.n_pools))
        out = solver_b.solve_batch_reserves(eq.objective, scale_r)
        jax.block_until_ready(out.objective)
        t0 = time.perf_counter()
        out = solver_b.solve_batch_reserves(eq.objective, scale_r)
        jax.block_until_ready(out.objective)
        rbatch_s = time.perf_counter() - t0
        rows.append(
            dict(
                m=m, n_assets=n_assets, B=Br, kind="reserve_states",
                iters=int(out.iters[0]),
                batch_solve_s=round(rbatch_s, 3),
                per_scenario_s=round(rbatch_s / Br, 4),
                objective_mean=float(jnp.mean(out.objective)),
            )
        )
        _log(
            f"m={m} B={Br} reserve states: {rbatch_s:.2f}s, "
            f"{rbatch_s/Br:.4f}s/scenario"
        )
    return rows


def run_reference_sweep():
    """The reference's OWN 50-point sweep (two-asset.py:40-91), every
    grid point refined to a certified 1e-6 — batched solve +
    refine_sweep + certify_batch (round 5)."""
    from cfmm_routing_tpu import api
    from cfmm_routing_tpu.models.reference_instances import (
        two_asset_instance,
    )
    from cfmm_routing_tpu.solver.admm import AdmmOptions

    from cfmm_routing_tpu.solver.admm import AdmmSolver
    from cfmm_routing_tpu.solver.compiler import compile_spec
    from cfmm_routing_tpu.solver.refine_device import refine_sweep

    spec, _ = two_asset_instance()
    amounts = np.linspace(0.0, 50.0, 51)
    opts = AdmmOptions(max_iters=3000, eps_abs=1e-7, eps_rel=1e-7)
    n = spec.n_assets
    T = 51
    c = np.zeros((T, n))
    c[:, 2] = 1.0
    lo = np.zeros((T, n))
    lo[:, 0] = -amounts
    hi32 = np.full((T, n), np.finfo(np.float32).max / 4)
    hi = np.full((T, n), np.inf)
    # steady-state measurement: solver programs built and warmed ONCE
    # (the reference would equally reuse its canonicalized model if it
    # could — it cannot: cvxpy re-canonicalizes per solve, two-asset.py:40)
    solver = AdmmSolver(compile_spec(spec), dtype=jnp.float32, options=opts)
    res = solver.solve_batch(c, lo, hi32)
    jax.block_until_ready(res.objective)
    refine_sweep(solver.compiled, c, lo, hi, res, target_gap=GAP_TIGHT)
    t0 = time.perf_counter()
    res = solver.solve_batch(c, lo, hi32)
    jax.block_until_ready(res.objective)
    solve_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = refine_sweep(solver.compiled, c, lo, hi, res, target_gap=GAP_TIGHT)
    refine_s = time.perf_counter() - t0
    total = solve_s + refine_s
    ok = int(np.sum(out.achieved))
    u25 = float(out.objectives[25])
    _log(
        f"reference 50-point sweep: {total:.2f}s (solve {solve_s:.2f} + "
        f"refine+certify {refine_s:.2f}), {ok}/51 certified 1e-6, "
        f"u(25)={u25:.6f} (pin 31.005495)"
    )
    return dict(
        kind="reference_sweep_certified", T=51, total_s=round(total, 3),
        solve_s=round(solve_s, 3), refine_certify_s=round(refine_s, 3),
        certified=ok, u25=u25,
    )


def main():
    grid = [
        # (m, n_assets, B, fused)
        (1_000, 64, 1024, True),
        (10_000, 64, 50, True),
        (100_000, 256, 8, True),
    ]
    all_rows = []
    try:
        all_rows.append(run_reference_sweep())
    except Exception:
        _log("reference sweep FAILED:")
        for line in traceback.format_exc().splitlines():
            _log("  " + line)
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
        "# Wall-clock-to-certified-gap grid (single v5e chip)",
        "",
        "Equilibrated (per-asset power-of-two unit scaling,",
        "`solver/precondition.py`) f32 fused-Pallas solve on one chip;",
        "certificates evaluated in ORIGINAL units against the un-scaled",
        "problem (gap = f64 dual bound valid for ANY prices; feasibility",
        "normalized PER ASSET by that asset's own trade magnitude,",
        "max(1, |psi_j|, gross volume_j) — the ECOS/SCS per-row residual",
        "convention behind `/root/reference/arbitrage.py:82`).  The exit",
        "criterion is |gap| <= eps AND feas_rel <= eps; the rigorous",
        "guarantee is one-sided — OPT - objective <= max(gap, 0) — with",
        "the feasibility gate bounding value overshoot from residual",
        "infeasibility (a negative gap), which is why both conditions are",
        "required.",
        "",
        "Round-5 certification structure: the primal side of every",
        "in-loop pass runs ON DEVICE (`solver/residuals.DeviceGate` —",
        "projection, net trade, objective, per-asset feasibility",
        "residuals) and only the (n,)-price vector crosses to host for a",
        "cheap-depth f64 dual bound, OVERLAPPED with the next device",
        "chunk; the full-depth f64 certificate runs only to CONFIRM an",
        "accept or a refinement handoff.  Handoff is dual-aware (gap_rel",
        "<= 5e-6, feas <= 3e-4): the base solve converges the prices at",
        "full penalty while the delta refinement closes feasibility",
        "decades fast but grinds positive gaps slowly.",
        "",
        "The refinement itself (`solver/refine_device.py`: re-center at",
        "the f32 iterate, solve the scaled correction problem on the SAME",
        "chip in f32) runs on the FUSED Pallas delta kernel (round 5 —",
        "full base-solve throughput; the classic delta path measured",
        "532 it/s vs fused 1416 it/s at 100k, depth (48,6)).  'total s to",
        "1e-6' = device solve + refine stage; 'end-to-end' is the",
        "MEASURED WALL CLOCK of the gated solve loop plus the refine",
        "stage (gate work overlapped, not summed).",
        "",
        "| pools | assets | solve s to 1e-3 | **total s to 1e-6** | **end-to-end s (incl cert)** | refine s (device iters) | cert s/pass | final gap / feas |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for r in all_rows:
        if r.get("B", 1) == 1 and "device_solve_s" in r:
            if r["solve_s_to_1e6"] is not None:
                total = f"{r['solve_s_to_1e6']} (on-device)"
            else:
                total = str(round(r["device_solve_s"] + r["refine_s"], 3))
            # certification host work is OVERLAPPED with device chunks
            # (DeviceGate): the end-to-end number is the measured wall
            # clock of the gated solve loop plus the refine stage, not
            # the sum of the component clocks
            e2e = round(
                r.get(
                    "loop_wall_s",
                    r["device_solve_s"] + r["certify_s_total"],
                )
                + r["refine_s"],
                3,
            )
            lines.append(
                f"| {r['m']:,} | {r['n_assets']} | {r['solve_s_to_1e3']} | "
                f"**{total}** | **{e2e}** | "
                f"{r['refine_s']} ({r['refine_iters']}) | "
                f"{r['certify_s_per_pass']} | "
                f"{r['gap']:.1e} / {r['feas_rel']:.1e} |"
            )
    lines += [
        "",
        "Scenario batching — B scenarios as ONE vmapped device call",
        "(objective scenarios replace the reference's serial 50-solve loop,",
        "`two-asset.py:40`; reserve-state batches are BASELINE config 5):",
        "",
        "| pools | B | kind | iters | batch s | per-scenario s |",
        "|---|---|---|---|---|---|",
    ]
    for r in all_rows:
        if r.get("B", 1) > 1 and "iters" in r:
            lines.append(
                f"| {r['m']:,} | {r['B']} | {r['kind']} | {r['iters']} | "
                f"{r['batch_solve_s']} | **{r['per_scenario_s']}** |"
            )
    lines += [
        "",
        "Certified sweeps (round 5) — the whole grid solved, refined and",
        "certified to 1e-6 as ONE block-diagonal FOLDED problem on the",
        "pool axis (`solver/fold.py` + the fold-aware fused kernels: one",
        "launch per bucket per iteration regardless of T, each point",
        "exchanging against its own price block) with ONE batched f64",
        "certificate per pass (`refine_sweep` / `certify_batch`; the",
        "reference certifies its 50 serial solves one ECOS run at a time,",
        "`two-asset.py:91`):",
        "",
        "| sweep | points | solve s | refine+certify s | certified |",
        "|---|---|---|---|---|",
    ]
    for r in all_rows:
        if r.get("kind") == "reference_sweep_certified":
            lines.append(
                f"| reference two-asset (orig units) | {r['T']} | — | "
                f"{r['total_s']} (end-to-end) | {r['certified']}/{r['T']} |"
            )
        if r.get("kind") == "certified_sweep":
            lines.append(
                f"| {r['m']:,} pools objectives | {r['B']} | "
                f"{r['batch_solve_s']} | {r['refine_certify_s']} | "
                f"{r['certified']}/{r['B']} |"
            )
    lines += [
        "",
        "Measured solver knobs (100k pools / 256 assets, one v5e chip,",
        "500 fixed iterations; rounds 4-5):",
        "",
        "| knob | setting | it/s | note |",
        "|---|---|---|---|",
        "| fused projection depth | (48,6) | 1778 | round-3 default |",
        "| fused projection depth | **(24,4)** | **2269** | objective parity 6e-7 rel; default for base solves |",
        "| fused projection depth | (12,4) | 2652 | 2e-4 objective drift — too shallow; bounds any warm-started root-find gain at <= +16% over (24,4) |",
        "| merged K-group kernel (round 5) | 2 launches/iter | 2313 | +1.9% over the 5-launch default — the floor is GRID-STEP/pipeline-bound, not launch-count-bound; kept as a non-default option (solve_fused(merged=True)) |",
        "| fused DELTA kernel (refine stage) | (48,6) | 1416 | vs 532 classic delta — the round-5 refinement path |",
        "| classic check_every | 1 / 5 / 25 | 675 / 682 / 685 | +1.4% — default stays 1 |",
        "",
        "Negative results kept on record: the VMEM-resident multi-iteration",
        "kernel is 10x SLOWER (Mosaic scoped-stack blowup, round 3); the",
        "ARITHMETIC gm-bucket merge (floor clamp on every pool) measured",
        "2286 vs 2315 it/s (round 4); the round-5 per-tile-DISPATCH merge",
        "above recovers the launch savings without the arithmetic cost and",
        "still only gains 1.9% — together these bracket the single-chip",
        "iteration floor at ~0.43 ms (≈2300 it/s) for this kernel at",
        "(24,4) depth.",
        "",
        "Measured refinement floors (adversarial fuzz,",
        "tests/test_refine_device.py): across reserve/price unit skews of",
        "1e-6..1e6 (pre-equilibration), every converged base solve refines",
        "to <= 2e-6 per-asset-relative; one adversarial seed floors at",
        "1.9e-6 (vs the usual <=1e-6).  Near-EMPTY-reserve pools (reserves",
        "~1e-5 against 1e3-sized partners) floor at ~1e-3 own-scale box",
        "feasibility: the violating asset's consensus noise is coupled in",
        "from its large-volume partners, which re-centering cannot remove;",
        "the certificate criterion correctly refuses (negative gap) and",
        "refinement declines gracefully.",
        "",
        "## Scaling model (multi-chip projection from measured single-chip inputs)",
        "",
        "No multi-chip hardware exists in this environment (README), so",
        "this is a MODEL, clearly labeled as such, built from measured",
        "single-chip quantities in this file's runs:",
        "",
    ]
    per_chunk = {}
    for r in all_rows:
        if r.get("B", 1) == 1 and "device_solve_s" in r and r["device_iters"]:
            per_chunk[r["m"]] = r["device_solve_s"] / r["device_iters"]
    if per_chunk:
        lines.append(
            "Measured per-iteration wall (fused chunks, this run): "
            + ",  ".join(
                f"{m_:,} pools = {1e3*v:.3f} ms/iter ({1/v:,.0f} it/s)"
                for m_, v in sorted(per_chunk.items())
            )
            + "."
        )
    lines += [
        "",
        "* The per-iteration time is launch/pipeline-floor dominated below",
        "  ~10k pools/chip (1k and 10k run at nearly the same ms/iter), so",
        "  sharding 100k pools over a v5p-16 (6.25k pools/chip) puts each",
        "  chip AT the measured small-problem floor (~0.16-0.20 ms/iter).",
        "* Per-iteration cross-chip traffic is ONE (n+1)-vector psum + 4",
        "  scalars (solver/admm.py) — ~1 KB at n=256.  At v5p ICI",
        "  bandwidth/latency (~1-2 us/hop ring latency dominates for KB",
        "  payloads), the psum adds <= ~0.02 ms/iter: under 15% of the",
        "  floor, so scaling is launch-floor-limited, not comm-limited.",
        "* Projection: the 100k pipeline measured here runs ~2250 base +",
        "  ~250 refine iterations.  At the per-chip floor that is",
        "  2500 x ~0.18 ms ~= 0.45 s of device time on a v5p-16, plus the",
        "  (overlapped) host certificate passes and the handoff transfer",
        "  (~0.3-0.5 s measured serial tail).  Projected wall-clock: ~0.8-",
        "  1.0 s for the certified-1e-6 100k pipeline — at the edge of the",
        "  BASELINE.json <1 s north star; the residual risk is the serial",
        "  host tail (certificates + compose), which would need either a",
        "  second host thread or the device-side dual bound to close fully.",
        "* What is NOT modeled: multi-host DCN effects (the Gloo smoke in",
        "  tests/test_distributed.py is correctness-only), and v5p's",
        "  different VMEM/MXU ratios shifting the kernel floor.",
    ]
    with open("BENCH_GRID.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    _log("wrote BENCH_GRID.md")


if __name__ == "__main__":
    main()
