"""Host f64 refinement: polish an f32 (TPU) solve to a certified 1e-6 gap.

The reference gets ~1e-8 certified optimality from ECOS's primal-dual
interior-point method (behind ``/root/reference/arbitrage.py:82``).  The
TPU path solves in f32 (v5e-class chips have no native f64) and bottoms
out at a ~1e-4..1e-3 relative gap — good enough for routing, not for
certification.  This module closes the rest on host:

    f32 TPU solve  ->  warm-start the SAME consensus-ADMM in float64 on
    the CPU backend  ->  run until the rigorous dual certificate
    (:mod:`.certify`) reports ``gap_rel <= target``.

Because the f32 iterate is already within ~1e-3 of the fixed point, the
f64 polish typically needs a small fraction of the cold-start iteration
count (the warm-start machinery is :meth:`AdmmSolver.warm_state`).

x64 handling: JAX's f64 support is a process-global flag.  ``refine``
flips it on for the duration of the polish, pins all work to the CPU
backend (f64 programs must NEVER reach the TPU — they hang the remote
worker), converts every returned array to numpy, and restores the flag —
so it is safe to call from an f32 TPU session.
"""
from __future__ import annotations

import dataclasses
import logging
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .admm import AdmmOptions, AdmmSolver, RouteResult
from .certify import Certificate, certify, polish_prices
from .compiler import CompiledProblem

__all__ = ["RefineResult", "refine"]


@dataclasses.dataclass
class RefineResult:
    """Certified f64 polish of a candidate routing."""

    result: RouteResult  # numpy leaves (host)
    certificate: Certificate
    iters: int  # total f64 polish iterations
    achieved: bool  # certificate.gap_rel <= target


# tightening schedule: each stage warm-starts from the previous one's
# iterate, so later stages only run if the certificate is still loose
_EPS_SCHEDULE = (1e-9, 1e-11, 5e-13)

# certify every chunk of f64 iterations and stop at the first certified
# hit: solving the residual schedule to completion routinely lands 1e-9
# gaps when 1e-6 was requested — measured 5060 polish iterations at 10k
# pools where ~2000 already certified (the chunked loop cut refine 2-3x
# there).  The chunk grows geometrically from _CHUNK0 to _CHUNK_MAX: an
# equilibrated f32 iterate usually needs only O(100) f64 iterations, and
# a fixed 500-iteration first chunk wasted most of the refine wall-clock
# at the sizes whose f32 solve floors just above 1e-6 (1k/10k pools).
_CHUNK0 = 125
_CHUNK_MAX = 1000


def _to_host(res: RouteResult) -> RouteResult:
    return jax.tree_util.tree_map(np.asarray, res)


def _make_solver(compiled, opts, cpu_shards, strict=False):
    """f64 polish solver: CPU-mesh sharded when requested and possible.

    A degraded fallback to the single-device path is LOUD: a production
    run that asked for 8 host cores should not silently run ~1.7x slower
    (``strict=True`` upgrades the fallback to an error)."""
    if cpu_shards and int(cpu_shards) > 1:
        n = int(cpu_shards)
        reason = None
        try:
            from ..parallel.mesh import pool_mesh
            from ..parallel.sharded import ShardedAdmmSolver

            devices = jax.devices("cpu")
            if len(devices) >= n:
                mesh = pool_mesh(n_devices=n, devices=devices)
                return ShardedAdmmSolver(
                    compiled, mesh, dtype=jnp.float64, options=opts
                )
            reason = (
                f"only {len(devices)} CPU device(s) visible — set "
                f"XLA_FLAGS=--xla_force_host_platform_device_count={n} "
                "before process start"
            )
        except (ValueError, RuntimeError, NotImplementedError) as e:
            reason = f"{type(e).__name__}: {e}"
        msg = (
            f"refine(cpu_shards={n}) falling back to the SINGLE-DEVICE "
            f"f64 path ({reason})"
        )
        if strict:
            raise RuntimeError(msg)
        logging.getLogger("cfmm_routing_tpu.refine").warning(msg)
    return AdmmSolver(compiled, dtype=jnp.float64, options=opts)


def refine(
    compiled: CompiledProblem,
    objective,
    result: RouteResult,
    target_gap: float = 1e-6,
    max_iters: int = 200_000,
    options: Optional[AdmmOptions] = None,
    cpu_shards: Optional[int] = None,
    strict: bool = False,
) -> RefineResult:
    """Polish ``result`` (typically an f32 TPU solve) to a certified gap.

    ``objective`` is the same :class:`Objective`/:class:`ConcaveUtility`
    the original solve used.  Returns host-side (numpy) arrays only.

    ``cpu_shards``: shard the f64 polish over N virtual CPU devices
    (``XLA_FLAGS=--xla_force_host_platform_device_count=N`` must be set
    before process start) — SPMD over host cores, the same
    ``ShardedAdmmSolver`` program the TPU mesh uses.  Falls back to the
    single-device path when the devices or bucket divisibility are not
    available — with a WARNING log line, or a RuntimeError when
    ``strict=True``.
    """
    base = options if options is not None else AdmmOptions()
    from ..models.utility import CustomUtility

    if isinstance(objective, CustomUtility):
        cpu_shards = None  # non-separable prox is single-device only
    x64_was = bool(jax.config.jax_enable_x64)
    if not x64_was:
        jax.config.update("jax_enable_x64", True)
    try:
        with jax.default_device(jax.devices("cpu")[0]):
            # move the warm state to host BEFORE building f64 programs so
            # no f32 TPU buffer is captured in an f64 trace
            cur = _to_host(result)

            def _hit(c):
                # feasibility is judged RELATIVE to the trade magnitudes
                # (ECOS/SCS convention; bench_grid.py uses the same
                # criterion): a 1e-2 absolute slack on a 1e4-sized psi is
                # a 1e-6 relative violation, not a 1e-2 one.  Guarantee:
                # OPT - objective <= max(gap, 0) is rigorous (dual bound).
                # A NEGATIVE gap means the residually infeasible point
                # overshoots the dual bound; the overshoot is controlled
                # by the feasibility gate, not by |gap| alone, so both
                # are required to hit target_gap before certifying.
                return (
                    abs(c.gap_rel) <= target_gap
                    and c.feasibility_rel <= target_gap
                )

            # each polish is up to max_evals L-BFGS evaluations, each a full
            # O(m) bucket sweep with an 80-step bisection — at 100k pools
            # the polish, not the f64 iterations, would dominate the refine
            # wall-clock if run unconditionally per chunk.  Scale it down
            # with problem size; it is an accelerator, never load-bearing.
            polish_evals = 200 if compiled.n_pools <= 20_000 else 50

            def _cert(point):
                """Certify at the ADMM duals AND (only when the plain
                certificate misses the target) at L-BFGS-polished prices,
                keeping the tighter bound.  Rigor is free: every repaired
                price vector yields a valid dual bound, and the polish
                (minimize the bound's convex dual function over nu) often
                lands an essentially exact bound while the primal ADMM
                tail is still crawling — certification then only waits on
                primal feasibility, not on dual convergence."""
                cert = certify(
                    compiled,
                    objective,
                    point.deltas,
                    point.lambdas,
                    point.prices,
                    psi_claimed=point.psi,
                )
                if _hit(cert):
                    return cert
                if cert.gap_abs <= 0:
                    # a NEGATIVE gap is primal-side error (the residually
                    # infeasible point overshoots the dual bound); price
                    # polishing can only LOWER the dual bound and can
                    # never shrink |gap| here — skip the L-BFGS pass
                    # (measured ~50 s wasted per refine at 100k pools)
                    return cert
                try:
                    nu_p = polish_prices(
                        compiled, objective, np.asarray(point.prices),
                        max_evals=polish_evals,
                    )
                    cert_p = certify(
                        compiled,
                        objective,
                        point.deltas,
                        point.lambdas,
                        nu_p,
                        psi_claimed=point.psi,
                    )
                    if cert_p.gap_abs < cert.gap_abs:
                        cert = cert_p
                except Exception:
                    pass  # the polish is an accelerator, never load-bearing
                return cert

            # the incoming point may already certify (e.g. an f64 solve or a
            # re-refine) — then the polish costs zero iterations
            cert = _cert(cur)
            if _hit(cert):
                return RefineResult(
                    result=cur, certificate=cert, iters=0, achieved=True
                )

            total = 0
            stage = 0
            chunk = _CHUNK0
            solver = None
            while total < int(max_iters):
                if solver is None:
                    opts = dataclasses.replace(
                        base,
                        eps_abs=_EPS_SCHEDULE[stage],
                        eps_rel=_EPS_SCHEDULE[stage],
                        max_iters=_CHUNK_MAX,
                        # the one-hot/radix consensus modes are TPU layouts
                        # (dense MXU contractions, E*n flops per exchange);
                        # on the CPU backend the gather/scatter path is
                        # memory-bound and ~an order of magnitude cheaper
                        # at 100k pools
                        consensus="scatter",
                    )
                    solver = _make_solver(compiled, opts, cpu_shards, strict)
                # the budget is a TRACED scalar: growing it across calls
                # reuses the one compiled f64 program (admm.solve max_iters)
                res = solver.solve(objective, warm=cur, max_iters=chunk)
                took = int(res.iters)
                total += took
                cur = _to_host(res)
                cert = _cert(cur)
                if _hit(cert):
                    return RefineResult(
                        result=cur, certificate=cert, iters=total, achieved=True
                    )
                if took < chunk:
                    # residual-converged at this eps but the certificate is
                    # still loose: tighten, or give up when schedule exhausted
                    stage += 1
                    if stage >= len(_EPS_SCHEDULE):
                        break
                    solver = None
                elif chunk < _CHUNK_MAX:
                    chunk = min(2 * chunk, _CHUNK_MAX)
            return RefineResult(
                result=cur, certificate=cert, iters=total, achieved=False
            )
    finally:
        if not x64_was:
            jax.config.update("jax_enable_x64", False)
