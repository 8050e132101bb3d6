"""Scenario folding: a T-point sweep as ONE problem on the pool axis.

The TPU-first answer to scenario batching (SURVEY.md §2 scenario rows;
the reference loops 50 serial cvxpy solves, ``/root/reference/
two-asset.py:40``): T independent copies of the same network are
block-diagonal in the consensus — point t's pools touch only point t's
asset block — so a batch of T solves IS one solve over ``T*m`` pools and
``T*n`` assets.  Folding instead of ``vmap`` keeps the iteration on the
fused Pallas kernel with ONE launch per bucket per iteration regardless
of T (the vmapped classic path pays T times the small-problem
launch/pipeline floor), and rides the radix-128 MXU consensus exchange
at the folded asset count.

Exactness: the consensus reduce/broadcast never mixes asset blocks
(asset ids are offset per point), the projections are per-pool, and the
linear consensus prox is elementwise — the folded iterate equals the T
per-point iterates exactly, up to the shared (joint) convergence test
and, for base solves, a shared adapted rho.  The delta-dual refinement
iteration is rho-free for linear objectives (rho enters only the folded
constant e0 and the price reconstruction), so per-point penalties fold
exactly: compute e0 per point, solve at rho=1, rescale per point on the
way out (:func:`unfold_delta_prices`).
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from .compiler import Bucket, CompiledProblem

__all__ = [
    "fold_compiled",
    "fold_vec",
    "unfold_vec",
    "fold_planes",
    "unfold_planes",
    "unfold_route",
    "solve_batch_folded",
]


def fold_compiled(
    compiled: CompiledProblem, T: int, reserve_scale=None
) -> CompiledProblem:
    """T copies of the problem, concatenated along the pool axis.

    Point t's pools carry asset ids offset by ``t*n`` (padding slots move
    from id ``n`` to id ``T*n``), so the folded consensus is
    block-diagonal: one solve over the folded problem == T independent
    solves.  Bucket pool counts multiply by T, preserving the fused
    kernel's lane alignment (``pad_pools_to`` multiples stay multiples).

    ``reserve_scale``: optional (T, n_pools) per-point multiplicative
    reserve factors (BASELINE config 5 — per-pool reserve scenarios);
    each point's bucket block carries its own reserves and recomputed
    invariants, so a reserve-state batch rides the fused kernel exactly
    like an objective sweep.
    """
    n = compiled.n_assets
    if reserve_scale is not None:
        reserve_scale = np.asarray(reserve_scale, np.float64)
        if reserve_scale.shape != (T, compiled.n_pools):
            raise ValueError(
                f"reserve_scale must be (T={T}, n_pools="
                f"{compiled.n_pools}); got {reserve_scale.shape}"
            )
    buckets: Dict[str, Bucket] = {}
    for name, b in compiled.buckets.items():
        m = b.mask.shape[0]
        real = b.mask > 0
        # (T*m, K): per-point row blocks [t*m, (t+1)*m)
        asset_f = np.concatenate(
            [np.where(real, b.asset + t * n, T * n) for t in range(T)]
        ).astype(np.int32)
        if reserve_scale is None:
            R_f = np.tile(b.reserves, (T, 1))
            logk0_f = np.tile(b.logk0, T)
            k0_f = np.tile(b.k0, T)
        else:
            sc = np.ones((T, m))
            sc[:, : len(b.pool_ids)] = reserve_scale[:, b.pool_ids]
            R_f = (b.reserves[None] * sc[:, :, None]).reshape(T * m, -1)
            if b.kind == "gm":
                y = np.where(
                    np.tile(real, (T, 1)), R_f + np.tile(b.shift, (T, 1)),
                    1.0,
                )
                logk0_f = np.sum(
                    np.tile(b.weights, (T, 1)) * np.log(y), axis=1
                )
                k0_f = np.exp(logk0_f)
            else:
                k0_f = np.sum(np.tile(b.weights, (T, 1)) * R_f, axis=1)
                logk0_f = np.log(np.maximum(k0_f, 1e-300))
        buckets[name] = Bucket(
            kind=b.kind,
            width=b.width,
            reserves=R_f,
            weights=np.tile(b.weights, (T, 1)),
            shift=np.tile(b.shift, (T, 1)),
            gamma=np.tile(b.gamma, (T, 1)),
            logk0=logk0_f,
            k0=k0_f,
            mask=np.tile(b.mask, (T, 1)),
            asset=asset_f,
            pool_ids=np.concatenate(
                [b.pool_ids + t * compiled.n_pools for t in range(T)]
            ),
            needs_floor=b.needs_floor,
        )
    return CompiledProblem(
        n_assets=T * n,
        buckets=buckets,
        degree=np.tile(compiled.degree, T),
        n_pools=T * compiled.n_pools,
        n_slots=T * compiled.n_slots,
        widths=np.tile(compiled.widths, T),
        spec=None,
    )


def fold_vec(x: np.ndarray) -> np.ndarray:
    """(T, n) per-point asset vectors -> (T*n,) folded."""
    x = np.asarray(x)
    return x.reshape(-1)


def unfold_vec(x: np.ndarray, T: int) -> np.ndarray:
    """(T*n,) folded asset vector -> (T, n)."""
    x = np.asarray(x)
    return x.reshape(T, -1)


_SOLVER_CACHE = {}  # (id(compiled), T, cls, dtype, opts repr, chunk) ->
#                     (compiled ref, solver, driver) — jitted programs are
#                     per-instance, so rebuilding the folded solver on
#                     every call re-traces and re-compiles the whole
#                     iteration (measured: 15+ s per call over the
#                     remote-TPU tunnel vs 0.8 s of actual solve)
_CACHE_CAP = 6


def folded_solver(compiled, T, options, dtype, cls=None, chunk=None):
    """Build-or-reuse a solver over ``fold_compiled(compiled, T)`` (and
    its ChunkedDriver when ``chunk`` is given).  The cache holds a strong
    reference to ``compiled`` so the id key stays valid."""
    from .admm import AdmmSolver

    cls = cls if cls is not None else AdmmSolver
    key = (id(compiled), T, cls.__name__, str(dtype), repr(options), chunk)
    hit = _SOLVER_CACHE.get(key)
    if hit is not None:
        return hit[1], hit[2]
    solver = cls(fold_compiled(compiled, T), dtype=dtype, options=options)
    solver._fold = (T, compiled.n_assets)
    driver = None
    if chunk is not None:
        from .driver import ChunkedDriver

        driver = ChunkedDriver(solver, chunk=chunk, fused=True)
    if len(_SOLVER_CACHE) >= _CACHE_CAP:
        _SOLVER_CACHE.pop(next(iter(_SOLVER_CACHE)))
    _SOLVER_CACHE[key] = (compiled, solver, driver)
    return solver, driver


def unfold_route(res, T: int, c: np.ndarray = None):
    """Folded RouteResult -> per-point batched RouteResult.

    Joint quantities (iters, residual norms, converged, rho) broadcast
    to every point — the folded solve ran them jointly.  ``c``: optional
    (T, n) objective rows to recover per-point objective values."""
    import jax

    r = jax.device_get(res)
    deltas = unfold_planes(
        {k: np.asarray(v) for k, v in r.deltas.items()}, T
    )
    lambdas = unfold_planes(
        {k: np.asarray(v) for k, v in r.lambdas.items()}, T
    )
    psi = unfold_vec(np.asarray(r.psi), T)
    prices = unfold_vec(np.asarray(r.prices), T)
    if c is not None:
        obj = np.sum(np.asarray(c, np.float64) * psi, axis=1)
    else:
        obj = np.full(T, float(np.asarray(r.objective)) / T)
    fill = lambda v: np.full(T, np.asarray(v))  # noqa: E731
    return r._replace(
        objective=obj, psi=psi, prices=prices, deltas=deltas,
        lambdas=lambdas, iters=fill(r.iters), r_norm=fill(r.r_norm),
        s_norm=fill(r.s_norm), converged=fill(r.converged),
        rho_final=fill(r.rho_final),
    )


def solve_batch_folded(
    compiled: CompiledProblem,
    c,
    lo,
    hi,
    options=None,
    dtype=None,
    fused: bool = None,
    chunk: int = 500,
    interpret: bool = False,
    rho: float = None,
    max_iters: int = None,
):
    """T per-point linear objectives solved as ONE folded problem.

    The TPU-first replacement for ``AdmmSolver.solve_batch`` on linear
    sweeps: the fold rides the fused Pallas kernel (one launch per
    bucket per iteration regardless of T) where the vmapped classic
    path pays T small-problem pipeline floors.  Semantics differ from
    the vmapped path only in the JOINT convergence test and the shared
    adapted rho.  Returns a per-point batched RouteResult
    (:func:`unfold_route`).
    """
    import jax.numpy as jnp

    from ..models.utility import Objective
    from .admm import AdmmOptions, AdmmSolver

    c = np.asarray(c, np.float64)
    T = c.shape[0]
    opts = options if options is not None else AdmmOptions()
    dt = dtype if dtype is not None else jnp.float32
    if fused is None:
        import jax

        fused = jax.default_backend() not in ("cpu",) and all(
            b.mask.shape[0] % 128 == 0 for b in compiled.buckets.values()
        )
    solver, drv = folded_solver(
        compiled, T, opts, dt, chunk=chunk if fused and not interpret else None
    )
    if fused and interpret:  # CPU tests of the fused path: uncached
        from .driver import ChunkedDriver

        drv = ChunkedDriver(solver, chunk=chunk, interpret=True, fused=True)
    obj_f = Objective(
        fold_vec(c),
        lo=fold_vec(np.asarray(lo, np.float64)),
        hi=fold_vec(np.asarray(hi, np.float64)),
    )
    mi = max_iters if max_iters is not None else opts.max_iters
    if fused:
        res, _log = drv.solve(obj_f, max_iters=mi, rho=rho)
    else:
        res = solver.solve(obj_f, rho=rho, max_iters=mi)
    return unfold_route(res, T, c=c)


def solve_batch_reserves_folded(
    compiled: CompiledProblem,
    objective,
    reserve_scale,
    options=None,
    dtype=None,
    n_iters: int = 750,
    rho: float = None,
    fused: bool = None,
    interpret: bool = False,
):
    """T per-pool reserve scenarios (BASELINE config 5) as ONE folded
    fused solve.

    The reserve-derived leaves (R, k0, logk0) ride the TRACED ``buckets``
    argument of the cached folded solver's jitted programs — changing
    the scenario batch never recompiles.  Linear objectives; fixed
    ``n_iters`` iterations (the scenario-batch contract — mirror of
    ``AdmmSolver.solve_batch_reserves``).  Returns a per-point batched
    RouteResult."""
    import jax.numpy as jnp

    from .admm import AdmmOptions

    reserve_scale = np.asarray(reserve_scale, np.float64)
    T = reserve_scale.shape[0]
    opts = options if options is not None else AdmmOptions()
    dt = dtype if dtype is not None else jnp.float32
    if fused is None:
        import jax

        fused = (
            jax.default_backend() not in ("cpu",) or interpret
        ) and all(
            b.mask.shape[0] % 128 == 0 for b in compiled.buckets.values()
        )
    solver, _ = folded_solver(compiled, T, opts, dt)
    fc_scaled = fold_compiled(compiled, T, reserve_scale)
    bdict = {}
    host = {}
    for name, b in fc_scaled.buckets.items():
        host[name] = dict(
            R=b.reserves.T.astype(np.float32),
            k0=b.k0.astype(np.float32),
            logk0=b.logk0.astype(np.float32),
        )
    import jax

    uploads = jax.device_put(host)
    for name in fc_scaled.buckets:
        arrs = dict(solver.buckets[name])
        arrs.update(uploads[name])
        bdict[name] = arrs
    c = np.tile(np.asarray(objective.c, np.float64), T)
    fmax = np.finfo(np.float32).max / 4
    lo = np.tile(np.clip(np.asarray(objective.lo, np.float64), -fmax, fmax), T)
    hi = np.tile(np.clip(np.asarray(objective.hi, np.float64), -fmax, fmax), T)
    cJ = jnp.asarray(c, dt)
    loJ = jnp.asarray(lo, dt)
    hiJ = jnp.asarray(hi, dt)
    rhoJ = jnp.asarray(rho if rho is not None else opts.rho, dt)
    if fused:
        if solver._solve_fused_jit is None:
            solver._solve_fused_jit = jax.jit(
                solver._solve_fused_impl,
                static_argnames=("n_iters", "interpret", "merged"),
            )
        res = solver._solve_fused_jit(
            cJ, loJ, hiJ, rhoJ, n_iters=int(n_iters), interpret=interpret,
            buckets=bdict,
        )
    else:
        res = solver._solve_jit(
            cJ, loJ, hiJ, rhoJ, None, None, None, bdict,
            max_iters=jnp.asarray(int(n_iters), jnp.int32),
        )
    return unfold_route(res, T, c=c.reshape(T, -1))


def fold_planes(planes: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Per-bucket (T, K, m) trade planes -> (K, T*m) folded device
    layout (row blocks along the pool axis, matching
    :func:`fold_compiled`)."""
    out = {}
    for k, v in planes.items():
        v = np.asarray(v)
        T, K, m = v.shape
        out[k] = v.transpose(1, 0, 2).reshape(K, T * m)
    return out


def unfold_planes(
    planes: Dict[str, np.ndarray], T: int
) -> Dict[str, np.ndarray]:
    """(K, T*m) folded trade planes -> per-point (T, K, m)."""
    out = {}
    for k, v in planes.items():
        v = np.asarray(v)
        K, Tm = v.shape
        m = Tm // T
        out[k] = v.reshape(K, T, m).transpose(1, 0, 2)
    return out
