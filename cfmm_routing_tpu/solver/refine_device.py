"""Device-resident mixed-precision refinement: certified 1e-6 WITHOUT the
host f64 ADMM stage.

The reference reaches ~1e-8 certified optimality inside ECOS's f64
interior-point iteration (``/root/reference/arbitrage.py:82``).  The TPU
solve runs in f32 (v5e has no native f64) and floors at a ~1e-5 relative
gap; round 3 closed the last decade with a warm-started f64 ADMM on HOST
CPU — 17.5 s of the 20.7 s wall-clock at 100k pools, a stage that scales
with host cores rather than TPU chips.  This module replaces it with
classic iterative refinement run ON DEVICE:

1.  From the f32 base solve (D0, L0, psi0, nu0), compute in f64 on host
    the RESIDUAL DATA: post-trade reserves x0 = R + s + gamma*D0 - L0,
    log-domain constraint slack sigma0 = sum w log x0 - log k0, box
    residuals [lo - psi0, hi - psi0], and pick a correction scale eps
    from the certificate.
2.  Re-parametrize exactly:  D = D0 + eps*a,  L = L0 + eps*b.  The
    trading sets become the SHIFTED sets of ``ops/projection_delta.py``
    — same geometry, but the constraint residual is evaluated through
    ``log1p`` of O(eps)-relative quantities with no cancellation, so f32
    carries ~eps * 1e-7 ABSOLUTE precision on the correction.
3.  Run the SAME consensus-ADMM (identical consensus exchange,
    residuals, while_loop) on the correction problem at the base
    penalty rho, with the DUAL RE-CENTERED at the converged base prices
    (``DeltaAdmmSolver._iterate``: the state dual is dnu = nu - nu0, so
    no degree-amplified O(d*|nu|) f32 products enter the consensus) —
    only the small primal correction and the small dual correction move.
4.  Compose D = D0 + eps*a in f64 on host and certify rigorously
    (``solver/certify.py``).  One pass typically gains ~a factor eps of
    gap; a second pass (re-centered at the refined point, smaller eps)
    reuses the SAME compiled program — the pass-varying arrays are
    traced arguments.

Every concave utility atom transforms EXACTLY under the shift+scale
(U(psi0 + eps*d)/eps is the same atom family — see ``_delta_objective``),
so refinement covers linear objectives and the full separable atom
library.
"""
from __future__ import annotations

import dataclasses
import logging
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.utility import ConcaveUtility, Objective
from ..ops.projection_delta import project_cs_delta, project_gm_delta
from .admm import AdmmOptions, AdmmSolver, RouteResult
from .certify import certify, polish_prices
from .compiler import CompiledProblem
from .refine import RefineResult

__all__ = ["DeltaAdmmSolver", "refine_device"]

_LOG = logging.getLogger("cfmm_routing_tpu.refine_device")


class DeltaAdmmSolver(AdmmSolver):
    """The consensus-ADMM solver re-targeted at shifted-scaled trading
    sets.  Topology (asset ids, masks, degree, consensus mode) is the
    base problem's; only the per-bucket projection changes.  The
    pass-varying delta arrays (X0, aD, aL, sS, nsig) ride the traced
    ``buckets`` argument, so repeated passes and re-centerings reuse ONE
    compiled program."""

    def _project(self, name, arrs, pD, pL):
        kind, floor = self._meta[name]
        cfg = self.options.projection
        if kind == "gm":
            return project_gm_delta(
                pD, pL, arrs["X0"], arrs["w"], arrs["sS"], arrs["gamma"],
                arrs["nsig"], arrs["aD"], arrs["aL"], arrs["mask"],
                needs_floor=floor, cfg=cfg,
            )
        return project_cs_delta(
            pD, pL, arrs["X0"], arrs["gamma"], arrs["w"], arrs["nsig"],
            arrs["aD"], arrs["aL"], arrs["mask"], cfg=cfg,
        )

    def _iterate(self, z, nu, rho, c, lo, hi, util=None, buckets=None,
                 custom=None, with_stats=True):
        """Delta-dual iteration (linear objectives): ``nu`` carries the
        DELTA dual  dnu := nu_full - nu0  and ``c`` carries the folded
        constant  e0 := c_true/rho - nu0  (f64-computed, small).

        Why: the classic prox forms  s = yhat - 2*d*nu  with per-asset
        degree d (O(100+) at production aspect ratios) and an O(1) dual —
        f32 rounding of that product injects ~d*|nu0|*1e-7 ABSOLUTE noise
        into the consensus every iteration, which is exactly the residual
        floor the correction solve exists to remove (measured: the 16k/256
        delta solve stalled at r ~ 5e-4 = box infeasibility).  With the
        dual re-centered, every prox quantity is small:

            psi = clip(yhat + 2 d (e0 - dnu), lo, hi)
            dmu = dnu + (psi - yhat) / (2 d)          (the new delta dual)

        The base dual enters the projection input only through the
        PRE-BROADCAST f32-exact plane ``nu0e`` (no d-amplification).
        Utility objectives fall back to the classic iteration (their
        atom-wise re-centering has no closed form); their refinement
        floor keeps the d-amplified term.
        """
        from ..ops.prox import DeltaUtility, delta_utility_prox

        if custom is not None or (
            util is not None and not isinstance(util, DeltaUtility)
        ):
            # power atoms (no cancellation-free closed-form re-centering)
            # and custom utilities take the classic full-dual iteration —
            # their refinement floor keeps the d-amplified term
            return super()._iterate(
                z, nu, rho, c, lo, hi, util=util, buckets=buckets,
                custom=custom, with_stats=with_stats,
            )
        buckets = self.buckets if buckets is None else buckets
        alpha = jnp.asarray(self.options.alpha, self.dtype)
        w_hat = {}
        w_norm2 = jnp.zeros((), self.dtype)
        yhat = jnp.zeros((self.n,), self.dtype)
        for name, arrs in buckets.items():
            dnu_e = self._bcast_nu(nu, name, buckets)
            off = arrs["nu0e"] + dnu_e
            zD, zL = z[name]
            D, L = self._project(name, arrs, zD - off, zL + off)
            if with_stats:
                w_norm2 += jnp.sum(D * D) + jnp.sum(L * L)
            hD = alpha * D + (1.0 - alpha) * zD
            hL = alpha * L + (1.0 - alpha) * zL
            w_hat[name] = (D, L, hD, hL)
            yhat = yhat + self._reduce_edges(hL - hD, name, buckets)

        yhat = self._psum(yhat)
        if util is None:
            d_safe = jnp.maximum(self.degree, 1.0)
            psi = yhat + 2.0 * d_safe * (c - nu)  # c == e0, nu == dnu: small
            psi = jnp.clip(psi, lo, hi)
            psi = jnp.where(self.degree > 0, psi, 0.0)
            dmu = nu + (psi - yhat) / (2.0 * d_safe)
            dmu = jnp.where(self.degree > 0, dmu, 0.0)
        else:
            # precise re-centered separable prox (linear/quad/log atoms)
            psi, dmu = delta_utility_prox(nu, yhat, self.degree, util, rho)

        z_new = {}
        w_out = {}
        r2 = jnp.zeros((), self.dtype)
        s2 = jnp.zeros((), self.dtype)
        z_norm2 = jnp.zeros((), self.dtype)
        for name, arrs in buckets.items():
            D, L, hD, hL = w_hat[name]
            dmu_e = self._bcast_nu(nu - dmu, name, buckets)
            znD = hD + dmu_e
            znL = hL - dmu_e
            if with_stats:
                zD, zL = z[name]
                s2 += jnp.sum((znD - zD) ** 2) + jnp.sum((znL - zL) ** 2)
                rD = D - znD
                rL = L - znL
                r2 += jnp.sum(rD * rD) + jnp.sum(rL * rL)
                z_norm2 += jnp.sum(znD * znD) + jnp.sum(znL * znL)
            z_new[name] = (znD, znL)
            w_out[name] = (D, L)

        if with_stats:
            packed = self._psum(jnp.stack([r2, s2, w_norm2, z_norm2]))
            r2, s2, w_norm2, z_norm2 = packed[0], packed[1], packed[2], packed[3]
        u_norm2 = jnp.sum(2.0 * self.degree * dmu * dmu)
        stats = dict(
            r2=r2, s2=s2 * rho * rho, w_norm2=w_norm2, z_norm2=z_norm2,
            u_norm2=u_norm2 * rho * rho,
        )
        return z_new, dmu, psi, w_out, stats

    def solve_fused(self, *a, **k):
        raise NotImplementedError(
            "DeltaAdmmSolver's fused path needs the per-pass delta bucket "
            "arrays — use solve_delta(..., fused=True)"
        )

    def _iterate_fused(self, s, wdef, nu, rho, c, lo, hi, util=None,
                       interpret=False, buckets=None):
        """Fused delta iteration: one VMEM Pallas launch per bucket onto
        the SHIFTED trading sets (``ops.iteration_pallas.fused_step_delta``)
        so the refinement stage runs at the base solve's throughput
        instead of the classic path's (~44% of it at 100k pools — the
        round-4 headline's largest cost).

        The deferred-broadcast identity z = s +/- wdef_e is untouched by
        the re-centering: the base-dual plane nu0e enters only the
        projection input (inside the kernel), never the z-update, so the
        O(n) recursion is byte-identical to the classic fused path.  The
        consensus prox mirrors :meth:`_iterate` — delta-dual closed form
        for linear objectives, ``delta_utility_prox`` for re-centered
        separable atoms, the classic full-dual ``utility_prox`` for the
        non-precise (power-atom) fallback."""
        from ..ops.iteration_pallas import fused_step_delta
        from ..ops.prox import DeltaUtility, delta_utility_prox, utility_prox

        buckets = self.buckets if buckets is None else buckets
        alpha = float(self.options.alpha)
        n = self.n
        n_pad = -(-n // 128) * 128
        v = jnp.concatenate(
            [wdef - nu, jnp.zeros((n_pad - n,), self.dtype)]
        )
        y = jnp.zeros((n_pad,), self.dtype)
        s_new = {}
        w_out = {}
        for name, arrs in buckets.items():
            kind, floor = self._meta[name]
            sD, sL = s[name]
            sDn, sLn, A, B, yp = fused_step_delta(
                sD, sL, v, arrs, kind, floor, alpha,
                cfg=self.options.projection, interpret=interpret,
            )
            s_new[name] = (sDn, sLn)
            w_out[name] = (A, B)
            y = y + yp
        yhat = self._psum(y[:n]) - 2.0 * (1.0 - alpha) * self.degree * wdef
        if util is None:
            # delta-dual linear prox (c == e0, nu == dnu: both small)
            d_safe = jnp.maximum(self.degree, 1.0)
            psi = jnp.clip(yhat + 2.0 * d_safe * (c - nu), lo, hi)
            psi = jnp.where(self.degree > 0, psi, 0.0)
            mu = nu + (psi - yhat) / (2.0 * d_safe)
            mu = jnp.where(self.degree > 0, mu, 0.0)
        elif isinstance(util, DeltaUtility):
            psi, mu = delta_utility_prox(nu, yhat, self.degree, util, rho)
        else:
            svec = yhat - 2.0 * self.degree * nu
            psi, mu = utility_prox(svec, self.degree, util, rho)
        wdef_new = (1.0 - alpha) * wdef + nu - mu
        return s_new, wdef_new, mu, psi, w_out

    def delta_buckets(self, base: RouteResult, eps: float, nu0=None):
        """Pass-varying device arrays for the correction problem.

        ``base``: host-side RouteResult in the SAME units the solver's
        CompiledProblem is in.  ``nu0``: the f32-exact base scaled dual —
        when given, every bucket gains the pre-broadcast ``nu0e`` plane
        the delta-dual iteration reads (see :meth:`_iterate`).  Returns
        (buckets_pytree, min_x0) where min_x0 is the smallest real-slot
        post-trade reserve — callers must fall back to the host path if
        it is not safely positive (the log-domain constraint needs
        x0 > 0).
        """
        dt = self.dtype
        out = {}
        min_x0 = np.inf
        nu0_ext = (
            None if nu0 is None
            else np.concatenate([np.asarray(nu0, np.float64), [0.0]])
        )
        for name, b in self.compiled.buckets.items():
            kind, _ = self._meta[name]
            D0 = np.asarray(base.deltas[name], np.float64)  # (K, m)
            L0 = np.asarray(base.lambdas[name], np.float64)
            maskT = b.mask.T  # (K, m)
            gamma = b.gamma[:, 0][None, :]  # (1, m)
            if kind == "gm":
                x0 = (b.reserves + b.shift).T + gamma * D0 - L0
                x0 = np.where(maskT > 0, x0, 1.0)
                logx0 = np.log(np.maximum(x0, 1e-300))
                sigma0 = np.sum(b.weights.T * logx0, axis=0) - b.logk0
                nsig = -sigma0  # (m,) log-domain slack to recover
                real = np.where(maskT > 0, x0, np.inf)
                min_x0 = min(min_x0, float(np.min(real, initial=np.inf)))
            else:
                x0 = b.reserves.T + gamma * D0 - L0
                x0 = np.where(maskT > 0, x0, 1.0)
                s0 = np.sum(b.weights.T * np.where(maskT > 0, x0, 0.0), axis=0)
                nsig = -(s0 - b.k0) / eps  # scaled linear slack target
            arrs = dict(self.buckets[name])  # asset/mask/gamma/w reused
            arrs["w"] = jnp.asarray(b.weights.T, dt)
            # lower-bounded: an extreme eps must not underflow X0 to 0
            # (it divides the constraint argument u = v / X0)
            arrs["X0"] = jnp.asarray(
                np.where(maskT > 0, np.maximum(x0 / eps, 1e-30), 1.0), dt
            )
            arrs["aD"] = jnp.asarray(-D0 / eps, dt)
            arrs["aL"] = jnp.asarray(-L0 / eps, dt)
            arrs["sS"] = jnp.asarray(b.shift.T / eps, dt)
            arrs["nsig"] = jnp.asarray(nsig, dt)
            if nu0_ext is not None:
                arrs["nu0e"] = jnp.asarray(nu0_ext[b.asset].T * maskT, dt)
            out[name] = arrs
        return out, min_x0

    def solve_delta(
        self,
        objective,
        bdict,
        nu0: np.ndarray,
        rho: float,
        max_iters: int,
        warm: Optional[RouteResult] = None,
        fused: bool = False,
        interpret: bool = False,
    ) -> RouteResult:
        """One correction solve on the delta bucket arrays.

        Linear objectives run the DELTA-DUAL iteration: the state dual is
        dnu = nu - nu0 (starts at 0 — the base dual is already
        converged), the traced ``c`` slot carries e0 = c/rho - nu0, and
        the returned ``prices`` are rho*dnu (delta-space; add rho*nu0 to
        recover true prices — :func:`refine_device` does).  Utility
        objectives run the classic full-dual iteration.  ``warm`` chains
        chunks within a pass (same-space RouteResult).

        ``fused=True`` runs the fixed-iteration fused-Pallas delta path
        (:meth:`_iterate_fused`): ``max_iters`` fused iterations + one
        classic residual-harvest iteration.  Requires every bucket's pool
        count to be a lane multiple (compile with pad_pools_to>=128).
        """
        c, lo, hi, util, start_nu = _prep_delta_solve(
            objective, nu0, rho, self.dtype
        )
        if warm is not None:
            z0, nu0_arr = self.warm_state(warm, rho)
        else:
            z0 = None
            nu0_arr = jnp.asarray(start_nu, self.dtype)
        if fused:
            if self._solve_fused_jit is None:
                self._solve_fused_jit = jax.jit(
                    self._solve_fused_impl,
                    static_argnames=("n_iters", "interpret"),
                )
            return self._solve_fused_jit(
                c, lo, hi, jnp.asarray(rho, self.dtype),
                n_iters=int(max_iters), util=util, interpret=interpret,
                buckets=bdict, z0=z0, nu0=nu0_arr,
            )
        return self._solve_jit(
            c, lo, hi, jnp.asarray(rho, self.dtype), z0, nu0_arr, util,
            bdict, max_iters=jnp.asarray(int(max_iters), jnp.int32),
        )


def _prep_delta_solve(objective, nu0, rho: float, dtype):
    """(c, lo, hi, util, start_nu) device/host inputs for one correction
    solve.

    SHARED by :class:`DeltaAdmmSolver` and
    :class:`~cfmm_routing_tpu.parallel.sharded.ShardedDeltaAdmmSolver` —
    :func:`refine_device` reconstructs true prices as
    ``rho*nu0 + delta_prices`` exactly when :func:`_delta_precise` holds,
    so every solver implementation MUST take the re-centered (delta-dual)
    path under the same predicate.  (Round-4 advisor finding: the sharded
    path packed separable utilities for the classic full-dual iteration
    while the driver assumed the precise one — the base dual was counted
    twice and sharded refinement of utilities failed to certify.)
    """
    if isinstance(objective, ConcaveUtility):
        from ..ops.prox import DeltaUtility

        pack = objective.pack(dtype)
        c, lo, hi = pack.c, pack.lo, pack.hi
        if _delta_precise(objective):
            # precise re-centered path: dual state is dnu, the fold
            # constant e0u = U'_delta(0) - rho*nu0 rides the utility
            k = np.asarray(objective.kind)
            up0 = np.where(
                k == 2,
                np.asarray(objective.c, np.float64)
                / np.maximum(np.asarray(objective.b, np.float64), 1e-300),
                np.asarray(objective.c, np.float64),
            )
            e0u = up0 - float(rho) * np.asarray(nu0, np.float64)
            util = DeltaUtility(
                kind=pack.kind, c=pack.c, a=pack.a, b=pack.b,
                p=jnp.zeros_like(pack.p), lo=pack.lo, hi=pack.hi,
                e0u=jnp.asarray(e0u, dtype),
            )
            c = jnp.zeros_like(pack.c)
            start_nu = np.zeros_like(np.asarray(nu0, np.float64))
        else:
            util = pack  # power atoms: classic full-dual fallback
            start_nu = np.asarray(nu0, np.float64)
    else:
        util = None
        e0 = np.asarray(objective.c, np.float64) / float(rho) - np.asarray(
            nu0, np.float64
        )
        c = jnp.asarray(e0, dtype)
        fmax = np.finfo(np.float32).max / 4
        lo = jnp.asarray(np.maximum(objective.lo, -fmax), dtype)
        hi = jnp.asarray(np.minimum(objective.hi, fmax), dtype)
        start_nu = np.zeros_like(np.asarray(nu0, np.float64))  # dnu = 0
    return c, lo, hi, util, start_nu


def _delta_precise(objective) -> bool:
    """Whether the re-centered (delta-dual) iteration covers this
    objective: linear Objectives and ConcaveUtility without power atoms
    (power has no cancellation-free closed-form re-centering)."""
    if not isinstance(objective, ConcaveUtility):
        return True
    return not bool(np.any(np.asarray(objective.kind) == 3))


def _delta_objective(objective, psi0: np.ndarray, eps: float):
    """The correction problem's objective:  U_delta(d) = U(psi0 + eps d)/eps.

    The 1/eps scaling keeps the correction problem's dual prices on the
    ORIGINAL price scale (d/dd [U/eps] = U'(psi0 + eps d)), so the base
    dual warm-starts it directly and the refined prices feed the
    certificate unchanged.  Every atom maps exactly:

        linear   c psi                 ->  linear   c d            (+const)
        quad     c psi - a/2 psi^2     ->  quad     (c - a psi0) d - (a eps)/2 d^2
        log      c log(b + psi)        ->  log      (c/eps) log((b+psi0)/eps + d)
        power    (c/p)(b + psi)^p      ->  power    (c eps^{p-1}/p)((b+psi0)/eps + d)^p
    """
    if isinstance(objective, ConcaveUtility):
        kind = objective.kind
        c = objective.c.copy()
        a = objective.a.copy()
        b = objective.b.copy()
        p = objective.p
        quad = kind == 1
        log_ = kind == 2
        pow_ = kind == 3
        c[quad] = c[quad] - a[quad] * psi0[quad]
        a[quad] = a[quad] * eps
        c[log_] = c[log_] / eps
        b[log_] = (b[log_] + psi0[log_]) / eps
        c[pow_] = c[pow_] * eps ** (p[pow_] - 1.0)
        b[pow_] = (b[pow_] + psi0[pow_]) / eps
        return ConcaveUtility(
            kind=kind.copy(), c=c, a=a, b=b, p=p.copy(),
            lo=(objective.lo - psi0) / eps, hi=(objective.hi - psi0) / eps,
        )
    return Objective(
        objective.c, (objective.lo - psi0) / eps, (objective.hi - psi0) / eps
    )


def _compose(compiled, base, delta: RouteResult, eps: float, objective,
             prices=None):
    """f64 host composition of the refined point: D = D0 + eps*a (clamped
    to the orthant — the scaled bound is exact to f32, so the clamp
    moves coordinates by at most ~1e-7*eps*|D0| and only toward
    feasibility).  psi is recomputed from the composed TRADES (the
    delta solve's consensus iterate lags them by the primal residual)."""
    deltas = {}
    lambdas = {}
    psi = np.zeros(compiled.n_assets + 1)
    for name, b in compiled.buckets.items():
        D0 = np.asarray(base.deltas[name], np.float64)
        L0 = np.asarray(base.lambdas[name], np.float64)
        D = np.maximum(D0 + eps * np.asarray(delta.deltas[name], np.float64), 0.0)
        L = np.maximum(L0 + eps * np.asarray(delta.lambdas[name], np.float64), 0.0)
        deltas[name] = D
        lambdas[name] = L
        np.add.at(
            psi, b.asset.reshape(-1), ((L.T - D.T) * b.mask).reshape(-1)
        )
    psi = psi[: compiled.n_assets]
    if prices is None:
        prices = np.asarray(delta.prices, np.float64)
    if isinstance(objective, ConcaveUtility):
        obj = objective.value(psi)
    else:
        obj = float(np.asarray(objective.c, np.float64) @ psi)
    return base._replace(
        objective=np.float64(obj),
        psi=psi,
        prices=prices,
        deltas=deltas,
        lambdas=lambdas,
        iters=np.asarray(base.iters) + np.asarray(delta.iters),
        r_norm=np.asarray(delta.r_norm),
        s_norm=np.asarray(delta.s_norm),
        converged=np.asarray(delta.converged),
        rho_final=np.asarray(delta.rho_final),
    )


def _to_host(res: RouteResult) -> RouteResult:
    return jax.tree_util.tree_map(np.asarray, res)


def _psi_from_trades(compiled, point: RouteResult) -> np.ndarray:
    """Exact f64 net trade of the point's TRADES.  The correction
    problem's box residuals must be consistent with the trades the
    deltas are centered on — the consensus iterate ``point.psi`` lags
    them by the primal residual, which would poison the composed
    point's box feasibility at exactly that magnitude."""
    psi = np.zeros(compiled.n_assets + 1)
    for name, b in compiled.buckets.items():
        D = np.asarray(point.deltas[name], np.float64)
        L = np.asarray(point.lambdas[name], np.float64)
        np.add.at(psi, b.asset.reshape(-1), ((L.T - D.T) * b.mask).reshape(-1))
    return psi[: compiled.n_assets]


def _fused_delta_ok(solver) -> bool:
    """Whether the fused delta kernel can run on this solver: every
    bucket's per-device pool count must be a lane multiple (the kernel
    tiles pools onto the 128-lane axis)."""
    n_shards = int(getattr(solver, "n_shards", 1))
    buckets = (
        solver.buckets if hasattr(solver, "buckets") else solver.inner.buckets
    )
    for arrs in buckets.values():
        m = int(arrs["mask"].shape[1])
        if m % n_shards != 0 or (m // n_shards) % 128 != 0:
            return False
    return True


def _on_accelerator() -> bool:
    """True when the default device is NOT the CPU backend (the compiled
    Pallas path is TPU-only; CPU runs use interpret mode explicitly)."""
    default_dev = jax.config.jax_default_device
    platform = (
        default_dev.platform if default_dev is not None
        else jax.default_backend()
    )
    return platform != "cpu"


def refine_device(
    compiled: CompiledProblem,
    objective,
    result: RouteResult,
    target_gap: float = 1e-6,
    options: Optional[AdmmOptions] = None,
    max_passes: int = 3,
    chunk_iters: int = 250,
    chunks_per_pass: int = 8,
    solver: Optional[DeltaAdmmSolver] = None,
    polish: bool = True,
    cert_space=None,
    rho0: Optional[float] = None,
    eps_factor: float = 10.0,
    fused: Optional[bool] = None,
    interpret: bool = False,
) -> RefineResult:
    """Polish an f32 solve to a certified gap with ON-DEVICE f32
    correction solves (see module docstring).  Drop-in for
    :func:`solver.refine.refine` on linear / separable-concave
    objectives; the certificate itself stays a rigorous f64 host pass.

    ``solver``: pass a pre-built :class:`DeltaAdmmSolver` to reuse its
    compiled program across calls (the per-call delta arrays are traced
    arguments).  Returns host-side numpy arrays only.

    ``cert_space``: optional ``(cert_compiled, cert_objective,
    unscale_fn)`` — refine in THIS (typically equilibrated) space but
    evaluate every certificate, and return the result, in the space
    ``unscale_fn`` maps to (typically original units; see
    ``solver/precondition.py`` — the certificate must speak the caller's
    units).

    ``fused``: run the correction solves on the fused-Pallas delta path
    (full base-solve throughput instead of the classic path's ~44% of
    it).  Default ``None`` = auto: fused whenever every bucket is
    lane-aligned AND the default device is an accelerator (CPU runs take
    the classic path unless ``fused=True, interpret=True`` is forced).
    """
    if not isinstance(objective, (Objective, ConcaveUtility)):
        raise NotImplementedError(
            "refine_device supports Objective / ConcaveUtility; custom "
            "non-separable utilities use solver.refine.refine"
        )
    base_opts = options if options is not None else AdmmOptions()
    cur = _to_host(result)
    if cert_space is None:
        cert_compiled, cert_objective = compiled, objective
        unscale_fn = lambda r: r  # noqa: E731
    else:
        cert_compiled, cert_objective, unscale_fn = cert_space

    def _hit(c):
        return abs(c.gap_rel) <= target_gap and c.feasibility_rel <= target_gap

    def _cert(point):
        point = unscale_fn(point)
        cert = certify(
            cert_compiled, cert_objective, point.deltas, point.lambdas,
            point.prices, psi_claimed=point.psi,
        )
        # the L-BFGS price polish exists to close NEAR-MISS dual looseness;
        # it only makes sense when the GAP is the blocking criterion —
        # polishing prices cannot repair primal feasibility, and running
        # it on every far-from-target certificate costs seconds per pass
        # for nothing (measured: no outcome change)
        near_miss = (
            cert.gap_rel < max(20.0 * target_gap, 1e-5)
            and cert.feasibility_rel <= target_gap
        )
        if polish and not _hit(cert) and cert.gap_abs > 0 and near_miss:
            try:
                nu_p = polish_prices(
                    cert_compiled, cert_objective, np.asarray(point.prices),
                    max_evals=60,
                )
                cert_p = certify(
                    cert_compiled, cert_objective, point.deltas,
                    point.lambdas, nu_p, psi_claimed=point.psi,
                )
                if cert_p.gap_abs < cert.gap_abs:
                    cert = cert_p
            except Exception:
                pass  # the polish is an accelerator, never load-bearing
        return cert

    cert = _cert(cur)
    if _hit(cert):
        return RefineResult(
            result=unscale_fn(cur), certificate=cert, iters=0, achieved=True
        )

    if solver is None:
        opts = dataclasses.replace(
            base_opts,
            max_iters=max(base_opts.max_iters, chunk_iters),
            # residual tolerances on the SCALED correction: eps-rel noise
            # in scaled units is ~1e-7, so 1e-7-class targets are the
            # f32 floor of the delta solve.  rho adaptation is off: the
            # delta-dual iteration folds c/rho - nu0 into a per-pass
            # constant, which an in-solve penalty rescale would break
            # (and measured: the delta iteration count is insensitive to
            # rho over 0.25..4x).
            eps_abs=1e-8, eps_rel=1e-8, adapt_rho=False,
        )
        solver = DeltaAdmmSolver(compiled, dtype=jnp.float32, options=opts)
    else:
        # the delta-dual iteration folds e0 = c/rho - nu0 as a per-solve
        # constant; an in-solve rho rescale would silently invalidate it
        # (the requirement used to live only in docstrings — round-4
        # advisor finding)
        s_opts = getattr(solver, "options", None)
        if s_opts is None:
            s_opts = solver.inner.options
        if s_opts.adapt_rho:
            raise ValueError(
                "refine_device needs a solver with adapt_rho=False: the "
                "delta-dual iteration folds c/rho - nu0 into a per-solve "
                "constant that an in-solve penalty rescale invalidates "
                "(build the solver with AdmmOptions(adapt_rho=False, "
                "eps_abs=1e-8, eps_rel=1e-8))"
            )
    if fused is None:
        fused = _fused_delta_ok(solver) and _on_accelerator()
    elif fused and not _fused_delta_ok(solver):
        raise ValueError(
            "fused=True needs every bucket's (per-device) pool count to "
            "be a multiple of 128 — compile with pad_pools_to=128 (or "
            "1024 for compiled TPU tiles)"
        )

    total = 0
    for _ in range(int(max_passes)):
        psi0 = _psi_from_trades(compiled, cur)
        cur = cur._replace(psi=psi0)
        # eps lives in SOLVE-space PER-SLOT trade units.  Using the
        # per-asset psi scale here (which can exceed the slot scale by
        # the ~degree-sized fan-in) oversizes eps by that factor and the
        # fixed-penalty delta solve crawls — measured at 16k pools/256
        # assets: psi-scale eps needed >6000 iterations and never
        # certified; trade-scale eps certified in ONE 250-iteration chunk.
        scale = max(
            1.0,
            max(
                max(
                    float(np.max(np.abs(np.asarray(cur.deltas[k])))),
                    float(np.max(np.abs(np.asarray(cur.lambdas[k])))),
                )
                for k in cur.deltas
            ),
        )
        err = max(cert.feasibility_rel, abs(cert.gap_rel), 1e-12)
        # headroom factor (default 10): the correction in flat directions
        # can be larger than the gap suggests; over-sizing eps only costs
        # a little of the precision gain, under-sizing costs nothing but
        # larger scaled iterates (f32 range is not a constraint)
        eps = float(np.clip(eps_factor * err * scale, 1e-10 * scale, np.inf))
        # the delta solve starts from z=0 and owes nothing to the base
        # penalty; a collapsed base rho is actively harmful — nu0 =
        # prices/rho blows up to O(1/rho), and the delta-dual design's
        # f32 noise scales with |nu0| (measured: base rho 0.002 -> nu0
        # O(500) -> a 2e-5 gap floor).  Iteration count is insensitive
        # over [0.25, 4] (knob sweep), so clamp into that band.
        rho = float(np.asarray(cur.rho_final)) if rho0 is None else float(rho0)
        rho = float(np.clip(rho, 0.25, 4.0))
        precise = _delta_precise(objective)
        # f32-round nu0 ONCE and use the identical values in the nu0e
        # planes, in e0/e0u, and in the price reconstruction — consistency
        # of the re-centering constant is what makes the fold exact
        nu0f = (
            (np.asarray(cur.prices, np.float64) / rho)
            .astype(np.float32)
            .astype(np.float64)
        )
        bdict, min_x0 = solver.delta_buckets(
            cur, eps, nu0=nu0f if precise else None
        )
        if not (min_x0 > 0.0) or not np.isfinite(min_x0):
            _LOG.warning(
                "refine_device: base point has a non-positive post-trade "
                "reserve (min x0 = %g) — falling back to the host f64 "
                "refine path", min_x0,
            )
            from .refine import refine as _host_refine

            host = _host_refine(
                cert_compiled, cert_objective, unscale_fn(cur),
                target_gap=target_gap, options=base_opts,
            )
            return RefineResult(
                result=host.result, certificate=host.certificate,
                iters=total + host.iters, achieved=host.achieved,
            )
        dobj = _delta_objective(objective, np.asarray(cur.psi, np.float64), eps)
        # NOTE the deliberate scale break: exact penalty correspondence to
        # the base solve would be rho~ = rho_base * eps with dual nu/eps —
        # but an O(1/eps) dual reintroduces exactly the f32 cancellation
        # this module exists to remove.  The delta problem is kept
        # self-normalized (variables O(1) by the eps choice) with the
        # dual re-centered at nu0 (see DeltaAdmmSolver._iterate).
        dwarm = None
        improved = False
        # the chunked delta trajectory is relative to THIS pass's center;
        # composing against the rolling best instead would double-count
        # the accepted correction on every later chunk (measured: chunks
        # 2..8 regressed to entry quality at 1k pools)
        center = cur
        for _c in range(int(chunks_per_pass)):
            dres = solver.solve_delta(
                dobj, bdict, nu0f, rho, chunk_iters, warm=dwarm,
                fused=fused, interpret=interpret,
            )
            dwarm = _to_host(dres)
            total += int(np.asarray(dwarm.iters))
            prices_true = (
                rho * nu0f + np.asarray(dwarm.prices, np.float64)
                if precise
                else None
            )
            cand = _compose(
                compiled, center, dwarm, eps, objective, prices=prices_true
            )
            cand_cert = _cert(cand)
            _LOG.debug(
                "refine chunk: r=%.2e s=%.2e gap=%.2e feas=%.2e (eps=%.3g rho=%.3g)",
                float(dwarm.r_norm), float(dwarm.s_norm),
                cand_cert.gap_rel, cand_cert.feasibility_rel, eps, rho,
            )
            if (
                max(cand_cert.feasibility_rel, abs(cand_cert.gap_rel))
                < max(cert.feasibility_rel, abs(cert.gap_rel))
            ):
                improved = True
                cur, cert = cand, cand_cert
            if _hit(cert):
                return RefineResult(
                    result=unscale_fn(cur), certificate=cert, iters=total,
                    achieved=True,
                )
            if int(np.asarray(dres.iters)) < chunk_iters or bool(
                np.asarray(dres.converged)
            ):
                break  # delta solve residual-converged; re-center
        if not improved:
            break  # a re-centered pass at smaller eps won't help either
    return RefineResult(
        result=unscale_fn(cur), certificate=cert, iters=total, achieved=False
    )
