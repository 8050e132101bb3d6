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

__all__ = ["DeltaAdmmSolver", "refine_device", "refine_sweep"]

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
        from ..ops.prox import (
            DeltaCustomUtility,
            DeltaUtility,
            delta_custom_prox,
            delta_utility_prox,
        )

        is_dc = isinstance(custom, DeltaCustomUtility)
        if (custom is not None and not is_dc) or (
            util is not None and not isinstance(util, DeltaUtility)
        ):
            # non-re-centered objectives take the classic full-dual
            # iteration (their refinement floor keeps the d-amplified
            # term); round 5 re-centered every separable atom AND
            # CustomUtility, so this fallback is now only reachable for
            # explicitly-packed classic utilities
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
        if is_dc:
            # re-centered non-separable FISTA prox (round 5)
            psi, dmu = delta_custom_prox(nu, yhat, self.degree, custom, rho)
        elif util is None:
            d_safe = jnp.maximum(self.degree, 1.0)
            psi = yhat + 2.0 * d_safe * (c - nu)  # c == e0, nu == dnu: small
            psi = jnp.clip(psi, lo, hi)
            psi = jnp.where(self.degree > 0, psi, 0.0)
            dmu = nu + (psi - yhat) / (2.0 * d_safe)
            dmu = jnp.where(self.degree > 0, dmu, 0.0)
        else:
            # precise re-centered separable prox (all four atom kinds)
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

    # ---- batched (grid-axis) correction solves ---------------------------

    def delta_buckets_batch(self, deltas, lambdas, eps, nu0):
        """Batched delta arrays for T grid points in one shot.

        ``deltas``/``lambdas``: bucket name -> (T, K, m) base trades;
        ``eps``: (T,) per-point correction scales; ``nu0``: (T, n)
        f32-exact base scaled duals.  Returns (buckets, in_axes,
        min_x0(T,)) where in_axes marks the leaves that carry the grid
        axis (pass to :meth:`solve_delta_batch`).  Vectorized mirror of
        :meth:`delta_buckets` — the round-4 sweep built these per point
        in a serial host loop (VERDICT weak #4).
        """
        dt = self.dtype
        eps = np.asarray(eps, np.float64)
        T = eps.shape[0]
        e = eps[:, None, None]
        nu0_ext = np.concatenate(
            [np.asarray(nu0, np.float64), np.zeros((T, 1))], axis=1
        )
        out = {}
        axes = {}
        min_x0 = np.full(T, np.inf)
        for name, b in self.compiled.buckets.items():
            kind, _ = self._meta[name]
            D0 = np.asarray(deltas[name], np.float64)  # (T, K, m)
            L0 = np.asarray(lambdas[name], np.float64)
            maskT = b.mask.T  # (K, m)
            gamma = b.gamma[:, 0][None, None, :]  # (1, 1, m)
            if kind == "gm":
                x0 = (b.reserves + b.shift).T[None] + gamma * D0 - L0
                x0 = np.where(maskT[None] > 0, x0, 1.0)
                logx0 = np.log(np.maximum(x0, 1e-300))
                sigma0 = np.sum(b.weights.T[None] * logx0, axis=1) - b.logk0[None]
                nsig = -sigma0  # (T, m)
                real = np.where(maskT[None] > 0, x0, np.inf)
                min_x0 = np.minimum(
                    min_x0, np.min(real.reshape(T, -1), axis=1, initial=np.inf)
                )
            else:
                x0 = b.reserves.T[None] + gamma * D0 - L0
                x0 = np.where(maskT[None] > 0, x0, 1.0)
                s0 = np.sum(
                    b.weights.T[None] * np.where(maskT[None] > 0, x0, 0.0),
                    axis=1,
                )
                nsig = -(s0 - b.k0[None]) / eps[:, None]
            arrs = dict(self.buckets[name])
            arrs["w"] = jnp.asarray(b.weights.T, dt)
            arrs["X0"] = jnp.asarray(
                np.where(maskT[None] > 0, np.maximum(x0 / e, 1e-30), 1.0), dt
            )
            arrs["aD"] = jnp.asarray(-D0 / e, dt)
            arrs["aL"] = jnp.asarray(-L0 / e, dt)
            arrs["sS"] = jnp.asarray(
                np.broadcast_to(b.shift.T[None], D0.shape) / e, dt
            )
            arrs["nsig"] = jnp.asarray(nsig, dt)
            arrs["nu0e"] = jnp.asarray(
                nu0_ext[:, b.asset].transpose(0, 2, 1) * maskT[None], dt
            )
            out[name] = arrs
            axes[name] = {
                k: (
                    0
                    if k in ("X0", "aD", "aL", "sS", "nsig", "nu0e")
                    else None
                )
                for k in arrs
            }
        return out, axes, min_x0

    def solve_delta_batch(
        self, c, lo, hi, nu0, rho, bdict, axes, max_iters, warm=None
    ):
        """T vmapped correction solves (linear objectives, delta-dual
        iteration).  ``c`` carries e0 = c_true/rho - nu0 per point;
        ``rho`` is (T,).  One device program for the whole grid.

        ``warm``: a previous batched delta RouteResult (same center /
        same delta space) — chains chunks within a pass exactly like the
        single-route path's ``solve_delta(warm=...)``: z0 = the trades,
        dnu0 = prices/rho (the delta dual the chunk ended at)."""
        dt = self.dtype
        if warm is None:
            if getattr(self, "_delta_batch_jit", None) is None:
                def _one(c_, lo_, hi_, rho_, nu0_, bks, mi):
                    return self._solve_impl(
                        c_, lo_, hi_, rho_, nu0=nu0_, buckets=bks,
                        max_iters=mi,
                    )

                self._delta_batch_jit = jax.jit(
                    jax.vmap(_one, in_axes=(0, 0, 0, 0, 0, axes, None))
                )
            return self._delta_batch_jit(
                jnp.asarray(c, dt), jnp.asarray(lo, dt), jnp.asarray(hi, dt),
                jnp.asarray(rho, dt), jnp.asarray(nu0, dt), bdict,
                jnp.asarray(int(max_iters), jnp.int32),
            )
        if getattr(self, "_delta_batch_warm_jit", None) is None:
            zaxes = {k: (0, 0) for k in self.buckets}

            def _one_w(c_, lo_, hi_, rho_, z0_, nu0_, bks, mi):
                return self._solve_impl(
                    c_, lo_, hi_, rho_, z0=z0_, nu0=nu0_, buckets=bks,
                    max_iters=mi,
                )

            self._delta_batch_warm_jit = jax.jit(
                jax.vmap(_one_w, in_axes=(0, 0, 0, 0, zaxes, 0, axes, None))
            )
        z0 = {
            name: (
                jnp.asarray(warm.deltas[name], dt),
                jnp.asarray(warm.lambdas[name], dt),
            )
            for name in self.buckets
        }
        # stay on device: the chunk chain never moves the trade planes
        dnu0 = (
            jnp.asarray(warm.prices, dt)
            / jnp.asarray(rho, dt)[:, None]
        )
        return self._delta_batch_warm_jit(
            jnp.asarray(c, dt), jnp.asarray(lo, dt), jnp.asarray(hi, dt),
            jnp.asarray(rho, dt), z0, dnu0, bdict,
            jnp.asarray(int(max_iters), jnp.int32),
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
        fold = getattr(self, "_fold", None)
        v, unpack = self._fold_pack(wdef - nu, fold)
        y = jnp.zeros(v.shape, self.dtype)
        s_new = {}
        w_out = {}
        for name, arrs in buckets.items():
            kind, floor = self._meta[name]
            sD, sL = s[name]
            sDn, sLn, A, B, yp = fused_step_delta(
                sD, sL, v, arrs, kind, floor, alpha,
                cfg=self.options.projection, interpret=interpret,
                fold=fold,
            )
            s_new[name] = (sDn, sLn)
            w_out[name] = (A, B)
            y = y + yp
        yhat = self._psum(unpack(y)) - 2.0 * (1.0 - alpha) * self.degree * wdef
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
            host = dict(
                w=b.weights.T.astype(dt),
                # lower-bounded: an extreme eps must not underflow X0 to
                # 0 (it divides the constraint argument u = v / X0)
                X0=np.where(
                    maskT > 0, np.maximum(x0 / eps, 1e-30), 1.0
                ).astype(dt),
                aD=(-D0 / eps).astype(dt),
                aL=(-L0 / eps).astype(dt),
                sS=(b.shift.T / eps).astype(dt),
                nsig=np.asarray(nsig).astype(dt),
            )
            if nu0_ext is not None:
                host["nu0e"] = (nu0_ext[b.asset].T * maskT).astype(dt)
            arrs["_host"] = host
            out[name] = arrs
        # ONE batched host->device transfer for all pass-varying planes
        # (per-leaf jnp.asarray is a separate round trip per plane —
        # latency-bound over the remote-TPU tunnel)
        uploads = jax.device_put({n_: a.pop("_host") for n_, a in out.items()})
        for name, up in uploads.items():
            out[name].update(up)
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
        from ..ops.prox import DeltaCustomUtility

        c, lo, hi, util, start_nu = _prep_delta_solve(
            objective, nu0, rho, self.dtype
        )
        if warm is not None:
            z0, nu0_arr = self.warm_state(warm, rho)
        else:
            z0 = None
            nu0_arr = jnp.asarray(start_nu, self.dtype)
        if isinstance(util, DeltaCustomUtility):
            if fused:
                raise ValueError(
                    "the fused delta kernel does not take CustomUtility "
                    "objectives yet — use fused=False (the classic delta "
                    "path is equally precise)"
                )
            if getattr(self, "_delta_custom_jit", None) is None:
                def _impl(c_, lo_, hi_, rho_, z0_, nu0_, dc, bks, mi):
                    return self._solve_impl(
                        c_, lo_, hi_, rho_, z0=z0_, nu0=nu0_, custom=dc,
                        buckets=bks, max_iters=mi,
                    )

                self._delta_custom_jit = jax.jit(_impl)
            return self._delta_custom_jit(
                c, lo, hi, jnp.asarray(rho, self.dtype), z0, nu0_arr,
                util, bdict, jnp.asarray(int(max_iters), jnp.int32),
            )
        if fused:
            if self._solve_fused_jit is None:
                self._solve_fused_jit = jax.jit(
                    self._solve_fused_impl,
                    static_argnames=("n_iters", "interpret", "merged"),
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
    from ..ops.prox import DeltaCustomUtility

    if isinstance(objective, DeltaCustomUtility):
        # non-separable re-centered path (round 5): fill in the fold
        # constant e0u = U'(psi0) [f64 host] - rho*nu0 and zero the c
        # slot — the dual state is dnu, the prox is delta_custom_prox
        psi0_64 = np.asarray(objective.psi0, np.float64)
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            with jax.enable_x64():
                up0 = np.asarray(
                    jax.grad(objective.base_fn)(
                        jnp.asarray(psi0_64, jnp.float64)
                    ),
                    np.float64,
                )
        e0u = up0 - float(rho) * np.asarray(nu0, np.float64)
        util = DeltaCustomUtility(
            objective.base_fn, objective.smoothness, objective.prox_iters,
            objective.psi0, objective.eps, jnp.asarray(e0u, dtype),
            objective.lo, objective.hi,
        )
        c = jnp.zeros(psi0_64.shape, dtype)
        return (
            c, util.lo, util.hi, util,
            np.zeros_like(np.asarray(nu0, np.float64)),
        )
    if isinstance(objective, ConcaveUtility):
        from ..ops.prox import DeltaUtility

        pack = objective.pack(dtype)
        c, lo, hi = pack.c, pack.lo, pack.hi
        if _delta_precise(objective):
            # precise re-centered path: dual state is dnu, the fold
            # constant e0u = U'_delta(0) - rho*nu0 rides the utility.
            # U'_delta(0) per atom (objective here is the TRANSFORMED
            # delta objective): linear/quad c; log c/b; power c*b^{p-1}
            # — all in f64 (round 5: power atoms joined the precise
            # path via the expm1/log1p stationary solve in
            # ops.prox.delta_utility_prox)
            k = np.asarray(objective.kind)
            c64 = np.asarray(objective.c, np.float64)
            b64 = np.maximum(np.asarray(objective.b, np.float64), 1e-300)
            p64 = np.asarray(objective.p, np.float64)
            up0 = np.where(
                k == 2,
                c64 / b64,
                np.where(
                    k == 3,
                    c64 * b64 ** (np.clip(p64, 0.01, 0.99) - 1.0),
                    c64,
                ),
            )
            e0u = up0 - float(rho) * np.asarray(nu0, np.float64)
            util = DeltaUtility(
                kind=pack.kind, c=pack.c, a=pack.a, b=pack.b,
                p=pack.p, lo=pack.lo, hi=pack.hi,
                e0u=jnp.asarray(e0u, dtype),
                A=jnp.asarray(up0, dtype),
            )
            c = jnp.zeros_like(pack.c)
            start_nu = np.zeros_like(np.asarray(nu0, np.float64))
        else:
            util = pack  # non-finite transforms: classic full-dual
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


def _curvature_scale(objective, psi0: np.ndarray) -> float:
    """max_j |U''_j(psi0_j)| for the ORIGINAL-space objective (0 for
    linear).  The delta objective's curvature is eps times this, which
    sets the natural ADMM penalty for the correction solve (see the rho
    note in :func:`refine_device`)."""
    if not isinstance(objective, ConcaveUtility):
        from ..models.utility import CustomUtility

        if isinstance(objective, CustomUtility):
            return float(objective.smoothness)
        return 0.0
    k = np.asarray(objective.kind)
    c = np.asarray(objective.c, np.float64)
    a = np.asarray(objective.a, np.float64)
    b = np.asarray(objective.b, np.float64)
    p = np.asarray(objective.p, np.float64)
    y = np.maximum(b + np.asarray(psi0, np.float64), 1e-12)
    curv = np.where(
        k == 1, a,
        np.where(
            k == 2, c / (y * y),
            np.where(
                k == 3,
                np.abs(c * (1.0 - np.clip(p, 0.01, 0.99)))
                * y ** (np.clip(p, 0.01, 0.99) - 2.0),
                0.0,
            ),
        ),
    )
    return float(np.max(curv, initial=0.0))


def _delta_precise(objective) -> bool:
    """Whether the re-centered (delta-dual) iteration covers this
    objective.  Round 5: every separable atom qualifies — linear, quad
    and log are closed-form, power runs the cancellation-free
    expm1/log1p stationary solve (``ops.prox.delta_utility_prox``) — so
    the only exclusions are non-ConcaveUtility objects other than the
    linear Objective (handled by the caller)."""
    return True


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
        custom   U(psi)                ->  U(psi0 + eps d)/eps  (DeltaCustomUtility)
    """
    from ..models.utility import CustomUtility

    if isinstance(objective, CustomUtility):
        from ..ops.prox import DeltaCustomUtility

        fmax = np.finfo(np.float32).max / 4
        lo = np.clip((objective.lo - psi0) / eps, -fmax, fmax)
        hi = np.clip((objective.hi - psi0) / eps, -fmax, fmax)
        return DeltaCustomUtility(
            objective.fn, objective.smoothness, objective.prox_iters,
            jnp.asarray(psi0, jnp.float32), jnp.asarray(eps, jnp.float32),
            jnp.zeros(psi0.shape, jnp.float32),  # e0u filled at solve prep
            jnp.asarray(lo, jnp.float32), jnp.asarray(hi, jnp.float32),
        )
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
    from ..models.utility import CustomUtility

    if isinstance(objective, (ConcaveUtility, CustomUtility)):
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
    """ONE batched device->host fetch.  Per-leaf np.asarray() issues a
    separate round trip per array, which over the remote-TPU tunnel is
    latency-bound (measured: ~1 s for a 12-leaf RouteResult vs ~0.1 s
    for the batched jax.device_get of the same tree)."""
    return jax.device_get(res)


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


class SweepRefineResult:
    """Batched refinement output (see :func:`refine_sweep`)."""

    def __init__(self, deltas, lambdas, prices, objectives, certificates,
                 achieved, iters):
        self.deltas = deltas  # bucket -> (T, K, m)
        self.lambdas = lambdas
        self.prices = prices  # (T, n)
        self.objectives = objectives  # (T,) f64 certificate objectives
        self.certificates = certificates  # list of T Certificate
        self.achieved = achieved  # (T,) bool
        self.iters = iters  # total vmapped device iterations dispatched


def _psi_batch(compiled, deltas, lambdas):
    """(T, n) exact f64 net trades of T candidate points."""
    n = compiled.n_assets
    some = next(iter(deltas.values()))
    T = some.shape[0]
    psi = np.zeros((T, n + 1))
    for name, b in compiled.buckets.items():
        D = np.asarray(deltas[name], np.float64)
        L = np.asarray(lambdas[name], np.float64)
        vals = ((L - D) * b.mask.T[None]).reshape(T, -1)
        ids = b.asset.T.reshape(-1)
        idx = ids[None, :] + (n + 1) * np.arange(T)[:, None]
        psi += np.bincount(
            idx.reshape(-1), weights=vals.reshape(-1),
            minlength=T * (n + 1),
        ).reshape(T, n + 1)
    return psi[:, :n]


def _delta_buckets_folded(fsolver, deltas, lambdas, eps, nu0f):
    """Folded delta bucket arrays: per-point (T, K, m) trades -> (K, T*m)
    planes on a FOLDED solver (``solver/fold.py``).

    ``eps``: (T,) per-point correction scales, broadcast to each point's
    pool block; ``nu0f``: (T, n) f32-exact scaled base duals (their fold
    feeds the pre-broadcast nu0e plane through the folded asset ids).
    Returns (bdict, min_x0 (T,)) — min_x0 is per POINT so one degenerate
    re-center only sidelines its own grid point."""
    from .fold import fold_planes, fold_vec

    dt = fsolver.dtype
    eps = np.asarray(eps, np.float64)
    T = eps.shape[0]
    D0f = fold_planes(deltas)
    L0f = fold_planes(lambdas)
    nu0_ext = np.concatenate([fold_vec(nu0f), [0.0]])
    out = {}
    min_x0 = np.full(T, np.inf)
    for name, b in fsolver.compiled.buckets.items():
        kind, _ = fsolver._meta[name]
        D0 = D0f[name]  # (K, m_f)
        L0 = L0f[name]
        maskT = b.mask.T
        gamma = b.gamma[:, 0][None, :]
        m_f = maskT.shape[1]
        eps_col = np.repeat(eps, m_f // T)[None, :]  # (1, m_f)
        if kind == "gm":
            x0 = (b.reserves + b.shift).T + gamma * D0 - L0
            x0 = np.where(maskT > 0, x0, 1.0)
            logx0 = np.log(np.maximum(x0, 1e-300))
            sigma0 = np.sum(b.weights.T * logx0, axis=0) - b.logk0
            nsig = -sigma0
            real = np.where(maskT > 0, x0, np.inf)
            min_x0 = np.minimum(
                min_x0, np.min(real.reshape(-1, T, m_f // T), axis=(0, 2))
            )
        else:
            x0 = b.reserves.T + gamma * D0 - L0
            x0 = np.where(maskT > 0, x0, 1.0)
            s0 = np.sum(b.weights.T * np.where(maskT > 0, x0, 0.0), axis=0)
            nsig = -(s0 - b.k0) / eps_col[0]
        arrs = dict(fsolver.buckets[name])
        host = dict(
            w=b.weights.T.astype(dt),
            X0=np.where(
                maskT > 0, np.maximum(x0 / eps_col, 1e-30), 1.0
            ).astype(dt),
            aD=(-D0 / eps_col).astype(dt),
            aL=(-L0 / eps_col).astype(dt),
            sS=(b.shift.T / eps_col).astype(dt),
            nsig=np.asarray(nsig).astype(dt),
            nu0e=(nu0_ext[b.asset].T * maskT).astype(dt),
        )
        arrs["_host"] = host
        out[name] = arrs
    uploads = jax.device_put({n_: a.pop("_host") for n_, a in out.items()})
    for name, up in uploads.items():
        out[name].update(up)
    return out, min_x0


def refine_sweep(
    compiled: CompiledProblem,
    c,
    lo,
    hi,
    result: RouteResult,
    target_gap: float = 1e-6,
    options: Optional[AdmmOptions] = None,
    solver: Optional[DeltaAdmmSolver] = None,
    max_passes: int = 4,
    iters_per_pass: int = 1000,
    eps_factor: float = 10.0,
    fold: Optional[bool] = None,
) -> SweepRefineResult:
    """Refine EVERY point of a batched sweep to a certified gap with ONE
    correction solve per pass (linear objectives).

    ``c``/``lo``/``hi``: (T, n) per-point objectives; ``result``: the
    batched RouteResult from ``AdmmSolver.solve_batch``.  Each pass
    re-centers all T points, runs one batched delta-dual solve, composes
    in f64, and certifies the whole grid with ONE
    :func:`~cfmm_routing_tpu.solver.certify.certify_batch` call —
    replacing the round-4 serial per-point loop (``api.py``).  Per-point
    candidates are accepted only when they improve that point's
    certificate score, so an occasional degenerate point (non-positive
    post-trade reserve re-center) can never regress; points that fail to
    reach the target are reported achieved=False (callers may fall back
    to per-point :func:`refine_device`).  Match:
    ``/root/reference/two-asset.py:91`` — each of the reference's 50
    serial solves is ECOS-certified.

    ``fold`` (default auto = True unless a custom ``solver`` is passed):
    run the grid's correction solves FOLDED along the pool axis
    (``solver/fold.py``) — T block-diagonal copies as one ``T*m``-pool
    solve — so they ride the fused Pallas delta kernel with one launch
    per bucket per iteration regardless of T.  The delta-dual iteration
    is rho-free for linear objectives, so per-point penalties fold
    exactly: e0 is built per point, the folded solve runs at rho=1, and
    prices rescale per point on the way out.  ``fold=False`` keeps the
    vmapped classic path.
    """
    from .certify import certify_batch

    c = np.asarray(c, np.float64)
    lo = np.asarray(lo, np.float64)
    hi = np.asarray(hi, np.float64)
    T = c.shape[0]
    res = jax.device_get(result)
    deltas = {k: np.asarray(v, np.float64) for k, v in res.deltas.items()}
    lambdas = {k: np.asarray(v, np.float64) for k, v in res.lambdas.items()}
    prices = np.asarray(res.prices, np.float64).copy()
    rho_f = np.asarray(res.rho_final, np.float64).reshape(T)

    if fold is None:
        fold = solver is None  # a caller-built solver keeps the vmap path
    fsolver = None
    fused_fold = False
    if solver is None:
        base = options if options is not None else AdmmOptions()
        opts = dataclasses.replace(
            base, max_iters=int(iters_per_pass), eps_abs=1e-8, eps_rel=1e-8,
            adapt_rho=False,
        )
        if fold:
            from .fold import folded_solver

            # block-aware fused exchange (ops/iteration_pallas.py fold=):
            # each point against its own price block — H stays n/128.
            # Cached: re-building the folded solver re-compiles the whole
            # delta iteration (15+ s over the remote-TPU tunnel)
            fsolver, _ = folded_solver(
                compiled, T, opts, jnp.float32, cls=DeltaAdmmSolver
            )
            fused_fold = _fused_delta_ok(fsolver) and _on_accelerator()
        else:
            solver = DeltaAdmmSolver(compiled, dtype=jnp.float32, options=opts)
    elif fold:
        raise ValueError(
            "refine_sweep(fold=True) builds its own folded solver — drop "
            "the solver argument or pass fold=False"
        )

    def _score(cert):
        return max(abs(cert.gap_rel), cert.feasibility_rel)

    psi0 = _psi_batch(compiled, deltas, lambdas)
    certs = certify_batch(
        compiled, c, lo, hi, deltas, lambdas, prices, psi_claimed=psi0
    )
    total = 0
    fmax = np.finfo(np.float32).max / 4
    # per-point penalty regime (mirror of refine_device's two-mode
    # ladder): points start on the base penalty; a live point whose
    # score fails to halve in a pass switches to the eps-scaled regime
    # (and back), which grinds positive gaps the base penalty stalls on
    use_eps = np.zeros(T, bool)
    prev_scores = np.full(T, np.inf)
    pass_fails = 0
    for _ in range(int(max_passes)):
        scores = np.array([_score(ct) for ct in certs])
        live = scores > target_gap
        if not live.any():
            break
        flip = live & (scores > 0.5 * prev_scores)
        use_eps[flip] = ~use_eps[flip]
        prev_scores = scores.copy()
        # per-point correction scale from that point's trades + score
        scale = np.ones(T)
        for k in deltas:
            flat = np.abs(deltas[k]).reshape(T, -1)
            flat_l = np.abs(lambdas[k]).reshape(T, -1)
            scale = np.maximum(
                scale,
                np.maximum(flat.max(axis=1), flat_l.max(axis=1)),
            )
        eps = np.clip(
            eps_factor * np.maximum(scores, 1e-12) * scale,
            1e-10 * scale, np.inf,
        )
        rho = np.where(
            use_eps,
            np.clip(eps, 1e-6, 4.0),
            np.clip(rho_f, 0.25, 4.0),
        )
        nu0f = (prices / rho[:, None]).astype(np.float32).astype(np.float64)
        lo_d = np.clip((lo - psi0) / eps[:, None], -fmax, fmax)
        hi_d = np.clip((hi - psi0) / eps[:, None], -fmax, fmax)
        # warm-chained chunks against THIS pass's center until the grid's
        # delta duals converge (the single-route path does the same via
        # solve_delta(warm=...)) — composing a half-converged delta dual
        # leaves the dual bound, and so the certified gap, at the entry
        # level: measured at 1k pools, one 1000-iteration chunk composed
        # mid-solve stalled every point at gap ~ 6e-5 while the chained
        # chunks certify 1e-6
        # the delta-dual state STARTS at dnu = 0 — the base dual enters
        # only through the folded e0 and the pre-broadcast nu0e planes
        # (passing nu0f here as the start dual was the round-5 sweep bug:
        # the solve then walks dnu from the full base dual back toward 0,
        # 100x the iterations with the f32 noise of an O(|nu0|) dual)
        if fold:
            from .fold import fold_vec, unfold_planes, unfold_vec

            bdict_f, min_x0 = _delta_buckets_folded(
                fsolver, deltas, lambdas, eps, nu0f
            )
            # the linear delta-dual iteration is rho-free (rho enters
            # only e0 and the price reconstruction): build e0 per point
            # with its own rho, run the folded solve at rho=1, and
            # rescale prices per point below
            dobj_f = Objective(
                fold_vec(c / rho[:, None]),
                lo=fold_vec(lo_d), hi=fold_vec(hi_d),
            )
            nu0_fold = fold_vec(nu0f)
            dres = None
            for _ck in range(4):
                dres = fsolver.solve_delta(
                    dobj_f, bdict_f, nu0_fold, 1.0, iters_per_pass,
                    warm=dres, fused=fused_fold,
                )
                it_ck = int(np.asarray(dres.iters))
                total += it_ck
                if it_ck < int(iters_per_pass) or bool(
                    np.asarray(dres.converged)
                ):
                    break
            dresh = jax.device_get(dres)
            d_deltas = unfold_planes(
                {k: np.asarray(v, np.float64) for k, v in dresh.deltas.items()},
                T,
            )
            d_lambdas = unfold_planes(
                {
                    k: np.asarray(v, np.float64)
                    for k, v in dresh.lambdas.items()
                },
                T,
            )
            # folded solve ran at rho=1: prices == dnu per point
            d_prices = rho[:, None] * unfold_vec(
                np.asarray(dresh.prices, np.float64), T
            )
        else:
            bdict, axes, min_x0 = solver.delta_buckets_batch(
                deltas, lambdas, eps, nu0f
            )
            e0 = c / rho[:, None] - nu0f
            dnu_start = np.zeros_like(nu0f)
            dres = None
            for _ck in range(4):
                dres = solver.solve_delta_batch(
                    e0, lo_d, hi_d, dnu_start, rho, bdict, axes,
                    iters_per_pass, warm=dres,
                )
                it_ck = int(np.max(np.asarray(dres.iters)))
                total += it_ck
                if it_ck < int(iters_per_pass) or bool(
                    np.all(np.asarray(dres.converged))
                ):
                    break
            dresh = jax.device_get(dres)
            d_deltas = {
                k: np.asarray(v, np.float64) for k, v in dresh.deltas.items()
            }
            d_lambdas = {
                k: np.asarray(v, np.float64)
                for k, v in dresh.lambdas.items()
            }
            d_prices = np.asarray(dresh.prices, np.float64)
        # f64 composition of all T candidates
        cand_D = {}
        cand_L = {}
        e = eps[:, None, None]
        for k in deltas:
            cand_D[k] = np.maximum(deltas[k] + e * d_deltas[k], 0.0)
            cand_L[k] = np.maximum(lambdas[k] + e * d_lambdas[k], 0.0)
        cand_prices = rho[:, None] * nu0f + d_prices
        cand_psi = _psi_batch(compiled, cand_D, cand_L)
        cand_certs = certify_batch(
            compiled, c, lo, hi, cand_D, cand_L, cand_prices,
            psi_claimed=cand_psi,
        )
        improved = False
        for t in range(T):
            if not live[t]:
                continue
            if min_x0[t] <= 0 or not np.isfinite(min_x0[t]):
                continue  # degenerate re-center; keep the entry point
            if _score(cand_certs[t]) < scores[t]:
                improved = True
                certs[t] = cand_certs[t]
                prices[t] = cand_prices[t]
                psi0[t] = cand_psi[t]
                for k in deltas:
                    deltas[k][t] = cand_D[k][t]
                    lambdas[k][t] = cand_L[k][t]
        if not improved:
            # a failed pass flips every live point's regime (acceptance
            # gating already protected their state); two consecutive
            # failed passes end the loop — mirror of refine_device's
            # pass_fails ladder
            if pass_fails:
                break
            pass_fails = 1
            use_eps[live] = ~use_eps[live]
            prev_scores = np.full(T, np.inf)  # don't double-flip next pass
        else:
            pass_fails = 0
    # near-miss stragglers whose blocker is pure dual looseness get the
    # per-point L-BFGS price polish (cheap at n-small; mirrors the
    # single-route path)
    for t in range(T):
        ct = certs[t]
        if _score(ct) <= target_gap:
            continue
        if not (
            0.0 < ct.gap_rel <= max(20.0 * target_gap, 1e-5)
            and ct.feasibility_rel <= target_gap
        ):
            continue
        obj_t = Objective(c[t], lo=lo[t], hi=hi[t])
        try:
            nu_p = polish_prices(compiled, obj_t, prices[t], max_evals=60)
            cert_p = certify(
                compiled, obj_t,
                {k: v[t] for k, v in deltas.items()},
                {k: v[t] for k, v in lambdas.items()},
                nu_p, psi_claimed=psi0[t],
            )
            if cert_p.gap_abs < ct.gap_abs:
                certs[t] = cert_p
                prices[t] = cert_p.prices
        except Exception:
            pass  # the polish is an accelerator, never load-bearing
    achieved = np.array([_score(ct) <= target_gap for ct in certs])
    return SweepRefineResult(
        deltas=deltas, lambdas=lambdas, prices=prices,
        objectives=np.array([ct.objective for ct in certs]),
        certificates=certs, achieved=achieved, iters=total,
    )


def refine_device(
    compiled: CompiledProblem,
    objective,
    result: RouteResult,
    target_gap: float = 1e-6,
    options: Optional[AdmmOptions] = None,
    max_passes: int = 4,
    chunk_iters: int = 250,
    chunks_per_pass: int = 8,
    solver: Optional[DeltaAdmmSolver] = None,
    polish: bool = True,
    cert_space=None,
    rho0: Optional[float] = None,
    eps_factor: float = 10.0,
    fused: Optional[bool] = None,
    interpret: bool = False,
    entry_cert=None,
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
    from ..models.utility import CustomUtility

    is_custom = isinstance(objective, CustomUtility)
    if is_custom:
        if objective.conjugate is None:
            raise ValueError(
                "refine_device(CustomUtility) needs the utility's concave "
                "conjugate for its rigorous certificates — pass "
                "conjugate=lambda nu: <upper bound on sup U(psi) - nu@psi>"
            )
    elif not isinstance(objective, (Objective, ConcaveUtility)):
        raise NotImplementedError(
            "refine_device supports Objective / ConcaveUtility / "
            "CustomUtility (with a conjugate)"
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

    polish_budget = [2]  # at most 2 polish attempts per refine call: the
    #                      L-BFGS dual search costs ~n dual-bound evals
    #                      and repeated attempts from near-identical
    #                      prices rediscover the same point

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
            and polish_budget[0] > 0
        )
        if polish and not _hit(cert) and cert.gap_abs > 0 and near_miss:
            polish_budget[0] -= 1
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

    # ``entry_cert``: a certificate of ``result`` the caller ALREADY paid
    # for in cert_space units (e.g. the solve loop's handoff confirm) —
    # skips the redundant entry pass
    cert = entry_cert if entry_cert is not None else _cert(cur)
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
        fused = (
            _fused_delta_ok(solver) and _on_accelerator() and not is_custom
        )
    elif fused and not _fused_delta_ok(solver):
        raise ValueError(
            "fused=True needs every bucket's (per-device) pool count to "
            "be a multiple of 128 — compile with pad_pools_to=128 (or "
            "1024 for compiled TPU tiles)"
        )

    total = 0
    # Two penalty regimes, tried as a ladder (see the rho note below):
    # 'base' = the round-4 clamp of the base solve's penalty — right when
    # the blocker is feasibility or the entry dual is near-converged;
    # 'eps' = curvature-matched eps-scaled penalty — right when a
    # POSITIVE gap must be ground down (every delta-space curvature is
    # eps-scaled).  A pass that fails to improve switches regime instead
    # of giving up; two consecutive non-improving passes end the loop.
    mode = "base"
    pass_fails = 0
    for _ in range(int(max_passes)):
        score_entry = max(abs(cert.gap_rel), cert.feasibility_rel)
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
        curv = _curvature_scale(objective, np.asarray(cur.psi, np.float64))
        if rho0 is not None:
            rho = float(rho0)
        elif mode == "eps":
            # every feature of the delta problem carries eps-scaled
            # curvature — the objective's (U''_delta = eps * U'') by the
            # 1/eps value scaling that keeps duals on the original price
            # scale, and the trading-set boundaries' because the shifted
            # sets are the originals magnified by 1/eps.  An O(1)
            # penalty leaves the DUAL converging at ~eps*curv/rho per
            # iteration in those directions: measured, rho=0.5 ground a
            # +5e-6 gap at x0.87 per 250-iteration chunk while rho ~ eps
            # closed it in one chunk (linear: 1.86e-6 vs 1.46e-7 after
            # 1000 iterations; quadratic CustomUtility: 4e-6 -> 4e-8).
            rho = float(np.clip(eps * max(curv, 1.0), 1e-6, 4.0))
        else:
            # round-4-proven regime: right for feasibility repair and
            # for near-converged entry duals (measured floor ~1.5e-7
            # gap on the reference instances is BELOW the eps-regime's
            # small-instance floor there)
            rho = float(np.clip(np.asarray(cur.rho_final), 0.25, 4.0))
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
        psi0_pass = np.asarray(cur.psi, np.float64)
        prev_gate = None
        full_misses = 0
        for _c in range(int(chunks_per_pass)):
            dres = solver.solve_delta(
                dobj, bdict, nu0f, rho, chunk_iters, warm=dwarm,
                fused=fused, interpret=interpret,
            )
            # cheap SOLVE-SPACE gate: fetch only the small (n,)-leaves —
            # the trade planes stay on device.  Gap and dual bound are
            # unit-invariant under the fp-exact equilibration scales, so
            # the gate runs in solve space even when the accepting
            # certificate lives in cert_space.  phi/nonneg of a COMPOSED
            # point sit at the f64-composition floor (projection-exact
            # delta trades + one rounding) and are not gated on; the
            # full f64 certificate checks them at accept.  (Round 4 paid
            # a full trade-plane transfer + compose + f64 certificate on
            # EVERY chunk — tunnel-latency-bound, ~1.2 s/chunk at 100k.)
            small = jax.device_get(
                dict(
                    psi=dres.psi, prices=dres.prices, iters=dres.iters,
                    converged=dres.converged,
                )
            )
            total += int(small["iters"])
            done = (
                int(small["iters"]) < chunk_iters or bool(small["converged"])
            )
            psi_cand = psi0_pass + eps * np.asarray(small["psi"], np.float64)
            prices_solve = np.asarray(small["prices"], np.float64)
            if precise:
                prices_solve = rho * nu0f + prices_solve
            from .certify import dual_bound

            dualb = dual_bound(
                compiled, objective, prices_solve, evals=(8, 4)
            )
            if isinstance(objective, Objective):
                obj_cand = float(
                    np.asarray(objective.c, np.float64) @ psi_cand
                )
            else:
                obj_cand = float(objective.value(psi_cand))
            gap_est = (dualb - obj_cand) / max(
                1.0, abs(obj_cand), abs(dualb)
            )
            lo_o = np.asarray(objective.lo, np.float64)
            hi_o = np.asarray(objective.hi, np.float64)
            box_est = float(
                np.max(
                    np.maximum(lo_o - psi_cand, psi_cand - hi_o).clip(
                        min=0.0
                    ),
                    initial=0.0,
                )
            ) / max(1.0, float(np.max(np.abs(psi_cand), initial=0.0)))
            gate_score = max(abs(gap_est), box_est)
            # the gate reads the CONSENSUS psi, which lags the trades by
            # the primal residual — a composed candidate can certify a
            # fair bit below what the gate resolves mid-solve.  Fire the
            # full certificate with slack (5x target) and whenever the
            # gate estimate stops improving quickly (the candidate has
            # plateaued; certifying later chunks buys nothing).
            gate_hit = gate_score <= 5.0 * target_gap
            stalled = prev_gate is not None and gate_score > 0.7 * prev_gate
            prev_gate = gate_score
            _LOG.debug(
                "refine chunk gate: gap_est=%.2e box_est=%.2e done=%s",
                gap_est, box_est, done,
            )
            if not (
                gate_hit or done or stalled
                or _c == int(chunks_per_pass) - 1
            ):
                dwarm = dres  # chain chunks on device; no plane transfer
                continue
            dwarm = _to_host(dres)
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
                full_misses = 0
                cur, cert = cand, cand_cert
            else:
                full_misses += 1
            if _hit(cert):
                return RefineResult(
                    result=unscale_fn(cur), certificate=cert, iters=total,
                    achieved=True,
                )
            if done:
                break  # delta solve residual-converged; re-center
            if full_misses >= 2 and max(
                abs(cert.gap_rel), cert.feasibility_rel
            ) > 10.0 * target_gap:
                break  # two certified candidates in a row didn't beat a
                #        best that is still FAR from target — further
                #        chunks of this pass won't either (near-misses
                #        keep grinding: the last decade converges in
                #        small slow steps)
        if not improved:
            pass_fails += 1
            if pass_fails >= 2:
                break  # both penalty regimes stalled — done
            mode = "eps" if mode == "base" else "base"
        else:
            pass_fails = 0
            score_now = max(abs(cert.gap_rel), cert.feasibility_rel)
            if score_now > 0.5 * score_entry:
                # progress is slowing in this regime — the other one
                # attacks the orthogonal mode (dual vs primal)
                mode = "eps" if mode == "base" else "base"
    return RefineResult(
        result=unscale_fn(cur), certificate=cert, iters=total, achieved=False
    )
