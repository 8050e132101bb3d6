"""Pool-sharded ADMM: shard_map over a ('pools',) or ('batch','pools') mesh.

The reference stack is strictly serial (single-thread ECOS behind
``prob.solve()``, ``/root/reference/arbitrage.py:82``); this module is its
scale-out replacement.  Partitioning: every bucket's pool axis is split
across the ``pools`` mesh axis; problem data, z-state and projections stay
device-local; the ONLY cross-device traffic per ADMM iteration is

    psum of the (n+1)-vector scatter-add  +  psum of 4 residual scalars

which rides ICI within a slice and DCN across hosts (XLA picks the
collective implementation).  Scenario batches map to the outer ``batch``
axis, fully independent.

Both iteration paths shard: the classic XLA path (``AdmmSolver._iterate``)
and the fused Pallas path (``AdmmSolver._iterate_fused`` — one VMEM-fused
kernel launch per bucket per iteration on each device's local pool shard,
with the same per-iteration n-vector psum).  ``solve_fused`` and
``make_chunk_fn(fused=True)`` are the v5p-slice north-star configuration
(BASELINE.json): Pallas kernels + ICI collectives in one program.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.utility import ConcaveUtility, CustomUtility, Objective
from ..solver.admm import AdmmOptions, AdmmSolver, RouteResult
from ..solver.compiler import CompiledProblem, ProblemSpec, compile_spec

__all__ = ["ShardedAdmmSolver", "ShardedDeltaAdmmSolver"]


class ShardedAdmmSolver:
    """ADMM with pools partitioned across a device mesh.

    ``_inner_cls`` is the per-device solver class — the default
    :class:`AdmmSolver`, or :class:`DeltaAdmmSolver` in
    :class:`ShardedDeltaAdmmSolver` (multi-chip mixed-precision
    refinement).

    Compiles one SPMD program: each device owns m/D pools of every bucket,
    runs projections locally, and participates in two psums per iteration.
    Results (psi, prices, scalars) are replicated; per-pool trades stay
    sharded and are gathered only on `unbucket`.

    ``pad_pools_to`` defaults to the shard count (minimum padding).  The
    fused Pallas path additionally needs each device's LOCAL pool count to
    be a lane multiple: pass ``pad_pools_to=128 * n_shards`` (interpret /
    CPU tests) or ``1024 * n_shards`` (compiled tiles must be 8-sublane
    aligned — see ops/iteration_pallas.py).
    """

    _inner_cls = AdmmSolver

    def __init__(
        self,
        spec,
        mesh: Mesh,
        dtype=jnp.float32,
        options: AdmmOptions = AdmmOptions(),
        shard_assets: bool = False,
        pad_pools_to: Optional[int] = None,
    ):
        """``spec`` is a :class:`ProblemSpec` (compiled here with
        ``pad_pools_to``) or an already-:class:`CompiledProblem` whose
        bucket pool counts must divide the pool-mesh extent (the host
        refine path shares one compiled problem between a single-device
        TPU solver and a CPU-mesh sharded polish)."""
        self.mesh = mesh
        self.n_shards = mesh.shape["pools"]
        self.batch_axis = "batch" if "batch" in mesh.axis_names else None
        if isinstance(spec, CompiledProblem):
            compiled = spec
            for name, b in compiled.buckets.items():
                if b.m % self.n_shards != 0:
                    raise ValueError(
                        f"bucket {name!r}: {b.m} pools do not divide the "
                        f"pool-mesh extent {self.n_shards} — recompile with "
                        f"pad_pools_to={self.n_shards}"
                    )
        else:
            pad = self.n_shards if pad_pools_to is None else int(pad_pools_to)
            if pad % self.n_shards != 0:
                raise ValueError(
                    f"pad_pools_to={pad} must be a multiple of the pool-mesh "
                    f"extent {self.n_shards}"
                )
            compiled = compile_spec(spec, pad_pools_to=pad)
        self.compiled = compiled
        consensus_prox = (
            self._make_asset_sharded_prox(compiled, jnp.dtype(dtype))
            if shard_assets
            else None
        )
        self.inner = self._inner_cls(
            compiled, dtype=dtype, options=options, axis_name="pools",
            consensus_prox=consensus_prox,
        )
        self.dtype = self.inner.dtype
        self.n = compiled.n_assets

        # slot-major (K, m): the pool axis is axis 1
        self._bucket_specs = {
            name: dict(
                R=P(None, "pools"), w=P(None, "pools"), s=P(None, "pools"),
                gamma=P("pools"), logk0=P("pools"), k0=P("pools"),
                mask=P(None, "pools"), asset=P(None, "pools"),
            )
            for name in compiled.buckets
        }
        self._result_specs = RouteResult(
            objective=P(), psi=P(), prices=P(),
            deltas={n: P(None, "pools") for n in compiled.buckets},
            lambdas={n: P(None, "pools") for n in compiled.buckets},
            iters=P(), r_norm=P(), s_norm=P(), converged=P(),
            rho_final=P(),
        )
        self._z_specs = {
            name: (P(None, "pools"), P(None, "pools"))
            for name in compiled.buckets
        }
        self._progs = {}  # cache key -> jitted shard_map program

        # place bucket arrays according to their specs once
        self.buckets_device = jax.device_put(
            self.inner.buckets,
            {
                name: {
                    k: NamedSharding(mesh, spec)
                    for k, spec in self._bucket_specs[name].items()
                }
                for name in compiled.buckets
            },
        )

    # ---- program construction ----------------------------------------------

    def _shard(self, fn, in_specs, out_specs):
        return jax.jit(
            jax.shard_map(
                fn, mesh=self.mesh, in_specs=in_specs, out_specs=out_specs,
                check_vma=False,
            )
        )

    def _get_solve_prog(self, has_util: bool, has_warm: bool = False):
        key = ("solve", has_util, has_warm)
        prog = self._progs.get(key)
        if prog is None:
            base = (self._bucket_specs, P(), P(), P(), P(), P())

            if has_util and has_warm:
                def _sharded_solve(buckets, c, lo, hi, rho, mi, z0, nu0, util):
                    return self.inner._solve_impl(
                        c, lo, hi, rho, z0=z0, nu0=nu0, util=util,
                        buckets=buckets, max_iters=mi,
                    )

                in_specs = base + (self._z_specs, P(), P())
            elif has_util:
                def _sharded_solve(buckets, c, lo, hi, rho, mi, util):
                    return self.inner._solve_impl(
                        c, lo, hi, rho, util=util, buckets=buckets,
                        max_iters=mi,
                    )

                in_specs = base + (P(),)
            elif has_warm:
                def _sharded_solve(buckets, c, lo, hi, rho, mi, z0, nu0):
                    return self.inner._solve_impl(
                        c, lo, hi, rho, z0=z0, nu0=nu0, buckets=buckets,
                        max_iters=mi,
                    )

                in_specs = base + (self._z_specs, P())
            else:
                def _sharded_solve(buckets, c, lo, hi, rho, mi):
                    # each device's LOCAL bucket shards enter the solve as
                    # traced arguments (no Python-side state swapping)
                    return self.inner._solve_impl(
                        c, lo, hi, rho, buckets=buckets, max_iters=mi
                    )

                in_specs = base
            prog = self._shard(_sharded_solve, in_specs, self._result_specs)
            self._progs[key] = prog
        return prog

    def _get_batch_prog(self):
        key = ("batch",)
        prog = self._progs.get(key)
        if prog is None:
            # 2-D parallelism: scenario batch (outer, independent solves)
            # x pools (inner, psum-coupled).  Each device runs B/D_batch
            # vmapped solves over its m/D_pools pool shard.
            def _sharded_solve_batch(buckets, c, lo, hi, rho):
                return jax.vmap(
                    lambda cb, lob, hib: self.inner._solve_impl(
                        cb, lob, hib, rho, buckets=buckets
                    )
                )(c, lo, hi)

            batch_out = RouteResult(
                objective=P("batch"), psi=P("batch"), prices=P("batch"),
                deltas={n_: P("batch", None, "pools") for n_ in self.compiled.buckets},
                lambdas={n_: P("batch", None, "pools") for n_ in self.compiled.buckets},
                iters=P("batch"), r_norm=P("batch"), s_norm=P("batch"),
                converged=P("batch"), rho_final=P("batch"),
            )
            prog = self._shard(
                _sharded_solve_batch,
                (self._bucket_specs, P("batch"), P("batch"), P("batch"), P()),
                batch_out,
            )
            self._progs[key] = prog
        return prog

    def _check_fused_alignment(self, lanes: int = 128):
        for name, b in self.compiled.buckets.items():
            m_local = b.m // self.n_shards
            if m_local % lanes != 0:
                raise ValueError(
                    f"bucket {name!r}: {b.m} pools over {self.n_shards} "
                    f"shards leaves {m_local} per device; the fused kernel "
                    f"needs a multiple of {lanes} — construct the solver "
                    f"with pad_pools_to={lanes}*n_shards (or 1024*n_shards "
                    "for compiled tiles)"
                )

    def _get_fused_prog(self, n_iters: int, interpret: bool, has_util: bool):
        key = ("fused", n_iters, interpret, has_util)
        prog = self._progs.get(key)
        if prog is None:
            if has_util:
                def _fused(buckets, c, lo, hi, rho, util):
                    return self.inner._solve_fused_impl(
                        c, lo, hi, rho, n_iters=n_iters, util=util,
                        interpret=interpret, buckets=buckets,
                    )

                in_specs = (self._bucket_specs, P(), P(), P(), P(), P())
            else:
                def _fused(buckets, c, lo, hi, rho):
                    return self.inner._solve_fused_impl(
                        c, lo, hi, rho, n_iters=n_iters,
                        interpret=interpret, buckets=buckets,
                    )

                in_specs = (self._bucket_specs, P(), P(), P(), P())
            prog = self._shard(_fused, in_specs, self._result_specs)
            self._progs[key] = prog
        return prog

    def make_chunk_fn(self, chunk: int, fused: bool = False,
                      interpret: bool = False):
        """A jitted sharded chunk program with the ChunkedDriver contract:

            (z, nu, rho, c, lo, hi, util) ->
                (z, nu, r2, s2, w2, z2, u2, psi, obj)

        ``chunk`` iterations per dispatch (``fused=True``: chunk - 1 fused
        Pallas iterations + one classic residual-harvest iteration), pools
        sharded over the mesh.  ChunkedDriver uses this when handed a
        ShardedAdmmSolver.
        """
        if fused:
            self._check_fused_alignment()
        sol = self.inner
        scalar = P()
        nvec = P()

        def _chunk(buckets, z, nu, rho, c, lo, hi, util):
            if fused:
                s = {name: (zD, zL) for name, (zD, zL) in z.items()}
                wdef = jnp.zeros((sol.n,), sol.dtype)

                def body(i, st):
                    s, wdef, nu = st
                    s, wdef, nu, _, _ = sol._iterate_fused(
                        s, wdef, nu, rho, c, lo, hi, util=util,
                        interpret=interpret, buckets=buckets,
                    )
                    return (s, wdef, nu)

                s, wdef, nu = jax.lax.fori_loop(
                    0, chunk - 1, body, (s, wdef, nu)
                )
                z = sol.fused_to_z(s, wdef, buckets)
                z, nu, psi, w, stats = sol._iterate(
                    z, nu, rho, c, lo, hi, util, buckets
                )
                r2, s2 = stats["r2"], stats["s2"]
                w2, z2, u2 = stats["w_norm2"], stats["z_norm2"], stats["u_norm2"]
            else:
                def body(i, st):
                    z, nu, _, _, _, _, _, _ = st
                    z, nu, psi, w, stats = sol._iterate(
                        z, nu, rho, c, lo, hi, util, buckets
                    )
                    return (z, nu, stats["r2"], stats["s2"], stats["w_norm2"],
                            stats["z_norm2"], stats["u_norm2"], psi)

                zero = jnp.zeros((), sol.dtype)
                st = (z, nu, zero, zero, zero, zero, zero,
                      jnp.zeros((sol.n,), sol.dtype))
                z, nu, r2, s2, w2, z2, u2, psi = jax.lax.fori_loop(
                    0, chunk, body, st
                )
            if util is None:
                obj = jnp.sum(c * psi)
            else:
                from ..ops.prox import utility_value

                obj = utility_value(util, psi)
            return z, nu, r2, s2, w2, z2, u2, psi, obj

        def build(has_util):
            if has_util:
                fn = _chunk
                in_specs = (
                    self._bucket_specs, self._z_specs, nvec, scalar,
                    nvec, nvec, nvec, P(),
                )
            else:
                def fn(buckets, z, nu, rho, c, lo, hi):
                    return _chunk(buckets, z, nu, rho, c, lo, hi, None)

                in_specs = (
                    self._bucket_specs, self._z_specs, nvec, scalar,
                    nvec, nvec, nvec,
                )
            out_specs = (
                self._z_specs, nvec, scalar, scalar, scalar, scalar, scalar,
                nvec, scalar,
            )
            return self._shard(fn, in_specs, out_specs)

        progs = {}

        def chunk_fn(z, nu, rho, c, lo, hi, util=None):
            has_util = util is not None
            if has_util not in progs:
                progs[has_util] = build(has_util)
            args = (self.buckets_device, z, nu, rho, c, lo, hi)
            if has_util:
                args = args + (util,)
            return progs[has_util](*args)

        return chunk_fn

    def _make_asset_sharded_prox(self, compiled, dtype):
        """Asset-sharded consensus: reduce_scatter + block prox + all_gather.

        Replaces the replicated  psum(n-vector) -> prox(n)  with

            psum_scatter  ->  prox on this device's n/D asset block
                          ->  all_gather of (psi, mu)

        (SURVEY.md §5 "reduce_scatter when the asset universe n itself is
        sharded").  The prox/vector work per device drops from O(n) to
        O(n/D) — the scaling axis for asset universes beyond ~10^5 where
        the replicated n-vector arithmetic starts to rival the bucket
        work.  Numerically identical to the replicated path modulo psum
        reduction order (parity-tested in tests/test_sharding.py).
        Supports the linear-objective prox; ConcaveUtility objectives
        fall back to the replicated path inside AdmmSolver._iterate.
        """
        from ..ops.prox import psi_prox

        D = int(self.n_shards)
        n = compiled.n_assets
        blk = -(-n // D)
        n_pad = blk * D
        deg_p = np.zeros(n_pad)
        deg_p[:n] = compiled.degree
        deg_p = jnp.asarray(deg_p, dtype)  # padding slots: degree 0 => psi=0

        def rs_prox(y_local, nu, c, lo, hi, rho):
            pad = n_pad - n
            y_p = jnp.concatenate([y_local, jnp.zeros((pad,), y_local.dtype)])
            y_blk = jax.lax.psum_scatter(
                y_p, "pools", scatter_dimension=0, tiled=True
            )  # (blk,) summed over devices
            i = jax.lax.axis_index("pools")
            off = i * blk

            def slc(v, fill):
                v_p = jnp.concatenate(
                    [v, jnp.full((pad,), fill, v.dtype)]
                )
                return jax.lax.dynamic_slice(v_p, (off,), (blk,))

            deg_b = jax.lax.dynamic_slice(deg_p, (off,), (blk,))
            s_b = y_blk - 2.0 * deg_b * slc(nu, 0.0)
            psi_b, mu_b = psi_prox(
                s_b, deg_b, slc(c, 0.0), slc(lo, 0.0), slc(hi, 0.0), rho
            )
            psi = jax.lax.all_gather(psi_b, "pools", tiled=True)[:n]
            mu = jax.lax.all_gather(mu_b, "pools", tiled=True)[:n]
            return psi, mu

        return rs_prox

    # ---- objective packing ---------------------------------------------------

    def _pack(self, objective):
        """(c, lo, hi, util) device arrays for a linear Objective or a
        separable ConcaveUtility (CustomUtility has its own path in
        :meth:`solve` — its strongly-convex FISTA prox runs REPLICATED
        per device after the consensus psum, O(n) work that shards
        nothing but blocks nothing either)."""
        util = None
        if isinstance(objective, ConcaveUtility):
            util = objective.pack(self.dtype)
            c, lo, hi = util.c, util.lo, util.hi
        else:
            c = jnp.asarray(objective.c, self.dtype)
            lo = jnp.asarray(
                np.maximum(objective.lo, -np.finfo(np.float32).max / 4),
                self.dtype,
            )
            hi = jnp.asarray(
                np.minimum(objective.hi, np.finfo(np.float32).max / 4),
                self.dtype,
            )
        return c, lo, hi, util

    # ---- public solves -------------------------------------------------------

    def _get_custom_prog(self, custom, has_warm: bool):
        """Sharded solve program for a non-separable CustomUtility: the
        utility's fn/prox_iters are trace-time constants, so one program
        per CustomUtility instance (mirrors AdmmSolver._custom_cache).
        The FISTA consensus prox runs replicated per device on the
        psum'd n-vector — the bucket-side work shards exactly as for
        linear objectives (cvxpy-parity axis: the reference accepts any
        DCP-concave objective behind ``arbitrage.py:57``)."""
        key = ("custom", id(custom), has_warm)
        prog = self._progs.get(key)
        if prog is None:
            base = (self._bucket_specs, P(), P(), P(), P(), P())
            if has_warm:
                def _sharded_solve(buckets, c, lo, hi, rho, mi, z0, nu0):
                    return self.inner._solve_impl(
                        c, lo, hi, rho, z0=z0, nu0=nu0, buckets=buckets,
                        custom=custom, max_iters=mi,
                    )

                in_specs = base + (self._z_specs, P())
            else:
                def _sharded_solve(buckets, c, lo, hi, rho, mi):
                    return self.inner._solve_impl(
                        c, lo, hi, rho, buckets=buckets, custom=custom,
                        max_iters=mi,
                    )

                in_specs = base
            prog = self._shard(_sharded_solve, in_specs, self._result_specs)
            self._progs[key] = prog
        return prog

    def solve(
        self,
        objective,
        rho: Optional[float] = None,
        warm: Optional[RouteResult] = None,
        max_iters: Optional[int] = None,
    ) -> RouteResult:
        """Sharded solve for a linear :class:`Objective`, a separable
        :class:`ConcaveUtility`, or a non-separable
        :class:`CustomUtility` (same surface as ``AdmmSolver.solve``).
        ``warm`` seeds (z0, nu0) from a prior solve; ``max_iters`` is a
        traced per-call budget."""
        if isinstance(objective, CustomUtility):
            dt = self.dtype
            c = jnp.zeros((self.n,), dt)
            lo = jnp.asarray(
                np.maximum(objective.lo, -np.finfo(np.float32).max / 4), dt
            )
            hi = jnp.asarray(
                np.minimum(objective.hi, np.finfo(np.float32).max / 4), dt
            )
            if rho is not None:
                rho_f = rho
            elif warm is not None:
                rho_f = float(np.asarray(warm.rho_final))
            else:
                rho_f = self.inner.options.rho
            mi = jnp.asarray(
                self.inner.options.max_iters if max_iters is None else max_iters,
                jnp.int32,
            )
            prog = self._get_custom_prog(objective, warm is not None)
            args = (
                self.buckets_device, c, lo, hi,
                jnp.asarray(rho_f, self.dtype), mi,
            )
            if warm is not None:
                z0, nu0 = self.inner.warm_state(warm, rho_f)
                args = args + (z0, nu0)
            return prog(*args)
        c, lo, hi, util = self._pack(objective)
        if rho is not None:
            rho_f = rho
        elif warm is not None:
            rho_f = float(np.asarray(warm.rho_final))
        else:
            rho_f = self.inner.options.rho
        rho_v = jnp.asarray(rho_f, self.dtype)
        mi = jnp.asarray(
            self.inner.options.max_iters if max_iters is None else max_iters,
            jnp.int32,
        )
        prog = self._get_solve_prog(util is not None, warm is not None)
        args = (self.buckets_device, c, lo, hi, rho_v, mi)
        if warm is not None:
            z0, nu0 = self.inner.warm_state(warm, rho_f)
            args = args + (z0, nu0)
        if util is not None:
            args = args + (util,)
        return prog(*args)

    def solve_fused(
        self,
        objective,
        iters: int,
        rho: Optional[float] = None,
        interpret: bool = False,
    ) -> RouteResult:
        """Fixed-iteration fused-Pallas solve, pools sharded over the mesh.

        The north-star configuration: each device runs the VMEM-fused
        iteration kernel on its local pool shard; one n-vector psum per
        iteration completes the consensus over ICI.  Per-device pool
        counts must be lane-aligned (see class docstring).
        """
        self._check_fused_alignment()
        c, lo, hi, util = self._pack(objective)
        rho_v = jnp.asarray(
            rho if rho is not None else self.inner.options.rho, self.dtype
        )
        prog = self._get_fused_prog(int(iters), bool(interpret), util is not None)
        if util is None:
            return prog(self.buckets_device, c, lo, hi, rho_v)
        return prog(self.buckets_device, c, lo, hi, rho_v, util)

    def solve_batch(self, c, lo, hi, rho: Optional[float] = None) -> RouteResult:
        """Batched sharded solve: (B, n) objectives over the 2-D mesh.

        B must divide by the mesh's batch extent.  The reference's 50-point
        sweep (``two-asset.py:40``) runs as one such call with the grid
        sharded across devices."""
        if not self.batch_axis:
            raise ValueError("mesh has no 'batch' axis; use pool_batch_mesh")
        dt = self.dtype
        return self._get_batch_prog()(
            self.buckets_device,
            jnp.asarray(c, dt),
            jnp.asarray(np.maximum(lo, -np.finfo(np.float32).max / 4), dt),
            jnp.asarray(np.minimum(hi, np.finfo(np.float32).max / 4), dt),
            jnp.asarray(rho if rho is not None else self.inner.options.rho, dt),
        )

    def solve_batch_reserves(
        self, objective, reserve_scale, rho: Optional[float] = None
    ) -> RouteResult:
        """B per-pool reserve scenarios over the 2-D ('batch','pools')
        mesh — the sharded form of ``AdmmSolver.solve_batch_reserves``
        (BASELINE config 5; the state-sweep generalization of the
        reference loop at ``two-asset.py:40-91``).

        Each device runs B/D_batch vmapped solves over its m/D_pools
        pool shard; only the reserve-derived leaves (R, k0, logk0) carry
        the batch axis, topology is replicated along it.  B must divide
        the mesh's batch extent.
        """
        if not self.batch_axis:
            raise ValueError("mesh has no 'batch' axis; use pool_batch_mesh")
        c, lo, hi, util = self._pack(objective)
        rho_v = jnp.asarray(
            rho if rho is not None else self.inner.options.rho, self.dtype
        )
        bks, axes = self.inner.batch_reserve_arrays(reserve_scale)
        bspecs = {
            name: {
                k: (
                    P("batch", None, "pools") if k == "R"
                    else P("batch", "pools") if k in ("k0", "logk0")
                    else self._bucket_specs[name][k]
                )
                for k in bks[name]
            }
            for name in bks
        }
        key = ("batch_reserves", util is not None)
        prog = self._progs.get(key)
        if prog is None:
            def _prog(buckets, c_, lo_, hi_, rho_, *u):
                ut = u[0] if u else None
                return jax.vmap(
                    lambda b2: self.inner._solve_impl(
                        c_, lo_, hi_, rho_, util=ut, buckets=b2
                    ),
                    in_axes=(axes,),
                )(buckets)

            batch_out = RouteResult(
                objective=P("batch"), psi=P("batch"), prices=P("batch"),
                deltas={
                    n_: P("batch", None, "pools") for n_ in self.compiled.buckets
                },
                lambdas={
                    n_: P("batch", None, "pools") for n_ in self.compiled.buckets
                },
                iters=P("batch"), r_norm=P("batch"), s_norm=P("batch"),
                converged=P("batch"), rho_final=P("batch"),
            )
            in_specs = (bspecs, P(), P(), P(), P())
            if util is not None:
                in_specs = in_specs + (P(),)
            prog = self._shard(_prog, in_specs, batch_out)
            self._progs[key] = prog
        args = (bks, c, lo, hi, rho_v)
        if util is not None:
            args = args + (util,)
        return prog(*args)

    def unbucket(self, result: RouteResult):
        return self.inner.unbucket(result)


class ShardedDeltaAdmmSolver(ShardedAdmmSolver):
    """Pool-sharded correction solves: multi-chip mixed-precision
    refinement.

    Duck-types :class:`~cfmm_routing_tpu.solver.refine_device.DeltaAdmmSolver`'s
    ``delta_buckets`` / ``solve_delta`` surface, so
    :func:`~cfmm_routing_tpu.solver.refine_device.refine_device` runs its
    correction solves across the pools mesh unchanged —
    ``refine_device(..., solver=ShardedDeltaAdmmSolver(spec, mesh, ...))``.
    Each device projects its local pool shard onto the SHIFTED trading
    sets (``ops/projection_delta.py``); the delta-dual consensus is the
    usual one n-vector psum per iteration.  Configure options like the
    single-device delta solver (eps ~1e-8, adapt_rho=False).
    """

    @property
    def _inner_cls(self):
        from ..solver.refine_device import DeltaAdmmSolver

        return DeltaAdmmSolver

    def delta_buckets(self, base: RouteResult, eps: float, nu0=None):
        """Host-side delta arrays (globally shaped; jit + shard_map place
        the shards).  Same contract as DeltaAdmmSolver.delta_buckets."""
        return self.inner.delta_buckets(base, eps, nu0=nu0)

    def _delta_specs(self, bdict):
        per_pool = P("pools")
        per_plane = P(None, "pools")
        return {
            name: {
                k: (per_pool if getattr(arr, "ndim", 2) == 1 else per_plane)
                for k, arr in b.items()
            }
            for name, b in bdict.items()
        }

    def solve_delta(
        self,
        objective,
        bdict,
        nu0,
        rho: float,
        max_iters: int,
        warm: Optional[RouteResult] = None,
        fused: bool = False,
        interpret: bool = False,
    ) -> RouteResult:
        """One sharded correction solve (same semantics as
        DeltaAdmmSolver.solve_delta: objectives covered by the precise
        re-centered path — linear AND separable utilities without power
        atoms — run the delta-dual iteration with dnu state; the prep is
        literally shared with the single-device solver so the refinement
        driver's price reconstruction stays consistent).

        ``fused=True``: each device runs the fused-Pallas delta kernel on
        its local pool shard (``DeltaAdmmSolver._iterate_fused`` under
        shard_map) — the refinement stage at the base solve's sharded
        throughput; per-device pool counts must be lane-aligned."""
        from ..ops.prox import DeltaCustomUtility
        from ..solver.refine_device import _prep_delta_solve

        c, lo, hi, util, start_nu = _prep_delta_solve(
            objective, nu0, rho, self.dtype
        )
        if isinstance(util, DeltaCustomUtility):
            return self._solve_delta_custom(
                bdict, c, lo, hi, util, start_nu, rho, int(max_iters), warm
            )
        if fused:
            return self._solve_delta_fused(
                bdict, c, lo, hi, util, start_nu, rho, int(max_iters),
                warm, bool(interpret),
            )
        has_nu0e = any("nu0e" in b for b in bdict.values())
        key = ("delta", util is not None, warm is not None, has_nu0e)
        prog = self._progs.get(key)
        if prog is None:
            specs = self._delta_specs(bdict)
            base = (specs, P(), P(), P(), P(), P())
            if util is not None and warm is not None:
                def _s(buckets, c_, lo_, hi_, rho_, mi, z0, nu0_, util_):
                    return self.inner._solve_impl(
                        c_, lo_, hi_, rho_, z0=z0, nu0=nu0_, util=util_,
                        buckets=buckets, max_iters=mi,
                    )

                in_specs = base + (self._z_specs, P(), P())
            elif util is not None:
                def _s(buckets, c_, lo_, hi_, rho_, mi, nu0_, util_):
                    return self.inner._solve_impl(
                        c_, lo_, hi_, rho_, nu0=nu0_, util=util_,
                        buckets=buckets, max_iters=mi,
                    )

                in_specs = base + (P(), P())
            elif warm is not None:
                def _s(buckets, c_, lo_, hi_, rho_, mi, z0, nu0_):
                    return self.inner._solve_impl(
                        c_, lo_, hi_, rho_, z0=z0, nu0=nu0_,
                        buckets=buckets, max_iters=mi,
                    )

                in_specs = base + (self._z_specs, P())
            else:
                def _s(buckets, c_, lo_, hi_, rho_, mi, nu0_):
                    return self.inner._solve_impl(
                        c_, lo_, hi_, rho_, nu0=nu0_, buckets=buckets,
                        max_iters=mi,
                    )

                in_specs = base + (P(),)
            prog = self._shard(_s, in_specs, self._result_specs)
            self._progs[key] = prog
        mi = jnp.asarray(int(max_iters), jnp.int32)
        args = (bdict, c, lo, hi, jnp.asarray(rho, self.dtype), mi)
        if warm is not None:
            z0, nu0_arr = self.inner.warm_state(warm, rho)
            args = args + (z0, nu0_arr)
        else:
            args = args + (jnp.asarray(start_nu, self.dtype),)
        if util is not None:
            args = args + (util,)
        out = prog(*args)
        return self._gather_if_multiprocess(out)

    @staticmethod
    def _gather_if_multiprocess(out: RouteResult) -> RouteResult:
        if jax.process_count() > 1:
            # the refinement driver composes/certifies on HOST from the
            # GLOBAL trades; pool-sharded leaves span non-addressable
            # devices in a multi-process mesh, so gather them here (the
            # per-pass correction arrays are host-built global anyway)
            from jax.experimental import multihost_utils

            out = jax.tree_util.tree_map(
                lambda x: multihost_utils.process_allgather(x, tiled=True),
                out,
            )
        return out

    def _solve_delta_custom(
        self, bdict, c, lo, hi, dc, start_nu, rho, max_iters: int, warm
    ) -> RouteResult:
        """Sharded re-centered CustomUtility correction solve: the
        DeltaCustomUtility pytree rides a traced argument (its FISTA
        prox runs replicated per device after the consensus psum, like
        the classic sharded CustomUtility path)."""
        key = ("delta_custom", warm is not None)
        prog = self._progs.get(key)
        if prog is None:
            specs = self._delta_specs(bdict)
            base = (specs, P(), P(), P(), P(), P())
            if warm is not None:
                def _s(buckets, c_, lo_, hi_, rho_, mi, z0, nu0_, dc_):
                    return self.inner._solve_impl(
                        c_, lo_, hi_, rho_, z0=z0, nu0=nu0_, custom=dc_,
                        buckets=buckets, max_iters=mi,
                    )

                in_specs = base + (self._z_specs, P(), P())
            else:
                def _s(buckets, c_, lo_, hi_, rho_, mi, nu0_, dc_):
                    return self.inner._solve_impl(
                        c_, lo_, hi_, rho_, nu0=nu0_, custom=dc_,
                        buckets=buckets, max_iters=mi,
                    )

                in_specs = base + (P(), P())
            prog = self._shard(_s, in_specs, self._result_specs)
            self._progs[key] = prog
        mi = jnp.asarray(int(max_iters), jnp.int32)
        args = (bdict, c, lo, hi, jnp.asarray(rho, self.dtype), mi)
        if warm is not None:
            z0, nu0_arr = self.inner.warm_state(warm, rho)
            args = args + (z0, nu0_arr)
        else:
            args = args + (jnp.asarray(start_nu, self.dtype),)
        args = args + (dc,)
        return self._gather_if_multiprocess(prog(*args))

    def _solve_delta_fused(
        self, bdict, c, lo, hi, util, start_nu, rho, n_iters: int,
        warm, interpret: bool,
    ) -> RouteResult:
        """Sharded fused-Pallas correction solve: n_iters fused delta
        iterations on each device's local shard + one classic harvest
        iteration (``DeltaAdmmSolver._solve_fused_impl`` under
        shard_map)."""
        self._check_fused_alignment()
        has_nu0e = any("nu0e" in b for b in bdict.values())
        key = (
            "delta_fused", util is not None, warm is not None, has_nu0e,
            n_iters, interpret,
        )
        prog = self._progs.get(key)
        if prog is None:
            specs = self._delta_specs(bdict)
            base = (specs, P(), P(), P(), P())

            if util is not None and warm is not None:
                def _s(buckets, c_, lo_, hi_, rho_, z0, nu0_, util_):
                    return self.inner._solve_fused_impl(
                        c_, lo_, hi_, rho_, n_iters=n_iters, util=util_,
                        interpret=interpret, buckets=buckets, z0=z0,
                        nu0=nu0_,
                    )

                in_specs = base + (self._z_specs, P(), P())
            elif util is not None:
                def _s(buckets, c_, lo_, hi_, rho_, nu0_, util_):
                    return self.inner._solve_fused_impl(
                        c_, lo_, hi_, rho_, n_iters=n_iters, util=util_,
                        interpret=interpret, buckets=buckets, nu0=nu0_,
                    )

                in_specs = base + (P(), P())
            elif warm is not None:
                def _s(buckets, c_, lo_, hi_, rho_, z0, nu0_):
                    return self.inner._solve_fused_impl(
                        c_, lo_, hi_, rho_, n_iters=n_iters,
                        interpret=interpret, buckets=buckets, z0=z0,
                        nu0=nu0_,
                    )

                in_specs = base + (self._z_specs, P())
            else:
                def _s(buckets, c_, lo_, hi_, rho_, nu0_):
                    return self.inner._solve_fused_impl(
                        c_, lo_, hi_, rho_, n_iters=n_iters,
                        interpret=interpret, buckets=buckets, nu0=nu0_,
                    )

                in_specs = base + (P(),)
            prog = self._shard(_s, in_specs, self._result_specs)
            self._progs[key] = prog
        args = (bdict, c, lo, hi, jnp.asarray(rho, self.dtype))
        if warm is not None:
            z0, nu0_arr = self.inner.warm_state(warm, rho)
            args = args + (z0, nu0_arr)
        else:
            args = args + (jnp.asarray(start_nu, self.dtype),)
        if util is not None:
            args = args + (util,)
        return self._gather_if_multiprocess(prog(*args))
