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
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.utility import Objective
from ..solver.admm import AdmmOptions, AdmmSolver, RouteResult
from ..solver.compiler import CompiledProblem, ProblemSpec, compile_spec

__all__ = ["ShardedAdmmSolver"]


class ShardedAdmmSolver:
    """ADMM with pools partitioned across a device mesh.

    Compiles one SPMD program: each device owns m/D pools of every bucket,
    runs projections locally, and participates in two psums per iteration.
    Results (psi, prices, scalars) are replicated; per-pool trades stay
    sharded and are gathered only on `unbucket`.
    """

    def __init__(
        self,
        spec: ProblemSpec,
        mesh: Mesh,
        dtype=jnp.float32,
        options: AdmmOptions = AdmmOptions(),
        shard_assets: bool = False,
    ):
        self.mesh = mesh
        self.n_shards = mesh.shape["pools"]
        self.batch_axis = "batch" if "batch" in mesh.axis_names else None
        compiled = compile_spec(spec, pad_pools_to=self.n_shards)
        self.compiled = compiled
        consensus_prox = (
            self._make_asset_sharded_prox(compiled, jnp.dtype(dtype))
            if shard_assets
            else None
        )
        self.inner = AdmmSolver(
            compiled, dtype=dtype, options=options, axis_name="pools",
            consensus_prox=consensus_prox,
        )
        self.dtype = self.inner.dtype
        self.n = compiled.n_assets

        # slot-major (K, m): the pool axis is axis 1
        bucket_specs = {
            name: dict(
                R=P(None, "pools"), w=P(None, "pools"), s=P(None, "pools"),
                gamma=P("pools"), logk0=P("pools"), k0=P("pools"),
                mask=P(None, "pools"), asset=P(None, "pools"),
            )
            for name in compiled.buckets
        }
        out_specs = RouteResult(
            objective=P(), psi=P(), prices=P(),
            deltas={n: P(None, "pools") for n in compiled.buckets},
            lambdas={n: P(None, "pools") for n in compiled.buckets},
            iters=P(), r_norm=P(), s_norm=P(), converged=P(),
            rho_final=P(),
        )

        def _sharded_solve(buckets, c, lo, hi, rho):
            # each device's LOCAL bucket shards enter the solve as traced
            # arguments (no Python-side state swapping during trace)
            return self.inner._solve_impl(c, lo, hi, rho, buckets=buckets)

        self._solve_sharded = jax.jit(
            jax.shard_map(
                _sharded_solve,
                mesh=mesh,
                in_specs=(bucket_specs, P(), P(), P(), P()),
                out_specs=out_specs,
                check_vma=False,
            )
        )

        if self.batch_axis:
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
                deltas={n_: P("batch", None, "pools") for n_ in compiled.buckets},
                lambdas={n_: P("batch", None, "pools") for n_ in compiled.buckets},
                iters=P("batch"), r_norm=P("batch"), s_norm=P("batch"),
                converged=P("batch"), rho_final=P("batch"),
            )
            self._solve_sharded_batch = jax.jit(
                jax.shard_map(
                    _sharded_solve_batch,
                    mesh=mesh,
                    in_specs=(
                        bucket_specs, P("batch"), P("batch"), P("batch"), P(),
                    ),
                    out_specs=batch_out,
                    check_vma=False,
                )
            )

        # place bucket arrays according to their specs once
        self.buckets_device = jax.device_put(
            self.inner.buckets,
            {
                name: {
                    k: NamedSharding(mesh, spec)
                    for k, spec in bucket_specs[name].items()
                }
                for name in compiled.buckets
            },
        )

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

    def solve(self, objective: Objective, rho: Optional[float] = None) -> RouteResult:
        c = jnp.asarray(objective.c, self.dtype)
        lo = jnp.asarray(
            np.maximum(objective.lo, -np.finfo(np.float32).max / 4), self.dtype
        )
        hi = jnp.asarray(
            np.minimum(objective.hi, np.finfo(np.float32).max / 4), self.dtype
        )
        rho = jnp.asarray(
            rho if rho is not None else self.inner.options.rho, self.dtype
        )
        return self._solve_sharded(self.buckets_device, c, lo, hi, rho)

    def solve_batch(self, c, lo, hi, rho: Optional[float] = None) -> RouteResult:
        """Batched sharded solve: (B, n) objectives over the 2-D mesh.

        B must divide by the mesh's batch extent.  The reference's 50-point
        sweep (``two-asset.py:40``) runs as one such call with the grid
        sharded across devices."""
        if not self.batch_axis:
            raise ValueError("mesh has no 'batch' axis; use pool_batch_mesh")
        dt = self.dtype
        return self._solve_sharded_batch(
            self.buckets_device,
            jnp.asarray(c, dt),
            jnp.asarray(np.maximum(lo, -np.finfo(np.float32).max / 4), dt),
            jnp.asarray(np.minimum(hi, np.finfo(np.float32).max / 4), dt),
            jnp.asarray(rho if rho is not None else self.inner.options.rho, dt),
        )

    def unbucket(self, result: RouteResult):
        return self.inner.unbucket(result)
