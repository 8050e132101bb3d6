"""Chunked solve driver: observability + checkpoint/resume for long solves.

The reference has no tracing, no metrics, no checkpointing (SURVEY.md §5 —
``prob.solve()`` is an opaque call).  For production 100k-pool runs this
driver executes the ADMM in fixed-size device chunks (K iterations per
dispatch, no host round-trip inside a chunk) and, between chunks, on host:

  * appends a structured residual record (iteration, primal/dual residual,
    tolerances, rho, objective) — the per-phase iteration log promised in
    SURVEY.md §5 "Metrics";
  * optionally invokes a user callback (live monitoring);
  * optionally checkpoints solver state (orbax if available, .npz
    fallback) so a preempted run resumes exactly where it stopped;
  * stops on convergence, divergence (NaN), or the iteration budget.

The chunk body is one jit-compiled program reused across chunks and across
solves on the same problem structure.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.utility import Objective
from .admm import AdmmSolver, RouteResult

__all__ = ["ChunkRecord", "ChunkedDriver", "SolveLog"]


@dataclasses.dataclass
class ChunkRecord:
    """One structured log record per chunk (SURVEY.md §5 metrics)."""

    iteration: int
    r_norm: float
    s_norm: float
    eps_pri: float
    eps_dua: float
    rho: float
    objective: float

    def as_dict(self) -> Dict[str, float]:
        return dataclasses.asdict(self)


class SolveLog:
    """Append-only residual history with CSV export.

    ``status`` after a solve is one of 'converged' | 'max_iters' |
    'stalled' | 'diverged' | 'infeasible' (SURVEY.md §5 — the reference's
    prob.solve() surfaces cvxpy's INFEASIBLE status behind
    ``liquidation.py:85``; production runs need the full distinction).
    When status is 'infeasible', ``infeasibility`` holds the rigorous
    separating-price certificate (solver/certify.py)."""

    def __init__(self):
        self.records: List[ChunkRecord] = []
        self.status: str = "pending"
        self.infeasibility = None  # InfeasibilityCertificate when proven

    def append(self, rec: ChunkRecord) -> None:
        self.records.append(rec)

    def to_csv(self, path: str) -> None:
        import csv

        with open(path, "w", newline="") as f:
            w = csv.DictWriter(
                f,
                fieldnames=[
                    "iteration", "r_norm", "s_norm", "eps_pri", "eps_dua",
                    "rho", "objective",
                ],
            )
            w.writeheader()
            for r in self.records:
                w.writerow(r.as_dict())

    def __len__(self):
        return len(self.records)


def _save_state(path: str, state) -> None:
    flat, treedef = jax.tree_util.tree_flatten(state)
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(os.path.abspath(path), [np.asarray(x) for x in flat], force=True)
    except Exception:
        np.savez(path + ".npz", *[np.asarray(x) for x in flat])


def _load_state(path: str, like):
    flat_like, treedef = jax.tree_util.tree_flatten(like)
    if os.path.exists(path + ".npz"):
        data = np.load(path + ".npz")
        flat = [data[k] for k in data.files]
    else:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        flat = ckptr.restore(os.path.abspath(path))
    return jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(x, l.dtype) for x, l in zip(flat, flat_like)]
    )


class ChunkedDriver:
    """Host-side orchestration around an :class:`AdmmSolver`.

    ``fused=True`` runs each chunk's first ``chunk - 1`` iterations on the
    fused Pallas path (``AdmmSolver._iterate_fused``; ~2.5x throughput at
    100k pools) and harvests residuals with one classic iteration per
    chunk; requires lane-aligned pool counts (``pad_pools_to=128``/1024).
    ``interpret=True`` runs the fused kernels in Pallas interpret mode
    (CPU tests) — it must be passed explicitly, a global
    ``force_tpu_interpret_mode()`` context is not detected.
    """

    def __init__(self, solver, chunk: int = 200,
                 fused: bool = False, interpret: bool = False):
        from ..parallel.sharded import ShardedAdmmSolver

        self.chunk = int(chunk)
        self.fused = bool(fused)
        self.interpret = bool(interpret)
        if isinstance(solver, ShardedAdmmSolver):
            # sharded chunks: the same driver loop around an SPMD chunk
            # program (pools sharded, fused or classic; alignment is
            # validated per-device inside make_chunk_fn)
            self.sharded = solver
            self.solver = solver.inner
            self._chunk_jit = solver.make_chunk_fn(
                self.chunk, fused=self.fused, interpret=self.interpret
            )
            return
        self.sharded = None
        self.solver = solver
        if self.fused:
            for name, arrs in solver.buckets.items():
                if arrs["mask"].shape[1] % 128 != 0:
                    raise ValueError(
                        f"bucket {name!r}: fused chunks need pool counts "
                        "that are multiples of 128 (pad_pools_to=128/1024)"
                    )
        self._chunk_jit = jax.jit(
            self._run_chunk_fused if self.fused else self._run_chunk
        )

    # one device dispatch = `chunk` ADMM iterations + residual summary
    def _run_chunk(self, z, nu, rho, c, lo, hi, util=None):
        sol = self.solver

        def body(i, st):
            z, nu, rho, _, _, _, _, _, _ = st
            z, nu, psi, w, stats = sol._iterate(z, nu, rho, c, lo, hi, util)
            return (z, nu, rho, stats["r2"], stats["s2"], stats["w_norm2"],
                    stats["z_norm2"], stats["u_norm2"], psi)

        zero = jnp.zeros((), sol.dtype)
        st = (z, nu, rho, zero, zero, zero, zero, zero,
              jnp.zeros((sol.n,), sol.dtype))
        z, nu, rho, r2, s2, w2, z2, u2, psi = jax.lax.fori_loop(
            0, self.chunk, body, st
        )
        obj = self._objective(c, psi, util)
        return z, nu, r2, s2, w2, z2, u2, psi, obj

    def _run_chunk_fused(self, z, nu, rho, c, lo, hi, util=None):
        sol = self.solver
        # re-seed the fused state at the chunk boundary: z = s + 0_e
        s = {name: (zD, zL) for name, (zD, zL) in z.items()}
        wdef = jnp.zeros((sol.n,), sol.dtype)

        def body(i, st):
            s, wdef, nu = st
            s, wdef, nu, _, _ = sol._iterate_fused(
                s, wdef, nu, rho, c, lo, hi, util=util,
                interpret=self.interpret,
            )
            return (s, wdef, nu)

        s, wdef, nu = jax.lax.fori_loop(0, self.chunk - 1, body, (s, wdef, nu))
        z = sol.fused_to_z(s, wdef)
        z, nu, psi, w, stats = sol._iterate(z, nu, rho, c, lo, hi, util)
        obj = self._objective(c, psi, util)
        return (z, nu, stats["r2"], stats["s2"], stats["w_norm2"],
                stats["z_norm2"], stats["u_norm2"], psi, obj)

    def _objective(self, c, psi, util):
        if util is None:
            return jnp.sum(c * psi)
        from ..ops.prox import utility_value

        return utility_value(util, psi)

    def solve(
        self,
        objective: Objective,
        max_iters: int = 20000,
        rho: Optional[float] = None,
        log: Optional[SolveLog] = None,
        callback: Optional[Callable[[ChunkRecord], None]] = None,
        checkpoint_path: Optional[str] = None,
        checkpoint_every: int = 1,
        resume: bool = False,
    ):
        """Run until convergence / budget.  Returns (RouteResult, SolveLog).

        ``objective`` may be a linear :class:`Objective` or a
        :class:`~cfmm_routing_tpu.models.utility.ConcaveUtility`."""
        from ..models.utility import ConcaveUtility

        sol = self.solver
        opts = sol.options
        dtype = sol.dtype
        util = None
        if isinstance(objective, ConcaveUtility):
            util = objective.pack(dtype)
            c, lo, hi = util.c, util.lo, util.hi
        else:
            c = jnp.asarray(objective.c, dtype)
            lo = jnp.asarray(
                np.maximum(objective.lo, -np.finfo(np.float32).max / 4), dtype
            )
            hi = jnp.asarray(
                np.minimum(objective.hi, np.finfo(np.float32).max / 4), dtype
            )

        z = {
            name: (
                jnp.zeros(arrs["mask"].shape, dtype),
                jnp.zeros(arrs["mask"].shape, dtype),
            )
            for name, arrs in sol.buckets.items()
        }
        nu = jnp.zeros((sol.n,), dtype)
        rho_v = jnp.asarray(rho if rho is not None else opts.rho, dtype)
        it0 = 0
        if resume and checkpoint_path is not None:
            state = _load_state(checkpoint_path, (z, nu, rho_v, jnp.zeros((), jnp.int32)))
            z, nu, rho_v, it_arr = state
            it0 = int(it_arr)

        n_edges = sum(
            2 * int(np.prod(b["mask"].shape)) for b in sol.buckets.values()
        )
        sqn = float(np.sqrt(n_edges))
        log = log if log is not None else SolveLog()

        it = it0
        converged = False
        status = "max_iters"
        r = s = eps_pri = eps_dua = float("nan")
        psi = jnp.zeros((sol.n,), dtype)
        obj = jnp.zeros((), dtype)
        best_score = float("inf")
        best_chunk = 0
        best_state = None  # (z, nu, rho, psi, obj, r, s) at the best score
        stall_chunks = 12  # no 30% residual progress in this many chunks
        last_good_prices = None  # last finite dual, for the infeasibility cert
        while it < max_iters:
            z, nu, r2, s2, w2, z2, u2, psi, obj = self._chunk_jit(
                z, nu, rho_v, c, lo, hi, util
            )
            it += self.chunk
            # _iterate returns s2 and u2 already multiplied by rho^2
            # (admm.py stats) — do NOT scale by rho again here
            r = float(jnp.sqrt(r2))
            s = float(jnp.sqrt(s2))
            eps_pri = opts.eps_abs * sqn + opts.eps_rel * float(
                np.sqrt(max(float(w2), float(z2)))
            )
            eps_dua = opts.eps_abs * sqn + opts.eps_rel * float(
                np.sqrt(float(u2))
            )
            rec = ChunkRecord(
                iteration=it, r_norm=r, s_norm=s, eps_pri=eps_pri,
                eps_dua=eps_dua, rho=float(rho_v), objective=float(obj),
            )
            log.append(rec)
            if callback is not None:
                callback(rec)
            if checkpoint_path is not None and (len(log) % checkpoint_every == 0):
                _save_state(
                    checkpoint_path,
                    (z, nu, rho_v, jnp.asarray(it, jnp.int32)),
                )
            if not np.isfinite(r):
                status = "diverged"
                break
            last_good_prices = np.asarray(rho_v * nu, np.float64)
            if r <= eps_pri and s <= eps_dua:
                converged = True
                status = "converged"
                break
            # stall detection (SURVEY.md §5 failure detection): an f32 run
            # asked for f64-grade tolerances will cycle at its noise floor
            # forever — stop and report instead of burning the budget.
            score = max(r / max(eps_pri, 1e-300), s / max(eps_dua, 1e-300))
            if best_state is None or score < best_state[0]:
                best_state = (score, z, nu, rho_v, psi, obj, r, s)
            if score < 0.7 * best_score:
                best_score = score
                best_chunk = len(log)
            elif len(log) - best_chunk >= stall_chunks:
                status = "stalled"
                break
            # residual-balancing rho adaptation between chunks (host-side
            # twin of the in-loop rule in admm._solve_impl)
            if opts.adapt_rho:
                if r > opts.adapt_ratio * s:
                    rho_v = rho_v * opts.adapt_factor
                    nu = nu / opts.adapt_factor
                elif s > opts.adapt_ratio * r:
                    rho_v = rho_v / opts.adapt_factor
                    nu = nu * opts.adapt_factor

        # a stalled run cycles at its dtype noise floor; the LAST iterate is
        # then an arbitrary point of the cycle — return the best-residual
        # iterate seen instead (an f32 run asked for f64-grade tolerances
        # reports its true f32-accurate answer this way)
        if status == "stalled" and best_state is not None:
            _, z, nu, rho_v, psi, obj, r, s = best_state

        # a non-converging run may be a genuinely infeasible program: the
        # ADMM dual then grows along a separating direction — try to turn
        # the last finite dual into a rigorous infeasibility certificate
        # (reference behavior: cvxpy INFEASIBLE at ``liquidation.py:85``)
        if not converged and last_good_prices is not None:
            from .certify import certify_infeasible

            cert = certify_infeasible(
                sol.compiled, objective, last_good_prices
            )
            if cert.infeasible:
                status = "infeasible"
                log.infeasibility = cert

        # final projection pass for exactly-feasible primal variables
        w_out = {}
        for name, arrs in sol.buckets.items():
            nu_e = sol._bcast_nu(nu, name)
            zD, zL = z[name]
            D, L = sol._project(name, arrs, zD - nu_e, zL + nu_e)
            w_out[name] = (D, L)

        result = RouteResult(
            objective=obj,
            psi=psi,
            prices=rho_v * nu,
            deltas={name: w_out[name][0] for name in sol.buckets},
            lambdas={name: w_out[name][1] for name in sol.buckets},
            iters=jnp.asarray(it, jnp.int32),
            r_norm=jnp.asarray(r, dtype),
            s_norm=jnp.asarray(s, dtype),
            converged=jnp.asarray(converged),
            rho_final=rho_v,
        )
        log.status = status
        return result, log
