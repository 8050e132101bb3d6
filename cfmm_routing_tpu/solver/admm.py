"""Consensus-ADMM driver: the jit-compiled solver core.

Replaces the reference's cvxpy canonicalization + ECOS interior-point solve
(``/root/reference/arbitrage.py:81-82``) with an operator-splitting method
whose per-iteration work is exactly: one batched trading-set projection per
bucket (``ops/projection.py``), one scatter-add over edges, and O(n) vector
arithmetic — no factorizations, no sparse matrices, no host round-trips.

Derivation (all steps exact):

Split variables: per pool  w_i = (D_i, L_i)  with  F(w) = sum_i I_{T_i}(w_i),
and edge copies  z  with  G~(z) = -c^T psi(z) + I_box(psi(z)),  where
psi_j(z) = sum_{edges e into j} (zL_e - zD_e).  ADMM on  w = z:

    w^{k+1} = Proj_T(z^k - u^k)                       (bucketed projection)
    w_hat   = alpha w^{k+1} + (1-alpha) z^k           (over-relaxation)
    z^{k+1} = argmin_z G~(z) + rho/2 ||z - (w_hat + u^k)||^2
    u^{k+1} = u^k + w_hat - z^{k+1}

The z-step decomposes per asset j: with v = w_hat + u and
s_j = sum_e (vL_e - vD_e), minimizing over the fiber {psi(z) = psi} gives
zL_e = vL_e + mu_j, zD_e = vD_e - mu_j with mu_j = (psi_j - s_j)/(2 d_j)
(d_j = #edges at j), which collapses the z-step to the n-dim prox in
``ops/prox.py``.  Consequently u is ALWAYS of the form
(u_D, u_L)_e = (+nu_j, -nu_j): the entire edge-space dual lives in one
per-asset price vector nu (and rho*nu converges to the optimal asset
prices).  Per-iteration cross-device communication when pools are sharded
is therefore one psum of an (n+1)-vector plus a few scalars — the property
that makes consensus ADMM the right decomposition for ICI (SURVEY.md §2).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.utility import Objective
from ..ops.projection import ProjectionConfig, project_cs, project_gm
from .compiler import CompiledProblem

__all__ = ["AdmmOptions", "AdmmSolver", "RouteResult"]


@dataclasses.dataclass(frozen=True)
class AdmmOptions:
    rho: float = 1.0
    # over-relaxation in [1.0, 1.8].  Default 1.0: measured across the
    # reference instances and random 1k-pool networks, alpha=1.0 with the
    # fast rho adaptation below converges 2-3x faster than 1.7 on smooth
    # (geo-mean) networks AND is the difference between converging and
    # stalling at ~1e-2 residuals on polyhedral (constant-sum-heavy)
    # networks, whose vertex solutions interact badly with over-relaxation.
    alpha: float = 1.0
    max_iters: int = 2000
    # residual-check cadence inside the while_loop: check_every - 1
    # stats-free iterations (no residual reductions, no scalar psum; only
    # the consensus n-vector crosses devices) between full checks.  The
    # iteration counter advances in strides of check_every, so max_iters
    # may be overshot by at most check_every - 1.
    check_every: int = 1
    eps_abs: float = 1e-9
    eps_rel: float = 1e-9
    adapt_rho: bool = True
    adapt_every: int = 25
    adapt_factor: float = 2.0
    adapt_ratio: float = 3.0
    projection: ProjectionConfig = ProjectionConfig()
    # consensus-exchange strategy: how the per-slot gather of nu and the
    # per-asset scatter-add ride the hardware.  XLA lowers gather/scatter
    # on TPU to serialized updates (~3 ms for 262k slots); the one-hot
    # einsum form is dense VPU/MXU work instead and wins for n <~ 1024.
    #   'scatter' — jax.ops.segment_sum + fancy-index gather
    #   'onehot'  — on-the-fly one-hot contraction, no gather/scatter ops
    #   'radix'   — two-level one-hot (lane-aligned 128-radix low digit +
    #               high digit), applies ride the MXU: VPU cost scales as
    #               E*(128 + n/128) instead of E*n — the large-n mode
    #   'auto'    — onehot for n_assets <= 512, radix above
    consensus: str = "auto"
    onehot_chunk: int = 512
    # cross-shard consensus reduction: 'psum' lets XLA pick the reduction
    # tree (order differs from the single-device sum — f32 drift compounds
    # over iterations); 'compensated' all_gathers the per-device partials
    # and sums them in a FIXED order with Neumaier compensation, making
    # the cross-device part of the reduction deterministic and exact to
    # one final rounding regardless of shard count.  Cost: an all_gather
    # of the (n,)-vector + D*n adds per iteration — negligible next to
    # the bucket work for n <= a few thousand.  Single-device: ignored.
    precise_consensus: bool = False


class RouteResult(NamedTuple):
    """Solver output (device arrays; see AdmmSolver.unbucket for host view)."""

    objective: jax.Array  # c^T psi at the prox point
    psi: jax.Array  # (n,) net trade vector
    prices: jax.Array  # (n,) dual asset prices rho*nu
    deltas: Dict[str, jax.Array]  # bucket -> (m, K) tendered
    lambdas: Dict[str, jax.Array]  # bucket -> (m, K) received
    iters: jax.Array
    r_norm: jax.Array  # final primal residual norm
    s_norm: jax.Array  # final dual residual norm
    converged: jax.Array
    rho_final: jax.Array  # penalty at exit (may differ from options.rho
    #                       after adaptation; prices == rho_final * nu)


def _bucket_device_arrays(compiled: CompiledProblem, dtype):
    """Slot-major (K, m) device copies: pools ride the 128-lane axis.

    Padding slots carry asset index 0 (not a dummy n-th row): every
    consensus read/write is masked instead, which keeps the asset vectors
    at exactly n lanes (256 assets = 2 full 128-lane registers, no +1
    straggler lane forcing a 384-wide tile)."""
    out = {}
    for name, b in compiled.buckets.items():
        asset = np.where(b.mask > 0, b.asset, 0).astype(np.int32)
        out[name] = dict(
            R=jnp.asarray(b.reserves.T, dtype),
            w=jnp.asarray(b.weights.T, dtype),
            s=jnp.asarray(b.shift.T, dtype),
            gamma=jnp.asarray(b.gamma[:, 0], dtype),
            logk0=jnp.asarray(b.logk0, dtype),
            k0=jnp.asarray(b.k0, dtype),
            mask=jnp.asarray(b.mask.T, dtype),
            asset=jnp.asarray(asset.T, jnp.int32),
        )
    return out


class AdmmSolver:
    """Compiled ADMM solver bound to one problem structure.

    The constructor traces/compiles once; `solve` takes (c, lo, hi) device
    arrays so sweeps (reference ``two-asset.py:40``) run as ONE vmapped
    batched call instead of 50 serial canonicalize+solve cycles.
    """

    def __init__(
        self,
        compiled: CompiledProblem,
        dtype=jnp.float32,
        options: AdmmOptions = AdmmOptions(),
        segment_sum_fn=None,
        degree_override: Optional[np.ndarray] = None,
        axis_name: Optional[str] = None,
        consensus_prox=None,
    ):
        self.compiled = compiled
        self.dtype = jnp.dtype(dtype)
        if self.dtype == jnp.float64 and not jax.config.jax_enable_x64:
            raise ValueError(
                "float64 AdmmSolver requires jax_enable_x64 — without it JAX "
                "silently truncates every array to f32 and tight tolerances "
                "become unreachable.  jax.config.update('jax_enable_x64', True)"
            )
        # v5e-class TPUs have no native f64; the remote-compile path hangs
        # rather than erroring on f64 programs.  Certification-grade f64
        # solves belong on the CPU backend (tests / refine stage).
        default_dev = jax.config.jax_default_device
        platform = (
            default_dev.platform if default_dev is not None else jax.default_backend()
        )
        if self.dtype == jnp.float64 and platform != "cpu":
            raise ValueError(
                "float64 AdmmSolver requires the CPU backend (set "
                "jax.config.update('jax_default_device', jax.devices('cpu')[0])); "
                "TPUs run the f32 path + f64 host refine"
            )
        self.options = options
        self.n = compiled.n_assets
        self.buckets = _bucket_device_arrays(compiled, dtype)
        self._meta = {
            name: (b.kind, b.needs_floor) for name, b in compiled.buckets.items()
        }
        deg = compiled.degree if degree_override is None else degree_override
        self.degree = jnp.asarray(deg, dtype)
        # cross-shard reduction: identity on one device; psum over the pool
        # mesh axis inside shard_map (parallel/sharded.py) — the ONLY
        # cross-device communication per iteration is this n-vector
        # plus the 4 residual scalars (SURVEY.md §2).
        self.axis_name = axis_name
        if axis_name is None:
            self._psum = lambda x: x
        elif options.precise_consensus:
            def _psum_compensated(x):
                # (D, ...) per-device partials in axis order — identical
                # on every device, so the fixed-order compensated sum is
                # bitwise-reproducible and shard-count independent
                parts = jax.lax.all_gather(x, axis_name)

                def body(carry, p):
                    s, comp = carry
                    t = s + p
                    comp = comp + jnp.where(
                        jnp.abs(s) >= jnp.abs(p), (s - t) + p, (p - t) + s
                    )
                    return (t, comp), None

                zero = jnp.zeros_like(x)
                (s, comp), _ = jax.lax.scan(body, (zero, zero), parts)
                return s + comp

            self._psum = _psum_compensated
        else:
            self._psum = lambda x: jax.lax.psum(x, axis_name)
        self._segsum = segment_sum_fn or (
            lambda vals, idx: jax.ops.segment_sum(
                vals.reshape(-1), idx.reshape(-1), num_segments=self.n
            )
        )
        mode = options.consensus
        if mode == "auto":
            mode = "onehot" if self.n <= 512 else "radix"
        self.consensus = mode
        # optional override of the consensus reduce+prox: called as
        # (yhat_local, nu, c, lo, hi, rho) -> (psi, mu) with yhat_local the
        # device-LOCAL scatter-add (pre-psum).  The asset-sharded path
        # (parallel/sharded.py, shard_assets=True) uses this to
        # reduce-scatter the n-vector and run the prox on n/D-blocks
        # instead of psum + replicated prox (SURVEY.md §5 reduce_scatter).
        self._consensus_prox = consensus_prox
        # block-diagonal scenario folding (solver/fold.py): when set to
        # (T, n_real), the fused path exchanges each point against its
        # OWN price block (H stays n_real/128 instead of T*n_real/128)
        self._fold = None
        self._solve_jit = jax.jit(self._solve_impl)
        self._solve_fused_jit = None  # built lazily by solve_fused
        self._batch_reserves_jit = None  # built lazily by solve_batch_reserves
        self._custom_cache = {}  # id(CustomUtility) -> (objective, jitted)
        self._solve_vmapped = jax.jit(
            jax.vmap(self._solve_impl, in_axes=(0, 0, 0, None))
        )

    # ---- consensus exchange -------------------------------------------------
    # The two permutation primitives of the iteration: broadcast the n-vector
    # nu to every (pool, slot) edge, and reduce per-edge values back to the
    # n-vector.  In 'onehot' mode both are dense contractions against an
    # on-the-fly one-hot built from a compile-time id table — no XLA
    # gather/scatter ops (which serialize on TPU) anywhere in the hot loop.

    def _chunked(self, flat, fill):
        """(E,) -> (E_pad/C, C), zero/fill-padded to a chunk multiple.

        Derived from the traced array (not host constants) so the same code
        works on local shards inside shard_map."""
        C = self.options.onehot_chunk
        E = flat.shape[0]
        Ep = -(-E // C) * C
        if Ep != E:
            flat = jnp.concatenate(
                [flat, jnp.full((Ep - E,), fill, flat.dtype)]
            )
        return flat.reshape(-1, C)

    def _onehot(self, asset):
        ids_c = self._chunked(asset.reshape(-1), 0)
        iota = jnp.arange(self.n, dtype=jnp.int32)
        return (ids_c[..., None] == iota).astype(self.dtype)

    _RADIX = 128  # low digit == the TPU lane count

    def _radix_onehots(self, asset):
        R = self._RADIX
        ids = self._chunked(asset.reshape(-1), 0)
        H = -(-self.n // R)
        oh_lo = (
            (ids % R)[..., None] == jnp.arange(R, dtype=jnp.int32)
        ).astype(self.dtype)
        oh_hi = (
            (ids // R)[..., None] == jnp.arange(H, dtype=jnp.int32)
        ).astype(self.dtype)
        return oh_lo, oh_hi, H

    def _bcast_nu(self, nu, name, buckets=None):
        arrs = (self.buckets if buckets is None else buckets)[name]
        K, m = arrs["mask"].shape
        if self.consensus == "onehot":
            oh = self._onehot(arrs["asset"])
            # precision=HIGHEST: unbatched, XLA keeps this matvec in f32 on
            # the VPU, but under vmap (solve_batch) it becomes a true MXU
            # matmul whose DEFAULT precision truncates nu to bf16 — measured:
            # the vmapped solve stalls at r ~ 0.5 (4 decades above the
            # single-solve floor) until the contraction is forced to f32
            out = jnp.einsum(
                "bcn,n->bc", oh, nu, precision=jax.lax.Precision.HIGHEST
            ).reshape(-1)[: K * m]
            return out.reshape(K, m) * arrs["mask"]
        if self.consensus == "radix":
            R = self._RADIX
            oh_lo, oh_hi, H = self._radix_onehots(arrs["asset"])
            nu2d = jnp.concatenate(
                [nu, jnp.zeros(H * R - self.n, self.dtype)]
            ).reshape(H, R)
            # M[b,c,h] = nu2d[h, lo[b,c]]  — batched (C,R)x(R,H) matmuls (MXU)
            M = jnp.einsum(
                "bcl,hl->bch", oh_lo, nu2d, precision=jax.lax.Precision.HIGHEST
            )
            out = jnp.einsum(
                "bch,bch->bc", oh_hi, M, precision=jax.lax.Precision.HIGHEST
            ).reshape(-1)[: K * m]
            return out.reshape(K, m) * arrs["mask"]
        return nu[arrs["asset"]] * arrs["mask"]

    def _reduce_edges(self, vals, name, buckets=None):
        """sum_{slots with asset j} vals -> (n,).  vals must be pre-masked."""
        arrs = (self.buckets if buckets is None else buckets)[name]
        if self.consensus == "onehot":
            oh = self._onehot(arrs["asset"])
            vals_c = self._chunked(vals.reshape(-1), 0.0)
            # precision=HIGHEST: see _bcast_nu — the vmapped form of this
            # contraction otherwise truncates the trades to bf16 on the MXU
            return jnp.einsum(
                "bc,bcn->n", vals_c, oh, precision=jax.lax.Precision.HIGHEST
            )
        if self.consensus == "radix":
            R = self._RADIX
            oh_lo, oh_hi, H = self._radix_onehots(arrs["asset"])
            vals_c = self._chunked(vals.reshape(-1), 0.0)
            G = oh_hi * vals_c[..., None]
            # y2d[h,l] = sum_slots val*[hi==h]*[lo==l] — one (H,E)x(E,R) matmul
            y2d = jnp.einsum(
                "bch,bcl->hl", G, oh_lo, precision=jax.lax.Precision.HIGHEST
            )
            return y2d.reshape(-1)[: self.n]
        return self._segsum(vals, arrs["asset"])

    # ---- single iteration ---------------------------------------------------

    def _project(self, name, arrs, pD, pL):
        kind, floor = self._meta[name]
        cfg = self.options.projection
        if kind == "gm":
            return project_gm(
                pD, pL, arrs["R"], arrs["w"], arrs["s"], arrs["gamma"],
                arrs["logk0"], arrs["k0"], arrs["mask"],
                needs_floor=floor, cfg=cfg,
            )
        return project_cs(
            pD, pL, arrs["R"], arrs["gamma"], arrs["w"], arrs["k0"],
            arrs["mask"], cfg=cfg,
        )

    def _iterate(self, z, nu, rho, c, lo, hi, util=None, buckets=None,
                 custom=None, with_stats=True):
        """One ADMM iteration. Returns (z_new, nu_new, psi, w, stats).

        ``with_stats=False`` (a trace-time constant) skips the residual
        accumulations and their packed psum — the ``check_every`` fast
        path: only the n-vector consensus psum remains per iteration.

        ``util`` (a PackedUtility pytree) switches the consensus prox from
        the linear closed form to the general separable-concave one; the
        bucket-side work is identical.

        ``buckets`` overrides the solver's device bucket arrays — the
        sharded path (parallel/sharded.py) passes each device's LOCAL
        shard through here as a traced argument, so the same method body
        serves single-device and shard_map execution with no Python-side
        state swapping.

        z / w are dicts name -> (D, L) pairs of (K, m) arrays — two flat
        slot-major planes, never a trailing length-2 axis (which would put
        2 of 128 lanes to work on every elementwise op)."""
        buckets = self.buckets if buckets is None else buckets
        alpha = jnp.asarray(self.options.alpha, self.dtype)
        w_hat = {}
        w_norm2 = jnp.zeros((), self.dtype)
        yhat = jnp.zeros((self.n,), self.dtype)
        for name, arrs in buckets.items():
            nu_e = self._bcast_nu(nu, name, buckets)
            zD, zL = z[name]
            D, L = self._project(name, arrs, zD - nu_e, zL + nu_e)
            if with_stats:
                w_norm2 += jnp.sum(D * D) + jnp.sum(L * L)
            hD = alpha * D + (1.0 - alpha) * zD
            hL = alpha * L + (1.0 - alpha) * zL
            w_hat[name] = (D, L, hD, hL)
            yhat = yhat + self._reduce_edges(hL - hD, name, buckets)

        from ..ops.prox import custom_prox, psi_prox, utility_prox

        if util is None and custom is None and self._consensus_prox is not None:
            psi, mu = self._consensus_prox(yhat, nu, c, lo, hi, rho)
        else:
            yhat = self._psum(yhat)
            s = yhat - 2.0 * self.degree * nu
            if custom is not None:
                psi, mu = custom_prox(s, self.degree, custom, lo, hi, rho)
            elif util is None:
                psi, mu = psi_prox(s, self.degree, c, lo, hi, rho)
            else:
                psi, mu = utility_prox(s, self.degree, util, rho)

        z_new = {}
        w_out = {}
        r2 = jnp.zeros((), self.dtype)
        s2 = jnp.zeros((), self.dtype)
        z_norm2 = jnp.zeros((), self.dtype)
        for name, arrs in buckets.items():
            D, L, hD, hL = w_hat[name]
            dmu = self._bcast_nu(nu - mu, name, buckets)
            znD = hD + dmu
            znL = hL - dmu
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
            # one packed psum for the four local partial sums (replicated
            # quantities like u_norm2 need no reduction)
            packed = self._psum(jnp.stack([r2, s2, w_norm2, z_norm2]))
            r2, s2, w_norm2, z_norm2 = packed[0], packed[1], packed[2], packed[3]
        u_norm2 = jnp.sum(2.0 * self.degree * mu * mu)
        stats = dict(
            r2=r2, s2=s2 * rho * rho, w_norm2=w_norm2, z_norm2=z_norm2,
            u_norm2=u_norm2 * rho * rho,
        )
        return z_new, mu, psi, w_out, stats

    # ---- fused-kernel iteration path ---------------------------------------
    # State representation:  z(t) = s(t) +/- wdef(t)_e  with s the array
    # planes and wdef an O(n) deferred-broadcast vector (see
    # ops/iteration_pallas.py for the derivation).  One Pallas launch per
    # bucket per iteration; all consensus algebra outside is O(n).

    def fused_init(self, buckets=None):
        buckets = self.buckets if buckets is None else buckets
        s0 = {
            name: (
                jnp.zeros(arrs["mask"].shape, self.dtype),
                jnp.zeros(arrs["mask"].shape, self.dtype),
            )
            for name, arrs in buckets.items()
        }
        wdef0 = jnp.zeros((self.n,), self.dtype)
        nu0 = jnp.zeros((self.n,), self.dtype)
        return s0, wdef0, nu0

    def _fold_pack(self, w, fold):
        """(n,)-consensus vector -> the fused kernel's padded price
        layout, plus the inverse for the reduced y.  Unfolded: zero-pad
        to a lane multiple / slice back.  Folded (T, n_real): pad EACH
        point's block to its own lane multiple so every tile reads a
        (H_local, 128)-aligned slab."""
        n = self.n
        if fold is None:
            n_pad = -(-n // 128) * 128
            v = jnp.concatenate(
                [w, jnp.zeros((n_pad - n,), self.dtype)]
            )
            return v, lambda y: y[:n]
        T_f, n_real = fold
        # per-point blocks must be 8-sublane (1024-value) aligned: a
        # (H, 128) block that is PART of a larger array is only legal
        # for Mosaic when H is a multiple of 8
        npl = -(-n_real // 1024) * 1024
        v = jnp.concatenate(
            [
                w.reshape(T_f, n_real),
                jnp.zeros((T_f, npl - n_real), self.dtype),
            ],
            axis=1,
        ).reshape(-1)
        return v, lambda y: y.reshape(T_f, npl)[:, :n_real].reshape(-1)

    def _iterate_fused(self, s, wdef, nu, rho, c, lo, hi, util=None,
                       interpret=False, buckets=None):
        from ..ops.iteration_pallas import fused_step
        from ..ops.prox import psi_prox, utility_prox

        buckets = self.buckets if buckets is None else buckets
        alpha = float(self.options.alpha)
        n = self.n
        fold = getattr(self, "_fold", None)
        v, unpack = self._fold_pack(wdef - nu, fold)
        y = jnp.zeros(v.shape, self.dtype)
        s_new = {}
        w_out = {}
        for name, arrs in buckets.items():
            kind, floor = self._meta[name]
            sD, sL = s[name]
            sDn, sLn, D, L, yp = fused_step(
                sD, sL, v, arrs, kind, floor, alpha,
                cfg=self.options.projection, interpret=interpret,
                fold=fold,
            )
            s_new[name] = (sDn, sLn)
            w_out[name] = (D, L)
            y = y + yp
        # under shard_map each device reduced only its local pool shard;
        # one n-vector psum completes the consensus (same site as _iterate)
        yhat = self._psum(unpack(y)) - 2.0 * (1.0 - alpha) * self.degree * wdef
        svec = yhat - 2.0 * self.degree * nu
        if util is None:
            psi, mu = psi_prox(svec, self.degree, c, lo, hi, rho)
        else:
            psi, mu = utility_prox(svec, self.degree, util, rho)
        wdef_new = (1.0 - alpha) * wdef + nu - mu
        return s_new, wdef_new, mu, psi, w_out

    # ---- merged K-group fused path (one launch per channel count) ----------

    def _merged_groups(self, buckets=None):
        """Group same-K buckets into ONE concatenated pool axis each,
        with a per-tile bucket-class table (0 gm / 1 floored gm / 2 cs)
        for the scalar-prefetch dispatch in
        ``ops.iteration_pallas.fused_step_merged``.

        The tile extent is the largest VMEM-legal tile that divides
        every member bucket's row count (buckets are pool-padded, so
        with pad_pools_to=1024 the gcd is >= 8 rows and no tile ever
        straddles a bucket boundary).  Returns a list of group dicts;
        cached for the solver's own buckets (device concats run once).
        """
        import math

        from ..ops.iteration_pallas import _pick_tile_rows

        cache = buckets is None or buckets is self.buckets
        if cache and getattr(self, "_merged_cache", None) is not None:
            return self._merged_cache
        buckets = self.buckets if buckets is None else buckets
        by_k = {}
        for name in sorted(buckets):
            K = buckets[name]["mask"].shape[0]
            by_k.setdefault(K, []).append(name)
        n_pad = -(-self.n // 128) * 128
        H = n_pad // 128
        code_of = {("gm", False): 0, ("gm", True): 1, ("cs", False): 2,
                   ("cs", True): 2}
        groups = []
        for K, names in sorted(by_k.items()):
            rows_list = [buckets[nm]["mask"].shape[1] // 128 for nm in names]
            t_v = _pick_tile_rows(sum(rows_list), K, H, require8=True)
            g0 = functools.reduce(math.gcd, rows_list)
            t = math.gcd(max(t_v, 1), g0)
            if t % 8 != 0:
                raise ValueError(
                    f"merged fused path needs 8-row-aligned bucket sizes "
                    f"(K={K} group rows {rows_list}); compile with "
                    "pad_pools_to=1024"
                )
            bid = np.concatenate(
                [
                    np.full(rows_list[i] // t, code_of[self._meta[nm]],
                            np.int32)
                    for i, nm in enumerate(names)
                ]
            )
            arrs = {
                key: jnp.concatenate(
                    [buckets[nm][key] for nm in names], axis=-1
                )
                for key in ("R", "w", "s", "mask", "asset", "gamma",
                            "logk0", "k0")
            }
            arrs["bid"] = jnp.asarray(bid)
            groups.append(
                dict(
                    K=K, names=names, tile=int(t),
                    ms=[buckets[nm]["mask"].shape[1] for nm in names],
                    arrs=arrs,
                )
            )
        if cache:
            self._merged_cache = groups
        return groups

    def _merge_state(self, s, groups):
        return [
            (
                jnp.concatenate([s[nm][0] for nm in g["names"]], axis=1),
                jnp.concatenate([s[nm][1] for nm in g["names"]], axis=1),
            )
            for g in groups
        ]

    def _split_state(self, sm, groups):
        out = {}
        for g, (sDm, sLm) in zip(groups, sm):
            off = 0
            for nm, m_b in zip(g["names"], g["ms"]):
                out[nm] = (
                    jax.lax.slice_in_dim(sDm, off, off + m_b, axis=1),
                    jax.lax.slice_in_dim(sLm, off, off + m_b, axis=1),
                )
                off += m_b
        return out

    def _iterate_fused_merged(self, sm, wdef, nu, rho, c, lo, hi, groups,
                              util=None, interpret=False):
        """Mirror of :meth:`_iterate_fused` on merged K-group state: one
        Pallas launch per CHANNEL COUNT per iteration (2 at the 100k
        bench shape) instead of one per bucket (5)."""
        from ..ops.iteration_pallas import fused_step_merged
        from ..ops.prox import psi_prox, utility_prox

        alpha = float(self.options.alpha)
        n = self.n
        n_pad = -(-n // 128) * 128
        v = jnp.concatenate(
            [wdef - nu, jnp.zeros((n_pad - n,), self.dtype)]
        )
        y = jnp.zeros((n_pad,), self.dtype)
        sm_new = []
        w_out = []
        for g, (sDm, sLm) in zip(groups, sm):
            sDn, sLn, D, L, yp = fused_step_merged(
                sDm, sLm, v, g["arrs"], g["tile"], alpha,
                cfg=self.options.projection, interpret=interpret,
            )
            sm_new.append((sDn, sLn))
            w_out.append((D, L))
            y = y + yp
        yhat = self._psum(y[:n]) - 2.0 * (1.0 - alpha) * self.degree * wdef
        svec = yhat - 2.0 * self.degree * nu
        if util is None:
            psi, mu = psi_prox(svec, self.degree, c, lo, hi, rho)
        else:
            psi, mu = utility_prox(svec, self.degree, util, rho)
        wdef_new = (1.0 - alpha) * wdef + nu - mu
        return sm_new, wdef_new, mu, psi, w_out

    def fused_to_z(self, s, wdef, buckets=None):
        """Materialize the classic edge state z from the fused state."""
        buckets = self.buckets if buckets is None else buckets
        z = {}
        for name in buckets:
            we = self._bcast_nu(wdef, name, buckets)
            sD, sL = s[name]
            z[name] = (sD + we, sL - we)
        return z

    def _solve_fused_impl(self, c, lo, hi, rho, n_iters, util=None,
                          interpret=False, buckets=None, z0=None, nu0=None,
                          merged=False):
        """Fixed-iteration solve on the fused-kernel path.

        Runs ``n_iters`` fused iterations (one Pallas launch per bucket per
        iteration, no residual bookkeeping in the loop), then materializes
        the classic edge state and runs ONE classic iteration to harvest
        exact residual norms and exactly-feasible primal trades.

        ``buckets`` overrides the solver's device bucket arrays — the
        sharded path passes each device's LOCAL shard as a traced argument
        (same contract as :meth:`_iterate`); the per-iteration psum sites
        inside :meth:`_iterate_fused` / :meth:`_iterate` complete the
        consensus across the pool mesh axis.

        ``z0``/``nu0`` warm-start the fused state: z = s + wdef_e with
        wdef = 0 reproduces any classic edge state exactly, so chunked
        callers (the refinement stage) chain fused chunks through
        :meth:`warm_state` with no conversion cost."""
        opts = self.options
        buckets = self.buckets if buckets is None else buckets
        s0, wdef0, nu0_z = self.fused_init(buckets)
        if z0 is not None:
            s0 = {name: (zD, zL) for name, (zD, zL) in z0.items()}
        nu0 = nu0_z if nu0 is None else nu0

        if merged:
            groups = self._merged_groups(buckets)
            sm0 = self._merge_state(s0, groups)

            def body_m(_, st):
                sm, wdef, nu = st
                sm, wdef, nu, _, _ = self._iterate_fused_merged(
                    sm, wdef, nu, rho, c, lo, hi, groups, util=util,
                    interpret=interpret,
                )
                return (sm, wdef, nu)

            sm, wdef, nu = jax.lax.fori_loop(
                0, n_iters, body_m, (sm0, wdef0, nu0)
            )
            s = self._split_state(sm, groups)
        else:
            def body(_, st):
                s, wdef, nu = st
                s, wdef, nu, _, _ = self._iterate_fused(
                    s, wdef, nu, rho, c, lo, hi, util=util,
                    interpret=interpret, buckets=buckets,
                )
                return (s, wdef, nu)

            s, wdef, nu = jax.lax.fori_loop(
                0, n_iters, body, (s0, wdef0, nu0)
            )
        z = self.fused_to_z(s, wdef, buckets)
        z, nu, psi, w, st = self._iterate(z, nu, rho, c, lo, hi, util, buckets)
        r = jnp.sqrt(st["r2"])
        sd = jnp.sqrt(st["s2"])
        n_edges = sum(
            2 * int(np.prod(b["mask"].shape)) for b in buckets.values()
        )
        n_shards = (
            1.0 if self.axis_name is None
            else jax.lax.psum(jnp.ones((), self.dtype), self.axis_name)
        )
        sqn = jnp.sqrt(jnp.asarray(n_edges, self.dtype) * n_shards)
        eps_pri = opts.eps_abs * sqn + opts.eps_rel * jnp.sqrt(
            jnp.maximum(st["w_norm2"], st["z_norm2"])
        )
        eps_dua = opts.eps_abs * sqn + opts.eps_rel * jnp.sqrt(st["u_norm2"])
        if util is None:
            obj = jnp.sum(c * psi)
        else:
            from ..ops.prox import utility_value

            obj = utility_value(util, psi)
        return RouteResult(
            objective=obj,
            psi=psi,
            prices=rho * nu,
            deltas={name: w[name][0] for name in buckets},
            lambdas={name: w[name][1] for name in buckets},
            iters=jnp.asarray(n_iters + 1, jnp.int32),
            r_norm=r,
            s_norm=sd,  # st["s2"] is already rho-scaled inside _iterate
            converged=jnp.logical_and(r <= eps_pri, sd <= eps_dua),
            rho_final=rho,
        )

    def solve_fused(
        self,
        objective,
        iters: int,
        rho: Optional[float] = None,
        interpret: bool = False,
        merged: bool = False,
    ) -> RouteResult:
        """Fixed-iteration solve on the fused Pallas path.

        Requires every bucket's pool count to be a multiple of 128
        (compile with ``pad_pools_to=128``) — the kernel tiles pools onto
        the TPU lane axis.  Accepts the same objectives as :meth:`solve`.

        ``merged=True``: one kernel launch per CHANNEL COUNT per
        iteration instead of one per bucket — same-K buckets share a
        concatenated pool axis and a per-tile bucket-class dispatch
        (``fused_step_merged``).
        """
        for name, arrs in self.buckets.items():
            m = arrs["mask"].shape[1]
            if m % 128 != 0:
                raise ValueError(
                    f"bucket {name!r} has {m} pools; the fused kernel needs "
                    "a multiple of 128 (1024 for big buckets) — "
                    "compile_spec/compile_table with pad_pools_to=128"
                )
        from ..models.utility import ConcaveUtility

        util = None
        if isinstance(objective, ConcaveUtility):
            util = objective.pack(self.dtype)
            c, lo, hi = util.c, util.lo, util.hi
        else:
            c = jnp.asarray(objective.c, self.dtype)
            lo = jnp.asarray(
                np.maximum(objective.lo, -np.finfo(np.float32).max / 4), self.dtype
            )
            hi = jnp.asarray(
                np.minimum(objective.hi, np.finfo(np.float32).max / 4), self.dtype
            )
        if self._solve_fused_jit is None:
            self._solve_fused_jit = jax.jit(
                self._solve_fused_impl,
                static_argnames=("n_iters", "interpret", "merged"),
            )
        rho_v = jnp.asarray(
            rho if rho is not None else self.options.rho, self.dtype
        )
        return self._solve_fused_jit(
            c, lo, hi, rho_v, n_iters=int(iters), util=util,
            interpret=interpret, merged=bool(merged),
        )

    # ---- full solve ---------------------------------------------------------

    def _solve_impl(self, c, lo, hi, rho0, z0=None, nu0=None, util=None,
                    buckets=None, custom=None, max_iters=None):
        """``max_iters`` optionally overrides options.max_iters as a TRACED
        scalar — callers that grow their iteration budget across calls
        (solver/refine.py's chunk schedule) reuse one compiled program."""
        opts = self.options
        iter_budget = (
            jnp.asarray(opts.max_iters, jnp.int32)
            if max_iters is None
            else max_iters
        )
        buckets = self.buckets if buckets is None else buckets
        n_edges = sum(
            2 * int(np.prod(b["mask"].shape)) for b in buckets.values()
        )
        # under shard_map the bucket arrays are per-device shards; the
        # residual norms are psum'd globally, so the eps scale must use the
        # GLOBAL edge count for sharded == single-device stopping parity
        n_shards = (
            1.0 if self.axis_name is None
            else jax.lax.psum(jnp.ones((), self.dtype), self.axis_name)
        )
        sqn = jnp.sqrt(jnp.asarray(n_edges, self.dtype) * n_shards)
        c = c.astype(self.dtype)
        lo = lo.astype(self.dtype)
        hi = hi.astype(self.dtype)

        if z0 is None:
            z0 = {
                name: (
                    jnp.zeros(arrs["mask"].shape, self.dtype),
                    jnp.zeros(arrs["mask"].shape, self.dtype),
                )
                for name, arrs in buckets.items()
            }
        if nu0 is None:
            nu0 = jnp.zeros((self.n,), self.dtype)

        def cond(state):
            k, _, _, rho, r, s, eps_pri, eps_dua, _, _ = state
            return jnp.logical_and(
                k < iter_budget,
                jnp.logical_or(r > eps_pri, s > eps_dua),
            )

        check_every = max(1, int(opts.check_every))

        def body(state):
            k, z, nu, rho, _, _, _, _, _, _ = state
            if check_every > 1:
                # stats-free fast iterations: no residual reductions, no
                # scalar psum — only the consensus n-vector crosses devices
                def inner(_, zn):
                    z_i, nu_i = zn
                    z_i, nu_i, _, _, _ = self._iterate(
                        z_i, nu_i, rho, c, lo, hi, util, buckets, custom,
                        with_stats=False,
                    )
                    return (z_i, nu_i)

                z, nu = jax.lax.fori_loop(0, check_every - 1, inner, (z, nu))
            z, nu, psi, w, st = self._iterate(
                z, nu, rho, c, lo, hi, util, buckets, custom
            )
            r = jnp.sqrt(st["r2"])
            sd = jnp.sqrt(st["s2"])
            eps_pri = opts.eps_abs * sqn + opts.eps_rel * jnp.sqrt(
                jnp.maximum(st["w_norm2"], st["z_norm2"])
            )
            eps_dua = opts.eps_abs * sqn + opts.eps_rel * jnp.sqrt(st["u_norm2"])
            k = k + check_every
            if opts.adapt_rho:
                # with check_every > 1 the counter advances in strides; fire
                # the adaptation whenever a stride crosses an adapt_every
                # boundary so the cadence is preserved in iteration terms
                # window gate uses the TRACED budget: refine's growing
                # chunks and explicit max_iters= overrides adapt for the
                # first half of THEIR budget, not options.max_iters'
                do_adapt = jnp.logical_and(
                    (k % opts.adapt_every) < check_every,
                    k < iter_budget // 2,
                )
                up = jnp.logical_and(do_adapt, r > opts.adapt_ratio * sd)
                dn = jnp.logical_and(do_adapt, sd > opts.adapt_ratio * r)
                fac = jnp.where(
                    up, opts.adapt_factor, jnp.where(dn, 1.0 / opts.adapt_factor, 1.0)
                ).astype(self.dtype)
                rho = rho * fac
                nu = nu / fac
            return (k, z, nu, rho, r, sd, eps_pri, eps_dua, psi, w)

        big = jnp.asarray(jnp.inf, self.dtype)
        w0 = {
            name: (jnp.zeros_like(zD), jnp.zeros_like(zL))
            for name, (zD, zL) in z0.items()
        }
        state0 = (
            jnp.zeros((), jnp.int32), z0, nu0,
            jnp.asarray(rho0, self.dtype), big, big,
            jnp.zeros((), self.dtype), jnp.zeros((), self.dtype),
            jnp.zeros((self.n,), self.dtype), w0,
        )
        k, z, nu, rho, r, sd, eps_pri, eps_dua, psi, w = jax.lax.while_loop(
            cond, body, state0
        )

        # primal variables from the last iteration's projection (exactly
        # feasible per pool — each (D, L) lies in its trading set)
        deltas = {name: w[name][0] for name in self.buckets}
        lambdas = {name: w[name][1] for name in self.buckets}

        if custom is not None:
            obj = custom.fn(psi)
        elif util is None:
            obj = jnp.sum(c * psi)
        else:
            from ..ops.prox import utility_value

            obj = utility_value(util, psi)
        converged = jnp.logical_and(r <= eps_pri, sd <= eps_dua)
        return RouteResult(
            objective=obj,
            psi=psi,
            prices=rho * nu,
            deltas=deltas,
            lambdas=lambdas,
            iters=k,
            r_norm=r,
            s_norm=sd,
            converged=converged,
            rho_final=rho,
        )

    def warm_state(self, result: RouteResult, rho: Optional[float] = None):
        """Reconstruct an ADMM starting state (z0, nu0) from a prior solve.

        The reference re-canonicalizes from scratch on every solve
        (``two-asset.py:40-91``); here a prior route on the same network
        seeds the next solve (drifted reserves/prices converge in a
        handful of iterations instead of hundreds).

        ``rho`` must be the penalty the NEXT solve will run at (solve()
        passes its own rho here).  The unscaled dual is penalty-free —
        y == prices == rho_final * nu — so the scaled dual for the new
        penalty is prices / rho_new; the prior solve's (possibly adapted)
        rho_final cancels out and is recorded on the result only for
        diagnostics."""
        rho = float(rho if rho is not None else self.options.rho)
        nu0 = jnp.asarray(np.asarray(result.prices) / rho, self.dtype)
        # at the ADMM fixed point z == w exactly (dmu -> 0), so the edge
        # state is just the trades; the entire dual lives in nu
        z0 = {
            name: (
                jnp.asarray(result.deltas[name], self.dtype),
                jnp.asarray(result.lambdas[name], self.dtype),
            )
            for name in self.buckets
        }
        return z0, nu0

    def solve(
        self,
        objective,
        rho: Optional[float] = None,
        warm: Optional[RouteResult] = None,
        max_iters: Optional[int] = None,
    ) -> RouteResult:
        """Solve for an :class:`Objective` (linear), a separable
        :class:`~cfmm_routing_tpu.models.utility.ConcaveUtility`, or a
        non-separable
        :class:`~cfmm_routing_tpu.models.utility.CustomUtility`.

        ``max_iters`` overrides ``options.max_iters`` for THIS call as a
        traced scalar (no recompile across different budgets)."""
        from ..models.utility import ConcaveUtility, CustomUtility

        mi = (
            None if max_iters is None else jnp.asarray(max_iters, jnp.int32)
        )
        if rho is not None:
            rho_v = rho
        elif warm is not None:
            # continue at the penalty the prior solve ADAPTED to — warm
            # starting at options.rho forces the whole re-adaptation
            # transient (measured: 1 iteration vs 1400 on a custom-utility
            # re-solve whose prior run ended at rho 32x from rho0)
            rho_v = float(np.asarray(warm.rho_final))
        else:
            rho_v = self.options.rho
        if isinstance(objective, CustomUtility):
            key = id(objective)
            ent = self._custom_cache.get(key)
            if ent is None or ent[0] is not objective:
                # the utility's fn/prox_iters are trace-time constants:
                # one jitted program per CustomUtility instance
                ent = (
                    objective,
                    jax.jit(functools.partial(self._solve_impl, custom=objective)),
                )
                self._custom_cache[key] = ent
            c = jnp.zeros((self.n,), self.dtype)
            lo = jnp.asarray(
                np.maximum(objective.lo, -np.finfo(np.float32).max / 4), self.dtype
            )
            hi = jnp.asarray(
                np.minimum(objective.hi, np.finfo(np.float32).max / 4), self.dtype
            )
            z0 = nu0 = None
            if warm is not None:
                z0, nu0 = self.warm_state(warm, rho_v)
            return ent[1](c, lo, hi, rho_v, z0, nu0, max_iters=mi)
        util = None
        if isinstance(objective, ConcaveUtility):
            util = objective.pack(self.dtype)
            c, lo, hi = util.c, util.lo, util.hi
        else:
            c = jnp.asarray(objective.c, self.dtype)
            lo = jnp.asarray(
                np.maximum(objective.lo, -np.finfo(np.float32).max / 4), self.dtype
            )
            hi = jnp.asarray(
                np.minimum(objective.hi, np.finfo(np.float32).max / 4), self.dtype
            )
        z0 = nu0 = None
        if warm is not None:
            z0, nu0 = self.warm_state(warm, rho_v)
        return self._solve_jit(c, lo, hi, rho_v, z0, nu0, util, max_iters=mi)

    def solve_batch(self, c, lo, hi, rho: Optional[float] = None) -> RouteResult:
        """vmapped solve over leading batch axis of (c, lo, hi)."""
        return self._solve_vmapped(
            jnp.asarray(c, self.dtype),
            jnp.asarray(lo, self.dtype),
            jnp.asarray(hi, self.dtype),
            rho if rho is not None else self.options.rho,
        )

    # ---- batched reserve scenarios -----------------------------------------

    def batch_reserve_arrays(self, reserve_scale):
        """Batched bucket arrays for per-pool reserve scenarios.

        ``reserve_scale``: (B, n_pools) multiplicative factors on each
        pool's reserve vector.  Returns (buckets, in_axes) where only the
        reserve-derived leaves (R, k0, logk0) carry the leading B axis —
        weights/shifts/topology are shared across scenarios.
        """
        scale = np.asarray(reserve_scale, np.float64)
        if scale.ndim != 2 or scale.shape[1] != self.compiled.n_pools:
            raise ValueError(
                f"reserve_scale must be (B, n_pools={self.compiled.n_pools}); "
                f"got {scale.shape}"
            )
        out = {}
        axes = {}
        B = scale.shape[0]
        for name, b in self.compiled.buckets.items():
            # (B, m): padding rows (inert pools) scale by 1
            sc = np.ones((B, b.m))
            sc[:, : len(b.pool_ids)] = scale[:, b.pool_ids]
            Rb = b.reserves[None] * sc[:, :, None]  # (B, m, K)
            if b.kind == "gm":
                y = np.where(b.mask[None] > 0, Rb + b.shift[None], 1.0)
                logk0 = np.sum(b.weights[None] * np.log(y), axis=2)
                k0 = np.exp(logk0)
            else:
                k0 = np.sum(b.weights[None] * Rb, axis=2)
                logk0 = np.log(np.maximum(k0, 1e-300))
            arrs = dict(self.buckets[name])
            arrs["R"] = jnp.asarray(np.swapaxes(Rb, 1, 2), self.dtype)  # (B,K,m)
            arrs["k0"] = jnp.asarray(k0, self.dtype)
            arrs["logk0"] = jnp.asarray(logk0, self.dtype)
            out[name] = arrs
            axes[name] = {
                k: (0 if k in ("R", "k0", "logk0") else None) for k in arrs
            }
        return out, axes

    def solve_batch_reserves(
        self, objective, reserve_scale, rho: Optional[float] = None
    ) -> RouteResult:
        """One vmapped solve across B per-pool reserve scenarios.

        The BASELINE "100k pools x batched reserve scenarios" config:
        scenario analysis (post-shock reserve states) runs as ONE device
        program — the reference would re-canonicalize and re-solve from
        scratch per scenario (``two-asset.py:40-91`` is the same pattern
        over holdings).  Returns a RouteResult with leading axis B.
        """
        c = jnp.asarray(objective.c, self.dtype)
        lo = jnp.asarray(
            np.maximum(objective.lo, -np.finfo(np.float32).max / 4), self.dtype
        )
        hi = jnp.asarray(
            np.minimum(objective.hi, np.finfo(np.float32).max / 4), self.dtype
        )
        rho_v = jnp.asarray(
            rho if rho is not None else self.options.rho, self.dtype
        )
        buckets, axes = self.batch_reserve_arrays(reserve_scale)
        if self._batch_reserves_jit is None:
            # ONE persistent jitted program: (c, lo, hi, rho) are traced
            # arguments so repeated scenario solves (same B and topology)
            # hit the XLA cache instead of re-tracing a fresh closure
            # per call
            def _impl(bks, c_, lo_, hi_, rho_):
                return jax.vmap(
                    lambda b2: self._solve_impl(c_, lo_, hi_, rho_, buckets=b2),
                    in_axes=(axes,),
                )(bks)

            self._batch_reserves_jit = jax.jit(_impl)
        return self._batch_reserves_jit(buckets, c, lo, hi, rho_v)

    # ---- host-side unbucketing ---------------------------------------------

    def unbucket(self, result: RouteResult):
        """Return per-pool (delta, lambda) numpy arrays in spec order."""
        deltas = [None] * self.compiled.n_pools
        lambdas = [None] * self.compiled.n_pools
        for name, b in self.compiled.buckets.items():
            D = np.asarray(result.deltas[name])  # (K, m) slot-major
            L = np.asarray(result.lambdas[name])
            for r, pid in enumerate(b.pool_ids):
                k = int(self.compiled.widths[pid])
                deltas[pid] = D[:k, r]
                lambdas[pid] = L[:k, r]
        return deltas, lambdas
