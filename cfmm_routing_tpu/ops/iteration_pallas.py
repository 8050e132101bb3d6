"""Fully-fused ADMM iteration kernel: projection + consensus exchange in
one VMEM pass per bucket.

The XLA path (solver/admm.py) spends most of each iteration building
one-hot masks for the two consensus maps (broadcast nu to edges, reduce
edges to assets) and re-reading edge arrays from HBM between the ops.
This kernel eliminates both costs with an algebraic restructuring:

State per bucket:  s = (sD, sL), evolving as  s' = alpha*w + (1-alpha)*s
  (w = projected trades).  s carries NO broadcast term: the identity

      z(t) = s(t) + wdef(t)_e        (z the classic ADMM edge state)

  holds with an O(n) *deferred broadcast* vector recursion
  wdef(t+1) = (1-alpha)*wdef(t) + (nu(t) - mu(t)) maintained outside the
  kernel (solver/admm.py `_iterate_fused`).  Substituting into the classic
  iteration, the projection input needs only  v = wdef - nu  broadcast
  once:

      p = sD + v_e,   q = sL - v_e,      (D, L) = Proj_T(p, q)

  and the consensus reduction needs only array terms
      y_arrays = reduce(alpha*(L-D) + (1-alpha)*(sL-sD))
  (the deferred part contributes -2*(1-alpha)*degree*wdef in O(n)).

Consensus exchange inside the kernel — RADIX-128 DECOMPOSITION.  The
slot->asset map is factored through the TPU lane structure: asset id
a = 128*hi + lo.  Per channel the kernel builds TWO small one-hots,

    oh_lo (128, T)   oh_lo[l, t] = [lo_t == l]
    oh_hi (H, T)     oh_hi[h, t] = [hi_t == h],    H = n_pad / 128,

instead of one (n_pad, T) one-hot.  The broadcast of the price vector
v2d (H, 128) is  M = v2d @ oh_lo  (H, T) followed by an H-row select
(sum over oh_hi * M); the reduction is  y2d += (oh_hi * val) @ oh_lo^T
(H, 128).  VMEM for the exchange is therefore (128 + 2H) * T * 4 bytes
per channel — INDEPENDENT of n for the dominant lo factor — versus
n_pad * T * 4 for the dense one-hot, which VMEM-OOMed at the 100k-pool
bench config (n_pad=256, K=4 blew the 16 MB scoped limit) and scaled
linearly in n.  MXU flops are unchanged (2*E*n_pad per apply) but ride
128-wide systolic passes either way; the VPU one-hot build cost drops
from E*n_pad to E*(128 + H) compares.

A VMEM budget model (`_pick_tile_rows`) sizes the grid tile so the
per-step footprint stays under ~8 MB of the 16 MB scoped limit, instead
of the fixed 1024-pool tile that shipped the round-1 OOM.

So ONE kernel launch per bucket per iteration does: build the two radix
one-hots ONCE per channel in VMEM, apply them twice as MXU matmuls
(gather v, scatter the reduction), run the closed-form projection
root-find — with total HBM traffic of ~4 planes read + 4 written per
tile.  Equivalence with the classic path is tested trajectory-exactly in
tests/test_fused.py (interpret) and tests/test_tpu_compiled.py (on TPU).

Shapes: s/D/L (K, m) slot-major, m % 128 == 0 (compile with
pad_pools_to=128); v/y are (n_pad,) with n_pad = ceil(n/128)*128.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .projection import ProjectionConfig
from .projection_delta import (
    _ab_from_theta,
    _inner_gm_delta,
    _solve_theta_linear_delta,
)
from .projection_pallas import (
    _eval_cs_channels,
    _eval_gm_channels,
    _root_find_body,
    _relu,
)

__all__ = ["fused_step", "fused_step_delta", "fused_step_merged"]

_LANES = 128
# Target VMEM footprint per grid step.  The scoped limit is 16 MB, but the
# model below deliberately books only a quarter of it: measured on v5e,
# Mosaic's actual stack allocation runs ~3x the model (transposed copies
# of the one-hots for the scatter-side dot_general, double-buffered I/O
# tiles, root-find spills) — a (32,128)-tile K=2 step modeled at 5.6 MB
# compiled to a 16.78 MB scoped allocation and OOMed the 100k-pool bench.
_VMEM_BUDGET = 4 << 20  # at its wall: a 6 MB budget compiles to a 16.8 MB
#                          Mosaic scoped allocation (the ~3x multiplier is
#                          precise) and OOMs the 16 MB limit — measured on
#                          hardware, round 4


def _pick_tile_rows(
    rows: int, K: int, H: int, require8: bool = False, temps: int = 24
) -> int:
    """Largest legal sublane tile under the VMEM budget.

    Legality (Mosaic): the block's sublane extent must be a multiple of 8
    or equal to the whole array.  ``require8`` additionally forbids
    sub-8-sublane tiles: compiling this kernel with a t == rows < 8 tile
    has been observed to HANG the Mosaic TPU compiler indefinitely
    (reproduced twice at rows=6), so the compiled path only accepts
    8-aligned tiles and small buckets must pad to 1024 pools.

    Budget model per tile row (128 slots), per channel: radix one-hots +
    M temp (128 + 2*He)*128*4 bytes with He = max(H, 8) (sublane
    padding), plus ``temps`` (tr,128) f32 temporaries per channel for
    in/out tiles and the root-find (24 for the classic kernel; the delta
    kernel carries 3 more input planes and a wider root-find state and
    books 40), plus slack.
    """
    He = max(H, 8)
    per_row = 128 * 4 * (K * (128 + 2 * He) + temps * K + 8)
    cap = max(1, _VMEM_BUDGET // per_row)
    for t in range(min(cap, rows), 0, -1):
        if rows % t == 0 and (t % 8 == 0 or (t == rows and not require8)):
            return t
    return 0


def _gm_bracket(ch, gamma, k0):
    mu_hi = None
    for (p, q, Rp, w, s, mask) in ch:
        qp = _relu(q) + 1e-3
        need_t = jnp.maximum(
            2.0 * qp * (Rp + gamma * _relu(p)), 4.0 * qp * qp * gamma * gamma
        )
        w_safe = jnp.where(mask > 0, w, 1.0)
        cand = jnp.where(mask > 0, need_t / (w_safe * jnp.maximum(k0, 1e-30)), 0.0)
        mu_hi = cand if mu_hi is None else jnp.maximum(mu_hi, cand)
    return 4.0 * mu_hi + 1.0


def _fused_kernel(K, kind, needs_floor, cfg, alpha, H, refs, fold=None):
    """refs in: sD_c[K], sL_c[K], ids_c[K], R_c[K], w_c[K], sh_c[K],
    mask_c[K], gamma, logk0, k0, v2d(H,128)
    out: sD'_c[K], sL'_c[K], D_c[K], L_c[K], y2d(H,128)

    ``fold=(tiles_per_point, n_real)``: block-diagonal scenario folding
    (solver/fold.py).  Tiles are point-aligned, so the kernel subtracts
    the tile's point offset from the asset ids and works against that
    point's OWN (H, 128) price block — H stays n/128 regardless of the
    number of folded points (the naive fold pays the radix exchange at
    H = T*n/128, measured 16x slower at T=64/n=64 than the vmapped
    classic path it was meant to replace).  Folded padding ids land in
    the local block's pad slots (see solver/fold.py), which read the
    zero pad and scatter into sliced-away lanes."""
    nin = 7 * K + 4
    ins, outs = refs[:nin], refs[nin:]
    sD = [ins[c][:] for c in range(K)]
    sL = [ins[K + c][:] for c in range(K)]
    IDS = [ins[2 * K + c][:] for c in range(K)]
    if fold is not None:
        tpp, n_real = fold
        t_idx = jax.lax.div(pl.program_id(0), jnp.int32(tpp))
        IDS = [ids - t_idx * jnp.int32(n_real) for ids in IDS]
    R = [ins[3 * K + c][:] for c in range(K)]
    W = [ins[4 * K + c][:] for c in range(K)]
    SH = [ins[5 * K + c][:] for c in range(K)]
    M = [ins[6 * K + c][:] for c in range(K)]
    gamma = ins[7 * K][:]
    logk0 = ins[7 * K + 1][:]
    k0 = ins[7 * K + 2][:]
    v2d = ins[7 * K + 3][:]  # (H, 128) price vector, radix layout

    rows, lanes = sD[0].shape
    T = rows * lanes
    a = jnp.float32(alpha)

    # radix one-hots per channel, built once, applied twice on the MXU
    radix = []
    P, Q = [], []
    for c in range(K):
        ids_row = IDS[c].reshape(1, T)
        lo_row = jax.lax.rem(ids_row, jnp.int32(_LANES))
        hi_row = jax.lax.div(ids_row, jnp.int32(_LANES))
        oh_lo = (
            jax.lax.broadcasted_iota(jnp.int32, (_LANES, T), 0) == lo_row
        ).astype(jnp.float32)  # (128, T)
        oh_hi = (
            jax.lax.broadcasted_iota(jnp.int32, (H, T), 0) == hi_row
        ).astype(jnp.float32)  # (H, T)
        radix.append((oh_lo, oh_hi))
        # HIGHEST precision is load-bearing: the default TPU matmul
        # truncates f32 operands to bf16 on the MXU, which puts a ~2^-8
        # relative error on every broadcast nu value and caps the whole
        # ADMM at a 1e-2 residual floor (measured on hardware).
        # Mrow[h, t] = v2d[h, lo_t]
        Mrow = jax.lax.dot_general(
            v2d, oh_lo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (H, T)
        # select the high digit: ve[t] = Mrow[hi_t, t]
        ve = jnp.sum(oh_hi * Mrow, axis=0, keepdims=True)  # (1, T)
        ve = ve.reshape(rows, lanes) * M[c]
        P.append(sD[c] + ve)
        Q.append(sL[c] - ve)

    # batched projection (identical math to projection_pallas kernels)
    if kind == "gm":
        ch = [(P[c], Q[c], R[c] + SH[c], W[c], SH[c], M[c]) for c in range(K)]
        mu_hi = _gm_bracket(ch, gamma, k0)

        def h_of_mu(mu):
            return _eval_gm_channels(mu, ch, gamma, k0, needs_floor)[2]

        mu = _root_find_body(h_of_mu, mu_hi, logk0, cfg)
        Ds, Ls, _ = _eval_gm_channels(mu, ch, gamma, k0, needs_floor)
    else:
        ch = [(P[c], Q[c], R[c], W[c], SH[c], M[c]) for c in range(K)]
        mu_hi = None
        for (p, q, R_, w, s, mask) in ch:
            w_safe = jnp.where(mask > 0, w, 1.0)
            cand = _relu(q) * mask / w_safe
            mu_hi = cand if mu_hi is None else jnp.maximum(mu_hi, cand)
        mu_hi = mu_hi + 1.0

        def h_of_mu(mu):
            return _eval_cs_channels(mu, ch, gamma, k0)[2]

        mu = _root_find_body(h_of_mu, mu_hi, k0, cfg)
        Ds, Ls, _ = _eval_cs_channels(mu, ch, gamma, k0)

    # outputs + the per-tile partial consensus reduction
    y_ref = outs[4 * K]
    if fold is None:
        first_tile = pl.program_id(0) == 0
    else:
        # each point owns its y block; its first tile zeroes it (tiles
        # of one point are consecutive grid steps, so the block stays
        # resident in VMEM across the whole per-point accumulation)
        first_tile = jax.lax.rem(pl.program_id(0), jnp.int32(fold[0])) == 0

    @pl.when(first_tile)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    y_acc = jnp.zeros((H, _LANES), jnp.float32)
    for c in range(K):
        D, L = Ds[c], Ls[c]
        outs[c][:] = a * D + (1.0 - a) * sD[c]          # sD'
        outs[K + c][:] = a * L + (1.0 - a) * sL[c]      # sL'
        outs[2 * K + c][:] = D
        outs[3 * K + c][:] = L
        val = a * (L - D) + (1.0 - a) * (sL[c] - sD[c])
        oh_lo, oh_hi = radix[c]
        G = oh_hi * val.reshape(1, T)  # (H, T): per-slot value in its hi row
        # y2d[h, l] += sum_t G[h, t] * oh_lo[l, t]
        y_acc = y_acc + jax.lax.dot_general(
            G, oh_lo, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    y_ref[:] += y_acc


def fused_step(
    sD, sL, v, arrs, kind, needs_floor,
    alpha: float,
    cfg: ProjectionConfig = ProjectionConfig(),
    interpret: bool = False,
    fold=None,
):
    """One fused half-iteration for one bucket.

    sD/sL: (K, m) state planes;  v: (n_pad,) combined broadcast vector
    (wdef - nu, zero-padded to a lane multiple);  arrs: the solver's
    device bucket dict.  Returns (sD', sL', D, L, y_partial(n_pad,)).

    ``fold=(T, n_real)``: block-diagonal scenario folding — m covers T
    point-major pool blocks, v is the (T * n_pad_local,) per-point
    padded price layout, and each tile exchanges against its own
    point's (H_local, 128) block (see ``_fused_kernel``).  Returns y in
    the same per-point padded layout.
    """
    K, m = sD.shape
    assert m % _LANES == 0, f"pool count {m} must be a multiple of {_LANES}"
    n_pad = v.shape[0]
    assert n_pad % _LANES == 0
    rows = m // _LANES
    if fold is not None:
        T_f, n_real = fold
        assert m % T_f == 0 and n_pad % T_f == 0
        n_pad = n_pad // T_f  # local block
        tile_cap = rows // T_f
        assert tile_cap * _LANES * T_f == m
    else:
        tile_cap = rows
    H = n_pad // _LANES
    # interpret mode must be requested EXPLICITLY (solve_fused(interpret=...)
    # / ChunkedDriver(interpret=...)): the sub-8-sublane Mosaic-hang guard
    # only applies to compiled tiles, and sniffing a global
    # force_tpu_interpret_mode() context would need private jax internals
    tile_rows = _pick_tile_rows(tile_cap, K, H, require8=not interpret)
    if tile_rows == 0:
        raise ValueError(
            f"bucket (K={K}, m={m}, n_pad={n_pad}) has no TPU-legal tile "
            "under the VMEM budget (compiled tiles must be 8-sublane "
            "aligned); compile with pad_pools_to=1024 or use the classic "
            "path for this bucket shape"
        )
    grid = (rows // tile_rows,)
    tpp = tile_cap // tile_rows  # tiles per point (fold)

    def chan(a):
        return a.reshape(rows, _LANES)

    inputs = []
    for arr in (sD, sL):
        inputs.extend(chan(arr[c]) for c in range(K))
    inputs.extend(chan(arrs["asset"][c]) for c in range(K))
    for key in ("R", "w", "s", "mask"):
        inputs.extend(chan(arrs[key][c]) for c in range(K))
    inputs.extend([chan(arrs["gamma"]), chan(arrs["logk0"]), chan(arrs["k0"])])
    inputs.append(v.reshape(-1, _LANES))

    block = pl.BlockSpec(
        (tile_rows, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    if fold is None:
        vec_block = pl.BlockSpec(
            (H, _LANES), lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        y_rows = H
    else:
        vec_block = pl.BlockSpec(
            (H, _LANES), lambda i, _tpp=tpp: (i // _tpp, 0),
            memory_space=pltpu.VMEM,
        )
        y_rows = T_f * H
    in_specs = [block] * (7 * K + 3) + [vec_block]
    out_specs = [block] * (4 * K) + [vec_block]
    out_shape = [jax.ShapeDtypeStruct((rows, _LANES), sD.dtype)] * (4 * K) + [
        jax.ShapeDtypeStruct((y_rows, _LANES), sD.dtype)
    ]

    kernel = functools.partial(
        _fused_kernel, K, kind, needs_floor, cfg, alpha, H,
        fold=None if fold is None else (tpp, n_real),
    )

    def kfn(*refs):
        kernel(refs)

    E = K * m
    steps = cfg.n_bisect + cfg.n_polish
    out = pl.pallas_call(
        kfn,
        out_shape=out_shape,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * E * n_pad + 60 * steps * E,
            bytes_accessed=4 * (11 * E + 2 * n_pad),
            transcendentals=(steps + 2) * E,
        ),
    )(*inputs)

    sDn = jnp.stack([out[c].reshape(m) for c in range(K)])
    sLn = jnp.stack([out[K + c].reshape(m) for c in range(K)])
    D = jnp.stack([out[2 * K + c].reshape(m) for c in range(K)])
    L = jnp.stack([out[3 * K + c].reshape(m) for c in range(K)])
    y = out[4 * K].reshape(-1)  # fold: (T*n_pad_local,) per-point layout
    return sDn, sLn, D, L, y


# ---- fused DELTA iteration: projection onto SHIFTED trading sets ----------
# The refinement stage (solver/refine_device.py) used to run on the classic
# XLA path only (~44% of the fused throughput at 100k pools — the round-4
# headline's single largest cost).  These kernels run the SAME fused
# iteration against the re-centered sets of ops/projection_delta.py: the
# deferred-broadcast identity z = s +/- wdef_e is unchanged (the base-dual
# plane nu0e enters only the projection input, never the z-update), so the
# only kernel differences are (i) three extra per-channel planes (X0, aD,
# aL replace R; sS is the scaled shift), (ii) the constant nu0e offset on
# the projection input, and (iii) the log1p/linear delta constraint with
# target nsig.


def _log1p(u):
    """Mosaic has no log1p lowering.  The textbook compensated form
    log(1+u) * u / ((1+u) - 1) is NOT safe under a compiler: XLA
    algebraically simplifies (1+u) - 1 to u, silently degrading it to a
    plain log(1+u) with ~1e-7 ABSOLUTE error — which re-introduces
    exactly the cancellation the delta re-centering exists to remove
    (measured: fused-vs-classic delta trajectory parity degraded from
    1e-5 to 1e-2).  Use an explicit split instead: a 7-term alternating
    series below |u| <= 0.1 (relative error < 1.2e-8, full f32
    precision on O(eps)-sized arguments) and log(1+u) above (no
    cancellation there)."""
    small = jnp.abs(u) <= 0.1
    us = jnp.where(small, u, 0.0)  # keep the series' Horner chain finite
    series = us * (
        1.0
        + us
        * (
            -0.5
            + us
            * (
                1.0 / 3.0
                + us
                * (-0.25 + us * (0.2 + us * (-1.0 / 6.0 + us / 7.0)))
            )
        )
    )
    big = jnp.log(jnp.maximum(1.0 + u, jnp.float32(1e-30)))
    return jnp.where(small, series, big)


def _eval_gm_delta_channels(mu, ch, gamma, needs_floor):
    """Delta geo-mean channel evaluation (projection_delta._eval_gm_delta
    unrolled over slot channels; all (rows, 128) blocks)."""
    h = None
    As, Bs = [], []
    for (p, q, X0, w, sS, aD, aL, mask) in ch:
        t = mu * w
        xi, theta = _inner_gm_delta(p, q, X0, gamma, t, aD, aL)
        if needs_floor:
            clamped = xi < sS
            thf = _solve_theta_linear_delta(p, q, X0, gamma, sS, aD, aL)
            theta = jnp.where(clamped, jnp.maximum(thf, theta), theta)
        a, b = _ab_from_theta(p, q, gamma, theta, aD, aL)
        a = a * mask
        b = b * mask
        v = gamma * a - b
        u = v / X0
        term = w * _log1p(jnp.maximum(u, jnp.float32(-0.999999))) * mask
        h = term if h is None else h + term
        As.append(a)
        Bs.append(b)
    return As, Bs, h


def _eval_cs_delta_channels(mu, ch, gamma):
    """Delta (weighted) constant-sum channels: theta = mu * q_j, reserve
    floor X0 + v >= 0 clamped in closed form (projection_delta
    ``_eval_cs_delta``)."""
    h = None
    As, Bs = [], []
    for (p, q, X0, w, sS, aD, aL, mask) in ch:
        theta = mu * w
        a, b = _ab_from_theta(p, q, gamma, theta, aD, aL)
        clamped = (X0 + gamma * a - b) < 0.0
        thf = _solve_theta_linear_delta(
            p, q, X0, gamma, jnp.zeros_like(X0), aD, aL
        )
        theta = jnp.where(clamped, jnp.maximum(thf, theta), theta)
        a, b = _ab_from_theta(p, q, gamma, theta, aD, aL)
        a = a * mask
        b = b * mask
        term = w * (gamma * a - b) * mask
        h = term if h is None else h + term
        As.append(a)
        Bs.append(b)
    return As, Bs, h


def _gm_delta_bracket_ch(ch, gamma, nsig):
    """Channel form of projection_delta._gm_delta_bracket."""
    margin = jnp.float32(1e-3)
    # jnp.expm1 has no Mosaic lowering; plain exp-1 is fine here (the
    # bracket only needs an upper bound and carries its own +margin)
    vfac = jnp.exp(_relu(nsig)) - 1.0
    mu_hi = None
    for (p, q, X0, w, sS, aD, aL, mask) in ch:
        vreq = X0 * vfac + margin
        th_v = (vreq + aL - gamma * p) / (gamma * gamma)
        th_req = _relu(jnp.maximum(q - aL, th_v)) + margin
        a_at = jnp.maximum(p + gamma * th_req, aD)
        M = X0 + gamma * jnp.abs(a_at) + jnp.abs(aL) + 1.0
        t_req = 2.0 * th_req * M
        w_safe = jnp.where(mask > 0, w, 1.0)
        cand = jnp.where(mask > 0, t_req / w_safe, 0.0)
        mu_hi = cand if mu_hi is None else jnp.maximum(mu_hi, cand)
    return mu_hi + 1.0


def _cs_delta_bracket_ch(ch, gamma, nsig):
    margin = jnp.float32(1e-3)
    mu_hi = None
    for (p, q, X0, w, sS, aD, aL, mask) in ch:
        w_safe = jnp.where(mask > 0, w, 1.0)
        vreq = _relu(nsig) / w_safe + margin
        th_v = (vreq + aL - gamma * p) / (gamma * gamma)
        th_req = _relu(jnp.maximum(q - aL, th_v)) + margin
        cand = jnp.where(mask > 0, th_req / w_safe, 0.0)
        mu_hi = cand if mu_hi is None else jnp.maximum(mu_hi, cand)
    return mu_hi + 1.0


def _fused_delta_kernel(K, kind, needs_floor, cfg, alpha, H, refs, fold=None):
    """refs in: sD_c[K], sL_c[K], ids_c[K], X0_c[K], w_c[K], sS_c[K],
    aD_c[K], aL_c[K], mask_c[K], nu0e_c[K], gamma, nsig, v2d(H,128)
    out: sD'_c[K], sL'_c[K], A_c[K], B_c[K], y2d(H,128)

    ``fold=(tiles_per_point, n_real)``: block-diagonal scenario folding
    — localize ids per tile and exchange against the tile's own point
    block (see ``_fused_kernel``)."""
    nin = 10 * K + 3
    ins, outs = refs[:nin], refs[nin:]
    sD = [ins[c][:] for c in range(K)]
    sL = [ins[K + c][:] for c in range(K)]
    IDS = [ins[2 * K + c][:] for c in range(K)]
    if fold is not None:
        tpp, n_real = fold
        t_idx = jax.lax.div(pl.program_id(0), jnp.int32(tpp))
        IDS = [ids - t_idx * jnp.int32(n_real) for ids in IDS]
    X0 = [ins[3 * K + c][:] for c in range(K)]
    W = [ins[4 * K + c][:] for c in range(K)]
    SS = [ins[5 * K + c][:] for c in range(K)]
    AD = [ins[6 * K + c][:] for c in range(K)]
    AL = [ins[7 * K + c][:] for c in range(K)]
    M = [ins[8 * K + c][:] for c in range(K)]
    NU0E = [ins[9 * K + c][:] for c in range(K)]
    gamma = ins[10 * K][:]
    nsig = ins[10 * K + 1][:]
    v2d = ins[10 * K + 2][:]

    rows, lanes = sD[0].shape
    T = rows * lanes
    a_rel = jnp.float32(alpha)

    radix = []
    P, Q = [], []
    for c in range(K):
        ids_row = IDS[c].reshape(1, T)
        lo_row = jax.lax.rem(ids_row, jnp.int32(_LANES))
        hi_row = jax.lax.div(ids_row, jnp.int32(_LANES))
        oh_lo = (
            jax.lax.broadcasted_iota(jnp.int32, (_LANES, T), 0) == lo_row
        ).astype(jnp.float32)
        oh_hi = (
            jax.lax.broadcasted_iota(jnp.int32, (H, T), 0) == hi_row
        ).astype(jnp.float32)
        radix.append((oh_lo, oh_hi))
        Mrow = jax.lax.dot_general(
            v2d, oh_lo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        ve = jnp.sum(oh_hi * Mrow, axis=0, keepdims=True)
        ve = ve.reshape(rows, lanes) * M[c]
        # projection input: zD - (nu0e + dnu_e) = sD + (wdef - dnu)_e - nu0e
        # (nu0e is pre-masked at build; see refine_device.delta_buckets)
        off = ve - NU0E[c]
        P.append(sD[c] + off)
        Q.append(sL[c] - off)

    ch = [
        (P[c], Q[c], X0[c], W[c], SS[c], AD[c], AL[c], M[c]) for c in range(K)
    ]
    if kind == "gm":
        mu_hi = _gm_delta_bracket_ch(ch, gamma, nsig)

        def h_of_mu(mu):
            return _eval_gm_delta_channels(mu, ch, gamma, needs_floor)[2]

        mu = _root_find_body(h_of_mu, mu_hi, nsig, cfg)
        As, Bs, _ = _eval_gm_delta_channels(mu, ch, gamma, needs_floor)
    else:
        mu_hi = _cs_delta_bracket_ch(ch, gamma, nsig)

        def h_of_mu(mu):
            return _eval_cs_delta_channels(mu, ch, gamma)[2]

        mu = _root_find_body(h_of_mu, mu_hi, nsig, cfg)
        As, Bs, _ = _eval_cs_delta_channels(mu, ch, gamma)

    y_ref = outs[4 * K]
    if fold is None:
        first_tile = pl.program_id(0) == 0
    else:
        first_tile = jax.lax.rem(pl.program_id(0), jnp.int32(fold[0])) == 0

    @pl.when(first_tile)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    y_acc = jnp.zeros((H, _LANES), jnp.float32)
    for c in range(K):
        A, B = As[c], Bs[c]
        outs[c][:] = a_rel * A + (1.0 - a_rel) * sD[c]
        outs[K + c][:] = a_rel * B + (1.0 - a_rel) * sL[c]
        outs[2 * K + c][:] = A
        outs[3 * K + c][:] = B
        val = a_rel * (B - A) + (1.0 - a_rel) * (sL[c] - sD[c])
        oh_lo, oh_hi = radix[c]
        G = oh_hi * val.reshape(1, T)
        y_acc = y_acc + jax.lax.dot_general(
            G, oh_lo, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    y_ref[:] += y_acc


def fused_step_delta(
    sD, sL, v, arrs, kind, needs_floor,
    alpha: float,
    cfg: ProjectionConfig = ProjectionConfig(),
    interpret: bool = False,
    fold=None,
):
    """One fused half-iteration for one DELTA bucket (refinement stage).

    sD/sL: (K, m) delta state planes;  v: (n_pad,) combined broadcast
    vector (wdef - dnu, zero-padded);  arrs: a delta bucket dict from
    ``DeltaAdmmSolver.delta_buckets`` (X0/w/sS/aD/aL/mask/gamma/nsig and,
    on the precise path, the pre-broadcast base-dual plane nu0e).
    Returns (sD', sL', a, b, y_partial(n_pad,)).

    ``fold=(T, n_real)``: block-diagonal scenario folding (see
    :func:`fused_step`) — v and y use the (T * n_pad_local,) per-point
    padded layout.
    """
    K, m = sD.shape
    assert m % _LANES == 0, f"pool count {m} must be a multiple of {_LANES}"
    n_pad = v.shape[0]
    assert n_pad % _LANES == 0
    rows = m // _LANES
    if fold is not None:
        T_f, n_real = fold
        assert m % T_f == 0 and n_pad % T_f == 0
        n_pad = n_pad // T_f
        tile_cap = rows // T_f
    else:
        tile_cap = rows
    H = n_pad // _LANES
    tile_rows = _pick_tile_rows(
        tile_cap, K, H, require8=not interpret, temps=40
    )
    if tile_rows == 0:
        raise ValueError(
            f"delta bucket (K={K}, m={m}, n_pad={n_pad}) has no TPU-legal "
            "tile under the VMEM budget; compile with pad_pools_to=1024 "
            "or use the classic path for this bucket shape"
        )
    grid = (rows // tile_rows,)
    tpp = tile_cap // tile_rows

    def chan(a):
        return a.reshape(rows, _LANES)

    nu0e = arrs.get("nu0e")
    if nu0e is None:
        nu0e = jnp.zeros_like(arrs["mask"])
    inputs = []
    for arr in (sD, sL):
        inputs.extend(chan(arr[c]) for c in range(K))
    inputs.extend(chan(arrs["asset"][c]) for c in range(K))
    for plane in (
        arrs["X0"], arrs["w"], arrs["sS"], arrs["aD"], arrs["aL"],
        arrs["mask"], nu0e,
    ):
        inputs.extend(chan(plane[c]) for c in range(K))
    inputs.extend([chan(arrs["gamma"]), chan(arrs["nsig"])])
    inputs.append(v.reshape(-1, _LANES))

    block = pl.BlockSpec(
        (tile_rows, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    if fold is None:
        vec_block = pl.BlockSpec(
            (H, _LANES), lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        y_rows = H
    else:
        vec_block = pl.BlockSpec(
            (H, _LANES), lambda i, _tpp=tpp: (i // _tpp, 0),
            memory_space=pltpu.VMEM,
        )
        y_rows = T_f * H
    in_specs = [block] * (10 * K + 2) + [vec_block]
    out_specs = [block] * (4 * K) + [vec_block]
    out_shape = [jax.ShapeDtypeStruct((rows, _LANES), sD.dtype)] * (4 * K) + [
        jax.ShapeDtypeStruct((y_rows, _LANES), sD.dtype)
    ]

    kernel = functools.partial(
        _fused_delta_kernel, K, kind, needs_floor, cfg, alpha, H,
        fold=None if fold is None else (tpp, n_real),
    )

    def kfn(*refs):
        kernel(refs)

    E = K * m
    steps = cfg.n_bisect + cfg.n_polish
    out = pl.pallas_call(
        kfn,
        out_shape=out_shape,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * E * n_pad + 80 * steps * E,
            bytes_accessed=4 * (14 * E + 2 * n_pad),
            transcendentals=(steps + 2) * E,
        ),
    )(*inputs)

    sDn = jnp.stack([out[c].reshape(m) for c in range(K)])
    sLn = jnp.stack([out[K + c].reshape(m) for c in range(K)])
    A = jnp.stack([out[2 * K + c].reshape(m) for c in range(K)])
    B = jnp.stack([out[3 * K + c].reshape(m) for c in range(K)])
    y = out[4 * K].reshape(-1)  # fold: (T*n_pad_local,) per-point layout
    return sDn, sLn, A, B, y


# ---- ONE launch per K-group: per-tile bucket dispatch ----------------------
# Round-4 measured the fused floor (~0.29 ms/iter at zero root-find trips)
# as kernel-launch/pipeline-bound across 5 bucket launches.  This kernel
# merges every same-channel-count bucket into ONE pallas_call whose grid
# spans the concatenated pool axis; a scalar-prefetch table assigns each
# tile its bucket class (0: gm, 1: floored gm, 2: cs) and `pl.when`
# branches run the fully-specialized projection for that tile — distinct
# from the round-4 arithmetic gm-bucket merge (measured negative: the
# floor-clamp VPU cost ran on every pool), here a tile pays only its own
# class's arithmetic.  5 launches/iteration become 2 at the 100k bench
# shape (K=2: gm2+gm2f+cs2f, K=4: gm4+cs4f).


def _merged_kernel(K, cfg, alpha, H, refs):
    """refs in: bid_ref(SMEM), sD_c[K], sL_c[K], ids_c[K], R_c[K], w_c[K],
    sh_c[K], mask_c[K], gamma, logk0, k0, v2d(H,128)
    out: sD'_c[K], sL'_c[K], D_c[K], L_c[K], y2d(H,128)"""
    bid_ref = refs[0]
    nin = 7 * K + 4
    ins, outs = refs[1:1 + nin], refs[1 + nin:]
    sD = [ins[c][:] for c in range(K)]
    sL = [ins[K + c][:] for c in range(K)]
    IDS = [ins[2 * K + c][:] for c in range(K)]
    R = [ins[3 * K + c][:] for c in range(K)]
    W = [ins[4 * K + c][:] for c in range(K)]
    SH = [ins[5 * K + c][:] for c in range(K)]
    M = [ins[6 * K + c][:] for c in range(K)]
    gamma = ins[7 * K][:]
    logk0 = ins[7 * K + 1][:]
    k0 = ins[7 * K + 2][:]
    v2d = ins[7 * K + 3][:]

    rows, lanes = sD[0].shape
    T = rows * lanes
    a = jnp.float32(alpha)
    bid = bid_ref[pl.program_id(0)]

    radix = []
    P, Q = [], []
    for c in range(K):
        ids_row = IDS[c].reshape(1, T)
        lo_row = jax.lax.rem(ids_row, jnp.int32(_LANES))
        hi_row = jax.lax.div(ids_row, jnp.int32(_LANES))
        oh_lo = (
            jax.lax.broadcasted_iota(jnp.int32, (_LANES, T), 0) == lo_row
        ).astype(jnp.float32)
        oh_hi = (
            jax.lax.broadcasted_iota(jnp.int32, (H, T), 0) == hi_row
        ).astype(jnp.float32)
        radix.append((oh_lo, oh_hi))
        Mrow = jax.lax.dot_general(
            v2d, oh_lo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        ve = jnp.sum(oh_hi * Mrow, axis=0, keepdims=True)
        ve = ve.reshape(rows, lanes) * M[c]
        P.append(sD[c] + ve)
        Q.append(sL[c] - ve)

    y_ref = outs[4 * K]

    @pl.when(pl.program_id(0) == 0)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    def emit(Ds, Ls):
        y_acc = jnp.zeros((H, _LANES), jnp.float32)
        for c in range(K):
            D, L = Ds[c], Ls[c]
            outs[c][:] = a * D + (1.0 - a) * sD[c]
            outs[K + c][:] = a * L + (1.0 - a) * sL[c]
            outs[2 * K + c][:] = D
            outs[3 * K + c][:] = L
            val = a * (L - D) + (1.0 - a) * (sL[c] - sD[c])
            oh_lo, oh_hi = radix[c]
            G = oh_hi * val.reshape(1, T)
            y_acc = y_acc + jax.lax.dot_general(
                G, oh_lo, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        y_ref[:] += y_acc

    def gm_body(needs_floor):
        ch = [(P[c], Q[c], R[c] + SH[c], W[c], SH[c], M[c]) for c in range(K)]
        mu_hi = _gm_bracket(ch, gamma, k0)

        def h_of_mu(mu):
            return _eval_gm_channels(mu, ch, gamma, k0, needs_floor)[2]

        mu = _root_find_body(h_of_mu, mu_hi, logk0, cfg)
        Ds, Ls, _ = _eval_gm_channels(mu, ch, gamma, k0, needs_floor)
        emit(Ds, Ls)

    @pl.when(bid == 0)
    def _():
        gm_body(False)

    @pl.when(bid == 1)
    def _():
        gm_body(True)

    @pl.when(bid == 2)
    def _():
        ch = [(P[c], Q[c], R[c], W[c], SH[c], M[c]) for c in range(K)]
        mu_hi = None
        for (p, q, R_, w, s, mask) in ch:
            w_safe = jnp.where(mask > 0, w, 1.0)
            cand = _relu(q) * mask / w_safe
            mu_hi = cand if mu_hi is None else jnp.maximum(mu_hi, cand)
        mu_hi = mu_hi + 1.0

        def h_of_mu(mu):
            return _eval_cs_channels(mu, ch, gamma, k0)[2]

        mu = _root_find_body(h_of_mu, mu_hi, k0, cfg)
        Ds, Ls, _ = _eval_cs_channels(mu, ch, gamma, k0)
        emit(Ds, Ls)


def fused_step_merged(
    sD, sL, v, g, tile_rows: int,
    alpha: float,
    cfg: ProjectionConfig = ProjectionConfig(),
    interpret: bool = False,
):
    """One fused half-iteration for one MERGED K-group.

    ``g``: the group dict from ``AdmmSolver._merged_groups`` — the usual
    per-bucket planes concatenated along the pool axis plus ``bid``, the
    int32 per-tile bucket-class table (scalar-prefetched into SMEM).
    ``tile_rows`` is the group's static tile extent (must divide every
    member bucket's row count so no tile straddles a bucket boundary).
    Returns (sD', sL', D, L, y_partial(n_pad,)).
    """
    K, m = sD.shape
    assert m % (_LANES * tile_rows) == 0
    n_pad = v.shape[0]
    H = n_pad // _LANES
    rows = m // _LANES
    grid = (rows // tile_rows,)

    def chan(a):
        return a.reshape(rows, _LANES)

    inputs = []
    for arr in (sD, sL):
        inputs.extend(chan(arr[c]) for c in range(K))
    inputs.extend(chan(g["asset"][c]) for c in range(K))
    for key in ("R", "w", "s", "mask"):
        inputs.extend(chan(g[key][c]) for c in range(K))
    inputs.extend([chan(g["gamma"]), chan(g["logk0"]), chan(g["k0"])])
    inputs.append(v.reshape(H, _LANES))

    # with scalar prefetch, every index_map takes (i, scalar_ref)
    block = pl.BlockSpec(
        (tile_rows, _LANES), lambda i, b: (i, 0), memory_space=pltpu.VMEM
    )
    vec_block = pl.BlockSpec(
        (H, _LANES), lambda i, b: (0, 0), memory_space=pltpu.VMEM
    )
    in_specs = [block] * (7 * K + 3) + [vec_block]
    out_specs = [block] * (4 * K) + [vec_block]
    out_shape = [jax.ShapeDtypeStruct((rows, _LANES), sD.dtype)] * (4 * K) + [
        jax.ShapeDtypeStruct((H, _LANES), sD.dtype)
    ]

    kernel = functools.partial(_merged_kernel, K, cfg, alpha, H)

    def kfn(*refs):
        kernel(refs)

    E = K * m
    steps = cfg.n_bisect + cfg.n_polish
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
    )
    out = pl.pallas_call(
        kfn,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * E * n_pad + 60 * steps * E,
            bytes_accessed=4 * (11 * E + 2 * n_pad),
            transcendentals=(steps + 2) * E,
        ),
    )(g["bid"], *inputs)

    sDn = jnp.stack([out[c].reshape(m) for c in range(K)])
    sLn = jnp.stack([out[K + c].reshape(m) for c in range(K)])
    D = jnp.stack([out[2 * K + c].reshape(m) for c in range(K)])
    L = jnp.stack([out[3 * K + c].reshape(m) for c in range(K)])
    y = out[4 * K].reshape(n_pad)
    return sDn, sLn, D, L, y
