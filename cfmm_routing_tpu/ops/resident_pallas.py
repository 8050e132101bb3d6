"""VMEM-resident multi-iteration ADMM kernel: run a whole block of
iterations — every bucket's projection, the consensus exchange AND the
linear psi-prox — inside ONE Pallas launch.

Why: at small/medium network sizes the fused per-bucket kernel
(ops/iteration_pallas.py) is launch-bound — a 1k-pool network runs ~5
kernel launches plus XLA glue per iteration, so a 750-iteration solve
pays ~4000 dispatches for microseconds of math each.  Here the ENTIRE
solver state (all buckets' z-planes, the consensus vectors, the problem
data) lives in VMEM for the whole block:

    launch -> fori_loop over T iterations:
        per bucket group: nu broadcast (radix) -> projection root-find
                          -> over-relaxed w_hat -> radix reduce into y
        consensus: s = y - 2*deg*nu;  psi = clip(s + (2/rho) deg c);
                   mu = (psi - s) / (2 deg)        (linear prox)
        per group: z' = w_hat +- (nu - mu) broadcast;  nu' = mu
    -> write final state

HBM traffic for T iterations is ONE read + ONE write of the state —
~7 planes per slot — instead of T times that; dispatch overhead is one
launch per block instead of ~#buckets per iteration.  The math is the
classic `AdmmSolver._iterate` (without residual bookkeeping), so the
trajectory matches the XLA path to f32 roundoff (tests/test_resident.py).

Scope: linear objectives (the psi-prox closed form), single device,
total VMEM footprint of all buckets under the budget (~30k padded slots
at n<=1024 assets).  Residual harvesting happens outside: the driver
runs one classic iteration per block, exactly like the fused path.

Shapes: every bucket's pool count m must be a multiple of 128; the
asset dimension is padded to n_pad = ceil(n/128)*128 and carried as
(H, 128) tiles in VMEM.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .projection import ProjectionConfig
from .projection_pallas import (
    _eval_cs_channels,
    _eval_gm_channels,
    _root_find_body,
    _relu,
)
from .iteration_pallas import _gm_bracket

__all__ = ["resident_block", "resident_vmem_bytes"]

_LANES = 128
# conservative budget for the persistent state + transients (16 MB scoped)
_VMEM_BUDGET = 6 << 20


def resident_vmem_bytes(groups, n_pad: int) -> int:
    """Rough persistent-footprint model: 7 data planes + 2 z planes +
    4 out planes per (channel, slot) + the (H,128) vectors + per-channel
    one-hot transients (built once per iteration, peak counted once)."""
    H = n_pad // _LANES
    total = 8 * n_pad * 4  # nu/psi/y/deg/c/lo/hi/scratch vectors
    peak_oh = 0
    for (kind, floor, K, m) in groups:
        total += (7 * K + 3) * m * 4 + 4 * K * m * 4
        peak_oh = max(peak_oh, K * (128 + 2 * max(H, 8)) * m * 4 // _LANES)
    return total + peak_oh


def _bcast(nu2d, oh_lo, oh_hi, rows):
    """v_e[t] = nu2d[hi_t, lo_t] via the radix one-hots (MXU)."""
    M = jax.lax.dot_general(
        nu2d, oh_lo, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (H, T)
    ve = jnp.sum(oh_hi * M, axis=0, keepdims=True)
    return ve.reshape(rows, _LANES)


def _reduce(val, oh_lo, oh_hi, T):
    """y2d[h, l] += sum_t val[t] * [hi_t == h][lo_t == l] (MXU)."""
    G = oh_hi * val.reshape(1, T)
    return jax.lax.dot_general(
        G, oh_lo, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _resident_kernel(groups, H, T_iters, alpha, cfg, refs):
    """groups: tuple of (kind, needs_floor, K, m).  refs layout:

    in:  per group: zD_c[K], zL_c[K], ids_c[K], R_c[K], w_c[K], s_c[K],
         mask_c[K]  (each (rows, 128));  then gamma, logk0, k0 (rows,128)
         per group;  then nu2d, deg2d, c2d, lo2d, hi2d (H, 128);
         rho (1,1) SMEM.
    out: per group: zD'_c[K], zL'_c[K], D_c[K], L_c[K];  nu2d', psi2d'.
    """
    a = jnp.float32(alpha)
    n_in_per_group = [7 * K for (_, _, K, _) in groups]
    off = 0
    gin = []
    for gi, (kind, floor, K, m) in enumerate(groups):
        gin.append(refs[off : off + 7 * K])
        off += 7 * K
    gvec = []
    for gi in range(len(groups)):
        gvec.append(refs[off : off + 3])
        off += 3
    nu_ref = refs[off]
    deg_ref = refs[off + 1]
    c_ref = refs[off + 2]
    lo_ref = refs[off + 3]
    hi_ref = refs[off + 4]
    rho_ref = refs[off + 5]
    outs = refs[off + 6 :]

    deg2d = deg_ref[:]
    c2d = c_ref[:]
    lo2d = lo_ref[:]
    hi2d = hi_ref[:]
    rho = rho_ref[0, 0]
    deg_safe = jnp.maximum(deg2d, 1.0)

    # static per-group data reads + radix one-hots (loop-invariant)
    gdata = []
    for gi, (kind, floor, K, m) in enumerate(groups):
        rows = m // _LANES
        T = rows * _LANES
        ins = gin[gi]
        IDS = [ins[2 * K + c][:] for c in range(K)]
        R = [ins[3 * K + c][:] for c in range(K)]
        W = [ins[4 * K + c][:] for c in range(K)]
        SH = [ins[5 * K + c][:] for c in range(K)]
        M = [ins[6 * K + c][:] for c in range(K)]
        gamma = gvec[gi][0][:]
        logk0 = gvec[gi][1][:]
        k0 = gvec[gi][2][:]
        ohs = []
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
            ohs.append((oh_lo, oh_hi))
        gdata.append((R, W, SH, M, gamma, logk0, k0, ohs, rows, T))

    def one_iteration(carry):
        zs, nu2d = carry  # zs: tuple of (zD list, zL list) per group
        y2d = jnp.zeros((H, _LANES), jnp.float32)
        what_all = []
        for gi, (kind, floor, K, m) in enumerate(groups):
            R, W, SH, M, gamma, logk0, k0, ohs, rows, T = gdata[gi]
            zD, zL = zs[gi]
            P, Q = [], []
            for c in range(K):
                oh_lo, oh_hi = ohs[c]
                ve = _bcast(nu2d, oh_lo, oh_hi, rows) * M[c]
                P.append(zD[c] - ve)
                Q.append(zL[c] + ve)
            if kind == "gm":
                ch = [
                    (P[c], Q[c], R[c] + SH[c], W[c], SH[c], M[c])
                    for c in range(K)
                ]
                mu_hi = _gm_bracket(ch, gamma, k0)

                def h_of_mu(mu, ch=ch, gamma=gamma, k0=k0, floor=floor):
                    return _eval_gm_channels(mu, ch, gamma, k0, floor)[2]

                mu_g = _root_find_body(h_of_mu, mu_hi, logk0, cfg)
                Ds, Ls, _ = _eval_gm_channels(mu_g, ch, gamma, k0, floor)
            else:
                ch = [(P[c], Q[c], R[c], W[c], SH[c], M[c]) for c in range(K)]
                mu_hi = None
                for (p, q, R_, w, s, mask) in ch:
                    w_safe = jnp.where(mask > 0, w, 1.0)
                    cand = _relu(q) * mask / w_safe
                    mu_hi = cand if mu_hi is None else jnp.maximum(mu_hi, cand)
                mu_hi = mu_hi + 1.0

                def h_of_mu(mu, ch=ch, gamma=gamma, k0=k0):
                    return _eval_cs_channels(mu, ch, gamma, k0)[2]

                mu_g = _root_find_body(h_of_mu, mu_hi, k0, cfg)
                Ds, Ls, _ = _eval_cs_channels(mu_g, ch, gamma, k0)

            what = []
            for c in range(K):
                oh_lo, oh_hi = ohs[c]
                hD = a * Ds[c] + (1.0 - a) * zD[c]
                hL = a * Ls[c] + (1.0 - a) * zL[c]
                what.append((hD, hL, Ds[c], Ls[c]))
                y2d = y2d + _reduce((hL - hD).reshape(-1), oh_lo, oh_hi,
                                    gdata[gi][9])
            what_all.append(what)

        # ---- linear consensus prox on the (H, 128) vectors ----------------
        s2d = y2d - 2.0 * deg2d * nu2d
        psi2d = s2d + (2.0 / rho) * deg_safe * c2d
        psi2d = jnp.clip(psi2d, lo2d, hi2d)
        psi2d = jnp.where(deg2d > 0, psi2d, 0.0)
        mu2d = jnp.where(deg2d > 0, (psi2d - s2d) / (2.0 * deg_safe), 0.0)

        dnu2d = nu2d - mu2d
        zs_new = []
        for gi, (kind, floor, K, m) in enumerate(groups):
            R, W, SH, M, gamma, logk0, k0, ohs, rows, T = gdata[gi]
            zDn, zLn = [], []
            for c in range(K):
                oh_lo, oh_hi = ohs[c]
                dmu = _bcast(dnu2d, oh_lo, oh_hi, rows) * M[c]
                hD, hL, D, L = what_all[gi][c]
                zDn.append(hD + dmu)
                zLn.append(hL - dmu)
            zs_new.append((zDn, zLn))
        return (tuple(zs_new), mu2d), (what_all, psi2d)

    # initial state from refs
    zs0 = []
    for gi, (kind, floor, K, m) in enumerate(groups):
        ins = gin[gi]
        zs0.append((
            [ins[c][:] for c in range(K)],
            [ins[K + c][:] for c in range(K)],
        ))
    nu0 = nu_ref[:]

    def body(_, carry):
        new_carry, _aux = one_iteration(carry)
        return new_carry

    zs, nu2d = jax.lax.fori_loop(0, T_iters - 1, body, (tuple(zs0), nu0))
    # final iteration outside the loop so (D, L, psi) can be written out
    (zs, nu2d), (what_all, psi2d) = one_iteration((zs, nu2d))

    off_o = 0
    for gi, (kind, floor, K, m) in enumerate(groups):
        zDn, zLn = zs[gi]
        for c in range(K):
            outs[off_o + c][:] = zDn[c]
            outs[off_o + K + c][:] = zLn[c]
            outs[off_o + 2 * K + c][:] = what_all[gi][c][2]
            outs[off_o + 3 * K + c][:] = what_all[gi][c][3]
        off_o += 4 * K
    outs[off_o][:] = nu2d
    outs[off_o + 1][:] = psi2d


def resident_block(
    z, nu, buckets, meta, degree, c, lo, hi, rho,
    n_iters: int,
    alpha: float,
    cfg: ProjectionConfig = ProjectionConfig(),
    interpret: bool = False,
):
    """Run ``n_iters`` full ADMM iterations in one Pallas launch.

    z: dict name -> (zD, zL) (K, m) planes;  nu: (n,);  buckets: the
    solver's device bucket dict;  meta: name -> (kind, needs_floor);
    degree/c/lo/hi: (n,) vectors;  rho: scalar.
    Returns (z', nu', psi, w) with w the last iteration's projections.
    """
    names = list(buckets.keys())
    n = degree.shape[0]
    n_pad = -(-n // _LANES) * _LANES
    H = n_pad // _LANES

    groups = []
    for name in names:
        arrs = buckets[name]
        K, m = arrs["mask"].shape
        assert m % _LANES == 0, f"bucket {name}: m={m} not lane-aligned"
        kind, floor = meta[name]
        groups.append((kind, floor, K, m))

    budget = resident_vmem_bytes(groups, n_pad)
    if budget > _VMEM_BUDGET:
        raise ValueError(
            f"network too large for the VMEM-resident path: modeled "
            f"footprint {budget >> 20} MB > {_VMEM_BUDGET >> 20} MB — use "
            "solve_fused / ChunkedDriver(fused=True) instead"
        )

    def chan(a2):
        K, m = a2.shape
        return [a2[cc].reshape(m // _LANES, _LANES) for cc in range(K)]

    def vec2d(v, fill=0.0):
        pad = n_pad - v.shape[0]
        vp = jnp.concatenate([v, jnp.full((pad,), fill, v.dtype)])
        return vp.reshape(H, _LANES)

    inputs = []
    in_specs = []
    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    for name in names:
        arrs = buckets[name]
        zD, zL = z[name]
        for planes in (chan(zD), chan(zL), chan(arrs["asset"]),
                       chan(arrs["R"]), chan(arrs["w"]), chan(arrs["s"]),
                       chan(arrs["mask"])):
            for p in planes:
                inputs.append(p)
                in_specs.append(full(p.shape))
    for name in names:
        arrs = buckets[name]
        m = arrs["mask"].shape[1]
        for key in ("gamma", "logk0", "k0"):
            p = arrs[key].reshape(m // _LANES, _LANES)
            inputs.append(p)
            in_specs.append(full(p.shape))
    big = jnp.float32(3e38)
    for v, fill in ((nu, 0.0), (degree, 0.0), (c, 0.0), (lo, -big), (hi, big)):
        p = vec2d(v.astype(jnp.float32), fill)
        inputs.append(p)
        in_specs.append(full(p.shape))
    inputs.append(jnp.asarray(rho, jnp.float32).reshape(1, 1))
    in_specs.append(
        pl.BlockSpec((1, 1), lambda: (0, 0), memory_space=pltpu.SMEM)
    )

    out_shape = []
    for (kind, floor, K, m) in groups:
        out_shape += [
            jax.ShapeDtypeStruct((m // _LANES, _LANES), jnp.float32)
        ] * (4 * K)
    out_shape += [jax.ShapeDtypeStruct((H, _LANES), jnp.float32)] * 2
    out_specs = [full(s.shape) for s in out_shape]

    kernel = functools.partial(
        _resident_kernel, tuple(groups), H, int(n_iters), float(alpha), cfg
    )

    def kfn(*refs):
        kernel(refs)

    E = sum(K * m for (_, _, K, m) in groups)
    steps = cfg.n_bisect + cfg.n_polish
    out = pl.pallas_call(
        kfn,
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(n_iters) * (6 * E * n_pad + 60 * steps * E),
            bytes_accessed=4 * (11 * E + 2 * n_pad),
            transcendentals=int(n_iters) * (steps + 2) * E,
        ),
    )(*inputs)

    z_new = {}
    w_out = {}
    off = 0
    for name, (kind, floor, K, m) in zip(names, groups):
        zD = jnp.stack([out[off + cc].reshape(m) for cc in range(K)])
        zL = jnp.stack([out[off + K + cc].reshape(m) for cc in range(K)])
        D = jnp.stack([out[off + 2 * K + cc].reshape(m) for cc in range(K)])
        L = jnp.stack([out[off + 3 * K + cc].reshape(m) for cc in range(K)])
        z_new[name] = (zD, zL)
        w_out[name] = (D, L)
        off += 4 * K
    nu_new = out[off].reshape(n_pad)[:n]
    psi = out[off + 1].reshape(n_pad)[:n]
    return z_new, nu_new, psi, w_out
