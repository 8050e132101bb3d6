"""Problem compiler: declarative pool specs -> padded device-ready buckets.

This replaces the reference's dense one-hot ``A_i`` matrices
(``/root/reference/arbitrage.py:42-48``, rebuilt per-sweep-iteration at
``two-asset.py:51-57``) with flat int32 scatter indices, and its per-pool
Python lists of cvxpy variables with *bucketed, padded* dense arrays:

  * pools are grouped by (kind, padded width K) so every bucket is one
    rectangular ``(m, K)`` array family — static shapes, MXU/VPU-tileable,
    no ragged structure anywhere on device;
  * padding slots point at a dummy asset row ``n`` (dropped after
    segment-sum) and carry zero weight, so they are exact no-ops;
  * the per-asset *degree* d_j (# pool slots touching asset j) is
    precomputed — it is the diagonal metric of the closed-form consensus
    z-update in the ADMM (see ``solver/admm.py``).

Everything here runs once per problem on host (numpy); the output arrays
are what jit/pjit trace over.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence, Tuple

import numpy as np

from ..models.pools import Pool

__all__ = ["ProblemSpec", "Bucket", "CompiledProblem", "compile_spec"]


def _next_pow2(k: int) -> int:
    p = 1
    while p < k:
        p *= 2
    return p


@dataclasses.dataclass(frozen=True)
class ProblemSpec:
    """A routing problem: ``n_assets`` global tokens + a list of pools."""

    n_assets: int
    pools: Tuple[Pool, ...]

    def __init__(self, n_assets: int, pools: Sequence[Pool]):
        object.__setattr__(self, "n_assets", int(n_assets))
        object.__setattr__(self, "pools", tuple(pools))
        for p in self.pools:
            if max(p.assets) >= self.n_assets:
                raise ValueError(
                    f"pool references asset {max(p.assets)} but n_assets={n_assets}"
                )


@dataclasses.dataclass
class Bucket:
    """All pools of one (kind, padded-width) class, padded to (m, K).

    Arrays (numpy, float64 master copies; cast to the solve dtype when moved
    to device):

      reserves  (m, K)  current reserves R (0 in padding)
      weights   (m, K)  normalized phi weights, sum_j w = 1 per pool
                        (0 in padding; for 'cs' this is the slot mask)
      shift     (m, K)  virtual-reserve offsets (0 unless bounded pools)
      gamma     (m, 1)  fee multipliers
      logk0     (m,)    'gm': sum_j w_j*log(R_j+s_j)   'cs': unused
      k0        (m,)    'cs': sum_j R_j                'gm': exp(logk0)
      mask      (m, K)  1.0 on real slots, 0.0 on padding
      asset     (m, K)  int32 global asset index (== n_assets on padding)
    """

    kind: str  # 'gm' | 'cs'
    width: int  # K (padded)
    reserves: np.ndarray
    weights: np.ndarray
    shift: np.ndarray
    gamma: np.ndarray
    logk0: np.ndarray
    k0: np.ndarray
    mask: np.ndarray
    asset: np.ndarray
    pool_ids: np.ndarray  # (m,) index into spec.pools
    needs_floor: bool  # enforce R+ >= 0 inside the projection

    @property
    def m(self) -> int:
        return self.reserves.shape[0]


@dataclasses.dataclass
class CompiledProblem:
    """Device-ready problem: buckets + per-asset degree + bookkeeping."""

    n_assets: int
    buckets: Dict[str, Bucket]
    degree: np.ndarray  # (n,) float — # real slots touching each asset
    n_pools: int
    n_slots: int  # total real (pool, asset) slots = sum of widths
    spec: ProblemSpec

    def bucket_names(self) -> List[str]:
        return sorted(self.buckets.keys())


def compile_spec(
    spec: ProblemSpec, pad_pow2: bool = True, pad_pools_to: int = 1
) -> CompiledProblem:
    """Lower a :class:`ProblemSpec` into bucketed padded arrays.

    ``pad_pools_to``: round each bucket's pool count up to a multiple (so
    the pool axis divides a device mesh).  Padding pools are inert: fully
    masked, zero weights, unit reserves, dummy asset index — their
    projection is the identity at the origin and they scatter nothing.
    """
    n = spec.n_assets
    groups: Dict[Tuple[str, int, bool], List[int]] = {}
    for pid, pool in enumerate(spec.pools):
        k = pool.width
        K = max(2, _next_pow2(k)) if pad_pow2 else max(2, k)
        key = (pool.kind, K, pool.needs_reserve_floor)
        groups.setdefault(key, []).append(pid)

    buckets: Dict[str, Bucket] = {}
    degree = np.zeros(n, dtype=np.float64)
    n_slots = 0
    for (kind, K, floor), pids in sorted(groups.items()):
        m_real = len(pids)
        m = -(-m_real // pad_pools_to) * pad_pools_to
        R = np.zeros((m, K))
        W = np.zeros((m, K))
        S = np.zeros((m, K))
        G = np.ones((m, 1))
        mask = np.zeros((m, K))
        asset = np.full((m, K), n, dtype=np.int32)
        for r, pid in enumerate(pids):
            pool = spec.pools[pid]
            k = pool.width
            R[r, :k] = pool.reserves
            S[r, :k] = pool.shift
            G[r, 0] = pool.fee
            mask[r, :k] = 1.0
            asset[r, :k] = pool.assets
            if kind == "gm":
                W[r, :k] = pool.weights
            else:  # 'cs' — uniform mask weights (only used as slot mask)
                W[r, :k] = 1.0
            for a in pool.assets:
                degree[a] += 1.0
            n_slots += k
        if kind == "gm":
            # log k0 = sum w log(R + s); padding contributes w=0 * log(1)=0.
            safe = np.where(mask > 0, R + S, 1.0)
            logk0 = np.sum(W * np.log(safe), axis=1)
            k0 = np.exp(logk0)
        else:
            logk0 = np.zeros(m)
            k0 = np.sum(R * mask, axis=1)
        name = f"{kind}{K}{'f' if floor else ''}"
        buckets[name] = Bucket(
            kind=kind,
            width=K,
            reserves=R,
            weights=W,
            shift=S,
            gamma=G,
            logk0=logk0,
            k0=k0,
            mask=mask,
            asset=asset,
            pool_ids=np.asarray(pids, dtype=np.int32),
            needs_floor=floor,
        )

    return CompiledProblem(
        n_assets=n,
        buckets=buckets,
        degree=degree,
        n_pools=len(spec.pools),
        n_slots=n_slots,
        spec=spec,
    )
