"""Objective / side-constraint specifications over the net trade vector psi.

The reference's three workloads are all "linear utility + box/affine side
constraints on psi":

- arbitrage:   max  m^T psi          s.t. psi >= 0
               (``/root/reference/arbitrage.py:57,77``)
- liquidation: max  psi[k]           s.t. psi[j] == -a[j]  for j != k
               (``liquidation.py:57,77-80``)
- sweep:       max  psi[k]           s.t. psi >= -h
               (``two-asset.py:66,86``)

All three are instances of

    maximize  c^T psi    s.t.  lo <= psi <= hi

with +/-inf entries allowed in the box (an equality is ``lo == hi``).
:class:`Objective` captures exactly this; the ADMM psi-prox
(``ops/prox.py``) solves its diagonally-weighted prox in closed form.

Beyond the linear case, :class:`ConcaveUtility` expresses any *separable*
concave utility over psi from an atom library (linear / quadratic / log /
power) — the problem class the reference's cvxpy layer admits (SURVEY.md §0
"arbitrary concave utilities over net trades") but its three scripts never
exercise.  The ADMM consensus prox stays closed-form per asset
(``ops/prox.py::utility_prox``), so nonlinear utilities cost the same per
iteration as linear ones.
"""
from __future__ import annotations

import dataclasses

import numpy as np

__all__ = ["Objective", "ConcaveUtility"]

_INF = np.inf


@dataclasses.dataclass(frozen=True)
class Objective:
    """maximize c^T psi  subject to  lo <= psi <= hi (entrywise)."""

    c: np.ndarray
    lo: np.ndarray
    hi: np.ndarray

    def __init__(self, c, lo=None, hi=None):
        c = np.asarray(c, dtype=np.float64)
        n = c.shape[-1]
        lo = np.full(n, -_INF) if lo is None else np.asarray(lo, np.float64)
        hi = np.full(n, _INF) if hi is None else np.asarray(hi, np.float64)
        if lo.shape != c.shape or hi.shape != c.shape:
            raise ValueError("c, lo, hi must have identical shapes")
        if np.any(lo > hi):
            raise ValueError("box is empty: lo > hi somewhere")
        object.__setattr__(self, "c", c)
        object.__setattr__(self, "lo", lo)
        object.__setattr__(self, "hi", hi)

    @property
    def n_assets(self) -> int:
        return self.c.shape[-1]

    # ---- constructors mirroring the three reference workloads --------------

    @staticmethod
    def arbitrage(market_values) -> "Objective":
        """max market_value @ psi s.t. psi >= 0 (``arbitrage.py:57,77``)."""
        c = np.asarray(market_values, np.float64)
        return Objective(c, lo=np.zeros_like(c))

    @staticmethod
    def liquidation(n: int, numeraire: int, holdings) -> "Objective":
        """max psi[numeraire] s.t. psi[j] == -holdings[j] for the rest
        (``liquidation.py:57,77-80``)."""
        holdings = np.asarray(holdings, np.float64)
        c = np.zeros(n)
        c[numeraire] = 1.0
        lo = -holdings.copy()
        hi = -holdings.copy()
        lo[numeraire], hi[numeraire] = -_INF, _INF
        return Objective(c, lo, hi)

    @staticmethod
    def trade(n: int, receive: int, holdings) -> "Objective":
        """max psi[receive] s.t. psi >= -holdings (``two-asset.py:66,86``)."""
        holdings = np.asarray(holdings, np.float64)
        c = np.zeros(n)
        c[receive] = 1.0
        return Objective(c, lo=-holdings)


# atom kind codes (must match ops/prox.py)
_LINEAR, _QUAD, _LOG, _POWER = 0, 1, 2, 3
_DOMAIN_EPS = 1e-9  # keep log/power strictly inside their domain


@dataclasses.dataclass(frozen=True)
class ConcaveUtility:
    """Separable concave utility  U(psi) = sum_j U_j(psi_j)  with a box.

    Per-asset atoms (see ``ops/prox.py`` for the prox math):

        linear      U = c * psi
        quadratic   U = c * psi - (a/2) psi^2          (a >= 0)
        log         U = c * log(b + psi)               (c >= 0, psi > -b)
        power       U = (c/p) * (b + psi)^p            (c >= 0, 0 < p < 1)

    Construct with :meth:`linear` / :meth:`from_objective`, then refine
    individual assets with the ``with_*`` methods (each returns a new
    instance).  ``value``/``grad`` give f64 host evaluations (the oracle
    and certification use them); ``pack`` produces the device encoding.
    """

    kind: np.ndarray  # (n,) int32 atom codes
    c: np.ndarray
    a: np.ndarray
    b: np.ndarray
    p: np.ndarray
    lo: np.ndarray
    hi: np.ndarray

    @property
    def n_assets(self) -> int:
        return self.kind.shape[0]

    # ---- constructors -------------------------------------------------------

    @staticmethod
    def linear(c, lo=None, hi=None) -> "ConcaveUtility":
        obj = Objective(c, lo, hi)
        n = obj.n_assets
        z = np.zeros(n)
        return ConcaveUtility(
            kind=np.zeros(n, np.int32), c=obj.c.copy(), a=z.copy(),
            b=z.copy(), p=z.copy(), lo=obj.lo.copy(), hi=obj.hi.copy(),
        )

    @staticmethod
    def from_objective(obj: Objective) -> "ConcaveUtility":
        return ConcaveUtility.linear(obj.c, obj.lo, obj.hi)

    # ---- per-asset refinement (functional setters) --------------------------

    def _replace_at(self, j: int, **fields) -> "ConcaveUtility":
        arrays = {
            name: getattr(self, name).copy()
            for name in ("kind", "c", "a", "b", "p", "lo", "hi")
        }
        for name, v in fields.items():
            arrays[name][j] = v
        out = ConcaveUtility(**arrays)
        out._validate_at(j)
        return out

    def _validate_at(self, j: int):
        k = int(self.kind[j])
        if k in (_LOG, _POWER):
            if self.c[j] < 0:
                raise ValueError("log/power atoms need c >= 0 for concavity")
            # clamp the box into the domain psi >= -b
            dom = -self.b[j] + _DOMAIN_EPS * max(1.0, abs(self.b[j]))
            if self.hi[j] <= dom:
                raise ValueError("box lies outside the log/power domain")
            self.lo[j] = max(self.lo[j], dom)
        if k == _QUAD and self.a[j] < 0:
            raise ValueError("quadratic atom needs a >= 0 for concavity")
        if k == _POWER and not (0.0 < self.p[j] < 1.0):
            raise ValueError("power atom needs 0 < p < 1")

    def with_linear(self, j: int, c: float) -> "ConcaveUtility":
        return self._replace_at(j, kind=_LINEAR, c=c, a=0.0, b=0.0, p=0.0)

    def with_quadratic(self, j: int, c: float, a: float) -> "ConcaveUtility":
        """U_j = c*psi - (a/2)*psi^2 (risk-penalized value)."""
        return self._replace_at(j, kind=_QUAD, c=c, a=a, b=0.0, p=0.0)

    def with_log(self, j: int, c: float, b: float) -> "ConcaveUtility":
        """U_j = c*log(b + psi) (Cobb-Douglas term around holdings b)."""
        return self._replace_at(j, kind=_LOG, c=c, a=0.0, b=b, p=0.0)

    def with_power(self, j: int, c: float, p: float, b: float = 0.0):
        """U_j = (c/p)*(b + psi)^p (CRRA/CES term)."""
        return self._replace_at(j, kind=_POWER, c=c, a=0.0, b=b, p=p)

    def with_box(self, j: int, lo: float, hi: float) -> "ConcaveUtility":
        if lo > hi:
            raise ValueError("empty box")
        return self._replace_at(j, lo=lo, hi=hi)

    # ---- host evaluation (f64; oracle + certification) ----------------------

    def value_vec(self, psi: np.ndarray) -> np.ndarray:
        """Per-asset utility terms U_j(psi_j) (f64)."""
        psi = np.asarray(psi, np.float64)
        y = np.maximum(self.b + psi, 1e-300)
        p_safe = np.where(self.kind == _POWER, np.clip(self.p, 0.01, 0.99), 1.0)
        return np.where(
            self.kind == _LINEAR, self.c * psi,
            np.where(
                self.kind == _QUAD, self.c * psi - 0.5 * self.a * psi * psi,
                np.where(
                    self.kind == _LOG, self.c * np.log(y),
                    (self.c / p_safe) * y**p_safe,
                ),
            ),
        )

    def value(self, psi: np.ndarray) -> float:
        return float(np.sum(self.value_vec(psi)))

    def grad(self, psi: np.ndarray) -> np.ndarray:
        psi = np.asarray(psi, np.float64)
        y = np.maximum(self.b + psi, 1e-300)
        p_safe = np.where(self.kind == _POWER, np.clip(self.p, 0.01, 0.99), 1.0)
        return np.where(
            self.kind == _LINEAR, self.c,
            np.where(
                self.kind == _QUAD, self.c - self.a * psi,
                np.where(
                    self.kind == _LOG, self.c / y,
                    self.c * y ** (p_safe - 1.0),
                ),
            ),
        )

    # ---- device packing ------------------------------------------------------

    def pack(self, dtype):
        """Encode as a :class:`~cfmm_routing_tpu.ops.prox.PackedUtility` of
        device arrays (box clamped to f32-safe finite values and to the
        atom domains)."""
        import jax.numpy as jnp

        from ..ops.prox import PackedUtility

        big = np.finfo(np.float32).max / 4
        dom = np.where(
            (self.kind == _LOG) | (self.kind == _POWER),
            -self.b + _DOMAIN_EPS * np.maximum(1.0, np.abs(self.b)),
            -big,
        )
        lo = np.maximum(np.maximum(self.lo, dom), -big)
        hi = np.minimum(self.hi, big)
        return PackedUtility(
            kind=jnp.asarray(self.kind, jnp.int32),
            c=jnp.asarray(self.c, dtype),
            a=jnp.asarray(self.a, dtype),
            b=jnp.asarray(self.b, dtype),
            p=jnp.asarray(self.p, dtype),
            lo=jnp.asarray(lo, dtype),
            hi=jnp.asarray(np.maximum(hi, lo), dtype),
        )


@dataclasses.dataclass(frozen=True)
class CustomUtility:
    """NON-separable concave utility  U(psi)  given as a JAX-traceable fn.

    Closes the generality gap to the reference's modeling layer: cvxpy
    accepts ANY DCP-concave objective over psi (``arbitrage.py:57`` is
    just the linear instance), not only separable ones.  The consensus
    prox for a non-separable U has no closed form; the solver runs a
    fixed-trip accelerated projected-gradient (strongly-convex FISTA)
    inside each ADMM iteration — the prox objective is the sum of U and
    a diagonal strongly-concave quadratic, so with momentum tuned to
    mu/L the inner loop converges linearly and ~40-80 trips solve it to
    f32 roundoff (see ``ops/prox.py::custom_prox``).

    Parameters
    ----------
    fn : callable(jax array (n,)) -> scalar, concave and differentiable
        on the box (use jnp ops only; it is traced into the jitted solve).
    lo, hi : the box on psi (finite or +-inf per entry).
    smoothness : upper bound on the largest eigenvalue of -Hessian(U)
        over the box (the gradient step size is 1/(smoothness + max_j w_j)).
    prox_iters : inner FISTA trips per ADMM iteration.

    ``value``/``grad`` give f64 host evaluations so the scipy oracle can
    solve the same program for ground truth.  Rigorous certification of a
    custom utility needs its concave conjugate; pass ``conjugate`` (a host
    callable nu -> UPPER bound on sup_psi U(psi) - nu @ psi over the box)
    to enable ``certify`` — without it only residual-based stopping is
    available.
    """

    fn: object
    lo: np.ndarray
    hi: np.ndarray
    smoothness: float
    prox_iters: int = 60
    conjugate: object = None

    def __init__(self, fn, lo, hi, smoothness, prox_iters=60, conjugate=None):
        lo = np.asarray(lo, np.float64)
        hi = np.asarray(hi, np.float64)
        if lo.shape != hi.shape:
            raise ValueError("lo and hi must have identical shapes")
        if np.any(lo > hi):
            raise ValueError("box is empty: lo > hi somewhere")
        if not np.isfinite(smoothness) or smoothness < 0:
            raise ValueError("smoothness must be a finite nonneg bound")
        object.__setattr__(self, "fn", fn)
        object.__setattr__(self, "lo", lo)
        object.__setattr__(self, "hi", hi)
        object.__setattr__(self, "smoothness", float(smoothness))
        object.__setattr__(self, "prox_iters", int(prox_iters))
        object.__setattr__(self, "conjugate", conjugate)

    @property
    def n_assets(self) -> int:
        return self.lo.shape[0]

    def value(self, psi) -> float:
        import jax
        import jax.numpy as jnp

        # scoped x64: without it JAX silently truncates the f64 input to
        # f32 and the host "ground-truth" evaluation carries 1e-7-level
        # noise (matters for 1e-6-class certificate gates)
        with jax.default_device(jax.devices("cpu")[0]):
            with jax.enable_x64():
                return float(
                    self.fn(jnp.asarray(np.asarray(psi, np.float64)))
                )

    def grad(self, psi) -> np.ndarray:
        import jax
        import jax.numpy as jnp

        with jax.default_device(jax.devices("cpu")[0]):
            with jax.enable_x64():
                g = jax.grad(self.fn)(
                    jnp.asarray(np.asarray(psi, np.float64))
                )
                return np.asarray(g)
