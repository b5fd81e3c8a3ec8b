"""Forward-mode dual numbers with vector-valued tangents, JAX-native.

This is the explicit counterpart of the reference's L0 layer — the hand-rolled
``Dual{T,DT}`` scalar with an SVector dual part and its ~45 Base operator
overloads (reference: /root/reference/src/RayTraceGR.jl:10-247). The
production compute path does NOT need it: ``jax.jacfwd`` performs the same
forward-mode propagation natively (see ops/geometry.py). This module exists
because the reference exports ``Dual`` as public API, and because an
independent, hand-derived forward-mode implementation is the strongest
possible oracle for the jacfwd path (tests cross-check the two).

Design (TPU-native, not a translation):
  * ``Dual`` is a registered pytree of two jnp arrays: ``val`` of any shape
    ``S`` and ``eps`` of shape ``S + (K,)`` — the K-wide tangent travels as a
    trailing axis, so every rule below is a fused elementwise XLA op over
    whole batches, not a scalar struct like the reference's.
  * Rules are data, not dispatch: plain functions over (val, eps), no
    operator-overload maze. Python dunders are provided for ergonomics.
  * The reference's ``atan(y, x)`` two-arg derivative is WRONG (its
    ``x.val .* y.eps`` term is missing the ``/rho2``; RayTraceGR.jl:165-169,
    unused by the render path). ``atan2(..., bug_compatible=True)`` reproduces
    it verbatim for API parity; the default is the correct rule.
  * Comparisons (`==`, `<`, ...) compare primals only, matching the reference
    (RayTraceGR.jl:198-231) so error-control logic sees primal values.

Reference overload coverage (RayTraceGR.jl:51-247 — the full Base surface):
  unary +/-            -> __pos__/__neg__            (:51-57)
  +, -, *, /  (Dual x {Dual, T, Integer}, reflected) ->
      __add__/__radd__/__sub__/__rsub__/__mul__/__rmul__/__truediv__/
      __rtruediv__ with ``lift`` promotion               (:59-120)
  \\ (ldiv, 3 overloads) -> ldiv(a, b)               (:122-131)
  inv                  -> inv(x)                     (:107-110)
  literal_pow ^0..^4, ^Integer, ^T, ^Dual ->
      __pow__ (with the n==0/n==1 short-circuits), __rpow__  (:132-148)
  abs acos asin atan atan2 cbrt cos exp log sin sqrt -> same names
      (:150-196; atan2's wrong reference rule behind bug_compatible=True)
  ==, !=, <, <=, >, >= (primal-only) -> dunders      (:198-231)
  isinf, isnan         -> isinf/isnan                (:233-235)
  hash                 -> hash_dual                  (:243-245)
  isequal              -> isequal                    (:246-248)
  isless               -> isless                     (:249-252)
  promote_rule/convert/eps/zero/one -> lift/constant/seed (pytree-native;
      the reference's :23-49 promotion maze collapses to ``lift``)
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp


class Dual(NamedTuple):
    """Forward-mode number: primal ``val`` [...S] + tangent ``eps`` [...S, K].

    Reference: ``struct Dual{T,DT} <: Real`` (RayTraceGR.jl:10-14) with
    ``DT = SVector{4,T}`` in practice. Here K is the tangent width (4 for
    spacetime gradients) and S any batch shape.
    """

    val: jax.Array
    eps: jax.Array

    # -- arithmetic (reference: RayTraceGR.jl:51-148) --
    def __neg__(self):
        return Dual(-self.val, -self.eps)

    def __pos__(self):
        return self

    def __add__(self, o):
        o = lift(o, self)
        return Dual(self.val + o.val, self.eps + o.eps)

    __radd__ = __add__

    def __sub__(self, o):
        o = lift(o, self)
        return Dual(self.val - o.val, self.eps - o.eps)

    def __rsub__(self, o):
        return lift(o, self).__sub__(self)

    def __mul__(self, o):
        o = lift(o, self)
        return Dual(self.val * o.val,
                    self.eps * o.val[..., None] + self.val[..., None] * o.eps)

    __rmul__ = __mul__

    def __truediv__(self, o):
        o = lift(o, self)
        inv_v = 1.0 / o.val
        q = self.val * inv_v
        return Dual(q, (self.eps - q[..., None] * o.eps) * inv_v[..., None])

    def __rtruediv__(self, o):
        return lift(o, self).__truediv__(self)

    def __pow__(self, n):
        # literal_pow ^0..^4 and general Integer/real exponents
        # (RayTraceGR.jl:132-148). Dual exponents: a^b = exp(b log a).
        if isinstance(n, Dual):
            return exp(n * log(self))
        # n == 0 / n == 1 short-circuits mirror the reference's literal_pow
        # guards (RayTraceGR.jl:138 ``n == 0 && return one(x)``): the general
        # rule would compute 0 * val**-1 = NaN tangent at val == 0.
        if not isinstance(n, Dual) and not hasattr(n, "shape"):
            if n == 0:
                return Dual(jnp.ones_like(self.val), jnp.zeros_like(self.eps))
            if n == 1:
                return self
        dval = n * self.val ** (n - 1)
        return Dual(self.val ** n, dval[..., None] * self.eps)

    def __rpow__(self, base):
        # constant ** Dual (RayTraceGR.jl:145-148 with x a zero-tangent
        # lift): r = b^y, tangent r*log(b) * y.eps.
        return lift(base, self).__pow__(self)

    # -- comparisons: primal-only (RayTraceGR.jl:198-231) --
    def __eq__(self, o):  # type: ignore[override]
        return self.val == (o.val if isinstance(o, Dual) else o)

    def __ne__(self, o):  # type: ignore[override]
        return self.val != (o.val if isinstance(o, Dual) else o)

    def __lt__(self, o):
        return self.val < (o.val if isinstance(o, Dual) else o)

    def __le__(self, o):
        return self.val <= (o.val if isinstance(o, Dual) else o)

    def __gt__(self, o):
        return self.val > (o.val if isinstance(o, Dual) else o)

    def __ge__(self, o):
        return self.val >= (o.val if isinstance(o, Dual) else o)

    def __getitem__(self, idx):
        # Indexing the batch shape; the tangent axis stays trailing. eps has
        # one extra trailing axis than val, so the index must be padded with
        # a full slice — otherwise ``d[..., i]`` would select tangent
        # component i from eps's trailing axis instead of coordinate i's
        # tangent row (correct only by accident for diagonal/symmetric eps).
        tidx = idx if isinstance(idx, tuple) else (idx,)
        return Dual(self.val[idx], self.eps[tidx + (slice(None),)])


def lift(c, like: Dual) -> Dual:
    """Promote a constant to a Dual with zero tangent.

    The reference does this with promote_rule/convert pairs
    (RayTraceGR.jl:23-49, including the dead-code ``promote{T,U}`` at :27
    which would throw if mixed-dual promotion were ever exercised — here
    promotion is total and correct).
    """
    if isinstance(c, Dual):
        return c
    v = jnp.asarray(c, like.val.dtype)
    v = jnp.broadcast_to(v, like.val.shape)
    return Dual(v, jnp.zeros_like(like.eps))


def seed(x: jax.Array) -> Dual:
    """Seed coordinates with the unit tangent basis e_1..e_K.

    ``x`` has shape ``[..., K]``; the result's component i carries tangent
    e_i, exactly like the reference's dmetric seeding (RayTraceGR.jl:305-308).
    Use components via ``d[..., i]``.
    """
    k = x.shape[-1]
    basis = jnp.broadcast_to(jnp.eye(k, dtype=x.dtype), x.shape + (k,))
    return Dual(x, basis)


def constant(x: jax.Array, k: int) -> Dual:
    """A Dual carrying value ``x`` and a zero K-wide tangent."""
    x = jnp.asarray(x)
    return Dual(x, jnp.zeros(x.shape + (k,), x.dtype))


def _chain(v: jax.Array, dv: jax.Array, x: Dual) -> Dual:
    return Dual(v, dv[..., None] * x.eps)


# -- math functions (reference: RayTraceGR.jl:150-196) --

def abs(x: Dual) -> Dual:  # noqa: A001 - mirrors the reference name
    return _chain(jnp.abs(x.val), jnp.sign(x.val), x)


def acos(x: Dual) -> Dual:
    return _chain(jnp.arccos(x.val), -1.0 / jnp.sqrt(1.0 - x.val ** 2), x)


def asin(x: Dual) -> Dual:
    return _chain(jnp.arcsin(x.val), 1.0 / jnp.sqrt(1.0 - x.val ** 2), x)


def atan(x: Dual) -> Dual:
    return _chain(jnp.arctan(x.val), 1.0 / (1.0 + x.val ** 2), x)


def atan2(y: Dual, x: Dual, *, bug_compatible: bool = False) -> Dual:
    """Two-argument arctangent.

    The correct derivative is ``(x dy - y dx) / (x^2 + y^2)``. The reference's
    rule (RayTraceGR.jl:165-169) divides only the ``y.val .* x.eps`` term by
    rho2 and leaves ``x.val .* y.eps`` undivided; ``bug_compatible=True``
    reproduces that for API parity (it is unused by the render path there).
    """
    rho2 = x.val ** 2 + y.val ** 2
    v = jnp.arctan2(y.val, x.val)
    if bug_compatible:
        e = x.val[..., None] * y.eps - (y.val / rho2)[..., None] * x.eps
    else:
        e = (x.val[..., None] * y.eps - y.val[..., None] * x.eps) \
            / rho2[..., None]
    return Dual(v, e)


def cbrt(x: Dual) -> Dual:
    v = jnp.cbrt(x.val)
    return _chain(v, 1.0 / (3.0 * v * v), x)


def cos(x: Dual) -> Dual:
    return _chain(jnp.cos(x.val), -jnp.sin(x.val), x)


def exp(x: Dual) -> Dual:
    v = jnp.exp(x.val)
    return _chain(v, v, x)


def log(x: Dual) -> Dual:
    return _chain(jnp.log(x.val), 1.0 / x.val, x)


def sin(x: Dual) -> Dual:
    return _chain(jnp.sin(x.val), jnp.cos(x.val), x)


def sqrt(x: Dual) -> Dual:
    v = jnp.sqrt(x.val)
    return _chain(v, 0.5 / v, x)


def isnan(x: Dual) -> jax.Array:
    """NaN if the primal or ANY tangent component is NaN (RayTraceGR.jl:233-235)."""
    return jnp.isnan(x.val) | jnp.any(jnp.isnan(x.eps), axis=-1)


def isinf(x: Dual) -> jax.Array:
    """Inf-ness of the primal only (RayTraceGR.jl:233)."""
    return jnp.isinf(x.val)


def inv(x: Dual) -> Dual:
    """``1/(a + eps b) = (a - eps b)/a^2`` (RayTraceGR.jl:107-110)."""
    iv = 1.0 / x.val
    return Dual(iv, (-(iv * iv))[..., None] * x.eps)


def ldiv(a, b):
    """Julia's left-division ``a \\ b == b / a`` (RayTraceGR.jl:122-131).

    Either argument may be a Dual or a constant (at least one must be a
    Dual, matching the reference's three overloads)."""
    if isinstance(a, Dual):
        return lift(b, a).__truediv__(a)
    return b.__truediv__(lift(a, b))


def hash_dual(x: Dual) -> jax.Array:
    """Deterministic elementwise hash mixing val and eps, seeded with the
    reference's magic constant 0xdccda268 (RayTraceGR.jl:243-245:
    ``hash(0xdccda268, hash(x.val, hash(x.eps, h)))``). Bit-level recipe
    differs (Julia's Base.hash is not specified cross-language); the
    CONTRACT matches: equal (val, eps) pairs hash equal, and the hash
    depends on both components. Implemented as 32-bit FNV-1a over the
    component bit patterns (f64 folds as two 32-bit words), so it works
    under the default f32/TPU config with x64 disabled."""
    from jax import lax

    prime = jnp.uint32(0x01000193)  # 32-bit FNV prime

    def words(v):
        if v.dtype.itemsize == 4:
            return [lax.bitcast_convert_type(v, jnp.uint32)]
        w = lax.bitcast_convert_type(v, jnp.uint32)  # shape + (itemsize/4,)
        return [w[..., i] for i in range(v.dtype.itemsize // 4)]

    h = jnp.full(x.val.shape, 0xdccda268, jnp.uint32)
    for i in range(x.eps.shape[-1]):
        for w in words(x.eps[..., i]):
            h = (h ^ w) * prime
    for w in words(x.val):
        h = (h ^ w) * prime
    return h


def isequal(a: Dual, b: Dual) -> jax.Array:
    """Structural equality: val AND every eps component
    (RayTraceGR.jl:246-248) — unlike ``==`` which is primal-only."""
    return (a.val == b.val) & jnp.all(a.eps == b.eps, axis=-1)


def isless(a: Dual, b: Dual) -> jax.Array:
    """Lexicographic (val, then eps) strict order (RayTraceGR.jl:243-247)."""
    val_lt = a.val < b.val
    val_eq = a.val == b.val
    eps_lt = jnp.zeros_like(val_lt)
    eps_eq = jnp.ones_like(val_eq)
    for i in range(a.eps.shape[-1]):
        eps_lt = eps_lt | (eps_eq & (a.eps[..., i] < b.eps[..., i]))
        eps_eq = eps_eq & (a.eps[..., i] == b.eps[..., i])
    return val_lt | (val_eq & eps_lt)


# -- dual-native metrics: L1 written against the Dual ops, used as an
#    independent oracle for the jacfwd path (tests/test_dual.py). --

def minkowski_dual(x: Dual) -> list:
    """Minkowski on duals -> 4x4 nested list of Duals (constant metric)."""
    k = x.eps.shape[-1]
    zero = constant(jnp.zeros_like(x.val[..., 0]), k)
    sgn = [-1.0, 1.0, 1.0, 1.0]
    return [[zero + sgn[a] if a == b else zero for b in range(4)]
            for a in range(4)]


def where_dual(cond: jax.Array, a, b) -> Dual:
    """``jnp.where`` over Duals: select val AND tangent by the (primal)
    boolean mask. Constants lift with zero tangent. Exactly jax's gradient
    semantics for jnp.where — the selected branch's tangent passes."""
    if not isinstance(a, Dual):
        a = lift(a, b)
    if not isinstance(b, Dual):
        b = lift(b, a)
    return Dual(jnp.where(cond, a.val, b.val),
                jnp.where(cond[..., None], a.eps, b.eps))


def clip_dual(x: Dual, lo: float, hi: float) -> Dual:
    """``jnp.clip`` tangent semantics: passes strictly inside, zero where
    clamped (generic points; ties don't matter for the oracle's use)."""
    return where_dual(x.val < lo, lift(lo, x),
                      where_dual(x.val > hi, lift(hi, x), x))


def mod1(x: Dual) -> Dual:
    """``jnp.mod(x, 1)`` — unit tangent a.e. (the checker sawtooth)."""
    return Dual(jnp.mod(x.val, 1.0), x.eps)


def clamp_min(x: Dual, c: float) -> Dual:
    """``maximum(x, c)`` for a constant c, with jnp.maximum's exact tangent
    semantics: tangent passes where val > c, is zeroed where val < c, and is
    halved at exact ties (matching jax.jvp of jnp.maximum against a
    zero-tangent constant)."""
    v = jnp.maximum(x.val, c)
    w = jnp.where(x.val > c, 1.0,
                  jnp.where(x.val < c, 0.0, 0.5)).astype(x.val.dtype)
    return Dual(v, w[..., None] * x.eps)


def kerr_schild_dual(x: Dual, M=1.0, a=0.0, *,
                     r_formula: str = "as_written",
                     rho_min: float = 1e-3) -> list:
    """Kerr-Schild g_ab = eta_ab + f k_a k_b evaluated entirely on duals.

    Mirrors ops/metrics.kerr_schild (reference RayTraceGR.jl:268-294) but
    every scalar op goes through the Dual rules above — independent of
    jax.jvp, so disagreements localize bugs to one side. The ``rho_min``
    singularity clamp matches the production path (metrics.py) including its
    tangent semantics, so the two agree at every point.
    """
    k = x.eps.shape[-1]
    xs, ys, zs = x[..., 1], x[..., 2], x[..., 3]
    rho2 = xs * xs + ys * ys + zs * zs
    # Same clamp semantics as metrics.clamped_rho2: as_written needs the
    # stronger rho2 >= a^2 + rho_min^2 floor (sqrt(rho2 - a^2) NaN-safety).
    floor = rho_min * rho_min + (a * a if r_formula == "as_written" else 0.0)
    rho2 = clamp_min(rho2, floor)
    half = (rho2 - a * a) / 2.0
    inner = sqrt(half * half + (a * a) * (zs * zs))
    if r_formula == "as_written":
        r = sqrt(rho2 - a * a) / 2.0 + inner
    else:
        # Mirror kerr_schild_radius's textbook ring-singularity floor
        # (inner >= rho_min^2/2, r^2 >= rho_min^2) so oracle and
        # production agree within ~rho_min of the ring for a != 0 too.
        if rho_min > 0.0:
            eps2 = rho_min * rho_min
            inner = clamp_min(inner, eps2 / 2.0)
            r = sqrt(clamp_min(half + inner, eps2))
        else:
            r = sqrt(half + inner)
    r2 = r * r
    f = (2.0 * M) * (r * r2) / (r2 * r2 + (a * a) * (zs * zs))
    one = constant(jnp.ones_like(x.val[..., 0]), k)
    denom = r2 + a * a
    kvec = [one,
            (r * xs + a * ys) / denom,
            (r * ys - a * xs) / denom,
            zs / r]
    eta = [-1.0, 1.0, 1.0, 1.0]
    g = [[f * kvec[a_] * kvec[b_] + (eta[a_] if a_ == b_ else 0.0)
          for b_ in range(4)] for a_ in range(4)]
    return g


def dmetric_dual(metric_dual: Callable[[Dual], list],
                 x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """dmetric via explicit duals: seed e_1..e_4, one metric evaluation,
    unpack ``g[a,b] = .val`` and ``dg[a,b,c] = .eps[c]``
    (reference: RayTraceGR.jl:298-313). Returns ([...,4,4], [...,4,4,4])."""
    gd = metric_dual(seed(x))
    g = jnp.stack([jnp.stack([gd[a][b].val for b in range(4)], -1)
                   for a in range(4)], -2)
    dg = jnp.stack([jnp.stack([gd[a][b].eps for b in range(4)], -2)
                    for a in range(4)], -3)
    return g, dg
