"""Spacetime metrics, TPU-native.

Brand-new JAX implementations of the metric layer of the reference
(reference: /root/reference/src/RayTraceGR.jl:253-294). Functions are written
point-wise over a single event ``x`` of shape ``[4]`` using only elementwise
jnp ops, so they compose freely with ``jax.vmap`` (ray batches), ``jax.jacfwd``
(metric derivatives, replacing the reference's hand-rolled dual numbers),
``jax.grad`` (parameter gradients — something the reference cannot do at all)
and Pallas tracing (lane-batched kernels).

Key deltas from the reference, by design (SURVEY.md §7):
  * ``kerr_schild`` exposes mass ``M`` and spin ``a`` as traced, differentiable
    parameters (the reference hard-codes M=1, a=0 at RayTraceGR.jl:276-277).
  * The Boyer-Lindquist-like radius has a parity switch: the reference's
    formula at RayTraceGR.jl:284 misplaces the outer sqrt
    (``r = sqrt(rho^2-a^2)/2 + sqrt(...)`` instead of
    ``r = sqrt((rho^2-a^2)/2 + sqrt(...))``).  The golden images were rendered
    WITH that formula, so ``r_formula="as_written"`` (default) reproduces it
    bit-for-bit and ``r_formula="textbook"`` gives the standard Kerr-Schild
    radius.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

D = 4  # spacetime dimension (reference: RayTraceGR.jl:254)

R_AS_WRITTEN = "as_written"
R_TEXTBOOK = "textbook"


class KerrSchildParams(NamedTuple):
    """Differentiable physics parameters of the Kerr-Schild metric."""

    M: jax.Array | float = 1.0  # black-hole mass
    a: jax.Array | float = 0.0  # spin parameter (J/M)


def eta(dtype=jnp.float64) -> jax.Array:
    """Minkowski eta_ab = diag(-1, 1, 1, 1)."""
    return jnp.diag(jnp.array([-1.0, 1.0, 1.0, 1.0], dtype=dtype))


def minkowski(x: jax.Array) -> jax.Array:
    """Minkowski metric g_ab(x) (reference: RayTraceGR.jl:258-264).

    Accepts ``x`` of shape ``[..., 4]`` and returns ``[..., 4, 4]`` so that the
    same function works pointwise and batched.
    """
    x = jnp.asarray(x)
    g = eta(x.dtype)
    return jnp.broadcast_to(g, x.shape[:-1] + (D, D))


def clamped_rho2(rho2_raw: jax.Array, a, rho_min: float,
                 r_formula: str = R_AS_WRITTEN) -> jax.Array:
    """Singularity-clamped coordinate radius squared — THE shared clamp.

    Every Kerr-Schild evaluation site (row-major metrics here, the
    component-major twins in ops/pallas_geodesic.py, the Dual oracle) must
    route through this so the clamp semantics stay identical.

    ``as_written`` needs the STRONGER floor ``rho2 >= a^2 + rho_min^2``: its
    radius contains ``sqrt(rho2 - a^2)`` (RayTraceGR.jl:284 verbatim), which
    is NaN for rho < |a| — and ``a`` is a traced parameter, so an optimizer
    wandering ``a`` upward poisons the whole batch's gradients (one NaN
    primal under remat => NaN cotangents everywhere). For a = 0 this reduces
    exactly to the plain ``rho_min`` clamp, so golden parity is unaffected.
    ``textbook`` is NaN-safe for all a (r^2 = half + inner >= 0 always) and
    keeps the plain floor.
    """
    eps2 = rho_min * rho_min
    if r_formula == R_AS_WRITTEN:
        return jnp.maximum(rho2_raw, a * a + eps2)
    return jnp.maximum(rho2_raw, eps2)


def kerr_schild_radius(
    rho2: jax.Array, z: jax.Array, a, *, r_formula: str = R_AS_WRITTEN,
    rho_min: float = 0.0,
) -> jax.Array:
    """Boyer-Lindquist-like radius r(x) used by the Kerr-Schild form.

    ``as_written`` reproduces the reference formula at RayTraceGR.jl:284
    (outer sqrt misplaced); ``textbook`` is the standard
    ``r^2 = (rho^2-a^2)/2 + sqrt(a^2 z^2 + ((rho^2-a^2)/2)^2)``.

    ``rho2`` must already be clamped via ``clamped_rho2`` (the as_written
    branch assumes ``rho2 >= a^2``).

    ``rho_min > 0`` additionally floors the TEXTBOOK branch away from the
    RING singularity (z = 0, rho = |a|), where r = 0 exactly: k3 = z/r is
    then 0/0 = NaN — a primal NaN that poisons whole-batch parameter
    cotangents via 0*NaN even for masked lanes (zero-state padding lanes
    land there for any a > rho_min). Floors: inner >= rho_min^2/2 and
    r^2 >= rho_min^2, i.e. r >= rho_min — exactly the spirit of the
    coordinate-origin clamp, and value-identical everywhere farther than
    ~rho_min from the ring (which is inside the horizon for |a| < M).
    """
    half = (rho2 - a * a) / 2
    inner = jnp.sqrt(a * a * z * z + half * half)
    if r_formula == R_AS_WRITTEN:
        # Verbatim RayTraceGR.jl:284: sqrt(rho^2-a^2)/2 + sqrt(...) — the
        # sqrt applies to (rho^2-a^2) and the /2 comes AFTER, and the outer
        # sqrt around the whole sum is missing. For a=0: r = rho/2 + rho^2/2.
        return jnp.sqrt(rho2 - a * a) / 2 + inner
    elif r_formula == R_TEXTBOOK:
        if rho_min > 0.0:
            eps2 = rho_min * rho_min
            inner = jnp.maximum(inner, eps2 / 2)
            return jnp.sqrt(jnp.maximum(half + inner, eps2))
        return jnp.sqrt(half + inner)
    raise ValueError(f"unknown r_formula: {r_formula!r}")


def kerr_schild_radius_partials(rho2: jax.Array, z: jax.Array, a,
                                *, r_formula: str = R_AS_WRITTEN,
                                rho_min: float = 0.0):
    """``(r, dr/du, dr/dw)`` with u = rho2 and w = the EXPLICIT z-dependence
    (through ``inner``/``k3``), for the hand-derived analytic tangents of the
    component-major metric (ops/pallas_geodesic.py dlist_fn / ks_parts —
    previously two hand-synced copies of this algebra; VERDICT r3 weak #2).

    ``rho2`` must be pre-clamped via ``clamped_rho2``: the as_written branch
    keeps ``s = sqrt(rho2 - a^2) >= rho_min``, which also bounds ``0.25/s``.
    ``rho_min`` floors the textbook ring singularity (see
    kerr_schild_radius); at floored points the hand-derived partials are
    inexact but BOUNDED — those points are causally irrelevant garbage
    states, and bounded-wrong beats NaN (0*NaN poisons batch cotangents).
    """
    half = (rho2 - a * a) / 2
    inner = jnp.sqrt(a * a * z * z + half * half)
    if r_formula == R_AS_WRITTEN:
        inv_inner = 1.0 / inner
        s = jnp.sqrt(rho2 - a * a)
        r = s / 2 + inner
        dr_du = 0.25 / s + 0.5 * half * inv_inner
        dr_dw = a * a * z * inv_inner
    elif r_formula == R_TEXTBOOK:
        if rho_min > 0.0:
            eps2 = rho_min * rho_min
            inner = jnp.maximum(inner, eps2 / 2)
            r = jnp.sqrt(jnp.maximum(half + inner, eps2))
        else:
            r = jnp.sqrt(half + inner)
        inv_inner = 1.0 / inner
        inv_2r = 0.5 / r
        dr_du = (0.5 + 0.5 * half * inv_inner) * inv_2r
        dr_dw = (a * a * z * inv_inner) * inv_2r
    else:
        raise ValueError(f"unknown r_formula: {r_formula!r}")
    return r, dr_du, dr_dw


def kerr_schild(
    x: jax.Array,
    params: KerrSchildParams = KerrSchildParams(),
    *,
    r_formula: str = R_AS_WRITTEN,
    rho_min: float = 1e-3,
) -> jax.Array:
    """Kerr-Schild metric g_ab = eta_ab + f k_a k_b.

    Reference: RayTraceGR.jl:268-294 (Living Reviews in Relativity, Cook 2000,
    sec. 3.3.1). Generalized: M and a are traced parameters. Shape
    ``[..., 4] -> [..., 4, 4]``; all ops elementwise over leading dims.

    ``rho_min`` clamps the coordinate radius away from the ring/point
    singularity. Evaluations at rho < 1e-3 only ever happen for RK stages of
    rays already swallowed by the hole (whose pixels shade identically), but
    an unclamped 1/r there produces inf Jacobians that poison reverse-mode
    gradients of the WHOLE batch (0-cotangent x inf = NaN). The reference
    instead @asserts against NaN inputs (RayTraceGR.jl:279) and lets the
    solver abort; it has no gradients to protect.
    """
    x = jnp.asarray(x)
    dtype = x.dtype
    M = jnp.asarray(params.M, dtype)
    a = jnp.asarray(params.a, dtype)

    xs, ys, zs = x[..., 1], x[..., 2], x[..., 3]
    rho2 = xs * xs + ys * ys + zs * zs
    rho2 = clamped_rho2(rho2, a, rho_min, r_formula)
    r = kerr_schild_radius(rho2, zs, a, r_formula=r_formula,
                           rho_min=rho_min)
    r2 = r * r
    f = 2 * M * (r * r2) / (r2 * r2 + a * a * zs * zs)

    denom = r2 + a * a
    k = jnp.stack(
        [
            jnp.ones_like(r),
            (r * xs + a * ys) / denom,
            (r * ys - a * xs) / denom,
            zs / r,
        ],
        axis=-1,
    )  # [..., 4], past-directed null covector k_a

    g = eta(dtype) + f[..., None, None] * k[..., :, None] * k[..., None, :]
    return g


def make_metric(
    name: str,
    params: KerrSchildParams | None = None,
    *,
    r_formula: str = R_AS_WRITTEN,
    rho_min: float = 1e-3,
) -> Callable[[jax.Array], jax.Array]:
    """Build a closed metric function ``x -> g_ab`` from a config name.

    The returned callable has signature ``[..., 4] -> [..., 4, 4]`` and closes
    over the (possibly traced) physics parameters, which keeps downstream code
    (geometry, integrators, kernels) metric-agnostic like the reference's
    generic ``Metric`` type parameter (RayTraceGR.jl:302,321,358).

    ``rho_min``: singularity clamp (see ``kerr_schild``). Gradient configs
    with a capture-stop radius should raise it to ``stop_rho / 2``: every
    evaluation below that radius belongs to a ray that is already being
    killed (integrate.IntegratorConfig.stop_rho), the clamped region is
    causally irrelevant (inside the horizon), and the tighter clamp bounds
    the metric's position-partials at ~(2/stop_rho)^4 instead of 1e12 —
    which is what keeps 40k-ray f32 (M, a) cotangent sums finite
    (grad.make_ray_render_for_params does this automatically).
    """
    if name == "minkowski":
        def fn(x):
            return minkowski(x)
        from .pallas_geodesic import minkowski_cm
        fn.component_major = minkowski_cm()
        fn.params = KerrSchildParams(M=0.0, a=0.0)  # flat: no hole
        return fn
    if name == "kerr_schild":
        p = params if params is not None else KerrSchildParams()

        def fn(x):
            return kerr_schild(x, p, r_formula=r_formula, rho_min=rho_min)
        from .pallas_geodesic import kerr_schild_cm
        fn.component_major = kerr_schild_cm(p, r_formula, rho_min=rho_min)
        fn.params = p
        # Static rebuild recipe for the Pallas adjoint kernel, which
        # reconstructs the metric inside the kernel from SMEM scalars.
        fn.kerr_recipe = (r_formula, rho_min)
        fn.component_major.kerr_recipe = (r_formula, rho_min)
        fn.component_major.params = p
        return fn
    raise ValueError(f"unknown metric: {name!r}")
