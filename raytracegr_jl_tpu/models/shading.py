"""Gravitational-redshift shading (BASELINE.json config 4).

The reference stores an emitter 4-velocity on every Sphere but never uses it
— ``# TODO: Use metric?`` at /root/reference/src/RayTraceGR.jl:416 is the
dangling hook. This module realizes it, metric-aware and differentiable:

  * every hit is shaded by its g-factor
        g = omega_obs / omega_emit
          = [-g_ab(x_cam) u_obs^a k^b]_launch / [-g_ab(x_hit) u_emit^a k^b]_hit
    where k^a is the photon 4-momentum carried by the ray state (the
    integrator freezes the full 8-state at the localized crossing, so the
    hit-point k is the interpolated event value, ops/integrate._locate_event);
  * the observer u_obs is the camera frame: the normalized raised
    time-covector t_hat = g^{-1} e_t / sqrt(-|g^{-1} e_t|^2) — exactly the
    frame ``make_canvas`` builds null normals in (RayTraceGR.jl:469-474), so
    omega_obs is the frequency the camera actually measures;
  * disk matter (models/objects.Disk) moves on circular Keplerian orbits
    about the z-axis: Omega = sqrt(M) / (rho^{3/2} + a sqrt(M)) (prograde,
    Boyer-Lindquist radius ~ cylindrical rho in the equatorial plane),
    u ~ (1, -Omega y, Omega x, 0) normalized to g(u,u) = -1;
  * sphere/plane matter uses the STORED object ``vel`` normalized with the
    local metric — the reference's field, finally consumed.

Observed bolometric intensity transforms as I_obs = g^4 I_emit (Liouville:
I_nu / nu^3 invariant along rays, integrated over frequency), so hit colors
are scaled by g**beaming with beaming=4 by default.

Everything is jnp + einsum over the trailing object/coordinate axes: fully
batched over rays, jit/vmap/grad-safe, and sharding-transparent.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.geometry import MetricFn, inv4
from .objects import KIND_DISK, Scene, colors, distances

# Floor for squared norms before sqrt/division. Inside the photon sphere the
# Keplerian u becomes spacelike (-g(u,u) <= 0); rays cannot hit a physical
# disk there (r_in >= ISCO), so the floor only sanitizes dead-ray garbage —
# unclamped it would be 1/sqrt(<=0) = NaN poisoning reverse-mode gradients.
_NORM2_FLOOR = 1e-6


def normalize_timelike(g: jax.Array, v: jax.Array) -> jax.Array:
    """u = v / sqrt(max(-g_ab v^a v^b, floor)): unit timelike 4-velocity."""
    n2 = -jnp.einsum("...a,...ab,...b->...", v, g, v)
    return v / jnp.sqrt(jnp.maximum(n2, _NORM2_FLOOR))[..., None]


def keplerian_velocity(g: jax.Array, x: jax.Array, center: jax.Array,
                       M, a, prograde: bool = True) -> jax.Array:
    """4-velocity of circular-orbit disk matter at point(s) ``x``.

    Omega = +-sqrt(M) / (rho^{3/2} +- a sqrt(M)) — the Kerr circular-orbit
    angular velocity (Bardeen-Press-Teukolsky 1972 eq. 2.16) with the
    cylindrical radius standing in for the Boyer-Lindquist r (equal in the
    equatorial plane for a=0; the O(a^2/rho^2) coordinate difference is far
    below shading resolution). Normalized with the LOCAL metric, so
    gravitational time dilation is exact even though Omega is the
    equatorial-circular idealization.
    """
    rel = x[..., 1:] - center[..., 1:]
    rho = jnp.sqrt(jnp.maximum(rel[..., 0] ** 2 + rel[..., 1] ** 2,
                               _NORM2_FLOOR))
    sqrtM = jnp.sqrt(jnp.maximum(M, 0.0))
    sgn = 1.0 if prograde else -1.0
    omega = sgn * sqrtM / (rho * jnp.sqrt(rho) + sgn * a * sqrtM)
    v = jnp.stack([jnp.ones_like(omega), -omega * rel[..., 1],
                   omega * rel[..., 0], jnp.zeros_like(omega)], axis=-1)
    return normalize_timelike(g, v)


def emitter_velocities(metric: MetricFn, scene: Scene, x: jax.Array,
                       M, a) -> jax.Array:
    """Unit 4-velocity of EVERY object's matter at point(s) x:
    ``[..., 4] -> [..., N, 4]``. Disks get the Keplerian flow; spheres and
    planes get their stored ``vel`` normalized with the local metric."""
    g = metric(x)[..., None, :, :]  # [..., 1, 4, 4] shared across objects
    xb = x[..., None, :]  # [..., 1, 4]
    kepler = keplerian_velocity(g, xb, scene.pos, M, a)  # [..., N, 4]
    stored = normalize_timelike(g, jnp.broadcast_to(scene.vel, kepler.shape))
    return jnp.where((scene.kind == KIND_DISK)[..., None], kepler, stored)


def camera_frequency(metric: MetricFn, y0: jax.Array) -> jax.Array:
    """omega_obs = -g_ab u_obs^a k^b at the launch point, per ray.

    ``u_obs`` is the camera-frame observer t_hat (the same normalized raised
    time-covector make_canvas uses, models/camera.pixel_rays)."""
    x0, k0 = y0[..., :4], y0[..., 4:]
    g = metric(x0)
    t = inv4(g)[..., :, 0]
    that = normalize_timelike(g, t)
    return -jnp.einsum("...a,...ab,...b->...", that, g, k0)


def g_factors(metric: MetricFn, scene: Scene, y0: jax.Array, y: jax.Array,
              M, a) -> jax.Array:
    """Per-(ray, object) redshift factor g = omega_obs / omega_emit:
    ``[..., 8], [..., 8] -> [..., N]``."""
    x, k = y[..., :4], y[..., 4:]
    g_hit = metric(x)[..., None, :, :]
    u_emit = emitter_velocities(metric, scene, x, M, a)  # [..., N, 4]
    # Sign convention: the traced ray 4-velocity k is PAST-pointing (backward
    # ray tracing, RayTraceGR.jl:469-474), i.e. k = -k_physical, while the
    # emitter u is future-pointing — so the physical emitted frequency
    # -g(u, k_phys) equals +g(u, k) here. The camera observer t_hat is itself
    # past-pointing, so camera_frequency's -g(t_hat, k) is already positive.
    w_emit = jnp.einsum("...na,...nab,...b->...n", u_emit, g_hit, k)
    w_obs = camera_frequency(metric, y0)
    # Both frequencies are positive for every physical hit; the floor only
    # guards dead-ray garbage against division blowups in f32.
    w_emit = jnp.maximum(w_emit, 1e-3)
    return w_obs[..., None] / w_emit


def shade_redshift(metric: MetricFn, scene: Scene, y0: jax.Array,
                   y: jax.Array, M, a, hit_dmin: float = 0.01,
                   beaming: float = 4.0, exposure: float = 1.0) -> jax.Array:
    """Physical shading: object base color scaled by g**beaming.

    Replaces the reference shading's two non-physical quirks — the
    object-index brightness dimming (RayTraceGR.jl:530) and the red miss
    color (RayTraceGR.jl:528) — with g-factor beaming and a black sky, while
    keeping its nearest-object selection and ``hit_dmin`` threshold
    (RayTraceGR.jl:518-526).
    """
    x = y[..., :4]
    d = distances(scene, x)  # [..., N]
    hit_any = jnp.min(d, axis=-1) < hit_dmin
    omin = jnp.argmin(d, axis=-1)
    base = colors(scene, x)  # [..., N, 3]
    gf = g_factors(metric, scene, y0, y, M, a)  # [..., N]
    lit = base * jnp.clip(exposure * gf ** beaming, 0.0, 1.0)[..., None]
    col = jnp.take_along_axis(lit, omin[..., None, None], axis=-2)
    col = jnp.squeeze(col, axis=-2)
    return jnp.where(hit_any[..., None], col, jnp.zeros_like(col))
