"""Render driver: trace all pixel rays through the metric, shade, return canvas.

TPU-native equivalent of the reference's ``trace_rays``
(/root/reference/src/RayTraceGR.jl:482-536): instead of one ODE problem per
pixel in a thread ensemble, the full pixel grid is flattened to a ray batch
``[B, 8]`` and integrated by one masked batched stepper under ``jit``; the
shading pass is a vectorized epilogue. Rays are independent, so the batch
axis shards freely over a device mesh (see ``parallel/``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .models.camera import Canvas
from .models.objects import Scene, min_distance, shade
from .ops.geometry import MetricFn, geodesic
from .ops.integrate import (IntegratorConfig, TraceResult, integrate_rays,
                            integrate_rays_scan)


class RenderConfig(NamedTuple):
    """Render settings with the reference's defaults.

    ``tol`` default mirrors ``eps(T)^(3/4)`` at RayTraceGR.jl:485; pass
    explicitly for f32 (~2.4e-6). ``hit_dmin`` is the shading threshold at
    RayTraceGR.jl:519."""

    integrator: IntegratorConfig = IntegratorConfig()
    hit_dmin: float = 0.01
    differentiable: bool = False  # scan (grad-capable) vs while_loop (fast)


def default_tol(dtype) -> float:
    """eps(T)^(3/4), the reference's reltol=abstol (RayTraceGR.jl:485)."""
    return float(jnp.finfo(dtype).eps) ** 0.75


def trace_batch(metric: MetricFn, scene: Scene, y0: jax.Array,
                cfg: RenderConfig) -> TraceResult:
    """Integrate a flat ray batch ``[B, 8]`` to termination."""
    rhs = jax.vmap(lambda s: geodesic(s, metric))
    event = lambda y: min_distance(scene, y)
    integ = integrate_rays_scan if cfg.differentiable else integrate_rays
    return integ(rhs, event, y0, cfg.integrator)


def trace_rays(metric: MetricFn, scene: Scene, canvas: Canvas,
               cfg: RenderConfig | None = None) -> Canvas:
    """Render: returns a canvas with ``rgb`` filled
    (API parity with RayTraceGR.jl:483)."""
    if cfg is None:
        cfg = RenderConfig(integrator=IntegratorConfig(
            rtol=default_tol(canvas.pos.dtype),
            atol=default_tol(canvas.pos.dtype)))
    ni, nj = canvas.shape
    y0 = jnp.concatenate([canvas.pos, canvas.normal], axis=-1).reshape(-1, 8)
    res = trace_batch(metric, scene, y0, cfg)
    rgb = shade(scene, res.y[..., :4], cfg.hit_dmin).reshape(ni, nj, 3)
    return canvas._replace(rgb=rgb)


def render_fn(metric: MetricFn, scene: Scene, cfg: RenderConfig):
    """Build a jittable ``(pos, normal) -> rgb`` closure over static config.

    The returned function is the unit the driver jits / shards: pure, static
    shapes, no Python control flow."""

    def fn(pos: jax.Array, normal: jax.Array) -> jax.Array:
        y0 = jnp.concatenate([pos, normal], axis=-1)
        flat = y0.reshape(-1, 8)
        res = trace_batch(metric, scene, flat, cfg)
        rgb = shade(scene, res.y[..., :4], cfg.hit_dmin)
        return rgb.reshape(pos.shape[:-1] + (3,))

    return fn
